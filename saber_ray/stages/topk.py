"""Distributed top-k without a total sort.

The reference has no sort/top-k (output order = arrival order, SURVEY.md
§2.7); this is a north-rule extension. A naive ``ds.sort(...).limit(k)`` is
an all-to-all range shuffle of the ENTIRE table for k rows — at 100 TB that
is the single most expensive wrong plan. Top-k is an associative reduction:

1. per-block partial: keep each block's k best rows (one vectorized
   ``pc.sort_indices`` + ``take`` per block — no Python loop);
2. fan-in: blocks of ≤ k rows coalesce to one task which re-selects the
   global k best (#blocks × k rows total — trivially small).

Same shape as similarity._topk_merge and the suite's `tree` merge. For huge
clusters use two fan-in levels (repartition(√B) then 1); one level is right
for ≤ ~10⁴ blocks at k ≤ 10³.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc


def topk(ds, keys: Sequence[str] | str, k: int, *,
         descending: Sequence[bool] | bool = True):
    """k best rows by ``keys`` (ties broken by later keys). Output is one
    sorted block of ≤ k rows; no all-to-all shuffle."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    sort_keys = [(c, "descending" if d else "ascending")
                 for c, d in zip(keys, descending)]

    def best(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            # keep partials sorted so the fan-in block is nearly ordered
            return t.take(pc.sort_indices(t, sort_keys=sort_keys)) \
                if t.num_rows else t
        return t.take(pc.sort_indices(t, sort_keys=sort_keys)[:k])

    return ds.map_batches(best, batch_format="pyarrow", zero_copy_batch=True) \
             .repartition(1) \
             .map_batches(best, batch_format="pyarrow", zero_copy_batch=True)
