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

import numpy as np
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


def grouped_topk(ds, group_keys: Sequence[str] | str,
                 order_by: Sequence[str] | str, k: int, *,
                 descending: Sequence[bool] | bool = True,
                 rank_alias: Optional[str] = None):
    """Per-GROUP top-k: the k best rows of every group by ``order_by``
    (SQL ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY o) <= k``).

    Same no-total-sort principle as ``topk`` applied per key: each block
    first keeps only its own k best per group (the associative partial — a
    block can never contribute more than k rows to any group's answer), so
    the ONE sort co-location exchange on the group keys ships ≤ k rows per
    (block, group) instead of whole groups; a per-block final pass
    re-selects each group's global k. Both passes are one vectorized
    ``pc.sort_indices`` + run-position arithmetic — no per-group dispatch.

    Ties: broken by later ``order_by`` columns; include a unique id as the
    last order column for fully deterministic output. ``rank_alias`` adds a
    1-based int64 rank column.
    """
    group_keys = [group_keys] if isinstance(group_keys, str) \
        else list(group_keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    if len(descending) != len(order_by):
        raise ValueError(
            f"descending has {len(descending)} entries for "
            f"{len(order_by)} order_by columns")
    from saber_ray.stages.window_agg import _encode_null_keys
    enc, dec, sort_keys = _encode_null_keys(group_keys)
    block_sort = [(c, "ascending") for c in sort_keys] + \
        [(c, "descending" if d else "ascending")
         for c, d in zip(order_by, descending)]

    def head(with_rank: bool):
        def _head(t: pa.Table) -> pa.Table:
            n = t.num_rows
            if n == 0:
                return t.append_column(rank_alias, pa.array([], pa.int64())) \
                    if with_rank and rank_alias else t
            t = t.take(pc.sort_indices(t, sort_keys=block_sort)) \
                 .combine_chunks()
            from saber_ray.core.segments import key_change_mask
            chg = key_change_mask(t, sort_keys)  # group-run boundaries
            idx = np.arange(n, dtype=np.int64)
            run_start = np.maximum.accumulate(np.where(chg, idx, 0))
            pos = idx - run_start                   # 0-based rank within group
            keep = pos < k
            t = t.filter(pa.array(keep))
            if with_rank and rank_alias:
                t = t.append_column(rank_alias,
                                    pa.array(pos[keep] + 1, type=pa.int64()))
            return t
        return _head

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(head(False), batch_format="pyarrow", zero_copy_batch=True) \
        .sort(sort_keys) \
        .map_batches(head(True), batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)
