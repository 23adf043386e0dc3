"""Per-key row-offset access: SQL LAG / LEAD window functions.

``LAG(col, k) / LEAD(col, k) OVER (PARTITION BY keys ORDER BY order_by)``
— one output row per input row, NULL where the offset row falls outside
the key's partition. Absent from the reference (its windows aggregate;
they never expose neighbouring tuples — SURVEY.md §2.1); essential for
transcript pipelines (previous/next turn text, response pairing,
turn-gap features).

Ray-native shape: ONE null-safe sort co-location exchange on the keys,
then a per-block vectorized pass — segment bounds from
``core.segments.key_change_mask``, one Arrow ``take`` with a null mask
per shifted column (dtype-preserving, strings stay in C; no per-row
Python).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from saber_ray.core.segments import key_change_mask


def shift(
    ds,
    keys: Sequence[str] | str,
    order_by: Sequence[str] | str,
    specs: dict[str, tuple[str, int]],
    *,
    keep: Sequence[str] | None = None,
):
    """``specs``: output alias → (source column, offset). offset > 0 looks
    BACK (``LAG(col, offset)``), offset < 0 looks FORWARD
    (``LEAD(col, -offset)``); 0 is rejected (it's just the column).

    Output: key columns + ``order_by`` columns + ``keep`` extras + one
    column per alias (source column's dtype, NULL outside the partition).
    ``order_by`` should be total per key for deterministic output.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if not specs:
        raise ValueError("specs must name at least one shifted column")
    for a, (c, off) in specs.items():
        if int(off) == 0:
            raise ValueError(f"offset 0 for {a!r}: use the column directly")
    keep = list(keep) if keep else []

    from saber_ray.stages.window_agg import _encode_null_keys
    enc, dec, sort_keys = _encode_null_keys(keys)
    src_cols = [c for c, _ in specs.values()]
    need = list(dict.fromkeys(keys + order_by + src_cols + keep))

    def prep(t: pa.Table) -> pa.Table:
        return t.select(need)

    def per_block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        schema = pa.schema(
            [(k, g.schema.field(k).type) for k in sort_keys + order_by + keep]
            + [(a, g.schema.field(c).type) for a, (c, _) in specs.items()])
        if n == 0:
            return schema.empty_table()
        g = g.take(pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in sort_keys + order_by])) \
            .combine_chunks()
        chg = key_change_mask(g, sort_keys)
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(chg, idx, 0))
        starts = np.flatnonzero(chg)
        seg_len = np.diff(np.append(starts, n))
        seg_end = np.repeat(starts + seg_len, seg_len)
        cols: list = [g[c].combine_chunks() for c in sort_keys + order_by + keep]
        for alias, (c, off) in specs.items():
            src = idx - int(off)
            ok = (src >= seg_start) & (src < seg_end)
            safe = np.where(ok, src, 0)
            cols.append(g[c].combine_chunks().take(
                pa.array(safe, mask=~ok)))     # null index -> null output
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols], schema=schema)

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(enc, batch_format="pyarrow", zero_copy_batch=True) \
        .sort(sort_keys) \
        .map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)
