"""Grouped order statistics: exact quantiles and count-distinct.

Absent from the reference (no sort/percentile/distinct machinery at all —
SURVEY.md §2.7); standard training-data-pipeline summaries ("p95 document
length per language"). Exact, not sketched: ONE null-safe sort co-location
exchange on the group keys (every key's rows land whole in one block — the
window_agg sortmerge invariant), then a per-block vectorized pass computes
every group at once via one ``np.lexsort`` + run detection:

- quantile (``interpolation="disc"``): the element at ``ceil(q*n) - 1`` of
  the group's sorted values — bit-identical to DuckDB's ``quantile_disc``
  (calibrated empirically), so gates compare exactly even on ints.
- count-distinct: run-length count over the (key, value)-sorted array.

Scale note: a group must fit one block (same assumption as sessions — keys
like ``lang``/``conv_id`` are bounded). For giant groups use the sketching
path (per-block partial top-/bottom-k or a KLL sketch) — not needed for the
transcript workloads.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_quantiles(ds, keys: Sequence[str] | str, col: str,
                      quantiles: dict[str, float], *,
                      count_distinct_alias: Optional[str] = None,
                      count_alias: Optional[str] = None):
    """One row per key group with exact discrete quantiles of ``col``.

    ``quantiles``: output alias → q in (0, 1]. SQL semantics throughout:
    NULL values of ``col`` are skipped by the quantile / count-distinct
    kernels but the rows still reach the shuffle, so ``count_alias`` is
    ``COUNT(*)`` and a group whose values are all NULL is kept (its
    quantiles are NULL, distinct-count 0). NULL keys form one group
    (null-safe encoding).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    qitems = list(quantiles.items())
    from saber_ray.stages.window_agg import _encode_null_keys
    enc, dec, sort_keys = _encode_null_keys(keys)

    def prep(t: pa.Table) -> pa.Table:
        return t.select(keys + [col])

    def per_block(g: pa.Table) -> pa.Table:
        from saber_ray.stages.dedup import _runs
        out_fields = [(k, g.schema.field(k).type) for k in sort_keys] + \
            [(a, g.schema.field(col).type) for a, _ in qitems]
        if count_distinct_alias:
            out_fields.append((count_distinct_alias, pa.int64()))
        if count_alias:
            out_fields.append((count_alias, pa.int64()))
        schema = pa.schema(out_fields)
        if g.num_rows == 0:
            return schema.empty_table()
        g = g.combine_chunks()
        # one lexsort orders every group's values at once
        kcols = []
        for k in sort_keys:
            c = g[k].combine_chunks()
            if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
                kcols.append(c.dictionary_encode().indices
                             .to_numpy(zero_copy_only=False))
            else:
                kcols.append(c.to_numpy(zero_copy_only=False))
        vcol = g[col].combine_chunks()
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        if pa.types.is_string(vcol.type) or pa.types.is_large_string(vcol.type):
            base = vcol.dictionary_encode().indices
        else:
            base = vcol
        # fill BEFORE to_numpy: nullable ints stage through float NaN and
        # corrupt (>2^53) otherwise
        vals = pc.fill_null(base, 0).to_numpy(zero_copy_only=False)
        # nulls sort LAST within each key group: valid rows occupy
        # [start, start + nvalid) after the sort
        order = np.lexsort(tuple([vals, ~valid] + kcols[::-1]))
        ksorted = [kc[order] for kc in kcols]
        vsorted = vals[order]
        valid_sorted = valid[order]
        starts, ends = _runs(*ksorted)
        counts = ends - starts                     # COUNT(*)
        nvalid = np.add.reduceat(valid_sorted.astype(np.int64), starts)
        cols: dict[str, object] = {
            k: g[k].combine_chunks().take(pa.array(order[starts]))
            for k in sort_keys}
        empty = nvalid == 0                        # all-NULL groups
        for alias, q in qitems:
            idx = starts + np.minimum(
                np.maximum(nvalid - 1, 0),
                np.maximum(0, np.ceil(q * nvalid).astype(np.int64) - 1))
            cols[alias] = vcol.take(
                pa.array(order[idx], mask=empty))  # NULL quantile if no values
        if count_distinct_alias:
            change = np.concatenate(([True], vsorted[1:] != vsorted[:-1]))
            change[starts] = True                  # run boundaries
            nd = np.add.reduceat(
                (change & valid_sorted).astype(np.int64), starts)
            cols[count_distinct_alias] = pa.array(nd, type=pa.int64())
        if count_alias:
            cols[count_alias] = pa.array(counts, type=pa.int64())
        return pa.Table.from_arrays(
            [(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
             for v in cols.values()], schema=schema)

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(enc, batch_format="pyarrow", zero_copy_batch=True) \
        .sort(sort_keys) \
        .map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)
