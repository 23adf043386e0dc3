"""SQL ranking window functions over per-key sorted segments.

``ROW_NUMBER / RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST / NTILE(k)
OVER (PARTITION BY keys ORDER BY order_by)`` — one output row per input
row. Absent from the reference (its windows aggregate; they never rank
tuples — SURVEY.md §2.1/§2.7); essential for curation pipelines
(per-source freshness rank, quantile bucketing for stratified exports,
position features).

Ray-native shape (the ``stages/shift.py`` pattern): ONE null-safe sort
co-location exchange on the PARTITION keys only (never the order columns
— sort co-location holds for equal full sort tuples only, so a tiebreaker
in the exchange key would split a partition across blocks), then a
per-block vectorized pass: segment bounds + peer-run bounds from
``core.segments.key_change_mask``, ranks from run-position arithmetic.
No per-row or per-group Python anywhere.

Tie/NULL semantics match SQL: peers (rows equal on every ``order_by``
column) share RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST; NULL order values
sort last (DuckDB's default NULLS LAST) and form one peer group.
ROW_NUMBER and NTILE break ties by block sort order — pass a unique
trailing ``order_by`` column for deterministic output, exactly as in SQL.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from saber_ray.core.segments import key_change_mask

_FUNCS = ("row_number", "rank", "dense_rank", "percent_rank",
          "cume_dist", "ntile")


def rank_window(
    ds,
    partition_by: Sequence[str] | str,
    order_by: Sequence[str] | str,
    specs: dict[str, str | tuple[str, int]],
    *,
    descending: Sequence[bool] | bool = False,
    keep: Sequence[str] | None = None,
):
    """``specs``: output alias → function name, or ``("ntile", k)``.

    Output: partition key columns + ``order_by`` columns + ``keep`` extras
    + one column per alias (int64 for row_number/rank/dense_rank/ntile,
    float64 for percent_rank/cume_dist).
    """
    partition_by = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    if len(descending) != len(order_by):
        raise ValueError(f"descending has {len(descending)} entries for "
                         f"{len(order_by)} order_by columns")
    if not specs:
        raise ValueError("specs must name at least one ranking function")
    parsed: dict[str, tuple[str, int]] = {}
    for alias, fn in specs.items():
        if isinstance(fn, tuple):
            name, k = fn[0], int(fn[1])
            if name != "ntile":
                raise ValueError(f"only ntile takes an argument, got {fn!r}")
            if k <= 0:
                raise ValueError(f"ntile bucket count must be > 0, got {k}")
            parsed[alias] = ("ntile", k)
        elif fn in _FUNCS and fn != "ntile":
            parsed[alias] = (fn, 0)
        else:
            raise ValueError(f"unknown ranking function {fn!r} "
                             f"(one of {_FUNCS}; ntile as ('ntile', k))")
    keep = list(keep) if keep else []

    from saber_ray.stages.window_agg import _encode_null_keys
    enc, dec, sort_keys = _encode_null_keys(partition_by)
    need = list(dict.fromkeys(partition_by + order_by + keep))
    block_sort = [(c, "ascending") for c in sort_keys] + \
        [(c, "descending" if d else "ascending")
         for c, d in zip(order_by, descending)]

    def prep(t: pa.Table) -> pa.Table:
        return t.select(need)

    def per_block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        out_fields = [(k, g.schema.field(k).type)
                      for k in sort_keys + order_by + keep]
        for alias, (fn, _) in parsed.items():
            out_fields.append((alias, pa.float64() if fn in
                               ("percent_rank", "cume_dist") else pa.int64()))
        schema = pa.schema(out_fields)
        if n == 0:
            return schema.empty_table()
        g = g.take(pc.sort_indices(g, sort_keys=block_sort)).combine_chunks()
        idx = np.arange(n, dtype=np.int64)
        chg_part = key_change_mask(g, sort_keys)
        # a partition boundary always starts a new peer run too
        chg_peer = chg_part | key_change_mask(g, order_by)
        part_start = np.maximum.accumulate(np.where(chg_part, idx, 0))
        pos = idx - part_start                       # 0-based ROW_NUMBER-1
        starts = np.flatnonzero(chg_part)
        lens = np.diff(np.append(starts, n))
        part_n = np.repeat(lens, lens)
        peer_start = np.maximum.accumulate(np.where(chg_peer, idx, 0))
        cols: list = [g[c].combine_chunks() if
                      isinstance(g[c], pa.ChunkedArray) else g[c]
                      for c in sort_keys + order_by + keep]
        dense = None
        peer_end = None
        for alias, (fn, k) in parsed.items():
            if fn == "row_number":
                cols.append(pa.array(pos + 1, type=pa.int64()))
            elif fn == "rank":
                cols.append(pa.array(peer_start - part_start + 1,
                                     type=pa.int64()))
            elif fn == "dense_rank":
                if dense is None:
                    d = np.cumsum(chg_peer)
                    dense = d - np.repeat(d[starts], lens) + 1
                cols.append(pa.array(dense, type=pa.int64()))
            elif fn == "percent_rank":
                rk = peer_start - part_start        # rank - 1
                denom = part_n - 1
                cols.append(pa.array(
                    np.where(denom > 0, rk / np.maximum(denom, 1), 0.0),
                    type=pa.float64()))
            elif fn == "cume_dist":
                if peer_end is None:
                    psi = np.flatnonzero(chg_peer)
                    plen = np.diff(np.append(psi, n))
                    peer_end = np.repeat(psi + plen, plen)
                cols.append(pa.array((peer_end - part_start) / part_n,
                                     type=pa.float64()))
            else:                                    # ntile(k)
                q, r = part_n // k, part_n % k
                cut = r * (q + 1)
                # first r buckets take q+1 rows, the rest q (SQL NTILE);
                # q == 0 (fewer rows than buckets) → one row per bucket
                bucket = np.where(
                    pos < cut, pos // np.maximum(q + 1, 1),
                    r + (pos - cut) // np.maximum(q, 1))
                cols.append(pa.array(bucket + 1, type=pa.int64()))
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols], schema=schema)

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(enc, batch_format="pyarrow", zero_copy_batch=True) \
        .sort(sort_keys) \
        .map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)
