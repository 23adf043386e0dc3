"""Per-key rolling (moving) window aggregates over row counts.

SQL semantics: ``agg(col) OVER (PARTITION BY keys ORDER BY order_by ROWS
BETWEEN window_rows-1 PRECEDING AND CURRENT ROW)`` — one output row PER
INPUT ROW. Absent from the reference (its row windows aggregate per window,
not per row — SURVEY.md §2.1); standard in training-data pipelines
(context-length budgeting, running quality averages per conversation).

Ray-native shape: ONE null-safe sort co-location exchange on the keys, then
a per-block vectorized pass — segmented prefix sums answer sum/avg/count for
every row at once; min/max use a full-window ``sliding_window_view`` plus a
truncated-head correction iterated over OFFSETS (< window_rows) and
vectorized over segments — O(window_rows × segments), never a row loop.
NULL handling matches SQL: NULL values are skipped by the aggregate; a
window with no valid values yields NULL.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OPS = ("sum", "avg", "count", "min", "max")


def rolling_agg(
    ds,
    keys: Sequence[str] | str,
    order_by: Sequence[str] | str,
    col: str,
    *,
    window_rows: int,
    aggs: dict[str, str],
    keep: Sequence[str] | None = None,
):
    """``aggs``: output alias → op in {sum, avg, count, min, max}.

    Output: key columns + ``order_by`` columns + ``keep`` extras + one
    column per alias. ``order_by`` should be total per key (e.g. a unique
    turn_idx) for deterministic output. ``count`` is COUNT(col) — non-null
    values in the window (SQL).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    for a, op in aggs.items():
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r} for {a!r}")
    keep = list(keep) if keep else []
    w = int(window_rows)

    from saber_ray.stages.window_agg import _encode_null_keys
    enc, dec, sort_keys = _encode_null_keys(keys)
    need = list(dict.fromkeys(keys + order_by + [col] + keep))

    def prep(t: pa.Table) -> pa.Table:
        return t.select(need)

    def per_block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        vtype = g.schema.field(col).type
        int_in = pa.types.is_integer(vtype)

        def out_type(op):
            if op == "count":
                return pa.int64()
            if op == "sum":
                return pa.int64() if int_in else pa.float64()
            if op == "avg":
                return pa.float64()
            return vtype                      # min/max keep the source type

        schema = pa.schema(
            [(k, g.schema.field(k).type) for k in sort_keys + order_by + keep]
            + [(a, out_type(op)) for a, op in aggs.items()])
        if n == 0:
            return schema.empty_table()
        g = g.take(pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in sort_keys + order_by])) \
            .combine_chunks()
        chg = np.zeros(n, dtype=bool)         # segment (key-run) boundaries
        chg[0] = True
        for c in sort_keys:
            cl = g[c].combine_chunks()
            if pa.types.is_string(cl.type) or pa.types.is_large_string(cl.type):
                codes = cl.dictionary_encode().indices.to_numpy(
                    zero_copy_only=False)
            else:
                codes = cl.to_numpy(zero_copy_only=False)
            chg[1:] |= codes[1:] != codes[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(chg, idx, 0))
        low = np.maximum(idx - w + 1, seg_start)    # window start per row
        vcol = g[col].combine_chunks()
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(vcol, 0).to_numpy(zero_copy_only=False)
        # segmented prefix sums: window = prefix[i+1] - prefix[low]
        cs = np.concatenate(([0], np.cumsum(
            vals, dtype=np.int64 if int_in else np.float64)))
        cv = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
        wsum = cs[idx + 1] - cs[low]
        wcnt = cv[idx + 1] - cv[low]          # valid values in the window

        mm: dict[str, np.ndarray] = {}
        for op in {o for o in aggs.values() if o in ("min", "max")}:
            fill = np.inf if op == "min" else -np.inf
            vf = np.where(valid, vals.astype(np.float64), fill)
            res = np.full(n, fill, dtype=np.float64)
            if n >= w:
                from numpy.lib.stride_tricks import sliding_window_view
                sv = sliding_window_view(vf, w)
                res[w - 1:] = sv.min(axis=1) if op == "min" else sv.max(axis=1)
            # rows whose window is truncated by their segment start get the
            # segment-prefix value instead; offsets 0..w-2, vectorized over
            # segments
            starts = np.flatnonzero(chg)
            seg_len = np.diff(np.append(starts, n))
            pref = np.full(len(starts), fill, dtype=np.float64)
            for j in range(w - 1):
                sel = seg_len > j
                if not sel.any():
                    break
                rows = starts[sel] + j
                pref[sel] = np.minimum(pref[sel], vf[rows]) if op == "min" \
                    else np.maximum(pref[sel], vf[rows])
                res[rows] = pref[sel]         # j < w-1 ⇒ truncated window
            mm[op] = res

        cols: list = [g[c].combine_chunks() for c in sort_keys + order_by + keep]
        empty_win = wcnt == 0

        def nullify(arr):
            if empty_win.any():
                return pc.if_else(pa.array(~empty_win), arr,
                                  pa.scalar(None, arr.type))
            return arr

        for alias, op in aggs.items():
            if op == "count":
                cols.append(pa.array(wcnt, type=pa.int64()))
            elif op == "sum":
                cols.append(nullify(pa.array(wsum, type=out_type("sum"))))
            elif op == "avg":
                with np.errstate(divide="ignore", invalid="ignore"):
                    av = wsum.astype(np.float64) / wcnt
                cols.append(nullify(pa.array(
                    np.where(wcnt > 0, av, 0.0), type=pa.float64())))
            else:
                r = mm[op]
                safe = np.where(np.isfinite(r), r, 0)
                arr = pa.array(safe.astype(np.int64), type=vtype) if int_in \
                    else pa.array(safe, type=vtype)
                cols.append(nullify(arr))
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols], schema=schema)

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(enc, batch_format="pyarrow", zero_copy_batch=True) \
        .sort(sort_keys) \
        .map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)
