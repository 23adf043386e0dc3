"""Session windows with gap timeout.

North-rule extension — the reference has no session windows (its
WindowDefinition.java:5-8 supports only ROW/RANGE tumbling/sliding); semantics
are defined here and property-tested:

  For each key, sort events by (ts, *order_by); a new session starts at the
  first event and whenever ``ts - prev_ts > gap``. ``session_id`` is the
  0-based session ordinal within the key. One output row per (key, session)
  with the requested aggregates plus session bounds. SQL PARTITION BY
  semantics: NULL keys form ONE group (null-safe key encoding below).

Ray-native: project to the needed columns (the wide ``text`` payload never
enters the shuffle), ONE range shuffle ``sort(keys)`` co-locates and orders
each key (Ray's sort partitions by value boundaries, so equal keys never
split across reduce outputs — same invariant stages/window_agg.py's sortmerge
relies on; keys ride with a validity companion because Ray's sort cannot
compare None), then a per-block zero-copy Arrow pass sessionizes EVERY key in
the block at once: pc.sort_indices → dictionary codes → numpy diff/cumsum →
contiguous-segment reduceat aggregation. No per-group Python call, no pandas
conversion. State never outlives a block; the streaming deployment
(streaming_session.py) holds open sessions in checkpointed actors and closes
them when the watermark passes ``last_ts + gap``.

Scale note: one group = one conversation — bounded and small for transcripts.
The shuffle key is conv_id; skew means a single huge conversation, which is
bounded by context-length in practice (documented partitioning assumption).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from saber_ray.core.aggregates import AggSpec, CNT, AVG, SUM, MIN, MAX, \
    VAR, STD, \
    compact_array, round_oracle_np
from saber_ray.core.windows import SessionWindow


def _ts_us_np(col: pa.ChunkedArray) -> np.ndarray:
    """Event time column → int64 epoch MICROSECONDS (pass-through for ints).

    Timestamps normalize through timestamp[us] first — a timestamp[ns]
    column cast straight to int64 would yield nanoseconds and make the gap
    threshold 1000x too tight."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
    elif not pa.types.is_integer(col.type):
        col = col.cast(pa.int64())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _segment_agg(a: AggSpec, col, starts: np.ndarray, counts: np.ndarray):
    """Aggregate one column over contiguous segments (SQL null semantics).

    Fixed-point aggs (a.scale set): the column already holds exact scaled
    ints (apply_scales at the prep stage); sums/mins/maxes descale here, AVG
    descales the sum BEFORE dividing by count — the same op order as
    finalize() and the DECIMAL-sum SQL twin."""
    descale = float(10.0 ** a.scale) if a.scale is not None else None
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    has_null = col.null_count > 0
    if has_null:
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        nvalid = np.add.reduceat(valid.astype(np.int64), starts) \
            if len(starts) else np.zeros(0, dtype=np.int64)
    else:
        nvalid = counts
    if a.op == CNT:
        return pa.array(nvalid, type=pa.int64())
    if a.op in (VAR, STD):
        # float64 moments per segment: var_samp = (Σx² − (Σx)²/n)/(n−1),
        # NULL below 2 non-null values, cancellation clamped at 0
        xf = np.asarray(pc.fill_null(pc.cast(col, pa.float64()), 0.0)
                        .to_numpy(zero_copy_only=False), dtype=np.float64)
        s = np.add.reduceat(xf, starts) if len(starts) else xf[:0]
        ss = np.add.reduceat(xf * xf, starts) if len(starts) else xf[:0]
        n = np.asarray(nvalid, dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            v = np.maximum((ss - s * s / n) / (n - 1.0), 0.0)
        if a.op == STD:
            v = np.sqrt(v)
        arr = pa.array(v, type=pa.float64())
        return pc.if_else(pa.array(nvalid > 1), arr,
                          pa.scalar(None, pa.float64()))
    # Output dtype is a function of the COLUMN TYPE alone, never of this
    # block's null presence — blocks of one Dataset must share a schema.
    # ACCUMULATION happens in exact int64 whenever the SOURCE is integer
    # (incl. scaled-int columns and AVG's sum: float64 pairwise reduceat
    # would cost the "bit-identical under any partitioning" guarantee).
    int_src = pa.types.is_integer(col.type)
    int_out = int_src and descale is None and a.op != AVG
    if int_src:
        # null-safe int64 domain: fill in Arrow, reduce exactly in int64
        fill = 0 if a.op in (SUM, AVG) else (
            np.iinfo(np.int64).max if a.op == MIN else np.iinfo(np.int64).min)
        x = pc.fill_null(pc.cast(col, pa.int64()), fill) \
            .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    else:
        x = col.to_numpy(zero_copy_only=False)
        x = np.asarray(x, dtype=np.float64)
        if has_null:
            fill = 0.0 if a.op in (SUM, AVG) else (
                np.inf if a.op == MIN else -np.inf)
            x = np.where(valid, x, fill)
    if a.op in (SUM, AVG):
        s = np.add.reduceat(x, starts) if len(starts) else x[:0]
        if a.op == SUM:
            if descale is not None:
                arr = pa.array(np.asarray(s, dtype=np.float64) / descale,
                               type=pa.float64())
            else:
                arr = pa.array(s, type=pa.int64() if int_out else pa.float64())
        else:
            sf = np.asarray(s, dtype=np.float64)
            if descale is not None:
                sf = sf / descale
            with np.errstate(invalid="ignore", divide="ignore"):
                arr = pa.array(sf / np.asarray(nvalid, dtype=np.float64),
                               type=pa.float64())
    else:
        red = np.minimum if a.op == MIN else np.maximum
        m = red.reduceat(x, starts) if len(starts) else x[:0]
        if descale is not None:
            arr = pa.array(np.asarray(m, dtype=np.float64) / descale,
                           type=pa.float64())
        else:
            arr = pa.array(m, type=pa.int64() if int_out else pa.float64())
            if not int_out and pa.types.is_floating(col.type):
                arr = arr.cast(col.type)    # min/max keep the source width
    if nvalid is not counts:
        arr = pc.if_else(pa.array(nvalid > 0), arr, pa.scalar(None, arr.type))
    return arr


def session_windows(
    ds,
    *,
    gap: int,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = ("conv_id",),
    ts_col: str = "ts",
    order_by: Sequence[str] = (),
    round_decimals: Optional[int] = None,
):
    """Sessionize per key; returns one row per (key..., session_id)."""
    sw = SessionWindow(gap)
    keys = list(keys)
    order_by = list(order_by)
    aggs = list(aggs)
    agg_cols = sorted({a.column for a in aggs if a.column is not None})

    # prune to what the shuffle needs — wide payloads stay at the source;
    # fixed-point (scale=) agg columns become exact scaled ints here and are
    # descaled per agg at emit
    from saber_ray.core.aggregates import apply_scales, scaled_columns
    scales = scaled_columns(aggs)
    need = list(dict.fromkeys(keys + [ts_col] + order_by + agg_cols))

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(need)
        return apply_scales(t, scales) if scales else t

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    from saber_ray.stages.window_agg import _encode_null_keys
    enc, dec, sort_keys = _encode_null_keys(keys)

    def per_block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n:
            order = pc.sort_indices(
                g, sort_keys=[(c, "ascending")
                              for c in sort_keys + [ts_col] + order_by])
            g = g.take(order).combine_chunks()
        t = _ts_us_np(g[ts_col]) if n else np.zeros(0, dtype=np.int64)
        # same-key runs via dictionary codes (string compare stays in C++)
        same_key = np.ones(n, dtype=bool)
        for k in sort_keys:
            col = g[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                codes = col.dictionary_encode().indices.to_numpy(
                    zero_copy_only=False)
            else:
                codes = col.to_numpy(zero_copy_only=False)
            same_key[1:] &= codes[1:] == codes[:-1]
        if n:
            same_key[0] = False
        brk = np.ones(n, dtype=bool)
        if n:
            brk[1:] = ~(same_key[1:] & (np.diff(t) <= sw.gap))
        starts = np.flatnonzero(brk)
        nseg = len(starts)
        counts = np.diff(np.append(starts, n))
        ends = starts + counts - 1 if nseg else starts
        # session_id = ordinal within the key (0-based): reset at key starts
        new_key = ~same_key[starts] if nseg else np.zeros(0, dtype=bool)
        seg_idx = np.arange(nseg)
        key_first = np.where(new_key, seg_idx, 0)
        np.maximum.accumulate(key_first, out=key_first)
        cols: dict[str, pa.Array] = {}
        for k in keys + [f"__nn_{k}" for k in keys]:
            cols[k] = compact_array(g[k]).take(pa.array(starts)) if n \
                else pa.nulls(0, type=g.schema.field(k).type)
        cols["session_id"] = pa.array(seg_idx - key_first, type=pa.int64())
        cols["session_start_us"] = pa.array(t[starts], type=pa.int64())
        cols["session_end_us"] = pa.array(t[ends], type=pa.int64())
        for a in aggs:
            if a.op == CNT and a.column is None:
                arr = pa.array(counts, type=pa.int64())
            else:
                arr = _segment_agg(a, g[a.column], starts, counts)
            if round_decimals is not None and pa.types.is_floating(arr.type):
                vals = round_oracle_np(
                    arr.to_numpy(zero_copy_only=False).astype(np.float64),
                    round_decimals)
                out = pa.array(vals, type=pa.float64())
                if arr.null_count:
                    out = pc.if_else(arr.is_valid(), out,
                                     pa.scalar(None, pa.float64()))
                arr = out
            cols[a.alias] = arr
        out = pa.Table.from_arrays(
            [compact_array(c) if isinstance(c, pa.ChunkedArray) else c
             for c in cols.values()], names=list(cols.keys()))
        return dec(out)

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True) \
             .sort(sort_keys) \
             .map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True)
