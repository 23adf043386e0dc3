"""Per-key rolling (moving) window aggregates: row-count and range frames.

SQL semantics, one output row PER INPUT ROW:

- ``window_rows=k``  → ``agg(col) OVER (PARTITION BY keys ORDER BY order_by
  ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)``; ``window_rows=(p, f)`` →
  ``ROWS BETWEEN p PRECEDING AND f FOLLOWING`` (two-sided).
- ``range_preceding=X`` / ``range_following=Y`` → ``... RANGE BETWEEN X
  PRECEDING AND Y FOLLOWING`` (omitted side = the current row's peer
  boundary) over a single numeric/timestamp order column — the frame is
  every row of the key whose order value is in ``[o_i - X, o_i + Y]``,
  INCLUDING peers at both edges (SQL RANGE frames span whole peer
  groups). NULL order values form their own peer group whose frame is
  exactly the NULL peers (SQL).

Absent from the reference (its row windows aggregate per window, not per
row — SURVEY.md §2.1); standard in training-data pipelines (context-length
budgeting, running quality averages, events-in-the-last-hour features).

Ray-native shape: ONE null-safe sort co-location exchange on the keys, then
a per-block vectorized pass. Frame bounds come from segment arithmetic
(rows mode) or per-segment vectorized binary search
(``core.segments.seg_searchsorted``, range mode); sum/avg/count are
segmented prefix-sum differences; min/max answer every row's
variable-length frame from a sparse-table RMQ (O(n log maxframe) build,
O(1)-per-row query, computed IN the source dtype — no float64 round-trip,
no O(n·w) sliding materialization). NULL values are skipped by the
aggregate; a frame with no valid values yields NULL (SQL).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from saber_ray.core.segments import key_change_mask, seg_searchsorted

_OPS = ("sum", "avg", "count", "min", "max", "first_value", "last_value")


def _rmq(vf: np.ndarray, low: np.ndarray, hi: np.ndarray,
         maximum: bool) -> np.ndarray:
    """Per-row min/max of ``vf`` over ``[low[i], hi[i])`` (every range
    non-empty) via a sparse table: levels j hold op over ``[i, i + 2^j)``;
    each query is the op of the two power-of-two blocks covering its range.
    One gather per DISTINCT level (≤ log2 n), everything else C-level."""
    op = np.maximum if maximum else np.minimum
    lens = hi - low
    k = np.floor(np.log2(lens)).astype(np.int64)   # exact for int lens
    maxk = int(k.max())
    sp = [vf]
    for j in range(1, maxk + 1):
        half = 1 << (j - 1)
        prev = sp[j - 1]
        sp.append(op(prev[:len(prev) - half], prev[half:]))
    out = np.empty(len(low), dtype=vf.dtype)
    for j in range(maxk + 1):
        sel = k == j
        if not sel.any():
            continue
        blk = 1 << j
        out[sel] = op(sp[j][low[sel]], sp[j][hi[sel] - blk])
    return out


def rolling_agg(
    ds,
    keys: Sequence[str] | str,
    order_by: Sequence[str] | str,
    col: str,
    *,
    aggs: dict[str, str],
    window_rows: Optional[int | tuple[int, int]] = None,
    range_preceding: Optional[float] = None,
    range_following: Optional[float] = None,
    keep: Sequence[str] | None = None,
):
    """``aggs``: output alias → op in {sum, avg, count, min, max,
    first_value, last_value} (the last two are frame-boundary gathers
    with SQL RESPECT NULLS semantics, dtype-preserving).

    Exactly one frame mode must be given:

    - ROWS: ``window_rows=k`` ≡ ``ROWS BETWEEN k-1 PRECEDING AND CURRENT
      ROW``; ``window_rows=(p, f)`` ≡ ``ROWS BETWEEN p PRECEDING AND f
      FOLLOWING`` (p, f ≥ 0 — the frame always contains the current row).
    - RANGE: ``range_preceding=X`` and/or ``range_following=Y`` ≡
      ``RANGE BETWEEN X PRECEDING AND Y FOLLOWING`` (omitted side = 0,
      i.e. the current row's peer boundary); requires a single order_by
      column. NULL order values keep SQL peer-group semantics (their
      frame is exactly the NULL peers regardless of bounds).

    Output: key columns + ``order_by`` columns + ``keep`` extras + one
    column per alias. In rows mode ``order_by`` should be total per key
    (e.g. a unique turn_idx) for deterministic output. ``count`` is
    COUNT(col) — non-null values in the frame (SQL).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    range_mode = range_preceding is not None or range_following is not None
    if (window_rows is None) == (not range_mode):
        raise ValueError(
            "exactly one of window_rows / range_preceding|range_following "
            "is required")
    rows_p = rows_f = None
    if window_rows is not None:
        if isinstance(window_rows, (tuple, list)):
            rows_p, rows_f = (int(window_rows[0]), int(window_rows[1]))
            if rows_p < 0 or rows_f < 0:
                raise ValueError("window_rows bounds must be >= 0")
        else:
            if window_rows < 1:
                raise ValueError("window_rows must be >= 1")
            rows_p, rows_f = int(window_rows) - 1, 0
    if range_mode:
        range_preceding = 0 if range_preceding is None else range_preceding
        range_following = 0 if range_following is None else range_following
        if range_preceding < 0 or range_following < 0:
            raise ValueError("range bounds must be >= 0")
        if len(order_by) != 1:
            raise ValueError("range mode requires a single order_by column")
    for a, op in aggs.items():
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r} for {a!r}")
    keep = list(keep) if keep else []

    from saber_ray.stages.window_agg import _encode_null_keys
    enc, dec, sort_keys = _encode_null_keys(keys)
    need = list(dict.fromkeys(keys + order_by + [col] + keep))

    def prep(t: pa.Table) -> pa.Table:
        return t.select(need)

    def per_block(g: pa.Table) -> pa.Table:
        return rolling_block(
            g, sort_keys=sort_keys, order_by=order_by, col=col, aggs=aggs,
            rows_p=rows_p, rows_f=rows_f, range_preceding=range_preceding,
            range_following=range_following, keep=keep)
    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(enc, batch_format="pyarrow", zero_copy_batch=True) \
        .sort(sort_keys) \
        .map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


def rolling_out_type(op: str, vtype: pa.DataType) -> pa.DataType:
    """Output dtype of a rolling aggregate over a ``vtype`` column —
    shared by the batch kernel's schema and the streaming twin's
    empty-result schema."""
    if op == "count":
        return pa.int64()
    if op == "sum":
        return pa.int64() if pa.types.is_integer(vtype) else pa.float64()
    if op == "avg":
        return pa.float64()
    return vtype            # min/max/first_value/last_value keep source


def rolling_block(g: pa.Table, *, sort_keys: list, order_by: list, col: str,
                  aggs: dict, rows_p, rows_f, range_preceding,
                  range_following, keep: list) -> pa.Table:
    """The per-block rolling kernel over one co-located block: sort by
    ``sort_keys + order_by``, compute every row's frame aggregate, return
    one output row per input row. Shared between the batch operator above
    and the streaming twin (streaming_rolling.py), which emits the
    watermark-sealed subset."""
    n = g.num_rows
    vtype = g.schema.field(col).type
    int_in = pa.types.is_integer(vtype)

    def out_type(op):
        return rolling_out_type(op, vtype)

    schema = pa.schema(
        [(k, g.schema.field(k).type) for k in sort_keys + order_by + keep]
        + [(a, out_type(op)) for a, op in aggs.items()])
    if n == 0:
        return schema.empty_table()
    g = g.take(pc.sort_indices(
        g, sort_keys=[(c, "ascending") for c in sort_keys + order_by])) \
        .combine_chunks()
    chg = key_change_mask(g, sort_keys)   # segment (key-run) boundaries
    idx = np.arange(n, dtype=np.int64)
    seg_start = np.maximum.accumulate(np.where(chg, idx, 0))
    starts = np.flatnonzero(chg)
    seg_len = np.diff(np.append(starts, n))
    seg_end = np.repeat(starts + seg_len, seg_len)

    if rows_p is not None:                # ROWS frame
        low = np.maximum(idx - rows_p, seg_start)
        hi = np.minimum(idx + rows_f + 1, seg_end)
    else:                                 # RANGE frame
        oc = g[order_by[0]].combine_chunks()
        if pa.types.is_temporal(oc.type):
            oc = oc.cast(pa.int64())
        ovalid = pc.is_valid(oc).to_numpy(zero_copy_only=False)
        # fill BEFORE to_numpy (NaN staging corrupts int64 > 2^53)
        ovals = pc.fill_null(oc, 0).to_numpy(zero_copy_only=False)
        # NULL order values sort last per segment: valid rows occupy
        # [seg_start, valid_end); a NULL row's peers are [valid_end,
        # seg_end)
        nval = np.add.reduceat(ovalid.astype(np.int64), starts)
        valid_end = np.repeat(starts + nval, seg_len)
        if np.issubdtype(ovals.dtype, np.integer):
            if range_preceding != int(range_preceding) \
                    or range_following != int(range_following):
                raise ValueError(
                    "fractional range bounds over an integer order "
                    "column are not supported (stage through float64 "
                    "would corrupt |v| > 2^53)")
            q = ovals - np.int64(range_preceding)
            qf = ovals + np.int64(range_following)
        else:
            q = ovals - range_preceding
            qf = ovals + range_following
        low = seg_searchsorted(ovals, q, seg_start, valid_end,
                               side="left")
        hi = seg_searchsorted(ovals, qf, seg_start, valid_end,
                              side="right")   # through the last row
                                              # with o <= o_i + Y
        null_ord = ~ovalid
        low = np.where(null_ord, valid_end, low)
        hi = np.where(null_ord, seg_end, hi)

    vcol = g[col].combine_chunks()
    valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
    vals = pc.fill_null(vcol, 0).to_numpy(zero_copy_only=False)
    # segmented prefix sums: frame agg = prefix[hi] - prefix[low]
    cs = np.concatenate(([0], np.cumsum(
        vals, dtype=np.int64 if int_in else np.float64)))
    cv = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
    wsum = cs[hi] - cs[low]
    wcnt = cv[hi] - cv[low]               # valid values in the frame

    mm: dict[str, np.ndarray] = {}
    for op in {o for o in aggs.values() if o in ("min", "max")}:
        # min/max stay in the SOURCE dtype domain: int64 sentinels for
        # ints (a float64 round-trip corrupts |v| > 2^53), ±inf fills
        # for floats (legit ±inf inputs must survive)
        if int_in:
            fill = np.iinfo(np.int64).max if op == "min" \
                else np.iinfo(np.int64).min
            vf = np.where(valid, vals.astype(np.int64), fill)
        else:
            fill = np.inf if op == "min" else -np.inf
            vf = np.where(valid, vals.astype(np.float64), fill)
        mm[op] = _rmq(vf, low, hi, maximum=(op == "max"))

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
        elif op in ("first_value", "last_value"):
            # SQL RESPECT NULLS: the value AT the frame boundary row
            # (possibly NULL) — a dtype-preserving Arrow gather, no
            # wcnt nullify (a NULL boundary value stays NULL even in
            # frames that hold other valid values)
            pos = low if op == "first_value" else hi - 1
            cols.append(vcol.take(pa.array(pos)))
        elif op == "sum":
            cols.append(nullify(pa.array(wsum, type=out_type("sum"))))
        elif op == "avg":
            with np.errstate(divide="ignore", invalid="ignore"):
                av = wsum.astype(np.float64) / wcnt
            cols.append(nullify(pa.array(
                np.where(wcnt > 0, av, 0.0), type=pa.float64())))
        else:
            # empty frames hold the fill sentinel — zero them so the
            # narrow-type cast can't overflow; nullify() then nulls them
            r = np.where(empty_win, 0, mm[op])
            cols.append(nullify(pa.array(r, type=vtype)))
    return pa.Table.from_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
         for c in cols], schema=schema)
