"""Vectorized per-segment primitives shared by sorted-block operators.

Every keyed per-block operator in this engine follows the same shape: one
null-safe sort co-location exchange on the group keys, then a per-block pass
over the (key, order)-sorted rows where each key's rows form one contiguous
SEGMENT. These helpers are the segment toolbox — all O(n) or O(n log n)
numpy, never a per-row or per-group Python loop:

- ``key_change_mask``: segment-start booleans from the sorted key columns.
- ``segmented_running_max``: running max within segments (offset-encode
  trick with a safe fallback), for cumulative aggregates.
- ``seg_searchsorted``: per-row binary search bounded to the row's own
  segment — a vectorized ``np.searchsorted`` that works when the order
  column is only sorted WITHIN segments (globally it resets at every
  boundary, so one global searchsorted would be wrong).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def key_change_mask(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Boolean mask of segment starts over a block already sorted by
    ``cols``: True where any key column differs from the previous row
    (row 0 always True). String keys compare via dictionary codes so the
    comparison stays in C."""
    n = t.num_rows
    chg = np.zeros(n, dtype=bool)
    if n == 0:
        return chg
    chg[0] = True
    for c in cols:
        codes = equality_codes(t[c])
        chg[1:] |= codes[1:] != codes[:-1]
    return chg


def equality_codes(col) -> np.ndarray:
    """Null-safe int64 equality codes for one column (chunked or plain):
    equal values (nulls included — one NULL group) get equal codes. Strings
    and any null-bearing or non-integral column go through
    ``dictionary_encode`` so the comparison stays in C and NULL never
    becomes a NaN that breaks ``==`` (NaN != NaN would split a null run
    into per-row segments)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import pyarrow.compute as pc
    t = col.type
    direct = (pa.types.is_integer(t) or pa.types.is_boolean(t)
              or pa.types.is_temporal(t))
    if direct and col.null_count == 0:
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    idx = col.indices if pa.types.is_dictionary(t) \
        else col.dictionary_encode().indices
    return pc.fill_null(idx.cast(pa.int64()), -1) \
        .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def segmented_running_max(vals: np.ndarray, new_seg: np.ndarray) -> np.ndarray:
    """Running max of int ``vals`` within segments (``new_seg`` marks
    starts): one global ``np.maximum.accumulate`` over per-segment-offset
    values — an earlier segment's max is shifted strictly below the next
    segment's range so it can never leak forward. Per-segment fallback when
    the offset product would overflow int64."""
    n = len(vals)
    if n == 0:
        return vals.copy()
    seg = np.cumsum(new_seg) - 1
    lo = int(vals.min())
    span = int(vals.max()) - lo + 1
    nseg = int(seg[-1]) + 1
    if span * nseg < 2 ** 62:
        shifted = (vals - lo) + seg * span
        run = np.maximum.accumulate(shifted)
        return (run - seg * span) + lo
    out = vals.copy()
    starts = np.flatnonzero(new_seg)
    ends = np.append(starts[1:], n)
    for s, e in zip(starts, ends):
        np.maximum.accumulate(vals[s:e], out=out[s:e])
    return out


def seg_searchsorted(t: np.ndarray, q: np.ndarray, lo0: np.ndarray,
                     hi0: np.ndarray, *, side: str = "left") -> np.ndarray:
    """Per-row binary search in ``t`` restricted to ``[lo0[i], hi0[i])``:
    the first index whose value is ``>= q[i]`` (side='left') or ``> q[i]``
    (side='right'); ``hi0[i]`` when none. ``t`` must be non-decreasing
    within each ``[lo0, hi0)`` range. Runs ceil(log2(max range)) fully
    vectorized bisection rounds — exact, no overflow, no composite-key
    encoding needed."""
    lo = lo0.astype(np.int64, copy=True)
    hi = hi0.astype(np.int64, copy=True)
    right = side == "right"
    while True:
        active = lo < hi
        if not active.any():
            return lo
        mid = (lo + hi) >> 1
        cond = np.zeros(len(lo), dtype=bool)
        ma = mid[active]
        cond[active] = (t[ma] > q[active]) if right else (t[ma] >= q[active])
        hi = np.where(active & cond, mid, hi)
        lo = np.where(active & ~cond, mid + 1, lo)
