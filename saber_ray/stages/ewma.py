"""Per-key exponentially-weighted moving average (EWMA).

The smoothing recurrence ``y_i = (1-α)·y_{i-1} + α·x_i`` (``adjust=False``)
or the weighted-prefix form ``y_i = Σ (1-α)^{i-j} x_j / Σ (1-α)^{i-j}``
(``adjust=True``, pandas semantics) — the classic smoothed-metric /
trend-feature operator. It is ORDER-DEPENDENT, so it cannot ride the
mergeable partial algebra (core/aggregates.py); like the rolling/rank
family it uses ONE sort exchange on the key (equal keys co-locate per
Ray's sort boundary semantics) and a per-block vectorized kernel.

Kernel: a linear recurrence ``y_r = b·y_{r-1} + c_r`` has the closed form
``y_r = b^r · Σ c_q b^{-q}``, but ``b^{-q}`` overflows for long series —
so the scan runs in CHUNKS of L rows (L sized so ``b^{-L}`` stays inside
float64), each chunk fully vectorized: local exponents, segmented cumsum
(reset at key-segment starts via one subtract-at-boundary), and a scalar
carry for the single segment that straddles the chunk boundary. The loop
is over n/L chunks, never over rows or keys.

NULL semantics: NULL x emits NULL and does NOT touch the state (the
smoothing sequence is the non-null subsequence — pandas
``ignore_na=True``). Determinism: ``order_by`` must totally order each
key's rows (e.g. a unique timestamp or (ts, id)); ties would make the
result partitioning-dependent, so give a tiebreaker.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _chunked_scan(c: np.ndarray, seg_first: np.ndarray, b: float,
                  L: int) -> np.ndarray:
    """y_r = b*y_{r-1} + c_r with resets at segment starts (seg_first[r] =
    index of r's segment start). Chunked closed-form scan, vectorized per
    chunk; one float carry per chunk boundary (at most one straddling
    segment)."""
    n = len(c)
    y = np.empty(n, dtype=np.float64)
    carry = 0.0                  # y at the last row of the previous chunk
    carry_seg = -1               # that row's segment start
    for lo in range(0, n, L):
        hi = min(lo + L, n)
        cc = c[lo:hi]
        sf = seg_first[lo:hi]
        f = np.arange(hi - lo, dtype=np.float64)      # local exponent
        binv = b ** (-f)
        cs = np.cumsum(cc * binv)
        # segmented reset: subtract the cumsum just before each row's
        # segment start (0 when the segment starts at/before chunk lo)
        start_local = np.maximum(sf - lo, 0)
        base = np.where(start_local > 0, cs[start_local - 1], 0.0)
        yy = (b ** f) * (cs - base)
        # seed for the segment straddling the chunk entry
        if carry_seg >= 0:
            straddle = sf == carry_seg
            yy = np.where(straddle, yy + carry * b ** (f + 1.0), yy)
        y[lo:hi] = yy
        carry = y[hi - 1]
        carry_seg = seg_first[hi - 1]
    return y


def ewma_block(x: np.ndarray, seg_id: np.ndarray, *, alpha: float,
               adjust: bool) -> np.ndarray:
    """EWMA over a block: ``x`` float64 with NaN nulls, ``seg_id``
    non-decreasing int segment labels. Returns float64 with NaN at null
    positions; state skips nulls."""
    n = len(x)
    out = np.full(n, np.nan)
    valid = ~np.isnan(x)
    v = np.flatnonzero(valid)
    if not len(v):
        return out
    xv = x[v]
    sv = seg_id[v]
    new = np.concatenate(([True], sv[1:] != sv[:-1]))
    seg_first = np.maximum.accumulate(np.where(new, np.arange(len(v)), -1))
    b = 1.0 - alpha
    # chunk size: keep b^-L finite with headroom
    L = 4096 if b >= 0.995 else max(8, min(4096, int(250.0 / -np.log10(b))))
    if adjust:
        s = _chunked_scan(xv, seg_first, b, L)
        w = _chunked_scan(np.ones(len(v)), seg_first, b, L)
        yv = s / w
    else:
        # y_first = x_first; later rows contribute alpha*x
        c = np.where(new, xv, alpha * xv)
        # recurrence with reset: the closed form already resets at segment
        # starts, and `c` at a start is the full x (seed)
        yv = _chunked_scan(c, seg_first, b, L)
    out[v] = yv
    return out


def ewma(
    ds, col: str, *,
    keys: Sequence[str] | str,
    order_by: Sequence[str] | str,
    alpha: float,
    adjust: bool = False,
    alias: Optional[str] = None,
    keep: Sequence[str] = (),
    shuffle_partitions: Optional[int] = None,
):
    """Append ``alias`` (default ``{col}_ewma``) with the per-key EWMA of
    ``col`` in ``order_by`` order. Output columns: keys, order_by, keep,
    alias (float64; NULL where x is NULL)."""
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if not keys or not order_by:
        raise ValueError("ewma needs keys and order_by (a total order per "
                         "key — add a tiebreaker for determinism)")
    alias = alias or f"{col}_ewma"
    keep = [k for k in keep if k not in keys + order_by + [col]]
    from saber_ray.stages.window_agg import _encode_null_keys
    enc, dec, sort_keys = _encode_null_keys(keys)

    def prep(t: pa.Table) -> pa.Table:
        cols = dict.fromkeys(keys + order_by + [col] + list(keep))
        return enc(t.select(list(cols)))

    out_first = keys + order_by + list(keep)

    def per_block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            base = dec(g)
            return base.append_column(alias, pa.nulls(0, pa.float64())) \
                .select(out_first + [col, alias])
        g = g.sort_by([(k, "ascending") for k in sort_keys]
                      + [(o, "ascending") for o in order_by]) \
            .combine_chunks()
        from saber_ray.stages.resample import _segment_starts
        seg_new = _segment_starts(g, sort_keys)
        seg_id = np.cumsum(seg_new) - 1
        x = pc.cast(g[col], pa.float64()).to_numpy(zero_copy_only=False)
        y = ewma_block(x, seg_id, alpha=alpha, adjust=adjust)
        ok = ~np.isnan(y)
        arr = pc.if_else(pa.array(ok),
                         pa.array(np.where(ok, y, 0.0), pa.float64()),
                         pa.scalar(None, pa.float64()))
        g = g.append_column(alias, arr)
        return dec(g).select(out_first + [col, alias])

    import ray
    nparts = shuffle_partitions or max(
        8, int(ray.cluster_resources().get("CPU", 8)))
    return ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .repartition(nparts).sort(sort_keys) \
        .map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True)
