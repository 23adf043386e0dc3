"""Mergeable numeric statistics: correlation/covariance matrix and an
EXACT distributed linear regression (normal equations).

Both are the sufficient-statistics pattern (the same algebra as the
engine's aggregate merge, PartialResultSlot.java:186-212 in the
reference): each block reduces to one tiny moment row — n, Σx per
column, and the upper triangle of Σ(x·xᵀ) — a tree fan-in sums them,
and the driver finalizes. The corpus never leaves its scan tasks and
there is no shuffle; a 100 TB input ships #blocks × O(d²) floats.

- ``corr_matrix`` / same-pass covariance: pairwise Pearson r and sample
  covariance over the COMPLETE-CASE rows (rows with a null in ANY
  selected column are dropped — the single-filter semantics a moment
  matrix forces; per-pair DuckDB ``corr``/``covar_samp`` agree exactly
  on null-free data, the pytest oracle).
- ``fit_linear`` solves ordinary least squares from the same moments:
  (XᵀX)⁻¹ Xᵀy with an intercept column, numerically via lstsq on the
  assembled Gram matrix — bit-comparable to driver-side
  ``np.linalg.lstsq`` on the gathered data (pytest parity) without ever
  gathering it. ``predict_linear`` applies the weights per batch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _moment_partials(ds, cols: Sequence[str]):
    """Per-block complete-case moment row: n, sums, upper-tri products."""
    d = len(cols)
    iu = np.triu_indices(d)

    def partial(t: pa.Table) -> pa.Table:
        m = np.empty((t.num_rows, d), dtype=np.float64)
        mask = np.ones(t.num_rows, dtype=bool)
        for j, c in enumerate(cols):
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if col.null_count:
                mask &= col.is_valid().to_numpy(zero_copy_only=False)
                col = pc.fill_null(col, 0)
            m[:, j] = col.to_numpy(zero_copy_only=False)
        if not mask.all():
            m = m[mask]
        prods = (m.T @ m)[iu]
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "sums": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
            "prods": pa.array([prods], pa.list_(pa.float64()))})

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)


def _collect_moments(ds, cols: Sequence[str]):
    """(n, sums d-vector, full d×d product matrix) — driver-side sum of
    the tiny per-block rows."""
    d = len(cols)
    iu = np.triu_indices(d)
    n = 0
    sums = np.zeros(d)
    tri = np.zeros(len(iu[0]))
    for b in _moment_partials(ds, cols).iter_batches(
            batch_format="pyarrow"):
        n += int(pc.sum(b["n"]).as_py())
        s = b["sums"].combine_chunks()
        sums += s.flatten().to_numpy(zero_copy_only=False) \
            .reshape(-1, d).sum(axis=0)
        p = b["prods"].combine_chunks()
        tri += p.flatten().to_numpy(zero_copy_only=False) \
            .reshape(-1, len(iu[0])).sum(axis=0)
    xtx = np.zeros((d, d))
    xtx[iu] = tri
    xtx.T[iu] = tri
    return n, sums, xtx


def corr_matrix(ds, cols: Sequence[str], *, covariance: bool = False
                ) -> pa.Table:
    """Pairwise Pearson correlation (or sample covariance) over the
    complete-case rows of ``cols``. Returns a tiny table: one row per
    column — ``column`` + one float64 column per input column. One pass,
    no shuffle; oracle: DuckDB ``corr`` / ``covar_samp`` per pair."""
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    n, sums, xtx = _collect_moments(ds, cols)
    if n < 2:
        raise ValueError(f"need >= 2 complete rows, got {n}")
    mean = sums / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    if covariance:
        out = cov
    else:
        sd = np.sqrt(np.diag(cov))
        denom = np.outer(sd, sd)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = cov / denom
        out[denom == 0] = np.nan       # constant column: r undefined
    tbl = {"column": pa.array(cols, pa.string())}
    for j, c in enumerate(cols):
        tbl[c] = pa.array(out[:, j], pa.float64())
    return pa.table(tbl)


def fit_linear(ds, features: Sequence[str], target: str, *,
               intercept: bool = True) -> dict:
    """Exact OLS over the complete-case rows: returns ``{"features":
    [...], "weights": np.ndarray, "intercept": float, "n": int}``. The
    normal-equation moments come from one shuffle-free pass; the d+1-dim
    solve happens on the driver (lstsq — minimum-norm under perfect
    collinearity, same convention as numpy on the raw data)."""
    features = list(features)
    if not features:
        raise ValueError("fit_linear needs at least one feature")
    cols = features + [target]
    n, sums, xtx = _collect_moments(ds, cols)
    d = len(features)
    if n < d + (1 if intercept else 0):
        raise ValueError(f"need more complete rows than parameters "
                         f"(got {n})")
    # assemble the Gram system for [features (+ 1)] against target
    if intercept:
        g = np.zeros((d + 1, d + 1))
        g[:d, :d] = xtx[:d, :d]
        g[:d, d] = sums[:d]
        g[d, :d] = sums[:d]
        g[d, d] = n
        b = np.concatenate([xtx[:d, d], [sums[d]]])
    else:
        g = xtx[:d, :d]
        b = xtx[:d, d]
    w = np.linalg.lstsq(g, b, rcond=None)[0]
    return {"features": features,
            "weights": w[:d],
            "intercept": float(w[d]) if intercept else 0.0,
            "n": n}


def predict_linear(ds, model: dict, *, out_col: str = "prediction",
                   keep: Optional[Sequence[str]] = None):
    """Apply a ``fit_linear`` model per batch (one matmul): output =
    ``keep`` columns (default: the feature/target-free id-ish passthrough
    is up to the caller) + ``out_col`` float64."""
    feats = list(model["features"])
    w = np.asarray(model["weights"], dtype=np.float64)
    b = float(model["intercept"])
    keep = list(keep) if keep else []

    def f(t: pa.Table) -> pa.Table:
        fields = [(c, t.schema.field(c).type) for c in keep] + \
            [(out_col, pa.float64())]
        schema = pa.schema(fields)
        if t.num_rows == 0:
            return schema.empty_table()
        m = np.empty((t.num_rows, len(feats)), dtype=np.float64)
        for j, c in enumerate(feats):
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            m[:, j] = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        pred = m @ w + b
        arrs = [t[c] for c in keep] + [pa.array(pred, pa.float64())]
        return pa.Table.from_arrays(
            [(a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
             for a in arrs], schema=schema)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
