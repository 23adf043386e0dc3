"""Per-group numeric feature scaling: z-score / min-max ``normalize`` and
quantile-clipping ``winsorize``.

Training pipelines scale features before packing (z-score for model
inputs, min-max for bounded scores) and clip outliers at grouped
percentiles (winsorization) so one corrupt document can't dominate a
quality threshold. Reference parity: compositions of Saber's aggregate +
projection operators (AggregationType.java:3-5 + Projection.java:12-84) —
the reference computes the moments per window; these stages compute them
per GROUP and apply them back to every row.

Ray-native plan (both stages): the grouped statistics are DIMENSION-SIZED
(one row per key group), so pass 1 reduces combiner-style inside
map_batches (one tiny partial per block) with a single fan-in merge —
no all-to-all; the merged stats table is ``ray.put`` once and every
pass-2 batch joins against it vectorized (Acero hash join on the
null-encoded keys). Documented assumption: key cardinality is
dimension-like (fits the driver / one task) — for million-group
normalization, compose ``grouped_quantiles``/windowed stats + a shuffle
join instead.

Float determinism (the oracle contract): with ``scale=s`` the z-score
moments accumulate as EXACT int64 ``round(x·10^s)`` power sums (sum and
sum-of-squares), so mean/var are a pure function of the data — the SQL
twin reproduces them bit-for-bit from DECIMAL sums via the same float ops
in the same order. min/max are order-independent and run on the raw
float column directly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

METHODS = ("zscore", "minmax")


def _enc_keys(keys):
    from saber_ray.stages.window_agg import _encode_null_keys
    return _encode_null_keys(keys)


def _combine_chunks(c):
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _stats_table(ds, keys, col, *, scale, want_moments, want_minmax):
    """One row per key group: n (non-null), exact int sums (scaled power
    sums when ``scale`` is set, float otherwise), float min/max — reduced
    combiner-style per block, merged once (tiny fan-in)."""
    enc, dec, sort_keys = _enc_keys(keys)

    DEC = pa.decimal128(38, 0)
    # per-element bound: xi*xi must fit int64 before the exact decimal sum
    XI_MAX = 3_037_000_499

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(_combine_chunks(t[col]), pa.float64())
        cols = {k: t[k] for k in keys}
        cols["__n"] = pc.cast(pc.is_valid(x), pa.int64())
        if want_moments:
            if scale is not None:
                valid = pc.is_valid(x)
                xi = pc.cast(pc.round(pc.multiply(
                    pc.fill_null(x, 0.0), pa.scalar(10.0 ** scale))),
                    pa.int64())
                xi = pc.if_else(valid, xi, pa.scalar(0, pa.int64()))
                xin = xi.to_numpy(zero_copy_only=False)
                if len(xin) and np.abs(xin).max() > XI_MAX:
                    raise ValueError(
                        f"|{col}|*10^{scale} exceeds {XI_MAX} — xi^2 "
                        f"would overflow int64; use a smaller scale")
                # SUMS accumulate as decimal128(38,0) — exact int128-class
                # like DuckDB's SUM(BIGINT) -> HUGEINT, so giant groups /
                # 100 TB row counts cannot overflow the moments
                cols["__s"] = pc.cast(xi, DEC)
                cols["__ss"] = pc.cast(pc.multiply(xi, xi), DEC)
            else:
                valid = pc.is_valid(x)
                xi = pc.if_else(valid, pc.fill_null(x, 0.0),
                                pa.scalar(0.0))
                cols["__s"] = xi
                cols["__ss"] = pc.multiply(xi, xi)
        if want_minmax:
            cols["__min"] = x
            cols["__max"] = x
        tt = pa.table(cols)
        spec = [("__n", "sum")]
        if want_moments:
            spec += [("__s", "sum"), ("__ss", "sum")]
        if want_minmax:
            spec += [("__min", "min"), ("__max", "max")]
        from saber_ray.core.aggregates import group_by_null_safe
        g = group_by_null_safe(tt, keys, spec)
        ren = {f"{c}_{fn}": c for c, fn in spec}
        return enc(g.rename_columns(
            [ren.get(c, c) for c in g.column_names]))

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).repartition(1)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        nn = [f"__nn_{k}" for k in keys]
        spec = [("__n", "sum")]
        if want_moments:
            spec += [("__s", "sum"), ("__ss", "sum")]
        if want_minmax:
            spec += [("__min", "min"), ("__max", "max")]
        g = t.group_by(keys + nn).aggregate(spec)
        ren = {f"{c}_{fn}": c for c, fn in spec}
        return g.rename_columns([ren.get(c, c) for c in g.column_names])

    out = merged.map_batches(merge, batch_format="pyarrow",
                             zero_copy_batch=True)
    # dimension-sized result — collect as ARROW blocks (keeps the exact
    # decimal sum types; take_all would round-trip through Python objects)
    blocks = [ray.get(r) for r in out.to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return None
    return pa.concat_tables(blocks, promote_options="default") \
        .combine_chunks()


def _join_stats(t: pa.Table, stats: pa.Table, keys, enc) -> pa.Table:
    """Vectorized per-batch lookup of each row's group stats (Acero hash
    join on the null-encoded keys; row order restored)."""
    te = enc(t.select(keys)) if keys else None
    if not keys:
        # single global group: broadcast scalars
        n = t.num_rows
        out = t
        for c in stats.column_names:
            out = out.append_column(
                c, pa.array([stats[c][0].as_py()] * n,
                            type=stats.schema.field(c).type))
        return out
    nn = [f"__nn_{k}" for k in keys]
    left = te.append_column("__row", pa.array(np.arange(t.num_rows)))
    j = left.join(stats, keys=keys + nn, join_type="left outer") \
        .sort_by("__row")
    out = t
    for c in stats.column_names:
        if c in keys + nn:
            continue
        out = out.append_column(c, _combine_chunks(j[c]))
    return out


def normalize(
    ds, col: str, *,
    keys: Sequence[str] | str = (),
    method: str = "zscore",
    scale: Optional[int] = None,
    alias: Optional[str] = None,
    round_decimals: Optional[int] = None,
):
    """Append ``alias`` (default ``{col}_{method}``) with the per-group
    scaled value: ``(x - mean) / stddev_samp`` (zscore) or
    ``(x - min) / (max - min)`` (minmax). NULL x → NULL; zero
    stddev / zero range / group size 1 → NULL (NULLIF twin semantics).
    ``scale=s`` makes the zscore moments exact (module docstring)."""
    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}, got {method!r}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    alias = alias or f"{col}_{method}"
    want_moments = method == "zscore"
    stats = _stats_table(ds, keys, col, scale=scale,
                         want_moments=want_moments,
                         want_minmax=not want_moments)
    if stats is None:
        return ds.limit(0)
    enc, dec, _ = _enc_keys(keys)
    stats_ref = ray.put(stats)
    descale = 10.0 ** scale if scale is not None else 1.0

    def apply(t: pa.Table, _ref=stats_ref) -> pa.Table:
        st = ray.get(_ref)
        j = _join_stats(t, st, keys, enc)
        x = pc.cast(_combine_chunks(t[col]), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        n = pc.cast(j["__n"], pa.float64()).to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            if method == "zscore":
                s = pc.cast(j["__s"], pa.float64()) \
                    .to_numpy(zero_copy_only=False) / descale
                ss = pc.cast(j["__ss"], pa.float64()) \
                    .to_numpy(zero_copy_only=False) / (descale * descale)
                mean = s / n
                var = (ss - (s * s) / n) / (n - 1.0)
                var = np.where(var < 0.0, 0.0, var)   # cancellation guard
                std = np.sqrt(var)
                out = (x - mean) / std
                ok = (n > 1.0) & (std > 0.0)
            else:
                lo = pc.cast(j["__min"], pa.float64()) \
                    .to_numpy(zero_copy_only=False)
                hi = pc.cast(j["__max"], pa.float64()) \
                    .to_numpy(zero_copy_only=False)
                rng = hi - lo
                out = (x - lo) / rng
                ok = rng > 0.0
        ok &= np.isfinite(out)
        if round_decimals is not None:
            out = np.round(out, round_decimals)
        arr = pc.if_else(pa.array(ok & ~np.isnan(x)),
                         pa.array(np.where(np.isnan(out), 0.0, out),
                                  pa.float64()),
                         pa.scalar(None, pa.float64()))
        return t.append_column(alias, arr)

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)


def winsorize(
    ds, col: str, *,
    keys: Sequence[str] | str = (),
    p: tuple[float, float] = (0.01, 0.99),
    alias: Optional[str] = None,
):
    """Append ``alias`` (default ``{col}_winsor``) with ``col`` clipped to
    its per-group discrete quantiles [p_lo, p_hi] (quantile_disc — actual
    data values, so the clip is float-exact against the SQL twin
    ``GREATEST(LEAST(x, q_hi), q_lo)``). NULL x stays NULL; an all-NULL
    group's quantiles are NULL and clip nothing (GREATEST/LEAST skip
    NULLs, DuckDB semantics)."""
    lo, hi = p
    if not (0.0 < lo <= hi <= 1.0):
        raise ValueError(f"need 0 < p_lo <= p_hi <= 1, got {p}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    alias = alias or f"{col}_winsor"
    from saber_ray.stages.stats import grouped_quantiles
    qt = grouped_quantiles(ds, keys or [], col,
                           {"__qlo": lo, "__qhi": hi}) if keys else None
    if keys:
        parts = qt.take_all()                      # dimension-sized
        if not parts:
            return ds.limit(0)
        stats = pa.Table.from_pylist(parts)
        enc, dec, _ = _enc_keys(keys)
        stats = enc(stats)
    else:
        # global quantiles: same exact kernel, one synthetic group
        tagged = ds.map_batches(
            lambda t: t.append_column("__g", pa.array(
                np.zeros(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow", zero_copy_batch=True)
        parts = grouped_quantiles(tagged, ["__g"], col,
                                  {"__qlo": lo, "__qhi": hi}).take_all()
        if not parts:
            return ds.limit(0)
        stats = pa.Table.from_pylist(parts).drop_columns(["__g"])
        enc = None
    stats_ref = ray.put(stats)

    def apply(t: pa.Table, _ref=stats_ref) -> pa.Table:
        st = ray.get(_ref)
        if keys:
            j = _join_stats(t, st, keys, enc)
            qlo, qhi = j["__qlo"], j["__qhi"]
        else:
            qlo = pa.array([st["__qlo"][0].as_py()] * t.num_rows,
                           type=pa.float64())
            qhi = pa.array([st["__qhi"][0].as_py()] * t.num_rows,
                           type=pa.float64())
        x = pc.cast(_combine_chunks(t[col]), pa.float64())
        clipped = pc.max_element_wise(
            pc.min_element_wise(x, pc.cast(qhi, pa.float64())),
            pc.cast(qlo, pa.float64()))
        # NULL x must stay NULL (min/max_element_wise skip nulls)
        clipped = pc.if_else(pc.is_valid(x), clipped,
                             pa.scalar(None, pa.float64()))
        return t.append_column(alias, clipped)

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)
