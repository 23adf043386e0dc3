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

Scale note: the exact path requires a group to fit one block (same
assumption as sessions — keys like ``lang``/``conv_id`` are bounded). For
GIANT groups — a single ``lang='en'`` spanning most of a 100 TB corpus —
pass ``approx=True``: per-block mergeable sketches (an MRL/KLL-style
multi-level quantile sketch + a KMV distinct sketch) flow through the same
null-safe exchange, so only O(sketch) bytes per (block, group) shuffle and
no group ever needs to fit anywhere. Both sketches are EXACT until their
capacity (values ≤ sketch capacity / distincts < kmv_k), which is what the
driver gate exploits: at gate scale the approx path is bit-identical to the
exact path and thus fully value-oracled; the giant-group regime is
property-tested for rank error instead.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class QuantileSketch:
    """Mergeable rank sketch (MRL/KLL family: Manku-Rajagopalan-Lindsay '98,
    Karnin-Lang-Liberty '16 — public algorithms). Items live in levels; an
    item at level h represents 2^h original values. A full level is sorted
    and every other element (random offset, seeded rng — deterministic
    pipeline) promotes to level h+1. EXACT while total values ≤ capacity k
    (never compacts); rank error O(levels / k) after.

    Query rule matches DuckDB ``quantile_disc``: smallest item whose
    cumulative weight ≥ ceil(q · W) — identical to the exact path's
    ``ceil(q·n)-1`` index when all weights are 1.
    """

    __slots__ = ("k", "levels", "n", "rng")

    def __init__(self, k: int, seed: int = 42):
        self.k = int(k)
        self.levels: list[np.ndarray] = []
        self.n = 0                       # non-null values represented
        self.rng = np.random.default_rng(seed)

    def add(self, vals: np.ndarray) -> None:
        if len(vals) == 0:
            return
        self.n += len(vals)
        if not self.levels:
            self.levels.append(vals.copy())
        else:
            self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compact()

    def merge(self, other: "QuantileSketch") -> None:
        self.n += other.n
        for h, lv in enumerate(other.levels):
            if len(lv) == 0:
                continue
            while len(self.levels) <= h:
                self.levels.append(np.empty(0, dtype=lv.dtype))
            self.levels[h] = np.concatenate([self.levels[h], lv]) \
                if len(self.levels[h]) else lv.copy()
        self._compact()

    def _compact(self) -> None:
        h = 0
        while h < len(self.levels):
            lv = self.levels[h]
            if len(lv) > self.k:
                lv = np.sort(lv, kind="stable")
                off = int(self.rng.integers(2))
                promoted = lv[off::2]
                self.levels[h] = np.empty(0, dtype=lv.dtype)
                if len(self.levels) <= h + 1:
                    self.levels.append(promoted)
                else:
                    self.levels[h + 1] = np.concatenate(
                        [self.levels[h + 1], promoted]) \
                        if len(self.levels[h + 1]) else promoted
            h += 1

    def query(self, qs: Sequence[float]) -> list:
        """disc quantiles for each q; [] sentinel-free — None per q if empty."""
        items = [(lv, 1 << h) for h, lv in enumerate(self.levels) if len(lv)]
        if not items:
            return [None] * len(qs)
        vals = np.concatenate([lv for lv, _ in items])
        wts = np.concatenate([np.full(len(lv), w, dtype=np.int64)
                              for lv, w in items])
        order = np.argsort(vals, kind="stable")
        vals, cum = vals[order], np.cumsum(wts[order])
        total = cum[-1]
        out = []
        for q in qs:
            target = max(1, int(np.ceil(q * total)))
            out.append(vals[np.searchsorted(cum, target)].item())
        return out


class KmvSketch:
    """K-minimum-values distinct sketch (Bar-Yossef et al. '02 — public).
    Keeps the k smallest distinct 64-bit hashes. EXACT below k distincts
    (modulo 64-bit hash collisions, ~n²/2⁶⁴ — negligible and documented);
    above, estimate (k-1)/kth_min with relative std ≈ 1/√k."""

    __slots__ = ("k", "hashes")

    def __init__(self, k: int):
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        u = np.union1d(self.hashes, h.astype(np.uint64))   # sorted unique
        self.hashes = u[:self.k]

    def merge(self, other: "KmvSketch") -> None:
        self.add_hashes(other.hashes)

    def estimate(self) -> int:
        m = len(self.hashes)
        if m < self.k:
            return m                                       # exact regime
        kth = float(self.hashes[self.k - 1]) / float(2**64)
        return int(round((self.k - 1) / kth)) if kth > 0 else m


def _value_hashes(vals: np.ndarray) -> np.ndarray:
    import pandas as pd
    return pd.util.hash_array(
        vals if vals.dtype != object else np.asarray(vals, dtype=object)
    ).astype(np.uint64)


def grouped_quantiles(ds, keys: Sequence[str] | str, col: str,
                      quantiles: dict[str, float], *,
                      count_distinct_alias: Optional[str] = None,
                      count_alias: Optional[str] = None,
                      approx: bool = False, sketch_k: int = 4096,
                      kmv_k: int = 4096, seed: int = 42,
                      interpolate: bool = False):
    """One row per key group with exact discrete quantiles of ``col``.

    ``quantiles``: output alias → q in (0, 1]. SQL semantics throughout:
    NULL values of ``col`` are skipped by the quantile / count-distinct
    kernels but the rows still reach the shuffle, so ``count_alias`` is
    ``COUNT(*)`` and a group whose values are all NULL is kept (its
    quantiles are NULL, distinct-count 0). NULL keys form one group
    (null-safe encoding).

    ``approx=True`` switches to the mergeable-sketch path (module
    docstring): identical output schema and semantics, exact until
    ``sketch_k`` values / ``kmv_k`` distincts per group, then bounded-error
    approximate — the only path that survives a group larger than a block.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if interpolate and approx:
        raise ValueError("interpolate is exact-path only (the sketch keeps "
                         "discrete ranks)")
    if approx:
        return _grouped_quantiles_sketch(
            ds, keys, col, quantiles,
            count_distinct_alias=count_distinct_alias,
            count_alias=count_alias, sketch_k=sketch_k, kmv_k=kmv_k,
            seed=seed)
    qitems = list(quantiles.items())
    from saber_ray.stages.window_agg import _encode_null_keys
    enc, dec, sort_keys = _encode_null_keys(keys)

    def prep(t: pa.Table) -> pa.Table:
        return t.select(keys + [col])

    def per_block(g: pa.Table) -> pa.Table:
        from saber_ray.stages.dedup import _runs
        qtype = (pa.float64() if interpolate
                 else g.schema.field(col).type)   # quantile_cont is DOUBLE
        if interpolate and (pa.types.is_string(g.schema.field(col).type)
                            or pa.types.is_large_string(
                                g.schema.field(col).type)):
            raise ValueError("interpolate requires a numeric column")
        out_fields = [(k, g.schema.field(k).type) for k in sort_keys] + \
            [(a, qtype) for a, _ in qitems]
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
            # quantiles need LEXICOGRAPHIC order: dictionary codes are
            # first-appearance order, so remap them through the sorted
            # dictionary (tiny — one C-level sort over distinct values)
            d = vcol.dictionary_encode()
            dorder = pc.sort_indices(d.dictionary).to_numpy(
                zero_copy_only=False)
            rank_of = np.empty(len(dorder), dtype=np.int64)
            rank_of[dorder] = np.arange(len(dorder), dtype=np.int64)
            codes = pc.fill_null(d.indices.cast(pa.int64()), 0) \
                .to_numpy(zero_copy_only=False)
            vals = rank_of[codes] if len(dorder) \
                else np.zeros(g.num_rows, dtype=np.int64)  # all-NULL column
        else:
            # fill BEFORE to_numpy: nullable ints stage through float NaN
            # and corrupt (>2^53) otherwise
            vals = pc.fill_null(vcol, 0).to_numpy(zero_copy_only=False)
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
            if interpolate:
                # quantile_cont: linear interpolation at rank q*(n-1)
                p = q * np.maximum(nvalid - 1, 0).astype(np.float64)
                lo = np.floor(p).astype(np.int64)
                hi = np.minimum(lo + 1, np.maximum(nvalid - 1, 0))
                frac = p - lo
                vlo = vsorted[starts + lo].astype(np.float64)
                vhi = vsorted[starts + hi].astype(np.float64)
                cols[alias] = pa.array(vlo + frac * (vhi - vlo),
                                       type=pa.float64(), mask=empty)
            else:
                idx = starts + np.minimum(
                    np.maximum(nvalid - 1, 0),
                    np.maximum(0, np.ceil(q * nvalid).astype(np.int64) - 1))
                cols[alias] = vcol.take(
                    pa.array(order[idx], mask=empty))  # NULL if no values
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


def _grouped_quantiles_sketch(ds, keys: list, col: str,
                              quantiles: dict[str, float], *,
                              count_distinct_alias: Optional[str],
                              count_alias: Optional[str],
                              sketch_k: int, kmv_k: int, seed: int):
    """Sketch path: map_batches builds ONE (QuantileSketch, KmvSketch,
    COUNT(*)) row per (block, group); the same null-safe sort exchange
    co-locates a group's sketch rows (O(blocks-touching-group) tiny rows,
    never the values); a per-block pass merges and finalizes. The per-group
    Python loop here is over groups-per-block, which is small in the
    giant-group regime this path exists for (few huge keys); high-cardinality
    small groups belong on the exact path."""
    import pickle

    qitems = list(quantiles.items())
    from saber_ray.stages.window_agg import _encode_null_keys
    enc, dec, sort_keys = _encode_null_keys(keys)

    def _group_arrays(g: pa.Table):
        """(kcols list, order, starts, ends) over encoded (non-null) keys."""
        from saber_ray.stages.dedup import _runs
        kcols = []
        for k in sort_keys:
            c = g[k].combine_chunks()
            if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
                kcols.append(c.dictionary_encode().indices
                             .to_numpy(zero_copy_only=False))
            else:
                kcols.append(c.to_numpy(zero_copy_only=False))
        order = np.lexsort(tuple(kcols[::-1]))
        starts, ends = _runs(*[kc[order] for kc in kcols])
        return order, starts, ends

    def partial(g: pa.Table) -> pa.Table:
        schema = pa.schema([(k, g.schema.field(k).type) for k in sort_keys]
                           + [("__sk", pa.binary())])
        if g.num_rows == 0:
            return schema.empty_table()
        g = g.combine_chunks()
        order, starts, ends = _group_arrays(g)
        vcol = g[col].combine_chunks()
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)[order]
        vals = pc.fill_null(vcol, 0).to_numpy(zero_copy_only=False) \
            if vcol.null_count else vcol.to_numpy(zero_copy_only=False)
        vals = vals[order]
        blobs = []
        for s, e in zip(starts, ends):           # loop over GROUPS, not rows
            v = vals[s:e][valid[s:e]]
            qs = QuantileSketch(sketch_k, seed)
            qs.add(v)
            kmv = KmvSketch(kmv_k)
            kmv.add_hashes(np.unique(_value_hashes(v)))
            blobs.append(pickle.dumps(
                (int(e - s), qs.n, qs.levels, kmv.hashes, vals.dtype)))
        key_arrs = [g[k].combine_chunks().take(pa.array(order[starts]))
                    for k in sort_keys]
        return pa.table(key_arrs + [pa.array(blobs, type=pa.binary())],
                        schema=schema)

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            # quantile dtype unknown without data; int64 placeholder (an
            # empty block only ever unifies with non-empty ones on collect)
            return pa.schema(
                [(k, g.schema.field(k).type) for k in sort_keys]
                + [(a, pa.int64()) for a, _ in qitems]
                + ([(count_distinct_alias, pa.int64())]
                   if count_distinct_alias else [])
                + ([(count_alias, pa.int64())] if count_alias else [])
            ).empty_table()
        import pickle as _p
        g = g.combine_chunks()
        order, starts, ends = _group_arrays(g)
        blobs = g["__sk"].combine_chunks().to_pylist()
        qvals: list[list] = [[] for _ in qitems]
        nds, ns = [], []
        np_dtype = None
        for s, e in zip(starts, ends):
            qs = QuantileSketch(sketch_k, seed + 1)  # merge-side rng stream
            kmv = KmvSketch(kmv_k)
            n_all = 0
            for i in order[s:e]:
                cnt_i, n_i, levels, hashes, dt = _p.loads(blobs[i])
                np_dtype = dt
                other = QuantileSketch(sketch_k, seed)
                other.levels, other.n = levels, n_i
                qs.merge(other)
                k2 = KmvSketch(kmv_k)
                k2.hashes = hashes
                kmv.merge(k2)
                n_all += cnt_i
            res = qs.query([q for _, q in qitems])
            for j, v in enumerate(res):
                qvals[j].append(v)
            nds.append(kmv.estimate())
            ns.append(n_all)
        qtype = pa.from_numpy_dtype(np_dtype) if np_dtype is not None \
            else pa.int64()
        cols = [g[k].combine_chunks().take(pa.array(order[starts]))
                for k in sort_keys]
        names = list(sort_keys)
        for j, (alias, _) in enumerate(qitems):
            cols.append(pa.array(qvals[j], type=qtype))
            names.append(alias)
        if count_distinct_alias:
            cols.append(pa.array(nds, type=pa.int64()))
            names.append(count_distinct_alias)
        if count_alias:
            cols.append(pa.array(ns, type=pa.int64()))
            names.append(count_alias)
        return pa.table(cols, names=names)

    def prep(t: pa.Table) -> pa.Table:
        vt = t.schema.field(col).type
        if pa.types.is_string(vt) or pa.types.is_large_string(vt):
            raise ValueError("approx grouped_quantiles supports numeric "
                             "value columns only")
        return t.select(keys + [col])

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(enc, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .sort(sort_keys) \
        .map_batches(final, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# dataset profiling
# ---------------------------------------------------------------------------

def profile(ds, columns: Sequence[str] | None = None, *,
            kmv_k: int = 4096, round_decimals: int = 6):
    """One summary row per column: ``column, n_rows, n_nulls, n_distinct,
    min_str, max_str, mean`` — the pre-training data-quality profile.

    Distributed shape: each block emits ONE partial row per column
    (counts, typed min/max, int64/float64 sums, and the column's KMV
    hash sketch as a list<uint64>); a tree fan-in (repartition(1))
    merges #blocks × #columns tiny rows — no shuffle, the data never
    leaves its scan tasks.

    - ``n_distinct`` is the KMV estimate — EXACT while a column's
      distinct count < ``kmv_k`` (modulo 64-bit hash collisions,
      ~n²/2⁶⁴), ±1/√k relative beyond. Size kmv_k to the exactness
      domain you need.
    - ``min_str`` / ``max_str`` compare in the SOURCE type (int64 stays
      exact past 2^53; strings lexicographic) and stringify only at
      finalize. ``mean`` is NULL for non-numeric columns; integer sums
      accumulate in int64.
    """
    import ray

    def partial(t: pa.Table) -> pa.Table:
        cols = list(columns) if columns else t.column_names
        rows = {"column": [], "n_rows": [], "n_nulls": [],
                "min_int": [], "max_int": [], "min_float": [],
                "max_float": [], "min_str": [], "max_str": [],
                "sum_int": [], "sum_float": [], "kmv": []}
        for c in cols:
            col = t[c]
            typ = col.type
            n = len(col)
            nulls = col.null_count
            valid = col.drop_null()
            vi = xa = fi = fa = si = sa = None
            sint = sflt = None
            if n > nulls:
                if pa.types.is_integer(typ):
                    # keep the SOURCE dtype (uint64 through .astype(int64)
                    # would silently wrap values > 2^63); the int64 partial
                    # columns then require the int64 domain — checked loudly
                    arr = valid.to_numpy(zero_copy_only=False)
                    vi, xa = int(arr.min()), int(arr.max())
                    if not (-(2 ** 63) <= vi and xa <= 2 ** 63 - 1):
                        raise ValueError(
                            f"profile: column {c!r} has values outside the "
                            "int64 domain — not supported")
                    sint = int(arr.astype(np.int64, copy=False).sum())
                    h = _value_hashes(arr)
                elif pa.types.is_floating(typ):
                    arr = valid.to_numpy(zero_copy_only=False).astype(np.float64)
                    fi, fa = float(arr.min()), float(arr.max())
                    sflt = float(arr.sum())
                    h = _value_hashes(arr)
                else:
                    # any other type (bool/temporal/binary/...) profiles on
                    # its STRING form: min/max are lexicographic on that
                    # form (chronological for ISO timestamps), distinct is
                    # unchanged (the cast is injective for these types)
                    try:
                        sarr = pc.cast(valid, pa.string())
                        arr = np.asarray(sarr.to_pylist(), dtype=object)
                    except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
                        arr = np.asarray([str(x) for x in valid.to_pylist()],
                                         dtype=object)
                    si, sa = min(arr), max(arr)
                    h = _value_hashes(arr)
            else:
                h = np.empty(0, dtype=np.uint64)
            kmv = KmvSketch(kmv_k)
            kmv.add_hashes(np.unique(h))
            rows["column"].append(c)
            rows["n_rows"].append(n)
            rows["n_nulls"].append(nulls)
            rows["min_int"].append(vi)
            rows["max_int"].append(xa)
            rows["min_float"].append(fi)
            rows["max_float"].append(fa)
            rows["min_str"].append(si)
            rows["max_str"].append(sa)
            rows["sum_int"].append(sint)
            rows["sum_float"].append(sflt)
            rows["kmv"].append(kmv.hashes)
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
            "min_int": pa.array(rows["min_int"], pa.int64()),
            "max_int": pa.array(rows["max_int"], pa.int64()),
            "min_float": pa.array(rows["min_float"], pa.float64()),
            "max_float": pa.array(rows["max_float"], pa.float64()),
            "min_str": pa.array(rows["min_str"], pa.string()),
            "max_str": pa.array(rows["max_str"], pa.string()),
            "sum_int": pa.array(rows["sum_int"], pa.int64()),
            "sum_float": pa.array(rows["sum_float"], pa.float64()),
            "kmv": pa.array(list(rows["kmv"]), pa.list_(pa.uint64())),
        })

    def fin(t: pa.Table) -> pa.Table:
        from saber_ray.core.aggregates import round_oracle_np
        # plain-Python merge of the tiny partial table (#blocks × #cols
        # rows): to_pandas would stage nullable int64 through float64 and
        # corrupt min/max/sum beyond 2^53 (the repo's recurring bug class)
        rows = t.to_pylist()
        by_col: dict = {}
        for r in rows:
            by_col.setdefault(r["column"], []).append(r)
        out = {"column": [], "n_rows": [], "n_nulls": [], "n_distinct": [],
               "min_str": [], "max_str": [], "mean": []}

        def vals(g, key):
            return [r[key] for r in g if r[key] is not None]

        for c in sorted(by_col):
            g = by_col[c]
            n = sum(r["n_rows"] for r in g)
            nulls = sum(r["n_nulls"] for r in g)
            kmv = KmvSketch(kmv_k)
            for r in g:
                kmv.add_hashes(np.asarray(r["kmv"], dtype=np.uint64))
            mn = mx = None
            if vals(g, "min_int"):
                mn, mx = str(min(vals(g, "min_int"))), \
                    str(max(vals(g, "max_int")))
            elif vals(g, "min_float"):
                mn, mx = str(min(vals(g, "min_float"))), \
                    str(max(vals(g, "max_float")))
            elif vals(g, "min_str"):
                mn, mx = min(vals(g, "min_str")), max(vals(g, "max_str"))
            mean = None
            if n > nulls:
                if vals(g, "sum_int"):
                    # float(exact int sum) FIRST, then divide — mirrors
                    # SQL CAST(SUM(...) AS DOUBLE) / COUNT(...)
                    mean = float(sum(vals(g, "sum_int"))) / (n - nulls)
                elif vals(g, "sum_float"):
                    mean = float(np.sum(np.asarray(
                        vals(g, "sum_float"), dtype=np.float64))) / (n - nulls)
                if mean is not None:
                    mean = float(round_oracle_np(np.array([mean]),
                                                 round_decimals)[0])
            out["column"].append(c)
            out["n_rows"].append(n)
            out["n_nulls"].append(nulls)
            out["n_distinct"].append(kmv.estimate())
            out["min_str"].append(mn)
            out["max_str"].append(mx)
            out["mean"].append(mean)
        return pa.table({
            "column": pa.array(out["column"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], pa.int64()),
            "min_str": pa.array(out["min_str"], pa.string()),
            "max_str": pa.array(out["max_str"], pa.string()),
            "mean": pa.array(out["mean"], pa.float64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .repartition(1) \
        .map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)
