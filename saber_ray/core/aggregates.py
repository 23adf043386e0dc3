"""Aggregation specs and the associative partial-merge algebra.

Parity target: Saber's ``AggregationType ∈ {MAX, MIN, CNT, SUM, AVG}``
(reference: cql/operators/AggregationType.java:3-5) and the fragment-merge
algebra of handlers/PartialResultSlot.java:186-212 — CNT/SUM add, MIN min,
MAX max, and AVG is carried as running (sum, count) partials and divided only
when a window completes (Aggregation.java:920-929). That merge path (not the
buggy per-batch switch fall-throughs, see SURVEY.md §2.5) is the semantics
implemented here.

A partial is a flat set of columns per (group key..., window_id):
``__p_{col}_sum/_cnt/_min/_max`` plus ``__p_rows`` (tuple count). Partials are
produced *inside* map_batches with vectorized ``pyarrow.Table.group_by`` and
merged (a) again inside the batch after pane→window expansion and (b) once
globally by Ray Data ``groupby().aggregate()`` — the only shuffle.

Null semantics are SQL's (sum/min/max/avg skip nulls; CNT(*) counts rows,
CNT(col) counts non-null) so the DuckDB oracle agrees; Saber's type system has
no nulls, making this a strict superset.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

CNT, SUM, AVG, MIN, MAX = "cnt", "sum", "avg", "min", "max"
# VAR/STD extend the reference's 5-op algebra with the classic mergeable
# (count, sum, sum-of-squares) moments — same associative adds, finalized
# as SQL var_samp/stddev_samp (NULL below 2 values). Float64 path only
# (variance has no exactness contract to protect with fixed-point).
VAR, STD = "var", "std"
# SKEW/KURT extend the same moment family one and two powers up: mergeable
# (count, Σx, Σx², Σx³[, Σx⁴]) partials, finalized as DuckDB's adjusted
# Fisher-Pearson skewness (NULL below 3 values) and sample excess kurtosis
# (NULL below 4) — both NULL on zero variance, like the SQL twins.
SKEW, KURT = "skew", "kurt"
# ARGMAX/ARGMIN (SQL MAX_BY/MIN_BY): the value of one column at the row
# where another column is maximal/minimal — "latest text per window",
# "cheapest supplier per part". Mergeable through the SAME associative
# max algebra: each row is encoded as ONE order-sortable string
# (16-hex sortable order key + '|' + type tag + sortable value payload),
# the partial is plain string MAX of the encoding, and finalize decodes
# the payload. Lexicographic max of the encoding == (max/min order,
# ties broken by MAX value) — deterministic, so a SQL twin can reproduce
# it exactly (DuckDB's own arg_max is scan-order-dependent under ties).
# Rows where EITHER column is NULL are ignored (the twin filters both).
ARGMAX, ARGMIN = "argmax", "argmin"

ROWS = "__p_rows"
_SQ = "__sqsrc_"                 # squared-source staging column prefix
_CB = "__cbsrc_"                 # cubed-source staging column prefix
_QD = "__qdsrc_"                 # fourth-power staging column prefix
_POW_PREFIX = {"sumsq": _SQ, "sumcube": _CB, "sumquad": _QD}
_AX = "__axsrc_"                 # arg-encoding staging column prefix (per alias)
_ARG_VALUE_TYPES = ("string", "int64", "float64", "timestamp")


@dataclass(frozen=True)
class AggSpec:
    op: str                    # cnt | sum | avg | min | max | ... | argmax
    column: Optional[str]      # None only for cnt → COUNT(*)
    alias: str
    scale: Optional[int] = None   # fixed-point decimal scale (see note below)
    order_col: Optional[str] = None   # argmax/argmin: the extremized column
    value_type: Optional[str] = None  # argmax/argmin: decode type of `column`

    def __post_init__(self):
        if self.op not in (CNT, SUM, AVG, MIN, MAX, VAR, STD, SKEW, KURT,
                           ARGMAX, ARGMIN):
            raise ValueError(f"unknown aggregation op {self.op!r}")
        if self.column is None and self.op != CNT:
            raise ValueError(f"{self.op} requires a column")
        if self.op in (VAR, STD, SKEW, KURT) and self.scale is not None:
            raise ValueError(f"{self.op} is float64-only (scale applies to "
                             f"the exact sum/avg/min/max paths)")
        if self.op in (ARGMAX, ARGMIN):
            if self.order_col is None:
                raise ValueError(f"{self.op} requires order_col")
            if self.value_type not in _ARG_VALUE_TYPES:
                raise ValueError(
                    f"{self.op} requires value_type ∈ {_ARG_VALUE_TYPES} "
                    f"(the decode type of {self.column!r}), got "
                    f"{self.value_type!r}")
            if self.scale is not None:
                raise ValueError(f"{self.op} carries original values — "
                                 f"scale does not apply")
        elif self.order_col is not None or self.value_type is not None:
            raise ValueError("order_col/value_type apply to argmax/argmin only")


# Fixed-point (scaled-decimal) aggregation — ``scale=s`` declares the column
# holds decimals with ≤ s fractional digits (currency etc.). Partials then
# accumulate round(v·10^s) as EXACT int64, and finalize descales — so the sum
# is bit-identical for ANY partitioning / merge order / cluster size, like
# SQL SUM(DECIMAL). Without it, float SUM/AVG is order-dependent at the last
# ulp, and when the true average lands exactly on a rounding-boundary tie
# (e.g. 2-decimal data: 4491.21/96 = 46.7834375 at 6 decimals) no float
# summation scheme can reproducibly match a SQL oracle — the oracle's own
# sequential float sum is a coin flip around the tie. Saber's reference has
# no decimals (3-type system, TupleSchema.java:5-8); this is a scale-path
# extension, and the merge algebra (PartialResultSlot.java:186-212) is
# unchanged — int sums use the same associative adds.

def cnt(column: Optional[str] = None, alias: Optional[str] = None) -> AggSpec:
    return AggSpec(CNT, column, alias or (f"cnt_{column}" if column else "cnt"))

def sum_(column: str, alias: Optional[str] = None, *,
         scale: Optional[int] = None) -> AggSpec:
    return AggSpec(SUM, column, alias or f"sum_{column}", scale)

def avg(column: str, alias: Optional[str] = None, *,
        scale: Optional[int] = None) -> AggSpec:
    return AggSpec(AVG, column, alias or f"avg_{column}", scale)

def min_(column: str, alias: Optional[str] = None, *,
         scale: Optional[int] = None) -> AggSpec:
    return AggSpec(MIN, column, alias or f"min_{column}", scale)

def max_(column: str, alias: Optional[str] = None, *,
         scale: Optional[int] = None) -> AggSpec:
    return AggSpec(MAX, column, alias or f"max_{column}", scale)

def var_(column: str, alias: Optional[str] = None) -> AggSpec:
    """Sample variance (SQL var_samp: /(n-1), NULL below 2 values)."""
    return AggSpec(VAR, column, alias or f"var_{column}")

def std_(column: str, alias: Optional[str] = None) -> AggSpec:
    """Sample standard deviation (SQL stddev_samp)."""
    return AggSpec(STD, column, alias or f"std_{column}")

def skew_(column: str, alias: Optional[str] = None) -> AggSpec:
    """Adjusted Fisher-Pearson skewness (DuckDB ``skewness``: NULL below
    3 values or on zero variance)."""
    return AggSpec(SKEW, column, alias or f"skew_{column}")

def kurt_(column: str, alias: Optional[str] = None) -> AggSpec:
    """Sample excess kurtosis (DuckDB ``kurtosis``: NULL below 4 values
    or on zero variance)."""
    return AggSpec(KURT, column, alias or f"kurt_{column}")

def arg_max_(column: str, order_col: str, alias: Optional[str] = None, *,
             value_type: str) -> AggSpec:
    """SQL MAX_BY(column, order_col): ``column``'s value on the row where
    ``order_col`` is maximal; ties on the order broken by MAX value (the
    deterministic twin: ``max(v) FILTER (WHERE o = max(o) over the group)``).
    Rows where either column is NULL are ignored."""
    return AggSpec(ARGMAX, column, alias or f"argmax_{column}",
                   order_col=order_col, value_type=value_type)

def arg_min_(column: str, order_col: str, alias: Optional[str] = None, *,
             value_type: str) -> AggSpec:
    """SQL MIN_BY: value at the MINIMUM of order_col, ties → MAX value."""
    return AggSpec(ARGMIN, column, alias or f"argmin_{column}",
                   order_col=order_col, value_type=value_type)


def scaled_columns(aggs: Sequence["AggSpec"]) -> dict[str, int]:
    """column → decimal scale for scaled aggregates (one scale per column).

    A column must be scaled consistently across every aggregate that reads
    it: apply_scales rewrites the SHARED source column to scaled ints, so an
    unscaled agg on the same column would silently see 10^s-inflated values.
    """
    out: dict[str, int] = {}
    for a in aggs:
        if a.column is None or a.scale is None:
            continue
        if out.setdefault(a.column, a.scale) != a.scale:
            raise ValueError(f"conflicting scales for column {a.column!r}")
    for a in aggs:
        if a.column in out and a.scale is None and a.op != CNT:
            raise ValueError(
                f"column {a.column!r} mixes scaled and unscaled aggregates; "
                f"give every non-count aggregate on it scale={out[a.column]}")
    return out


def apply_scales(tbl: pa.Table, scales: dict[str, int]) -> pa.Table:
    """Replace scaled source columns with exact int64 ``round(v * 10^s)``."""
    for colname, s in scales.items():
        if colname not in tbl.column_names:
            continue
        col = tbl[colname]
        if pa.types.is_integer(col.type) and s == 0:
            continue
        scaled = pc.round(pc.multiply(pc.cast(col, pa.float64()),
                                      pa.scalar(10.0 ** s)))
        idx = tbl.column_names.index(colname)
        tbl = tbl.set_column(idx, colname, pc.cast(scaled, pa.int64()))
    return tbl


# ---------------------------------------------------------------------------
# partial plan
# ---------------------------------------------------------------------------

def _p(colname: str, fn: str) -> str:
    return f"__p_{colname}_{fn}"


def partial_columns(aggs: Sequence[AggSpec]) -> dict[str, set[str]]:
    """Which partial functions each source column needs.

    argmax/argmin entries are keyed by their STAGED encoding column
    (``__axsrc_<alias>``, created by append_sq_columns) with the pseudo-fn
    ``amax`` — merged everywhere as a plain string max."""
    need: dict[str, set[str]] = {}
    for a in aggs:
        if a.column is None:
            continue
        if a.op in (ARGMAX, ARGMIN):
            need.setdefault(_AX + a.alias, set()).add("amax")
            continue
        fns = need.setdefault(a.column, set())
        if a.op in (SUM, AVG, VAR, STD, SKEW, KURT):
            fns.add("sum")
        if a.op in (AVG, CNT, VAR, STD, SKEW, KURT):
            fns.add("cnt")
        if a.op in (VAR, STD, SKEW, KURT):
            fns.add("sumsq")
        if a.op in (SKEW, KURT):
            fns.add("sumcube")
        if a.op == KURT:
            fns.add("sumquad")
        if a.op == MIN:
            fns.add("min")
        if a.op == MAX:
            fns.add("max")
    return need


def sq_columns(aggs: Sequence[AggSpec]) -> list[str]:
    """Source columns that need a squared staging column for sumsq."""
    return sorted({a.column for a in aggs
                   if a.op in (VAR, STD, SKEW, KURT)})


def append_sq_columns(tbl: pa.Table, aggs: Sequence[AggSpec]) -> pa.Table:
    """Stage ``__sqsrc_<col>`` = float64(x)² next to each moment source —
    plus x³ / x⁴ for skew/kurt sources — before the partial group_by
    (Arrow has no sum-of-powers kernel). Also stages ``__axsrc_<alias>``
    order-sortable encodings for argmax/argmin."""
    cube = {a.column for a in aggs if a.op in (SKEW, KURT)}
    quad = {a.column for a in aggs if a.op == KURT}
    for c in sq_columns(aggs):
        x = pc.cast(tbl[c], pa.float64())
        x2 = pc.multiply(x, x)
        tbl = tbl.append_column(_SQ + c, x2)
        if c in cube:
            x3 = pc.multiply(x2, x)
            tbl = tbl.append_column(_CB + c, x3)
            if c in quad:
                tbl = tbl.append_column(_QD + c, pc.multiply(x3, x))
    for a in aggs:
        if a.op in (ARGMAX, ARGMIN):
            tbl = tbl.append_column(
                _AX + a.alias,
                _arg_encode(tbl[a.order_col], tbl[a.column],
                            a.value_type, invert=(a.op == ARGMIN)))
    return tbl


def _sortable_u64(col) -> "tuple":
    """(uint64 codes whose unsigned order == the column's SQL order,
    validity bool ndarray). Ints/timestamps: bias by 2^63; float64: the
    IEEE-754 total-order flip (sign bit set for non-negatives, all bits
    inverted for negatives — NaNs don't occur in SQL-comparable inputs)."""
    import numpy as np
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    if pa.types.is_floating(col.type):
        x = pc.fill_null(pc.cast(col, pa.float64()), 0.0) \
            .to_numpy(zero_copy_only=False)
        b = x.view(np.uint64)
        u = np.where(b >> np.uint64(63) == 1, ~b,
                     b | np.uint64(1 << 63))
    else:
        x = pc.fill_null(pc.cast(col, pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        u = x.view(np.uint64) ^ np.uint64(1 << 63)
    return u, valid


def _hex16(u) -> pa.Array:
    """Fixed-width lowercase hex of uint64 codes — lexicographic order of
    the 16-char strings == unsigned numeric order."""
    import binascii
    import numpy as np
    hx = np.frombuffer(binascii.hexlify(u.astype(">u8").tobytes()),
                       dtype="S16")
    return pa.array(hx.astype("U16"), type=pa.string())


def _arg_encode(order_col, value_col, value_type: str,
                invert: bool) -> pa.Array:
    """One sortable string per row: hex16(order) + '|' + tag + payload.

    String MAX of the encoding == row with max order (min when ``invert``
    flips the order bits), ties broken by max payload — and every payload
    encoding is order-preserving for its type (raw UTF-8 bytes for strings,
    matching DuckDB's memcmp collation; hex16 sortable codes for numerics).
    NULL when either input is NULL (ignored by max)."""
    import numpy as np
    u, o_valid = _sortable_u64(order_col)
    if invert:
        u = ~u
    order_hex = _hex16(u)
    if isinstance(value_col, pa.ChunkedArray):
        value_col = value_col.combine_chunks()
    if value_type == "string":
        v_valid = pc.is_valid(value_col).to_numpy(zero_copy_only=False)
        payload = pc.fill_null(pc.cast(value_col, pa.string()), "")
        tag = "|s"
    else:
        v, v_valid = _sortable_u64(value_col)
        payload = _hex16(v)
        tag = {"int64": "|i", "float64": "|f", "timestamp": "|t"}[value_type]
    enc = pc.binary_join_element_wise(order_hex, pc.fill_null(payload, ""),
                                      pa.scalar(tag))
    both = pa.array(o_valid & v_valid)
    return pc.if_else(both, compact_array(enc), pa.scalar(None, pa.string()))


def input_columns(aggs: Sequence[AggSpec]) -> list[str]:
    return sorted({a.column for a in aggs if a.column is not None} |
                  {a.order_col for a in aggs if a.order_col is not None})


_ARROW_FN = {"sum": "sum", "cnt": "count", "min": "min", "max": "max"}


def arrow_partial_aggs(aggs: Sequence[AggSpec]):
    """(aggregate list, rename map) for pyarrow Table.group_by on raw rows
    (rows must carry the ``append_sq_columns`` staging when any agg needs
    sumsq)."""
    spec, rename = [], {}
    for colname, fns in partial_columns(aggs).items():
        for fn in sorted(fns):
            if fn in _POW_PREFIX:
                pref = _POW_PREFIX[fn]
                spec.append((pref + colname, "sum"))
                rename[f"{pref}{colname}_sum"] = _p(colname, fn)
            elif fn == "amax":
                # colname IS the staged __axsrc_<alias> encoding column
                spec.append((colname, "max"))
                rename[f"{colname}_max"] = _p(colname, fn)
            else:
                spec.append((colname, _ARROW_FN[fn]))
                rename[f"{colname}_{_ARROW_FN[fn]}"] = _p(colname, fn)
    spec.append(([], "count_all"))
    rename["count_all"] = ROWS
    return spec, rename


def arrow_merge_aggs(aggs: Sequence[AggSpec]):
    """(aggregate list, rename map) for re-merging partial columns in-batch
    (after pane→window expansion). Same algebra as PartialResultSlot.java:186-212."""
    spec, rename = [], {}
    for colname, fns in partial_columns(aggs).items():
        for fn in sorted(fns):
            p = _p(colname, fn)
            merge = {"sum": "sum", "cnt": "sum", "min": "min",
                     "max": "max", "sumsq": "sum", "sumcube": "sum",
                     "sumquad": "sum", "amax": "max"}[fn]
            spec.append((p, merge))
            rename[f"{p}_{merge}"] = p
    spec.append((ROWS, "sum"))
    rename[f"{ROWS}_sum"] = ROWS
    return spec, rename


def ray_merge_aggs(aggs: Sequence[AggSpec]):
    """Ray Data aggregate objects for the single global shuffle merge."""
    from ray.data.aggregate import Max as RMax, Min as RMin, Sum as RSum
    out = []
    for colname, fns in partial_columns(aggs).items():
        for fn in sorted(fns):
            p = _p(colname, fn)
            cls = {"sum": RSum, "cnt": RSum, "min": RMin, "max": RMax,
                   "sumsq": RSum, "sumcube": RSum, "sumquad": RSum,
                   "amax": RMax}[fn]
            out.append(cls(p, alias_name=p))
    out.append(RSum(ROWS, alias_name=ROWS))
    return out


def null_fill_scalar(typ: pa.DataType) -> pa.Scalar:
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.scalar("", type=typ)
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        return pa.scalar(0, type=typ)
    if pa.types.is_timestamp(typ):
        return pa.scalar(0, type=typ)
    raise TypeError(f"no null-fill default for group key type {typ}")


def compact_array(col):
    """Copy a possibly chunked/sliced array to a single offset-0 array.

    pyarrow 16.1's ``pc.if_else`` emits arrays with out-of-bounds binary
    offsets when the value input is a SLICED string chunk (repro in
    tests/test_window_agg.py::test_null_group_keys_all_strategies history) —
    compacting the input first sidesteps the bug.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.offset:
        col = pa.concat_arrays([col])
    return col


def group_by_null_safe(tbl: pa.Table, keys: Sequence[str], spec,
                       use_threads: bool = False) -> pa.Table:
    """``tbl.group_by(keys).aggregate(spec)`` with SQL null semantics.

    pyarrow's MULTI-key group_by (observed on 16.1) fails to merge rows whose
    key is null — every null-keyed row becomes its own group (single-key
    grouping is fine). SQL GROUP BY has one NULL group, and the DuckDB oracle
    expects it, so any nullable key column is encoded as (validity int8,
    null-filled value) for the grouping and decoded afterwards — the encoded
    pair determines the original key exactly.
    """
    enc_keys: list[str] = []
    added: list[tuple[str, str, str]] = []
    for k in keys:
        col = tbl[k]
        if col.null_count:
            # encode under TEMP names: a key may also be an aggregate
            # source (e.g. MIN(b) GROUP BY ROLLUP(a, b)) — overwriting k
            # in place would feed the null-fill default into the aggregate
            nn, fk = f"__nnk_{k}", f"__fk_{k}"
            tbl = tbl.append_column(nn, pc.cast(pc.is_valid(col), pa.int64()))
            tbl = tbl.append_column(fk, pc.fill_null(
                col, null_fill_scalar(col.type)))
            enc_keys.extend([nn, fk])
            added.append((k, nn, fk))
        else:
            enc_keys.append(k)
    out = tbl.group_by(enc_keys, use_threads=use_threads).aggregate(spec)
    for k, nn, fk in added:
        valid = compact_array(pc.equal(out[nn], pa.scalar(1, pa.int64())))
        col = compact_array(out[fk])
        idx = out.column_names.index(fk)
        out = out.set_column(idx, k, pc.if_else(valid, col,
                                                pa.scalar(None, col.type)))
        out = out.drop_columns([nn])
    return out


def finalize(table: pa.Table, aggs: Sequence[AggSpec],
             round_decimals: Optional[int] = None) -> dict[str, pa.Array]:
    """Compute the requested output columns from merged partials.

    AVG divides running sum by non-null count here — i.e. at window-complete
    time, matching Aggregation.java:920-929.
    """
    out: dict[str, pa.Array] = {}
    for a in aggs:
        descale = (pa.scalar(10.0 ** a.scale)
                   if a.scale is not None and a.op != CNT else None)
        if a.op == CNT and a.column is None:
            arr = table[ROWS]
        elif a.op == CNT:
            arr = table[_p(a.column, "cnt")]
        elif a.op == SUM:
            arr = table[_p(a.column, "sum")]
            if descale is not None:
                arr = pc.divide(pc.cast(arr, pa.float64()), descale)
        elif a.op == AVG:
            s = pc.cast(table[_p(a.column, "sum")], pa.float64())
            if descale is not None:
                # op order mirrors the SQL twin CAST(SUM(DECIMAL) AS DOUBLE)
                # / COUNT(col): descale the exact int sum first, THEN divide.
                s = pc.divide(s, descale)
            arr = pc.divide(s, pc.cast(table[_p(a.column, "cnt")], pa.float64()))
        elif a.op in (VAR, STD):
            n = pc.cast(table[_p(a.column, "cnt")], pa.float64())
            s = pc.cast(table[_p(a.column, "sum")], pa.float64())
            ss = pc.cast(table[_p(a.column, "sumsq")], pa.float64())
            valid = pc.greater(n, pa.scalar(1.0))
            n2 = pc.if_else(valid, n, pa.scalar(2.0))   # never divide by 0
            var = pc.divide(
                pc.subtract(ss, pc.divide(pc.multiply(s, s), n2)),
                pc.subtract(n2, pa.scalar(1.0)))
            # two-pass cancellation can dip a true-zero variance below 0
            var = pc.if_else(pc.less(var, pa.scalar(0.0)),
                             pa.scalar(0.0), var)
            var = pc.if_else(valid, var, pa.scalar(None, pa.float64()))
            arr = pc.sqrt(var) if a.op == STD else var
        elif a.op in (SKEW, KURT):
            # DuckDB reconstructs central moments from the same raw power
            # sums (aggregate_functions: skew/kurtosis state = Σx^k), so
            # the float64 arithmetic agrees to well inside the 6-decimal
            # oracle rounding.
            import numpy as np
            f64 = lambda name: pc.cast(  # noqa: E731
                pc.fill_null(table[_p(a.column, name)], 0),
                pa.float64()).to_numpy(zero_copy_only=False)
            n, s1, s2 = f64("cnt"), f64("sum"), f64("sumsq")
            s3 = f64("sumcube")
            kmin = 3.0 if a.op == SKEW else 4.0
            with np.errstate(divide="ignore", invalid="ignore",
                             over="ignore"):
                nn = np.where(n >= kmin, n, kmin)   # never divide by <=0
                mean = s1 / nn
                m2s = s2 - s1 * mean                # Σ(x-mean)²
                m3s = s3 - 3.0 * mean * s2 + 2.0 * nn * mean ** 3
                if a.op == SKEW:
                    sd = np.sqrt(m2s / (nn - 1.0))
                    val = nn / ((nn - 1.0) * (nn - 2.0)) * m3s / sd ** 3
                else:
                    s4 = f64("sumquad")
                    m4s = (s4 - 4.0 * mean * s3 + 6.0 * mean ** 2 * s2
                           - 3.0 * nn * mean ** 4)
                    g2 = nn * m4s / m2s ** 2 - 3.0
                    val = ((nn - 1.0) / ((nn - 2.0) * (nn - 3.0))
                           * ((nn + 1.0) * g2 + 6.0))
                ok = (n >= kmin) & (m2s > 0.0) & np.isfinite(val)
            arr = pa.array(np.where(ok, val, 0.0), type=pa.float64())
            arr = pc.if_else(pa.array(ok), arr,
                             pa.scalar(None, pa.float64()))
        elif a.op in (ARGMAX, ARGMIN):
            arr = _arg_decode(table[_p(_AX + a.alias, "amax")], a.value_type)
        elif a.op == MIN:
            arr = table[_p(a.column, "min")]
            if descale is not None:
                arr = pc.divide(pc.cast(arr, pa.float64()), descale)
        else:
            arr = table[_p(a.column, "max")]
            if descale is not None:
                arr = pc.divide(pc.cast(arr, pa.float64()), descale)
        if round_decimals is not None and pa.types.is_floating(arr.type):
            arr = _round_half_even(arr, round_decimals)
        out[a.alias] = arr
    return out


def _arg_decode(enc, value_type: str):
    """Invert _arg_encode's payload: strip the 18-char ``hex16|tag`` prefix,
    then undo the sortable-code mapping. Runs on merged (post-shuffle)
    result tables — small by construction."""
    import binascii
    import numpy as np
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    valid = pc.is_valid(enc)
    payload = pc.utf8_slice_codeunits(pc.fill_null(enc, "0" * 34), 18)
    if value_type == "string":
        return pc.if_else(valid, compact_array(payload),
                          pa.scalar(None, pa.string()))
    hx = payload.to_numpy(zero_copy_only=False).astype("S16")
    u = np.frombuffer(binascii.unhexlify(hx.tobytes()), dtype=">u8") \
        .astype(np.uint64)
    if value_type == "float64":
        b = np.where(u >> np.uint64(63) == 1,
                     u & ~np.uint64(1 << 63), ~u)
        out = pa.array(b.view(np.float64), type=pa.float64())
    else:
        x = (u ^ np.uint64(1 << 63)).view(np.int64)
        out = pa.array(x, type=pa.int64())
        if value_type == "timestamp":
            out = out.cast(pa.timestamp("us"))
    return pc.if_else(valid, out, pa.scalar(None, out.type))


def round_oracle_np(x, ndigits: int):
    """DuckDB-bit-exact ROUND on a float64 numpy array.

    DuckDB's ROUND(double, d) is ``std::round(x * 10^d) / 10^d`` — nearest,
    EXCEPT half-away-from-zero when the *product* lands exactly on a
    representable .5 (std::round semantics), with non-finite products passing
    the input through. NOT CPython's round(): CPython rounds the true decimal
    value of x half-even, so for x = 46.7834375 (whose product 46783437.5 is
    exactly representable but whose own decimal expansion sits just below the
    tie) CPython gives ...437 while DuckDB gives ...438. Emulating the product
    path exactly is what makes value-hash parity with the SQL oracle possible;
    fuzz-verified bit-equal to DuckDB 1.3 on 720k values across d∈{0,2,4,6}
    (ties, huge magnitudes, subnormals, ±inf/nan).
    """
    import numpy as np
    s = 10.0 ** ndigits
    with np.errstate(invalid="ignore", over="ignore"):
        p = x * s
        r = np.rint(p)                      # nearest, ties-to-even
        frac = p - np.floor(p)
        tie = frac == 0.5                   # exact representable .5 → away
        if tie.any():
            r[tie] = np.floor(p[tie]) + np.where(p[tie] > 0, 1.0, 0.0)
        out = r / s
        bad = ~np.isfinite(p)
        out[bad] = x[bad]
    return out


def _round_half_even(arr, ndigits: int) -> pa.Array:
    """Vectorized DuckDB-exact decimal rounding of an Arrow float array.

    (Name kept for history; the tie policy is DuckDB's product-based
    std::round, not half-even — see round_oracle_np.)
    """
    import numpy as np
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    typ = arr.type
    x = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=True)
    r = round_oracle_np(x, ndigits)
    out = pa.array(r, type=pa.float64())
    if arr.null_count:
        out = pc.if_else(pc.is_valid(arr), out, pa.scalar(None, pa.float64()))
    return pc.cast(out, typ) if typ != pa.float64() else out
