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

ROWS = "__p_rows"


@dataclass(frozen=True)
class AggSpec:
    op: str                    # cnt | sum | avg | min | max
    column: Optional[str]      # None only for cnt → COUNT(*)
    alias: str

    def __post_init__(self):
        if self.op not in (CNT, SUM, AVG, MIN, MAX):
            raise ValueError(f"unknown aggregation op {self.op!r}")
        if self.column is None and self.op != CNT:
            raise ValueError(f"{self.op} requires a column")


def cnt(column: Optional[str] = None, alias: Optional[str] = None) -> AggSpec:
    return AggSpec(CNT, column, alias or (f"cnt_{column}" if column else "cnt"))

def sum_(column: str, alias: Optional[str] = None) -> AggSpec:
    return AggSpec(SUM, column, alias or f"sum_{column}")

def avg(column: str, alias: Optional[str] = None) -> AggSpec:
    return AggSpec(AVG, column, alias or f"avg_{column}")

def min_(column: str, alias: Optional[str] = None) -> AggSpec:
    return AggSpec(MIN, column, alias or f"min_{column}")

def max_(column: str, alias: Optional[str] = None) -> AggSpec:
    return AggSpec(MAX, column, alias or f"max_{column}")


# ---------------------------------------------------------------------------
# partial plan
# ---------------------------------------------------------------------------

def _p(colname: str, fn: str) -> str:
    return f"__p_{colname}_{fn}"


def partial_columns(aggs: Sequence[AggSpec]) -> dict[str, set[str]]:
    """Which partial functions each source column needs."""
    need: dict[str, set[str]] = {}
    for a in aggs:
        if a.column is None:
            continue
        fns = need.setdefault(a.column, set())
        if a.op in (SUM, AVG):
            fns.add("sum")
        if a.op in (AVG, CNT):
            fns.add("cnt")
        if a.op == MIN:
            fns.add("min")
        if a.op == MAX:
            fns.add("max")
    return need


def input_columns(aggs: Sequence[AggSpec]) -> list[str]:
    return sorted({a.column for a in aggs if a.column is not None})


_ARROW_FN = {"sum": "sum", "cnt": "count", "min": "min", "max": "max"}


def arrow_partial_aggs(aggs: Sequence[AggSpec]):
    """(aggregate list, rename map) for pyarrow Table.group_by on raw rows."""
    spec, rename = [], {}
    for colname, fns in partial_columns(aggs).items():
        for fn in sorted(fns):
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
            merge = {"sum": "sum", "cnt": "sum", "min": "min", "max": "max"}[fn]
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
            cls = {"sum": RSum, "cnt": RSum, "min": RMin, "max": RMax}[fn]
            out.append(cls(p, alias_name=p))
    out.append(RSum(ROWS, alias_name=ROWS))
    return out


def finalize(table: pa.Table, aggs: Sequence[AggSpec],
             round_decimals: Optional[int] = None) -> dict[str, pa.Array]:
    """Compute the requested output columns from merged partials.

    AVG divides running sum by non-null count here — i.e. at window-complete
    time, matching Aggregation.java:920-929.
    """
    out: dict[str, pa.Array] = {}
    for a in aggs:
        if a.op == CNT and a.column is None:
            arr = table[ROWS]
        elif a.op == CNT:
            arr = table[_p(a.column, "cnt")]
        elif a.op == SUM:
            arr = table[_p(a.column, "sum")]
        elif a.op == AVG:
            arr = pc.divide(
                pc.cast(table[_p(a.column, "sum")], pa.float64()),
                pc.cast(table[_p(a.column, "cnt")], pa.float64()),
            )
        elif a.op == MIN:
            arr = table[_p(a.column, "min")]
        else:
            arr = table[_p(a.column, "max")]
        if round_decimals is not None and pa.types.is_floating(arr.type):
            arr = _round_half_even(arr, round_decimals)
        out[a.alias] = arr
    return out


def _round_half_even(arr, ndigits: int) -> pa.Array:
    """Correctly-rounded decimal rounding (ties-to-even), bit-identical to
    DuckDB's ROUND and CPython's round().

    ``pc.round``/``np.round`` use scale-multiply rounding, which is off by an
    ulp for values like 68.31400000000001 — enough to break value-hash parity
    with a SQL oracle when summation order differs.

    Vectorized: ``rint(x*s)/s`` agrees with CPython's round except when the
    scaled value sits within a few ulps of a .5 tie (ambiguous which side the
    exact product falls on) — only those rare elements take the per-element
    CPython fallback, so grouped outputs of any size round at numpy speed.
    """
    import numpy as np
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    typ = arr.type
    x = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=True)
    s = 10.0 ** ndigits
    with np.errstate(invalid="ignore", over="ignore"):
        p = x * s
        r = np.rint(p) / s
        finite = np.isfinite(p)
        d = np.abs(p - np.floor(p) - 0.5)
        ulp = np.abs(p) * 2.0 ** -52
        amb = finite & (d <= 4.0 * ulp + 1e-12)
    if amb.any():
        idx = np.nonzero(amb)[0]
        r[idx] = [round(float(v), ndigits) for v in x[idx]]
    keep_nan = ~np.isfinite(x)
    r[keep_nan] = x[keep_nan]
    out = pa.array(r, type=pa.float64())
    if arr.null_count:
        out = pc.if_else(pc.is_valid(arr), out, pa.scalar(None, pa.float64()))
    return pc.cast(out, typ) if typ != pa.float64() else out
