"""Expression / predicate layer over pyarrow.compute.

Parity target: Saber's typed expression trees and composable predicates
(reference: cql/expressions/Expression.java:6-14, cql/expressions/ints/*.java,
cql/expressions/floats/*.java, cql/predicates/IntComparisonPredicate.java:10-15,
cql/predicates/ANDPredicate.java:14-45, cql/predicates/ORPredicate.java).

Saber evaluates per-tuple against a byte buffer; here every node evaluates
vectorized against a ``pyarrow.Table`` batch and returns a ``pyarrow`` array
(a ChunkedArray combines fine with pc kernels). Saber's type system has only
INT/FLOAT/LONG; ours inherits the full Arrow type system, so string/timestamp
kernels (needed for the transcript payload) come for free.

Usage::

    e = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).alias("revenue")
    pred = (col("role") == "assistant") & col("tool").is_not_null()
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc


class Expr:
    """A vectorized expression tree node.

    ``fn`` maps a pyarrow.Table batch to an Array/ChunkedArray/Scalar.
    """

    __slots__ = ("fn", "name")

    def __init__(self, fn: Callable[[pa.Table], Any], name: str = "expr"):
        self.fn = fn
        self.name = name

    def __call__(self, batch: pa.Table):
        return self.fn(batch)

    def alias(self, name: str) -> "Expr":
        return Expr(self.fn, name)

    # -- arithmetic (Int/Float Addition/Subtraction/Multiplication/Division) --
    def __add__(self, o): return _bin(pc.add, self, o, "add")
    def __radd__(self, o): return _bin(pc.add, o, self, "add")
    def __sub__(self, o): return _bin(pc.subtract, self, o, "sub")
    def __rsub__(self, o): return _bin(pc.subtract, o, self, "sub")
    def __mul__(self, o): return _bin(pc.multiply, self, o, "mul")
    def __rmul__(self, o): return _bin(pc.multiply, o, self, "mul")
    def __truediv__(self, o): return _bin(pc.divide, self, o, "div")
    def __rtruediv__(self, o): return _bin(pc.divide, o, self, "div")
    def __mod__(self, o):
        # pyarrow has no elementwise mod kernel pre-17; emulate a - floor(a/b)*b
        other = _wrap(o)
        def fn(b, s=self, t=other):
            a, d = s(b), t(b)
            q = pc.floor(pc.divide(pc.cast(a, pa.float64()), pc.cast(d, pa.float64())))
            r = pc.subtract(pc.cast(a, pa.float64()), pc.multiply(q, pc.cast(d, pa.float64())))
            arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
            typ = arr.type if isinstance(arr, (pa.Array, pa.ChunkedArray)) else pa.int64()
            return pc.cast(r, typ)
        return Expr(fn, "mod")

    # -- comparisons (IntComparisonPredicate's 6 ops) --
    def __eq__(self, o): return _bin(pc.equal, self, o, "eq")          # type: ignore[override]
    def __ne__(self, o): return _bin(pc.not_equal, self, o, "ne")      # type: ignore[override]
    def __lt__(self, o): return _bin(pc.less, self, o, "lt")
    def __le__(self, o): return _bin(pc.less_equal, self, o, "le")
    def __gt__(self, o): return _bin(pc.greater, self, o, "gt")
    def __ge__(self, o): return _bin(pc.greater_equal, self, o, "ge")

    # -- boolean composition (ANDPredicate / ORPredicate) --
    def __and__(self, o): return _bin(pc.and_kleene, self, o, "and")
    def __or__(self, o): return _bin(pc.or_kleene, self, o, "or")
    def __invert__(self):
        return Expr(lambda b, s=self: pc.invert(s(b)), "not")

    # -- null / membership / string helpers (beyond the reference's type system) --
    def is_null(self): return Expr(lambda b, s=self: pc.is_null(s(b)), "is_null")
    def is_not_null(self): return Expr(lambda b, s=self: pc.is_valid(s(b)), "is_not_null")
    def isin(self, values):
        vs = pa.array(list(values))
        return Expr(lambda b, s=self: pc.is_in(s(b), value_set=vs), "isin")
    def str_len(self): return Expr(lambda b, s=self: pc.utf8_length(s(b)), "str_len")
    def lower(self): return Expr(lambda b, s=self: pc.utf8_lower(s(b)), "lower")
    def contains(self, pat: str):
        return Expr(lambda b, s=self: pc.match_substring(s(b), pat), "contains")
    def match(self, regex: str):
        return Expr(lambda b, s=self: pc.match_substring_regex(s(b), regex), "match")
    def cast(self, typ): return Expr(lambda b, s=self: pc.cast(s(b), typ), self.name)

    def __hash__(self):  # __eq__ overridden → keep hashable
        return id(self)


def col(name: str) -> Expr:
    """Column reference (Int/Float/LongColumnReference parity)."""
    return Expr(lambda b: b[name], name)


def lit(value: Any) -> Expr:
    """Constant (IntConstant / FloatConstant parity)."""
    return Expr(lambda b: pa.scalar(value), "lit")


def _wrap(o: Any) -> Expr:
    return o if isinstance(o, Expr) else lit(o)


def _bin(kernel, a, b, name) -> Expr:
    ea, eb = _wrap(a), _wrap(b)
    return Expr(lambda batch: kernel(ea(batch), eb(batch)), name)


def as_array(result, length: int) -> pa.Array:
    """Normalize an expression result to an Array of the batch length."""
    if isinstance(result, pa.ChunkedArray):
        return result.combine_chunks()
    if isinstance(result, (pa.Array,)):
        return result
    if isinstance(result, pa.Scalar):
        return pa.array([result.as_py()] * length, type=result.type)
    return pa.array(result)
