"""Property tests: EXCEPT/INTERSECT (DISTINCT and ALL) vs a pure-Python
Counter reference (hypothesis).

Random small multisets with duplicate tuples and NULLs in both columns,
across several partitionings — NULLs compare EQUAL in SQL set operations,
which the Counter reference models by using a sentinel in the key tuple.
"""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from saber_ray.stages.setops import except_, intersect

_NULL = ("__null__",)        # unhashable-proof NULL sentinel for Counter keys


def _mk(rng, n, nkeys=4):
    k = rng.integers(0, nkeys, n).astype(object)
    k[rng.random(n) < 0.2] = None
    s = np.array(["x", "y", "z"], dtype=object)[rng.integers(0, 3, n)]
    s[rng.random(n) < 0.2] = None
    return list(zip(k.tolist(), s.tolist()))


def _ds(rows, parts):
    import ray.data as rd
    t = pa.table({
        "k": pa.array([r[0] for r in rows], type=pa.int64()),
        "s": pa.array([r[1] for r in rows], type=pa.string()),
    })
    return rd.from_arrow(t).repartition(parts)


def _counter(rows):
    return Counter((_NULL if a is None else a, _NULL if b is None else b)
                   for a, b in rows)


def _want(lrows, rrows, op, distinct):
    l, r = _counter(lrows), _counter(rrows)
    out = Counter()
    for t in set(l) | set(r):
        if distinct:
            n = int((l[t] > 0 and r[t] == 0) if op == "except"
                    else (l[t] > 0 and r[t] > 0))
        else:
            n = max(l[t] - r[t], 0) if op == "except" else min(l[t], r[t])
        if n:
            out[t] = n
    return out


def _got(tbl):
    ks = tbl["k"].to_pylist()
    ss = tbl["s"].to_pylist()
    return Counter((_NULL if a is None else a, _NULL if b is None else b)
                   for a, b in zip(ks, ss))


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**6), parts=st.integers(1, 4),
       op=st.sampled_from(["except", "intersect"]),
       distinct=st.booleans())
def test_setops_match_counter_reference(ray_session, seed, parts, op,
                                        distinct):
    import ray
    rng = np.random.default_rng(seed)
    lrows, rrows = _mk(rng, int(rng.integers(0, 40))), \
        _mk(rng, int(rng.integers(0, 40)))
    fn = except_ if op == "except" else intersect
    ds = fn(_ds(lrows, parts), _ds(rrows, parts), distinct=distinct)
    tbls = [t.select(["k", "s"]) for t in ray.get(ds.to_arrow_refs())
            if t.num_rows]
    got = _got(pa.concat_tables(tbls, promote_options="default")) if tbls \
        else Counter()
    assert got == _want(lrows, rrows, op, distinct)
