"""GROUPING SETS / ROLLUP / CUBE (stages/grouping.py) vs DuckDB, including
NULL key values (disambiguated from rolled-up NULLs by grouping_id), keys
that are also aggregate sources (all-NULL groups must yield NULL MIN/MAX,
not the null-fill default), fixed-point sums, and validation errors."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from saber_ray.core.aggregates import avg, cnt, max_, min_, sum_
from saber_ray.stages.grouping import cube, grouping_sets, rollup

T = pa.table({
    "a": pa.array(["x", "y", None, "x", "y", "x", None], pa.string()),
    "b": pa.array([1, 2, 1, None, 2, 1, None], pa.int64()),
    "v": pa.array([1.25, 2.5, 3.75, 4.0, 5.5, 6.25, 0.5], pa.float64()),
})
KEY = ["grouping_id", "a", "b"]


def _want(sql_groupby: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", T)
    return con.execute(
        "SELECT a, b, GROUPING(a, b) AS grouping_id, COUNT(*) AS n, "
        "ROUND(CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE), 6) AS sv, "
        "ROUND(CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / COUNT(v), 6) "
        "AS av, MIN(b) AS mb, MAX(b) AS xb "
        f"FROM t GROUP BY {sql_groupby}").df()


AGGS = [cnt(alias="n"), sum_("v", alias="sv", scale=2),
        avg("v", alias="av", scale=2), min_("b", alias="mb"),
        max_("b", alias="xb")]


def _canon(df: pd.DataFrame, cols) -> pd.DataFrame:
    return (df.sort_values(KEY, na_position="first")
            .reset_index(drop=True)[list(cols)])


@pytest.mark.parametrize("sets,sql", [
    (rollup("a", "b"), "ROLLUP (a, b)"),
    (cube("a", "b"), "CUBE (a, b)"),
    ([["a"], ["b"]], "GROUPING SETS ((a), (b))"),
    ([["a", "b"], []], "GROUPING SETS ((a, b), ())"),
])
@pytest.mark.parametrize("parts", [1, 4])
def test_grouping_sets_vs_duckdb(ray_session, sets, sql, parts):
    ds = rd.from_arrow(T).repartition(parts)
    got = grouping_sets(ds, sets, AGGS, round_decimals=6).to_pandas()
    want = _want(sql)
    pd.testing.assert_frame_equal(_canon(got, want.columns),
                                  _canon(want, want.columns),
                                  check_dtype=False)


def test_all_null_group_min_max_is_null(ray_session):
    """Key b doubles as MIN/MAX source: the (a='x', b=NULL) group must
    report NULL min/max — regression for the in-place null-fill that fed
    the fill default into aggregates sharing a key column."""
    ds = rd.from_arrow(T).repartition(2)
    got = grouping_sets(ds, [["a", "b"]], AGGS).to_pandas()
    row = got[(got["a"] == "x") & (got["b"].isna())]
    assert len(row) == 1
    assert row["mb"].isna().all() and row["xb"].isna().all()
    assert row["n"].tolist() == [1]


def test_grouping_sets_validation():
    with pytest.raises(ValueError, match="duplicate key"):
        grouping_sets(None, [["a", "a"]], AGGS)
    with pytest.raises(ValueError, match="duplicate grouping sets"):
        grouping_sets(None, [["a", "b"], ["b", "a"]], AGGS)


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**6), parts=st.integers(1, 4),
       which=st.sampled_from(["rollup", "cube", "sets"]))
def test_grouping_sets_property(ray_session, seed, parts, which):
    """Random tables (NULL keys, negative values) × random grouping-set
    shapes vs DuckDB."""
    import numpy as np
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 120))
    a = np.array(["x", "y", "z", None], dtype=object)[rng.integers(0, 4, n)]
    b = rng.integers(-3, 3, n).astype(object)
    b[rng.random(n) < 0.2] = None
    v = np.round(rng.uniform(-100, 100, n), 2)
    t = pa.table({"a": pa.array(a, pa.string()),
                  "b": pa.array(b, pa.int64()),
                  "v": pa.array(v, pa.float64())})
    sets, sql = {
        "rollup": (rollup("a", "b"), "ROLLUP (a, b)"),
        "cube": (cube("a", "b"), "CUBE (a, b)"),
        "sets": ([["b"], []], "GROUPING SETS ((b), ())"),
    }[which]
    ds = rd.from_arrow(t).repartition(parts)
    got = grouping_sets(ds, sets,
                        [cnt(alias="n"), sum_("v", alias="sv", scale=2)],
                        round_decimals=6).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    if which == "sets":
        # engine all_keys = [b] here, so its bitmask == GROUPING(b)
        want = con.execute(
            "SELECT b, GROUPING(b) AS grouping_id, COUNT(*) AS n, "
            "ROUND(CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE), 6) AS sv "
            f"FROM t GROUP BY {sql}").df()
        got = got[[c for c in got.columns if c != "a"]]
        key = ["grouping_id", "b"]
    else:
        want = con.execute(
            "SELECT a, b, GROUPING(a, b) AS grouping_id, COUNT(*) AS n, "
            "ROUND(CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE), 6) AS sv "
            f"FROM t GROUP BY {sql}").df()
        key = KEY
    pd.testing.assert_frame_equal(
        got.sort_values(key, na_position="first")
           .reset_index(drop=True)[want.columns.tolist()],
        want.sort_values(key, na_position="first").reset_index(drop=True),
        check_dtype=False)
