"""normalize (zscore/minmax) + winsorize vs op-for-op DuckDB twins.

The zscore twin reproduces the engine bit-for-bit: both sides build
mean/var from the SAME exact int64 scaled power sums with the same float
ops in the same order (stages/normalize.py module docstring)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.normalize import normalize, winsorize
from tests.oracle_util import canon, to_pandas


def _events(sf_dir):
    return rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["event_id", "event_type", "value"])


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    return con


def _assert_eq(res, oracle_df, cols):
    a = canon(to_pandas(res)[cols])
    b = canon(oracle_df[cols])
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                  check_dtype=False)


_Z_SQL = """
WITH i AS (SELECT event_id, event_type, value,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xi
           FROM events),
st AS (SELECT event_type, COUNT(xi) AS n,
       CAST(SUM(xi) AS DOUBLE) / 100 AS s,
       CAST(SUM(xi * xi) AS DOUBLE) / 10000 AS ss
       FROM i GROUP BY 1),
d AS (SELECT event_type, n, s / n AS mean,
      (ss - (s * s) / n) / (n - 1) AS var FROM st)
SELECT i.event_id, i.event_type, i.value,
  CASE WHEN d.n > 1 AND sqrt(GREATEST(d.var, 0)) > 0
       THEN ROUND((i.value - d.mean) / sqrt(GREATEST(d.var, 0)), 6)
  END AS value_zscore
FROM i JOIN d USING (event_type)
"""

_COLS = ["event_id", "event_type", "value", "value_zscore"]


def test_zscore_grouped_exact(ray_session, sf_dir):
    res = normalize(_events(sf_dir), "value", keys="event_type",
                    method="zscore", scale=2, round_decimals=6)
    _assert_eq(res, _duck(sf_dir).execute(_Z_SQL).df(), _COLS)


def test_minmax_grouped(ray_session, sf_dir):
    res = normalize(_events(sf_dir), "value", keys="event_type",
                    method="minmax", round_decimals=6)
    oracle = _duck(sf_dir).execute("""
WITH st AS (SELECT event_type, MIN(value) lo, MAX(value) hi
            FROM events GROUP BY 1)
SELECT e.event_id, e.event_type, e.value,
  ROUND((e.value - st.lo) / NULLIF(st.hi - st.lo, 0), 6) AS value_minmax
FROM events e JOIN st USING (event_type)""").df()
    _assert_eq(res, oracle,
               ["event_id", "event_type", "value", "value_minmax"])


def test_global_zscore(ray_session, sf_dir):
    res = normalize(_events(sf_dir), "value", method="zscore", scale=2,
                    round_decimals=6)
    oracle = _duck(sf_dir).execute("""
WITH i AS (SELECT event_id, value,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xi
           FROM events),
st AS (SELECT COUNT(xi) n, CAST(SUM(xi) AS DOUBLE)/100 s,
       CAST(SUM(xi*xi) AS DOUBLE)/10000 ss FROM i),
d AS (SELECT n, s/n AS mean, (ss - (s*s)/n)/(n-1) AS var FROM st)
SELECT i.event_id, i.value,
  ROUND((i.value - d.mean) / sqrt(GREATEST(d.var, 0)), 6) AS value_zscore
FROM i, d""").df()
    _assert_eq(res, oracle, ["event_id", "value", "value_zscore"])


def test_winsorize_grouped(ray_session, sf_dir):
    res = winsorize(_events(sf_dir), "value", keys="event_type",
                    p=(0.05, 0.95))
    oracle = _duck(sf_dir).execute("""
WITH q AS (SELECT event_type,
           quantile_disc(value, 0.05) AS qlo,
           quantile_disc(value, 0.95) AS qhi FROM events GROUP BY 1)
SELECT e.event_id, e.event_type, e.value,
  GREATEST(LEAST(e.value, q.qhi), q.qlo) AS value_winsor
FROM events e JOIN q USING (event_type)""").df()
    _assert_eq(res, oracle,
               ["event_id", "event_type", "value", "value_winsor"])
    # clipping invariant: never widens the range
    df = to_pandas(res)
    assert (df.groupby("event_type")["value_winsor"].max()
            <= df.groupby("event_type")["value"].max()).all()
    assert (df.groupby("event_type")["value_winsor"].min()
            >= df.groupby("event_type")["value"].min()).all()


def test_winsorize_global(ray_session, sf_dir):
    res = winsorize(_events(sf_dir), "value", p=(0.1, 0.9))
    oracle = _duck(sf_dir).execute("""
WITH q AS (SELECT quantile_disc(value, 0.1) qlo,
           quantile_disc(value, 0.9) qhi FROM events)
SELECT e.event_id, e.event_type, e.value,
  GREATEST(LEAST(e.value, q.qhi), q.qlo) AS value_winsor
FROM events e, q""").df()
    _assert_eq(res, oracle,
               ["event_id", "event_type", "value", "value_winsor"])


def test_nulls_and_degenerate_groups(ray_session):
    """NULL x -> NULL out; single-row group -> NULL zscore; constant group
    -> NULL zscore and NULL minmax (zero range); NULL keys form a group."""
    t = pa.table({
        "k": ["a", "a", "a", "b", "c", "c", None, None],
        "x": [1.0, 2.0, None, 5.0, 3.0, 3.0, 7.0, 9.0],
    })
    ds = rd.from_arrow(t)
    z = to_pandas(normalize(ds, "x", keys="k", method="zscore",
                            round_decimals=6))
    z = z.sort_values(["k", "x"], na_position="last").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
SELECT k, x, ROUND((x - AVG(x) OVER w) /
       NULLIF(STDDEV_SAMP(x) OVER w, 0), 6) AS x_zscore
FROM t WINDOW w AS (PARTITION BY k)""").df() \
        .sort_values(["k", "x"], na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        canon(z[["k", "x", "x_zscore"]]), canon(want), check_dtype=False)

    m = to_pandas(normalize(ds, "x", keys="k", method="minmax"))
    mm = dict(zip(zip(m["k"].where(m["k"].notna(), "~"), m["x"]),
                  m["x_minmax"]))
    assert np.isnan(mm[("b", 5.0)])           # single row: zero range
    assert np.isnan(mm[("c", 3.0)])           # constant group
    assert mm[("~", 7.0)] == 0.0 and mm[("~", 9.0)] == 1.0  # NULL key group


def test_validation(ray_session, sf_dir):
    with pytest.raises(ValueError, match="method"):
        normalize(_events(sf_dir), "value", method="robust")
    with pytest.raises(ValueError, match="p_lo"):
        winsorize(_events(sf_dir), "value", p=(0.0, 0.5))
