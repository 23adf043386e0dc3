"""Grouped order statistics vs DuckDB quantile_disc / COUNT DISTINCT."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from saber_ray.stages.stats import grouped_quantiles
from tests.oracle_util import canon, to_pandas


def test_grouped_quantiles_random_with_null_keys(ray_session):
    rng = np.random.default_rng(9)
    n = 2000
    langs = np.array(["en", "es", "fr", None, "de"], dtype=object)[
        rng.integers(0, 5, n)]
    vals = rng.integers(0, 500, n)
    t = pa.table({"lang": pa.array(langs, pa.string()),
                  "v": pa.array(vals, pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT lang, quantile_disc(v, 0.5) AS p50, "
        "quantile_disc(v, 0.9) AS p90, COUNT(DISTINCT v) AS nd, "
        "COUNT(*) AS n FROM t GROUP BY 1").df())
    for parts in (1, 3, 7):
        ds = rd.from_arrow(t).repartition(parts)
        got = canon(to_pandas(grouped_quantiles(
            ds, "lang", "v", {"p50": 0.5, "p90": 0.9},
            count_distinct_alias="nd", count_alias="n")))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_quantiles_null_values(ray_session):
    """SQL semantics with NULL values: count_alias = COUNT(*), quantile /
    distinct kernels skip NULLs, an all-NULL group survives with NULL
    quantiles and distinct-count 0 (ADVICE r2 #1)."""
    rng = np.random.default_rng(17)
    n = 1500
    langs = np.array(["en", "es", "fr", None], dtype=object)[
        rng.integers(0, 4, n)]
    vals = rng.integers(0, 300, n).astype(object)
    vals[rng.random(n) < 0.25] = None          # scattered NULL values
    vals[langs == "fr"] = None                 # one all-NULL group
    t = pa.table({"lang": pa.array(langs, pa.string()),
                  "v": pa.array(vals, pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT lang, quantile_disc(v, 0.5) AS p50, "
        "quantile_disc(v, 0.95) AS p95, COUNT(DISTINCT v) AS nd, "
        "COUNT(*) AS n FROM t GROUP BY 1").df())
    assert want.shape[0] == 4                  # 'fr' kept by SQL GROUP BY
    for parts in (1, 4):
        ds = rd.from_arrow(t).repartition(parts)
        got = canon(to_pandas(grouped_quantiles(
            ds, "lang", "v", {"p50": 0.5, "p95": 0.95},
            count_distinct_alias="nd", count_alias="n")))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
