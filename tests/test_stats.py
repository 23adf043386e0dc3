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


def test_sketch_path_exact_at_small_scale(ray_session):
    """approx=True with default capacities never compacts at this scale, so
    it is bit-identical to the exact path AND the DuckDB oracle — including
    NULL keys, NULL values, and an all-NULL group."""
    rng = np.random.default_rng(23)
    n = 3000
    langs = np.array(["en", "es", "fr", None], dtype=object)[
        rng.integers(0, 4, n)]
    vals = rng.integers(0, 400, n).astype(object)
    vals[rng.random(n) < 0.2] = None
    vals[langs == "es"] = None
    t = pa.table({"lang": pa.array(langs, pa.string()),
                  "v": pa.array(vals, pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT lang, quantile_disc(v, 0.5) AS p50, "
        "quantile_disc(v, 0.99) AS p99, COUNT(DISTINCT v) AS nd, "
        "COUNT(*) AS n FROM t GROUP BY 1").df())
    for parts in (1, 5):
        ds = rd.from_arrow(t).repartition(parts)
        got = canon(to_pandas(grouped_quantiles(
            ds, "lang", "v", {"p50": 0.5, "p99": 0.99},
            count_distinct_alias="nd", count_alias="n", approx=True)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sketch_path_survives_giant_group(ray_session):
    """A single giant group with compaction forced (sketch_k ≪ n): the
    sketch path emits one row with bounded rank error while shuffling only
    O(sketch) bytes per block — the exact path would ship all n values into
    ONE reducer block (unbounded block size at 100 TB)."""
    rng = np.random.default_rng(31)
    n = 200_000
    t = pa.table({"lang": pa.array(["en"] * n, pa.string()),
                  "v": pa.array(rng.integers(0, 1_000_000, n), pa.int64())})
    ds = rd.from_arrow(t).repartition(8)
    got = to_pandas(grouped_quantiles(
        ds, "lang", "v", {"p50": 0.5, "p95": 0.95},
        count_distinct_alias="nd", count_alias="n_rows",
        approx=True, sketch_k=512, kmv_k=1024))
    assert len(got) == 1 and got["n_rows"][0] == n
    v = np.sort(t["v"].to_numpy())
    for alias, q in (("p50", 0.5), ("p95", 0.95)):
        rank = np.searchsorted(v, got[alias][0], side="left") / n
        assert abs(rank - q) < 0.05, (alias, rank)
    true_nd = len(np.unique(v))
    assert abs(got["nd"][0] - true_nd) / true_nd < 0.1


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


def test_grouped_quantiles_string_values_lexicographic(ray_session):
    """String quantiles must follow LEXICOGRAPHIC order, not the dictionary's
    first-appearance order (regression: codes were appearance-ordered)."""
    rng = np.random.default_rng(21)
    words = np.array(["banana", "apple", "cherry", "date", "elder",
                      "fig", "grape", None], dtype=object)
    t = pa.table({"g": pa.array(
        np.array(["x", "y", "z"], dtype=object)[rng.integers(0, 3, 900)],
        pa.string()),
        "s": pa.array(words[rng.integers(0, 8, 900)], pa.string())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT g, quantile_disc(s, 0.25) AS p25, "
        "quantile_disc(s, 0.75) AS p75, COUNT(DISTINCT s) AS nd, "
        "COUNT(*) AS n FROM t GROUP BY 1").df())
    for parts in (1, 4):
        got = canon(to_pandas(grouped_quantiles(
            rd.from_arrow(t).repartition(parts), "g", "s",
            {"p25": 0.25, "p75": 0.75},
            count_distinct_alias="nd", count_alias="n")))
        pd.testing.assert_frame_equal(got, want)


def test_grouped_quantiles_interpolated_vs_quantile_cont(ray_session):
    """interpolate=True mirrors DuckDB quantile_cont (linear interpolation
    at rank q*(n-1)), NULL keys/values included."""
    rng = np.random.default_rng(27)
    n = 2200
    langs = np.array(["en", "es", None, "de"], dtype=object)[
        rng.integers(0, 4, n)]
    vals = rng.integers(0, 1000, n).astype(object)
    vals[rng.random(n) < 0.1] = None
    t = pa.table({"lang": pa.array(langs, pa.string()),
                  "v": pa.array(vals, pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT lang, quantile_cont(v, 0.5) AS p50, "
        "quantile_cont(v, 0.9) AS p90, COUNT(*) AS n "
        "FROM t GROUP BY 1").df())
    for parts in (1, 4):
        got = canon(to_pandas(grouped_quantiles(
            rd.from_arrow(t).repartition(parts), "lang", "v",
            {"p50": 0.5, "p90": 0.9}, count_alias="n", interpolate=True)))
        pd.testing.assert_frame_equal(got, want)


def test_grouped_quantiles_interpolate_validation(ray_session):
    t = pa.table({"g": ["a"], "v": [1]})
    try:
        grouped_quantiles(rd.from_arrow(t), "g", "v", {"p": 0.5},
                          interpolate=True, approx=True)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_profile_vs_duckdb(ray_session, sf_dir):
    """Dataset profile over documents vs a per-column DuckDB twin —
    exact at gate scale (distincts < kmv_k ⇒ KMV is exact)."""
    import duckdb
    import pandas as pd
    from saber_ray.sources.parquet import read_table
    from saber_ray.stages.stats import profile
    from tests.oracle_util import to_pandas

    docs = read_table(sf_dir, "documents")
    got = to_pandas(profile(docs)).sort_values("column") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    cols = con.execute("SELECT * FROM documents LIMIT 0").df().columns
    parts = []
    for c in cols:
        parts.append(
            f'SELECT \'{c}\' AS "column", COUNT(*) AS n_rows, '
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"CAST(MIN({c}) AS VARCHAR) AS min_str, "
            f"CAST(MAX({c}) AS VARCHAR) AS max_str FROM documents")
    want = con.execute(" UNION ALL ".join(parts) + ' ORDER BY "column"').df()
    pd.testing.assert_frame_equal(
        got[["column", "n_rows", "n_nulls", "n_distinct", "min_str",
             "max_str"]], want, check_dtype=False)
    # numeric means vs SQL (int columns: exact int64 sum / count)
    m = con.execute(
        "SELECT ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars), 6) "
        "AS mean FROM documents").fetchone()[0]
    assert got.set_index("column").loc["n_chars", "mean"] == m


def test_profile_typed_minmax_and_nulls(ray_session):
    """int64 > 2^53 stays exact through min/max; all-NULL column profiles
    as 0 distinct with NULL min/max/mean; mean is NULL for strings."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.stats import profile

    big = 2 ** 60 + 7
    t = pa.table({
        "i": pa.array([1, None, 3, big, -5, 3], pa.int64()),
        "s": pa.array(["b", "a", None, "zz", "a", "m"], pa.string()),
        "z": pa.array([None] * 6, pa.float64()),
    })
    g = profile(rd.from_arrow(t).repartition(3)).to_pandas() \
        .set_index("column")
    assert g.loc["i", "max_str"] == str(big)
    assert g.loc["i", "n_distinct"] == 4 and g.loc["i", "n_nulls"] == 1
    assert g.loc["i", "mean"] == (1 + 3 + big - 5 + 3) / 5
    assert g.loc["s", "min_str"] == "a" and g.loc["s", "max_str"] == "zz"
    assert pd.isna(g.loc["s", "mean"])
    assert g.loc["z", "n_distinct"] == 0
    assert pd.isna(g.loc["z", "min_str"]) and pd.isna(g.loc["z", "mean"])


def test_profile_temporal_bool_and_uint_guard(ray_session):
    """Non-numeric, non-string columns (timestamp/bool) profile on their
    string form instead of crashing; uint64 beyond int64 fails loudly
    instead of silently wrapping."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from saber_ray.stages.stats import profile

    t = pa.table({
        "ts": pa.array(pd.to_datetime(
            ["2026-01-02", "2026-01-01", None]).values),
        "flag": pa.array([True, False, True], pa.bool_()),
    })
    g = profile(rd.from_arrow(t).repartition(2)).to_pandas() \
        .set_index("column")
    assert g.loc["ts", "n_distinct"] == 2 and g.loc["ts", "n_nulls"] == 1
    assert g.loc["ts", "min_str"].startswith("2026-01-01")
    assert g.loc["flag", "n_distinct"] == 2
    assert g.loc["flag", "min_str"] == "false"

    big = pa.table({"u": pa.array([2 ** 63 + 5, 1], pa.uint64())})
    with pytest.raises(Exception, match="int64 domain"):
        profile(rd.from_arrow(big)).to_pandas()


def test_windowed_quantiles_composition(ray_session, sf_dir):
    """assign_windows |> grouped_quantiles = per-sliding-window medians —
    the compositional primitive the packaged aggregates don't cover,
    checked vs a DuckDB window-expansion twin."""
    from saber_ray import Window
    from saber_ray.sources.parquet import read_table
    from saber_ray.stages.stats import grouped_quantiles
    from saber_ray.stages.window_agg import assign_windows
    from tests.oracle_util import assert_matches_oracle

    DAY = 86_400_000_000
    ev = read_table(sf_dir, "events", columns=["ts", "value"])

    def to_us(t):
        import pyarrow as pa
        import pyarrow.compute as pc
        return t.set_column(t.column_names.index("ts"), "ts",
                            pc.cast(t["ts"], pa.int64()))

    ev = ev.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)
    w = Window.sliding(2 * DAY, DAY)
    out = grouped_quantiles(
        assign_windows(ev, w, ts_col="ts", window_id_alias="window_id"),
        "window_id", "value",
        {"p50": 0.5, "p90": 0.9}, count_alias="n")
    assert_matches_oracle(
        out,
        "WITH t AS (SELECT epoch_us(ts) AS tu, value FROM events), "
        "w AS (SELECT (tu // 86400000000) - o.i AS window_id, value "
        "FROM t CROSS JOIN (VALUES (0),(1)) o(i) "
        "WHERE (tu // 86400000000) - o.i >= 0) "
        "SELECT window_id, "
        "quantile_disc(value, 0.5) AS p50, "
        "quantile_disc(value, 0.9) AS p90, COUNT(*) AS n "
        "FROM w GROUP BY window_id",
        sf_dir)
