"""Rolling per-key aggregates vs DuckDB ROWS BETWEEN window oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from saber_ray.stages.rolling import rolling_agg
from tests.oracle_util import assert_matches_oracle, canon, to_pandas

_WIN = ("WINDOW w AS (PARTITION BY g ORDER BY i "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)")


def test_rolling_agg_random_nulls(ray_session):
    """All five ops vs SQL, with NULL keys, NULL values, and groups both
    shorter and longer than the window."""
    rng = np.random.default_rng(11)
    n = 3000
    g = np.array(["a", "b", None, "c", "d"], dtype=object)[
        rng.integers(0, 5, n)]
    v = rng.integers(-50, 50, n).astype(object)
    v[rng.random(n) < 0.2] = None
    t = pa.table({"g": pa.array(g, pa.string()),
                  "i": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(v, pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT g, i, SUM(v) OVER w AS rsum, "
        "AVG(v) OVER w AS ravg, COUNT(v) OVER w AS rcnt, "
        "MIN(v) OVER w AS rmin, MAX(v) OVER w AS rmax "
        f"FROM t {_WIN}").df())
    for parts in (1, 6):
        got = canon(to_pandas(rolling_agg(
            rd.from_arrow(t).repartition(parts), "g", "i", "v",
            window_rows=4,
            aggs={"rsum": "sum", "ravg": "avg", "rcnt": "count",
                  "rmin": "min", "rmax": "max"})))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_agg_events_oracle(ray_session, sf_dir):
    from __ray_entry__ import read_table
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "value"])
    out = rolling_agg(ev, "user_id", "event_id", "value", window_rows=8,
                      aggs={"running_sum": "sum", "running_n": "count"})
    assert_matches_oracle(
        out,
        "SELECT user_id, event_id, "
        "SUM(value) OVER w AS running_sum, COUNT(value) OVER w AS running_n "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id "
        "ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)",
        sf_dir)


def test_rolling_agg_window_one_and_float(ray_session):
    t = pa.table({"g": pa.array(["x", "x", "y"], pa.string()),
                  "i": pa.array([0, 1, 0], pa.int64()),
                  "v": pa.array([1.5, 2.5, -1.0], pa.float64())})
    got = to_pandas(rolling_agg(rd.from_arrow(t), "g", "i", "v",
                                window_rows=1,
                                aggs={"s": "sum", "m": "min"}))
    got = got.sort_values(["g", "i"]).reset_index(drop=True)
    assert got["s"].tolist() == [1.5, 2.5, -1.0]
    assert got["m"].tolist() == [1.5, 2.5, -1.0]


def test_rolling_minmax_int64_beyond_2p53(ray_session):
    """min/max must not round-trip through float64: int64 values above 2^53
    come back bit-exact."""
    big = 2 ** 53
    vals = [big + 1, big + 3, big + 2, -big - 7, big + 5]
    t = pa.table({"g": pa.array(["a"] * 5, pa.string()),
                  "i": pa.array(range(5), pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    got = to_pandas(rolling_agg(
        rd.from_arrow(t), "g", "i", "v", window_rows=2,
        aggs={"rmin": "min", "rmax": "max"})).sort_values("i")
    assert list(got["rmin"]) == [big + 1, big + 1, big + 2, -big - 7, -big - 7]
    assert list(got["rmax"]) == [big + 1, big + 3, big + 3, big + 2, big + 5]


def test_rolling_minmax_keeps_legit_infinities(ray_session):
    """A float window legitimately containing ±inf emits ±inf, not 0; an
    all-NULL window still emits NULL."""
    t = pa.table({"g": pa.array(["a"] * 4, pa.string()),
                  "i": pa.array(range(4), pa.int64()),
                  "v": pa.array([-np.inf, np.inf, None, None], pa.float64())})
    got = to_pandas(rolling_agg(
        rd.from_arrow(t), "g", "i", "v", window_rows=2,
        aggs={"rmin": "min", "rmax": "max"})).sort_values("i")
    assert got["rmin"].iloc[0] == -np.inf and got["rmax"].iloc[1] == np.inf
    assert got["rmin"].iloc[1] == -np.inf      # window [-inf, inf]
    assert pd.isna(got["rmin"].iloc[3])        # window [NULL, NULL]


def test_rolling_range_frame_vs_duckdb(ray_session):
    """RANGE BETWEEN X PRECEDING AND CURRENT ROW vs DuckDB, with duplicate
    order values (peer inclusion), NULL order values (NULL-peer frame),
    NULL aggregate values, and NULL keys."""
    rng = np.random.default_rng(23)
    n = 2500
    g = np.array(["a", "b", None, "c"], dtype=object)[rng.integers(0, 4, n)]
    ts = rng.integers(0, 400, n).astype(object)       # heavy duplicates
    ts[rng.random(n) < 0.05] = None
    v = rng.integers(-40, 40, n).astype(object)
    v[rng.random(n) < 0.2] = None
    t = pa.table({"g": pa.array(g, pa.string()),
                  "ts": pa.array(ts, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT g, ts, SUM(v) OVER w AS rsum, AVG(v) OVER w AS ravg, "
        "COUNT(v) OVER w AS rcnt, MIN(v) OVER w AS rmin, "
        "MAX(v) OVER w AS rmax FROM t WINDOW w AS "
        "(PARTITION BY g ORDER BY ts "
        "RANGE BETWEEN 25 PRECEDING AND CURRENT ROW)").df())
    for parts in (1, 5):
        got = canon(to_pandas(rolling_agg(
            rd.from_arrow(t).repartition(parts), "g", "ts", "v",
            range_preceding=25,
            aggs={"rsum": "sum", "ravg": "avg", "rcnt": "count",
                  "rmin": "min", "rmax": "max"})))
        pd.testing.assert_frame_equal(got, want)


def test_rolling_mode_validation(ray_session):
    t = pa.table({"g": ["a"], "i": [1], "v": [1]})
    ds = rd.from_arrow(t)
    for kwargs in ({}, {"window_rows": 2, "range_preceding": 3}):
        try:
            rolling_agg(ds, "g", "i", "v", aggs={"s": "sum"}, **kwargs)
            assert False, "expected ValueError"
        except ValueError:
            pass
    try:
        rolling_agg(ds, "g", ["i", "v"], "v", aggs={"s": "sum"},
                    range_preceding=3)
        assert False, "expected ValueError (multi-column order in range mode)"
    except ValueError:
        pass


def test_rolling_rows_following_frame(ray_session):
    """ROWS BETWEEN p PRECEDING AND f FOLLOWING vs DuckDB, NULL keys and
    values, frames clipped at both segment edges."""
    rng = np.random.default_rng(23)
    n = 2000
    g = np.array(["a", "b", None, "c"], dtype=object)[rng.integers(0, 4, n)]
    v = rng.integers(-50, 50, n).astype(object)
    v[rng.random(n) < 0.2] = None
    t = pa.table({"g": pa.array(g, pa.string()),
                  "i": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(v, pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT g, i, SUM(v) OVER w AS rsum, AVG(v) OVER w AS ravg, "
        "COUNT(v) OVER w AS rcnt, MIN(v) OVER w AS rmin, "
        "MAX(v) OVER w AS rmax FROM t WINDOW w AS "
        "(PARTITION BY g ORDER BY i "
        "ROWS BETWEEN 2 PRECEDING AND 3 FOLLOWING)").df())
    for parts in (1, 5):
        got = canon(to_pandas(rolling_agg(
            rd.from_arrow(t).repartition(parts), "g", "i", "v",
            window_rows=(2, 3),
            aggs={"rsum": "sum", "ravg": "avg", "rcnt": "count",
                  "rmin": "min", "rmax": "max"})))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_range_following_frame(ray_session):
    """RANGE BETWEEN X PRECEDING AND Y FOLLOWING vs DuckDB, with duplicate
    order values (peers) and NULL order rows (peer-group frames)."""
    rng = np.random.default_rng(29)
    n = 1500
    g = np.array(["a", "b", "c"], dtype=object)[rng.integers(0, 3, n)]
    o = rng.integers(0, 300, n).astype(object)
    o[rng.random(n) < 0.1] = None
    v = rng.integers(-50, 50, n).astype(object)
    v[rng.random(n) < 0.2] = None
    t = pa.table({"g": pa.array(g, pa.string()),
                  "o": pa.array(o, pa.int64()),
                  "v": pa.array(v, pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT g, o, rid, SUM(v) OVER w AS rsum, COUNT(v) OVER w AS rcnt, "
        "MIN(v) OVER w AS rmin, MAX(v) OVER w AS rmax FROM t WINDOW w AS "
        "(PARTITION BY g ORDER BY o "
        "RANGE BETWEEN 20 PRECEDING AND 15 FOLLOWING)").df())
    for parts in (1, 4):
        got = canon(to_pandas(rolling_agg(
            rd.from_arrow(t).repartition(parts), "g", "o", "v",
            range_preceding=20, range_following=15, keep=["rid"],
            aggs={"rsum": "sum", "rcnt": "count",
                  "rmin": "min", "rmax": "max"})))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_range_following_only(ray_session):
    """range_following alone = RANGE BETWEEN CURRENT ROW AND Y FOLLOWING
    (frame starts at the first peer, SQL CURRENT ROW range semantics)."""
    t = pa.table({"g": pa.array(["x"] * 6, pa.string()),
                  "o": pa.array([0, 10, 10, 20, 30, 100], pa.int64()),
                  "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT g, o, SUM(v) OVER w AS rsum FROM t WINDOW w AS "
        "(PARTITION BY g ORDER BY o "
        "RANGE BETWEEN CURRENT ROW AND 10 FOLLOWING)").df())
    got = canon(to_pandas(rolling_agg(
        rd.from_arrow(t).repartition(2), "g", "o", "v",
        range_following=10, aggs={"rsum": "sum"})))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_first_last_value(ray_session):
    """FIRST_VALUE / LAST_VALUE over two-sided ROWS and RANGE frames vs
    DuckDB — RESPECT NULLS (a NULL boundary row yields NULL)."""
    rng = np.random.default_rng(31)
    n = 1200
    g = np.array(["a", "b", "c"], dtype=object)[rng.integers(0, 3, n)]
    # UNIQUE order values: FIRST/LAST_VALUE among RANGE peers is
    # implementation-defined in SQL (tie order), so ties are excluded
    o = rng.permutation(n * 3)[:n]
    v = rng.integers(-50, 50, n).astype(object)
    v[rng.random(n) < 0.25] = None
    t = pa.table({"g": pa.array(g, pa.string()),
                  "o": pa.array(o, pa.int64()),
                  "v": pa.array(v, pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT g, rid, FIRST_VALUE(v) OVER w AS fv, "
        "LAST_VALUE(v) OVER w AS lv FROM t WINDOW w AS "
        "(PARTITION BY g ORDER BY rid "
        "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)").df())
    got = canon(to_pandas(rolling_agg(
        rd.from_arrow(t).repartition(4), "g", "rid", "v",
        window_rows=(2, 2),
        aggs={"fv": "first_value", "lv": "last_value"})))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    want2 = canon(con.sql(
        "SELECT g, o, rid, FIRST_VALUE(v) OVER w AS fv, "
        "LAST_VALUE(v) OVER w AS lv FROM t WINDOW w AS "
        "(PARTITION BY g ORDER BY o "
        "RANGE BETWEEN 10 PRECEDING AND 5 FOLLOWING)").df())
    got2 = canon(to_pandas(rolling_agg(
        rd.from_arrow(t).repartition(3), "g", "o", "v",
        range_preceding=10, range_following=5, keep=["rid"],
        aggs={"fv": "first_value", "lv": "last_value"})))
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)
