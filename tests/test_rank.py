"""rank_window (ROW_NUMBER/RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST/NTILE)
vs DuckDB window-function oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.rank import rank_window
from tests.oracle_util import assert_matches_oracle, canon, to_pandas


def _rand_table(n=3000, seed=23):
    rng = np.random.default_rng(seed)
    g = np.array(["a", "b", None, "c", "d"], dtype=object)[
        rng.integers(0, 5, n)]
    o = np.array(["p", "q", None, "r"], dtype=object)[
        rng.integers(0, 4, n)]                        # ties + NULL order
    return pa.table({"g": pa.array(g, pa.string()),
                     "o": pa.array(o, pa.string()),
                     "i": pa.array(np.arange(n), pa.int64()),
                     "v": pa.array(rng.integers(0, 1000, n), pa.int64())})


def test_peer_functions_vs_duckdb(ray_session):
    """RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST with ties, NULL partition
    keys and NULL order values (NULLS LAST, one peer group)."""
    t = _rand_table()
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT g, o, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk, "
        "PERCENT_RANK() OVER w AS pr, CUME_DIST() OVER w AS cd "
        "FROM t WINDOW w AS (PARTITION BY g ORDER BY o)").df())
    for parts in (1, 7):
        got = canon(to_pandas(rank_window(
            rd.from_arrow(t).repartition(parts), "g", "o",
            {"rk": "rank", "drk": "dense_rank",
             "pr": "percent_rank", "cd": "cume_dist"})))
        pd.testing.assert_frame_equal(got, want)


def test_row_number_ntile_vs_duckdb(ray_session):
    """ROW_NUMBER and NTILE need a total per-partition order — unique
    trailing tiebreaker; NTILE sizes follow SQL (first n%k buckets one
    row bigger), including partitions smaller than k."""
    t = _rand_table(n=997)
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT g, o, i, ROW_NUMBER() OVER w AS rn, "
        "NTILE(4) OVER w AS nt4, NTILE(1000) OVER w AS big "
        "FROM t WINDOW w AS (PARTITION BY g ORDER BY o, i)").df())
    got = canon(to_pandas(rank_window(
        rd.from_arrow(t).repartition(5), "g", ["o", "i"],
        {"rn": "row_number", "nt4": ("ntile", 4), "big": ("ntile", 1000)})))
    pd.testing.assert_frame_equal(got, want)


def test_descending_order_vs_duckdb(ray_session):
    t = _rand_table(n=1200, seed=5)
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT g, v, RANK() OVER w AS rk, CUME_DIST() OVER w AS cd "
        "FROM t WINDOW w AS (PARTITION BY g ORDER BY v DESC)").df())
    got = canon(to_pandas(rank_window(
        rd.from_arrow(t).repartition(3), "g", "v",
        {"rk": "rank", "cd": "cume_dist"}, descending=True)))
    pd.testing.assert_frame_equal(got, want)


def test_rank_events_vs_oracle(ray_session, sf_dir):
    """Per-user event freshness rank over the driver tables (the rotated
    gate twin shape)."""
    import os
    from saber_ray.sources.parquet import read_table
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    out = rank_window(ds, "user_id", ["ts", "event_id"],
                      {"rn": "row_number"}, descending=[True, True])
    assert_matches_oracle(
        out,
        "SELECT user_id, ts, event_id, ROW_NUMBER() OVER "
        "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
        "FROM events",
        sf_dir)


def test_rank_validation(ray_session):
    ds = rd.from_arrow(pa.table({"g": ["a"], "o": [1]}))
    for bad in ({}, {"x": "median"}, {"x": ("ntile", 0)},
                {"x": ("rank", 2)}):
        with pytest.raises(ValueError):
            rank_window(ds, "g", "o", bad)
