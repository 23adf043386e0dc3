"""Grouped top-n vs a DuckDB ROW_NUMBER() oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from saber_ray.stages.topk import grouped_topk
from tests.oracle_util import assert_matches_oracle, canon, to_pandas


def test_grouped_topk_vs_row_number(ray_session, sf_dir):
    from __ray_entry__ import read_table
    ev = read_table(sf_dir, "events",
                    columns=["event_type", "value", "event_id"])
    out = grouped_topk(ev, "event_type", ["value", "event_id"], 5,
                       descending=[True, False], rank_alias="rn")
    assert_matches_oracle(
        out,
        "SELECT * FROM (SELECT event_type, value, event_id, "
        "ROW_NUMBER() OVER (PARTITION BY event_type "
        "ORDER BY value DESC, event_id) AS rn FROM events) WHERE rn <= 5",
        sf_dir)


def test_grouped_topk_null_keys_and_invariance(ray_session):
    rng = np.random.default_rng(5)
    n = 4000
    t = pa.table({
        "g": pa.array(np.array(["a", "b", None, "c"], dtype=object)[
            rng.integers(0, 4, n)], pa.string()),
        "v": pa.array(rng.integers(0, 10_000, n), pa.int64()),
        "id": pa.array(np.arange(n), pa.int64())})
    import duckdb
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT * FROM (SELECT g, v, id, ROW_NUMBER() OVER "
        "(PARTITION BY g ORDER BY v DESC, id) AS rn FROM t) "
        "WHERE rn <= 3").df())
    for parts in (1, 6):
        got = canon(to_pandas(grouped_topk(
            rd.from_arrow(t).repartition(parts), "g", ["v", "id"], 3,
            descending=[True, False], rank_alias="rn")))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_topk_descending_length_mismatch_raises(ray_session):
    t = pa.table({"g": ["a"], "v": [1], "id": [1]})
    try:
        grouped_topk(rd.from_arrow(t), "g", ["v", "id"], 2,
                     descending=[True])
        assert False, "expected ValueError"
    except ValueError as e:
        assert "descending" in str(e)
