"""assign_windows composition: per-window DISTINCT / top-k vs SQL twins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from saber_ray.core.windows import DAY, HOUR, Window
from saber_ray.stages.topk import grouped_topk
from saber_ray.stages.window_agg import assign_windows, \
    windowed_distinct_count
from saber_ray.sources.parquet import read_table
from tests.oracle_util import assert_matches_oracle, canon, to_pandas

W = Window.sliding(2 * DAY, 12 * HOUR)
_EXPAND = (
    "WITH w AS (SELECT user_id, event_type, "
    f"(epoch_us(ts) // {12 * HOUR}) - o.i AS window_id FROM events "
    "CROSS JOIN (VALUES (0),(1),(2),(3)) o(i) "
    f"WHERE (epoch_us(ts) // {12 * HOUR}) - o.i >= 0) ")


def test_windowed_distinct_count_sliding(ray_session, sf_dir):
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    out = windowed_distinct_count(ev, W, "user_id", keys=["event_type"])
    assert_matches_oracle(
        out,
        _EXPAND + "SELECT event_type, window_id, "
        "COUNT(DISTINCT user_id) AS n_distinct FROM w GROUP BY 1, 2",
        sf_dir)


def test_windowed_distinct_count_approx_exact_below_capacity(
        ray_session, sf_dir):
    """The KMV path is exact below capacity -> identical to the exact path
    at this scale (the giant-window regime is property-tested in
    test_stats)."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])
    a = canon(to_pandas(windowed_distinct_count(ev, W, "user_id")))
    b = canon(to_pandas(windowed_distinct_count(ev, W, "user_id",
                                                approx=True)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_per_window_topk_composition(ray_session, sf_dir):
    """Trending event types per window: assign_windows |> count |> top-2 —
    the compositional pattern assign_windows exists for."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])
    counted = assign_windows(ev, W).groupby(
        ["window_id", "event_type"]).count()
    out = grouped_topk(counted, "window_id", ["count()", "event_type"], 2,
                       descending=[True, False], rank_alias="rn")
    got = canon(to_pandas(out).rename(columns={"count()": "n"}))
    assert_matches_oracle(
        got,
        _EXPAND + "SELECT window_id, event_type, n, rn FROM ("
        "SELECT window_id, event_type, COUNT(*) AS n, ROW_NUMBER() OVER "
        "(PARTITION BY window_id ORDER BY COUNT(*) DESC, event_type) AS rn "
        "FROM w GROUP BY 1, 2) WHERE rn <= 2",
        sf_dir)


def test_assign_windows_null_ts_raises(ray_session):
    t = pa.table({"ts": pa.array([1, None], pa.timestamp("us")),
                  "v": [1, 2]})
    try:
        to_pandas(assign_windows(rd.from_arrow(t), Window.tumbling(10)))
        assert False, "expected error on NULL ts"
    except Exception:
        pass
