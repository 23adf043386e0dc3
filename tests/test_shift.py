"""shift (LAG/LEAD) vs DuckDB window-function oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from saber_ray.sources.transcripts import TRANSCRIPTS_SQL, transcripts_from_events
from saber_ray.stages.shift import shift
from tests.oracle_util import assert_matches_oracle, canon, to_pandas


def test_shift_random_vs_duckdb(ray_session):
    """LAG 1 / LAG 2 / LEAD 1 over string and int columns, NULL keys and
    NULL values, groups shorter than the offset."""
    rng = np.random.default_rng(31)
    n = 2500
    g = np.array(["a", "b", None, "c", "d"], dtype=object)[
        rng.integers(0, 5, n)]
    s = np.array(["x", "yy", None, "zzz"], dtype=object)[
        rng.integers(0, 4, n)]
    v = rng.integers(0, 10**15, n).astype(object)     # > 2^53 exactness
    v[rng.random(n) < 0.15] = None
    t = pa.table({"g": pa.array(g, pa.string()),
                  "i": pa.array(np.arange(n), pa.int64()),
                  "s": pa.array(s, pa.string()),
                  "v": pa.array(v, pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(
        "SELECT g, i, LAG(s, 1) OVER w AS prev_s, "
        "LAG(v, 2) OVER w AS prev2_v, LEAD(s, 1) OVER w AS next_s "
        "FROM t WINDOW w AS (PARTITION BY g ORDER BY i)").df())
    for parts in (1, 6):
        got = canon(to_pandas(shift(
            rd.from_arrow(t).repartition(parts), "g", "i",
            {"prev_s": ("s", 1), "prev2_v": ("v", 2),
             "next_s": ("s", -1)})))
        pd.testing.assert_frame_equal(got, want)


def test_shift_transcripts_prev_turn(ray_session, sf_dir):
    """Previous-turn text per conversation (the canonical transcript use)."""
    out = shift(transcripts_from_events(sf_dir), "conv_id", "turn_idx",
                {"prev_text": ("text", 1), "prev_role": ("role", 1)},
                keep=["role"])
    assert_matches_oracle(
        out,
        f"WITH transcripts AS ({TRANSCRIPTS_SQL}) "
        "SELECT conv_id, turn_idx, role, "
        "LAG(text, 1) OVER w AS prev_text, "
        "LAG(role, 1) OVER w AS prev_role FROM transcripts "
        "WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)",
        sf_dir)


def test_shift_validation(ray_session):
    ds = rd.from_arrow(pa.table({"g": ["a"], "i": [1], "v": [1]}))
    for bad in ({}, {"x": ("v", 0)}):
        try:
            shift(ds, "g", "i", bad)
            assert False, "expected ValueError"
        except ValueError:
            pass
