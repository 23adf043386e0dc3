"""CEP pattern matching vs a DuckDB LEAD() oracle over the transcripts."""

import numpy as np
import pandas as pd
import pytest

from saber_ray import col
from saber_ray.sources.transcripts import TRANSCRIPTS_SQL, transcripts_from_events
from saber_ray.stages.cep import match_pattern
from tests.oracle_util import assert_matches_oracle, canon, duck, to_pandas

PATTERN = [col("role") == "user", col("role") == "assistant",
           col("role") == "user"]


def _lead_sql(extra_where: str = "", select_ts: bool = False) -> str:
    ts = (", tu AS match_start_us, t2 AS match_end_us"
          if select_ts else "")
    return f"""
        WITH transcripts AS ({TRANSCRIPTS_SQL}),
        w AS (
          SELECT conv_id, turn_idx, role, epoch_us(ts) AS tu,
            LEAD(role, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx) r1,
            LEAD(role, 2) OVER (PARTITION BY conv_id ORDER BY turn_idx) r2,
            LEAD(turn_idx, 2) OVER (PARTITION BY conv_id ORDER BY turn_idx) i2,
            LEAD(epoch_us(ts), 2)
                OVER (PARTITION BY conv_id ORDER BY turn_idx) t2
          FROM transcripts)
        SELECT conv_id, turn_idx AS match_start_turn_idx,
               i2 AS match_end_turn_idx{ts}
        FROM w WHERE role = 'user' AND r1 = 'assistant' AND r2 = 'user'
        {extra_where}"""


def test_match_pattern_vs_lead_oracle(ray_session, sf_dir):
    out = match_pattern(transcripts_from_events(sf_dir), PATTERN,
                        keys="conv_id", order_by="turn_idx")
    got = to_pandas(out).rename(columns={
        "match_start_turn_idx": "match_start_turn_idx"})
    assert len(got) > 0
    assert_matches_oracle(got, _lead_sql(), sf_dir)


def test_match_pattern_within_vs_oracle(ray_session, sf_dir):
    within = 24 * 3600 * 1_000_000         # 24 h in µs (keeps ~half the matches)
    out = match_pattern(transcripts_from_events(sf_dir), PATTERN,
                        keys="conv_id", order_by="turn_idx",
                        ts_col="ts", within=within)
    assert_matches_oracle(
        out, _lead_sql(f"AND t2 - tu <= {within}", select_ts=True), sf_dir)


def test_match_pattern_partition_invariance(ray_session, sf_dir):
    a = canon(to_pandas(match_pattern(
        transcripts_from_events(sf_dir), PATTERN, keys="conv_id",
        order_by="turn_idx")))
    b = canon(to_pandas(match_pattern(
        transcripts_from_events(sf_dir).repartition(7), PATTERN,
        keys="conv_id", order_by="turn_idx")))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_match_pattern_non_overlapping(ray_session):
    """A run of k consecutive matches of a 2-step pattern: overlapping mode
    reports k-1 starts, non-overlapping mode reports floor(k/2) disjoint
    ones (SKIP PAST LAST ROW)."""
    import pyarrow as pa
    import ray.data as rd
    n = 9
    t = pa.table({"conv_id": pa.array(["c"] * n + ["d"] * 3),
                  "turn_idx": pa.array(list(range(n)) + [0, 1, 2],
                                       pa.int64()),
                  "role": pa.array(["x"] * n + ["x"] * 3)})
    pat = [col("role") == "x", col("role") == "x"]
    over = to_pandas(match_pattern(rd.from_arrow(t), pat, keys="conv_id",
                                   order_by="turn_idx"))
    non = to_pandas(match_pattern(rd.from_arrow(t), pat, keys="conv_id",
                                  order_by="turn_idx", non_overlapping=True))
    assert len(over) == (n - 1) + 2
    assert len(non) == n // 2 + 1
    # disjoint and ordered per key
    for _, g in non.groupby("conv_id"):
        s = np.sort(g["match_start_turn_idx"].to_numpy())
        assert (np.diff(s) >= 2).all()
    # non-overlapping starts are a subset of overlapping starts
    key = ["conv_id", "match_start_turn_idx"]
    merged = non.merge(over[key], on=key, how="left", indicator=True)
    assert (merged["_merge"] == "both").all()


def test_match_pattern_empty_and_validation(ray_session):
    import pyarrow as pa
    import ray.data as rd
    t = pa.table({"conv_id": pa.array(["a"]), "turn_idx": pa.array([0]),
                  "role": pa.array(["system"])})
    out = to_pandas(match_pattern(rd.from_arrow(t), PATTERN, keys="conv_id",
                                  order_by="turn_idx"))
    assert len(out) == 0
    with pytest.raises(ValueError):
        match_pattern(rd.from_arrow(t), [], keys="conv_id",
                      order_by="turn_idx")
    with pytest.raises(ValueError):
        match_pattern(rd.from_arrow(t), PATTERN, keys="conv_id",
                      order_by="turn_idx", within=5)


def test_match_pattern_null_ts(ray_session):
    """NULL timestamps: ts_col-only mode emits NULL match bounds (no crash);
    `within` mode excludes matches touching a NULL ts (SQL comparison)."""
    import pyarrow as pa
    import ray.data as rd
    t = pa.table({
        "conv_id": pa.array(["c"] * 4, pa.string()),
        "turn_idx": pa.array([0, 1, 2, 3], pa.int64()),
        "role": pa.array(["x"] * 4, pa.string()),
        "ts": pa.array([10, None, 30, 40], pa.timestamp("us"))})
    pat = [col("role") == "x", col("role") == "x"]
    got = to_pandas(match_pattern(
        rd.from_arrow(t), pat, keys="conv_id", order_by="turn_idx",
        ts_col="ts")).sort_values("match_start_turn_idx")
    assert len(got) == 3
    assert pd.isna(got["match_end_us"].iloc[0])    # rows 0-1: end ts NULL
    assert pd.isna(got["match_start_us"].iloc[1])  # rows 1-2: start ts NULL
    assert got["match_start_us"].iloc[2] == 30
    within = to_pandas(match_pattern(
        rd.from_arrow(t), pat, keys="conv_id", order_by="turn_idx",
        ts_col="ts", within=1_000_000))
    assert sorted(within["match_start_turn_idx"]) == [2]
