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


# ---------------------------------------------------------------------------
# quantified patterns: (pred, "+") — greedy, possessive
# ---------------------------------------------------------------------------

def _quant_sql(extra_where: str = "", select_ts: bool = False) -> str:
    """Oracle for [user, assistant+, user]: assistant-run lengths via
    gaps-and-islands, then rn arithmetic — the same possessive-greedy
    semantics (the run is the FULL consecutive assistant island)."""
    ts = (", s.tu AS match_start_us, e.tu AS match_end_us"
          if select_ts else "")
    return f"""
        WITH transcripts AS ({TRANSCRIPTS_SQL}),
        r AS (
          SELECT conv_id, turn_idx, role, epoch_us(ts) AS tu,
                 ROW_NUMBER() OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) AS rn
          FROM transcripts),
        isl AS (
          SELECT *, rn - ROW_NUMBER() OVER (
                   PARTITION BY conv_id, (role = 'assistant')
                   ORDER BY rn) AS grp
          FROM r),
        runs AS (
          SELECT *, CASE WHEN role = 'assistant' THEN
                   COUNT(*) OVER (PARTITION BY conv_id,
                                  (role = 'assistant'), grp
                                  ORDER BY rn ROWS BETWEEN CURRENT ROW
                                  AND UNBOUNDED FOLLOWING)
                 ELSE 0 END AS runlen
          FROM isl)
        SELECT s.conv_id, s.turn_idx AS match_start_turn_idx,
               e.turn_idx AS match_end_turn_idx{ts}
        FROM runs s
        JOIN runs b ON b.conv_id = s.conv_id AND b.rn = s.rn + 1
        JOIN runs e ON e.conv_id = s.conv_id AND e.rn = s.rn + 1 + b.runlen
        WHERE s.role = 'user' AND b.runlen >= 1 AND e.role = 'user'
        {extra_where}"""


QPATTERN = [col("role") == "user", (col("role") == "assistant", "+"),
            col("role") == "user"]


def test_quantified_pattern_vs_islands_oracle(ray_session, sf_dir):
    out = match_pattern(transcripts_from_events(sf_dir), QPATTERN,
                        keys="conv_id", order_by="turn_idx")
    got = to_pandas(out)
    assert len(got) > 0
    # variable-length matches really occur (some assistant runs > 1)
    spans = got["match_end_turn_idx"] - got["match_start_turn_idx"]
    assert spans.max() > 2
    assert_matches_oracle(got, _quant_sql(), sf_dir)


def test_quantified_within_vs_oracle(ray_session, sf_dir):
    within = 24 * 3600 * 1_000_000
    out = match_pattern(transcripts_from_events(sf_dir), QPATTERN,
                        keys="conv_id", order_by="turn_idx",
                        ts_col="ts", within=within)
    assert_matches_oracle(
        out, _quant_sql(f"AND e.tu - s.tu <= {within}", select_ts=True),
        sf_dir)


def test_quantified_partition_invariance(ray_session, sf_dir):
    a = canon(to_pandas(match_pattern(
        transcripts_from_events(sf_dir), QPATTERN, keys="conv_id",
        order_by="turn_idx")))
    b = canon(to_pandas(match_pattern(
        transcripts_from_events(sf_dir).repartition(7), QPATTERN,
        keys="conv_id", order_by="turn_idx")))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_quantifier_is_possessive(ray_session):
    """B+ followed by a step that ALSO matches B rows: possessive (no
    backtracking) means the run swallows every consecutive B and the next
    step must match strictly after it."""
    import pyarrow as pa
    import ray.data as rd
    t = pa.table({
        "k": ["c"] * 4,
        "i": [0, 1, 2, 3],
        "v": ["a", "b", "b", "x"]})
    ds = rd.from_arrow(t)
    # pattern: v=='a', (v in {'b','x'})+, v=='x' — the greedy run takes
    # b,b,x so no row remains for the final step: NO match (a
    # backtracking matcher would yield one by stopping the run at i=2)
    pat = [col("v") == "a",
           ((col("v") == "b") | (col("v") == "x"), "+"),
           col("v") == "x"]
    out = to_pandas(match_pattern(ds, pat, keys="k", order_by="i"))
    assert len(out) == 0
    # with a disjoint run predicate the same data matches once, end at x
    pat2 = [col("v") == "a", (col("v") == "b", "+"), col("v") == "x"]
    out2 = to_pandas(match_pattern(ds, pat2, keys="k", order_by="i"))
    assert len(out2) == 1
    assert out2["match_start_i"].iloc[0] == 0
    assert out2["match_end_i"].iloc[0] == 3


def test_quantified_non_overlapping_variable_ends(ray_session):
    """SKIP PAST LAST ROW with variable-length matches: the second match
    must start after the FIRST match's actual (greedy) end."""
    import pyarrow as pa
    import ray.data as rd
    v = ["a", "b", "b", "b", "a", "a", "b", "a"]
    t = pa.table({"k": ["c"] * len(v), "i": list(range(len(v))), "v": v})
    pat = [col("v") == "a", (col("v") == "b", "+"), col("v") == "a"]
    ds = rd.from_arrow(t)
    over = to_pandas(match_pattern(ds, pat, keys="k", order_by="i"))
    non = to_pandas(match_pattern(ds, pat, keys="k", order_by="i",
                                  non_overlapping=True))
    # overlapping: starts at 0 (a bbb a) and 5 (a b a)
    assert sorted(over["match_start_i"]) == [0, 5]
    assert sorted(over["match_end_i"]) == [4, 7]
    # match 0 ends at i=4; the next candidate start 5 is AFTER it -> kept
    assert sorted(non["match_start_i"]) == [0, 5]


def test_quantifier_never_crosses_keys(ray_session):
    import pyarrow as pa
    import ray.data as rd
    t = pa.table({
        "k": ["c", "c", "d", "d"],
        "i": [0, 1, 0, 1],
        "v": ["a", "b", "b", "a"]})
    pat = [col("v") == "a", (col("v") == "b", "+"), col("v") == "a"]
    out = to_pandas(match_pattern(rd.from_arrow(t), pat,
                                  keys="k", order_by="i"))
    assert len(out) == 0          # the b-run would have to span c into d


def test_streaming_cep_rejects_quantifiers(tmp_path):
    from saber_ray.streaming_cep import StreamingMatchPattern
    with pytest.raises(ValueError, match="quantified"):
        StreamingMatchPattern(
            str(tmp_path / "cep"),
            pattern=[(col("role") == "assistant", "+")])


def _star_sql() -> str:
    """Oracle for [user, assistant*, user]: same islands construction,
    but the middle run may be EMPTY (b.runlen = 0 on a non-assistant
    row), so adjacent user-user pairs match too."""
    return f"""
        WITH transcripts AS ({TRANSCRIPTS_SQL}),
        r AS (
          SELECT conv_id, turn_idx, role,
                 ROW_NUMBER() OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) AS rn
          FROM transcripts),
        isl AS (
          SELECT *, rn - ROW_NUMBER() OVER (
                   PARTITION BY conv_id, (role = 'assistant')
                   ORDER BY rn) AS grp
          FROM r),
        runs AS (
          SELECT *, CASE WHEN role = 'assistant' THEN
                   COUNT(*) OVER (PARTITION BY conv_id,
                                  (role = 'assistant'), grp
                                  ORDER BY rn ROWS BETWEEN CURRENT ROW
                                  AND UNBOUNDED FOLLOWING)
                 ELSE 0 END AS runlen
          FROM isl)
        SELECT s.conv_id, s.turn_idx AS match_start_turn_idx,
               e.turn_idx AS match_end_turn_idx
        FROM runs s
        JOIN runs b ON b.conv_id = s.conv_id AND b.rn = s.rn + 1
        JOIN runs e ON e.conv_id = s.conv_id AND e.rn = s.rn + 1 + b.runlen
        WHERE s.role = 'user' AND e.role = 'user'"""


def test_star_quantifier_vs_islands_oracle(ray_session, sf_dir):
    pat = [col("role") == "user", (col("role") == "assistant", "*"),
           col("role") == "user"]
    out = match_pattern(transcripts_from_events(sf_dir), pat,
                        keys="conv_id", order_by="turn_idx")
    got = to_pandas(out)
    # star matches strictly MORE than plus (adjacent user-user pairs)
    plus = to_pandas(match_pattern(transcripts_from_events(sf_dir),
                                   QPATTERN, keys="conv_id",
                                   order_by="turn_idx"))
    assert len(got) > len(plus)
    assert_matches_oracle(got, _star_sql(), sf_dir)


def test_question_quantifier(ray_session):
    """a b? x: matches both with and without the optional middle row,
    possessively (b consumed when present)."""
    import pyarrow as pa
    import ray.data as rd
    t = pa.table({
        "k": ["c"] * 3 + ["d"] * 2,
        "i": [0, 1, 2, 0, 1],
        "v": ["a", "b", "x", "a", "x"]})
    pat = [col("v") == "a", (col("v") == "b", "?"), col("v") == "x"]
    out = to_pandas(match_pattern(rd.from_arrow(t), pat,
                                  keys="k", order_by="i"))
    out = out.sort_values("k").reset_index(drop=True)
    assert len(out) == 2
    assert out["match_end_i"].tolist() == [2, 1]  # with b / without b


def test_quantifier_validation():
    import pyarrow as pa
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"k": ["c"], "i": [0], "v": ["a"]}))
    with pytest.raises(ValueError, match="non-optional"):
        match_pattern(ds, [(col("v") == "a", "*")], keys="k", order_by="i")
    with pytest.raises(ValueError, match="first pattern step"):
        match_pattern(ds, [(col("v") == "a", "?"), col("v") == "a"],
                      keys="k", order_by="i")
    with pytest.raises(ValueError, match="quantifier"):
        match_pattern(ds, [(col("v") == "a", "++")], keys="k", order_by="i")
