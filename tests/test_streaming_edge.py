"""Adversarial edge cases for the streaming shift/rolling twins: NULL
keys, tied timestamps straddling the watermark, late rows, value nulls."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from saber_ray.streaming_rolling import StreamingRolling
from saber_ray.streaming_shift import StreamingShift
from tests.oracle_util import canon, to_pandas


def _files(tmp_path, tables):
    out = []
    for i, t in enumerate(tables):
        p = str(tmp_path / f"e{i:02d}.parquet")
        pq.write_table(t, p)
        out.append(p)
    return out


def test_shift_null_keys_one_partition(ray_session, tmp_path):
    """NULL keys form ONE partition (SQL PARTITION BY semantics), matching
    the window-function oracle."""
    files = _files(tmp_path, [
        pa.table({"k": ["a", None, None], "ts": [1, 2, 3],
                  "v": [10, 20, 30]}),
        pa.table({"k": [None, "a"], "ts": [10, 11], "v": [40, 50]}),
    ])
    job = StreamingShift(str(tmp_path / "out"),
                         specs={"prev_v": ("v", 1)}, keys=["k"],
                         ts_col="ts", num_partitions=2)
    job.run(files, epoch_size=1)
    got = canon(to_pandas(job.results()))
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    want = canon(duckdb.sql("""
        SELECT k, ts, LAG(v, 1) OVER
          (PARTITION BY k ORDER BY ts) AS prev_v FROM t""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_shift_tied_ts_at_watermark(ray_session, tmp_path):
    """Rows tied on ts straddling epoch boundaries: the tiebreak column
    orders them and sealing never splits correctness — final result
    equals the whole-stream oracle."""
    files = _files(tmp_path, [
        pa.table({"k": ["a", "a", "a"], "ts": [5, 5, 5],
                  "i": [1, 2, 3], "v": [10, 20, 30]}),
        pa.table({"k": ["a", "a"], "ts": [5, 6], "i": [4, 5],
                  "v": [40, 50]}),
        pa.table({"k": ["a"], "ts": [9], "i": [6], "v": [60]}),
    ])
    job = StreamingShift(str(tmp_path / "out"),
                         specs={"prev_v": ("v", 1), "next_v": ("v", -1)},
                         keys=["k"], ts_col="ts", tiebreak=["i"],
                         num_partitions=1)
    ck = job.run(files, epoch_size=1)
    assert ck["metrics"]["late_dropped"] == 0   # ties are NOT late
    got = canon(to_pandas(job.results()))
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    want = canon(duckdb.sql("""
        SELECT k, ts, i, LAG(v) OVER w AS prev_v, LEAD(v) OVER w AS next_v
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ts, i)""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_shift_late_rows_dead_lettered(ray_session, tmp_path):
    files = _files(tmp_path, [
        pa.table({"k": ["a"], "ts": [100], "v": [1]}),
        pa.table({"k": ["a"], "ts": [5], "v": [2]}),   # behind watermark
    ])
    job = StreamingShift(str(tmp_path / "out"),
                         specs={"prev_v": ("v", 1)}, keys=["k"],
                         ts_col="ts", num_partitions=1)
    ck = job.run(files, epoch_size=1)
    assert ck["metrics"]["late_dropped"] == 1
    assert job.late_results().num_rows == 1
    got = to_pandas(job.results())
    assert list(got["ts"]) == [100]


def test_rolling_null_values_and_ties(ray_session, tmp_path):
    """NULL agg values are skipped (SQL) and tied-ts peers share frames —
    across epoch boundaries."""
    files = _files(tmp_path, [
        pa.table({"k": ["a", "a"], "ts": [1, 1],
                  "v": pa.array([10, None], pa.int64())}),
        pa.table({"k": ["a", "a"], "ts": [3, 3],
                  "v": pa.array([None, 30], pa.int64())}),
        pa.table({"k": ["a"], "ts": [9], "v": pa.array([90], pa.int64())}),
    ])
    job = StreamingRolling(str(tmp_path / "out"), col="v",
                           aggs={"s": "sum", "n": "count", "mx": "max"},
                           range_preceding=2, range_following=1,
                           keys=["k"], ts_col="ts", num_partitions=1)
    job.run(files, epoch_size=1)
    got = canon(to_pandas(job.results()))
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    want = canon(duckdb.sql("""
        SELECT k, ts, CAST(SUM(v) OVER w AS BIGINT) AS s,
               COUNT(v) OVER w AS n, MAX(v) OVER w AS mx
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ts
          RANGE BETWEEN 2 PRECEDING AND 1 FOLLOWING)""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_backfill_keys_shift(ray_session, tmp_path):
    """backfill_keys corrects a shift job whose key-A rows were partly
    dead-lettered: the corrected output equals the whole-stream oracle."""
    from saber_ray.stages.shift import shift as batch_shift
    from saber_ray.streaming_keyed import backfill_keys

    files = _files(tmp_path, [
        pa.table({"k": ["a", "b"], "ts": [100, 101], "v": [1, 9]}),
        pa.table({"k": ["a"], "ts": [5], "v": [2]}),      # late for A
        pa.table({"k": ["a", "b"], "ts": [200, 201], "v": [3, 8]}),
    ])
    job = StreamingShift(str(tmp_path / "out"),
                         specs={"prev_v": ("v", 1)}, keys=["k"],
                         ts_col="ts", num_partitions=2)
    ck = job.run(files, epoch_size=1)
    assert ck["metrics"]["late_dropped"] == 1
    streamed = to_pandas(job.results())
    assert 5 not in set(streamed["ts"])                   # dropped

    corrected = backfill_keys(
        job, files,
        lambda ds: batch_shift(ds, "k", ["ts"],
                               {"prev_v": ("v", 1)}))
    got = canon(to_pandas(corrected))
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    want = canon(duckdb.sql("""
        SELECT k, ts, LAG(v, 1) OVER
          (PARTITION BY k ORDER BY ts) AS prev_v FROM t""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_backfill_keys_rolling(ray_session, tmp_path):
    from saber_ray.stages.rolling import rolling_agg
    from saber_ray.streaming_keyed import backfill_keys

    files = _files(tmp_path, [
        pa.table({"k": ["a", "b"], "ts": [100, 101], "v": [1, 9]}),
        pa.table({"k": ["b"], "ts": [4], "v": [7]}),      # late for B
        pa.table({"k": ["a", "b"], "ts": [103, 104], "v": [3, 8]}),
    ])
    job = StreamingRolling(str(tmp_path / "out"), col="v",
                           aggs={"s": "sum", "n": "count"},
                           range_preceding=10, range_following=5,
                           keys=["k"], ts_col="ts", num_partitions=2)
    ck = job.run(files, epoch_size=1)
    assert ck["metrics"]["late_dropped"] == 1
    corrected = backfill_keys(
        job, files,
        lambda ds: rolling_agg(ds, "k", "ts", "v",
                               aggs={"s": "sum", "n": "count"},
                               range_preceding=10, range_following=5))
    got = canon(to_pandas(corrected))
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    want = canon(duckdb.sql("""
        SELECT k, ts, CAST(SUM(v) OVER w AS BIGINT) AS s,
               COUNT(v) OVER w AS n
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ts
          RANGE BETWEEN 10 PRECEDING AND 5 FOLLOWING)""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_backfill_keys_requires_finalized(ray_session, tmp_path):
    import pytest
    from saber_ray.streaming_keyed import backfill_keys
    files = _files(tmp_path, [
        pa.table({"k": ["a"], "ts": [100], "v": [1]}),
        pa.table({"k": ["a"], "ts": [5], "v": [2]}),
    ])
    job = StreamingShift(str(tmp_path / "out"),
                         specs={"p": ("v", 1)}, keys=["k"],
                         ts_col="ts", num_partitions=1)
    job.run(files, epoch_size=1, end_of_stream=False)
    with pytest.raises(ValueError, match="finalized"):
        backfill_keys(job, files, lambda ds: ds)


def test_backfill_keys_empty_emitted_cep(ray_session, tmp_path):
    """Regression (found by review): a finalized CEP run with ZERO matches
    but dead-lettered rows must still backfill (the recompute IS the
    output), not crash on the zero-column emitted table."""
    from saber_ray.core.expressions import col
    from saber_ray.stages.cep import match_pattern
    from saber_ray.streaming_cep import StreamingMatchPattern
    from saber_ray.streaming_keyed import backfill_keys

    files = _files(tmp_path, [
        pa.table({"k": ["a"], "role": ["user"], "ts": [100]}),
        # late: would have completed a user->assistant match for key a
        pa.table({"k": ["a"], "role": ["assistant"], "ts": [5]}),
    ])
    job = StreamingMatchPattern(
        str(tmp_path / "out"),
        pattern=[col("role") == "user", col("role") == "assistant"],
        keys=["k"], ts_col="ts", columns=["role"], num_partitions=1)
    ck = job.run(files, epoch_size=1)
    assert ck["metrics"]["late_dropped"] == 1
    assert job.results().num_rows == 0            # no matches emitted
    corrected = backfill_keys(
        job, files,
        lambda ds: match_pattern(
            ds, [col("role") == "user", col("role") == "assistant"],
            keys="k", order_by=["ts"], ts_col="ts"))
    got = to_pandas(corrected)
    # full history for key a, ts-ordered: assistant@5 then user@100 —
    # no user->assistant adjacency, so the corrected output is ALSO empty
    assert len(got) == 0
    # and a variant where the late row DOES create the match
    v2 = tmp_path / "v2"
    v2.mkdir()
    files2 = _files(v2, [
        pa.table({"k": ["a"], "role": ["assistant"], "ts": [100]}),
        pa.table({"k": ["a"], "role": ["user"], "ts": [5]}),   # late
    ])
    job2 = StreamingMatchPattern(
        str(tmp_path / "out2"),
        pattern=[col("role") == "user", col("role") == "assistant"],
        keys=["k"], ts_col="ts", columns=["role"], num_partitions=1)
    job2.run(files2, epoch_size=1)
    assert job2.results().num_rows == 0
    corrected2 = backfill_keys(
        job2, files2,
        lambda ds: match_pattern(
            ds, [col("role") == "user", col("role") == "assistant"],
            keys="k", order_by=["ts"], ts_col="ts"))
    got2 = to_pandas(corrected2)
    assert len(got2) == 1
    assert got2.iloc[0]["match_start_us"] == 5
    assert got2.iloc[0]["match_end_us"] == 100
