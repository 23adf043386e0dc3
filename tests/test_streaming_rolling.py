"""Streaming rolling RANGE aggregates vs the batch kernel and a DuckDB
RANGE window oracle."""

import json
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray.sources.transcripts import _gen_chunk
from saber_ray.streaming_rolling import StreamingRolling
from tests.oracle_util import canon, to_pandas

PRECEDING = 30 * 60 * 1_000_000          # 30 min in us
FOLLOWING = 10 * 60 * 1_000_000          # 10 min
AGGS = {"roll_n": "count", "roll_sum": "sum", "roll_avg": "avg",
        "roll_min": "min", "roll_max": "max"}


@pytest.fixture(scope="module")
def roll_stream(tmp_path_factory):
    root = tmp_path_factory.mktemp("roll_stream")
    t = _gen_chunk(5, 700, 10, seed=37)
    t = t.select(["conv_id", "turn_idx", "ts"]).sort_by("ts")
    files, n = [], t.num_rows
    for i in range(10):
        part = t.slice(i * n // 10, (i + 1) * n // 10 - i * n // 10)
        p = str(root / f"s{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _oracle(files):
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    df = duckdb.sql(f"""
        SELECT conv_id, epoch_us(ts) AS ts,
               COUNT(turn_idx)                 OVER w AS roll_n,
               CAST(SUM(turn_idx) OVER w AS BIGINT)   AS roll_sum,
               AVG(turn_idx)                   OVER w AS roll_avg,
               MIN(turn_idx)                   OVER w AS roll_min,
               MAX(turn_idx)                   OVER w AS roll_max
        FROM t
        WINDOW w AS (PARTITION BY conv_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN {PRECEDING} PRECEDING
                     AND {FOLLOWING} FOLLOWING)
    """).df()
    return canon(df)


def _job(out_dir, **kw):
    kw.setdefault("num_partitions", 3)
    return StreamingRolling(out_dir, col="turn_idx", aggs=AGGS,
                            range_preceding=PRECEDING,
                            range_following=FOLLOWING,
                            keys=["conv_id"], ts_col="ts", **kw)


def _got(job):
    df = to_pandas(job.results())
    return canon(df[["conv_id", "ts"] + list(AGGS)])


def test_streaming_rolling_matches_oracle(ray_session, roll_stream,
                                          tmp_path):
    job = _job(str(tmp_path / "out"))
    ck = job.run(roll_stream, epoch_size=3)
    got = _got(job)
    want = _oracle(roll_stream)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert ck["metrics"]["emitted_rows"] == len(got)
    assert ck["metrics"]["late_dropped"] == 0


def test_streaming_rolling_matches_batch_kernel(ray_session, roll_stream,
                                                tmp_path):
    import ray.data as rd
    from saber_ray.stages.rolling import rolling_agg
    out = rolling_agg(rd.read_parquet(roll_stream), "conv_id", "ts",
                      "turn_idx", aggs=AGGS, range_preceding=PRECEDING,
                      range_following=FOLLOWING)
    df = to_pandas(out)
    if str(df["ts"].dtype).startswith("datetime"):
        df["ts"] = df["ts"].values.view("int64")
    want = canon(df[["conv_id", "ts"] + list(AGGS)])
    job = _job(str(tmp_path / "out"))
    job.run(roll_stream, epoch_size=4)
    pd.testing.assert_frame_equal(_got(job), want, check_dtype=False)


def test_streaming_rolling_time_value(ray_session, roll_stream, tmp_path):
    """Aggregating the event-time column itself (col == ts_col) works —
    the engine remaps it to the internal __t column."""
    job = StreamingRolling(str(tmp_path / "out"), col="ts",
                           aggs={"first_seen": "min"},
                           range_preceding=PRECEDING, keys=["conv_id"],
                           ts_col="ts", num_partitions=2)
    job.run(roll_stream, epoch_size=4)
    got = canon(to_pandas(job.results())[["conv_id", "ts", "first_seen"]])
    t = pa.concat_tables(  # noqa: F841
        [pq.read_table(f) for f in roll_stream])
    want = canon(duckdb.sql(f"""
        SELECT conv_id, epoch_us(ts) AS ts, MIN(epoch_us(ts)) OVER
          (PARTITION BY conv_id ORDER BY epoch_us(ts)
           RANGE BETWEEN {PRECEDING} PRECEDING AND CURRENT ROW)
          AS first_seen FROM t""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_rolling_kill_resume(ray_session, roll_stream, tmp_path):
    """Kill after 2 epochs, resume from checkpoint: the union of emitted
    rows equals the oracle with ZERO duplicates (exactly-once)."""
    out = str(tmp_path / "out")
    j1 = _job(out)
    ck1 = j1.run(roll_stream, epoch_size=2, max_epochs=2)
    assert not ck1.get("finalized")
    j2 = _job(out)
    j2.run(roll_stream, epoch_size=2)
    res = to_pandas(j2.results())
    assert not res[["conv_id", "ts"]].duplicated().any()
    got = canon(res[["conv_id", "ts"] + list(AGGS)])
    want = _oracle(roll_stream)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_rolling_state_is_bounded(ray_session, roll_stream,
                                            tmp_path):
    """Retained state is the (p + f)-wide time band per key plus the
    unsealed frontier — far below the rows ingested so far."""
    out = str(tmp_path / "out")
    job = _job(out, num_partitions=2)
    ck = job.run(roll_stream, epoch_size=2, max_epochs=3,
                 end_of_stream=False)
    snaps = [os.path.join(out, f) for f in os.listdir(out)
             if f.startswith("rlstate-")]
    state_rows = sum(pq.read_table(p).num_rows for p in snaps)
    rows_in = sum(e["rows_in"] for e in ck["metrics"]["epoch_stats"])
    assert rows_in > 0
    assert state_rows < rows_in * 0.6


def test_streaming_rolling_emits_incrementally(ray_session, roll_stream,
                                               tmp_path):
    out = str(tmp_path / "out")
    job = _job(out, num_partitions=2)
    job.run(roll_stream, epoch_size=3, end_of_stream=False)
    mid = job.results()
    assert mid.num_rows > 0
    ck = json.load(open(os.path.join(out, "checkpoint.json")))
    ts = mid["ts"].to_numpy(zero_copy_only=False)
    assert (ts + FOLLOWING < ck["watermark"]).all()


def test_streaming_rolling_validation(tmp_path):
    with pytest.raises(ValueError):
        StreamingRolling(str(tmp_path / "o"), col="v", aggs={})
    with pytest.raises(ValueError):
        StreamingRolling(str(tmp_path / "o"), col="v",
                         aggs={"x": "median"})
    with pytest.raises(ValueError):
        StreamingRolling(str(tmp_path / "o"), col="v", aggs={"x": "sum"},
                         range_preceding=-1)
