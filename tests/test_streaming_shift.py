"""Streaming LAG/LEAD vs the batch kernel and a DuckDB window oracle."""

import json
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray.sources.transcripts import _gen_chunk
from saber_ray.streaming_shift import StreamingShift
from tests.oracle_util import canon, to_pandas

SPECS = {"prev_turn": ("turn_idx", 1), "prev2_ts": ("ts", 2),
         "next_role": ("role", -1)}


@pytest.fixture(scope="module")
def shift_stream(tmp_path_factory):
    root = tmp_path_factory.mktemp("shift_stream")
    t = _gen_chunk(5, 700, 10, seed=31)
    t = t.select(["conv_id", "turn_idx", "role", "ts"]).sort_by("ts")
    files, n = [], t.num_rows
    for i in range(10):
        part = t.slice(i * n // 10, (i + 1) * n // 10 - i * n // 10)
        p = str(root / f"s{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _oracle(files):
    """DuckDB LAG/LEAD window functions over the whole stream."""
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    df = duckdb.sql("""
        SELECT conv_id, epoch_us(ts) AS ts, turn_idx,
               LAG(turn_idx, 1)           OVER w AS prev_turn,
               epoch_us(LAG(ts, 2) OVER w)       AS prev2_ts,
               LEAD(role, 1)              OVER w AS next_role
        FROM t
        WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
    """).df()
    return canon(df)


def _job(out_dir, **kw):
    kw.setdefault("num_partitions", 3)
    return StreamingShift(out_dir, specs=SPECS, keys=["conv_id"],
                          ts_col="ts", tiebreak=["turn_idx"], **kw)


def _got(job):
    df = to_pandas(job.results())
    return canon(df[["conv_id", "ts", "turn_idx", "prev_turn",
                     "prev2_ts", "next_role"]])


def test_streaming_shift_matches_oracle(ray_session, shift_stream, tmp_path):
    job = _job(str(tmp_path / "out"))
    ck = job.run(shift_stream, epoch_size=3)
    got = _got(job)
    want = _oracle(shift_stream)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert ck["metrics"]["emitted_rows"] == len(got)
    assert ck["metrics"]["late_dropped"] == 0


def test_streaming_shift_matches_batch_kernel(ray_session, shift_stream,
                                              tmp_path):
    """The streaming result also equals the BATCH shift operator over the
    concatenated stream (same engine, two execution models)."""
    import ray.data as rd
    from saber_ray.stages.shift import shift
    out = shift(rd.read_parquet(shift_stream), "conv_id",
                ["ts", "turn_idx"], SPECS)
    df = to_pandas(out)
    for c in ("ts", "prev2_ts"):        # batch keeps timestamp[us] dtype;
        if str(df[c].dtype).startswith("datetime"):
            # streaming emits epoch-us int64; NaT -> NaN (not min-int)
            df[c] = pd.Series(df[c].values.view("int64"),
                              index=df.index).where(df[c].notna())
    want = canon(df[["conv_id", "ts", "turn_idx", "prev_turn",
                     "prev2_ts", "next_role"]])
    job = _job(str(tmp_path / "out"))
    job.run(shift_stream, epoch_size=4)
    pd.testing.assert_frame_equal(_got(job), want, check_dtype=False)


def test_streaming_shift_emits_incrementally(ray_session, shift_stream,
                                             tmp_path):
    """Rows emit AS the watermark passes them (not at end-of-stream), and
    every mid-stream row is sealed (ts < watermark)."""
    out = str(tmp_path / "out")
    job = _job(out, num_partitions=2)
    job.run(shift_stream, epoch_size=3, end_of_stream=False)
    mid = job.results()
    assert mid.num_rows > 0
    ck = json.load(open(os.path.join(out, "checkpoint.json")))
    ts = mid["ts"].to_numpy(zero_copy_only=False)
    assert (ts < ck["watermark"]).all()


def test_streaming_shift_kill_resume(ray_session, shift_stream, tmp_path):
    """Kill after 2 epochs, resume from checkpoint: the union of emitted
    rows equals the oracle with ZERO duplicates (exactly-once)."""
    out = str(tmp_path / "out")
    j1 = _job(out)
    ck1 = j1.run(shift_stream, epoch_size=2, max_epochs=2)
    assert not ck1.get("finalized")
    j2 = _job(out)
    j2.run(shift_stream, epoch_size=2)
    res = to_pandas(j2.results())
    assert not res[["conv_id", "ts", "turn_idx"]].duplicated().any()
    got = canon(res[["conv_id", "ts", "turn_idx", "prev_turn",
                     "prev2_ts", "next_role"]])
    want = _oracle(shift_stream)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_shift_state_is_bounded(ray_session, shift_stream,
                                          tmp_path):
    """Retained state is max_back context + max_fwd sealed tail per key
    plus the unsealed frontier — far below the rows ingested so far."""
    out = str(tmp_path / "out")
    job = _job(out, num_partitions=2)
    ck = job.run(shift_stream, epoch_size=2, max_epochs=3,
                 end_of_stream=False)
    snaps = [os.path.join(out, f) for f in os.listdir(out)
             if f.startswith("shstate-")]
    state_rows = sum(pq.read_table(p).num_rows for p in snaps)
    rows_in = sum(e["rows_in"] for e in ck["metrics"]["epoch_stats"])
    assert rows_in > 0
    assert state_rows < rows_in * 0.6


def test_streaming_shift_validation(tmp_path):
    with pytest.raises(ValueError):
        StreamingShift(str(tmp_path / "o"), specs={})
    with pytest.raises(ValueError):
        StreamingShift(str(tmp_path / "o"), specs={"x": ("ts", 0)})


def test_streaming_shift_lag_only_context_survives(ray_session, tmp_path):
    """Regression (found by review): a LAG-only spec lets a key run become
    FULLY final mid-stream; retention must keep that run's own last
    max_back rows as context — not rows at the end of the sorted buffer —
    so a later row of the same key still sees its true LAG source."""
    import pyarrow as pa

    f1 = str(tmp_path / "f1.parquet")
    f2 = str(tmp_path / "f2.parquet")
    # epoch 1: run A sealed entirely (watermark -> 5 via key B), run B after
    pq.write_table(pa.table({
        "k": ["A", "A", "B"], "ts": [1, 2, 5], "v": [10, 20, 99]}), f1)
    # epoch 2: A returns — its LAG source is v=20 from the sealed run
    pq.write_table(pa.table({
        "k": ["A", "B"], "ts": [1000, 1001], "v": [30, 98]}), f2)
    job = StreamingShift(str(tmp_path / "out"),
                         specs={"prev_v": ("v", 1)}, keys=["k"],
                         ts_col="ts", num_partitions=1)
    job.run([f1, f2], epoch_size=1)
    df = to_pandas(job.results()).set_index(["k", "ts"]).sort_index()
    assert df.loc[("A", 1000), "prev_v"] == 20
    assert pd.isna(df.loc[("A", 1), "prev_v"])   # true run start
    assert df.loc[("B", 1001), "prev_v"] == 99


def test_streaming_sft_pairs_matches_batch(ray_session, tmp_path):
    """pipelines/sft.streaming_sft_pairs over the epoch stream equals the
    batch composition over the concatenated input (ts order == turn_idx
    order in the generated transcripts), including the gap/length gates."""
    import ray.data as rd

    from saber_ray.pipelines.sft import sft_pairs, streaming_sft_pairs

    t = _gen_chunk(5, 600, 10, seed=47) \
        .select(["conv_id", "turn_idx", "role", "text", "ts"]).sort_by("ts")
    files, n = [], t.num_rows
    for i in range(8):
        part = t.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
        p = str(tmp_path / f"s{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)

    kw = dict(max_gap_us=3_600_000_000, min_prompt_chars=5,
              min_response_chars=5)
    got = canon(to_pandas(streaming_sft_pairs(
        str(tmp_path / "out"), files, epoch_size=2, num_partitions=3, **kw)))
    want = canon(to_pandas(sft_pairs(rd.from_arrow(t), **kw)))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)
