"""Streaming CEP (match_pattern) vs the batch kernel and its SQL oracle."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray.core.expressions import col
from saber_ray.core.windows import HOUR
from saber_ray.sources.transcripts import _gen_chunk
from saber_ray.streaming_cep import StreamingMatchPattern
from tests.oracle_util import canon, to_pandas

PATTERN = [col("role") == "user", col("role") == "assistant",
           col("role") == "user"]
WITHIN = 24 * HOUR


@pytest.fixture(scope="module")
def cep_stream(tmp_path_factory):
    root = tmp_path_factory.mktemp("cep_stream")
    t = _gen_chunk(5, 900, 10, seed=23)
    t = t.select(["conv_id", "turn_idx", "role", "ts"]).sort_by("ts")
    files, n = [], t.num_rows
    for i in range(10):
        part = t.slice(i * n // 10, (i + 1) * n // 10 - i * n // 10)
        p = str(root / f"s{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _batch(ray_session, files):
    """Batch oracle: the stages/cep kernel over the whole stream, ordered
    by event time (tiebreak turn_idx), projected to the streaming schema."""
    import ray.data as rd
    from saber_ray.stages.cep import match_pattern
    out = match_pattern(rd.read_parquet(files), PATTERN, keys="conv_id",
                        order_by=["ts", "turn_idx"], ts_col="ts",
                        within=WITHIN)
    df = to_pandas(out)[["conv_id", "match_start_us", "match_end_us"]]
    return canon(df)


def _job(out_dir, **kw):
    kw.setdefault("num_partitions", 3)
    return StreamingMatchPattern(
        out_dir, pattern=PATTERN, keys=["conv_id"], ts_col="ts",
        within=WITHIN, tiebreak=["turn_idx"], columns=["role"], **kw)


def test_streaming_cep_matches_batch(ray_session, cep_stream, tmp_path):
    job = _job(str(tmp_path / "out"))
    ck = job.run(cep_stream, epoch_size=3)
    got = canon(job.results().to_pandas()
                [["conv_id", "match_start_us", "match_end_us"]])
    want = _batch(ray_session, cep_stream)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert ck["metrics"]["emitted_rows"] == len(got)
    assert ck["metrics"]["late_dropped"] == 0


def test_streaming_cep_emits_incrementally(ray_session, cep_stream, tmp_path):
    """Matches emit AS the watermark passes them, not at end-of-stream, and
    every mid-stream match is fully sealed (end < watermark)."""
    out = str(tmp_path / "out")
    job = _job(out, num_partitions=2)
    job.run(cep_stream, epoch_size=3, end_of_stream=False)
    mid = job.results()
    assert mid.num_rows > 0
    ck = json.load(open(os.path.join(out, "checkpoint.json")))
    ends = mid["match_end_us"].to_numpy(zero_copy_only=False)
    assert (ends < ck["watermark"]).all()


def test_streaming_cep_kill_resume(ray_session, cep_stream, tmp_path):
    """Kill after 2 epochs, resume from checkpoint: the union of emitted
    matches equals the batch result with ZERO duplicates (exactly-once)."""
    out = str(tmp_path / "out")
    j1 = _job(out)
    ck1 = j1.run(cep_stream, epoch_size=2, max_epochs=2)
    assert not ck1.get("finalized")
    j2 = _job(out)
    j2.run(cep_stream, epoch_size=2)
    res = j2.results().to_pandas()
    assert not res.duplicated().any()
    got = canon(res[["conv_id", "match_start_us", "match_end_us"]])
    want = _batch(ray_session, cep_stream)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_cep_state_is_bounded(ray_session, cep_stream, tmp_path):
    """Retained state never exceeds (pattern_len - 1) sealed rows per key
    plus the unsealed frontier — check the snapshot after a mid-stream
    stop stays far below the rows ingested so far."""
    out = str(tmp_path / "out")
    job = _job(out, num_partitions=2)
    ck = job.run(cep_stream, epoch_size=2, max_epochs=3,
                 end_of_stream=False)
    snaps = [os.path.join(out, f) for f in os.listdir(out)
             if f.startswith("cstate-")]
    state_rows = sum(pq.read_table(p).num_rows for p in snaps)
    rows_in = sum(e["rows_in"] for e in ck["metrics"]["epoch_stats"])
    assert rows_in > 0
    # sealed tail is <= 2 rows/key; unsealed frontier is the last epoch's
    # lateness window — in this in-order stream that is far below ingest
    assert state_rows < rows_in * 0.6


# ---------------------------------------------------------------------------
# SKIP PAST LAST ROW (non_overlapping=True) — round-5 streaming upgrade
# ---------------------------------------------------------------------------

def _batch_no(ray_session, files):
    import ray.data as rd
    from saber_ray.stages.cep import match_pattern
    out = match_pattern(rd.read_parquet(files), PATTERN, keys="conv_id",
                        order_by=["ts", "turn_idx"], ts_col="ts",
                        within=WITHIN, non_overlapping=True)
    return canon(to_pandas(out)[["conv_id", "match_start_us",
                                 "match_end_us"]])


def test_streaming_cep_skip_past_last_row_matches_batch(
        ray_session, cep_stream, tmp_path):
    """Sealed-prefix greedy acceptance: streaming non_overlapping equals
    the batch SKIP PAST LAST ROW kernel over the whole stream, and is a
    SUBSET of the overlapping match set."""
    job = _job(str(tmp_path / "out"), non_overlapping=True)
    job.run(cep_stream, epoch_size=3)
    got = canon(job.results().to_pandas()
                [["conv_id", "match_start_us", "match_end_us"]])
    want = _batch_no(ray_session, cep_stream)
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    allm = _batch(ray_session, cep_stream)
    assert len(want) < len(allm)        # greedy actually suppressed overlaps
    merged = got.merge(allm, how="left", indicator=True)
    assert (merged["_merge"] == "both").all()


def test_streaming_cep_skip_past_epoch_size_invariance(
        ray_session, cep_stream, tmp_path):
    """The acceptance cursor must make the result independent of WHERE
    epoch boundaries fall (the cross-epoch carry is the whole point)."""
    base = None
    for i, es in enumerate((1, 2, 5)):
        job = _job(str(tmp_path / f"out{i}"), non_overlapping=True)
        job.run(cep_stream, epoch_size=es)
        got = canon(job.results().to_pandas()
                    [["conv_id", "match_start_us", "match_end_us"]])
        if base is None:
            base = got
        else:
            pd.testing.assert_frame_equal(got, base, check_dtype=False)


def test_streaming_cep_skip_past_kill_resume(ray_session, cep_stream,
                                             tmp_path):
    """Kill mid-stream, resume: the carried __cep_blk cursor survives the
    snapshot — union of emissions equals batch, zero duplicates."""
    out = str(tmp_path / "out")
    j1 = _job(out, non_overlapping=True)
    ck1 = j1.run(cep_stream, epoch_size=2, max_epochs=2)
    assert not ck1.get("finalized")
    j2 = _job(out, non_overlapping=True)
    j2.run(cep_stream, epoch_size=2)
    res = j2.results().to_pandas()
    assert not res.duplicated().any()
    got = canon(res[["conv_id", "match_start_us", "match_end_us"]])
    pd.testing.assert_frame_equal(got, _batch_no(ray_session, cep_stream),
                                  check_dtype=False)
