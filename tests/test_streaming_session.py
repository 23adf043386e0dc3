"""Streaming session windows vs the batch session_windows oracle."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from saber_ray import avg, cnt, session_windows, sum_
from saber_ray.core.windows import MINUTE
from saber_ray.sources.transcripts import _gen_chunk
from saber_ray.streaming_session import StreamingSessionWindows
from tests.oracle_util import canon, to_pandas

GAP = 30 * MINUTE
AGGS = [cnt(alias="n_turns"), sum_("text_len", "sum_len")]


@pytest.fixture(scope="module")
def session_stream(tmp_path_factory):
    root = tmp_path_factory.mktemp("sess_stream")
    t = _gen_chunk(3, 1500, 12, seed=11)
    t = t.append_column(
        "text_len", pc.cast(pc.utf8_length(t["text"]), pa.int64()))
    t = t.select(["conv_id", "ts", "text_len"]).sort_by("ts")
    files, n = [], t.num_rows
    for i in range(10):
        part = t.slice(i * n // 10, (i + 1) * n // 10 - i * n // 10)
        p = str(root / f"s{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _batch(ray_session, files):
    import ray.data as rd
    out = session_windows(rd.read_parquet(files), gap=GAP, aggs=AGGS,
                          keys=["conv_id"])
    return canon(to_pandas(out))


def test_streaming_sessions_match_batch(ray_session, session_stream, tmp_path):
    job = StreamingSessionWindows(
        str(tmp_path / "out"), gap=GAP, aggs=AGGS, keys=["conv_id"],
        num_partitions=3)
    ck = job.run(session_stream, epoch_size=3)
    got = canon(job.results().to_pandas())
    want = _batch(ray_session, session_stream)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert ck["metrics"]["emitted_rows"] == len(got)
    assert ck["metrics"]["late_dropped"] == 0


def test_streaming_sessions_incremental_close(ray_session, session_stream,
                                              tmp_path):
    """Sessions close mid-stream once the watermark passes last_ts + gap."""
    out = str(tmp_path / "out")
    job = StreamingSessionWindows(out, gap=GAP, aggs=AGGS, keys=["conv_id"],
                                  num_partitions=2)
    job.run(session_stream, epoch_size=3, end_of_stream=False)
    mid = job.results()
    assert mid.num_rows > 0
    import json, os
    ck = json.load(open(os.path.join(out, "checkpoint.json")))
    ends = mid["session_end_us"].to_numpy(zero_copy_only=False)
    assert (ends + GAP < ck["watermark"]).all()


def test_streaming_sessions_kill_resume(ray_session, session_stream, tmp_path):
    out = str(tmp_path / "out")
    kw = dict(gap=GAP, aggs=AGGS, keys=["conv_id"], num_partitions=3)
    j1 = StreamingSessionWindows(out, **kw)
    ck1 = j1.run(session_stream, epoch_size=2, max_epochs=2)
    assert not ck1.get("finalized")
    j2 = StreamingSessionWindows(out, **kw)
    j2.run(session_stream, epoch_size=2)
    got = canon(j2.results().to_pandas())
    want = _batch(ray_session, session_stream)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_segmented_running_max_matches_naive():
    """Vectorized segmented cummax (incl. the overflow fallback path) must
    equal a per-segment numpy accumulate."""
    import numpy as np
    from saber_ray.streaming_session import _segmented_running_max
    rng = np.random.default_rng(3)
    n = 5000
    vals = rng.integers(-10**6, 10**6, n)
    new_seg = rng.random(n) < 0.01
    new_seg[0] = True
    want = vals.copy()
    starts = np.flatnonzero(new_seg)
    ends = np.append(starts[1:], n)
    for s, e in zip(starts, ends):
        np.maximum.accumulate(vals[s:e], out=want[s:e])
    got = _segmented_running_max(vals, new_seg)
    assert (got == want).all()
    # overflow fallback: huge value span forces the per-segment path
    vals2 = vals.astype(np.int64) * (2**40)
    want2 = vals2.copy()
    for s, e in zip(starts, ends):
        np.maximum.accumulate(vals2[s:e], out=want2[s:e])
    got2 = _segmented_running_max(vals2, new_seg)
    assert (got2 == want2).all()


def test_session_state_float_keys_no_crash():
    """Fractional float session keys must not abort the actor (regression:
    safe int64 cast raised ArrowInvalid on 1.5)."""
    import pyarrow as pa
    from saber_ray.streaming_session import _key_codes, _SessionState
    t = pa.table({"k": pa.array([1.5, 1.5, 2.25, None, None], pa.float64())})
    codes = _key_codes(t, ["k"])[0]
    assert codes[0] == codes[1] and codes[2] != codes[0]
    assert codes[3] == codes[4]                     # one NULL group
    st = _SessionState(["k"], gap=10, aggs=[
        {"op": "cnt", "column": None, "alias": "n"}])
    rows = pa.table({"k": pa.array([1.5, 1.5, 2.25], pa.float64()),
                     "__t": pa.array([0, 5, 3], pa.int64())})
    st.ingest(0, "x", rows)
    out = st.process(watermark=1000)
    got = {(r["k"], r["n"]) for r in out.to_pylist()}
    assert got == {(1.5, 2), (2.25, 1)}


def test_session_late_dead_letter_and_sub_epoch(ray_session, session_stream,
                                                tmp_path):
    """Engine parity with the aggregate engine: watermark-dropped rows land
    in the dead-letter sink with lineage, epoch_stats rows carry the
    per-second sub_epoch ingest series, and the live monitor callback
    fires per completed ingest task."""
    t0 = pq.read_table(session_stream[0])
    late_file = str(tmp_path / "late.parquet")
    pq.write_table(t0, late_file)
    files = list(session_stream) + [late_file]   # oldest data arrives last
    events = []
    job = StreamingSessionWindows(
        str(tmp_path / "out"), gap=GAP, aggs=AGGS, keys=["conv_id"],
        num_partitions=2, monitor=events.append)
    ck = job.run(files, epoch_size=3)
    assert ck["metrics"]["late_dropped"] == t0.num_rows
    dead = job.late_results()
    assert dead.num_rows == t0.num_rows
    assert {"__epoch", "__src_file", "__src_rg"} <= set(dead.column_names)
    assert set(dead["__src_file"].to_pylist()) == {late_file}
    stats = ck["metrics"]["epoch_stats"]
    assert stats
    for row in stats:
        assert sum(b["rows_in"] for b in row["sub_epoch"]) == row["rows_in"]
    assert events and all(e["tasks_done"] >= 1 for e in events)
