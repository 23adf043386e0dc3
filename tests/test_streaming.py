"""Streaming mode: micro-batch epochs + pane-store actors + watermark.

The invariants asserted here are the north rule's streaming requirements:
(1) streaming output == batch engine output for the same input + watermark,
(2) kill + resume from checkpoint emits exactly the same rows (exactly-once),
(3) windows are emitted incrementally as the watermark passes them,
(4) late rows beyond allowed_lateness are dropped AND counted.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray import Window, cnt, sum_, windowed_aggregate
from saber_ray.core.windows import DAY, HOUR
from saber_ray.sources.transcripts import _gen_chunk
from saber_ray.streaming import StreamingWindowedAggregate
from tests.oracle_util import canon, to_pandas

W = Window.sliding(2 * DAY, 12 * HOUR)
AGGS = [sum_("text_len", "sum_len"), cnt(alias="n_turns")]


@pytest.fixture(scope="module")
def stream_files(tmp_path_factory):
    """A time-ordered stream: deterministic transcripts sorted by ts, split
    into 12 sequential files (arrival order == event order, the reference's
    stream assumption — SURVEY.md §1.2)."""
    root = tmp_path_factory.mktemp("stream")
    t = _gen_chunk(0, 2000, 12, seed=7)
    t = t.append_column(
        "text_len",
        pa.compute.cast(pa.compute.utf8_length(t["text"]), pa.int64()))
    t = t.select(["conv_id", "role", "ts", "text_len"])
    t = t.sort_by("ts")
    files = []
    n = t.num_rows
    for i in range(12):
        part = t.slice(i * n // 12, (i + 1) * n // 12 - i * n // 12)
        p = str(root / f"f{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _batch_result(ray_session, files, keys):
    import ray.data as rd
    out = windowed_aggregate(rd.read_parquet(files), window=W, aggs=AGGS,
                             keys=keys)
    return canon(to_pandas(out))


def _stream_df(job):
    return canon(job.results().to_pandas())


def test_streaming_matches_batch_grouped(ray_session, stream_files, tmp_path):
    job = StreamingWindowedAggregate(
        str(tmp_path / "out"), window=W, aggs=AGGS, keys=["role"],
        num_partitions=3)
    ck = job.run(stream_files, epoch_size=3)
    assert ck["finalized"]
    got = _stream_df(job)
    want = _batch_result(ray_session, stream_files, ["role"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert ck["metrics"]["emitted_rows"] == len(got)
    assert ck["metrics"]["late_dropped"] == 0


def test_streaming_matches_batch_global(ray_session, stream_files, tmp_path):
    job = StreamingWindowedAggregate(
        str(tmp_path / "out"), window=W, aggs=AGGS, keys=[], num_partitions=2)
    job.run(stream_files, epoch_size=4)
    got = _stream_df(job)
    want = _batch_result(ray_session, stream_files, [])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_emits_incrementally(ray_session, stream_files, tmp_path):
    """Windows close and emit BEFORE end of stream (watermark-driven)."""
    out = str(tmp_path / "out")
    job = StreamingWindowedAggregate(out, window=W, aggs=AGGS, keys=["role"],
                                     num_partitions=2)
    job.run(stream_files, epoch_size=3, end_of_stream=False)
    mid = job.results()
    assert mid.num_rows > 0          # some windows closed mid-stream
    ck = job._load_ckpt()
    assert not ck.get("finalized")
    # every emitted window is genuinely closed at the checkpointed watermark
    ends = mid["window_id"].to_numpy(zero_copy_only=False) * W.slide + W.size
    assert (ends <= ck["watermark"]).all()


def test_kill_resume_exactly_once(ray_session, stream_files, tmp_path):
    """Stop after 2 epochs, resume with a NEW job instance: the union of
    emitted rows equals the single-run output — no dupes, no gaps."""
    out = str(tmp_path / "out")
    job1 = StreamingWindowedAggregate(out, window=W, aggs=AGGS, keys=["role"],
                                      num_partitions=3)
    ck1 = job1.run(stream_files, epoch_size=2, max_epochs=2)
    assert not ck1.get("finalized") and ck1["offset"] == 4
    job2 = StreamingWindowedAggregate(out, window=W, aggs=AGGS, keys=["role"],
                                      num_partitions=3)
    ck2 = job2.run(stream_files, epoch_size=2)
    assert ck2["finalized"]
    got = _stream_df(job2)
    want = _batch_result(ray_session, stream_files, ["role"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # re-running a finalized job is a no-op (idempotent)
    ck3 = StreamingWindowedAggregate(out, window=W, aggs=AGGS, keys=["role"],
                                     num_partitions=3).run(stream_files,
                                                           epoch_size=2)
    assert ck3["metrics"]["emitted_rows"] == ck2["metrics"]["emitted_rows"]
    pd.testing.assert_frame_equal(_stream_df(job2), got, check_dtype=False)


def test_late_rows_dropped_and_counted(ray_session, stream_files, tmp_path):
    """An out-of-order file far behind the watermark: late rows are dropped
    under lateness=0 and surface in metrics (no silent loss)."""
    t0 = pq.read_table(stream_files[0])
    late_file = str(tmp_path / "late.parquet")
    pq.write_table(t0, late_file)
    files = list(stream_files) + [late_file]   # oldest data arrives last
    job = StreamingWindowedAggregate(
        str(tmp_path / "out"), window=W, aggs=AGGS, keys=["role"],
        num_partitions=2, allowed_lateness=0)
    ck = job.run(files, epoch_size=3)
    assert ck["metrics"]["late_dropped"] == t0.num_rows
    # ...and land in the dead-letter sink with lineage, not just a counter
    dead = job.late_results()
    assert dead.num_rows == t0.num_rows
    assert {"__epoch", "__src_file", "__src_rg"} <= set(dead.column_names)
    assert set(dead["__src_file"].to_pylist()) == {late_file}
    got = canon(pa.table({c: dead[c] for c in t0.column_names}).to_pandas())
    pd.testing.assert_frame_equal(got, canon(t0.to_pandas()),
                                  check_dtype=False)


def test_late_dead_letter_exactly_once_across_resume(ray_session, stream_files,
                                                     tmp_path):
    """Kill before the late epoch, resume with a new instance: dead-letter
    rows land exactly once (VERDICT r2 #7)."""
    t0 = pq.read_table(stream_files[0])
    late_file = str(tmp_path / "late.parquet")
    pq.write_table(t0, late_file)
    files = list(stream_files) + [late_file]   # late epoch is the last one
    out = str(tmp_path / "out")
    job1 = StreamingWindowedAggregate(out, window=W, aggs=AGGS, keys=["role"],
                                      num_partitions=2, allowed_lateness=0)
    job1.run(files, epoch_size=3, max_epochs=2)
    assert job1.late_results().num_rows == 0   # late epoch not reached yet
    job2 = StreamingWindowedAggregate(out, window=W, aggs=AGGS, keys=["role"],
                                      num_partitions=2, allowed_lateness=0)
    ck = job2.run(files, epoch_size=3)
    assert ck["finalized"]
    assert ck["metrics"]["late_dropped"] == t0.num_rows
    assert job2.late_results().num_rows == t0.num_rows  # exactly once
    # a re-run of the finalized job adds nothing
    StreamingWindowedAggregate(out, window=W, aggs=AGGS, keys=["role"],
                               num_partitions=2,
                               allowed_lateness=0).run(files, epoch_size=3)
    assert job2.late_results().num_rows == t0.num_rows


def test_allowed_lateness_absorbs_disorder(ray_session, stream_files, tmp_path):
    """With lateness >= the disorder bound, a mildly shuffled stream still
    matches batch exactly (bounded-disorder guarantee)."""
    # swap adjacent files: disorder bounded by ~one file's time span
    files = list(stream_files)
    files[2], files[3] = files[3], files[2]
    files[7], files[8] = files[8], files[7]
    span_us = 40 * DAY                         # generous bound
    job = StreamingWindowedAggregate(
        str(tmp_path / "out"), window=W, aggs=AGGS, keys=["role"],
        num_partitions=2, allowed_lateness=span_us)
    ck = job.run(files, epoch_size=3)
    assert ck["metrics"]["late_dropped"] == 0
    got = _stream_df(job)
    want = _batch_result(ray_session, stream_files, ["role"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_scaled_aggregation(ray_session, tmp_path, sf_dir):
    """scale= must survive the trip into PaneStoreActors (review r2 finding:
    the serialized AggSpec dropped it → 100x-inflated sums)."""
    import os
    import pyarrow.parquet as pq
    from saber_ray import Window, cnt, sum_, avg, windowed_aggregate
    from saber_ray.core.windows import HOUR
    from saber_ray.sources.parquet import read_table
    from saber_ray.streaming import StreamingWindowedAggregate
    from tests.oracle_util import canon, to_pandas
    import pyarrow as pa

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["ts", "value"])
    t = t.set_column(0, "ts", t["ts"].cast(pa.int64()))
    t = t.take(pa.compute.sort_indices(t, sort_keys=[("ts", "ascending")]))
    files = []
    for i in range(6):
        part = t.slice(i * t.num_rows // 6,
                       (i + 1) * t.num_rows // 6 - i * t.num_rows // 6)
        p = str(tmp_path / f"f{i}.parquet")
        pq.write_table(part, p)
        files.append(p)
    aggs = [cnt(alias="n"), sum_("value", "sum_value", scale=2),
            avg("value", "avg_value", scale=2)]
    job = StreamingWindowedAggregate(
        str(tmp_path / "out"), window=Window.tumbling(6 * HOUR),
        aggs=aggs, num_partitions=3)
    job.run(files, epoch_size=2)
    got = canon(to_pandas(job.results()))
    batch = windowed_aggregate(
        read_table(sf_dir, "events", columns=["ts", "value"]),
        window=Window.tumbling(6 * HOUR), aggs=aggs)
    want = canon(to_pandas(batch))
    pd.testing.assert_frame_equal(got, want)


def test_mixed_scaled_unscaled_rejected():
    from saber_ray import avg, sum_
    from saber_ray.core.aggregates import scaled_columns
    with pytest.raises(ValueError, match="mixes scaled"):
        scaled_columns([sum_("v", scale=2), avg("v")])


def test_sub_epoch_monitoring(ray_session, stream_files, tmp_path):
    """Sub-epoch visibility: the per-second ingest series in epoch_stats
    accounts for every input row, and the live monitor callback fires per
    completed ingest task with cumulative counts."""
    events = []
    job = StreamingWindowedAggregate(
        str(tmp_path / "out"), window=W, aggs=AGGS, keys=["role"],
        num_partitions=2, monitor=events.append)
    ck = job.run(stream_files, epoch_size=4)
    stats = ck["metrics"]["epoch_stats"]
    assert stats
    for row in stats:
        assert sum(b["rows_in"] for b in row["sub_epoch"]) == row["rows_in"]
    assert events                                  # live callback fired
    per_epoch = {}
    for e in events:
        per_epoch[e["epoch"]] = e
        assert e["tasks_done"] >= 1
    # the last callback of each epoch saw the full epoch input
    by_epoch_rows = {r["epoch"]: r["rows_in"] for r in stats}
    for ep, last in per_epoch.items():
        assert last["rows_in_cum"] == by_epoch_rows[ep]


def test_streaming_global_row_windows(ray_session, tmp_path):
    """Streaming twin of the batch global stream-position count windows
    (WindowBatch.java:499-643 ROW_BASED semantics): ordinals come from
    checkpointed metadata prefix sums, a count window closes the moment its
    last row arrives (frontier watermark), kill/resume preserves ordinals,
    and nothing is ever late."""
    import ray.data as rd
    rng = np.random.default_rng(5)
    n = 6000
    t = pa.table({"value": np.round(rng.random(n) * 100, 2)})
    files = []
    for i in range(8):
        lo, hi = i * n // 8, (i + 1) * n // 8
        p = str(tmp_path / f"e{i:03d}.parquet")
        pq.write_table(t.slice(lo, hi - lo), p)
        files.append(p)
    w = Window.sliding(1000, 250, mode="row")
    aggs = [cnt(alias="n"), sum_("value", "sum_value", scale=2)]
    want = canon(to_pandas(windowed_aggregate(
        rd.from_arrow(t.append_column(
            "__ord", pa.array(np.arange(n, dtype=np.int64)))),
        window=w, ts_col="__ord", aggs=aggs)))
    out = str(tmp_path / "out")
    kw = dict(window=w, aggs=aggs, ordinal=True, num_partitions=2)
    job = StreamingWindowedAggregate(out, **kw)
    ck1 = job.run(files, epoch_size=3, max_epochs=1)   # kill after epoch 0
    # incremental: windows whose last row arrived in epoch 0 already emitted
    assert ck1["metrics"]["epoch_stats"][0]["rows_out"] > 0
    assert ck1["ord_base"] == 3 * (n // 8)
    job2 = StreamingWindowedAggregate(out, **kw)
    ck = job2.run(files, epoch_size=3)
    got = canon(job2.results().to_pandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert ck["metrics"]["late_dropped"] == 0
    assert ck["metrics"]["emitted_rows"] == len(got)


def test_streaming_tumbling_row_windows(ray_session, tmp_path):
    """Tumbling count windows across epoch boundaries: a window spanning two
    epochs emits once, with all its rows."""
    import ray.data as rd
    n = 1700                          # not a multiple of the window size
    t = pa.table({"value": np.arange(n, dtype=np.int64)})
    files = []
    for i in range(4):
        lo, hi = i * n // 4, (i + 1) * n // 4
        p = str(tmp_path / f"e{i:03d}.parquet")
        pq.write_table(t.slice(lo, hi - lo), p)
        files.append(p)
    w = Window.tumbling(500, mode="row")
    aggs = [cnt(alias="n"), sum_("value", "sum_value")]
    want = canon(to_pandas(windowed_aggregate(
        rd.from_arrow(t.append_column(
            "__ord", pa.array(np.arange(n, dtype=np.int64)))),
        window=w, ts_col="__ord", aggs=aggs)))
    job = StreamingWindowedAggregate(
        str(tmp_path / "out"), window=w, aggs=aggs, ordinal=True,
        num_partitions=2)
    job.run(files, epoch_size=1)
    got = canon(job.results().to_pandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_backfill_corrects_late_windows(ray_session, stream_files, tmp_path):
    """The dead-letter consumer: streaming (which dropped late rows) plus
    a selective backfill of the affected windows equals the batch engine
    over the FULL input — late data is recovered, untouched windows pass
    through byte-identical."""
    from saber_ray.streaming import backfill
    t0 = pq.read_table(stream_files[0])
    late_file = str(tmp_path / "late.parquet")
    pq.write_table(t0, late_file)
    files = list(stream_files) + [late_file]   # oldest data arrives last
    job = StreamingWindowedAggregate(
        str(tmp_path / "out"), window=W, aggs=AGGS, keys=["role"],
        num_partitions=2)
    ck = job.run(files, epoch_size=4)
    assert ck["metrics"]["late_dropped"] == t0.num_rows
    want = _batch_result(ray_session, files, ["role"])
    got_stream = canon(job.results().to_pandas())
    assert not got_stream.equals(want)         # drops really lost windows
    corrected = canon(backfill(job).to_pandas())
    pd.testing.assert_frame_equal(corrected, want, check_dtype=False)


def test_backfill_passthrough_and_guard(ray_session, stream_files, tmp_path):
    """No late rows -> backfill returns the emitted rows unchanged; a
    non-finalized run is rejected (open windows would recompute from a
    partial stream)."""
    from saber_ray.streaming import backfill
    out = str(tmp_path / "out")
    job = StreamingWindowedAggregate(out, window=W, aggs=AGGS, keys=[],
                                     num_partitions=2)
    job.run(stream_files, epoch_size=4)
    got = canon(backfill(job).to_pandas())
    pd.testing.assert_frame_equal(got, canon(job.results().to_pandas()))

    out2 = str(tmp_path / "out2")
    t0 = pq.read_table(stream_files[0])
    late_file = str(tmp_path / "late2.parquet")
    pq.write_table(t0, late_file)
    job2 = StreamingWindowedAggregate(out2, window=W, aggs=AGGS, keys=[],
                                      num_partitions=2)
    job2.run(list(stream_files) + [late_file], epoch_size=4,
             end_of_stream=False)
    with pytest.raises(ValueError):
        backfill(job2)


def test_streaming_variance_matches_batch(ray_session, stream_files,
                                          tmp_path):
    """VAR/STD partials (cnt, sum, sumsq) flow through the streaming
    engine's pane state and the batch path identically."""
    from saber_ray import std_, var_
    vaggs = [cnt(alias="n"), var_("text_len", "v"), std_("text_len", "s")]
    import ray.data as rd
    job = StreamingWindowedAggregate(
        str(tmp_path / "out"), window=W, aggs=vaggs, keys=["role"],
        num_partitions=3)
    job.run(stream_files, epoch_size=3)
    got = canon(job.results().to_pandas())
    want = canon(to_pandas(windowed_aggregate(
        rd.read_parquet(stream_files), window=W, aggs=vaggs,
        keys=["role"])))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_streaming_skew_kurt_matches_batch(ray_session, stream_files,
                                           tmp_path):
    """SKEW/KURT partials (…, sumcube, sumquad) flow through the streaming
    engine's pane state and the batch path identically."""
    from saber_ray import kurt_, skew_
    maggs = [cnt(alias="n"), skew_("text_len", "sk"),
             kurt_("text_len", "ku")]
    import ray.data as rd
    job = StreamingWindowedAggregate(
        str(tmp_path / "out"), window=W, aggs=maggs, keys=["role"],
        num_partitions=3)
    job.run(stream_files, epoch_size=3)
    got = canon(job.results().to_pandas())
    want = canon(to_pandas(windowed_aggregate(
        rd.read_parquet(stream_files), window=W, aggs=maggs,
        keys=["role"])))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_metrics_endpoint_live_and_committed(ray_session, stream_files,
                                             tmp_path):
    """MetricsServer (RESTfulServer.java analogue): serves committed
    checkpoint state (watermark, epoch_stats tail, totals) AND the live
    monitor tick over real localhost HTTP; lifecycle is clean."""
    import json as _json
    import urllib.request

    from saber_ray.monitor import MetricsServer

    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    with MetricsServer(out, keep_epochs=3) as srv:
        # before any run: endpoint answers, no committed state yet
        with urllib.request.urlopen(srv.url, timeout=5) as r:
            pre = _json.loads(r.read())
        assert pre["live"] is None and "watermark" not in pre
        with urllib.request.urlopen(
                srv.url.replace("/metrics", "/health"), timeout=5) as r:
            assert _json.loads(r.read()) == {"ok": True}

        job = StreamingWindowedAggregate(
            out, window=W, aggs=AGGS, keys=["role"], num_partitions=2,
            columns=["role", "text_len", "ts"], monitor=srv)
        ck = job.run(stream_files, epoch_size=2)

        with urllib.request.urlopen(srv.url, timeout=5) as r:
            m = _json.loads(r.read())
    assert m["live"] is not None            # monitor ticks flowed through
    assert m["live"]["rows_in_cum"] > 0
    assert m["watermark"] == ck["watermark"]
    assert m["finalized"] is True
    assert m["emitted_rows"] == ck["metrics"]["emitted_rows"]
    assert len(m["epochs"]) == 3            # keep_epochs tail
    assert m["epochs"][-1]["epoch"] == ck["metrics"]["epoch_stats"][-1]["epoch"]
    assert m["watermark_lag_us"] > 0
    # server is down after stop()
    import urllib.error
    with pytest.raises((urllib.error.URLError, ConnectionError, OSError)):
        urllib.request.urlopen(srv.url, timeout=1)
