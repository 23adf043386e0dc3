"""Streaming stateful join vs the batch windowed_join oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray.core.windows import HOUR
from saber_ray.stages.join import windowed_join
from saber_ray.streaming_join import StreamingWindowedJoin
from tests.oracle_util import canon, to_pandas

BAND = 6 * HOUR


def _make_side(root, tag, seed, n_files=8, n=4000):
    rng = np.random.default_rng(seed)
    t = pa.table({
        "user_id": rng.integers(0, 120, n),
        "ts": np.sort(rng.integers(0, 10 * 24 * HOUR, n)).astype("int64"),
        "event_id": np.arange(n, dtype=np.int64) + seed * 1_000_000,
        "value": np.round(rng.random(n) * 100, 3),
    })
    files = []
    for i in range(n_files):
        part = t.slice(i * n // n_files, (i + 1) * n // n_files - i * n // n_files)
        p = str(root / f"{tag}-{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


@pytest.fixture(scope="module")
def join_streams(tmp_path_factory):
    root = tmp_path_factory.mktemp("jstream")
    return _make_side(root, "L", 1), _make_side(root, "R", 2)


def _batch(ray_session, lf, rf):
    import ray.data as rd
    out = windowed_join(
        rd.read_parquet(lf), rd.read_parquet(rf), on="user_id",
        before=BAND, after=BAND,
        left_cols=["user_id", "ts", "event_id", "value"],
        right_cols=["user_id", "ts", "event_id", "value"])
    return canon(to_pandas(out.select_columns(
        ["user_id", "ts_l", "ts_r", "event_id_l", "event_id_r",
         "value_l", "value_r"])))


def _stream_df(job):
    df = job.results().to_pandas()
    return canon(df[["user_id", "ts_l", "ts_r", "event_id_l", "event_id_r",
                     "value_l", "value_r"]])


def test_streaming_join_matches_batch(ray_session, join_streams, tmp_path):
    lf, rf = join_streams
    job = StreamingWindowedJoin(
        str(tmp_path / "out"), on="user_id", before=BAND, after=BAND,
        left_cols=["user_id", "ts", "event_id", "value"],
        right_cols=["user_id", "ts", "event_id", "value"],
        num_partitions=3)
    ck = job.run(lf, rf, epoch_size=2)
    assert ck["metrics"]["late_dropped"] == 0
    got = _stream_df(job)
    want = _batch(ray_session, lf, rf)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert ck["metrics"]["emitted_rows"] == len(got)


def test_streaming_join_state_bounded(ray_session, join_streams, tmp_path):
    """Watermark eviction keeps join state to the open band, not the whole
    stream (the JoinTaskDispatcher free-pointer rule)."""
    import ray as _ray
    from saber_ray.streaming_join import JoinStateActor
    lf, rf = join_streams
    job = StreamingWindowedJoin(
        str(tmp_path / "out"), on="user_id", before=BAND, after=BAND,
        left_cols=["user_id", "ts", "event_id", "value"],
        right_cols=["user_id", "ts", "event_id", "value"],
        num_partitions=1)
    job.run(lf, rf, epoch_size=2)
    # state snapshot from the final epoch holds only rows within the band of
    # the final watermark
    import json, os
    ck = json.load(open(os.path.join(str(tmp_path / "out"), "checkpoint.json")))
    snaps = [f for f in os.listdir(str(tmp_path / "out"))
             if f.startswith("jstate-")]
    assert snaps
    st = pq.read_table(os.path.join(str(tmp_path / "out"), snaps[0]))
    assert (st["__ts"].to_numpy(zero_copy_only=False) + BAND
            >= ck["watermark"]).all()
    total_rows = sum(pq.read_metadata(f).num_rows for f in lf + rf)
    assert st.num_rows < total_rows        # strictly bounded


def test_streaming_join_kill_resume(ray_session, join_streams, tmp_path):
    lf, rf = join_streams
    out = str(tmp_path / "out")
    kw = dict(on="user_id", before=BAND, after=BAND,
              left_cols=["user_id", "ts", "event_id", "value"],
              right_cols=["user_id", "ts", "event_id", "value"],
              num_partitions=3)
    j1 = StreamingWindowedJoin(out, **kw)
    ck1 = j1.run(lf, rf, epoch_size=2, max_epochs=2)
    assert ck1["offset_l"] == 4
    j2 = StreamingWindowedJoin(out, **kw)
    j2.run(lf, rf, epoch_size=2)
    got = _stream_df(j2)
    want = _batch(ray_session, lf, rf)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lagging_stream_watermark(ray_session, tmp_path):
    """An epoch where one live stream delivers NO rows must not let the
    watermark race ahead and drop that stream's later-arriving (but
    still-valid) rows as late (ADVICE r1: truthiness `if m` excluded empty
    chunks AND ts-0 epochs from the min-over-inputs rule)."""
    import ray.data as rd

    # left epoch 0 carries high timestamps; right's first file is EMPTY and
    # its real rows (low ts, inside the band of nothing — but valid) arrive
    # in epoch 1. With the buggy watermark they'd be dropped as late.
    left = pa.table({"user_id": np.array([1, 2], dtype=np.int64),
                     "ts": np.array([100 * HOUR, 101 * HOUR], dtype=np.int64),
                     "event_id": np.array([10, 11], dtype=np.int64)})
    right_empty = left.slice(0, 0)
    right_late = pa.table({"user_id": np.array([1, 2], dtype=np.int64),
                           "ts": np.array([99 * HOUR, 102 * HOUR],
                                          dtype=np.int64),
                           "event_id": np.array([20, 21], dtype=np.int64)})
    lf = [str(tmp_path / "L0.parquet")]
    pq.write_table(left, lf[0])
    rf = [str(tmp_path / "R0.parquet"), str(tmp_path / "R1.parquet")]
    pq.write_table(right_empty, rf[0])
    pq.write_table(right_late, rf[1])

    job = StreamingWindowedJoin(
        str(tmp_path / "out"), on="user_id", before=BAND, after=BAND,
        left_cols=["user_id", "ts", "event_id"],
        right_cols=["user_id", "ts", "event_id"], num_partitions=2)
    job.run(lf, rf, epoch_size=1)
    got = canon(to_pandas(job.results()))

    want = canon(to_pandas(windowed_join(
        rd.read_parquet(lf), rd.read_parquet(rf), on="user_id",
        before=BAND, after=BAND,
        left_cols=["user_id", "ts", "event_id"],
        right_cols=["user_id", "ts", "event_id"])))
    assert len(want) == 2                       # both pairs inside the band
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_appended_stream_not_dropped_without_eos(ray_session, tmp_path):
    """ADVICE r2 #3: with ``end_of_stream=False`` an exhausted side must NOT
    leave the watermark min — files appended to the lagging stream between
    invocations still join instead of being dropped as late."""
    import ray.data as rd
    left = pa.table({"user_id": np.array([1], dtype=np.int64),
                     "ts": np.array([100 * HOUR], dtype=np.int64),
                     "event_id": np.array([10], dtype=np.int64)})
    right_late = pa.table({"user_id": np.array([1], dtype=np.int64),
                           "ts": np.array([99 * HOUR], dtype=np.int64),
                           "event_id": np.array([20], dtype=np.int64)})
    lf = [str(tmp_path / "L0.parquet")]
    pq.write_table(left, lf[0])
    rf = [str(tmp_path / "R0.parquet")]
    pq.write_table(right_late, rf[0])
    kw = dict(on="user_id", before=BAND, after=BAND,
              left_cols=["user_id", "ts", "event_id"],
              right_cols=["user_id", "ts", "event_id"], num_partitions=2)
    out = str(tmp_path / "out")
    # run 1: only the left file exists; right is a live stream that lags
    job = StreamingWindowedJoin(out, **kw)
    job.run(lf, [], epoch_size=1, end_of_stream=False)
    # run 2: the right stream's file arrives — must still pair
    job2 = StreamingWindowedJoin(out, **kw)
    ck = job2.run(lf, rf, epoch_size=1, end_of_stream=False)
    assert ck["metrics"]["late_dropped"] == 0
    assert ck["metrics"]["emitted_rows"] == 1
    got = job2.results()
    assert got.num_rows == 1
    # contrast: the default end_of_stream=True jumps the watermark to
    # max(hwm) once the right list is exhausted, so the same late file
    # WOULD be dropped on resume (the documented finite-input semantics)
    out3 = str(tmp_path / "out3")
    j3 = StreamingWindowedJoin(out3, **kw)
    j3.run(lf, [], epoch_size=1)                    # end_of_stream defaults True
    j4 = StreamingWindowedJoin(out3, **kw)
    ck4 = j4.run(lf, rf, epoch_size=1)
    assert ck4["metrics"]["late_dropped"] == 1


def test_join_actor_vectorized_micro_bench(ray_session):
    """The Arrow-state actor kernel must beat a per-key pandas loop ≥5x on a
    high-cardinality (10k keys) partition (VERDICT r2 #1 done-criterion),
    and the actor path must not convert state to pandas."""
    import time
    import pandas as pd
    from saber_ray.streaming_join import _JoinState

    rng = np.random.default_rng(7)
    n, nkeys = 60_000, 10_000
    def mk(seed):
        r = np.random.default_rng(seed)
        return pa.table({
            "user_id": r.integers(0, nkeys, n),
            "__ts": np.sort(r.integers(0, 10 * 24 * HOUR, n)).astype("int64"),
            "event_id": np.arange(n, dtype=np.int64) + seed * 10_000_000,
        })
    L, R = mk(1), mk(2)
    lmap = {"event_id": "event_id_l"}
    rmap = {"event_id": "event_id_r"}
    st = _JoinState(["user_id"], HOUR, HOUR, ["event_id"], ["event_id"],
                    lmap, rmap)
    t0 = time.monotonic()
    out = st.process(L, R, None)
    fast = time.monotonic() - t0
    assert out.num_rows > 0

    # naive reference: per-key python loop with O(R) masks (the r2 impl)
    ldf, rdf = L.to_pandas(), R.to_pandas()
    t0 = time.monotonic()
    n_pairs = 0
    for key, lg in ldf.groupby("user_id", sort=False):
        mask = rdf["user_id"].to_numpy() == key
        rg = rdf[mask]
        if not len(rg):
            continue
        tR = np.sort(rg["__ts"].to_numpy())
        lo = np.searchsorted(tR, lg["__ts"].to_numpy() - HOUR, side="left")
        hi = np.searchsorted(tR, lg["__ts"].to_numpy() + HOUR, side="right")
        n_pairs += int((hi - lo).sum())
    slow = time.monotonic() - t0
    assert n_pairs == out.num_rows
    assert slow / fast >= 5, f"actor kernel only {slow/fast:.1f}x faster"


def test_streaming_keyless_theta_matches_batch(ray_session, tmp_path, join_streams):
    """Streaming pure-theta (on=None, band-cell partitioning) equals the
    batch windowed_join(on=None) on the same input."""
    import ray.data as rd
    lf, rf = join_streams
    pred = lambda df: df["value_l"].to_numpy() > df["value_r"].to_numpy()
    want = canon(to_pandas(windowed_join(
        rd.read_parquet(lf), rd.read_parquet(rf), on=None,
        before=HOUR, after=HOUR,
        left_cols=["event_id", "value"], right_cols=["event_id", "value"],
        predicate=pred)))
    job = StreamingWindowedJoin(
        str(tmp_path / "out"), on=None, before=HOUR, after=HOUR,
        left_cols=["ts", "event_id", "value"],
        right_cols=["ts", "event_id", "value"],
        num_partitions=3, predicate=pred)
    job.run(lf, rf, epoch_size=3)
    got = canon(to_pandas(job.results())[want.columns.tolist()])
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_join_late_dead_letter_and_sub_epoch(ray_session, tmp_path):
    """Engine parity with the aggregate engine: watermark-dropped rows land
    in the dead-letter sink with lineage (+ __side saying which stream),
    epoch_stats rows carry the per-second sub_epoch ingest series, and the
    live monitor callback fires per completed ingest task."""
    left = pa.table({"user_id": np.array([1], dtype=np.int64),
                     "ts": np.array([100 * HOUR], dtype=np.int64),
                     "event_id": np.array([10], dtype=np.int64)})
    right_late = pa.table({"user_id": np.array([1], dtype=np.int64),
                           "ts": np.array([99 * HOUR], dtype=np.int64),
                           "event_id": np.array([20], dtype=np.int64)})
    lf = [str(tmp_path / "L0.parquet")]
    pq.write_table(left, lf[0])
    rf = [str(tmp_path / "R0.parquet")]
    pq.write_table(right_late, rf[0])
    events = []
    kw = dict(on="user_id", before=BAND, after=BAND,
              left_cols=["user_id", "ts", "event_id"],
              right_cols=["user_id", "ts", "event_id"], num_partitions=2,
              monitor=events.append)
    out = str(tmp_path / "out")
    j1 = StreamingWindowedJoin(out, **kw)
    j1.run(lf, [], epoch_size=1)     # eos default: watermark jumps to hwm_l
    j2 = StreamingWindowedJoin(out, **kw)
    ck = j2.run(lf, rf, epoch_size=1)
    assert ck["metrics"]["late_dropped"] == 1
    dead = j2.late_results()
    assert dead.num_rows == 1
    assert {"__epoch", "__src_file", "__src_rg", "__side"} \
        <= set(dead.column_names)
    assert dead["__side"].to_pylist() == [1]          # right stream
    assert dead["__src_file"].to_pylist() == [rf[0]]
    assert dead["event_id"].to_pylist() == [20]
    stats = ck["metrics"]["epoch_stats"]
    assert stats
    for row in stats:
        assert sum(b["rows_in"] for b in row["sub_epoch"]) == row["rows_in"]
    assert events and all(e["tasks_done"] >= 1 for e in events)
