"""Streaming heavy-hitters view vs exact GROUP BY counts."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray.sources.transcripts import _gen_chunk
from saber_ray.streaming_hh import StreamingHeavyHitters
from tests.oracle_util import canon, to_pandas


@pytest.fixture(scope="module")
def hh_stream(tmp_path_factory):
    root = tmp_path_factory.mktemp("hh_stream")
    t = _gen_chunk(5, 600, 10, seed=41)
    t = t.select(["conv_id", "role", "ts"]).sort_by("ts")
    files, n = [], t.num_rows
    for i in range(8):
        part = t.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
        p = str(root / f"s{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _true_counts(files, col):
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    return duckdb.sql(
        f"SELECT {col} AS value, COUNT(*) AS n FROM t GROUP BY 1").df()


def test_hh_exact_when_capacity_suffices(ray_session, hh_stream, tmp_path):
    """capacity >= per-partition distinct count -> the view is EXACT and
    max_undercount is 0 everywhere."""
    job = StreamingHeavyHitters(str(tmp_path / "out"), col="conv_id",
                                capacity=10_000, num_partitions=3)
    job.run(hh_stream, epoch_size=2)
    got = to_pandas(job.results())
    assert (got["max_undercount"] == 0).all()
    want = _true_counts(hh_stream, "conv_id").rename(
        columns={"n": "est_count"})
    want["max_undercount"] = 0
    pd.testing.assert_frame_equal(
        canon(got), canon(want), check_dtype=False)


def test_hh_bounds_under_compression(ray_session, hh_stream, tmp_path):
    """Tiny capacity: every reported est obeys est <= true <= est +
    max_undercount, and every value whose true count exceeds its
    partition's cut is present."""
    job = StreamingHeavyHitters(str(tmp_path / "out"), col="conv_id",
                                capacity=3, num_partitions=2)
    job.run(hh_stream, epoch_size=2)
    got = to_pandas(job.results())
    assert len(got) > 0
    true = _true_counts(hh_stream, "conv_id").set_index("value")["n"]
    cut = int(got["max_undercount"].max())
    assert cut > 0                      # compression actually happened
    for _, r in got.iterrows():
        tr = int(true[r["value"]])
        assert r["est_count"] <= tr <= r["est_count"] + r["max_undercount"]
    # guaranteed-present: anything with true count > the max cut
    assert set(true[true > cut].index) <= set(got["value"])


def test_hh_view_supersedes_and_resumes(ray_session, hh_stream, tmp_path):
    """The view is a snapshot (results() == latest epoch only), and a
    kill+resume converges to the same final view."""
    out1 = str(tmp_path / "a")
    j1 = StreamingHeavyHitters(out1, col="role", capacity=64,
                               num_partitions=2, k=5)
    j1.run(hh_stream, epoch_size=2, max_epochs=2)
    mid = to_pandas(j1.results())
    j1b = StreamingHeavyHitters(out1, col="role", capacity=64,
                                num_partitions=2, k=5)
    j1b.run(hh_stream, epoch_size=2)          # resume to completion
    fin = to_pandas(j1b.results())
    assert fin["est_count"].sum() > mid["est_count"].sum()
    j2 = StreamingHeavyHitters(str(tmp_path / "b"), col="role",
                               capacity=64, num_partitions=2, k=5)
    j2.run(hh_stream, epoch_size=2)           # single uninterrupted run
    pd.testing.assert_frame_equal(canon(fin),
                                  canon(to_pandas(j2.results())))


def test_hh_matches_batch_operator(ray_session, hh_stream, tmp_path):
    """Same capacity-ample answer as the batch heavy_hitters stage."""
    import ray.data as rd
    from saber_ray.stages.heavy_hitters import heavy_hitters
    batch = to_pandas(heavy_hitters(
        rd.read_parquet(hh_stream), "conv_id", capacity=10_000))
    job = StreamingHeavyHitters(str(tmp_path / "out"), col="conv_id",
                                capacity=10_000, num_partitions=3)
    job.run(hh_stream, epoch_size=3)
    got = to_pandas(job.results()).rename(columns={"value": "conv_id"})
    pd.testing.assert_frame_equal(
        canon(got), canon(batch), check_dtype=False)


def test_hh_validation(tmp_path):
    with pytest.raises(ValueError):
        StreamingHeavyHitters(str(tmp_path / "o"), col="x", capacity=0)


def test_hh_cut_survives_empty_summary_resume(ray_session, tmp_path):
    """Regression (found by review): compression can empty a partition's
    summary while its accumulated cut — the error bound — must survive a
    kill+resume; and results() must report the CURRENT (possibly empty)
    view, never a stale earlier epoch."""
    f1 = str(tmp_path / "f1.parquet")
    f2 = str(tmp_path / "f2.parquet")
    pq.write_table(pa.table({"v": ["x", "y"], "ts": [1, 2]}), f1)
    pq.write_table(pa.table({"v": ["z", "z", "x"], "ts": [3, 4, 5]}), f2)
    out = str(tmp_path / "out")
    j1 = StreamingHeavyHitters(out, col="v", capacity=1, num_partitions=1)
    j1.run([f1, f2], epoch_size=1, max_epochs=1)
    # epoch 0: counts {x:1, y:1}, capacity 1 -> cut=1, summary EMPTY
    mid = to_pandas(j1.results())
    assert len(mid) == 0                    # current view is empty, not stale
    j2 = StreamingHeavyHitters(out, col="v", capacity=1, num_partitions=1)
    j2.run([f1, f2], epoch_size=1)          # resume
    resumed = to_pandas(j2.results())
    j3 = StreamingHeavyHitters(str(tmp_path / "b"), col="v", capacity=1,
                               num_partitions=1)
    j3.run([f1, f2], epoch_size=1)          # uninterrupted
    pd.testing.assert_frame_equal(canon(resumed),
                                  canon(to_pandas(j3.results())))
    # the bound must cover true('x') = 2
    true = {"x": 2, "y": 1, "z": 2}
    for _, r in resumed.iterrows():
        tr = true[r["value"]]
        assert r["est_count"] <= tr <= r["est_count"] + r["max_undercount"]


def test_hh_superseded_views_are_gced(ray_session, hh_stream, tmp_path):
    import os
    out = str(tmp_path / "out")
    job = StreamingHeavyHitters(out, col="role", capacity=64,
                                num_partitions=2)
    job.run(hh_stream, epoch_size=2)
    views = [f for f in os.listdir(out) if f.startswith("hhview-")]
    assert len(views) == 1                  # only the current view remains
