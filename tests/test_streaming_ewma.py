"""StreamingEwma vs the batch operator (and through it the pandas
recurrence oracle of test_ewma.py): epoch-union parity for both adjust
modes, kill/resume exactly-once, epoch-size invariance, null skipping."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from saber_ray.stages.ewma import ewma
from saber_ray.streaming_ewma import StreamingEwma
from tests.oracle_util import to_pandas

ORDER = ["user_id", "ts", "event_id"]


@pytest.fixture(scope="module")
def ew_stream(tmp_path_factory, sf_dir):
    root = tmp_path_factory.mktemp("ewma_stream")
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["ts", "user_id", "event_id", "value"]) \
        .sort_by("ts")
    files, n = [], t.num_rows
    for i in range(10):
        p = str(root / f"s{i:03d}.parquet")
        pq.write_table(t.slice(i * n // 10, (i + 1) * n // 10 - i * n // 10),
                       p)
        files.append(p)
    return files


def _job(out, alpha=0.3, adjust=False, **kw):
    kw.setdefault("num_partitions", 3)
    return StreamingEwma(out, col="value", alpha=alpha, adjust=adjust,
                         keys=["user_id"], ts_col="ts",
                         tiebreak=["event_id"], **kw)


def _batch(files, alpha=0.3, adjust=False):
    want = to_pandas(ewma(rd.read_parquet(files), "value", keys="user_id",
                          order_by=["ts", "event_id"], alpha=alpha,
                          adjust=adjust))
    if str(want["ts"].dtype).startswith("datetime"):
        want["ts"] = want["ts"].values.view("int64")
    return want.sort_values(ORDER).reset_index(drop=True)


@pytest.mark.parametrize("adjust", [False, True])
def test_streaming_matches_batch(ray_session, ew_stream, tmp_path, adjust):
    job = _job(str(tmp_path / f"o{adjust}"), adjust=adjust)
    job.run(ew_stream, epoch_size=3)
    got = to_pandas(job.results()).sort_values(ORDER).reset_index(drop=True)
    want = _batch(ew_stream, adjust=adjust)
    assert len(got) == len(want)
    assert not got[ORDER].duplicated().any()
    np.testing.assert_allclose(got["value_ewma"].to_numpy(),
                               want["value_ewma"].to_numpy(), rtol=1e-9)


def test_kill_resume(ray_session, ew_stream, tmp_path):
    out = str(tmp_path / "out")
    j1 = _job(out)
    ck1 = j1.run(ew_stream, epoch_size=2, max_epochs=2)
    assert not ck1.get("finalized")
    j2 = _job(out)
    j2.run(ew_stream, epoch_size=2)
    got = to_pandas(j2.results()).sort_values(ORDER).reset_index(drop=True)
    want = _batch(ew_stream)
    assert len(got) == len(want)
    assert not got[ORDER].duplicated().any()
    np.testing.assert_allclose(got["value_ewma"].to_numpy(),
                               want["value_ewma"].to_numpy(), rtol=1e-9)


def test_epoch_size_invariance(ray_session, ew_stream, tmp_path):
    base = None
    for i, es in enumerate((1, 5, 10)):
        job = _job(str(tmp_path / f"e{i}"))
        job.run(ew_stream, epoch_size=es)
        got = to_pandas(job.results()).sort_values(ORDER) \
            .reset_index(drop=True)
        if base is None:
            base = got
        else:
            pd.testing.assert_frame_equal(
                base, got, check_exact=False, rtol=1e-12)


def test_nulls_skip_state_streaming(ray_session, tmp_path):
    """NULL x rows emit NULL and do not decay the carried state, across
    epoch boundaries."""
    t = pa.table({"user_id": [1] * 6, "ts": list(range(6)),
                  "event_id": list(range(6)),
                  "value": [1.0, None, 2.0, None, None, 3.0]})
    files = []
    for i in range(3):
        p = str(tmp_path / f"s{i}.parquet")
        pq.write_table(t.slice(i * 2, 2), p)
        files.append(p)
    job = _job(str(tmp_path / "out"), alpha=0.5, num_partitions=2)
    job.run(files, epoch_size=1)
    got = to_pandas(job.results()).sort_values("ts")
    y = got["value_ewma"].to_numpy()
    np.testing.assert_allclose(y[[0, 2, 5]], [1.0, 1.5, 2.25])
    assert np.isnan(y[[1, 3, 4]]).all()


def test_validation(tmp_path):
    with pytest.raises(ValueError, match="alpha"):
        StreamingEwma(str(tmp_path / "x"), col="value", alpha=0.0)
    with pytest.raises(ValueError, match="key"):
        StreamingEwma(str(tmp_path / "x"), col="value", alpha=0.5, keys=())
