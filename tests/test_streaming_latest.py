"""Streaming latest-per-key view vs the SQL ROW_NUMBER()=1 oracle."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray.sources.transcripts import _gen_chunk
from saber_ray.streaming_latest import StreamingLatest
from tests.oracle_util import to_pandas


@pytest.fixture(scope="module")
def l_stream(tmp_path_factory):
    root = tmp_path_factory.mktemp("l_stream")
    t = _gen_chunk(9, 250, 12, seed=61)
    t = t.select(["conv_id", "turn_idx", "role", "tool", "ts"]).sort_by("ts")
    files, n = [], t.num_rows
    for i in range(6):
        part = t.slice(i * n // 6, (i + 1) * n // 6 - i * n // 6)
        p = str(root / f"l{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _oracle(files):
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    return duckdb.sql("""
        SELECT conv_id, turn_idx, role, tool, epoch_us(ts) AS ts FROM t
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY conv_id ORDER BY ts DESC, turn_idx DESC) = 1
    """).df()


def _canon(df):
    return df.sort_values("conv_id").reset_index(drop=True)[
        sorted(df.columns)]


def test_latest_equals_sql_window_oracle(ray_session, l_stream, tmp_path):
    """After full ingest the view IS the last turn of every
    conversation, every column."""
    job = StreamingLatest(str(tmp_path / "out"), keys=["conv_id"],
                          tie_break="turn_idx",
                          columns=["turn_idx", "role", "tool"],
                          num_partitions=3)
    job.run(l_stream, epoch_size=2)
    got = _canon(to_pandas(job.results()))
    want = _canon(_oracle(l_stream))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_latest_prefix_resume_and_late_upsert(ray_session, l_stream,
                                              tmp_path):
    """Mid-stream the view equals the oracle over the PREFIX; resume is
    bit-identical; an out-of-order row folds in by EVENT time (an older
    ts never displaces a newer one)."""
    part = StreamingLatest(str(tmp_path / "p"), keys=["conv_id"],
                           tie_break="turn_idx",
                           columns=["turn_idx", "role", "tool"],
                           num_partitions=2)
    part.run(l_stream, epoch_size=2, max_epochs=1)     # 2 of 6 files
    got = _canon(to_pandas(part.results()))
    want = _canon(_oracle(l_stream[:2]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    resumed = StreamingLatest(str(tmp_path / "p"), keys=["conv_id"],
                              tie_break="turn_idx",
                              columns=["turn_idx", "role", "tool"],
                              num_partitions=2)
    resumed.run(l_stream, epoch_size=2)
    full = StreamingLatest(str(tmp_path / "f"), keys=["conv_id"],
                           tie_break="turn_idx",
                           columns=["turn_idx", "role", "tool"],
                           num_partitions=2)
    full.run(l_stream, epoch_size=2)
    pd.testing.assert_frame_equal(_canon(to_pandas(resumed.results())),
                                  _canon(to_pandas(full.results())))


def test_latest_out_of_order_upsert(ray_session, tmp_path):
    """Event time decides recency: a file arriving LATER with an older
    timestamp must not displace the newer row."""
    root = tmp_path / "ooo"
    root.mkdir()
    f1 = str(root / "a.parquet")
    f2 = str(root / "b.parquet")
    pq.write_table(pa.table({
        "k": ["x", "y"], "v": ["new_x", "old_y"],
        "seq": pa.array([2, 1], pa.int64()),
        "ts": pa.array([200, 100], pa.int64())}), f1)
    pq.write_table(pa.table({                  # late file: older x, newer y
        "k": ["x", "y"], "v": ["stale_x", "new_y"],
        "seq": pa.array([1, 2], pa.int64()),
        "ts": pa.array([100, 300], pa.int64())}), f2)
    job = StreamingLatest(str(tmp_path / "out"), keys=["k"],
                          tie_break="seq", columns=["v"],
                          num_partitions=2)
    job.run([f1, f2], epoch_size=1)
    got = to_pandas(job.results()).set_index("k")["v"].to_dict()
    assert got == {"x": "new_x", "y": "new_y"}
    # metrics confirm nothing was dead-lettered despite the disorder
    assert job.late_results().num_rows == 0
