"""Streaming grouped top-k view vs the SQL ROW_NUMBER()<=k oracle and
the batch grouped_topk twin."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray.sources.transcripts import _gen_chunk
from saber_ray.streaming_topk import StreamingGroupedTopK
from tests.oracle_util import to_pandas


@pytest.fixture(scope="module")
def tk_stream(tmp_path_factory):
    root = tmp_path_factory.mktemp("tk_stream")
    t = _gen_chunk(9, 250, 12, seed=62)
    t = t.append_column(
        "text_len",
        pa.compute.cast(pa.compute.utf8_length(t["text"]), pa.int64()))
    t = t.select(["conv_id", "turn_idx", "role", "text_len", "ts"]) \
        .sort_by("ts")
    files, n = [], t.num_rows
    for i in range(6):
        part = t.slice(i * n // 6, (i + 1) * n // 6 - i * n // 6)
        p = str(root / f"t{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


K = 3


def _oracle(files):
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    return duckdb.sql(f"""
        SELECT conv_id, turn_idx, role, text_len, epoch_us(ts) AS ts FROM t
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY conv_id
            ORDER BY text_len DESC, turn_idx ASC) <= {K}
    """).df()


def _canon(df):
    return df.sort_values(["conv_id", "text_len", "turn_idx"],
                          ascending=[True, False, True]) \
        .reset_index(drop=True)[sorted(df.columns)]


def test_topk_equals_sql_window_oracle(ray_session, tk_stream, tmp_path):
    """After full ingest the view IS each conversation's k longest
    turns, every column."""
    job = StreamingGroupedTopK(
        str(tmp_path / "out"), keys=["conv_id"],
        order_by=["text_len", "turn_idx"], descending=[True, False], k=K,
        columns=["turn_idx", "role", "text_len"], num_partitions=3)
    job.run(tk_stream, epoch_size=2)
    got = _canon(to_pandas(job.results()))
    want = _canon(_oracle(tk_stream))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_topk_prefix_resume(ray_session, tk_stream, tmp_path):
    """Mid-stream the view equals the oracle over the PREFIX; resume is
    bit-identical to an uninterrupted run."""
    part = StreamingGroupedTopK(
        str(tmp_path / "p"), keys=["conv_id"],
        order_by=["text_len", "turn_idx"], descending=[True, False], k=K,
        columns=["turn_idx", "role", "text_len"], num_partitions=2)
    part.run(tk_stream, epoch_size=2, max_epochs=1)     # 2 of 6 files
    got = _canon(to_pandas(part.results()))
    want = _canon(_oracle(tk_stream[:2]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    resumed = StreamingGroupedTopK(
        str(tmp_path / "p"), keys=["conv_id"],
        order_by=["text_len", "turn_idx"], descending=[True, False], k=K,
        columns=["turn_idx", "role", "text_len"], num_partitions=2)
    resumed.run(tk_stream, epoch_size=2)
    full = StreamingGroupedTopK(
        str(tmp_path / "f"), keys=["conv_id"],
        order_by=["text_len", "turn_idx"], descending=[True, False], k=K,
        columns=["turn_idx", "role", "text_len"], num_partitions=2)
    full.run(tk_stream, epoch_size=2)
    pd.testing.assert_frame_equal(_canon(to_pandas(resumed.results())),
                                  _canon(to_pandas(full.results())))


def test_topk_matches_batch_twin(ray_session, tk_stream, tmp_path):
    """The final view equals stages/topk.grouped_topk over the whole
    ingested stream (identical selection semantics)."""
    import ray.data as rd
    from saber_ray.stages.topk import grouped_topk
    job = StreamingGroupedTopK(
        str(tmp_path / "out"), keys=["conv_id"],
        order_by=["text_len", "turn_idx"], descending=[True, False], k=K,
        columns=["turn_idx", "role", "text_len"], num_partitions=3)
    job.run(tk_stream, epoch_size=3)
    got = _canon(to_pandas(job.results()))[
        ["conv_id", "text_len", "turn_idx"]]
    batch = grouped_topk(
        rd.read_parquet(tk_stream), "conv_id",
        ["text_len", "turn_idx"], K, descending=[True, False])
    want = _canon(to_pandas(batch))[["conv_id", "text_len", "turn_idx"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_topk_out_of_order_candidate(ray_session, tmp_path):
    """A late file's rows still compete on value: a larger late value
    enters the board, a smaller one doesn't, nothing dead-letters."""
    root = tmp_path / "ooo"
    root.mkdir()
    f1 = str(root / "a.parquet")
    f2 = str(root / "b.parquet")
    pq.write_table(pa.table({
        "k": ["x", "x", "y"], "v": pa.array([5, 3, 9], pa.int64()),
        "seq": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([200, 300, 400], pa.int64())}), f1)
    pq.write_table(pa.table({                 # late file, older timestamps
        "k": ["x", "y"], "v": pa.array([7, 1], pa.int64()),
        "seq": pa.array([4, 5], pa.int64()),
        "ts": pa.array([100, 50], pa.int64())}), f2)
    job = StreamingGroupedTopK(
        str(tmp_path / "out"), keys=["k"], order_by=["v", "seq"],
        descending=[True, False], k=2, columns=["v", "seq"],
        num_partitions=2)
    job.run([f1, f2], epoch_size=1)
    got = to_pandas(job.results())
    by_key = {k: sorted(g["v"]) for k, g in got.groupby("k")}
    assert by_key == {"x": [5, 7], "y": [1, 9]}
    assert job.late_results().num_rows == 0


def test_topk_k_validation(ray_session, tmp_path):
    with pytest.raises(ValueError, match="k must be"):
        StreamingGroupedTopK(str(tmp_path / "o"), keys="k",
                             order_by="v", k=0)
