"""Streaming sample view ≡ batch bottom_k_sample over the ingested prefix."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from saber_ray.sources.transcripts import _gen_chunk
from saber_ray.stages.sample import bottom_k_sample
from saber_ray.streaming_sample import StreamingSample
from tests.oracle_util import to_pandas


@pytest.fixture(scope="module")
def s_stream(tmp_path_factory):
    root = tmp_path_factory.mktemp("s_stream")
    t = _gen_chunk(7, 300, 10, seed=51)
    t = t.select(["conv_id", "turn_idx", "role", "ts"]).sort_by("ts")
    # int-castable sample key (the batch twin's contract)
    import pyarrow.compute as pc
    t = t.append_column("row_key", pc.add(
        t["ts"].cast(pa.int64()), t["turn_idx"].cast(pa.int64())))
    files, n = [], t.num_rows
    for i in range(6):
        part = t.slice(i * n // 6, (i + 1) * n // 6 - i * n // 6)
        p = str(root / f"s{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _batch_twin(files, k, salt=0):
    import pyarrow.compute as pc

    def ts_to_us(t: pa.Table) -> pa.Table:
        # the streaming engines emit event time as int64 epoch-us
        i = t.schema.get_field_index("ts")
        return t.set_column(i, "ts", t["ts"].cast(pa.int64()))

    ds = rd.read_parquet(list(files)).map_batches(
        ts_to_us, batch_format="pyarrow", zero_copy_batch=True)
    return to_pandas(bottom_k_sample(ds, "row_key", k, salt=salt))


def _canon(df):
    return df.sort_values("row_key").reset_index(drop=True)


def test_streaming_sample_equals_batch_twin(ray_session, s_stream,
                                            tmp_path):
    """After full ingest the view IS bottom_k_sample of the whole
    stream — identical rows, every column."""
    job = StreamingSample(str(tmp_path / "out"), key="row_key", k=100,
                          num_partitions=3)
    job.run(s_stream, epoch_size=2)
    got = _canon(to_pandas(job.results()))
    want = _canon(_batch_twin(s_stream, 100))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])


def test_streaming_sample_prefix_and_resume(ray_session, s_stream,
                                            tmp_path):
    """Mid-stream the view equals the batch twin over the ingested
    PREFIX; a killed+resumed run ends bit-identical to an uninterrupted
    one."""
    part = StreamingSample(str(tmp_path / "p"), key="row_key", k=50,
                           num_partitions=2)
    part.run(s_stream, epoch_size=2, max_epochs=2)   # 4 of 6 files
    got = _canon(to_pandas(part.results()))
    want = _canon(_batch_twin(s_stream[:4], 50))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])

    resumed = StreamingSample(str(tmp_path / "p"), key="row_key", k=50,
                              num_partitions=2)
    resumed.run(s_stream, epoch_size=2)
    full = StreamingSample(str(tmp_path / "f"), key="row_key", k=50,
                           num_partitions=2)
    full.run(s_stream, epoch_size=2)
    a = _canon(to_pandas(resumed.results()))
    b = _canon(to_pandas(full.results()))
    pd.testing.assert_frame_equal(a, b)


def test_streaming_sample_k_larger_than_stream(ray_session, tmp_path):
    """k beyond the stream size: the sample is simply every row."""
    p = str(tmp_path / "tiny.parquet")
    pq.write_table(pa.table({
        "row_key": pa.array([5, 3, 9], pa.int64()),
        "ts": pa.array([1, 2, 3], pa.int64())}), p)
    job = StreamingSample(str(tmp_path / "out"), key="row_key", k=100,
                          num_partitions=2)
    job.run([p], epoch_size=1)
    got = to_pandas(job.results())
    assert sorted(got["row_key"].tolist()) == [3, 5, 9]
    with pytest.raises(ValueError, match="k must be"):
        StreamingSample(str(tmp_path / "bad"), key="row_key", k=0)


def test_streaming_sample_property_random_keys(ray_session, tmp_path):
    """Property: for random int keys (negatives, duplicates, nulls) cut
    into random file boundaries, the view equals the batch twin."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(data=st.data())
    def check(data):
        n = data.draw(st.integers(min_value=1, max_value=120))
        keys = data.draw(st.lists(
            st.one_of(st.integers(min_value=-2**40, max_value=2**40),
                      st.none()),
            min_size=n, max_size=n))
        k = data.draw(st.integers(min_value=1, max_value=30))
        n_files = data.draw(st.integers(min_value=1, max_value=4))
        counter[0] += 1
        root = tmp_path / f"prop{counter[0]:03d}"
        root.mkdir()
        t = pa.table({"row_key": pa.array(keys, pa.int64()),
                      "ts": pa.array(range(n), pa.int64())})
        files = []
        for i in range(n_files):
            part = t.slice(i * n // n_files,
                           (i + 1) * n // n_files - i * n // n_files)
            p = str(root / f"f{i}.parquet")
            pq.write_table(part, p)
            files.append(p)
        job = StreamingSample(str(root / "out"), key="row_key", k=k,
                              num_partitions=2)
        job.run(files, epoch_size=1)
        got = to_pandas(job.results())
        want = to_pandas(bottom_k_sample(
            rd.read_parquet(files), "row_key", k))
        assert len(got) == len(want) == min(k, n)
        gs = got.sort_values(["row_key", "ts"], na_position="last") \
            .reset_index(drop=True)
        ws = want.sort_values(["row_key", "ts"], na_position="last") \
            .reset_index(drop=True)[gs.columns]
        pd.testing.assert_frame_equal(gs, ws, check_dtype=False)

    check()
