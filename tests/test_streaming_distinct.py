"""Streaming distinct-count view vs exact COUNT(DISTINCT)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray.sources.transcripts import _gen_chunk
from saber_ray.streaming_distinct import StreamingDistinct
from tests.oracle_util import to_pandas


@pytest.fixture(scope="module")
def d_stream(tmp_path_factory):
    root = tmp_path_factory.mktemp("d_stream")
    t = _gen_chunk(5, 600, 10, seed=43)
    t = t.select(["conv_id", "tool", "ts"]).sort_by("ts")
    files, n = [], t.num_rows
    for i in range(8):
        part = t.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
        p = str(root / f"s{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _truth(files, col):
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    return duckdb.sql(f"""
        SELECT COUNT(*) AS n_rows,
               COUNT(*) - COUNT({col}) AS n_nulls,
               COUNT(DISTINCT {col}) AS n_distinct FROM t""").df().iloc[0]


def test_distinct_exact_regime(ray_session, d_stream, tmp_path):
    """Ample sketch capacity: the view IS COUNT(DISTINCT), flagged exact;
    the nullable tool column checks SQL null semantics."""
    for col in ("conv_id", "tool"):
        job = StreamingDistinct(str(tmp_path / f"out_{col}"), col=col,
                                kmv_k=100_000, num_partitions=3)
        job.run(d_stream, epoch_size=2)
        got = to_pandas(job.results()).iloc[0]
        want = _truth(d_stream, col)
        assert bool(got["exact"])
        for f in ("n_rows", "n_nulls", "n_distinct"):
            assert int(got[f]) == int(want[f]), (col, f, got[f], want[f])


def test_distinct_estimate_regime_bounds(ray_session, d_stream, tmp_path):
    """Tiny sketch: flagged approximate, estimate within the documented
    ~1/sqrt(k) band (generous 3-sigma check)."""
    job = StreamingDistinct(str(tmp_path / "out"), col="conv_id",
                            kmv_k=64, num_partitions=2)
    job.run(d_stream, epoch_size=2)
    got = to_pandas(job.results()).iloc[0]
    want = int(_truth(d_stream, "conv_id")["n_distinct"])
    assert not bool(got["exact"]) or want <= 64 * 2
    rel = abs(int(got["n_distinct"]) - want) / want
    assert rel < 3 / (64 ** 0.5), (got["n_distinct"], want, rel)


def test_distinct_resume_equals_uninterrupted(ray_session, d_stream,
                                              tmp_path):
    a = str(tmp_path / "a")
    j1 = StreamingDistinct(a, col="conv_id", kmv_k=512, num_partitions=2)
    j1.run(d_stream, epoch_size=2, max_epochs=2)
    j1b = StreamingDistinct(a, col="conv_id", kmv_k=512, num_partitions=2)
    j1b.run(d_stream, epoch_size=2)
    j2 = StreamingDistinct(str(tmp_path / "b"), col="conv_id", kmv_k=512,
                           num_partitions=2)
    j2.run(d_stream, epoch_size=2)
    pd.testing.assert_frame_equal(to_pandas(j1b.results()),
                                  to_pandas(j2.results()))


def test_distinct_view_is_current(ray_session, d_stream, tmp_path):
    """Mid-stream the view reports counts so far (monotone rows), and
    before any epoch the view is the typed empty row."""
    out = str(tmp_path / "out")
    job = StreamingDistinct(out, col="conv_id", num_partitions=2)
    assert to_pandas(job.results()).iloc[0]["n_rows"] == 0
    job.run(d_stream, epoch_size=2, max_epochs=2, end_of_stream=False)
    mid = int(to_pandas(job.results()).iloc[0]["n_rows"])
    assert mid > 0
    job2 = StreamingDistinct(out, col="conv_id", num_partitions=2)
    job2.run(d_stream, epoch_size=2)
    fin = int(to_pandas(job2.results()).iloc[0]["n_rows"])
    assert fin > mid


def test_distinct_validation(tmp_path):
    with pytest.raises(ValueError):
        StreamingDistinct(str(tmp_path / "o"), col="x", kmv_k=1)
