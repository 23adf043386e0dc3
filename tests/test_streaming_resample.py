"""StreamingResample vs the batch resample operator and its DuckDB grid
oracle: the union of emitted rows over a finite stream must equal the batch
per-key dense grid, kill/resume-stable, for every fill mode."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray.core.aggregates import avg, cnt, sum_
from saber_ray.streaming_resample import StreamingResample
from tests.oracle_util import canon, to_pandas

HOUR = 3_600_000_000
STEP = 6 * HOUR
AGGS = [cnt(alias="n"), sum_("value", "sum_value", scale=2)]


@pytest.fixture(scope="module")
def ev_stream(tmp_path_factory, sf_dir):
    root = tmp_path_factory.mktemp("resample_stream")
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["ts", "user_id", "value"]).sort_by("ts")
    files, n = [], t.num_rows
    for i in range(10):
        part = t.slice(i * n // 10, (i + 1) * n // 10 - i * n // 10)
        p = str(root / f"s{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _oracle_ffill(files):
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    return canon(duckdb.sql(f"""
WITH b AS (SELECT user_id, epoch_us(ts)//{STEP} AS window_id, value FROM t),
agg AS (SELECT user_id, window_id, COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE),6)
          AS sum_value FROM b GROUP BY 1,2),
s AS (SELECT user_id, MIN(window_id) lo, MAX(window_id) hi
      FROM agg GROUP BY 1),
grid AS (SELECT user_id, unnest(range(lo, hi+1)) AS window_id FROM s),
j AS (SELECT g.user_id, g.window_id, a.n, a.sum_value,
      a.user_id IS NULL AS is_gap FROM grid g
      LEFT JOIN agg a ON g.user_id=a.user_id AND g.window_id=a.window_id)
SELECT user_id, window_id, is_gap,
  last_value(n IGNORE NULLS) OVER w AS n,
  last_value(sum_value IGNORE NULLS) OVER w AS sum_value
FROM j WINDOW w AS (PARTITION BY user_id ORDER BY window_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""").df())


def _job(out, fill="ffill", aggs=AGGS, **kw):
    kw.setdefault("num_partitions", 3)
    return StreamingResample(out, step=STEP, aggs=aggs, keys=["user_id"],
                             ts_col="ts", fill=fill, round_decimals=6, **kw)


_COLS = ["user_id", "window_id", "is_gap", "n", "sum_value"]


def test_streaming_ffill_matches_oracle(ray_session, ev_stream, tmp_path):
    job = _job(str(tmp_path / "out"))
    ck = job.run(ev_stream, epoch_size=3)
    res = to_pandas(job.results())
    assert not res[["user_id", "window_id"]].duplicated().any()
    got = canon(res[_COLS])
    want = _oracle_ffill(ev_stream)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()),
                                  check_dtype=False)
    assert ck["metrics"]["emitted_rows"] == len(got)
    # gaps genuinely stream: some emitted BEFORE the end-of-stream flush
    emits = sorted(f for f in os.listdir(str(tmp_path / "out"))
                   if f.startswith("resample-"))
    assert len(emits) > 1


def test_streaming_matches_batch_operator(ray_session, ev_stream, tmp_path):
    """Union of epochs == the batch resample on the concatenated stream,
    for every fill mode (value-level, via the shared canon)."""
    import ray.data as rd
    from saber_ray.stages.resample import resample
    for fill in ("null", "zero", "ffill", "linear"):
        aggs = [avg("value", "avg_value", scale=2)] if fill == "linear" \
            else AGGS
        cols = ["user_id", "window_id", "is_gap"] + [a.alias for a in aggs]
        batch = resample(rd.read_parquet(ev_stream), step=STEP,
                         keys="user_id", aggs=aggs, fill=fill,
                         round_decimals=6)
        want = canon(to_pandas(batch)[cols])
        job = _job(str(tmp_path / f"out_{fill}"), fill=fill, aggs=aggs)
        job.run(ev_stream, epoch_size=4)
        got = canon(to_pandas(job.results())[cols])
        pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()),
                                      check_dtype=False)


def test_streaming_resample_kill_resume(ray_session, ev_stream, tmp_path):
    out = str(tmp_path / "out")
    j1 = _job(out)
    ck1 = j1.run(ev_stream, epoch_size=2, max_epochs=2)
    assert not ck1.get("finalized")
    j2 = _job(out)
    j2.run(ev_stream, epoch_size=2)
    res = to_pandas(j2.results())
    assert not res[["user_id", "window_id"]].duplicated().any()
    got = canon(res[_COLS])
    want = _oracle_ffill(ev_stream)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()),
                                  check_dtype=False)


def test_epoch_size_invariance(ray_session, ev_stream, tmp_path):
    base = None
    for i, es in enumerate((1, 4, 10)):
        job = _job(str(tmp_path / f"o{i}"))
        job.run(ev_stream, epoch_size=es)
        got = canon(to_pandas(job.results())[_COLS])
        if base is None:
            base = got
        else:
            pd.testing.assert_frame_equal(base, got)


def test_validation(tmp_path):
    with pytest.raises(ValueError, match="fill"):
        StreamingResample(str(tmp_path / "x"), step=STEP, aggs=AGGS,
                          fill="pad")
    with pytest.raises(ValueError, match="step"):
        StreamingResample(str(tmp_path / "x"), step=0, aggs=AGGS)
    with pytest.raises(ValueError, match="key"):
        StreamingResample(str(tmp_path / "x"), step=STEP, aggs=AGGS,
                          keys=())
