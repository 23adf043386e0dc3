"""Streaming grouped-quantiles view vs exact quantile_disc oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray.sources.transcripts import _gen_chunk
from saber_ray.streaming_quantiles import StreamingGroupedQuantiles
from tests.oracle_util import to_pandas


@pytest.fixture(scope="module")
def q_stream(tmp_path_factory):
    root = tmp_path_factory.mktemp("q_stream")
    t = _gen_chunk(3, 400, 12, seed=47)
    t = t.select(["role", "tool", "turn_idx", "ts"]).sort_by("ts")
    files, n = [], t.num_rows
    for i in range(8):
        part = t.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
        p = str(root / f"q{i:03d}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def _truth(files, keys, col, qs):
    t = pa.concat_tables([pq.read_table(f) for f in files])  # noqa: F841
    kexpr = ", ".join(keys)
    qcols = ", ".join(
        f"quantile_disc({col}, {q}) AS q{i}" for i, q in enumerate(qs))
    return duckdb.sql(f"""
        SELECT {kexpr}, COUNT({col}) AS n, {qcols}
        FROM t GROUP BY {kexpr} ORDER BY {kexpr}""").df()


def _canon_keys(df, keys):
    return df.sort_values(keys, na_position="last").reset_index(drop=True)


def test_quantiles_exact_regime(ray_session, q_stream, tmp_path):
    """Ample sketch capacity: every key's row IS quantile_disc, flagged
    exact; the nullable tool key checks the SQL NULL group."""
    for keys in (["role"], ["tool"]):
        qs = (0.5, 0.95)
        job = StreamingGroupedQuantiles(
            str(tmp_path / f"out_{keys[0]}"), keys=keys, col="turn_idx",
            qs=qs, k=200_000, num_partitions=3)
        job.run(q_stream, epoch_size=2)
        got = _canon_keys(to_pandas(job.results()), keys)
        want = _canon_keys(_truth(q_stream, keys, "turn_idx", qs), keys)
        assert len(got) == len(want), (keys, len(got), len(want))
        assert got["exact"].all()
        for i, q in enumerate(qs):
            lbl = "p" + ("%g" % (q * 100)).replace(".", "_")
            assert got[lbl].tolist() == want[f"q{i}"].tolist(), (keys, q)
        assert got["n"].tolist() == want["n"].tolist()


def test_quantiles_kill_resume_identical(ray_session, q_stream, tmp_path):
    """Exactly-once: a killed+resumed run re-emits the identical view —
    including in the COMPACTING regime (tiny k), which exercises the
    serialized RNG state."""
    full = StreamingGroupedQuantiles(
        str(tmp_path / "full"), keys=["role"], col="turn_idx",
        qs=(0.5, 0.9), k=64, num_partitions=2)
    full.run(q_stream, epoch_size=2)

    part = StreamingGroupedQuantiles(
        str(tmp_path / "part"), keys=["role"], col="turn_idx",
        qs=(0.5, 0.9), k=64, num_partitions=2)
    part.run(q_stream, epoch_size=2, max_epochs=2)   # "kill"
    resumed = StreamingGroupedQuantiles(
        str(tmp_path / "part"), keys=["role"], col="turn_idx",
        qs=(0.5, 0.9), k=64, num_partitions=2)
    resumed.run(q_stream, epoch_size=2)              # resume from ckpt

    a = _canon_keys(to_pandas(full.results()), ["role"])
    b = _canon_keys(to_pandas(resumed.results()), ["role"])
    pd.testing.assert_frame_equal(a, b)


def test_quantiles_estimate_regime_rank_error(ray_session, q_stream,
                                              tmp_path):
    """Tiny sketch: flagged approximate; the returned value's true rank
    is within a generous band of the target rank."""
    job = StreamingGroupedQuantiles(
        str(tmp_path / "out"), keys=["role"], col="turn_idx",
        qs=(0.5,), k=64, num_partitions=2)
    job.run(q_stream, epoch_size=2)
    got = to_pandas(job.results())
    t = pa.concat_tables([pq.read_table(f) for f in q_stream]).to_pandas()
    for _, row in got.iterrows():
        vals = np.sort(
            t.loc[t["role"] == row["role"], "turn_idx"].to_numpy())
        n = len(vals)
        if bool(row["exact"]):
            target = max(1, int(np.ceil(0.5 * n))) - 1
            assert row["p50"] == vals[target]
            continue
        true_rank = np.searchsorted(vals, row["p50"], side="right")
        assert abs(true_rank - 0.5 * n) <= 0.15 * n, \
            (row["role"], true_rank, n)


def test_quantiles_validation(ray_session, tmp_path):
    with pytest.raises(ValueError, match="k must be"):
        StreamingGroupedQuantiles(str(tmp_path / "a"), keys=["role"],
                                  col="x", k=1)
    with pytest.raises(ValueError, match="quantile point"):
        StreamingGroupedQuantiles(str(tmp_path / "b"), keys=["role"],
                                  col="x", qs=(0.0,))


def test_quantiles_big_int64_with_all_null_key(ray_session, tmp_path):
    """Values above 2^53 must survive snapshot/restore bit-exactly even
    when another key's sketch is EMPTY at snapshot time (an all-null
    key used to demote the serialized buffer to float64)."""
    root = tmp_path / "big"
    root.mkdir()
    files = []
    big = 1 << 60
    for i in range(4):
        n = 50
        vals = [big + j * 257 + i * 13 for j in range(n)]
        t = pa.table({
            "role": pa.array((["a"] * n)[: n // 2] + ["b"] * (n - n // 2)),
            "turn_idx": pa.array(
                vals[: n // 2] + [None] * (n - n // 2), pa.int64()),
            "ts": pa.array(range(i * n, (i + 1) * n), pa.int64())})
        p = str(root / f"f{i}.parquet")
        pq.write_table(t, p)
        files.append(p)

    def run(out, max_epochs=None):
        job = StreamingGroupedQuantiles(
            str(tmp_path / out), keys=["role"], col="turn_idx",
            qs=(0.5,), k=100_000, num_partitions=2)
        job.run(files, epoch_size=1, max_epochs=max_epochs)
        return job

    full = run("full")
    part = run("part", max_epochs=2)
    resumed = run("part")                       # resume from checkpoint
    # compare as ARROW: pandas converts a nullable int64 column to
    # float64, which itself corrupts values above 2^53
    a, b = full.results(), resumed.results()
    assert a.schema.field("p50").type == pa.int64()
    assert a.sort_by("role").equals(b.sort_by("role"))
    rows = {r["role"]: r for r in a.to_pylist()}
    # the "a" key's p50 is an exact element of the input (no rounding)
    assert rows["a"]["exact"]
    p50 = rows["a"]["p50"]
    assert isinstance(p50, int) and p50 >= big
    assert p50 % 257 in {big % 257, (big + 13) % 257,
                         (big + 26) % 257, (big + 39) % 257}
    # the all-null key reports n=0 and a NULL quantile
    assert rows["b"]["n"] == 0 and rows["b"]["p50"] is None
