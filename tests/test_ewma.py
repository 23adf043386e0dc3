"""EWMA vs an independent pandas-recurrence oracle.

The engine kernel is a chunked closed-form scan (stages/ewma.py); the
oracle is pandas' sequential ``ewm(...).mean()`` per key over the non-null
subsequence — an entirely different evaluation order, so agreement to
1e-9 relative is real evidence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.ewma import ewma, ewma_block
from tests.oracle_util import to_pandas


def _events(sf_dir):
    return rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["ts", "user_id", "event_id", "value"])


def _oracle(df, alpha, adjust, val="value"):
    out = []
    for uid, g in df.sort_values(["user_id", "ts", "event_id"]) \
                    .groupby("user_id"):
        s = g[val].dropna()
        y = s.ewm(alpha=alpha, adjust=adjust).mean()
        o = g[["user_id", "ts", "event_id"]].copy()
        o["want"] = y.reindex(g.index)
        out.append(o)
    return pd.concat(out)


@pytest.mark.parametrize("alpha,adjust", [(0.2, False), (0.2, True),
                                          (0.9, False), (0.02, True)])
def test_ewma_vs_pandas(ray_session, sf_dir, alpha, adjust):
    res = to_pandas(ewma(_events(sf_dir), "value", keys="user_id",
                         order_by=["ts", "event_id"], alpha=alpha,
                         adjust=adjust))
    raw = to_pandas(_events(sf_dir))
    want = _oracle(raw, alpha, adjust)
    m = res.merge(want, on=["user_id", "ts", "event_id"], how="outer")
    assert len(m) == len(res) == len(want)
    np.testing.assert_allclose(m["value_ewma"].to_numpy(),
                               m["want"].to_numpy(), rtol=1e-9, atol=1e-12)


def test_ewma_nulls_skip_state(ray_session):
    """NULL x -> NULL out, state unaffected (the smoothing sequence is the
    non-null subsequence)."""
    t = pa.table({"k": ["a"] * 6 + ["b"] * 3,
                  "i": list(range(6)) + list(range(3)),
                  "x": [1.0, None, 2.0, None, None, 3.0, 10.0, None, 20.0]})
    res = to_pandas(ewma(rd.from_arrow(t), "x", keys="k", order_by="i",
                         alpha=0.5)).sort_values(["k", "i"])
    got = res["x_ewma"].to_numpy()
    # key a: seq 1,2,3 -> 1, 1.5, 2.25 at positions 0,2,5
    np.testing.assert_allclose(got[[0, 2, 5]], [1.0, 1.5, 2.25])
    assert np.isnan(got[[1, 3, 4]]).all()
    # key b: 10, 15 at positions 0,2
    np.testing.assert_allclose(got[[6, 8]], [10.0, 15.0])
    assert np.isnan(got[7])


def test_ewma_chunk_boundaries_long_series():
    """A 50k-row single segment with alpha=0.9 forces hundreds of chunk
    crossings (L ~ 250); the chunked scan must track the sequential
    recurrence through every crossing."""
    rng = np.random.default_rng(7)
    x = rng.normal(100.0, 25.0, 50_000)
    y = ewma_block(x, np.zeros(len(x), dtype=np.int64), alpha=0.9,
                   adjust=False)
    want = pd.Series(x).ewm(alpha=0.9, adjust=False).mean().to_numpy()
    np.testing.assert_allclose(y, want, rtol=1e-9)
    # and with many segments cutting across chunk boundaries
    seg = np.sort(rng.integers(0, 997, len(x)))
    y2 = ewma_block(x, seg, alpha=0.35, adjust=True)
    df = pd.DataFrame({"x": x, "s": seg})
    want2 = df.groupby("s")["x"].transform(
        lambda s: s.ewm(alpha=0.35, adjust=True).mean()).to_numpy()
    np.testing.assert_allclose(y2, want2, rtol=1e-9)


def test_ewma_partitioning_invariance(ray_session, sf_dir):
    a = to_pandas(ewma(_events(sf_dir), "value", keys="user_id",
                       order_by=["ts", "event_id"], alpha=0.3)) \
        .sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    b = to_pandas(ewma(_events(sf_dir).repartition(13), "value",
                       keys="user_id", order_by=["ts", "event_id"],
                       alpha=0.3, shuffle_partitions=5)) \
        .sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_validation(ray_session, sf_dir):
    with pytest.raises(ValueError, match="alpha"):
        ewma(_events(sf_dir), "value", keys="user_id", order_by="ts",
             alpha=1.0)
    with pytest.raises(ValueError, match="order"):
        ewma(_events(sf_dir), "value", keys="user_id", order_by=[],
             alpha=0.5)
