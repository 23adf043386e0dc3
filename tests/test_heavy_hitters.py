"""Misra-Gries heavy hitters: exact below capacity, bounded above."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from saber_ray.stages.heavy_hitters import heavy_hitters
from tests.oracle_util import assert_matches_oracle, to_pandas


def test_heavy_hitters_exact_below_capacity(ray_session, sf_dir):
    """Capacity above the distinct count -> exact counts, undercount 0,
    deterministic order — value-oracle-checkable."""
    from __ray_entry__ import read_table
    ev = read_table(sf_dir, "events", columns=["event_type"])
    out = heavy_hitters(ev, "event_type", capacity=1024, k=3)
    got = to_pandas(out)
    assert (got["max_undercount"] == 0).all()
    assert_matches_oracle(
        out,
        "SELECT event_type, COUNT(*) AS est_count, "
        "CAST(0 AS BIGINT) AS max_undercount FROM events GROUP BY 1 "
        "ORDER BY est_count DESC, event_type LIMIT 3",
        sf_dir)


def test_heavy_hitters_zipf_bounds(ray_session):
    """Small capacity on skewed data: every reported est is a lower bound
    within max_undercount of truth; every value frequent beyond the bound
    is reported; bound <= n/(capacity+1)."""
    rng = np.random.default_rng(17)
    n, cap = 60000, 64
    vals = np.minimum(rng.zipf(1.3, n), 5000).astype(np.int64)
    t = pa.table({"v": pa.array(vals, pa.int64())})
    true = pd.Series(vals).value_counts()
    for parts in (1, 8):
        got = to_pandas(heavy_hitters(
            rd.from_arrow(t).repartition(parts), "v", capacity=cap))
        bound = int(got["max_undercount"].iloc[0])
        assert 0 <= bound <= n // (cap + 1)
        for _, r in got.iterrows():
            tc = int(true.get(r["v"], 0))
            assert r["est_count"] <= tc <= r["est_count"] + bound, r["v"]
        reported = set(got["v"])
        for v, tc in true.items():
            if tc > bound:
                assert v in reported, (v, tc, bound)


def test_heavy_hitters_uniform_cut_ledger(ray_session):
    """Uniform blocks where the cut removes every value must still count
    toward the undercount bound (the ledger-only row)."""
    t = pa.table({"v": pa.array(np.arange(3000, dtype=np.int64))})
    got = to_pandas(heavy_hitters(
        rd.from_arrow(t).repartition(6), "v", capacity=16))
    if len(got):
        assert (got["max_undercount"] >= 1).all()
    # sanity: nothing can claim est above its true count (1)
    assert (got["est_count"] <= 1).all() if len(got) else True


def test_heavy_hitters_nulls_and_validation(ray_session):
    t = pa.table({"v": pa.array(["a", None, None, "b", None], pa.string())})
    got = to_pandas(heavy_hitters(rd.from_arrow(t), "v", capacity=10))
    row = got[got["v"].isna()]
    assert len(row) == 1 and int(row["est_count"].iloc[0]) == 3
    try:
        heavy_hitters(rd.from_arrow(t), "v", capacity=0)
        assert False, "expected ValueError"
    except ValueError:
        pass
