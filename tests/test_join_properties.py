"""Property tests: the join kernels vs pandas brute force (hypothesis).

Random small tables with duplicate keys, nulls, and clustered timestamps —
shapes the oracle-gate data doesn't produce — checked against pandas'
reference implementations across several partitionings.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from saber_ray.stages.join import asof_join, merge_join, windowed_join
from tests.oracle_util import to_pandas


def _mk(rng, n, null_frac=0.15, nkeys=5, tspan=50):
    keys = rng.integers(0, nkeys, n).astype(float)
    keys[rng.random(n) < null_frac] = np.nan
    return pd.DataFrame({
        "k": pd.array([None if np.isnan(x) else int(x) for x in keys],
                      dtype="Int64"),
        "ts": rng.integers(0, tspan, n),
        "v": np.arange(n),
    })


def _ds(df, parts):
    import ray.data as rd
    t = pa.table({"k": pa.array(df["k"], type=pa.int64()),
                  "ts": pa.array(df["ts"].to_numpy(), type=pa.int64()),
                  "v": pa.array(df["v"].to_numpy(), type=pa.int64())})
    return rd.from_arrow(t).repartition(parts)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**6), parts=st.integers(1, 4))
def test_merge_join_matches_pandas(ray_session, seed, parts):
    rng = np.random.default_rng(seed)
    l, r = _mk(rng, 30), _mk(rng, 25)
    lds, rds = _ds(l, parts), _ds(r, parts)
    ln = l.dropna(subset=["k"]).astype({"k": "int64"})
    rn = r.dropna(subset=["k"]).astype({"k": "int64"})
    want_inner = ln.merge(rn, on="k", suffixes=("", "_r"))
    got_inner = to_pandas(merge_join(lds, rds, on="k", how="inner"))
    assert len(got_inner) == len(want_inner)
    key = lambda d: sorted(map(tuple, d.to_numpy().tolist()))
    assert key(got_inner[["k", "v", "v_r"]]) == \
        key(want_inner[["k", "v", "v_r"]])
    matched = set(ln[ln["k"].isin(rn["k"])]["v"])
    got_semi = to_pandas(merge_join(lds, rds, on="k", how="semi"))
    assert set(got_semi["v"]) == matched
    got_anti = to_pandas(merge_join(lds, rds, on="k", how="anti"))
    assert set(got_anti["v"]) == set(l["v"]) - matched
    got_outer = to_pandas(merge_join(lds, rds, on="k", how="left_outer"))
    assert len(got_outer) == len(want_inner) + len(set(l["v"]) - matched)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**6), parts=st.integers(1, 4),
       before=st.integers(0, 10), after=st.integers(0, 10))
def test_windowed_join_matches_bruteforce(ray_session, seed, parts,
                                          before, after):
    rng = np.random.default_rng(seed)
    l, r = _mk(rng, 25), _mk(rng, 25)
    got = to_pandas(windowed_join(
        _ds(l, parts), _ds(r, parts), on="k", before=before, after=after,
        left_cols=["v"], right_cols=["v"]))
    ln = l.dropna(subset=["k"]).astype({"k": "int64"})
    rn = r.dropna(subset=["k"]).astype({"k": "int64"})
    want = ln.merge(rn, on="k", suffixes=("_l", "_r"))
    want = want[(want["ts_r"] >= want["ts_l"] - before)
                & (want["ts_r"] <= want["ts_l"] + after)]
    if len(got) == 0 or len(want) == 0:
        # Ray's to_pandas drops the schema of an all-empty dataset
        assert len(got) == len(want) == 0
        return
    key = lambda d: sorted(map(tuple, d.to_numpy().tolist()))
    assert key(got[["k", "v_l", "v_r"]]) == key(want[["k", "v_l", "v_r"]])


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**6), parts=st.integers(1, 4))
def test_asof_join_matches_pandas(ray_session, seed, parts):
    rng = np.random.default_rng(seed)
    l, r = _mk(rng, 25, null_frac=0.0), _mk(rng, 25, null_frac=0.0)
    # unique (k, ts) on the right: asof tie-pick is arbitrary otherwise
    r = r.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)
    got = to_pandas(asof_join(_ds(l, parts), _ds(r, parts), on="k",
                              left_cols=["v"], right_cols=["v"]))
    want = pd.merge_asof(
        l.astype({"k": "int64"}).sort_values("ts", kind="mergesort"),
        r.astype({"k": "int64"}).sort_values("ts", kind="mergesort"),
        on="ts", by="k", direction="backward", suffixes=("_l", "_r"))
    want = want.dropna(subset=["v_r"])          # inner semantics
    if len(got) == 0 or len(want) == 0:
        assert len(got) == len(want) == 0
        return
    key = lambda d: sorted(map(tuple, d.to_numpy().tolist()))
    assert key(got[["k", "v_l", "v_r"]].astype("int64")) == \
        key(want[["k", "v_l", "v_r"]].astype("int64"))
