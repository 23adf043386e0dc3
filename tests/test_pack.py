"""Sequence packing: reference parity, invariants, partitioning stability."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.pack import pack_reference, pack_sequences
from tests.oracle_util import to_pandas


def _docs(n=3000, seed=21, max_tok=900):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
        "n_tokens": pa.array(rng.integers(1, max_tok, n).astype(np.int64)),
    })


def test_pack_matches_reference_any_partitioning(ray_session):
    t = _docs()
    want = pack_reference(t["doc_id"].to_pylist(),
                          t["n_tokens"].to_pylist(), capacity=2048,
                          buckets=16, salt=3)
    for parts in (1, 7):
        got = to_pandas(pack_sequences(
            rd.from_arrow(t).repartition(parts), 2048, buckets=16, salt=3))
        assert len(got) == t.num_rows
        for _, r in got.iterrows():
            assert want[r["doc_id"]] == (r["seq_id"], r["seq_pos"],
                                         r["seq_off"], r["oversize"]), r

def test_pack_capacity_invariant(ray_session):
    t = _docs(max_tok=3000)          # some docs exceed capacity
    got = to_pandas(pack_sequences(rd.from_arrow(t), 2048, buckets=8))
    agg = got.groupby("seq_id").agg(total=("n_tokens", "sum"),
                                    n=("n_tokens", "size"),
                                    over=("oversize", "any"))
    # non-oversize sequences respect the budget; oversize are singletons
    assert (agg.loc[~agg["over"], "total"] <= 2048).all()
    assert (agg.loc[agg["over"], "n"] == 1).all()
    # positions are dense 0..n-1 and offsets are the token prefix sums
    g = got.sort_values(["seq_id", "seq_pos"])
    for _, grp in g.groupby("seq_id"):
        assert list(grp["seq_pos"]) == list(range(len(grp)))
        assert list(grp["seq_off"]) == list(
            np.concatenate(([0], np.cumsum(grp["n_tokens"])[:-1])))


def test_pack_greedy_density(ray_session):
    """next-fit with uniform doc sizes packs near the bin-count lower
    bound — the operator must not emit one sequence per doc."""
    t = _docs(max_tok=400)
    got = to_pandas(pack_sequences(rd.from_arrow(t), 4096, buckets=4))
    n_seqs = got["seq_id"].nunique()
    lower = int(np.ceil(got["n_tokens"].sum() / 4096))
    assert n_seqs <= 1.35 * lower + 4


def test_pack_rejects_bad_input(ray_session):
    t = pa.table({"doc_id": pa.array([1, 1], pa.int64()),
                  "n_tokens": pa.array([5, 5], pa.int64())})
    with pytest.raises(Exception, match="not unique"):
        to_pandas(pack_sequences(rd.from_arrow(t), 10))
    t2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "n_tokens": pa.array([5, None], pa.int64())})
    with pytest.raises(Exception, match="NULL"):
        to_pandas(pack_sequences(rd.from_arrow(t2), 10))
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(rd.from_arrow(t), 0)


def test_pack_matches_sql_twin(ray_session):
    import duckdb

    from saber_ray.stages.pack import pack_sql
    from tests.oracle_util import canon
    t = _docs(2000, seed=9, max_tok=3000)
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(pack_sql(
        "SELECT * FROM t", 2048, buckets=8, salt=5)).df())
    got = canon(to_pandas(pack_sequences(
        rd.from_arrow(t).repartition(5), 2048, buckets=8, salt=5)))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
