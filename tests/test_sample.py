"""Deterministic sampling: re-sharding stability + SQL twin parity."""

import numpy as np

from saber_ray.sources.parquet import read_table
from saber_ray.stages.sample import bottom_k_sample, hash_sample, \
    sample_sql_predicate
from tests.oracle_util import assert_matches_oracle, canon, to_pandas


def test_hash_sample_stable_under_resharding(ray_session, sf_dir):
    ds = read_table(sf_dir, "events", columns=["event_id", "value"])
    a = canon(to_pandas(hash_sample(ds, "event_id", 0.2)))
    b = canon(to_pandas(hash_sample(ds.repartition(7), "event_id", 0.2)))
    assert a.equals(b)
    assert 0.1 < len(a) / to_pandas(ds).shape[0] < 0.3


def test_hash_sample_oracle(ray_session, sf_dir):
    ds = read_table(sf_dir, "events", columns=["event_id", "value"])
    out = hash_sample(ds, "event_id", 0.25, salt=7)
    pred = sample_sql_predicate("event_id", 0.25, salt=7)
    assert_matches_oracle(out, f"SELECT event_id, value FROM events WHERE {pred}",
                          sf_dir)


def test_bottom_k_sample_exact_k_and_stable(ray_session, sf_dir):
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id"])
    a = canon(to_pandas(bottom_k_sample(ds, "event_id", 50)))
    b = canon(to_pandas(bottom_k_sample(ds.repartition(5), "event_id", 50)))
    assert len(a) == 50 and a.equals(b)


def test_hash_sample_negative_keys_match_sql(ray_session):
    """Negative keys: numpy floored % vs SQL sign-preserving % (review r2) —
    the canonical double-mod SQL twin keeps them identical."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd
    rng = np.random.default_rng(5)
    keys = rng.integers(-10**9, 10**9, 5000)
    t = pa.table({"k": pa.array(keys, pa.int64())})
    ds = rd.from_arrow(t).repartition(4)
    got = sorted(to_pandas(hash_sample(ds, "k", 0.3, salt=11))["k"])
    con = duckdb.connect()
    con.register("t", t)
    pred = sample_sql_predicate("k", 0.3, salt=11)
    want = sorted(r[0] for r in con.execute(
        f"SELECT k FROM t WHERE {pred}").fetchall())
    assert got == want and len(got) > 0


def test_stratified_sample_vs_row_number_oracle(ray_session, sf_dir):
    """Exactly-k per language over documents vs the ROW_NUMBER() twin."""
    from saber_ray.stages.sample import stratified_sample, _KNUTH, _M31, _M32
    from __ray_entry__ import read_table
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    out = stratified_sample(docs, "lang", "doc_id", 7)
    h = (f"((((((doc_id % {_M31}) + {_M31}) % {_M31}) * {_KNUTH} + 0) "
         f"% {_M32}) + {_M32}) % {_M32}")
    assert_matches_oracle(
        out,
        f"SELECT doc_id, lang FROM (SELECT doc_id, lang, ROW_NUMBER() "
        f"OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rn "
        f"FROM documents) WHERE rn <= 7",
        sf_dir)


def test_stratified_sample_partition_invariance(ray_session):
    """Identical rows at any block layout (deterministic re-sharding)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.sample import stratified_sample
    rng = np.random.default_rng(5)
    t = pa.table({
        "g": pa.array(np.array(["a", "b", None], dtype=object)[
            rng.integers(0, 3, 900)], pa.string()),
        "id": pa.array(rng.permutation(900), pa.int64())})
    a = canon(to_pandas(stratified_sample(rd.from_arrow(t), "g", "id", 10)))
    b = canon(to_pandas(stratified_sample(
        rd.from_arrow(t).repartition(7), "g", "id", 10)))
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("g", dropna=False).size() == 10).all()
