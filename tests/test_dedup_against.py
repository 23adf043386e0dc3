"""Incremental dedup against a prior snapshot vs the DuckDB anti-join twin."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.dedup import dedup_against
from tests.oracle_util import canon, to_pandas

_TWIN = ("SELECT n.* FROM new n WHERE n.text NOT IN "
         "(SELECT text FROM prior)")


def _corpora(seed=13, n_new=3000, n_prior=1200):
    rng = np.random.default_rng(seed)
    # heavy overlap: prior texts drawn from the same small pool
    pool = [f"document body {i}" for i in range(1500)]
    new = pa.table({
        "doc_id": pa.array(np.arange(n_new, dtype=np.int64)),
        "text": pa.array([pool[i] for i in rng.integers(0, 1500, n_new)]),
        "lang": pa.array(np.array(["en", "fr"], dtype=object)[
            rng.integers(0, 2, n_new)], pa.string()),
    })
    prior = pa.table({
        "snap_id": pa.array(np.arange(n_prior, dtype=np.int64)),
        "text": pa.array([pool[i] for i in rng.integers(0, 900, n_prior)]),
    })
    return new, prior


@pytest.mark.parametrize("broadcast", [False, True])
def test_dedup_against_matches_anti_join(ray_session, broadcast):
    new, prior = _corpora()
    con = duckdb.connect()
    con.register("new", new)
    con.register("prior", prior)
    want = canon(con.sql(_TWIN).df())
    got = canon(to_pandas(dedup_against(
        rd.from_arrow(new).repartition(5),
        rd.from_arrow(prior).repartition(3), broadcast=broadcast)))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert 0 < len(got) < new.num_rows   # the test corpus overlaps partially


@pytest.mark.parametrize("broadcast", [False, True])
def test_dedup_against_empty_prior_keeps_everything(ray_session, broadcast):
    new, prior = _corpora(n_prior=4)
    empty_prior = prior.slice(0, 0)
    got = canon(to_pandas(dedup_against(
        rd.from_arrow(new), rd.from_arrow(empty_prior),
        broadcast=broadcast)))
    pd.testing.assert_frame_equal(got, canon(new.to_pandas()),
                                  check_dtype=False)


def test_dedup_against_executed_empty_prior(ray_session):
    """A prior filtered to 0 rows loses its schema on this Ray version
    (0-row blocks dropped) — the union path must still work."""
    new, prior = _corpora(n_new=200, n_prior=50)
    pr = rd.from_arrow(prior).filter(lambda r: False)
    got = canon(to_pandas(dedup_against(rd.from_arrow(new), pr)))
    pd.testing.assert_frame_equal(got, canon(new.to_pandas()),
                                  check_dtype=False)


def test_dedup_against_null_raises(ray_session):
    new = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a", None])})
    prior = pa.table({"text": pa.array(["a"])})
    with pytest.raises(Exception, match="NULL"):
        to_pandas(dedup_against(rd.from_arrow(new), rd.from_arrow(prior)))


def _word_doc(rng, n=40, vocab=5000, off=0):
    return " ".join(f"w{v+off}" for v in rng.integers(0, vocab, n))


def test_near_dedup_against_drops_prior_near_dups(ray_session):
    """New docs that are near-copies (or exact copies) of prior docs are
    dropped; genuinely fresh docs survive; new-internal near-dups are
    KEPT (documented: that's minhash_dedup's job on the survivors)."""
    from saber_ray.stages.dedup import near_dedup_against
    rng = np.random.default_rng(31)
    prior_texts = [_word_doc(rng) for _ in range(40)]
    near = []
    for t in prior_texts[:15]:   # drift ONE of 40 words: true 3-shingle
        w = t.split()            # Jaccard ≈ 0.86 — comfortably above the
        w[5] = "drifted"         # 0.5 threshold so the probabilistic LSH
        near.append(" ".join(w)) # miss rate is ≪ 1e-4 per doc
    exact = prior_texts[15:25]
    fresh = [_word_doc(rng, off=10**6) for _ in range(20)]
    twin_a = _word_doc(rng, off=2 * 10**6)
    twin_b = twin_a.replace(twin_a.split()[3], "changed", 1)
    new_texts = near + exact + fresh + [twin_a, twin_b]
    new = pa.table({
        "doc_id": pa.array(np.arange(len(new_texts), dtype=np.int64)),
        "text": pa.array(new_texts)})
    prior = pa.table({
        "doc_id": pa.array(np.arange(len(prior_texts), dtype=np.int64)),
        "text": pa.array(prior_texts)})
    for parts in (1, 4):
        got = to_pandas(near_dedup_against(
            rd.from_arrow(new).repartition(parts),
            rd.from_arrow(prior).repartition(2), threshold=0.5))
        kept = set(got["doc_id"])
        n_near, n_exact = len(near), len(exact)
        assert not kept & set(range(n_near + n_exact)), \
            "near/exact copies of prior must be dropped"
        assert set(range(n_near + n_exact, len(new_texts))) <= kept, \
            "fresh docs (and new-internal twins) must survive"
