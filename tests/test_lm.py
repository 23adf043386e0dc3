"""Unigram LM training + perplexity scoring vs full-formula DuckDB twins."""

import duckdb
import pandas as pd
import pytest
import ray.data as rd

from saber_ray.stages.lm import perplexity_score, train_unigram_lm
from tests.oracle_util import canon, to_pandas

TOK_SQL = ("SELECT doc_id, unnest(regexp_extract_all(lower(text), "
           "'[a-z0-9]+')) AS term FROM read_parquet('{p}')")


def _docs(sf_dir, **kw):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"], **kw)


def test_train_counts_vs_duckdb(ray_session, sf_dir):
    lm = train_unigram_lm(_docs(sf_dir))
    p = f"{sf_dir}/documents.parquet"
    want = duckdb.sql(
        f"SELECT term, COUNT(*) AS c FROM ({TOK_SQL.format(p=p)}) "
        "GROUP BY 1").df()
    assert lm["vocab"] == len(want)
    assert lm["total"] == int(want["c"].sum())
    got = pd.DataFrame({"term": list(lm["counts"]),
                        "c": list(lm["counts"].values())})
    pd.testing.assert_frame_equal(canon(got), canon(want),
                                  check_dtype=False)


def test_perplexity_vs_duckdb_with_oov(ray_session, sf_dir):
    """Train on even doc_ids, score ALL docs — OOV tokens get the
    add-one-smoothed zero-count probability."""
    import pyarrow.compute as pc
    train = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)),
        batch_format="pyarrow")
    lm = train_unigram_lm(train)
    got = canon(to_pandas(perplexity_score(_docs(sf_dir), lm)))
    p = f"{sf_dir}/documents.parquet"
    want = canon(duckdb.sql(f"""
        WITH tok AS ({TOK_SQL.format(p=p)}),
        cnt AS (SELECT term, COUNT(*) AS c FROM tok
                WHERE doc_id % 2 = 0 GROUP BY 1),
        stats AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM cnt)
        SELECT d.doc_id, COUNT(tok.term) AS n_tokens,
               ROUND(exp(-SUM(ln((COALESCE(cnt.c, 0) + 1)
                                 / (stats.total + stats.v + 1)))
                         / COUNT(tok.term)), 6) AS perplexity
        FROM read_parquet('{p}') d
        LEFT JOIN tok ON d.doc_id = tok.doc_id
        LEFT JOIN cnt ON tok.term = cnt.term, stats
        GROUP BY 1""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_min_count_folds_tail_but_keeps_denominator(ray_session, sf_dir):
    full = train_unigram_lm(_docs(sf_dir))
    capped = train_unigram_lm(_docs(sf_dir), min_count=3)
    assert capped["total"] == full["total"]
    assert capped["vocab"] == full["vocab"]
    assert set(capped["counts"]) <= set(full["counts"])
    assert all(c >= 3 for c in capped["counts"].values())


def test_max_vocab_keeps_most_frequent(ray_session, sf_dir):
    full = train_unigram_lm(_docs(sf_dir))
    cap = min(10, len(full["counts"]) - 1)
    capped = train_unigram_lm(_docs(sf_dir), max_vocab=cap)
    assert len(capped["counts"]) == cap
    floor = min(capped["counts"].values())
    dropped = [c for w, c in full["counts"].items()
               if w not in capped["counts"]]
    assert all(c <= floor for c in dropped)


def test_perplexity_block_invariance(ray_session, sf_dir):
    lm = train_unigram_lm(_docs(sf_dir))
    outs = [canon(to_pandas(perplexity_score(
        _docs(sf_dir, override_num_blocks=nb), lm))) for nb in (1, 7)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_empty_doc_scores_null(ray_session):
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["hello world", "!!! ..."]}))
    lm = train_unigram_lm(ds)
    df = to_pandas(perplexity_score(ds, lm)).set_index("doc_id")
    assert df.loc[2, "n_tokens"] == 0 and pd.isna(df.loc[2, "perplexity"])
    assert df.loc[1, "n_tokens"] == 2 and df.loc[1, "perplexity"] > 0


TOK_POS_SQL = """
    SELECT doc_id, t.term, t.pos FROM (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
             generate_subscripts(
                 regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
      FROM read_parquet('{p}')) t"""


def test_ngram_counts_vs_duckdb(ray_session, sf_dir):
    """Bigram + trigram vocabularies vs a LEAD()-over-positions oracle."""
    from saber_ray.stages.lm import ngram_counts
    p = f"{sf_dir}/documents.parquet"
    for n in (2, 3):
        got = canon(to_pandas(ngram_counts(_docs(sf_dir), n=n)))
        leads = " || ' ' || ".join(
            ["term"] + [f"LEAD(term, {j}) OVER w" for j in range(1, n)])
        guard = f"LEAD(term, {n - 1}) OVER w IS NOT NULL"
        want = canon(duckdb.sql(f"""
            WITH tok AS ({TOK_POS_SQL.format(p=p)}),
            grams AS (SELECT {leads} AS gram,
                             {guard} AS full_gram
                      FROM tok
                      WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
            SELECT gram, COUNT(*) AS count FROM grams
            WHERE full_gram GROUP BY 1""").df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ngram_block_invariance(ray_session, sf_dir):
    from saber_ray.stages.lm import ngram_counts
    outs = [canon(to_pandas(ngram_counts(
        _docs(sf_dir, override_num_blocks=nb), n=2))) for nb in (1, 5)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_collocations_vs_duckdb(ray_session, sf_dir):
    """PMI collocations vs the full formula in SQL."""
    from saber_ray.stages.lm import collocations
    p = f"{sf_dir}/documents.parquet"
    got = canon(to_pandas(collocations(_docs(sf_dir), min_count=5)))
    want = canon(duckdb.sql(f"""
        WITH tok AS ({TOK_POS_SQL.format(p=p)}),
        uni AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY 1),
        t1 AS (SELECT SUM(c) AS total FROM uni),
        pairs AS (SELECT term AS w1, LEAD(term) OVER w AS w2 FROM tok
                  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs
                WHERE w2 IS NOT NULL GROUP BY 1, 2),
        t2 AS (SELECT SUM(c12) AS total FROM big)
        SELECT big.w1, big.w2, big.c12 AS count,
               ROUND(ln((big.c12 / t2.total)
                        / ((u1.c / t1.total) * (u2.c / t1.total))), 6)
               AS pmi
        FROM big JOIN uni u1 ON big.w1 = u1.term
                 JOIN uni u2 ON big.w2 = u2.term, t1, t2
        WHERE big.c12 >= 5""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bigram_lm_numpy_twin_and_order_sensitivity(ray_session):
    """Exact twin parity for the bucketed bigram model, plus the
    signature property the unigram LM cannot have: shuffling word order
    raises perplexity while the unigram score is unchanged."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.embed import _token_dims
    from saber_ray.stages.lm import (bigram_perplexity, perplexity_score,
                                     train_bigram_lm, train_unigram_lm)
    from tests.oracle_util import to_pandas

    rng = np.random.default_rng(11)
    phrase = "the quick brown fox jumps over the lazy dog"
    texts = [phrase for _ in range(50)]
    t = pa.table({"doc_id": pa.array(np.arange(50), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(4)
    dim, alpha = 128, 0.1
    model = train_bigram_lm(ds, dim=dim, alpha=alpha)

    # numpy twin: same pairs, same counts, same log-probs
    owners, idx, _ = _token_dims(t["text"], dim)
    prev = np.empty_like(idx)
    prev[1:] = idx[:-1]
    same = np.zeros(len(idx), bool)
    same[1:] = owners[1:] == owners[:-1]
    prev[~same] = dim
    grid = np.bincount(prev * dim + idx,
                       minlength=(dim + 1) * dim).astype(np.float64) \
        .reshape(dim + 1, dim)
    want = np.log(grid + alpha) \
        - np.log(grid.sum(axis=1, keepdims=True) + alpha * dim)
    assert np.array_equal(model["logp"], want)

    # order sensitivity on held-out docs
    words = phrase.split()
    shuffled = " ".join(rng.permutation(words))
    probe = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array([phrase, shuffled], pa.string())})
    pds = rd.from_arrow(probe)
    bi = to_pandas(bigram_perplexity(pds, model)).set_index("doc_id")
    assert bi.loc[0, "perplexity"] < bi.loc[1, "perplexity"]
    uni = train_unigram_lm(ds)
    up = to_pandas(perplexity_score(pds, uni)).set_index("doc_id")
    assert abs(up.loc[0, "perplexity"] - up.loc[1, "perplexity"]) < 1e-9

    # empty / null text scores NULL with zero tokens
    edge = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                     "text": pa.array([None, "?!"], pa.string())})
    e = to_pandas(bigram_perplexity(rd.from_arrow(edge), model))
    assert (e["n_tokens"] == 0).all() and e["perplexity"].isna().all()
