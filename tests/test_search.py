"""Inverted index + BM25 search vs full-formula DuckDB oracles."""

import duckdb
import pyarrow as pa
import pandas as pd
import pytest
import ray.data as rd

from saber_ray.stages.search import (bm25_search, build_inverted_index,
                                     tokenize_query)
from tests.oracle_util import canon, to_pandas

QUERIES = ["the model of the data", "training pipeline quality",
           "zz_no_such_term_zz the"]
K, K1, B = 7, 1.2, 0.75


def _docs(sf_dir):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def _q_values_sql():
    rows = []
    for qid, q in enumerate(QUERIES):
        for w in tokenize_query(q):
            rows.append(f"({qid}, '{w}')")
    return ", ".join(rows)


def test_inverted_index_vs_duckdb(ray_session, sf_dir):
    got = canon(to_pandas(build_inverted_index(_docs(sf_dir))))
    want = canon(duckdb.sql(f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text),
                 '[a-z0-9]+')) AS term
          FROM read_parquet('{sf_dir}/documents.parquet')),
        dl AS (SELECT doc_id, COUNT(*) AS doclen FROM tok GROUP BY 1)
        SELECT term, tok.doc_id, COUNT(*) AS tf, ANY_VALUE(doclen) AS doclen
        FROM tok JOIN dl ON tok.doc_id = dl.doc_id
        GROUP BY 1, 2""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bm25_vs_duckdb(ray_session, sf_dir):
    out = to_pandas(bm25_search(_docs(sf_dir), QUERIES, k=K, k1=K1, b=B))
    got = canon(out[["query_id", "doc_id", "score", "rank"]])
    want = canon(duckdb.sql(f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text),
                 '[a-z0-9]+')) AS term
          FROM read_parquet('{sf_dir}/documents.parquet')),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, COUNT(*) AS doclen FROM tok GROUP BY 1),
        stats AS (SELECT COUNT(*) AS n, AVG(doclen) AS avgdl FROM dl),
        q(query_id, term) AS (VALUES {_q_values_sql()}),
        df AS (SELECT term, COUNT(*) AS df FROM tf
               WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
        scores AS (
          SELECT q.query_id, tf.doc_id,
                 ROUND(SUM(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * ({K1} + 1)
                       / (tf.tf + {K1} * (1 - {B} + {B} * dl.doclen
                                          / stats.avgdl))), 6) AS score
          FROM q JOIN tf USING (term) JOIN df USING (term)
               JOIN dl ON tf.doc_id = dl.doc_id, stats
          GROUP BY 1, 2)
        SELECT query_id, doc_id, score, rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS rank FROM scores)
        WHERE rank <= {K}""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bm25_block_invariance(ray_session, sf_dir):
    """Identical results regardless of how the corpus is partitioned —
    per-batch top-k partials + fan-in must be a pure optimization."""
    outs = []
    for nblocks in (1, 7):
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"],
                             override_num_blocks=nblocks)
        outs.append(canon(to_pandas(
            bm25_search(ds, QUERIES[:2], k=K))))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_bm25_validation(ray_session, sf_dir):
    with pytest.raises(ValueError):
        bm25_search(_docs(sf_dir), [])
    with pytest.raises(ValueError):
        bm25_search(_docs(sf_dir), ["!!! ???"])


def test_tokenize_query():
    assert tokenize_query("The quick, QUICK fox!") == \
        ["the", "quick", "quick", "fox"]
    assert tokenize_query("a1-b2") == ["a1", "b2"]


def test_bm25_tokenless_docs_excluded_from_stats(ray_session, sf_dir):
    """Regression (found by review): docs that produce no tokens (empty /
    punctuation-only / NULL text) must not count in N or avgdl — the SQL
    twin derives both from the tokenized dl relation."""
    import pyarrow as pa
    base = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')").arrow()
    extra = pa.table({"doc_id": pa.array([10**6, 10**6 + 1], pa.int64()),
                      "text": pa.array(["!!! ...", None], pa.string())})
    noisy = rd.from_arrow(pa.concat_tables(
        [base.cast(extra.schema), extra]))
    got = canon(to_pandas(bm25_search(noisy, QUERIES[:1], k=5)))
    want = canon(to_pandas(bm25_search(_docs(sf_dir), QUERIES[:1], k=5)))
    pd.testing.assert_frame_equal(got, want)


def test_tokenizer_unicode_parity_with_duckdb(ray_session):
    """pc.utf8_lower + [^a-z0-9]+ split must equal DuckDB's
    lower + regexp_extract_all on unicode edge cases (Turkish İ,
    ligatures, titlecase digraphs, Cyrillic) — the tokenizer parity every
    text gate rests on."""
    cases = ["Hello WORLD", "İstanbul", "STRASSE ß", "ﬁle FILE",
             "Ångström", "МОСКВА x9", "ǅungla", "a1-B2_c3"]
    t = pa.table({"doc_id": list(range(len(cases))),  # noqa: F841
                  "text": cases})
    got = canon(to_pandas(build_inverted_index(rd.from_arrow(t))))
    want = canon(duckdb.sql("""
        WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(
               lower(text), '[a-z0-9]+')) AS term FROM t),
        dl AS (SELECT doc_id, COUNT(*) AS doclen FROM tok GROUP BY 1)
        SELECT term, tok.doc_id, COUNT(*) AS tf, ANY_VALUE(doclen) AS doclen
        FROM tok JOIN dl ON tok.doc_id = dl.doc_id GROUP BY 1, 2""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bm25_property_random_queries(ray_session, sf_dir):
    """Property: BM25 equals the SQL formula for random query strings
    drawn from (and beyond) the corpus vocabulary, random k/k1/b."""
    from hypothesis import given, settings, strategies as st
    from saber_ray.stages.lm import train_unigram_lm

    vocab = sorted(train_unigram_lm(_docs(sf_dir))["counts"])

    @settings(max_examples=8, deadline=None)
    @given(data=st.data())
    def check(data):
        nq = data.draw(st.integers(min_value=1, max_value=3))
        qs = []
        for _ in range(nq):
            terms = data.draw(st.lists(
                st.one_of(st.sampled_from(vocab),
                          st.just("zz_nohit_zz")),
                min_size=1, max_size=4))
            qs.append(" ".join(terms))
        if not any(tokenize_query(q) for q in qs):
            return
        k = data.draw(st.integers(min_value=1, max_value=12))
        k1 = round(data.draw(st.floats(min_value=0.5, max_value=2.0)), 2)
        b = round(data.draw(st.floats(min_value=0.0, max_value=1.0)), 2)
        got = canon(to_pandas(bm25_search(
            _docs(sf_dir), qs, k=k, k1=k1, b=b)))
        vals = ", ".join(f"({qid}, '{w}')"
                         for qid, q in enumerate(qs)
                         for w in tokenize_query(q))
        want = canon(duckdb.sql(f"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text),
                     '[a-z0-9]+')) AS term
              FROM read_parquet('{sf_dir}/documents.parquet')),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
                   GROUP BY 1, 2),
            dl AS (SELECT doc_id, COUNT(*) AS doclen FROM tok GROUP BY 1),
            stats AS (SELECT COUNT(*) AS n, AVG(doclen) AS avgdl FROM dl),
            q(query_id, term) AS (VALUES {vals}),
            df AS (SELECT term, COUNT(*) AS df FROM tf
                   WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
            scores AS (
              SELECT q.query_id, tf.doc_id,
                     ROUND(SUM(ln(1 + (stats.n - df.df + 0.5)
                                  / (df.df + 0.5))
                           * tf.tf * ({k1} + 1)
                           / (tf.tf + {k1} * (1 - {b} + {b} * dl.doclen
                                              / stats.avgdl))), 6) AS score
              FROM q JOIN tf USING (term) JOIN df USING (term)
                   JOIN dl ON tf.doc_id = dl.doc_id, stats
              GROUP BY 1, 2)
            SELECT query_id, doc_id, score, rank FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id) AS rank FROM scores)
            WHERE rank <= {k}""").df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    check()
