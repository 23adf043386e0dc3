"""Unit tests for the corpus-curation stages (stages/curation.py):
repetition stats, PII redaction, decontamination — each vs a brute-force
pure-Python reference over randomized documents with NULLs, empties and
heavy token repetition, across several partitionings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from saber_ray.stages.curation import (PII_PATTERNS, build_shingle_blocklist,
                                       decontaminate, redact_pii,
                                       repetition_stats)
from saber_ray.sources.parquet import read_table
from tests.oracle_util import assert_matches_oracle

VOCAB = ["a", "bb", "ccc", "dd", "e", ""]


def _docs(rng, n):
    texts = []
    for _ in range(n):
        k = int(rng.integers(0, 8))
        texts.append(None if rng.random() < 0.15
                     else " ".join(rng.choice(VOCAB, k)) if k else "")
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _toks(s):
    return (s or "").split(" ")


def _grams(ws, k):
    return [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]


@pytest.mark.parametrize("seed,parts,k", [(0, 1, 2), (1, 3, 2), (2, 2, 3),
                                          (3, 4, 4)])
def test_repetition_stats_vs_reference(ray_session, seed, parts, k):
    rng = np.random.default_rng(seed)
    t = _docs(rng, 30)
    got = (repetition_stats(rd.from_arrow(t).repartition(parts), "text",
                            ngram=k)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, s in enumerate(t["text"].to_pylist()):
        ws = _toks(s)
        n = len(ws)
        g = _grams(ws, k)
        assert got.loc[i, "n_tokens"] == n
        # engine output is ROUND(x, 6) — allow the half-ulp of that grid
        assert got.loc[i, "dup_word_frac"] == pytest.approx(
            (n - len(set(ws))) / n, abs=5.001e-7)
        assert got.loc[i, "dup_ngram_frac"] == pytest.approx(
            (len(g) - len(set(g))) / max(len(g), 1), abs=5.001e-7)
        assert got.loc[i, "top_word_frac"] == pytest.approx(
            max(ws.count(w) for w in set(ws)) / n, abs=5.001e-7)


def test_redact_pii_fixed_cases(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "mail a@b.io and c.d+e@sub.ex.org",
            "ssn 123-45-6789 card 1111 2222 3333 4444",
            "ph 555-123-4567 or 555.123.4567 ip 192.168.1.254",
            None,
            "clean text no pii 123 456",
        ], pa.string()),
    })
    got = (redact_pii(rd.from_arrow(t).repartition(2), "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["text_redacted"].tolist() == [
        "mail <EMAIL> and <EMAIL>",
        "ssn <SSN> card <CARD>",
        "ph <PHONE> or <PHONE> ip <IP>",
        None,
        "clean text no pii 123 456",
    ]
    assert got["n_pii"].tolist() == [2, 2, 3, 0, 0]


def test_redact_pii_patterns_are_re2_safe():
    """Every shipped pattern must compile under stdlib re (a superset of
    RE2 syntax used here) and contain no RE2-unsupported constructs."""
    import re
    for _name, pat, _tok in PII_PATTERNS:
        re.compile(pat)
        assert "(?<" not in pat and "(?=" not in pat and "(?!" not in pat


@pytest.mark.parametrize("seed,parts", [(0, 1), (1, 3)])
def test_decontaminate_vs_reference(ray_session, seed, parts):
    rng = np.random.default_rng(seed)
    t = _docs(rng, 40)
    texts = t["text"].to_pylist()
    k = 3
    bl_docs = [s for i, s in enumerate(texts) if i % 5 == 0]
    want_bl = set()
    for s in bl_docs:
        want_bl.update(_grams(_toks(s), k))

    bl_t = pa.table({"text": pa.array(bl_docs, pa.string())})
    bl = build_shingle_blocklist(rd.from_arrow(bl_t).repartition(2),
                                 "text", n=k)
    assert set(bl) == want_bl

    got = (decontaminate(rd.from_arrow(t).repartition(parts), bl, "text",
                         n=k)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, s in enumerate(texts):
        sh = set(_grams(_toks(s), k))
        assert got.loc[i, "n_contaminated"] == len(sh & want_bl), i
        assert bool(got.loc[i, "contaminated"]) == bool(sh & want_bl)


def test_repetition_stats_rejects_unigram():
    with pytest.raises(ValueError):
        repetition_stats(None, "text", ngram=1)


def test_normalize_text_vs_duckdb(ray_session, sf_dir):
    """normalize_text == the DuckDB lower/regexp_replace/trim chain with
    the same RE2 patterns, over the documents corpus + synthetic mess."""
    from saber_ray.sources.parquet import read_table
    from saber_ray.stages.curation import normalize_text
    from tests.oracle_util import assert_matches_oracle

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def mess(df):
        out = df.copy()
        out["text"] = ("  A " + out["text"].fillna("") +
                       "\t Mixed,CASE!!  x\n\n")
        return out

    out = normalize_text(docs.map_batches(mess, batch_format="pandas"),
                         "text", strip_punct=True)
    assert_matches_oracle(
        out,
        "SELECT doc_id, trim(regexp_replace(regexp_replace("
        r"lower('  A ' || COALESCE(text, '') || chr(9) || ' Mixed,CASE!!  x' "
        r"|| chr(10) || chr(10)), '[^\w\s]', '', 'g'), '\s+', ' ', 'g'), "
        "' ') AS text FROM documents",
        sf_dir)


def test_normalize_text_null_and_out_col(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.curation import normalize_text
    t = pa.table({"text": pa.array(["  Hi   THERE ", None], pa.string())})
    got = normalize_text(rd.from_arrow(t), "text",
                         out="clean").to_pandas()
    assert got["clean"].tolist() == ["hi there", None]
    assert got["text"].tolist() == ["  Hi   THERE ", None]


SPAN_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
grams AS (
  SELECT doc_id, q, array_to_string(w[q:q+{km1}], ' ') AS g
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, greatest(len(w)-{k}+1, 0))) AS q
        FROM toks)
),
freq AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= {mc}),
hits AS (SELECT doc_id, q FROM grams JOIN freq USING (g)),
pos AS (SELECT doc_id, generate_subscripts(w,1) p, unnest(w) tok FROM toks),
cover AS (SELECT DISTINCT p.doc_id, p.p FROM pos p JOIN hits h
          ON p.doc_id = h.doc_id AND p.p BETWEEN h.q AND h.q + {k} - 1),
kept AS (SELECT pos.doc_id, pos.p, pos.tok FROM pos
         ANTI JOIN cover c ON pos.doc_id = c.doc_id AND pos.p = c.p)
SELECT t.doc_id,
       COALESCE(kt.text, '') AS text,
       COALESCE(cv.n_masked, 0) AS n_masked
FROM toks t
LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text
           FROM kept GROUP BY doc_id) kt USING (doc_id)
LEFT JOIN (SELECT doc_id, COUNT(*) AS n_masked FROM cover
           GROUP BY doc_id) cv USING (doc_id)
"""


def test_mask_repeated_spans(ray_session, sf_dir):
    from saber_ray.stages.curation import mask_repeated_spans
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = mask_repeated_spans(docs, k=5, min_count=2)
    assert_matches_oracle(out, SPAN_ORACLE.format(k=5, km1=4, mc=2), sf_dir)


def test_find_repeated_spans_counts(ray_session, sf_dir):
    from saber_ray.stages.curation import find_repeated_spans
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = find_repeated_spans(docs, k=5, min_count=3)
    assert_matches_oracle(
        out,
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') w "
        "FROM documents) "
        "SELECT array_to_string(w[q:q+4], ' ') AS gram, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM (SELECT doc_id, w, unnest(generate_series(1, "
        "greatest(len(w)-5+1, 0))) AS q FROM toks) "
        "GROUP BY gram HAVING COUNT(*) >= 3",
        sf_dir)


def test_mask_repeated_spans_edges(ray_session):
    """Short docs untouched, a fully-repeated doc masks to '', provided
    spans skip the counting pass, overlapping spans cover the union."""
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.curation import mask_repeated_spans
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d e",          # repeated verbatim in doc 2 -> all masked
            "a b c d e",
            "x y",                # shorter than k -> untouched
            "p a b c d e q",      # contains the span -> middle masked
        ], pa.string()),
    })
    out = mask_repeated_spans(rd.from_arrow(docs), k=5, min_count=2) \
        .to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == ["", "", "x y", "p q"]
    assert out["n_masked"].tolist() == [5, 5, 0, 5]
    # provided spans: no counting pass, same masking kernel
    out2 = mask_repeated_spans(rd.from_arrow(docs), k=5,
                               spans=frozenset(["a b c d e"])) \
        .to_pandas().sort_values("doc_id")
    assert out2["text"].tolist() == out["text"].tolist()
