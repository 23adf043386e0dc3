"""Dedup + text analysis stage tests (documents table)."""

import numpy as np
import pandas as pd

from saber_ray.sources.parquet import read_table
from saber_ray.stages.dedup import (exact_dedup, minhash_lsh_clusters,
                                    ngram_jaccard, simhash, simhash_near_pairs)
from saber_ray.stages.text import (lang_id, md5_fingerprint, quality_score,
                                   token_stats)
from tests.oracle_util import assert_matches_oracle, canon, to_pandas


def test_exact_dedup(ray_session, sf_dir):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = exact_dedup(docs, on="text", id_col="doc_id")
    assert_matches_oracle(
        out,
        "SELECT d.doc_id, d.text, d.lang FROM documents d "
        "JOIN (SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text) k "
        "ON d.doc_id = k.doc_id",
        sf_dir)


def test_exact_dedup_null_on_raises(ray_session):
    """NULL dedup keys fail loudly instead of grouping by a NaN-cast
    sentinel (ADVICE r2 #4)."""
    import pyarrow as pa
    import pytest
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a", None, "a"], pa.string())})
    with pytest.raises(Exception, match="NULL"):
        exact_dedup(rd.from_arrow(t), on="text",
                    id_col="doc_id").materialize()


def test_token_stats(ray_session, sf_dir):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = token_stats(docs).select_columns(
        ["doc_id", "n_chars", "n_ws_tokens", "n_bpe_tokens"])
    assert_matches_oracle(
        out,
        "SELECT doc_id, LENGTH(text) AS n_chars, "
        "len(string_split(text, ' ')) AS n_ws_tokens, "
        r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens "
        "FROM documents",
        sf_dir)


def test_md5_fingerprint(ray_session, sf_dir):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = md5_fingerprint(docs).select_columns(["doc_id", "fingerprint"])
    assert_matches_oracle(
        out, "SELECT doc_id, md5(text) AS fingerprint FROM documents", sf_dir)


def test_quality_score_deterministic(ray_session, sf_dir):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    a = canon(to_pandas(quality_score(docs)))
    b = canon(to_pandas(quality_score(docs)))
    pd.testing.assert_frame_equal(a, b)
    assert a["quality"].between(0, 1).all()


def test_lang_id_runs(ray_session, sf_dir):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = to_pandas(lang_id(docs))
    assert set(out["lang_pred"]) <= {"en", "es", "fr", "de", "und"}
    assert len(out) == to_pandas(docs).shape[0]


def test_minhash_clusters_finds_exact_dups(ray_session, sf_dir):
    # exact duplicates must land in the same cluster; clustering deterministic
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    cl = to_pandas(minhash_lsh_clusters(docs, threshold=0.9))
    cl2 = to_pandas(minhash_lsh_clusters(docs, threshold=0.9))
    pd.testing.assert_frame_equal(canon(cl), canon(cl2))
    df = to_pandas(docs)
    merged = df.merge(cl, on="doc_id")
    for _, g in merged.groupby("text"):
        if len(g) > 1:
            assert g["cluster_id"].nunique() == 1, "exact dups split across clusters"


def test_simhash_deterministic_and_near_pairs(ray_session, sf_dir):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    f1 = canon(to_pandas(simhash(docs)))
    f2 = canon(to_pandas(simhash(docs)))
    pd.testing.assert_frame_equal(f1, f2)
    pairs = to_pandas(simhash_near_pairs(docs, max_hamming=3))
    if len(pairs):
        assert (pairs["hamming"] <= 3).all()
        assert (pairs["a"] < pairs["b"]).all()
    # exact duplicate texts → identical simhash → hamming 0 pairs present
    df = to_pandas(docs)
    dup_texts = df[df.duplicated("text", keep=False)]
    if len(dup_texts):
        ids = set(map(tuple, pairs[pairs["hamming"] == 0][["a", "b"]].to_numpy()))
        g = dup_texts.groupby("text")["doc_id"].apply(list)
        some = next(iter([v for v in g if len(v) > 1]))
        a, b = sorted(some)[:2]
        assert (a, b) in ids


def test_ngram_jaccard_kernel():
    j = ngram_jaccard(["a b c d", "a b c d"], ["a b c d", "x y z w"], n=2)
    assert j[0] == 1.0 and j[1] == 0.0


def test_winnowing_fingerprint_properties(ray_session, sf_dir):
    """Winnowing sketch: deterministic; identical texts share identical
    sketches; any common fingerprint implies a shared k-gram (no false
    sketch members — every fingerprint is a real k-gram hash minimum)."""
    from saber_ray.stages.text import WinnowingFingerprint, winnowing_fingerprint
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    a = to_pandas(winnowing_fingerprint(docs)).sort_values("doc_id")
    b = to_pandas(winnowing_fingerprint(docs)).sort_values("doc_id")
    for x, y in zip(a["winnow_fp"], b["winnow_fp"]):
        assert list(x) == list(y)
    df = to_pandas(docs)
    merged = df.merge(a[["doc_id", "winnow_fp"]], on="doc_id")
    dup = merged[merged.duplicated("text", keep=False)]
    for _, g in dup.groupby("text"):
        fps = [tuple(v) for v in g["winnow_fp"]]
        assert len(set(fps)) == 1, "identical texts must share the sketch"
    # real containment: recompute ALL k-gram rolling hashes independently;
    # the sketch must equal the set of window minima over them (and hence be
    # a subset of the full hash set) — catches window-bound/indexing bugs
    from numpy.lib.stride_tricks import sliding_window_view
    w = WinnowingFingerprint()
    text = df.iloc[0]["text"]
    sk = set(w._doc(text))
    buf = np.frombuffer(text.lower().encode("utf-8", "ignore"), dtype=np.uint8)
    k = w.k
    base = np.uint64(1000003)
    powers = np.power(base, np.arange(k, dtype=np.uint64), dtype=np.uint64)
    h = np.zeros(len(buf) - k + 1, dtype=np.uint64)
    for i in range(k):
        h += buf[i:len(buf) - k + 1 + i].astype(np.uint64) * powers[k - 1 - i]
    all_hashes = {int(x) for x in h}
    assert sk, "non-trivial doc must produce fingerprints"
    assert sk <= all_hashes, "sketch member that is not a real k-gram hash"
    mins = {int(x) for x in sliding_window_view(h, w.window).min(axis=1)}
    assert sk == mins, "sketch must be exactly the window minima"


def test_winnowing_batch_kernel_equals_per_doc_reference():
    """The flat-buffer batch sketch (bytescan.winnow_sketches) must equal
    the per-document reference kernel bit-for-bit across every edge: empty
    text, len < k, grams < window, duplicates, NULLs, uniform bytes, and
    mixed casing; non-ASCII batches take the per-doc fallback."""
    import pyarrow as pa

    from saber_ray.stages.text import WinnowingFingerprint

    rng = np.random.default_rng(11)
    texts = ["", "ab", "abcdefgh", "abcdefghi", "aaaaaaaaaaaaaaaa",
             "The quick Brown fox JUMPS over the lazy dog"]
    texts += ["".join(rng.choice(list("abc XYZ.,"), n))
              for n in (5, 7, 8, 9, 12, 40, 200, 1000)]
    texts += [texts[5], None]
    w = WinnowingFingerprint()
    got = w(pa.table({"text": pa.array(texts, pa.string())}))
    got = got["winnow_fp"].to_pylist()
    exp = [w._doc(s if s is not None else "") for s in texts]
    for i, (g, e) in enumerate(zip(got, exp)):
        assert list(g) == list(e), (i, texts[i])
    # multi-byte batch routes through the per-doc fallback, same values
    nb = ["héllo wörld abcdefgh" * 3, "plain ascii text here"]
    got2 = w(pa.table({"text": pa.array(nb)}))["winnow_fp"].to_pylist()
    assert [list(x) for x in got2] == [w._doc(s) for s in nb]


PARA_ORACLE = """
WITH paras AS (
  SELECT doc_id, generate_subscripts(ps,1) AS pos, unnest(ps) AS para
  FROM (SELECT doc_id, string_split(text, '{sep}') ps FROM documents)
), occ AS (
  SELECT doc_id, pos, para, trim(para) = '' AS triv FROM paras
), kept AS (
  SELECT doc_id, pos, para FROM (
    SELECT doc_id, pos, para,
           row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) rn
    FROM occ WHERE NOT triv) WHERE rn = 1
  UNION ALL
  SELECT doc_id, pos, para FROM occ WHERE triv
)
SELECT doc_id, string_agg(para, '{sep}' ORDER BY pos) AS text
FROM kept GROUP BY doc_id
"""


def test_dedup_paragraphs(ray_session, sf_dir):
    from saber_ray.stages.dedup import dedup_paragraphs
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_paragraphs(docs, sep=" the ")
    assert_matches_oracle(out, PARA_ORACLE.format(sep=" the "), sf_dir)


def test_dedup_paragraphs_edges(ray_session):
    """Blank/whitespace paragraphs always kept, exact-dup doc collapses,
    trailing separators preserved, a doc can vanish entirely."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.dedup import dedup_paragraphs
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "alpha\nbeta\n\ngamma",       # blank paragraph inside
            "alpha\nbeta\n\ngamma",       # exact dup of doc 1 -> vanishes? no: blank kept
            "beta\ndelta\n",              # dup 'beta', trailing sep -> '' kept
            "   \n\t",                    # whitespace-only paragraphs, all kept
            "gamma",                      # fully duplicated, no trivial -> vanishes
        ], pa.string()),
    })
    out = canon(to_pandas(
        dedup_paragraphs(rd.from_arrow(docs), sep="\n")))
    con = duckdb.connect()
    con.register("documents", docs)
    oracle = canon(con.execute(
        PARA_ORACLE.format(sep=chr(10))
        .replace("'\n'", "chr(10)")).df())
    pd.testing.assert_frame_equal(out, oracle)
    got = dict(zip(out["doc_id"], out["text"]))
    assert got[1] == "alpha\nbeta\n\ngamma"
    assert got[2] == ""                    # only the blank line survived
    assert got[3] == "delta\n"
    assert got[4] == "   \n\t"
    assert 5 not in got


def test_dedup_paragraphs_null_raises(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from saber_ray.stages.dedup import dedup_paragraphs
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a", None], pa.string())})
    with pytest.raises(Exception, match="NULL"):
        dedup_paragraphs(rd.from_arrow(t)).materialize()
