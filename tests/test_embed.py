"""Feature-hashing vectorizer invariants + the text→semdedup composition."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.embed import embed_hashed
from tests.oracle_util import to_pandas


def _vecs(texts, dim=64, ids=None, **kw):
    ids = ids if ids is not None else list(range(len(texts)))
    ds = rd.from_arrow(pa.table({
        "doc_id": ids, "text": pa.array(texts, pa.string())}))
    df = to_pandas(embed_hashed(ds, dim=dim, **kw)).sort_values("doc_id")
    return np.stack(df["embedding"].to_numpy())


def test_embed_bag_of_words_semantics(ray_session):
    """Identical texts map to identical unit vectors; word order and
    case never matter; disjoint vocabularies are (near-)orthogonal."""
    v = _vecs(["the quick brown fox", "THE QUICK brown FOX",
               "fox brown quick the", "zebra xylophone quartz jig",
               "the quick brown fox jumps"])
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0)
    assert np.array_equal(v[0], v[1])       # case-insensitive
    assert np.array_equal(v[0], v[2])       # order-free
    assert abs(float(v[0] @ v[3])) < 0.5    # different words, low cosine
    # one-word edit keeps a high cosine (ideal 4/sqrt(20) ≈ 0.894; hash
    # collisions at dim=64 can shave it — the invariant is "clearly
    # nearer than unrelated text", not the exact value)
    assert float(v[0] @ v[4]) > 0.75


def test_embed_ascii_and_unicode_paths_agree(ray_session):
    """The byte-LUT fast path (all-ASCII batch) and the RE2 fallback
    (batch containing multi-byte text) hash shared rows identically."""
    texts = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"]
    ascii_v = _vecs(texts)
    mixed_v = _vecs(texts + ["naïve café résumé"])   # forces the fallback
    assert np.array_equal(ascii_v, mixed_v[:3])


def test_embed_edge_rows(ray_session):
    """Null / empty / punctuation-only texts become zero vectors;
    a digit-only token is real content (alnum tokenizer)."""
    v = _vecs(["", "?!...", None, "real words here", "?!... 42"])
    assert not v[0].any() and not v[1].any() and not v[2].any()
    assert v[3].any() and v[4].any()
    with pytest.raises(ValueError, match="dim"):
        embed_hashed(rd.from_arrow(pa.table({"doc_id": [0], "text": ["x"]})),
                     dim=1)


def test_embed_feeds_semdedup(ray_session, sf_dir):
    """End-to-end text → hashed embedding → SemDeDup: injected verbatim
    duplicates are dropped, the rest of the corpus survives."""
    import pyarrow.parquet as pq

    from saber_ray.stages.cluster import semdedup
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).slice(0, 400)
    base_n = t.num_rows
    dup = t.slice(0, 25)
    dup = dup.set_column(0, "doc_id",
                         pa.array([i + 10**7 for i in
                                   dup["doc_id"].to_pylist()], pa.int64()))
    corpus = pa.concat_tables([t, dup])
    emb = embed_hashed(rd.from_arrow(corpus), dim=128, id_col="doc_id")
    out = to_pandas(semdedup(emb, n_clusters=5, eps=0.999,
                             id_col="doc_id", seed=9))
    assert len(out) == base_n + 25
    kept = out[out["keep"]]
    orig = dup["doc_id"].to_pylist()
    for did in orig:
        pair = kept[kept["doc_id"].isin([did, did - 10**7])]
        assert len(pair) == 1, did           # one survivor per duplicate
    # non-duplicated docs all survive at the verbatim threshold
    survivors = set(kept["doc_id"])
    for did in t["doc_id"].to_pylist()[25:]:
        assert did in survivors


def test_train_idf_counts_and_weighting(ray_session):
    """IDF: a word in every document gets the minimum weight; df counts
    are exactly per-document dimension hits (verified for a collision-
    free toy vocabulary); idf-weighted embeddings downweight the
    ubiquitous token."""
    import pyarrow.compute as pc

    from saber_ray.core.hashing import hash_column
    from saber_ray.stages.embed import train_idf
    dim = 128
    texts = ["the apple", "the banana", "the cherry", "the the the date"]
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))),
        "text": pa.array(texts, pa.string())}))
    idf = train_idf(ds, dim=dim)
    assert idf.shape == (dim,)
    words = ["the", "apple", "banana", "cherry", "date"]
    h = hash_column(pa.array(words, pa.string()))
    dims = (h % np.uint64(dim)).astype(int)
    assert len(set(dims)) == len(words)     # collision-free toy vocab
    want_df = {"the": 4, "apple": 1, "banana": 1, "cherry": 1, "date": 1}
    for w, d in zip(words, dims):
        expect = np.log(5.0 / (want_df[w] + 1)) + 1.0
        assert abs(idf[d] - expect) < 1e-12, w
    # the ubiquitous word contributes less than the rare one
    v = _vecs(texts, dim=dim, idf=idf)
    d_the, d_apple = dims[0], dims[1]
    assert abs(v[0][d_apple]) > abs(v[0][d_the])
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0)
    with pytest.raises(ValueError, match="idf"):
        embed_hashed(ds, dim=64, idf=idf)   # wrong length


def test_embed_tokens_are_alnum_runs(ray_session):
    """Digit-bearing identifiers are distinguishing content: docs made
    of distinct w0001-style words must NOT embed identically (an
    alpha-only tokenizer collapses them all to 'w'), and the two kernel
    paths agree on digit-bearing text."""
    texts = ["w0001 w0002 w0003", "w0977 w0978 w0979", "v2 api 2024"]
    v = _vecs(texts, dim=128)
    assert float(v[0] @ v[1]) < 0.5            # disjoint words, far apart
    mixed = _vecs(texts + ["café 2024"], dim=128)
    assert np.array_equal(v, mixed[:3])        # path parity with digits
