"""ANN top-k tests: brute-force vs DuckDB list_cosine_similarity oracle;
LSH variant recall vs brute force."""

import numpy as np

from saber_ray.sources.parquet import read_table
from saber_ray.stages.similarity import ann_topk_bruteforce, ann_topk_lsh
from tests.oracle_util import assert_matches_oracle, duck, to_pandas


def _query_vec(sf_dir):
    con = duck(sf_dir)
    q = con.sql("SELECT embedding FROM embeddings WHERE vec_id = 0").fetchone()[0]
    con.close()
    return np.asarray([q], dtype=np.float64)


def test_bruteforce_topk_vs_oracle(ray_session, sf_dir):
    q = _query_vec(sf_dir)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ann_topk_bruteforce(emb, q, k=10)
    qlit = "[" + ",".join(repr(float(x)) for x in q[0]) + "]"
    assert_matches_oracle(
        out,
        f"""
        SELECT 0 AS query_id, vec_id,
               ROUND(list_cosine_similarity(embedding, {qlit}), 6) AS score,
               rank
        FROM (SELECT vec_id, embedding,
                     ROW_NUMBER() OVER (
                        ORDER BY list_cosine_similarity(embedding, {qlit}) DESC,
                                 vec_id) AS rank
              FROM embeddings) t
        WHERE rank <= 10
        """,
        sf_dir, atol=1e-5)


def test_lsh_recall_against_bruteforce(ray_session, sf_dir):
    rng = np.random.default_rng(7)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    d = len(to_pandas(read_table(sf_dir, "embeddings")).iloc[0]["embedding"])
    qs = rng.standard_normal((3, d))
    exact = to_pandas(ann_topk_bruteforce(emb, qs, k=10))
    approx = to_pandas(ann_topk_lsh(emb, qs, k=10, dim=d, nbits=4, probe_hamming=2))
    recalls = []
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    assert np.mean(recalls) >= 0.5, f"LSH recall too low: {recalls}"


def test_embedding_near_dup_lsh_recall(ray_session, sf_dir):
    """LSH pair mining: pairs ⊆ exact pairs (scores are exact cosines) and
    recall ≥ 0.9 at the gate threshold."""
    from saber_ray.stages.similarity import (embedding_near_dup_pairs,
                                             embedding_near_dup_pairs_lsh)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = to_pandas(embedding_near_dup_pairs(emb, threshold=0.35,
                                               method="exact"))
    lsh = to_pandas(embedding_near_dup_pairs_lsh(emb, threshold=0.35))
    exact_set = set(zip(exact["a"], exact["b"]))
    lsh_set = set(zip(lsh["a"], lsh["b"]))
    assert lsh_set <= exact_set, "LSH produced a pair the exact path lacks"
    assert len(exact_set) > 0
    recall = len(lsh_set) / len(exact_set)
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9"
    # scores agree with the exact path on shared pairs
    merged = lsh.merge(exact, on=["a", "b"], suffixes=("_l", "_e"))
    assert (merged["score_l"] == merged["score_e"]).all()


def test_embedding_near_dup_auto_dispatch(ray_session, sf_dir):
    from saber_ray.stages.similarity import embedding_near_dup_pairs
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    small = to_pandas(embedding_near_dup_pairs(emb, threshold=0.35,
                                               method="auto"))
    lsh = to_pandas(embedding_near_dup_pairs(emb, threshold=0.35,
                                             method="auto",
                                             max_exact_rows=1))
    assert len(small) > 0 and len(lsh) > 0


def test_embedding_near_dup_lsh_planted(ray_session):
    """Planted near-dups at threshold 0.9 — the realistic near-dup regime
    (high threshold → long codes, few tables; recall from cheap params)."""
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.similarity import (embedding_near_dup_pairs,
                                             embedding_near_dup_pairs_lsh)
    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16))
    vecs = []
    for b in base:
        for _ in range(3):                    # 3 noisy copies ≈ cosine 0.99
            v = b + 0.05 * rng.standard_normal(16)
            vecs.append(v / np.linalg.norm(v))
    flat = np.concatenate(vecs).astype(np.float64)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.float64()), 16)})
    ds = rd.from_arrow(tbl).repartition(4)
    exact = to_pandas(embedding_near_dup_pairs(ds, threshold=0.9,
                                               method="exact"))
    lsh = to_pandas(embedding_near_dup_pairs_lsh(ds, threshold=0.9))
    exact_set = set(zip(exact["a"], exact["b"]))
    lsh_set = set(zip(lsh["a"], lsh["b"]))
    assert len(exact_set) >= 40
    assert lsh_set <= exact_set
    assert len(lsh_set) / len(exact_set) >= 0.9


def test_ivf_recall_against_bruteforce(ray_session, sf_dir):
    """IVF with nprobe covering most lists must recover >= 0.9 of the
    exact top-10 per query, and be deterministic. (The synthetic corpus
    is near-uniform on the sphere — IVF's worst case, recall tracks
    nprobe/nlist — so queries are corpus vectors and nprobe is high; the
    exactness guarantee is the full-probe test below.)"""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = to_pandas(read_table(sf_dir, "embeddings"))
    qs = np.stack(df["embedding"].iloc[[0, 7, 19]].to_numpy())
    from saber_ray.stages.similarity import ann_topk_ivf
    exact = to_pandas(ann_topk_bruteforce(emb, qs, k=10))
    approx = to_pandas(ann_topk_ivf(emb, qs, k=10, nlist=16, nprobe=12))
    recalls = []
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    assert np.mean(recalls) >= 0.9, f"IVF recall too low: {recalls}"
    again = to_pandas(ann_topk_ivf(emb, qs, k=10, nlist=16, nprobe=12))
    key = ["query_id", "rank"]
    assert approx.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True))


def test_ivf_full_probe_equals_bruteforce(ray_session, sf_dir):
    """nprobe == nlist degrades IVF to exact search — results must equal
    brute force bit-for-bit (same tie policy)."""
    from saber_ray.stages.similarity import ann_topk_ivf
    q = _query_vec(sf_dir)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = to_pandas(ann_topk_bruteforce(emb, q, k=10))
    full = to_pandas(ann_topk_ivf(emb, q, k=10, nlist=8, nprobe=8))
    key = ["query_id", "rank"]
    assert exact.sort_values(key).reset_index(drop=True).equals(
        full.sort_values(key).reset_index(drop=True))


def test_pq_encode_shape_and_determinism(ray_session, sf_dir):
    from saber_ray.stages.similarity import pq_encode, train_pq
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pqm = train_pq(emb, m=16, n_centroids=64, train_size=5000)
    assert pqm["codebooks"].shape[0] == 16
    codes = to_pandas(pq_encode(emb, pqm))
    assert len(codes) == emb.count()
    assert all(len(c) == 16 for c in codes["pq_code"].head(20))
    again = to_pandas(pq_encode(emb, pqm))
    a = codes.sort_values("vec_id").reset_index(drop=True)
    b = again.sort_values("vec_id").reset_index(drop=True)
    assert (a["vec_id"] == b["vec_id"]).all()
    assert all(list(x) == list(y)
               for x, y in zip(a["pq_code"], b["pq_code"]))


def test_pq_adc_self_hit_and_recall(ray_session, sf_dir):
    """Raw ADC: every query's own vector ranks first (self-similarity
    survives quantization); recall@10 on structure-less sphere vectors is
    bounded by code size — assert the measured-floor 0.4, and that
    rerank=exact recovers >= 0.9 with EXACT scores."""
    from saber_ray.stages.similarity import (ann_topk_pq, pq_encode,
                                             train_pq)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = to_pandas(emb)
    queries = np.stack(df["embedding"].head(10).to_numpy())
    own_ids = df["vec_id"].head(10).to_numpy()
    pqm = train_pq(emb, m=16, n_centroids=64, train_size=5000)
    codes = pq_encode(emb, pqm).materialize()

    adc = to_pandas(ann_topk_pq(codes, queries, pqm, k=10))
    first = adc[adc["rank"] == 1].sort_values("query_id")
    assert (first["vec_id"].to_numpy() == own_ids).all()

    exact = to_pandas(ann_topk_bruteforce(emb, queries, k=10))
    rr = to_pandas(ann_topk_pq(codes, queries, pqm, k=10,
                               rerank_ds=emb, shortlist=60))
    rec_adc, rec_rr = [], []
    for qi in range(10):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        rec_adc.append(len(e & set(
            adc[adc["query_id"] == qi]["vec_id"])) / 10)
        rec_rr.append(len(e & set(
            rr[rr["query_id"] == qi]["vec_id"])) / 10)
    assert np.mean(rec_adc) >= 0.4, rec_adc
    assert np.mean(rec_rr) >= 0.9, rec_rr
    # reranked scores are EXACT cosines: equal wherever ids overlap
    m = rr.merge(exact, on=["query_id", "vec_id"], suffixes=("_pq", "_ex"))
    assert np.allclose(m["score_pq"], m["score_ex"])


def test_pq_validation(ray_session, sf_dir):
    import pytest
    from saber_ray.stages.similarity import train_pq
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    with pytest.raises(ValueError):
        train_pq(emb, m=0)
    with pytest.raises(ValueError):
        train_pq(emb, n_centroids=257)
    with pytest.raises(ValueError):
        train_pq(emb, m=7)        # 7 does not divide dim
