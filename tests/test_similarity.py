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
