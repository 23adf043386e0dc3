"""k-means assignment + SemDeDup invariants over the embeddings table."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.cluster import assign_clusters, semdedup, train_kmeans
from saber_ray.stages.similarity import _normalize
from tests.oracle_util import to_pandas


def _emb_ds(sf_dir):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _emb_np(sf_dir):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    x = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    return ids, _normalize(x)


def test_assign_is_exact_argmax(ray_session, sf_dir):
    """Every vector's assignment equals a driver-side numpy argmax
    against the same centroids (the operator is exact, only the
    codebook is trained on a sample)."""
    ds = _emb_ds(sf_dir)
    cents = train_kmeans(ds, 8, train_size=5_000, seed=7)
    assert cents.shape[0] == 8
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    got = to_pandas(assign_clusters(ds, cents)).sort_values("vec_id")
    ids, x = _emb_np(sf_dir)
    order = np.argsort(ids)
    sims = x[order] @ cents.T
    want = sims.argmax(axis=1)
    assert np.array_equal(got["cluster"].to_numpy(), want)
    assert np.allclose(got["centroid_sim"].to_numpy(),
                       sims[np.arange(len(want)), want])


def test_train_kmeans_deterministic(ray_session, sf_dir):
    ds = _emb_ds(sf_dir)
    a = train_kmeans(ds, 5, train_size=2_000, seed=11)
    b = train_kmeans(ds, 5, train_size=2_000, seed=11)
    assert np.array_equal(a, b)
    # more clusters than training rows: clamps, still unit rows
    tiny = rd.from_arrow(pa.table({
        "vec_id": [0, 1, 2],
        "embedding": [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7]]}))
    c = train_kmeans(tiny, 10)
    assert c.shape[0] <= 3


def test_semdedup_invariants(ray_session, sf_dir):
    """Paper-rule invariants: kept items pairwise ≤ eps within a
    cluster; every dropped item is > eps close to an earlier item (the
    order is centroid_sim asc, id asc); eps=1 keeps everything on a
    duplicate-free corpus."""
    eps = 0.9
    out = to_pandas(semdedup(_emb_ds(sf_dir), n_clusters=6, eps=eps,
                             train_size=5_000, seed=3))
    ids, x = _emb_np(sf_dir)
    pos = {int(v): i for i, v in enumerate(ids)}
    assert len(out) == len(ids)                  # one decision per vector
    assert not out["capped"].any()               # under the scale guard
    for cl, grp in out.groupby("cluster"):
        grp = grp.sort_values(["centroid_sim", "vec_id"])
        xs = x[[pos[int(v)] for v in grp["vec_id"]]]
        sims = xs @ xs.T
        keep = grp["keep"].to_numpy()
        tri = np.triu(sims, k=1)
        dropped = ~keep
        if dropped.any():
            assert (tri.max(axis=0)[dropped] > eps).all(), cl
        kept_sims = sims[np.ix_(keep, keep)]
        np.fill_diagonal(kept_sims, 0.0)
        assert (kept_sims <= eps + 1e-12).all(), cl


def test_semdedup_drops_exact_duplicates(ray_session):
    """Injected exact duplicates: exactly one survivor per duplicate
    set, and distinct vectors all survive at a tight eps."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16))
    dup = np.concatenate([base, base[:10] * 2.0])   # scaled = same cosine
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(len(dup))),
        "embedding": [row.tolist() for row in dup]}))
    out = to_pandas(semdedup(ds, n_clusters=4, eps=0.999, seed=2))
    kept = out[out["keep"]]
    # each duplicate pair (i, i+40) keeps exactly one member
    for i in range(10):
        members = kept[kept["vec_id"].isin([i, i + 40])]
        assert len(members) == 1, i
    # non-duplicated vectors survive (random gaussians are far apart)
    assert set(range(10, 40)) <= set(kept["vec_id"])


def test_semdedup_validation(ray_session):
    ds = rd.from_arrow(pa.table({
        "vec_id": [0], "embedding": [[1.0, 0.0]]}))
    with pytest.raises(ValueError, match="eps"):
        semdedup(ds, n_clusters=2, eps=0.0)
    with pytest.raises(ValueError, match="n_clusters"):
        train_kmeans(ds, 0)


def test_cluster_sample_balanced(ray_session, sf_dir):
    """At most k rows per cluster, deterministic, ids come from the
    corpus, and every non-tiny cluster is represented."""
    ds = _emb_ds(sf_dir)
    from saber_ray.stages.cluster import cluster_sample
    a = to_pandas(cluster_sample(ds, n_clusters=6, k_per_cluster=10,
                                 train_size=5_000, seed=13))
    b = to_pandas(cluster_sample(ds, n_clusters=6, k_per_cluster=10,
                                 train_size=5_000, seed=13))
    assert a.sort_values("vec_id").reset_index(drop=True).equals(
        b.sort_values("vec_id").reset_index(drop=True))
    sizes = a.groupby("cluster").size()
    assert (sizes <= 10).all()
    # the full assignment tells us which clusters have >= 10 members
    cents = train_kmeans(ds, 6, train_size=5_000, seed=13)
    full = to_pandas(assign_clusters(ds, cents))
    pop = full.groupby("cluster").size()
    for cl, n in pop.items():
        assert sizes.get(cl, 0) == min(n, 10), cl
    assert set(a["vec_id"]) <= set(full["vec_id"])


def test_semdedup_max_cluster_cap(ray_session, sf_dir):
    """The scale guard: an oversized cluster processes in canonical-order
    chunks — rows flagged capped, exact duplicates still die when they
    land in the same chunk (adjacent in the order), and the chunked run
    never KEEPS a pair the exact run would have dropped... verified as:
    chunked drops ⊆ exact drops."""
    ds = _emb_ds(sf_dir)
    exact = to_pandas(semdedup(ds, n_clusters=2, eps=0.9,
                               train_size=5_000, seed=3)).sort_values(
        "vec_id").reset_index(drop=True)
    chunked = to_pandas(semdedup(ds, n_clusters=2, eps=0.9,
                                 train_size=5_000, seed=3,
                                 max_cluster=40)).sort_values(
        "vec_id").reset_index(drop=True)
    # clusters of 500/2 rows >> 40: every row flagged
    assert chunked["capped"].all()
    assert not exact["capped"].any()
    # chunk-local comparisons see a subset of the exact pairs, so the
    # chunked run can only drop a subset of what the exact run drops
    dropped_chunked = set(chunked.loc[~chunked["keep"], "vec_id"])
    dropped_exact = set(exact.loc[~exact["keep"], "vec_id"])
    assert dropped_chunked <= dropped_exact
    with pytest.raises(ValueError, match="max_cluster"):
        semdedup(ds, n_clusters=2, max_cluster=1)
