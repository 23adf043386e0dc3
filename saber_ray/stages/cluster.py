"""Embedding clustering + cluster-scoped semantic dedup (SemDeDup).

``train_kmeans`` / ``assign_clusters`` expose the spherical k-means the
IVF index already trains (stages/similarity.py) as a first-class
operator: fit on a bounded streamed sample, broadcast the centroid
matrix once, assign every vector with one matmul-argmax per batch —
the building block for diversity-aware sampling, cluster-balanced
mixture curation, and per-cluster inspection.

``semdedup`` composes them into the published SemDeDup pipeline (Abbas
et al. 2023, arXiv:2303.09540 — public): semantic near-duplicates are
found WITHIN each k-means cluster only, turning the quadratic
all-pairs cosine problem into k independent (c × c) problems. Per
cluster, items are ordered by similarity-to-centroid ASCENDING (the
paper keeps the LOW-centroid-similarity representative of each
duplicate set) and an item is dropped when any earlier item in that
order is within ``eps`` cosine of it — the paper's triu-max rule,
reproduced exactly.

Scale contract: one centroid-assignment pass (no shuffle), then ONE
sort exchange on ``cluster`` — equal sort keys co-locate per Ray's
sort-boundary semantics (the join/rank/shift invariant), so each block
sees whole clusters. The O(c²) similarity matrix is per cluster:
size ``n_clusters`` so the expected cluster (n / k rows) fits a worker
(the paper uses ~50k clusters at 5B scale for the same reason).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from saber_ray.core.segments import key_change_mask
from saber_ray.stages.dedup import _col_np
from saber_ray.stages.similarity import (_emb_matrix, _kmeans_spherical,
                                         _normalize)


def train_kmeans(emb_ds, n_clusters: int, *, train_size: int = 20_000,
                 iters: int = 10, seed: int = 42,
                 emb_col: str = "embedding") -> np.ndarray:
    """Fit a spherical k-means codebook on the first ``train_size``
    rows streamed to the driver (bounded — the corpus never
    materializes) and return the (n_clusters × d) centroid matrix,
    rows unit-normalized. Deterministic for a given seed."""
    if n_clusters < 1:
        raise ValueError("n_clusters must be >= 1")
    chunks, total = [], 0
    for b in emb_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        if b.num_rows == 0:
            continue
        chunks.append(_emb_matrix(b, emb_col))
        total += len(chunks[-1])
        if total >= train_size:
            break
    if not chunks:
        raise ValueError("cannot train k-means on an empty corpus")
    train = np.concatenate(chunks)[:train_size]
    return _kmeans_spherical(train, n_clusters, iters=iters, seed=seed)


class _Assigner:
    """Per batch: one matmul-argmax against the broadcast centroids."""

    def __init__(self, cent_ref, id_col: str, emb_col: str, keep):
        # hold the REF; resolve lazily in the worker so the (k, d) matrix
        # travels once via the object store, not pickled into the fn
        self._ref = cent_ref
        self.c = None                     # (k, d), unit rows, on first call
        self.id_col, self.emb_col = id_col, emb_col
        self.keep = keep

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.c is None:
            self.c = ray.get(self._ref)
        fields = [(self.id_col, t.schema.field(self.id_col).type)] + \
            [(c, t.schema.field(c).type) for c in self.keep] + \
            [("cluster", pa.int32()), ("centroid_sim", pa.float64())]
        schema = pa.schema(fields)
        if t.num_rows == 0:
            return schema.empty_table()
        x = _normalize(_emb_matrix(t, self.emb_col))
        sims = x @ self.c.T
        a = sims.argmax(axis=1)
        cols = [t[self.id_col]] + [t[c] for c in self.keep] + \
            [pa.array(a.astype(np.int32)),
             pa.array(sims[np.arange(len(a)), a])]
        return pa.Table.from_arrays(
            [(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
             for c in cols], schema=schema)


def assign_clusters(emb_ds, centroids: np.ndarray, *,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    keep: Optional[list] = None):
    """Assign every vector to its nearest (cosine) centroid: one
    broadcast of the centroid matrix (``ray.put`` once, read per
    actor), one matmul-argmax per batch, no shuffle. Output:
    (``id_col``, *keep, cluster int32, centroid_sim float64)."""
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    cent_ref = ray.put(cent)
    keep = list(keep) if keep else []
    return emb_ds.map_batches(
        _Assigner(cent_ref, id_col, emb_col, keep),
        batch_format="pyarrow", zero_copy_batch=True)


def semdedup(emb_ds, *, n_clusters: int, eps: float = 0.95,
             train_size: int = 20_000, iters: int = 10, seed: int = 42,
             max_cluster: int = 4096,
             id_col: str = "vec_id", emb_col: str = "embedding"):
    """SemDeDup (Abbas et al. 2023): k-means the embeddings, then drop
    semantic near-duplicates WITHIN each cluster.

    Per cluster, order items by (centroid_sim ASC, id ASC) — the kept
    representative of a duplicate set is the one FARTHEST from the
    centroid, the paper's choice — and drop an item when any EARLIER
    item is within ``eps`` cosine (max-over-triu rule). Output: one row
    per vector — (``id_col``, cluster, centroid_sim, capped bool, keep
    bool); filter ``keep`` for the deduplicated corpus.

    ``max_cluster`` is the scale guard (the minhash ``max_bucket``
    precedent): a cluster the quantizer failed to split — corpora
    without cluster structure collapse into one — would otherwise
    allocate an O(c²) similarity matrix (100 k rows ≈ 80 GB). Oversized
    clusters are processed in consecutive ``max_cluster``-row chunks of
    the SAME canonical order, comparisons confined to each chunk; those
    rows carry ``capped = True`` (duplicates spanning chunks of such a
    cluster can be missed — size ``n_clusters`` ≈ corpus / a few
    thousand so clusters stay under the cap and ``capped`` stays
    all-False). Clusters at or under the cap are exact.

    Invariants (pytest-verified): kept items in an uncapped cluster are
    pairwise ≤ eps apart; every dropped item is > eps close to an
    earlier-order item of its cluster (chunk); exact duplicates keep
    exactly one.
    """
    if not (0.0 < eps <= 1.0):
        raise ValueError("eps must be in (0, 1]")
    if max_cluster < 2:
        raise ValueError("max_cluster must be >= 2")
    cents = train_kmeans(emb_ds, n_clusters, train_size=train_size,
                         iters=iters, seed=seed, emb_col=emb_col)
    assigned = assign_clusters(emb_ds, cents, id_col=id_col,
                               emb_col=emb_col, keep=[emb_col])

    def per_block(g: pa.Table) -> pa.Table:
        schema = pa.schema([(id_col, g.schema.field(id_col).type),
                            ("cluster", pa.int32()),
                            ("centroid_sim", pa.float64()),
                            ("capped", pa.bool_()),
                            ("keep", pa.bool_())])
        if g.num_rows == 0:
            return schema.empty_table()
        order = pc.sort_indices(g, sort_keys=[
            ("cluster", "ascending"), ("centroid_sim", "ascending"),
            (id_col, "ascending")])
        g = g.take(order).combine_chunks()
        x = _normalize(_emb_matrix(g, emb_col))
        starts = np.flatnonzero(key_change_mask(g, ["cluster"]))
        bounds = np.append(starts, g.num_rows)
        keep = np.ones(g.num_rows, dtype=bool)
        capped = np.zeros(g.num_rows, dtype=bool)
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            if hi - lo < 2:
                continue
            if hi - lo > max_cluster:
                capped[lo:hi] = True
            for clo in range(lo, hi, max_cluster):
                chi = min(clo + max_cluster, hi)
                if chi - clo < 2:
                    continue
                xs = x[clo:chi]
                sims = xs @ xs.T
                # max similarity to any EARLIER item in the order
                # (strict upper triangle read column-wise)
                tri = np.triu(sims, k=1)
                keep[clo:chi] = tri.max(axis=0) <= eps
        return pa.Table.from_arrays(
            [g[id_col].combine_chunks(), g["cluster"].combine_chunks(),
             g["centroid_sim"].combine_chunks(), pa.array(capped),
             pa.array(keep)],
            schema=schema)

    # ONE sort exchange on the cluster id co-locates each cluster whole
    return assigned.sort("cluster").map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True)


def cluster_sample(emb_ds, *, n_clusters: int, k_per_cluster: int,
                   train_size: int = 20_000, iters: int = 10,
                   seed: int = 42, id_col: str = "vec_id",
                   emb_col: str = "embedding", salt: int = 0):
    """Diversity-aware sampling: k uniform picks PER k-means cluster
    (the cluster-balanced analogue of per-language/per-source
    stratified sampling — a small cluster contributes as many examples
    as a dominant one). Composes ``assign_clusters`` with the engine's
    deterministic ``stratified_sample`` on the cluster id; output is
    (``id_col``, cluster, centroid_sim). One assignment pass + the
    stratified sampler's single ≤-k-rows-per-(block, cluster) exchange.
    """
    from saber_ray.stages.sample import stratified_sample
    if k_per_cluster < 1:
        raise ValueError("k_per_cluster must be >= 1")
    cents = train_kmeans(emb_ds, n_clusters, train_size=train_size,
                         iters=iters, seed=seed, emb_col=emb_col)
    assigned = assign_clusters(emb_ds, cents, id_col=id_col,
                               emb_col=emb_col)
    return stratified_sample(assigned, ["cluster"], id_col,
                             k_per_cluster, salt=salt)
