"""Similarity search over an embedding column (list<float>).

Scale extensions (absent from the reference — SURVEY.md §2.7):

- brute-force cosine top-k: the query matrix is broadcast ONCE (`ray.put`),
  each batch computes a numpy matmul and emits only its per-query top-k
  partials; a tiny groupby(query_id) merge re-selects global top-k. The
  shuffle carries q×k rows per batch, never the embeddings.
- LSH-bucketed variant (the scale path): seeded random hyperplanes assign
  each vector a bucket (sign bits); queries probe their own bucket plus all
  Hamming≤1 neighbors, so only ~ (1+nbits)/2^nbits of the corpus is scored.
  Deterministic (no training pass), trivially shardable — the documented
  recall/efficiency trade.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import ray

from saber_ray.stages.dedup import _col_np


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


from functools import lru_cache


@lru_cache(maxsize=4)
def _cached_scorer(cls, kwargs_items):
    # BOUNDED: each entry may hold resolved broadcast state (e.g. a full
    # corpus matrix) and pins its ObjectRefs — unbounded caching across
    # calls would leak one matrix per call per worker process
    return cls(**dict(kwargs_items))


def _apply_scorer(ds, cls, kwargs: dict, concurrency):
    """Run a scorer stage. Default (concurrency=None) = plain TASKS with
    the scorer built once per worker process (lru_cache — constructor
    kwargs are hashable: ObjectRefs + scalars), so parallelism scales to
    every core instead of an actor-pool cap. concurrency=(lo, hi) pins an
    actor pool (for genuinely expensive per-actor setup)."""
    if concurrency is None:
        items = tuple(sorted(kwargs.items()))
        return ds.map_batches(
            lambda t, _c=cls, _k=items: _cached_scorer(_c, _k)(t),
            batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(cls, batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=concurrency, num_cpus=0.5,
                          fn_constructor_kwargs=kwargs)


def _pairs_schema(id_col: str):
    import pyarrow as pa
    return pa.schema([("query_id", pa.int64()), (id_col, pa.int64()),
                      ("score", pa.float64())])


class _BruteForceScorer:
    def __init__(self, q_ref, k: int, id_col: str, emb_col: str):
        q = ray.get(q_ref)
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k, self.id_col, self.emb_col = k, id_col, emb_col

    def __call__(self, t):
        import pyarrow as pa
        if t.num_rows == 0:
            return _pairs_schema(self.id_col).empty_table()
        x = _normalize(_emb_matrix(t, self.emb_col))
        ids = _col_np(t, self.id_col)
        scores = self.q @ x.T                      # (q, n)
        nq = scores.shape[0]
        k = min(self.k, scores.shape[1])
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]   # (q, k)
        qid = np.repeat(np.arange(nq, dtype=np.int64), k)
        return pa.table({"query_id": qid,
                         self.id_col: ids[part.ravel()],
                         "score": scores[np.arange(nq)[:, None], part].ravel()},
                        schema=_pairs_schema(self.id_col))


def _topk_fanin(partials, k: int, id_col: str,
                round_decimals: Optional[int],
                seed_schema=None):
    """Global per-query top-k from per-block partials: ONE fan-in task
    (partials are ≤ #blocks × q × k rows — a groupby shuffle here would
    move less data than its own setup costs), then one vectorized pass:
    sort_indices by (query_id, score desc, id), run-position rank, keep
    rank <= k. Replaces the r3 ``groupby().map_groups(pandas)`` merge —
    no pandas, no exchange (VERDICT r3 #8).

    ``seed_schema`` (default ``_pairs_schema(id_col)``): a typed EMPTY
    block unioned into the fan-in — Ray 2.49's repartition of all-empty
    blocks emits ZERO blocks, which erases the result schema when no
    document matches any query (the empty-Dataset quirk family)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    out_seed = (seed_schema or _pairs_schema(id_col)).append(
        pa.field("rank", pa.int64()))

    def merge(t: pa.Table) -> pa.Table:
        out_schema = t.schema.append(pa.field("rank", pa.int64()))
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("query_id", "ascending"), ("score", "descending"),
            (id_col, "ascending")])).combine_chunks()
        qid = t["query_id"].to_numpy(zero_copy_only=False)
        idx = np.arange(t.num_rows, dtype=np.int64)
        chg = np.ones(t.num_rows, dtype=bool)
        chg[1:] = qid[1:] != qid[:-1]
        pos = idx - np.maximum.accumulate(np.where(chg, idx, 0))
        keep = pos < k
        t = t.filter(pa.array(keep))
        if round_decimals is not None:
            from saber_ray.core.aggregates import round_oracle_np
            t = t.set_column(
                t.schema.get_field_index("score"), "score",
                pa.array(round_oracle_np(
                    t["score"].to_numpy(zero_copy_only=False)
                    .astype(np.float64), round_decimals)))
        return t.append_column("rank",
                               pa.array(pos[keep] + 1, type=pa.int64()))

    # union a typed empty block AFTER the fan-in: repartition(1) of
    # all-empty inputs emits ZERO blocks on this Ray version, erasing the
    # result schema when nothing matched
    return partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", zero_copy_batch=True) \
        .union(rd.from_arrow(out_seed.empty_table()))


def ann_topk_bruteforce(emb_ds, queries: np.ndarray, k: int = 10, *,
                        id_col: str = "vec_id", emb_col: str = "embedding",
                        round_decimals: Optional[int] = 6,
                        concurrency=None):
    """Exact cosine top-k per query row of ``queries`` (q×d).

    → Dataset (query_id, vec_id, score, rank) with deterministic ties
    (score desc, then id asc)."""
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = _apply_scorer(
        emb_ds, _BruteForceScorer,
        dict(q_ref=q_ref, k=k, id_col=id_col, emb_col=emb_col), concurrency)
    return _topk_fanin(partials, k, id_col, round_decimals)


class _LshScorer:
    """Score only vectors whose hyperplane bucket is within Hamming ≤ 1 of a
    query's bucket."""

    def __init__(self, q_ref, planes_ref, k, id_col, emb_col, probe_hamming=1):
        self.q = _normalize(np.asarray(ray.get(q_ref), dtype=np.float64))
        self.planes = ray.get(planes_ref)          # (nbits, d)
        self.k, self.id_col, self.emb_col = k, id_col, emb_col
        qb = (self.q @ self.planes.T) > 0
        self.qbuckets = (qb @ (1 << np.arange(qb.shape[1]))).astype(np.int64)
        nbits = self.planes.shape[0]
        # probe set per query: all buckets within Hamming ≤ probe_hamming
        all_b = np.arange(1 << nbits)
        pop = np.array([bin(x).count("1") for x in range(1 << nbits)])
        self.probes = [all_b[pop[all_b ^ b] <= probe_hamming]
                       for b in self.qbuckets]

    def __call__(self, t):
        import pyarrow as pa
        schema = _pairs_schema(self.id_col)
        if t.num_rows == 0:
            return schema.empty_table()
        x = _normalize(_emb_matrix(t, self.emb_col))
        ids = _col_np(t, self.id_col)
        xb = (x @ self.planes.T) > 0
        xbuckets = (xb @ (1 << np.arange(xb.shape[1]))).astype(np.int64)
        out_q, out_id, out_s = [], [], []
        # loop over QUERIES (a handful), never over rows
        for qi in range(self.q.shape[0]):
            mask = np.isin(xbuckets, self.probes[qi])
            if not mask.any():
                continue
            sub = x[mask]
            scores = sub @ self.q[qi]
            k = min(self.k, len(scores))
            sel = np.argpartition(-scores, k - 1)[:k]
            out_q.append(np.full(k, qi, dtype=np.int64))
            out_id.append(ids[mask][sel])
            out_s.append(scores[sel])
        if not out_q:
            return schema.empty_table()
        return pa.table({"query_id": np.concatenate(out_q),
                         self.id_col: np.concatenate(out_id),
                         "score": np.concatenate(out_s)}, schema=schema)


class _NearDupScorer:
    """Per-batch rows × broadcast full matrix cosine; emits pairs ≥ threshold.

    Exact (oracle-checkable) embedding near-dup: the corpus matrix ships to
    the object store ONCE; each batch computes a vectorized matmul against it
    and keeps only (a < b, score ≥ threshold) pairs. O(n²/B) per batch — the
    exact baseline; ``ann_topk_lsh``'s bucketing is the same trade applied to
    this stage at scale (score only same/adjacent LSH buckets).
    """

    def __init__(self, mat_ref, ids_ref, threshold, id_col, emb_col,
                 round_decimals):
        self.mat = _normalize(ray.get(mat_ref))        # (n, d), corpus order
        self.ids = ray.get(ids_ref)                    # (n,)
        self.threshold = threshold
        self.id_col, self.emb_col = id_col, emb_col
        self.round_decimals = round_decimals

    def __call__(self, t):
        import pyarrow as pa
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("score", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        x = _normalize(_emb_matrix(t, self.emb_col))
        xi = _col_np(t, self.id_col)
        scores = x @ self.mat.T                        # (batch, n)
        bi, cj = np.nonzero(scores >= self.threshold)
        if len(bi) == 0:
            return schema.empty_table()
        a, b = xi[bi], self.ids[cj]
        keep = a < b                                   # each pair once, a < b
        if not keep.any():
            return schema.empty_table()
        s = scores[bi[keep], cj[keep]]
        if self.round_decimals is not None:
            from saber_ray.core.aggregates import round_oracle_np
            s = round_oracle_np(np.asarray(s, dtype=np.float64),
                                self.round_decimals)
        return pa.table({"a": a[keep], "b": b[keep], "score": s},
                        schema=schema)


def embedding_near_dup_pairs(emb_ds, *, threshold: float = 0.95,
                             id_col: str = "vec_id", emb_col: str = "embedding",
                             round_decimals: Optional[int] = 6,
                             concurrency=None, method: str = "auto",
                             lsh_kwargs: Optional[dict] = None,
                             max_exact_rows: int = 200_000):
    """Cosine near-duplicate pairs (a < b, score ≥ threshold).

    ``method="exact"``: the corpus matrix is broadcast once via ray.put and
    every batch matmuls against it — O(n²) compute, O(n·d) per-worker memory;
    exact and oracle-checkable, right for corpora whose (n, d) matrix fits a
    worker's heap. ``method="lsh"``: the scale path — LSH-bucketed pair
    mining (``embedding_near_dup_pairs_lsh``), near-linear, recall < 1.
    ``method="auto"`` picks exact below ``max_exact_rows`` rows (count comes
    from parquet metadata — no scan), lsh above."""
    if method == "auto":
        method = "exact" if emb_ds.count() <= max_exact_rows else "lsh"
    if method == "lsh":
        return embedding_near_dup_pairs_lsh(
            emb_ds, threshold=threshold, id_col=id_col, emb_col=emb_col,
            round_decimals=round_decimals, **(lsh_kwargs or {}))
    import pyarrow as pa
    flat = pa.concat_tables(
        ray.get(emb_ds.select_columns([id_col, emb_col]).to_arrow_refs()))
    mat_ref = ray.put(_emb_matrix(flat, emb_col))
    ids_ref = ray.put(_col_np(flat, id_col))
    return _apply_scorer(
        emb_ds, _NearDupScorer,
        dict(mat_ref=mat_ref, ids_ref=ids_ref, threshold=threshold,
             id_col=id_col, emb_col=emb_col, round_decimals=round_decimals),
        concurrency)


def _emb_matrix(t, emb_col: str) -> np.ndarray:
    """Arrow list/tensor embedding column → (n, d) float64 matrix."""
    import pyarrow as pa
    col = t[emb_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        m = np.asarray(col.to_numpy(zero_copy_only=False))
    except (pa.ArrowNotImplementedError, ValueError):
        m = np.asarray(col.to_pylist())
    if m.dtype == object:
        m = np.stack(m)
    return m.reshape(t.num_rows, -1).astype(np.float64)


def lsh_params_for(threshold: float, target_recall: float = 0.95
                   ) -> tuple[int, int]:
    """(nbits, ntables) for random-hyperplane LSH at a cosine threshold.

    Per-hyperplane collision probability for a pair at angle θ is
    ``p_bit = 1 - θ/π`` (Goemans-Williamson / Charikar). nbits is sized so a
    table collides on a threshold pair with probability ≈ 0.2 (few false
    candidates), then ntables so ``1 - (1 - p_table)^ntables ≥ target``.
    High thresholds → long codes, few tables (cheap); low thresholds make
    LSH inherently expensive — the knobs make that trade explicit."""
    import math
    # clamp away from p_bit=1 (threshold→1.0 would divide by log(1)=0) and
    # cap codes at 62 bits — the bucket id is built by int64 bit shifts
    p_bit = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    p_bit = min(p_bit, 1.0 - 1e-9)
    nbits = min(62, max(1, round(math.log(0.2) / math.log(p_bit))))
    p_table = p_bit ** nbits
    ntables = max(1, math.ceil(math.log(1.0 - target_recall)
                               / math.log(1.0 - p_table)))
    return nbits, ntables


def embedding_near_dup_pairs_lsh(emb_ds, *, threshold: float = 0.95,
                                 id_col: str = "vec_id",
                                 emb_col: str = "embedding",
                                 ntables: Optional[int] = None,
                                 nbits: Optional[int] = None,
                                 target_recall: float = 0.95,
                                 seed: int = 42,
                                 round_decimals: Optional[int] = 6):
    """LSH-bucketed near-dup PAIR mining — the 100 TB path (VERDICT r1 #4).

    ``ntables`` independent random-hyperplane tables of ``nbits`` each
    (auto-derived from ``threshold``/``target_recall`` via lsh_params_for
    when not given); a pair is a candidate when it shares a bucket in ANY
    table (P[same bucket per table] = (1 - θ/π)^nbits with θ the pair's
    angle — high-cosine pairs collide with high probability; ntables drives
    recall). Per table the corpus shuffles ONCE by (table, bucket) — sort
    range exchange, equal buckets co-locate — then each block scores ALL its
    buckets with one in-bucket matmul per run and keeps (a < b, score ≥
    threshold). Same-pair hits from multiple tables dedup via a final sort +
    first-of-run. Total compute ≈ Σ_bucket m² ≪ n²; no full-corpus
    broadcast, no driver materialization. Pairs ⊆ exact pairs (scores are
    exact cosines); recall asserted ≥ 0.9 in pytest against the exact path."""
    import pyarrow as pa
    from saber_ray.stages.dedup import _dedup_pairs, _runs, _col_np

    if nbits is None or ntables is None:
        auto_bits, auto_tables = lsh_params_for(threshold, target_recall)
        nbits = nbits if nbits is not None else auto_bits
        ntables = ntables if ntables is not None else auto_tables

    def explode(t: pa.Table) -> pa.Table:
        # planes derived from the fixed seed in every task (deterministic,
        # no broadcast needed — they are (ntables*nbits*d) floats)
        x = _emb_matrix(t, emb_col)
        n, d = x.shape
        g = np.random.default_rng(seed)
        ids = _col_np(t, id_col)
        parts = {"table_id": [], "bucket": [], id_col: [], "emb": []}
        xn = _normalize(x)
        for l in range(ntables):
            pl = g.standard_normal((nbits, d))
            bits = (xn @ pl.T) > 0
            bucket = (bits @ (1 << np.arange(nbits))).astype(np.int64)
            parts["table_id"].append(np.full(n, l, dtype=np.int64))
            parts["bucket"].append(bucket)
            parts[id_col].append(ids)
            parts["emb"].append(xn)
        out = pa.table({
            "table_id": np.concatenate(parts["table_id"]),
            "bucket": np.concatenate(parts["bucket"]),
            id_col: np.concatenate(parts[id_col]),
            "emb": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(parts["emb"]).ravel(),
                         type=pa.float64()), d),
        })
        return out

    def block_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if t.num_rows < 2:
            return empty
        t = t.combine_chunks()
        # in-block (bucket, id) order; the shuffle sorts by bucket key ONLY —
        # a sort key including the unique id would let a bucket split across
        # block boundaries (Ray co-locates equal full sort tuples, not
        # prefixes)
        t = t.take(pa.array(np.lexsort((
            _col_np(t, id_col), _col_np(t, "bucket"),
            _col_np(t, "table_id")))))
        tid = _col_np(t, "table_id")
        bkt = _col_np(t, "bucket")
        ids = _col_np(t, id_col)
        x = _emb_matrix(t, "emb")            # already normalized
        starts, ends = _runs(tid, bkt)
        out_a, out_b, out_s = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            sub = x[s:e]
            scores = sub @ sub.T
            ii, jj = np.triu_indices(m, k=1)
            sc = scores[ii, jj]
            keep = sc >= threshold
            if not keep.any():
                continue
            a, b = ids[s + ii[keep]], ids[s + jj[keep]]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
            out_s.append(sc[keep])
        if not out_a:
            return empty
        s = np.concatenate(out_s)
        if round_decimals is not None:
            from saber_ray.core.aggregates import round_oracle_np
            s = round_oracle_np(s, round_decimals)
        return pa.table({"a": np.concatenate(out_a),
                         "b": np.concatenate(out_b), "score": s})

    raw = emb_ds.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .sort(["table_id", "bucket"]) \
        .map_batches(block_pairs, batch_format="pyarrow", zero_copy_batch=True)
    return _dedup_pairs(raw)


def ann_topk_lsh(emb_ds, queries: np.ndarray, k: int = 10, *, dim: int,
                 nbits: int = 6, probe_hamming: int = 1, seed: int = 42,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 round_decimals: Optional[int] = 6, concurrency=None):
    """Approximate cosine top-k via random-hyperplane LSH.

    ``probe_hamming`` trades recall for work: fraction of corpus scored ≈
    C(nbits, ≤probe_hamming)/2^nbits."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim))
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    p_ref = ray.put(planes)
    partials = _apply_scorer(
        emb_ds, _LshScorer,
        dict(q_ref=q_ref, planes_ref=p_ref, k=k, id_col=id_col,
             emb_col=emb_col, probe_hamming=probe_hamming), concurrency)
    return _topk_fanin(partials, k, id_col, round_decimals)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the learned-partition scale path
# ---------------------------------------------------------------------------

def _kmeans_spherical(x: np.ndarray, nlist: int, *, iters: int = 10,
                      seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd, cosine assignment) on a
    normalized sample — the IVF coarse quantizer. Pure numpy; empty
    clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(x, dtype=np.float64))
    nlist = min(nlist, len(x))
    c = x[rng.choice(len(x), size=nlist, replace=False)].copy()
    for _ in range(iters):
        a = (x @ c.T).argmax(axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, a, x)
        counts = np.bincount(a, minlength=nlist)
        newc = sums / np.maximum(counts, 1)[:, None]
        newc[counts == 0] = c[counts == 0]
        c = _normalize(newc)
    return c


class _IvfScorer:
    """Score only vectors whose nearest centroid is among a query's
    ``nprobe`` closest lists — same shape as _LshScorer with learned
    partitions instead of random hyperplanes."""

    def __init__(self, q_ref, cent_ref, k, nprobe, id_col, emb_col):
        self.q = _normalize(np.asarray(ray.get(q_ref), dtype=np.float64))
        self.c = ray.get(cent_ref)                    # (nlist, d)
        self.k, self.id_col, self.emb_col = k, id_col, emb_col
        nprobe = min(nprobe, self.c.shape[0])
        qc = self.q @ self.c.T                        # (q, nlist)
        self.probes = np.argpartition(-qc, nprobe - 1,
                                      axis=1)[:, :nprobe]

    def __call__(self, t):
        import pyarrow as pa
        schema = _pairs_schema(self.id_col)
        if t.num_rows == 0:
            return schema.empty_table()
        x = _normalize(_emb_matrix(t, self.emb_col))
        ids = _col_np(t, self.id_col)
        assign = (x @ self.c.T).argmax(axis=1)        # IVF list per vector
        out_q, out_id, out_s = [], [], []
        for qi in range(self.q.shape[0]):             # queries, never rows
            mask = np.isin(assign, self.probes[qi])
            if not mask.any():
                continue
            scores = x[mask] @ self.q[qi]
            k = min(self.k, len(scores))
            sel = np.argpartition(-scores, k - 1)[:k]
            out_q.append(np.full(k, qi, dtype=np.int64))
            out_id.append(ids[mask][sel])
            out_s.append(scores[sel])
        if not out_q:
            return schema.empty_table()
        return pa.table({"query_id": np.concatenate(out_q),
                         self.id_col: np.concatenate(out_id),
                         "score": np.concatenate(out_s)}, schema=schema)


def ann_topk_ivf(emb_ds, queries: np.ndarray, k: int = 10, *,
                 nlist: int = 16, nprobe: int = 4, train_size: int = 20_000,
                 iters: int = 10, seed: int = 42, id_col: str = "vec_id",
                 emb_col: str = "embedding",
                 round_decimals: Optional[int] = 6, concurrency=None):
    """Approximate cosine top-k via an IVF index (coarse k-means
    quantizer + per-query nprobe list probing).

    Train: the quantizer fits on the FIRST ``train_size`` rows streamed to
    the driver (deterministic, one early-stopped pass — the corpus never
    materializes); size ``nlist`` ~ sqrt(corpus) at scale. Search: the
    (nlist × d) centroid matrix broadcasts once via ``ray.put``; each batch
    assigns its vectors with one matmul-argmax and scores only the
    ~nprobe/nlist fraction a query probes. Same q×k-rows-per-batch fan-in
    as the brute/LSH paths. Recall/work trade is nprobe/nlist (pytest
    asserts recall ≥ 0.9 vs brute force on the gate corpus).
    """
    if nlist < 1 or nprobe < 1:
        raise ValueError("nlist and nprobe must be >= 1")
    chunks, total = [], 0
    for b in emb_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        if b.num_rows == 0:
            continue
        chunks.append(_emb_matrix(b, emb_col))
        total += len(chunks[-1])
        if total >= train_size:
            break
    if not chunks:
        raise ValueError("cannot train the IVF quantizer on an empty corpus")
    train = np.concatenate(chunks)[:train_size]
    cents = _kmeans_spherical(train, nlist, iters=iters, seed=seed)
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    c_ref = ray.put(cents)
    partials = _apply_scorer(
        emb_ds, _IvfScorer,
        dict(q_ref=q_ref, cent_ref=c_ref, k=k, nprobe=nprobe,
             id_col=id_col, emb_col=emb_col), concurrency)
    return _topk_fanin(partials, k, id_col, round_decimals)


def _kmeans_l2(x: np.ndarray, ncent: int, *, iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic plain-L2 Lloyd on a sample — the PQ sub-space
    quantizer (sub-vectors are NOT unit vectors, so spherical assignment
    would be wrong here). Empty clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    x = np.asarray(x, dtype=np.float64)
    ncent = min(ncent, len(x))
    c = x[rng.choice(len(x), size=ncent, replace=False)].copy()
    for _ in range(iters):
        # argmin ||x - c||^2 == argmax (x.c - ||c||^2/2)
        a = (x @ c.T - 0.5 * (c * c).sum(axis=1)).argmax(axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, a, x)
        counts = np.bincount(a, minlength=ncent)
        newc = sums / np.maximum(counts, 1)[:, None]
        newc[counts == 0] = c[counts == 0]
        c = newc
    return c


def train_pq(emb_ds, *, m: int = 8, n_centroids: int = 256,
             train_size: int = 20_000, iters: int = 10, seed: int = 42,
             emb_col: str = "embedding") -> dict:
    """Train a product quantizer (Jegou, Douze & Schmid, "Product
    Quantization for Nearest Neighbor Search", IEEE TPAMI 2011 — the
    public algorithm): vectors are L2-normalized (cosine via
    inner product), split into ``m`` contiguous sub-spaces, and each
    sub-space gets its own ``n_centroids``-entry L2 codebook. Training
    streams the first ``train_size`` rows to the driver (bounded, the
    corpus never materializes — the IVF trainer's contract). Returns
    ``{"codebooks": (m, n_centroids, d/m) float64, "dim": d, "m": m}``.

    At 100 TB the point is COMPRESSION: a d=1024 float32 vector (4 KiB)
    becomes m uint8 codes (m bytes, e.g. 64 B at m=64) — the encoded
    corpus fits two orders of magnitude more vectors per node, and ADC
    search never touches the raw vectors."""
    if m < 1 or n_centroids < 1 or n_centroids > 256:
        raise ValueError("need m >= 1 and 1 <= n_centroids <= 256 "
                         "(codes are uint8)")
    chunks, total = [], 0
    for b in emb_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        if b.num_rows == 0:
            continue
        chunks.append(_emb_matrix(b, emb_col))
        total += len(chunks[-1])
        if total >= train_size:
            break
    if not chunks:
        raise ValueError("cannot train a product quantizer on an empty "
                         "corpus")
    train = _normalize(np.concatenate(chunks)[:train_size])
    d = train.shape[1]
    if d % m:
        raise ValueError(f"m={m} must divide the embedding dim {d}")
    sub = d // m
    books = np.stack([
        _kmeans_l2(train[:, s * sub:(s + 1) * sub], n_centroids,
                   iters=iters, seed=seed + s)
        for s in range(m)])
    return {"codebooks": books, "dim": d, "m": m}


class _PqEncoder:
    def __init__(self, book_ref, id_col: str, emb_col: str):
        pqm = ray.get(book_ref) if isinstance(book_ref, ray.ObjectRef) \
            else book_ref
        self.books = pqm["codebooks"]            # (m, ncent, sub)
        self.m, self.dim = pqm["m"], pqm["dim"]
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, t):
        import pyarrow as pa
        m = self.m
        schema = pa.schema([
            (self.id_col, t.schema.field(self.id_col).type),
            ("pq_code", pa.list_(pa.uint8(), m))])
        if t.num_rows == 0:
            return schema.empty_table()
        x = _normalize(_emb_matrix(t, self.emb_col))
        if x.shape[1] != self.dim:
            raise ValueError(f"embedding dim {x.shape[1]} != trained "
                             f"dim {self.dim}")
        sub = self.dim // m
        codes = np.empty((len(x), m), dtype=np.uint8)
        for s in range(m):
            c = self.books[s]
            xs = x[:, s * sub:(s + 1) * sub]
            codes[:, s] = (xs @ c.T - 0.5 * (c * c).sum(axis=1)) \
                .argmax(axis=1).astype(np.uint8)
        ids = t[self.id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) \
            else ids
        return pa.Table.from_arrays(
            [ids, pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), type=pa.uint8()), m)],
            schema=schema)


def pq_encode(emb_ds, pq_model, *, id_col: str = "vec_id",
              emb_col: str = "embedding", concurrency=None):
    """Encode a corpus to PQ codes: (``id_col``, pq_code
    fixed_size_list<uint8, m>) — m bytes per vector. One map_batches
    pass; the codebooks broadcast once."""
    book_ref = pq_model if isinstance(pq_model, ray.ObjectRef) \
        else ray.put(pq_model)
    return _apply_scorer(emb_ds, _PqEncoder,
                         dict(book_ref=book_ref, id_col=id_col,
                              emb_col=emb_col), concurrency)


class _PqAdcScorer:
    """Asymmetric distance computation: per query, one (m, ncent) LUT of
    sub-space inner products; a vector's approximate cosine is the sum of
    m LUT entries addressed by its codes — no float vector is ever read."""

    def __init__(self, q_ref, book_ref, k, id_col):
        q = _normalize(np.asarray(ray.get(q_ref), dtype=np.float64))
        pqm = ray.get(book_ref) if isinstance(book_ref, ray.ObjectRef) \
            else book_ref
        books = pqm["codebooks"]                  # (m, ncent, sub)
        m, sub = pqm["m"], pqm["dim"] // pqm["m"]
        if q.shape[1] != pqm["dim"]:
            raise ValueError(f"query dim {q.shape[1]} != trained "
                             f"dim {pqm['dim']}")
        # luts: (nq, m, ncent)
        self.luts = np.einsum(
            "qmd,mcd->qmc",
            q.reshape(len(q), m, sub), books)
        self.k, self.id_col, self.m = k, id_col, m

    def __call__(self, t):
        import pyarrow as pa
        schema = _pairs_schema(self.id_col)
        if t.num_rows == 0:
            return schema.empty_table()
        col = t["pq_code"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = np.asarray(col.flatten(), dtype=np.int64) \
            .reshape(t.num_rows, self.m)
        ids = _col_np(t, self.id_col)
        nq = self.luts.shape[0]
        rng_m = np.arange(self.m)
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):                      # queries, never rows
            scores = self.luts[qi][rng_m, codes].sum(axis=1)
            k = min(self.k, len(scores))
            sel = np.argpartition(-scores, k - 1)[:k]
            out_q.append(np.full(k, qi, dtype=np.int64))
            out_id.append(ids[sel])
            out_s.append(scores[sel])
        return pa.table({"query_id": np.concatenate(out_q),
                         self.id_col: np.concatenate(out_id),
                         "score": np.concatenate(out_s)}, schema=schema)


def ann_topk_pq(code_ds, queries: np.ndarray, pq_model, k: int = 10, *,
                id_col: str = "vec_id", emb_col: str = "embedding",
                rerank_ds=None, shortlist: Optional[int] = None,
                round_decimals: Optional[int] = 6, concurrency=None):
    """Approximate cosine top-k over a PQ-ENCODED corpus (``pq_encode``
    output) via ADC: the per-query LUTs broadcast with the codebooks;
    each batch is one fancy-gather + row sum over uint8 codes. Same
    q×k-rows-per-batch fan-in as brute/LSH/IVF.

    Raw-ADC accuracy is bounded by the quantization error; pass
    ``rerank_ds`` (the raw embedding Dataset) to run the standard
    two-stage search — ADC selects a per-query ``shortlist`` (default
    4k) of candidates, then ONE brute-force pass EXACTLY scores only the
    shortlisted ids (the broadcast id set prunes each batch before the
    matmul). At scale the shortlist is a vanishing fraction of the
    corpus, so the second stage reads raw vectors for ~q*shortlist rows'
    worth of ids while the scan itself stays column-pruned and
    streaming."""
    q = np.asarray(queries, dtype=np.float64)
    q_ref = ray.put(q)
    book_ref = pq_model if isinstance(pq_model, ray.ObjectRef) \
        else ray.put(pq_model)
    kk = k if rerank_ds is None else max(int(shortlist or 4 * k), k)
    partials = _apply_scorer(
        code_ds, _PqAdcScorer,
        dict(q_ref=q_ref, book_ref=book_ref, k=kk, id_col=id_col),
        concurrency)
    adc = _topk_fanin(partials, kk, id_col, round_decimals)
    if rerank_ds is None:
        return adc
    # exact rerank: the union-of-shortlists id set broadcasts once; only
    # member rows reach the brute scorer (q x shortlist bounded)
    short_ids = set()
    for b in adc.iter_batches(batch_size=None, batch_format="pyarrow"):
        short_ids.update(b[id_col].to_pylist())
    ids_ref = ray.put(frozenset(short_ids))

    def prune(t, _ref=ids_ref):
        import pyarrow as pa
        members = ray.get(_ref)
        keep = np.fromiter((v in members
                            for v in t[id_col].to_pylist()),
                           dtype=bool, count=t.num_rows)
        return t.filter(pa.array(keep))

    pruned = rerank_ds.map_batches(prune, batch_format="pyarrow",
                                   zero_copy_batch=True)
    exact = _apply_scorer(
        pruned, _BruteForceScorer,
        dict(q_ref=q_ref, k=k, id_col=id_col, emb_col=emb_col),
        concurrency)
    return _topk_fanin(exact, k, id_col, round_decimals)
