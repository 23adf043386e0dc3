"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale extensions beyond the reference (which has no dedup/set ops at all —
SURVEY.md §2.7). All follow the sketch-then-shuffle discipline:

- exact:   content hash per batch (vectorized) → groupby(hash) → winner per
           group with a text-equality guard against hash collisions.
- minhash: vectorized signature per batch (explode shingles → hash_array →
           k permutations → np.minimum.at) → banding → groupby(band, hash)
           buckets → candidate pairs (signature-estimated Jaccard verify) →
           min-label connected components → (doc_id, cluster_id).
- simhash: 64-bit weighted-token-bit fingerprint; near-dup = equal fingerprint
           or Hamming ≤ r via 4-chunk banding (pigeonhole: any pair with
           Hamming ≤ 3 shares at least one of 4 chunks exactly).
- ngram Jaccard: exact verified Jaccard on candidate pairs (the verify step
           shared by the LSH paths).

Candidate-pair sets are assumed ≪ corpus (documented): components run as
driver-side union-find over the pair list; at 100 TB swap in iterative
min-label propagation over a pairs Dataset (same semantics, a few groupby
rounds) — the pair generation, the expensive part, is already distributed.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, *, on: str = "text", id_col: str = "doc_id"):
    """Keep, per distinct ``on`` value, the row with the minimum ``id_col``.

    Hash-partition + per-group first (the canonical exact-dedup shape): a
    vectorized content hash is added per batch, the shuffle key is the hash
    (so only equal texts co-locate), and the winner is resolved per group with
    a real equality check (collision-safe).
    """
    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = pd.util.hash_array(df[on].to_numpy(dtype=object)).astype("int64")
        return df

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        # within a hash bucket, group by actual value → min id per distinct value
        idx = g.groupby(on, sort=False)[id_col].idxmin()
        return g.loc[idx].drop(columns="__h")

    withh = ds.map_batches(add_hash, batch_format="pandas")
    return withh.groupby("__h").map_groups(pick, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHasher:
    """Vectorized per-batch MinHash signatures over word shingles.

    Permutation parameters are generated ONCE per actor from a fixed seed
    (deterministic across actors/runs). Per batch: shingle strings are built
    per doc (cheap list ops), then ALL hashing/permutation math is numpy over
    the exploded shingle array — no per-row hash loops.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, shingle_words: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.w = num_perm, shingle_words

    def _shingles(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """→ (doc_index per shingle, shingle hash) exploded arrays."""
        owners, shingles = [], []
        w = self.w
        for i, t in enumerate(texts):
            toks = (t or "").lower().split()
            if len(toks) < w:
                ss = [" ".join(toks)] if toks else []
            else:
                ss = [" ".join(toks[j:j + w]) for j in range(len(toks) - w + 1)]
            owners.extend([i] * len(ss))
            shingles.extend(ss)
        if not shingles:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
        hashes = pd.util.hash_array(np.asarray(shingles, dtype=object)).astype(np.uint64)
        return np.asarray(owners, dtype=np.int64), hashes

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix."""
        n = len(texts)
        owners, hashes = self._shingles(texts)
        sig = np.full((n, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(hashes) == 0:
            return sig
        # permuted[i, k] = (a_k * h_i + b_k) mod M  (universal hashing)
        permuted = (hashes[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        np.minimum.at(sig, owners, permuted)
        return sig

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sig = self.signatures(df[self.text_col].tolist())
        return pd.DataFrame({self.id_col: df[self.id_col].to_numpy(),
                             "signature": list(sig)})


def minhash_signatures(ds, *, text_col="text", id_col="doc_id", num_perm=64,
                       shingle_words=3, seed=42, concurrency=(1, 4)):
    return ds.map_batches(
        MinHasher, batch_format="pandas", concurrency=concurrency, num_cpus=0.5,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                   num_perm=num_perm, shingle_words=shingle_words,
                                   seed=seed))


def _band_rows(df: pd.DataFrame, id_col: str, bands: int, rows: int) -> pd.DataFrame:
    """Explode signatures into (band_id, band_hash, doc_id, signature) rows."""
    sig = np.stack(df["signature"].to_numpy())          # (n, num_perm)
    n = len(df)
    out_band, out_hash, out_doc, out_sig = [], [], [], []
    mult = np.uint64(0x9E3779B97F4A7C15)
    for b in range(bands):
        chunk = sig[:, b * rows:(b + 1) * rows]
        # order-dependent mix of the band's rows → one uint64 bucket key
        h = np.zeros(n, dtype=np.uint64)
        for r in range(rows):
            h = (h ^ chunk[:, r]) * mult
        out_band.append(np.full(n, b, dtype=np.int64))
        out_hash.append(h.astype(np.int64))
        out_doc.append(df[id_col].to_numpy())
        out_sig.extend(df["signature"].tolist())
    return pd.DataFrame({
        "band_id": np.concatenate(out_band),
        "band_hash": np.concatenate(out_hash),
        id_col: np.concatenate(out_doc),
        "signature": out_sig,
    })


def minhash_lsh_clusters(ds, *, text_col="text", id_col="doc_id", num_perm=64,
                         bands=16, shingle_words=3, threshold=0.7, seed=42,
                         max_bucket=512):
    """Near-duplicate clustering: → pandas DataFrame (doc_id, cluster_id).

    cluster_id = min doc_id of the connected component under verified
    candidate-pair edges (estimated Jaccard = mean equal signature components
    ≥ threshold). Buckets larger than ``max_bucket`` are truncated with a
    log-visible marker column (no silent caps).
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    rows = num_perm // bands
    sigs = minhash_signatures(ds, text_col=text_col, id_col=id_col,
                              num_perm=num_perm, shingle_words=shingle_words,
                              seed=seed)
    banded = sigs.map_batches(
        lambda df: _band_rows(df, id_col, bands, rows), batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "est_jaccard": pd.Series(dtype="float64"),
                                 "truncated": pd.Series(dtype="bool")})
        trunc = len(g) > max_bucket
        g = g.nsmallest(max_bucket, id_col) if trunc else g
        ids = g[id_col].to_numpy()
        sig = np.stack(g["signature"].to_numpy())
        ii, jj = np.triu_indices(len(ids), k=1)
        est = (sig[ii] == sig[jj]).mean(axis=1)
        keep = est >= threshold
        a, b = ids[ii[keep]], ids[jj[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi, "est_jaccard": est[keep],
                             "truncated": np.full(keep.sum(), trunc)})

    pairs = banded.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")
    pair_df = pairs.to_pandas()          # candidate pairs ≪ corpus (documented)
    all_ids = sigs.select_columns([id_col]).to_pandas()[id_col].to_numpy()

    parent: dict[int, int] = {}
    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r
    for a, b in zip(pair_df["a"].to_numpy(), pair_df["b"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    uniq = np.unique(all_ids)
    return pd.DataFrame({id_col: uniq,
                         "cluster_id": [find(int(x)) for x in uniq]})


def minhash_dedup(ds, **kw):
    """Near-dup dedup: keep each cluster's representative (min doc_id)."""
    id_col = kw.get("id_col", "doc_id")
    clusters = minhash_lsh_clusters(ds, **kw)
    keep = set(clusters.loc[clusters[id_col] == clusters["cluster_id"], id_col])
    import ray
    keep_ref = ray.put(keep)
    def f(df: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(keep_ref)
        return df[df[id_col].isin(k)]
    return ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over word tokens, vectorized via exploded token arrays."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df[self.text_col].tolist()
        owners, toks = [], []
        for i, t in enumerate(texts):
            ws = (t or "").lower().split()
            owners.extend([i] * len(ws))
            toks.extend(ws)
        n = len(df)
        fp = np.zeros(n, dtype=np.uint64)
        if toks:
            owners = np.asarray(owners, dtype=np.int64)
            h = pd.util.hash_array(np.asarray(toks, dtype=object)).astype(np.uint64)
            # accumulate per-bit votes: (n_docs, 64) via minimum loop over bits
            votes = np.zeros((n, 64), dtype=np.int64)
            for bit in range(64):
                bitval = ((h >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1
                np.add.at(votes[:, bit], owners, bitval)
            bits = (votes > 0).astype(np.uint64)
            fp = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64)
        return pd.DataFrame({self.id_col: df[self.id_col].to_numpy(),
                             "simhash": fp.astype(np.int64)})


def simhash(ds, *, text_col="text", id_col="doc_id", concurrency=(1, 4)):
    return ds.map_batches(SimHasher, batch_format="pandas",
                          concurrency=concurrency, num_cpus=0.5,
                          fn_constructor_kwargs=dict(text_col=text_col,
                                                     id_col=id_col))


def simhash_near_pairs(ds, *, text_col="text", id_col="doc_id", max_hamming=3):
    """Pairs with Hamming(simhash) ≤ max_hamming via 4-chunk banding
    (pigeonhole: ≤3 differing bits leave ≥1 of 4 16-bit chunks identical)."""
    fps = simhash(ds, text_col=text_col, id_col=id_col)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        f = df["simhash"].to_numpy().astype(np.uint64)
        out = []
        for c in range(4):
            chunk = ((f >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(pd.DataFrame({
                "chunk_id": np.full(len(df), c, dtype=np.int64),
                "chunk_val": chunk,
                id_col: df[id_col].to_numpy(),
                "simhash": df["simhash"].to_numpy()}))
        return pd.concat(out, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        ids = g[id_col].to_numpy()
        f = g["simhash"].to_numpy().astype(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        x = f[ii] ^ f[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        while True:
            nz = x != 0
            if not nz.any():
                break
            ham[nz] += 1
            x = x & (x - np.uint64(1))
        keep = ham <= max_hamming
        a, b = ids[ii[keep]], ids[jj[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi, "hamming": ham[keep]})

    pairs = fps.map_batches(explode, batch_format="pandas") \
               .groupby(["chunk_id", "chunk_val"]) \
               .map_groups(bucket_pairs, batch_format="pandas")
    # same pair can surface from multiple chunks → distinct
    return pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification
# ---------------------------------------------------------------------------

def ngram_jaccard(texts_a, texts_b, n: int = 3) -> np.ndarray:
    """Exact word n-gram Jaccard for aligned pairs (verification kernel)."""
    out = np.zeros(len(texts_a), dtype=np.float64)
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        wa, wb = (ta or "").lower().split(), (tb or "").lower().split()
        sa = {" ".join(wa[j:j + n]) for j in range(max(0, len(wa) - n + 1))}
        sb = {" ".join(wb[j:j + n]) for j in range(max(0, len(wb) - n + 1))}
        u = len(sa | sb)
        out[i] = (len(sa & sb) / u) if u else 1.0
    return out
