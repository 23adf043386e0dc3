"""Unigram language-model training + per-document perplexity scoring.

Perplexity filtering is the canonical pretraining-corpus quality gate
(score every document against an LM trained on a trusted corpus; drop the
tails). No n-gram LM toolkit exists in this environment, so the model is
an add-one-smoothed UNIGRAM LM — deliberately simple, fully
SQL-expressible (every gate has a value-level DuckDB twin), and the
Ray-side plumbing (two-phase train/score, broadcast model, vectorized
batch scoring) is exactly what a higher-order model would reuse.

Scale shape:

- ``train_unigram_lm``: tokenize per batch → per-batch partial counts →
  ONE combiner-reduced vocabulary exchange (the only shuffle; vocab-sized,
  not corpus-sized). ``min_count`` folds the rare tail into OOV so the
  broadcast model stays bounded at web scale.
- ``perplexity_score``: the model ships once via ``ray.put``; each batch
  resolves token log-probs through one dictionary-encode (lookups per
  DISTINCT batch token, not per token) and segment-sums per document.
  No shuffle, no materialization.

Tokenization matches ``stages/search.py`` (DuckDB
``regexp_extract_all(lower(text), '[a-z0-9]+')``).

Model: p(w) = (c_w + 1) / (T + V + 1) with c_w = 0 for OOV, T = total
training tokens, V = distinct training tokens — V and T are computed
BEFORE any ``min_count`` folding, so folding changes which words share
the OOV probability, never the distribution's denominator.
perplexity(doc) = exp(-mean ln p(w)); empty documents score NULL.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pyarrow as pa

import ray

from saber_ray.stages.search import _doc_terms


def _string_count_exchange(parts, key: str, cnt: str):
    """Sum per-batch partial counts per STRING key: one sort exchange on
    the key's int64 hash + a block-local pyarrow group_by (hash-equal
    rows co-locate per Ray's sort boundary invariant; colliding keys are
    separated inside the block). Ray's own ``groupby(str_key)`` sorts on
    the strings themselves — measured 15× slower at a 1 M-entry bigram
    vocabulary (180 s → 12 s at 25 M partial rows)."""
    from saber_ray.core.hashing import hash_column

    def add_h(t: pa.Table) -> pa.Table:
        return t.append_column("__h", pa.array(
            hash_column(t[key]).astype(np.int64)))

    def blockagg(t: pa.Table) -> pa.Table:
        out = pa.table({key: t[key], cnt: t[cnt]}).group_by(
            [key], use_threads=False).aggregate([(cnt, "sum")])
        return out.rename_columns([key, cnt])

    return parts.map_batches(add_h, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .sort("__h") \
        .map_batches(blockagg, batch_format="pyarrow",
                     zero_copy_batch=True)


def train_unigram_lm(ds, *, text_col: str = "text", min_count: int = 1,
                     max_vocab: Optional[int] = None) -> dict:
    """Train on a corpus: returns ``{"counts": {token: count}, "total":
    T, "vocab": V}``. ``min_count`` / ``max_vocab`` bound the retained
    table (rare tokens fold into OOV); T and V always reflect the full
    corpus. The result is driver-resident and meant to be ``ray.put``
    once for scoring."""
    def partial(t: pa.Table) -> pa.Table:
        parents, codes, vocab, _ = _doc_terms(t, text_col)
        if len(codes) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        n = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        return pa.table({"token": vocab, "n": pa.array(n)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    agg = _string_count_exchange(parts, "token", "n")
    counts: dict[str, int] = {}
    total = 0
    vocab_size = 0
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        toks = b["token"].to_pylist()
        ns = b["n"].to_numpy(zero_copy_only=False)
        vocab_size += len(toks)
        total += int(ns.sum())
        for w, c in zip(toks, ns):
            if c >= min_count:
                counts[w] = int(c)
    if max_vocab is not None and len(counts) > max_vocab:
        keep = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        counts = dict(keep[:max_vocab])
    return {"counts": counts, "total": total, "vocab": vocab_size}


class _PerplexityScorer:
    def __init__(self, lm_ref, text_col: str, id_col: str,
                 round_decimals: int):
        lm = ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
        self.counts = lm["counts"]
        self.denom = float(lm["total"] + lm["vocab"] + 1)
        self.text_col, self.id_col = text_col, id_col
        self.round_decimals = round_decimals

    def __call__(self, t: pa.Table) -> pa.Table:
        schema = pa.schema([
            (self.id_col, t.schema.field(self.id_col).type),
            ("n_tokens", pa.int64()), ("perplexity", pa.float64())])
        n_rows = t.num_rows
        if n_rows == 0:
            return schema.empty_table()
        parents, codes, vocab, doclen = _doc_terms(t, self.text_col)
        ids = t[self.id_col].combine_chunks() if isinstance(
            t[self.id_col], pa.ChunkedArray) else t[self.id_col]
        if len(codes) == 0:
            return pa.Table.from_arrays(
                [ids, pa.array(np.zeros(n_rows, dtype=np.int64)),
                 pa.array([None] * n_rows, pa.float64())], schema=schema)
        # one lookup per DISTINCT batch token, gathered back per token
        logp_by_code = np.array(
            [math.log((self.counts.get(w, 0) + 1) / self.denom)
             for w in vocab.to_pylist()], dtype=np.float64)
        tok_logp = logp_by_code[codes]
        sums = np.zeros(n_rows, dtype=np.float64)
        np.add.at(sums, parents, tok_logp)
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.exp(-sums / doclen)
        from saber_ray.core.aggregates import round_oracle_np
        ppl = round_oracle_np(ppl, self.round_decimals)
        return pa.Table.from_arrays(
            [ids, pa.array(doclen),
             pa.array(ppl, type=pa.float64(), mask=doclen == 0)],
            schema=schema)


def perplexity_score(ds, lm, *, text_col: str = "text",
                     id_col: str = "doc_id", round_decimals: int = 6):
    """Score every document against a trained unigram LM (``lm`` is the
    ``train_unigram_lm`` result or an ObjectRef to it): (``id_col``,
    n_tokens, perplexity). The classic curation filter composes as
    ``selection(perplexity_score(...), col("perplexity") < cutoff)``."""
    lm_ref = lm if isinstance(lm, ray.ObjectRef) else ray.put(lm)
    from saber_ray.stages.similarity import _apply_scorer
    return _apply_scorer(
        ds, _PerplexityScorer,
        {"lm_ref": lm_ref, "text_col": text_col, "id_col": id_col,
         "round_decimals": int(round_decimals)}, None)


def ngram_counts(ds, *, n: int = 2, text_col: str = "text",
                 min_count: int = 1):
    """Corpus n-gram vocabulary: one row per distinct word n-gram —
    (``gram`` space-joined, ``count``). Adjacent tokens within a document
    (the tokenizer's order); n-grams never cross documents. Per-batch
    partial counts → ONE n-gram-vocab-sized combiner-reduced exchange
    (the corpus itself never shuffles). SQL twin: LEAD() over tokenized
    positions. Powers contamination lookups, novelty scoring, and the
    collocation miner below."""
    if n < 1:
        raise ValueError("n must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        parents, codes, vocab, _ = _doc_terms(t, text_col)
        if len(codes) < n:
            return empty
        # windows of n consecutive tokens with one parent (same doc)
        ok = np.ones(len(codes) - n + 1, dtype=bool)
        for j in range(1, n):
            ok &= parents[j:len(parents) - n + 1 + j] == \
                parents[:len(parents) - n + 1]
        starts = np.flatnonzero(ok)
        if not len(starts):
            return empty
        v = len(vocab)
        if v ** n < 2 ** 62:
            # pack each window's codes into one int64 key
            key = np.zeros(len(starts), dtype=np.int64)
            for j in range(n):
                key = key * v + codes[starts + j]
            uniq, cnt = np.unique(key, return_counts=True)
            rows = np.empty((len(uniq), n), dtype=np.int64)
            u = uniq.copy()
            for j in range(n - 1, -1, -1):
                rows[:, j] = u % v
                u //= v
        else:
            # batch vocab too large to pack: unique over code rows
            mat = codes[starts[:, None] + np.arange(n)]
            rows, cnt = np.unique(mat, axis=0, return_counts=True)
        # gram strings via Arrow gathers + one vectorized join — a Python
        # per-gram join here dominated the whole pipeline at 1 M docs
        import pyarrow.compute as pc
        cols = [vocab.take(pa.array(rows[:, j])) for j in range(n)]
        grams = cols[0] if n == 1 else \
            pc.binary_join_element_wise(*cols, " ")
        return pa.table({"gram": grams,
                         "c": pa.array(cnt.astype(np.int64))})

    agg = _string_count_exchange(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), "gram", "c")

    def finish(t: pa.Table) -> pa.Table:
        out = t.rename_columns(["gram", "count"])
        if min_count > 1:
            import pyarrow.compute as pc
            out = out.filter(pc.greater_equal(out["count"], min_count))
        return out

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def collocations(ds, *, text_col: str = "text", min_count: int = 5,
                 round_decimals: int = 6):
    """Bigram collocation mining by pointwise mutual information:
    (w1, w2, count, pmi) for every adjacent word pair with count >=
    ``min_count``, pmi = ln( (c12/T2) / ((c1/T1)(c2/T1)) ) with T1 =
    total tokens, T2 = total bigrams. Two corpus scans total (the unigram
    and bigram exchanges), everything else per-batch. The classic phrase/
    boilerplate detector for corpus curation."""
    lm = train_unigram_lm(ds, text_col=text_col)
    uni, t1 = lm["counts"], lm["total"]
    # T2 must count ALL bigrams, not only the min_count survivors — so
    # stream the UNFILTERED vocabulary and apply min_count here, summing
    # every gram's count on the way past (no extra corpus scan)
    big = ngram_counts(ds, n=2, text_col=text_col, min_count=1)
    t2 = 0
    parts = []
    import pyarrow.compute as pc
    for b in big.iter_batches(batch_size=None, batch_format="pyarrow"):
        t2 += int(pc.sum(b["count"]).as_py() or 0)
        kept = b.filter(pc.greater_equal(b["count"], min_count))
        if kept.num_rows:
            parts.append(kept)
    if t2 == 0:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "count": pa.array([], pa.int64()),
                         "pmi": pa.array([], pa.float64())})
    from saber_ray.core.aggregates import round_oracle_np
    out_w1, out_w2, out_c, out_p = [], [], [], []
    for b in parts:
        grams = b["gram"].to_pylist()
        cnt = b["count"].to_numpy(zero_copy_only=False)
        w1s, w2s = zip(*(g.split(" ", 1) for g in grams)) if grams \
            else ((), ())
        c1 = np.array([uni[w] for w in w1s], dtype=np.float64) \
            if grams else np.zeros(0)
        c2 = np.array([uni[w] for w in w2s], dtype=np.float64) \
            if grams else np.zeros(0)
        pmi = np.log((cnt / t2) / ((c1 / t1) * (c2 / t1))) if grams \
            else np.zeros(0)
        out_w1.extend(w1s)
        out_w2.extend(w2s)
        out_c.append(cnt)
        out_p.append(round_oracle_np(pmi, round_decimals))
    cat_c = np.concatenate(out_c) if out_c else np.zeros(0, np.int64)
    cat_p = np.concatenate(out_p) if out_p else np.zeros(0)
    return pa.table({"w1": pa.array(out_w1, pa.string()),
                     "w2": pa.array(out_w2, pa.string()),
                     "count": pa.array(cat_c, pa.int64()),
                     "pmi": pa.array(cat_p, pa.float64())})


# ---------------------------------------------------------------------------
# hashed bigram LM: order-SENSITIVE perplexity
# ---------------------------------------------------------------------------

def _bigram_pairs(txt, dim: int):
    """(owner row, transition code) per token: code = prev_bucket * dim +
    cur_bucket over hashed-alnum token buckets, with a BOS context (index
    ``dim``) opening every document — so every token contributes exactly
    one transition and the model is sensitive to word ORDER (the property
    the unigram LM cannot have)."""
    from saber_ray.stages.embed import _token_dims
    owners, idx, _ = _token_dims(txt, dim)
    if len(idx) == 0:
        return owners, np.zeros(0, dtype=np.int64)
    prev = np.empty_like(idx)
    prev[1:] = idx[:-1]
    same = np.zeros(len(idx), dtype=bool)
    same[1:] = owners[1:] == owners[:-1]
    prev[~same] = dim                       # BOS context
    return owners, prev * dim + idx


def train_bigram_lm(ds, *, dim: int = 1024, alpha: float = 0.1,
                    text_col: str = "text") -> dict:
    """Train a bucketed (hashed) bigram model: tokens map to ``dim``
    buckets, making it an EXACT add-alpha bigram model over a dim-symbol
    alphabet — P(u|v) = (C[v,u] + alpha) / (C[v,·] + alpha·dim) with a
    BOS context row. Per block only the NONZERO (transition, count)
    pairs ship; the int-key count exchange sums them; the driver bakes
    the dense ((dim+1) × dim) log-prob matrix (~8·dim² bytes — size dim
    so it broadcasts comfortably). Returns ``{"logp", "dim", "alpha"}``.
    """
    if dim < 2:
        raise ValueError("dim must be >= 2")
    if alpha <= 0:
        raise ValueError("alpha must be > 0")

    def partial(t: pa.Table) -> pa.Table:
        _, pairs = _bigram_pairs(t[text_col], dim)
        schema = pa.schema([("pair", pa.int64()), ("n", pa.int64())])
        if len(pairs) == 0:
            return schema.empty_table()
        uniq, cnts = np.unique(pairs, return_counts=True)
        return pa.table({"pair": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnts, pa.int64())})

    agg = _string_count_exchange(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), "pair", "n")
    grid = np.zeros((dim + 1) * dim, dtype=np.float64)
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        grid[b["pair"].to_numpy(zero_copy_only=False)] += \
            b["n"].to_numpy(zero_copy_only=False)
    grid = grid.reshape(dim + 1, dim)
    ctx = grid.sum(axis=1, keepdims=True)
    logp = np.log(grid + alpha) - np.log(ctx + alpha * dim)
    return {"logp": logp, "dim": dim, "alpha": float(alpha)}


def bigram_perplexity(ds, model, *, text_col: str = "text",
                      id_col: str = "doc_id", round_decimals: int = 6):
    """Per-document perplexity under a ``train_bigram_lm`` model —
    order-sensitive (shuffling a document's words raises it, unlike the
    unigram ``perplexity_score``). Output: (``id_col``, n_tokens,
    perplexity); token-less documents score NULL. The log-prob matrix
    broadcasts once; each batch costs one gather + one bincount."""
    lm_ref = model if isinstance(model, ray.ObjectRef) else ray.put(model)
    from saber_ray.core.aggregates import round_oracle_np

    def f(t: pa.Table, _ref=lm_ref) -> pa.Table:
        schema = pa.schema([(id_col, t.schema.field(id_col).type),
                            ("n_tokens", pa.int64()),
                            ("perplexity", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        m = ray.get(_ref)
        dim = int(m["dim"])
        flat = m["logp"].reshape(-1)
        owners, pairs = _bigram_pairs(t[text_col], dim)
        n = t.num_rows
        ntok = np.bincount(owners, minlength=n).astype(np.int64)
        sums = np.bincount(owners, weights=flat[pairs], minlength=n) \
            if len(pairs) else np.zeros(n)
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.exp(-sums / ntok)
        ppl = round_oracle_np(ppl, round_decimals)
        ids = t[id_col]
        return pa.Table.from_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
             else ids, pa.array(ntok),
             pa.array(ppl, type=pa.float64(), mask=ntok == 0)],
            schema=schema)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
