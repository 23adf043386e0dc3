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
    # tokens are never null (empty pieces are filtered), so the plain
    # Dataset groupby is safe; it shuffles per-batch PARTIAL counts —
    # vocab-sized, not corpus-sized
    agg = parts.groupby("token").sum("n")
    counts: dict[str, int] = {}
    total = 0
    vocab_size = 0
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        toks = b["token"].to_pylist()
        ns = b["sum(n)"].to_numpy(zero_copy_only=False)
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
