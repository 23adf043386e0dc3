"""BPE tokenizer training + encoding over the corpus.

Byte-pair-encoding training famously reduces to the WORD-FREQUENCY table:
merges depend only on (word, count) pairs, never on document structure
(Sennrich et al. 2016, subword-nmt). That makes the Ray split natural and
exact — not an approximation:

- DISTRIBUTED: one pass builds per-block word counts, reduced through the
  engine's int64-hash count exchange (lm._string_count_exchange — the
  measured-15x-faster vocabulary shuffle), optionally capped to the
  ``max_words`` most frequent words (dropped tail mass is REPORTED, not
  silent);
- DRIVER-SIDE: the classic incremental merge loop over the bounded
  (word, count) table — pair statistics plus a pair→words index updated
  only for words touched by each merge (the subword-nmt algorithm), so
  training is O(touched symbols), not O(V × merges);
- DISTRIBUTED again: encoding broadcasts the merge ranks once (ray.put),
  and each batch encodes only its UNIQUE words (np.unique + cache — the
  decontaminate unique-probe pattern) before scattering token counts back
  to documents.

Determinism: merge ties break on (count DESC, pair lexicographic), so the
trained tokenizer is a pure function of the corpus — identical at any
partitioning or cluster size (pytest: independent recount reference +
partitioning invariance).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

_EOW = "</w>"


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def _word_counts(ds, text_col: str, lowercase: bool):
    from saber_ray.stages.lm import _string_count_exchange

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col], "")
        if lowercase:
            txt = pc.utf8_lower(txt)
        words = pc.list_flatten(pc.split_pattern_regex(txt, r"\s+"))
        words = words.filter(pc.not_equal(words, ""))
        if len(words) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        enc = words.combine_chunks() if isinstance(words, pa.ChunkedArray) \
            else words
        d = pc.dictionary_encode(enc)
        codes = d.indices.to_numpy(zero_copy_only=False)
        vocab = d.dictionary
        n = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        return pa.table({"word": vocab, "n": pa.array(n)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return _string_count_exchange(parts, "word", "n")


def train_bpe(ds, *, text_col: str = "text", num_merges: int = 1000,
              min_count: int = 2, max_words: Optional[int] = 200_000,
              lowercase: bool = False) -> dict:
    """Learn ``num_merges`` BPE merges from the corpus. Returns a
    driver-resident model dict: ``merges`` (ordered pair list), ``vocab``
    (all tokens incl. single symbols), plus coverage stats
    (``n_words`` distinct, ``kept_words``, ``dropped_mass`` = fraction of
    word OCCURRENCES in the dropped tail — never silently truncated)."""
    agg = _word_counts(ds, text_col, lowercase)
    words: list[str] = []
    counts: list[int] = []
    total_mass = 0
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        ws = b["word"].to_pylist()
        ns = b["n"].to_numpy(zero_copy_only=False)
        total_mass += int(ns.sum())
        for w, c in zip(ws, ns):
            if c >= min_count:
                words.append(w)
                counts.append(int(c))
    n_distinct = len(words)
    if max_words is not None and len(words) > max_words:
        order = sorted(range(len(words)),
                       key=lambda i: (-counts[i], words[i]))[:max_words]
        order = sorted(order)
        words = [words[i] for i in order]
        counts = [counts[i] for i in order]
    kept_mass = sum(counts)

    # symbol sequences per word (chars + end-of-word marker)
    seqs = [tuple(w) + (_EOW,) for w in words]
    merges = _learn_merges(seqs, counts, num_merges)

    vocab = set()
    for s in seqs:
        vocab.update(s)
    for a, b in merges:
        vocab.add(a + b)
    return {
        "merges": merges,
        "vocab": sorted(vocab),
        "n_words": n_distinct,
        "kept_words": len(words),
        "dropped_mass": round(1.0 - (kept_mass / total_mass), 6)
        if total_mass else 0.0,
        "eow": _EOW,
    }


def _learn_merges(seqs: list[tuple], counts: list[int],
                  num_merges: int) -> list[tuple]:
    """Incremental BPE merge loop (subword-nmt algorithm): pair stats +
    pair→word index, updated only for words containing the merged pair.
    Ties break (count DESC, pair ASC) — fully deterministic."""
    seqs = [list(s) for s in seqs]
    stats: dict[tuple, int] = {}
    index: dict[tuple, set] = {}
    for wi, (s, c) in enumerate(zip(seqs, counts)):
        for a, b in zip(s, s[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + c
            index.setdefault((a, b), set()).add(wi)
    merges: list[tuple] = []
    for _ in range(num_merges):
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if stats[best] < 1:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        touched = list(index.get(best, ()))
        for wi in touched:
            s = seqs[wi]
            c = counts[wi]
            # remove this word's pair contributions
            for a, b in zip(s, s[1:]):
                p = (a, b)
                stats[p] -= c
                if stats[p] <= 0:
                    stats.pop(p, None)
                ix = index.get(p)
                if ix is not None:
                    ix.discard(wi)
                    if not ix:
                        index.pop(p, None)
            # apply the merge within the word
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i+1] == best[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[wi] = out
            # re-add contributions
            for a, b in zip(out, out[1:]):
                p = (a, b)
                stats[p] = stats.get(p, 0) + c
                index.setdefault(p, set()).add(wi)
        stats.pop(best, None)
        index.pop(best, None)
    return merges


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

def _encode_word(word: str, ranks: dict, cache: dict) -> list:
    hit = cache.get(word)
    if hit is not None:
        return hit
    s = list(word) + [_EOW]
    while len(s) > 1:
        best_rank, best_i = None, -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i+1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        s[best_i:best_i+2] = [s[best_i] + s[best_i+1]]
    cache[word] = s
    return s


class _BpeEncoder:
    """Actor-pool encoder: merge ranks fetched ONCE per actor; per batch,
    only UNIQUE words are encoded (np.unique + persistent cache), then
    token counts scatter back to documents."""

    def __init__(self, model_ref, text_col: str, id_col: str,
                 lowercase: bool, emit_tokens: bool):
        model = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        self.ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
        self.text_col = text_col
        self.id_col = id_col
        self.lowercase = lowercase
        self.emit_tokens = emit_tokens
        self.cache: dict = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[self.text_col], "")
        if self.lowercase:
            txt = pc.utf8_lower(txt)
        lists = pc.split_pattern_regex(txt, r"\s+")
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False)
        flat_np = np.asarray(flat.to_pylist(), dtype=object)
        keep = flat_np != ""
        flat_np, parents = flat_np[keep], parents[keep]
        uniq, inv = np.unique(flat_np, return_inverse=True) \
            if len(flat_np) else (np.array([], dtype=object),
                                  np.array([], dtype=np.int64))
        enc = [_encode_word(w, self.ranks, self.cache) for w in uniq]
        tok_per_uniq = np.array([len(e) for e in enc], dtype=np.int64) \
            if len(enc) else np.zeros(0, dtype=np.int64)
        per_word = tok_per_uniq[inv] if len(inv) else inv
        n_tokens = np.bincount(parents, weights=per_word,
                               minlength=t.num_rows).astype(np.int64) \
            if len(parents) else np.zeros(t.num_rows, dtype=np.int64)
        cols = {self.id_col: t[self.id_col],
                "n_bpe_tokens": pa.array(n_tokens)}
        if self.emit_tokens:
            toks: list[list] = [[] for _ in range(t.num_rows)]
            for p, ui in zip(parents, inv):
                toks[p].extend(enc[ui])
            cols["bpe_tokens"] = pa.array(toks,
                                          type=pa.list_(pa.string()))
        return pa.table(cols)


def bpe_encode(ds, model, *, text_col: str = "text",
               id_col: str = "doc_id", lowercase: bool = False,
               emit_tokens: bool = False, concurrency=(1, 32),
               batch_size: int = 2048):
    """Encode every document with a trained BPE model (``train_bpe``
    output or a ``ray.put`` ref of it). Output: id_col, ``n_bpe_tokens``,
    and with ``emit_tokens=True`` the token sequence itself
    (list<string> — concatenating them reproduces the pre-tokenized
    words, pytest roundtrip)."""
    ref = model if isinstance(model, ray.ObjectRef) else ray.put(model)
    return ds.map_batches(
        _BpeEncoder, fn_constructor_args=(ref, text_col, id_col,
                                          lowercase, emit_tokens),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)
