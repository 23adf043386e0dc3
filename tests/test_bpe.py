"""BPE train/encode vs an independent full-recount reference.

The engine's trainer uses the incremental pair-stats + index algorithm;
the reference here recounts EVERY pair from scratch after each merge — a
different code path whose agreement pins the incremental bookkeeping."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.bpe import _EOW, bpe_encode, train_bpe
from tests.oracle_util import to_pandas


def _docs(sf_dir):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def _reference_merges(word_counts: dict, num_merges: int) -> list:
    """Naive BPE: full pair recount each round, same tie-break."""
    seqs = {w: list(w) + [_EOW] for w in word_counts}
    merges = []
    for _ in range(num_merges):
        stats = {}
        for w, s in seqs.items():
            c = word_counts[w]
            for p in zip(s, s[1:]):
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i+1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def _word_counts_py(df, min_count):
    from collections import Counter
    c = Counter()
    for t in df["text"].fillna(""):
        c.update(w for w in t.split() if w)
    return {w: n for w, n in c.items() if n >= min_count}


def test_train_matches_reference(ray_session, sf_dir):
    model = train_bpe(_docs(sf_dir), num_merges=120, min_count=2,
                      max_words=None)
    wc = _word_counts_py(to_pandas(_docs(sf_dir)), 2)
    want = _reference_merges(wc, 120)
    assert model["merges"] == want
    assert model["n_words"] == len(wc) or model["n_words"] >= len(wc)


def test_train_partitioning_invariance(ray_session, sf_dir):
    a = train_bpe(_docs(sf_dir), num_merges=60, min_count=2)
    b = train_bpe(_docs(sf_dir).repartition(17), num_merges=60,
                  min_count=2)
    assert a["merges"] == b["merges"]
    assert a["vocab"] == b["vocab"]


def test_max_words_reports_dropped_mass(ray_session, sf_dir):
    full = train_bpe(_docs(sf_dir), num_merges=10, min_count=1,
                     max_words=None)
    capped = train_bpe(_docs(sf_dir), num_merges=10, min_count=1,
                       max_words=10)
    assert full["dropped_mass"] == 0.0
    assert capped["kept_words"] == 10
    assert 0.0 < capped["dropped_mass"] < 1.0


def test_encode_roundtrip_and_counts(ray_session, sf_dir):
    model = train_bpe(_docs(sf_dir), num_merges=150, min_count=2)
    out = to_pandas(bpe_encode(_docs(sf_dir), model, emit_tokens=True))
    raw = to_pandas(_docs(sf_dir)).set_index("doc_id")["text"].fillna("")
    vocab = set(model["vocab"])
    rng = np.random.default_rng(3)
    sample = out.sample(n=min(80, len(out)), random_state=7)
    for _, row in sample.iterrows():
        toks = list(row["bpe_tokens"])
        assert len(toks) == row["n_bpe_tokens"]
        # every token in vocab (merged symbols or single chars)
        assert all(tk in vocab or len(tk.replace(_EOW, "")) <= 1
                   for tk in toks)
        # concatenation reproduces the whitespace pre-tokenization
        joined = "".join(toks).replace(_EOW, " ").split()
        assert joined == raw.loc[row["doc_id"]].split()


def test_encode_unique_word_cache_consistency(ray_session, sf_dir):
    """Counts are identical whether tokens are materialized or not, and
    across batch sizes (unique-word cache has no cross-batch effects)."""
    model = train_bpe(_docs(sf_dir), num_merges=80, min_count=2)
    a = to_pandas(bpe_encode(_docs(sf_dir), model, batch_size=64)) \
        .sort_values("doc_id").reset_index(drop=True)
    b = to_pandas(bpe_encode(_docs(sf_dir), model, batch_size=4096,
                             emit_tokens=True)) \
        .sort_values("doc_id").reset_index(drop=True)
    assert (a["n_bpe_tokens"] == b["n_bpe_tokens"]).all()
