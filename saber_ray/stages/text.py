"""Text analysis stages for large-scale training-data pipelines.

These are scale extensions beyond the reference (whose type system has no
strings at all — TupleSchema.java:5-8); they follow the same stage discipline:
vectorized map_batches, compiled state in actor ``__init__``, no row loops in
hot paths.

- token counts  (whitespace + BPE-ish regex)
- quality score (length / punctuation / stopword / alpha ratios)
- language id   (stopword-overlap heuristic over a fixed per-language lexicon)
- fingerprints  (md5 content fingerprint; rolling-hash winnowing sketch)
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "por", "con"},
    "fr": {"le", "la", "de", "et", "un", "est", "pour", "que", "dans", "sur"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"},
}


def token_stats(ds, text_col: str = "text", *, batch_size: Optional[int] = None):
    """Append n_chars, n_ws_tokens (split on ' '), n_bpe_tokens (regex pieces).

    All three are single pyarrow.compute kernels per batch — zero row loops.
    n_ws_tokens = count(' ')+1, the exact twin of DuckDB
    ``len(string_split(text, ' '))`` used by the oracle.
    """
    def f(b: pa.Table) -> pa.Table:
        t = b[text_col]
        b = b.append_column("n_chars", pc.cast(pc.utf8_length(t), pa.int64()))
        b = b.append_column("n_ws_tokens", pc.cast(
            pc.add(pc.count_substring(t, " "), 1), pa.int64()))
        b = b.append_column("n_bpe_tokens", pc.cast(
            pc.count_substring_regex(t, BPE_ISH), pa.int64()))
        return b
    kw = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if batch_size:
        kw["batch_size"] = batch_size
    return ds.map_batches(f, **kw)


def _explode_words(t: pd.Series, word_re) -> tuple[pd.Series, np.ndarray]:
    """(flat token Series, owner row index per token) via one C-level
    findall + explode — the shared vectorization for the token heuristics."""
    words = t.str.findall(word_re)
    flat = words.explode()
    flat = flat[flat.notna()]
    return flat, flat.index.to_numpy(dtype=np.int64)


class QualityScorer:
    """Actor-pool stage: heuristic document quality in [0,1].

    Regexes compiled once per actor (__init__), applied vectorized per batch.
    Components: alpha ratio, punctuation ratio, mean word length sanity,
    English-stopword hit ratio — the standard cheap pretraining filters.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[a-zA-Z]+")
        self.stop = STOPWORDS["en"]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        t = df[self.text_col].fillna("").reset_index(drop=True)
        n = t.str.len().clip(lower=1)
        alpha = t.str.count(r"[A-Za-z]") / n
        punct = t.str.count(r"[^\w\s]") / n
        # one explode, then C-level isin/bincount — no per-row Python
        # (the previous words.map(lambda ...) ran Python per document)
        flat, owners = _explode_words(t, self.word)
        n_words = np.maximum(np.bincount(owners, minlength=len(t)), 1)
        is_stop = flat.str.lower().isin(self.stop).to_numpy(dtype=bool)
        stops = np.bincount(owners[is_stop], minlength=len(t))
        wl_sum = np.bincount(owners, weights=flat.str.len().to_numpy(dtype=float),
                             minlength=len(t))
        stop_ratio = pd.Series(stops / n_words)
        mean_wl = wl_sum / n_words
        wl_ok = ((mean_wl >= 2.0) & (mean_wl <= 12.0)).astype(float)
        score = (0.35 * alpha.to_numpy() + 0.25 * np.clip(1.0 - punct.to_numpy(), 0, 1)
                 + 0.2 * (stop_ratio.clip(0, 1) * 4.0 / (1 + 3.0 * stop_ratio)).to_numpy()
                 + 0.2 * wl_ok)
        from saber_ray.core.aggregates import round_oracle_np
        df = df.copy()
        df["quality"] = round_oracle_np(np.clip(score, 0.0, 1.0), 6)
        return df


from functools import lru_cache


@lru_cache(maxsize=8)
def _quality_scorer(text_col: str) -> "QualityScorer":
    return QualityScorer(text_col)


@lru_cache(maxsize=8)
def _lang_scorer(text_col: str) -> "LangId":
    return LangId(text_col)


def quality_score(ds, text_col: str = "text", *, concurrency=None):
    """Default (concurrency=None) runs as plain TASKS — the scorer state
    (two compiled regexes + a frozenset) is built once per worker process
    via lru_cache, and parallelism scales to every core instead of an
    actor-pool cap. Pass concurrency=(lo, hi) to pin an actor pool (the
    shape reserved for genuinely expensive setup, e.g. model loads)."""
    if concurrency is None:
        return ds.map_batches(
            lambda df, _c=text_col: _quality_scorer(_c)(df),
            batch_format="pandas")
    return ds.map_batches(QualityScorer, batch_format="pandas",
                          concurrency=concurrency, num_cpus=0.5,
                          fn_constructor_kwargs={"text_col": text_col})


class LangId:
    """Actor-pool stage: stopword-overlap language classifier.

    Deterministic heuristic: the language whose stopword lexicon hits the
    most tokens wins; 'und' (undetermined) when nothing hits.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[\wÀ-ÿ]+")
        self.lex = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        t = df[self.text_col].fillna("").str.lower().reset_index(drop=True)
        flat, owners = _explode_words(t, self.word)
        langs = sorted(self.lex)
        scores = np.zeros((len(df), len(langs)), dtype=np.int64)
        # one explode + one C-level isin/bincount per language — the old
        # toks.map(lambda ...) ran a Python loop per (row, language)
        for j, lang in enumerate(langs):
            hits = flat.isin(self.lex[lang]).to_numpy(dtype=bool)
            scores[:, j] = np.bincount(owners[hits], minlength=len(df))
        best = scores.argmax(axis=1)
        hit = scores.max(axis=1) > 0
        out = np.where(hit, np.array(langs, dtype=object)[best], "und")
        df = df.copy()
        df["lang_pred"] = out
        return df


def lang_id(ds, text_col: str = "text", *, concurrency=None):
    """Task-based by default — see quality_score for the rationale."""
    if concurrency is None:
        return ds.map_batches(
            lambda df, _c=text_col: _lang_scorer(_c)(df),
            batch_format="pandas")
    return ds.map_batches(LangId, batch_format="pandas",
                          concurrency=concurrency, num_cpus=0.5,
                          fn_constructor_kwargs={"text_col": text_col})


def md5_fingerprint(ds, text_col: str = "text"):
    """Content fingerprint = md5 hex of the text (oracle: DuckDB ``md5``)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["fingerprint"] = [
            hashlib.md5(s.encode("utf-8")).hexdigest() if s is not None else None
            for s in df[text_col]]
        return df
    return ds.map_batches(f, batch_format="pandas")


class WinnowingFingerprint:
    """Rolling-hash winnowing sketch (Schleimer et al., SIGMOD'03 public
    algorithm): k-gram rolling hashes, minimum per sliding window → a small
    set of positions-independent fingerprints per document."""

    def __init__(self, text_col: str = "text", k: int = 8, window: int = 4):
        self.text_col, self.k, self.window = text_col, k, window

    def _doc(self, s: str) -> list[int]:
        if s is None or len(s) < self.k:
            return []
        b = np.frombuffer(s.lower().encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < self.k:
            return []
        base = np.uint64(1000003)
        h = np.zeros(len(b) - self.k + 1, dtype=np.uint64)
        acc = np.zeros(len(b), dtype=np.uint64)
        # vectorized polynomial rolling hash via cumulative powers
        powers = np.power(base, np.arange(self.k, dtype=np.uint64),
                          dtype=np.uint64)
        for i in range(self.k):
            h += b[i:len(b) - self.k + 1 + i].astype(np.uint64) * powers[self.k - 1 - i]
        if len(h) < self.window:
            return [int(h.min())]
        from numpy.lib.stride_tricks import sliding_window_view
        mins = sliding_window_view(h, self.window).min(axis=1)
        return sorted(set(int(x) for x in np.unique(mins)))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["winnow_fp"] = df[self.text_col].map(self._doc)
        return df


@lru_cache(maxsize=8)
def _winnow_scorer(text_col: str, k: int, window: int) -> "WinnowingFingerprint":
    return WinnowingFingerprint(text_col, k, window)


def winnowing_fingerprint(ds, text_col: str = "text", k: int = 8, window: int = 4,
                          *, concurrency=None):
    """Task-based by default — see quality_score for the rationale."""
    if concurrency is None:
        return ds.map_batches(
            lambda df, _c=text_col, _k=k, _w=window:
                _winnow_scorer(_c, _k, _w)(df),
            batch_format="pandas")
    return ds.map_batches(WinnowingFingerprint, batch_format="pandas",
                          concurrency=concurrency, num_cpus=0.5,
                          fn_constructor_kwargs={"text_col": text_col,
                                                 "k": k, "window": window})
