"""Corpus-curation stages for large-scale training-data pipelines.

Scale extensions beyond the reference (whose type system has no strings —
TupleSchema.java:5-8), following the repo's stage discipline: vectorized
map_batches, broadcast small sides via ``ray.put``, no per-row Python in
hot paths.

- repetition_stats — Gopher-style repetition quality signals (Rae et al.
  2021, public): duplicate-token fraction, duplicate word-n-gram fraction,
  top-token fraction, per document.
- redact_pii      — regex PII redaction (email / SSN / card / phone /
  IPv4) with per-doc redaction counts; pure ``pyarrow.compute`` RE2
  kernels, patterns shared verbatim with the DuckDB oracle twin.
- decontaminate   — test-set decontamination: flag documents whose word
  n-gram shingles intersect a broadcast blocklist (the standard
  benchmark-overlap filter). The blocklist is the SMALL side (a test set)
  and ships once via ``ray.put``; membership is tested once per UNIQUE
  shingle per batch, not per occurrence.

Tokenization twin: tokens = ``split(' ')`` INCLUDING empty strings, the
exact mirror of DuckDB ``string_split(text, ' ')`` (and of
``token_stats``'s ``n_ws_tokens`` convention), so every stat here is
value-oracle-checkable.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from saber_ray.core.aggregates import round_oracle_np

__all__ = ["repetition_stats", "redact_pii", "decontaminate",
           "build_shingle_blocklist", "PII_PATTERNS",
           "find_repeated_spans", "mask_repeated_spans"]


# ---------------------------------------------------------------------------
# shared token machinery (one C-level split; zero per-row Python, and —
# since r4 — zero pandas object arrays: tokens stay Arrow end-to-end,
# see saber_ray/core/tokens.py)
# ---------------------------------------------------------------------------

from saber_ray.core.tokens import join_with_space, split_ws, token_codes


def _gram_codes(codes: np.ndarray, owners: np.ndarray, k: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """Integer codes for word k-grams over factorized tokens.

    Iteratively combines (gram-so-far, next token) pairs and re-encodes
    through ``np.unique`` so intermediate keys never overflow int64: after
    each step codes are dense in [0, #unique). Returns (gram code per
    valid gram, starting position of each valid gram); a gram is valid
    when all k tokens share one owner row.
    """
    gc = codes.astype(np.int64)
    valid = np.ones(len(codes), dtype=bool)
    for s in range(1, k):
        nxt = codes[s:].astype(np.int64)
        gc = gc[: len(nxt)]
        valid = valid[: len(nxt)] & (owners[: len(nxt)] == owners[s:])
        if len(nxt) == 0:
            break
        key = gc * (int(nxt.max()) + 1) + nxt
        _, gc = np.unique(key, return_inverse=True)
        gc = gc.astype(np.int64)
    pos = np.flatnonzero(valid[: len(gc)])
    return gc[pos], pos


def _shingle_strings(flat: pa.Array, upos: np.ndarray, n: int) -> pa.Array:
    """Space-joined n-token shingle strings for gram START positions
    ``upos`` — THE one join convention shared by blocklist construction
    and probing (divergence would silently break membership). One
    ``binary_join_element_wise`` over n takes; no Python strings."""
    return join_with_space(
        *[flat.take(pa.array(upos + step)) for step in range(n)])


def _distinct_per_owner(owners: np.ndarray, codes: np.ndarray, n_rows: int,
                        n_codes: int) -> np.ndarray:
    """#distinct codes per owner row via ONE np.unique over packed keys."""
    if len(owners) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    u = np.unique(owners * np.int64(max(n_codes, 1)) + codes)
    return np.bincount((u // max(n_codes, 1)).astype(np.int64),
                       minlength=n_rows)


# ---------------------------------------------------------------------------
# repetition stats (Gopher repetition filters)
# ---------------------------------------------------------------------------

def repetition_stats(ds, text_col: str = "text", *, ngram: int = 2,
                     decimals: int = 6):
    """Append per-document repetition signals:

    - ``n_tokens``       — token count (split-on-space convention)
    - ``dup_word_frac``  — (n_tokens - n_distinct_tokens) / n_tokens
    - ``dup_ngram_frac`` — duplicate word-``ngram``-gram fraction
    - ``top_word_frac``  — most-frequent-token count / n_tokens

    All fractions are float64 divisions of exact integer counts, rounded
    with the oracle-parity ROUND — bit-exact against the DuckDB twin.
    Entirely C-level per batch and Arrow end-to-end (zero pandas object
    arrays): one Arrow split, one dictionary_encode, three ``np.unique``
    passes. Embarrassingly parallel (no shuffle).
    """
    if ngram < 2:
        raise ValueError("ngram must be >= 2")

    def f(t: pa.Table) -> pa.Table:
        flat, owners = split_ws(t[text_col])
        codes, uniq = token_codes(flat)
        n_rows, vocab = t.num_rows, len(uniq)
        n = np.bincount(owners, minlength=n_rows)          # >= 1 per row
        # ONE unique pass over packed (owner, token) serves both distinct
        # counts and the top-token count (a second np.unique would re-sort
        # the same 10^7-element key array per batch)
        pair = owners * np.int64(max(vocab, 1)) + codes
        upair, ucnt = np.unique(pair, return_counts=True)
        uown = (upair // max(vocab, 1)).astype(np.int64)
        nd = np.bincount(uown, minlength=n_rows)
        top = np.zeros(n_rows, dtype=np.int64)
        np.maximum.at(top, uown, ucnt)
        # k-gram duplicates
        gcodes, gpos = _gram_codes(codes, owners, ngram)
        gown = owners[gpos]
        gtot = np.bincount(gown, minlength=n_rows)
        gnd = _distinct_per_owner(gown, gcodes, n_rows,
                                  int(gcodes.max()) + 1 if len(gcodes) else 1)
        nf = n.astype(np.float64)
        t = t.append_column("n_tokens", pa.array(n, type=pa.int64()))
        t = t.append_column("dup_word_frac", pa.array(
            round_oracle_np((n - nd) / nf, decimals)))
        t = t.append_column("dup_ngram_frac", pa.array(round_oracle_np(
            (gtot - gnd) / np.maximum(gtot, 1).astype(np.float64),
            decimals)))
        return t.append_column("top_word_frac",
                               pa.array(round_oracle_np(top / nf, decimals)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# (name, RE2 pattern, replacement) — ORDER MATTERS (applied sequentially;
# the oracle twin nests regexp_replace in the same order). RE2 syntax on
# both sides: pyarrow's re2 kernels and DuckDB's regexp_* are both RE2.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(ds, text_col: str = "text", *, out: str = "text_redacted",
               patterns: Optional[list[tuple[str, str, str]]] = None):
    """Redact PII spans and append the total match count per document.

    Pure ``pyarrow.compute`` RE2 kernels (count_substring_regex +
    replace_substring_regex), zero-copy batches, NULL text stays NULL
    (regexp parity with SQL). Counts are taken on the text state BEFORE
    each pattern's replacement — sequential semantics, mirrored by the
    oracle's CTE chain. Embarrassingly parallel.
    """
    pats = PII_PATTERNS if patterns is None else patterns

    def f(t: pa.Table) -> pa.Table:
        cur = t[text_col]
        total = None
        for _name, pat, tok in pats:
            c = pc.count_substring_regex(cur, pat)
            total = c if total is None else pc.add(total, c)
            cur = pc.replace_substring_regex(cur, pattern=pat,
                                             replacement=tok)
        t = t.append_column(out, cur)
        return t.append_column("n_pii", pc.cast(
            pc.fill_null(total, 0), pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def pii_oracle_sql(source_sql: str, text_col: str = "text",
                   *, key_cols: str = "doc_id",
                   out: str = "text_redacted") -> str:
    """DuckDB twin of :func:`redact_pii` built from the SAME pattern
    literals — a CTE chain of len(regexp_extract_all) + regexp_replace
    per pattern, counts summed across stages."""
    sql = f"WITH __pii_s0 AS ({source_sql})"
    prev, counts = "__pii_s0", []
    # __-prefixed aliases: a source column named c1/s1 must not collide
    for i, (_name, pat, tok) in enumerate(PII_PATTERNS, start=1):
        counts.append(f"__pii_c{i}")
        sql += (
            f", __pii_s{i} AS (SELECT * EXCLUDE ({text_col}), "
            f"len(regexp_extract_all({text_col}, '{pat}')) AS __pii_c{i}, "
            f"regexp_replace({text_col}, '{pat}', '{tok}', 'g') "
            f"AS {text_col} FROM {prev})")
        prev = f"__pii_s{i}"
    total = " + ".join(f"COALESCE({c}, 0)" for c in counts)
    return (f"{sql} SELECT {key_cols}, {text_col} AS {out}, "
            f"CAST({total} AS BIGINT) AS n_pii FROM {prev}")


# ---------------------------------------------------------------------------
# test-set decontamination
# ---------------------------------------------------------------------------

def build_shingle_blocklist(ds, text_col: str = "text", *, n: int = 3
                            ) -> frozenset:
    """Distinct word-``n``-gram shingles of a TEST SET, as a frozenset of
    space-joined strings ready to ``ray.put``.

    Per-block kernel emits each block's distinct shingles only; the
    driver unions them. The test set is the small side by definition
    (benchmark suites are MBs, not TBs) — the corpus being decontaminated
    never materializes.
    """
    def shingles(t: pa.Table) -> pa.Table:
        flat, owners = split_ws(t[text_col])
        codes, _ = token_codes(flat)
        gcodes, gpos = _gram_codes(codes, owners, n)
        if len(gcodes) == 0:
            return pa.table({"shingle": pa.array([], type=pa.string())})
        _, first = np.unique(gcodes, return_index=True)
        return pa.table({"shingle": _shingle_strings(flat, gpos[first], n)})

    out = set()
    for b in ds.map_batches(shingles, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"):
        out.update(b["shingle"].to_pylist())
    return frozenset(out)


class _Decontaminator:
    """Per-process stage state: per-batch distinct-shingle overlap vs a
    broadcast blocklist. ``ray.get`` of the blocklist once per process
    (__init__) — converted ONCE to an Arrow value set for ``pc.is_in`` —
    and membership tested once per UNIQUE shingle per batch (shingle
    strings are only BUILT for unique gram codes — first-occurrence
    positions). Arrow end-to-end; no pandas object arrays."""

    def __init__(self, blocklist_ref, text_col: str, n: int):
        bl = (ray.get(blocklist_ref)
              if isinstance(blocklist_ref, ray.ObjectRef)
              else blocklist_ref)
        self.bl_set = pa.array(sorted(bl), type=pa.string())
        self.text_col, self.n = text_col, n

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, owners = split_ws(t[self.text_col])
        codes, _ = token_codes(flat)
        gcodes, gpos = _gram_codes(codes, owners, self.n)
        n_rows = t.num_rows
        n_cont = np.zeros(n_rows, dtype=np.int64)
        if len(gcodes):
            u, first, inv = np.unique(gcodes, return_index=True,
                                      return_inverse=True)
            s = _shingle_strings(flat, gpos[first], self.n)
            memb = pc.is_in(s, value_set=self.bl_set) \
                .to_numpy(zero_copy_only=False).astype(bool)
            hit = memb[inv]
            gown = owners[gpos]
            # distinct contaminated shingles per row
            pair = np.unique(gown[hit] * np.int64(len(u)) + inv[hit])
            n_cont = np.bincount((pair // len(u)).astype(np.int64),
                                 minlength=n_rows)
        t = t.append_column("n_contaminated", pa.array(n_cont,
                                                       type=pa.int64()))
        return t.append_column("contaminated", pa.array(n_cont > 0))


from functools import lru_cache


@lru_cache(maxsize=4)
def _decontaminator(blocklist_ref, text_col: str, n: int) -> _Decontaminator:
    # bounded: entries hold resolved blocklists and pin their ObjectRefs
    return _Decontaminator(blocklist_ref, text_col, n)


def decontaminate(ds, blocklist, text_col: str = "text", *, n: int = 3,
                  concurrency=None):
    """Append ``n_contaminated`` (#distinct shingles shared with the
    blocklist) and ``contaminated`` per document.

    ``blocklist`` is a frozenset or an ObjectRef to one (``ray.put`` it
    once for cluster-wide reuse). Default (concurrency=None) runs as
    plain tasks with the blocklist resolved ONCE per worker process
    (lru_cache) — parallelism scales to every core; pass
    concurrency=(lo, hi) to pin an actor pool instead. No shuffle; the
    corpus streams through.
    """
    if isinstance(blocklist, (set, list)):
        blocklist = frozenset(blocklist)      # lru_cache key must hash
    if concurrency is None:
        return ds.map_batches(
            lambda t, _r=blocklist, _c=text_col, _n=n:
                _decontaminator(_r, _c, _n)(t),
            batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        _Decontaminator, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, num_cpus=0.5,
        fn_constructor_kwargs={"blocklist_ref": blocklist,
                               "text_col": text_col, "n": n})


def normalize_text(ds, text_col: str = "text", *, out: Optional[str] = None,
                   lower: bool = True, collapse_ws: bool = True,
                   strip_punct: bool = False):
    """Standard pre-tokenization normalization: lowercase, whitespace
    collapse (any run of whitespace → one space, ends trimmed), optional
    punctuation stripping. Pure ``pyarrow.compute`` kernels (utf8_lower +
    RE2 replace), NULL text stays NULL; in-place unless ``out`` names a
    new column. Embarrassingly parallel; the RE2 patterns are shared
    verbatim with the DuckDB twin (regexp_replace ... 'g')."""
    dst = out or text_col

    def f(t: pa.Table) -> pa.Table:
        cur = t[text_col]
        if lower:
            cur = pc.utf8_lower(cur)
        if strip_punct:
            cur = pc.replace_substring_regex(cur, pattern=r"[^\w\s]",
                                             replacement="")
        if collapse_ws:
            cur = pc.replace_substring_regex(cur, pattern=r"\s+",
                                             replacement=" ")
            cur = pc.utf8_trim(cur, " ")
        if dst in t.column_names:
            return t.set_column(t.column_names.index(dst), dst, cur)
        return t.append_column(dst, cur)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# repeated-span masking (distributable exact-substring dedup)
# ---------------------------------------------------------------------------

def _batch_gram_counts(t: pa.Table, text_col: str, k: int) -> pa.Table:
    flat, owners = split_ws(t[text_col])
    codes, _ = token_codes(flat)
    gcodes, gpos = _gram_codes(codes, owners, k)
    if len(gcodes) == 0:
        return pa.table({"gram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    u, first, inv = np.unique(gcodes, return_index=True,
                              return_inverse=True)
    grams = _shingle_strings(flat, gpos[first], k)
    n = np.bincount(inv, minlength=len(u)).astype(np.int64)
    return pa.table({"gram": grams, "n": pa.array(n)})


def find_repeated_spans(ds, *, text_col: str = "text", k: int = 5,
                        min_count: int = 2):
    """Word k-grams occurring ``>= min_count`` times corpus-wide →
    a ``(gram, n)`` Dataset. Per-batch counts are pre-combined (one row
    per DISTINCT gram per batch), then summed through the int-hash count
    exchange (``lm._string_count_exchange``) — the ngram-vocabulary
    cost class: gram strings ship once per distinct-per-block gram."""
    from saber_ray.stages.lm import _string_count_exchange
    if k < 2:
        raise ValueError(f"span length k must be >= 2, got {k}")
    parts = ds.map_batches(
        lambda t, _c=text_col, _k=k: _batch_gram_counts(t, _c, _k),
        batch_format="pyarrow", zero_copy_batch=True)
    agg = _string_count_exchange(parts, "gram", "n")

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n"],
                                         pa.scalar(min_count, pa.int64())))

    return agg.map_batches(keep, batch_format="pyarrow",
                           zero_copy_batch=True)


class _SpanMasker:
    """Per-process stage state: mask tokens covered by any frequent
    k-gram occurrence. The frequent-span set is the broadcast small side
    (resolved once per process, the ``_Decontaminator`` discipline);
    membership is probed once per UNIQUE gram per batch, coverage is one
    difference-array cumsum over the flat token buffer."""

    def __init__(self, spans_ref, text_col: str, k: int):
        sp = (ray.get(spans_ref)
              if isinstance(spans_ref, ray.ObjectRef) else spans_ref)
        self.span_set = pa.array(sorted(sp), type=pa.string())
        self.text_col, self.k = text_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, owners = split_ws(t[self.text_col])
        n_rows, n_tok = t.num_rows, len(flat)
        covered = np.zeros(n_tok, dtype=bool)
        if n_tok:
            codes, _ = token_codes(flat)
            gcodes, gpos = _gram_codes(codes, owners, self.k)
            if len(gcodes):
                u, first, inv = np.unique(gcodes, return_index=True,
                                          return_inverse=True)
                s = _shingle_strings(flat, gpos[first], self.k)
                memb = pc.is_in(s, value_set=self.span_set) \
                    .to_numpy(zero_copy_only=False).astype(bool)
                hitpos = gpos[memb[inv]]
                if len(hitpos):
                    # a gram is valid only within one owner row, so the
                    # [p, p+k) ranges never cross rows
                    diff = np.zeros(n_tok + 1, dtype=np.int64)
                    np.add.at(diff, hitpos, 1)
                    np.add.at(diff, hitpos + self.k, -1)
                    covered = np.cumsum(diff[:-1]) > 0
        kept = ~covered
        n_masked = np.bincount(owners[covered], minlength=n_rows) \
            if n_tok else np.zeros(n_rows, dtype=np.int64)
        kept_counts = np.bincount(owners[kept], minlength=n_rows) \
            if n_tok else np.zeros(n_rows, dtype=np.int64)
        offsets = np.concatenate(([0], np.cumsum(kept_counts))) \
            .astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets), compact_array(flat.filter(pa.array(kept)))
            if n_tok else pa.array([], pa.string()))
        joined = pc.binary_join(lists, " ").cast(pa.string())
        t = t.set_column(t.column_names.index(self.text_col),
                         self.text_col, joined)
        return t.append_column(
            "n_masked", pa.array(n_masked.astype(np.int64)))


from saber_ray.core.aggregates import compact_array  # noqa: E402


@lru_cache(maxsize=4)
def _span_masker(spans_ref, text_col: str, k: int) -> _SpanMasker:
    # bounded: entries hold resolved span sets and pin their ObjectRefs
    return _SpanMasker(spans_ref, text_col, k)


def mask_repeated_spans(ds, *, text_col: str = "text", k: int = 5,
                        min_count: int = 2, spans=None,
                        concurrency=None):
    """Remove every token covered by a word k-gram that repeats
    ``>= min_count`` times corpus-wide — the distributable form of
    exact-substring dedup (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better": their suffix-array ExactSubstr
    removes repeated >= 50-byte spans; fixed-length k-gram coverage is
    the shuffle-friendly approximation). Rewrites ``text_col`` (kept
    tokens rejoined with ' ') and appends ``n_masked``.

    Two corpus scans total: one counting pass (``find_repeated_spans``
    → driver-collected, ``ray.put`` once) and one masking pass. The
    frequent-span set must fit the driver/worker heap — raise
    ``min_count`` (or pre-filter) for corpora where it wouldn't; pass
    ``spans`` (iterable or ObjectRef) to skip the counting pass.

    ALL occurrences of a frequent span are removed, including the first
    — the self-inverse convention that keeps the SQL twin one range
    join (DuckDB oracle in the ``mask_repeated_spans`` gate); documents
    shorter than k words are untouched.
    """
    if spans is None:
        freq = find_repeated_spans(ds, text_col=text_col, k=k,
                                   min_count=min_count)
        vals: list = []
        for b in freq.iter_batches(batch_size=None, batch_format="pyarrow"):
            vals.extend(b["gram"].to_pylist())
        spans = frozenset(vals)
    if isinstance(spans, (set, list, tuple)):
        spans = frozenset(spans)
    if concurrency is None:
        return ds.map_batches(
            lambda t, _r=spans, _c=text_col, _k=k:
                _span_masker(_r, _c, _k)(t),
            batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        _SpanMasker, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, num_cpus=0.5,
        fn_constructor_kwargs={"spans_ref": spans,
                               "text_col": text_col, "k": k})


# ---------------------------------------------------------------------------
# HTML / boilerplate stripping
# ---------------------------------------------------------------------------

# (kind, pattern-or-literal, replacement) applied IN ORDER; regex steps are
# RE2 (shared dialect between pyarrow and DuckDB — no backreferences used),
# literal steps are plain substring replaces. &amp; decodes LAST so
# double-escaped entities resolve one level per pass, like a single-pass
# HTML decoder ("&amp;lt;" → "&lt;", not "<").
HTML_STRIP_STEPS: list[tuple[str, str, str]] = [
    ("re", r"(?s)<!--.*?-->", " "),
    ("re", r"(?is)<script\b.*?</script\s*>", " "),
    ("re", r"(?is)<style\b.*?</style\s*>", " "),
    ("re", r"(?s)<[^>]*>", " "),
    ("lit", "&nbsp;", " "),
    ("lit", "&lt;", "<"),
    ("lit", "&gt;", ">"),
    ("lit", "&quot;", '"'),
    ("lit", "&#39;", "'"),
    ("lit", "&amp;", "&"),
]


def strip_html(ds, text_col: str = "text", *, out: Optional[str] = None,
               collapse: bool = True):
    """Remove HTML boilerplate from a text column: comments, whole
    <script>/<style> blocks, every remaining tag, then the six common
    entities; ``collapse=True`` squeezes whitespace runs to one space and
    trims. Pure vectorized RE2 + literal-replace kernels, NULL text stays
    NULL; embarrassingly parallel (no shuffle). ``strip_html_sql`` emits a
    value-exact DuckDB twin from the SAME step table."""
    dst = out or text_col

    def f(t: pa.Table) -> pa.Table:
        cur = t[text_col]
        for kind, pat, rep in HTML_STRIP_STEPS:
            if kind == "re":
                cur = pc.replace_substring_regex(cur, pattern=pat,
                                                 replacement=rep)
            else:
                cur = pc.replace_substring(cur, pattern=pat,
                                           replacement=rep)
        if collapse:
            # \s in RE2 is ASCII-only on both engines; trim spaces only
            # (SQL trim() default) — utf8_trim_whitespace would also strip
            # U+00A0 etc. and diverge from the twin
            cur = pc.utf8_trim(
                pc.replace_substring_regex(cur, pattern=r"\s+",
                                           replacement=" "),
                characters=" ")
        if dst in t.column_names:
            return t.set_column(t.column_names.index(dst), dst, cur)
        return t.append_column(dst, cur)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def strip_html_sql(col_expr: str, *, collapse: bool = True) -> str:
    """Nested-expression DuckDB twin of :func:`strip_html` over
    ``col_expr`` (built from the same HTML_STRIP_STEPS literals)."""
    e = col_expr
    for kind, pat, rep in HTML_STRIP_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        if kind == "re":
            e = f"regexp_replace({e}, '{p}', '{r}', 'g')"
        else:
            e = f"replace({e}, '{p}', '{r}')"
    if collapse:
        e = f"trim(regexp_replace({e}, '\\s+', ' ', 'g'))"
    return e
