"""ASCII byte-level text-scan kernels — the fast path under the RE2 ones.

Profiling the Arrow text scorers shows the RE2 character-class kernels
dominate (``count_substring_regex('[A-Za-z]')`` + ``split_pattern_regex``
are ~75% of quality/lang-id wall time); for a pure-ASCII batch the same
scans are table lookups over the string column's flat byte buffer:

- ``count_class``  — per-row count of bytes in a 256-entry LUT class
  (one ``lut[data]`` gather + one cumsum; replaces a RE2 scan),
- ``token_runs``   — maximal runs of class bytes per row (token start/end
  positions + owner row; replaces ``split_pattern_regex`` + flatten),
- ``run_hashes``   — the engine hash (core/hashing.substring_hashes) of
  each run, so stopword membership is ``searchsorted`` over ~40 hashed
  lexicon words instead of string ``is_in`` — collision-free in practice
  (64-bit, lexicons are tiny) and ONLY used for scoring heuristics, never
  for value-bearing output columns.

Byte == codepoint only for ASCII, so every consumer first checks
``all_ascii`` (one vectorized max) and falls back to the RE2 kernels for
batches with any multi-byte character. The class LUTs mirror RE2 locale-
free semantics exactly (``\\w = [0-9A-Za-z_]``, ``\\s = [\\t\\n\\f\\r ]``
— NO vertical tab; verified against pyarrow's RE2 per byte).
"""

from __future__ import annotations

import numpy as np

from saber_ray.core.hashing import substring_hashes

__all__ = ["all_ascii", "class_lut", "count_class", "token_runs",
           "run_hashes", "lower_ascii", "LUT_ALPHA", "LUT_WORD",
           "LUT_SPACE", "LUT_PUNCT", "LOWER"]


def class_lut(members: bytes) -> np.ndarray:
    lut = np.zeros(256, dtype=bool)
    lut[np.frombuffer(members, dtype=np.uint8)] = True
    return lut


_ASCII_ALPHA = bytes(range(65, 91)) + bytes(range(97, 123))
_ASCII_DIGIT = bytes(range(48, 58))
LUT_ALPHA = class_lut(_ASCII_ALPHA)
LUT_ALNUM = class_lut(_ASCII_ALPHA + _ASCII_DIGIT)             # [A-Za-z0-9]
LUT_WORD = class_lut(_ASCII_ALPHA + _ASCII_DIGIT + b"_")       # RE2 \w
LUT_SPACE = class_lut(b"\t\n\f\r ")                            # RE2 \s
LUT_PUNCT = ~(LUT_WORD | LUT_SPACE)                            # [^\w\s]
LUT_PUNCT[128:] = False        # multi-byte chars never reach the fast path

LOWER = np.arange(256, dtype=np.uint8)
LOWER[65:91] += 32


def all_ascii(data: np.ndarray) -> bool:
    """True iff every byte is < 0x80 (byte == codepoint)."""
    return bool(data.size == 0 or int(data.max()) < 0x80)


def lower_ascii(data: np.ndarray) -> np.ndarray:
    return LOWER[data]


def count_class(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                lut: np.ndarray, mask: np.ndarray = None) -> np.ndarray:
    """Per-row count of class bytes: one gather + one segment reduceat.

    Rows are CONTIGUOUS in ``data`` (string offsets — ends[r] ==
    starts[r+1]), so ``np.add.reduceat`` over the row starts sums exactly
    each row's bytes. The earlier int64-cumsum version allocated 8 bytes
    per BUFFER byte — the dominant memory traffic of the whole scorer
    under concurrent workers (this host saturates memory bandwidth long
    before CPU); reduceat keeps the temporaries at one bool per byte.
    Pass ``mask`` (= lut[data]) to reuse an existing gather."""
    n_rows = len(starts)
    if data.size == 0 or n_rows == 0:
        return np.zeros(n_rows, dtype=np.int64)
    m = lut[data] if mask is None else mask
    lens = ends - starts
    out = np.zeros(n_rows, dtype=np.int64)
    # rows with starts == len(data) (an empty suffix) are invalid reduceat
    # indices; they are a suffix, so excluding them leaves the last valid
    # row's segment correctly running to the end of the buffer
    valid = starts < len(data)
    if valid.any():
        out[valid] = np.add.reduceat(m, starts[valid], dtype=np.int64)
    out[lens == 0] = 0          # reduceat yields m[idx] for empty segments
    return out


def token_runs(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
               lut: np.ndarray, mask: np.ndarray = None
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Maximal runs of class bytes per row → (run_starts, run_ends,
    owner row per run). Rows are contiguous in ``data``, so run breaks
    are forced at row boundaries (a run never crosses rows even when the
    buffer bytes are adjacent). Pass ``mask`` (= lut[data]) to reuse an
    existing gather (memory traffic, see count_class)."""
    n = len(data)
    if n == 0:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64),
                np.zeros(0, dtype=np.int64))
    m = lut[data] if mask is None else mask
    # boundary[i] = True when position i starts a new segment relative to
    # i-1 — either the class flips or a row begins at i
    rs = m.copy()
    rs[1:] &= ~m[:-1]
    re = m.copy()
    re[:-1] &= ~m[1:]
    # force breaks at row starts/ends: row r covers [starts[r], ends[r])
    inner = starts[(starts > 0) & (starts < n)]
    if len(inner):
        rs[inner] = m[inner]
        prev = inner - 1
        re[prev] = m[prev]
    run_starts = np.flatnonzero(rs)
    run_ends = np.flatnonzero(re) + 1
    # string offsets are contiguous (ends[r] == starts[r+1]), so the LAST
    # row with starts[r] <= p is exactly the row containing p — empty rows
    # (duplicate starts) sort before it and can never own a run
    owner = np.searchsorted(starts, run_starts, side="right") - 1
    return run_starts, run_ends, owner


def run_hashes(data: np.ndarray, run_starts: np.ndarray,
               run_ends: np.ndarray) -> np.ndarray:
    """Engine hash per [start, end) run — comparable with
    ``hash_column`` of whole Arrow strings (hashing.substring_hashes)."""
    return substring_hashes(data, run_starts, run_ends)


_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def pack_runs(data: np.ndarray, run_starts: np.ndarray,
              run_ends: np.ndarray, width: int) -> np.ndarray:
    """Pack each run's first ``width`` (<= 8) bytes little-endian into one
    uint64; runs LONGER than width get a sentinel that matches nothing.

    EXACT equality for short tokens (no hashing, zero collision risk):
    class runs cannot contain NUL bytes, so zero-padding is unambiguous,
    and the all-0xFF sentinel is unreachable for ASCII runs. ``width``
    passes of one clipped gather each — for stopword lexicons (words of
    2-5 bytes) this replaces per-token polynomial hashing entirely."""
    if width > 8:
        raise ValueError("pack width > 8 bytes does not fit uint64")
    n = len(data)
    ln = run_ends - run_starts
    v = np.zeros(len(run_starts), dtype=np.uint64)
    for k in range(width):
        take = np.minimum(run_starts + k, max(n - 1, 0))
        b = data[take].astype(np.uint64) if n else \
            np.zeros(len(run_starts), dtype=np.uint64)
        b *= (k < ln)
        v |= b << np.uint64(8 * k)
    v[ln > width] = _SENTINEL
    return v


def pack_words(words) -> tuple[np.ndarray, int]:
    """(sorted packed uint64 values, pack width) for a small lexicon —
    the searchsorted counterpart of :func:`pack_runs`."""
    enc = [w.encode("utf-8") for w in words]
    width = max((len(b) for b in enc), default=1)
    if width > 8:
        raise ValueError("lexicon word longer than 8 bytes")
    vals = np.array([int.from_bytes(b, "little") for b in enc],
                    dtype=np.uint64)
    return np.sort(vals), width


def member_counts(packed: np.ndarray, lex_sorted: np.ndarray) -> np.ndarray:
    """Boolean membership of packed runs in a sorted packed lexicon."""
    if len(lex_sorted) == 0 or len(packed) == 0:
        return np.zeros(len(packed), dtype=bool)
    pos = np.searchsorted(lex_sorted, packed)
    pos[pos == len(lex_sorted)] = 0
    return lex_sorted[pos] == packed


def winnow_sketches(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                    k: int, window: int, base: np.uint64
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing sketch per row over the flat byte buffer → (sorted unique
    fingerprint values, per-row value counts). Replaces the per-document
    Python ``.map`` (VERDICT r3 #4): k vector passes hash EVERY buffer
    position once, per-row gram positions come from offsets (grams never
    cross rows), sliding minima are one stride-view min, and per-row
    dedup+sort is one lexsort. Semantics per row r (len = ends-starts):

    - len < k            → no fingerprints,
    - 1 <= grams < window → [min(gram hashes)],
    - grams >= window     → sorted unique sliding-window minima.
    """
    n_rows = len(starts)
    lens = ends - starts
    cnt = np.maximum(lens - np.int64(k) + 1, 0)       # grams per row
    total = int(cnt.sum())
    if total == 0:
        return (np.zeros(0, dtype=np.uint64),
                np.zeros(n_rows, dtype=np.int64))
    n = len(data)
    hall = np.zeros(n - k + 1, dtype=np.uint64)       # hash at every pos
    powers = np.power(base, np.arange(k, dtype=np.uint64),
                      dtype=np.uint64)
    for i in range(k):
        hall += data[i:n - k + 1 + i].astype(np.uint64) * powers[k - 1 - i]
    owners = np.repeat(np.arange(n_rows, dtype=np.int64), cnt)
    cum = np.concatenate(([0], np.cumsum(cnt)))
    intra = np.arange(total, dtype=np.int64) - cum[owners]
    g = hall[starts[owners] + intra]                  # row-major gram hashes
    if total >= window:
        from numpy.lib.stride_tricks import sliding_window_view
        wmin = sliding_window_view(g, window).min(axis=1)
        # window at flat j is valid iff it lies fully inside owner(j)'s run
        wvalid = intra[:len(wmin)] + window <= cnt[owners[:len(wmin)]]
        mvals, mown = wmin[wvalid], owners[:len(wmin)][wvalid]
    else:
        mvals = np.zeros(0, dtype=np.uint64)
        mown = np.zeros(0, dtype=np.int64)
    # short rows (0 < grams < window): one fingerprint = min of all grams
    short = np.flatnonzero((cnt > 0) & (cnt < window))
    if len(short):
        # [start, end) pairs interleaved so reduceat never reduces across
        # intervening rows; odd outputs (gap segments) are discarded
        idx = np.empty(2 * len(short), dtype=np.int64)
        idx[0::2] = cum[short]
        idx[1::2] = cum[short] + cnt[short]
        if idx[-1] == total:            # reduceat indices must be < len(g)
            idx = idx[:-1]
        smin = np.minimum.reduceat(g, idx)[0::2]
        mvals = np.concatenate((mvals, smin))
        mown = np.concatenate((mown, short))
    order = np.lexsort((mvals, mown))
    mvals, mown = mvals[order], mown[order]
    keep = np.ones(len(mvals), dtype=bool)
    keep[1:] = (mown[1:] != mown[:-1]) | (mvals[1:] != mvals[:-1])
    return mvals[keep], np.bincount(mown[keep], minlength=n_rows)
