"""Sequence packing: greedy next-fit bin packing of documents into fixed
token-budget training sequences.

The last preprocessing step of an LLM training pipeline: concatenate
documents (without splitting them) into sequences of at most ``capacity``
tokens, so the trainer sees dense, fixed-length batches. Absent from the
reference (a streaming engine never re-batches by content size —
SURVEY.md §2.7); the distribution problem is the interesting part: naive
packing depends on arrival order, which a distributed engine must not.

Determinism contract: documents are hash-bucketed (``bucket = h(order_col)
% buckets``, the sample.py Knuth hash — SQL-reproducible), packed greedily
in ``order_col`` order WITHIN each bucket, and buckets are independent —
so the full assignment (sequence id, position, token offset) is a pure
function of the data, identical at any block layout or cluster size.
Scale shape: ONE ``sort(__bucket)`` range exchange (single-key sort ⇒
every bucket lands whole in one block, the engine's co-location
invariant), then a per-bucket vectorized pass — sequence boundaries via
repeated ``np.searchsorted`` on the token cumsum (O(#sequences · log n)
per bucket, no per-row Python). ``buckets`` bounds per-reducer work: at
100 TB set it ≈ cluster cores × 4; each bucket must fit one worker's
block (docs/buckets rows).

Greedy next-fit (not first-fit-decreasing): a doc opens a new sequence
when it doesn't fit the current one; an oversize doc (> capacity) gets a
singleton sequence, flagged. Next-fit is the standard streaming-corpus
choice (stable under appends, preserves in-bucket document order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from saber_ray.stages.sample import _KNUTH, _M31, _M32

_BUCKET = "__pack_bucket"


def _bucket_of(kn: np.ndarray, buckets: int, salt: int) -> np.ndarray:
    return ((((kn % _M31) + salt) * _KNUTH) % _M32) % buckets


def pack_sequences(ds, capacity: int, *, tokens_col: str = "n_tokens",
                   order_col: str = "doc_id", buckets: int = 64,
                   salt: int = 0):
    """Assign each row ``seq_id`` (int64, ``bucket * 2^31 + local``),
    ``seq_pos`` (0-based rank in its sequence) and ``seq_off`` (tokens
    preceding it in its sequence), plus ``oversize``. ``tokens_col`` must
    be non-null and non-negative; ``order_col`` must be a unique integer
    key (ordering ties would make packing ambiguous)."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if buckets <= 0:
        raise ValueError("buckets must be positive")

    def add_bucket(t: pa.Table) -> pa.Table:
        if t[tokens_col].null_count:
            raise ValueError(f"pack_sequences: {tokens_col!r} has NULLs")
        k = t[order_col].cast(pa.int64())
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        if k.null_count:
            raise ValueError(f"pack_sequences: {order_col!r} has NULLs")
        kn = k.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        b = _bucket_of(kn, buckets, salt)
        return t.append_column(_BUCKET, pa.array(b, type=pa.int64()))

    def pack_block(t: pa.Table) -> pa.Table:
        base_cols = [c for c in t.column_names if c != _BUCKET]
        schema = pa.schema(
            [(c, t.schema.field(c).type) for c in base_cols]
            + [("seq_id", pa.int64()), ("seq_pos", pa.int64()),
               ("seq_off", pa.int64()), ("oversize", pa.bool_())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.combine_chunks()
        b = t[_BUCKET].to_numpy(zero_copy_only=False)
        o = t[order_col].cast(pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        tok = t[tokens_col].cast(pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        if (tok < 0).any():
            raise ValueError(f"pack_sequences: negative {tokens_col!r}")
        order = np.lexsort((o, b))
        bs, os_, ts = b[order], o[order], tok[order]
        if len(np.unique(os_)) != len(os_):
            # uniqueness within the block is necessary; cross-block
            # duplicates of order_col would also duplicate bucket+order
            # and land adjacent here, so this check is sufficient
            raise ValueError(f"pack_sequences: {order_col!r} not unique")
        n = len(bs)
        seq = np.empty(n, dtype=np.int64)
        off = np.empty(n, dtype=np.int64)
        starts = np.flatnonzero(np.concatenate(
            ([True], bs[1:] != bs[:-1])))
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            cs = np.cumsum(ts[s:e])
            local = 0
            i, base = 0, 0
            while i < e - s:
                j = int(np.searchsorted(cs, base + capacity, side="right"))
                if j <= i:
                    j = i + 1                      # oversize doc: singleton
                seq[s + i:s + j] = bs[s] * (2 ** 31) + local
                off[s + i:s + j] = np.concatenate(
                    ([0], cs[i:j - 1] - base)) if j > i + 1 else 0
                base = cs[j - 1]
                local += 1
                i = j
        pos = np.arange(n, dtype=np.int64)
        seq_start = np.maximum.accumulate(
            np.where(np.concatenate(([True], seq[1:] != seq[:-1])),
                     pos, 0))
        arrays = [t[c].take(pa.array(order)).combine_chunks()
                  for c in base_cols]
        arrays += [pa.array(seq), pa.array(pos - seq_start),
                   pa.array(off), pa.array(ts > capacity)]
        return pa.Table.from_arrays(arrays, schema=schema)

    return ds.map_batches(add_bucket, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .sort(_BUCKET) \
        .map_batches(pack_block, batch_format="pyarrow",
                     zero_copy_batch=True)


def pack_reference(doc_ids, tokens, capacity, buckets=64, salt=0):
    """Pure-python reference implementation (tests oracle): returns
    {doc_id: (seq_id, seq_pos, seq_off, oversize)}."""
    rows = sorted(zip(doc_ids, tokens),
                  key=lambda r: (_bucket_of(np.array([r[0]]), buckets,
                                            salt)[0], r[0]))
    out = {}
    cur_bucket, local, used, pos = None, -1, 0, 0
    for d, tk in rows:
        bkt = int(_bucket_of(np.array([d]), buckets, salt)[0])
        if bkt != cur_bucket:
            cur_bucket, local, used, pos = bkt, -1, None, 0
        if used is None or used + tk > capacity:
            local += 1
            used, pos = 0, 0
        out[d] = (bkt * 2 ** 31 + local, pos, used, tk > capacity)
        used += tk
        pos += 1
    return out


def pack_sql(source_sql: str, capacity: int, *,
             tokens_col: str = "n_tokens", order_col: str = "doc_id",
             buckets: int = 64, salt: int = 0, keep_cols: str = "") -> str:
    """Value-exact DuckDB twin of :func:`pack_sequences` — a recursive CTE
    that advances one sequence boundary per bucket per iteration (greedy
    next-fit is inherently sequential; the recursion is the SQL spelling
    of the same searchsorted loop). Iterations = max sequences per bucket."""
    m31, m32, k = _M31, _M32, _KNUTH
    extra = f", {keep_cols}" if keep_cols else ""
    return f"""
WITH RECURSIVE __pk_d AS (
  SELECT *,
         ((((({order_col} % {m31}) + {m31}) % {m31} + {salt}) * {k})
          % {m32} + {m32}) % {m32} % {buckets} AS __bkt,
         ROW_NUMBER() OVER (PARTITION BY ((((({order_col} % {m31}) + {m31})
          % {m31} + {salt}) * {k}) % {m32} + {m32}) % {m32} % {buckets}
          ORDER BY {order_col}) AS __rn,
         SUM({tokens_col}) OVER (PARTITION BY ((((({order_col} % {m31})
          + {m31}) % {m31} + {salt}) * {k}) % {m32} + {m32}) % {m32}
          % {buckets} ORDER BY {order_col}) AS __cs
  FROM ({source_sql})),
__pk_s(__bkt, __seq, __start, __base) AS (
  SELECT DISTINCT __bkt, 0::BIGINT, 1::BIGINT, 0::BIGINT FROM __pk_d
  UNION ALL
  SELECT s.__bkt, s.__seq + 1,
         GREATEST(COALESCE(MAX(CASE WHEN d.__cs <= s.__base + {capacity}
                  THEN d.__rn END), 0), s.__start) + 1,
         GREATEST(COALESCE(MAX(CASE WHEN d.__cs <= s.__base + {capacity}
                  THEN d.__cs END), 0),
                  COALESCE(MAX(CASE WHEN d.__rn = s.__start
                  THEN d.__cs END), 0))
  FROM __pk_s s JOIN __pk_d d
    ON d.__bkt = s.__bkt AND d.__rn >= s.__start
  GROUP BY s.__bkt, s.__seq, s.__start, s.__base),
__pk_x AS (
  SELECT __bkt, __seq, __start, __base,
         COALESCE(LEAD(__start) OVER (PARTITION BY __bkt ORDER BY __seq),
                  {2**62}) AS __next
  FROM __pk_s)
SELECT d.{order_col}, d.{tokens_col}{extra},
       d.__bkt * {2**31} + x.__seq AS seq_id,
       CAST(d.__rn - x.__start AS BIGINT) AS seq_pos,
       CAST(d.__cs - d.{tokens_col} - x.__base AS BIGINT) AS seq_off,
       d.{tokens_col} > {capacity} AS oversize
FROM __pk_d d JOIN __pk_x x
  ON d.__bkt = x.__bkt AND d.__rn >= x.__start AND d.__rn < x.__next"""
