"""Deterministic sampling operators.

The reference has no sampling (SURVEY.md §2.7); these are the scale
extensions a training-data pipeline needs, built to be (a) deterministic
across runs/partitionings and (b) SQL-expressible so the conformance oracle
can check values, not just row counts.

Both use a Knuth multiplicative hash over an integer key, computed with the
SAME int64-safe arithmetic the SQL twin uses:

    h(id) = ((id % 2^31) * 2654435761 + salt) % 2^32

(`(2^31-1) * 2654435761 ≈ 5.7e18` stays inside int64 — no overflow
divergence between numpy and SQL engines.)

- ``hash_sample``: keep rows with ``h(id) < fraction * 2^32`` — a stateless,
  embarrassingly-parallel Bernoulli sample that is stable under re-sharding
  (the same rows survive at any block layout, unlike ``ds.random_sample``).
- ``bottom_k_sample``: the k rows with the smallest ``h(id)`` — a
  deterministic reservoir-sample equivalent (uniform over keys, exactly k),
  computed with the top-k partial/fan-in shape (stages/topk.py): per-block
  k-best, one tiny merge, NO total sort.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = 2654435761
_M31 = 2 ** 31
_M32 = 2 ** 32


def _hash_col(t: pa.Table, key: str, salt: int
              ) -> tuple[np.ndarray, Optional[np.ndarray]]:
    """(int64 hash per row, valid-key mask or None).

    Null keys are filled in the ARROW domain before extraction — a nullable
    int column otherwise reaches numpy as float64, where NaN→int64 staging
    invents INT64_MIN hashes and large keys round differently depending on
    whether THIS block happens to contain a null (breaking re-sharding
    stability). A NULL key hashes to nothing: callers must drop/deprioritize
    masked rows (the SQL twin's NULL predicate excludes them)."""
    k = t[key].cast(pa.int64())
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    valid = None
    if k.null_count:
        valid = k.is_valid().to_numpy(zero_copy_only=False)
        k = pc.fill_null(k, 0)
    kn = k.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    # numpy % is floored (always non-negative for positive modulus); SQL %
    # is sign-preserving, so the twin wraps it in the canonical
    # ((x % m) + m) % m — identical values for negative keys too
    return (((kn % _M31) * _KNUTH + salt) % _M32).astype(np.int64), valid


def sample_sql_predicate(key: str, fraction: float, salt: int = 0) -> str:
    """The SQL twin of hash_sample's predicate (for oracle queries)."""
    thr = int(fraction * _M32)
    h = (f"(((((({key} % {_M31}) + {_M31}) % {_M31}) * {_KNUTH} + {salt}) "
         f"% {_M32}) + {_M32}) % {_M32}")
    return f"({h}) < {thr}"


def hash_sample(ds, key: str, fraction: float, *, salt: int = 0):
    """Deterministic Bernoulli sample: keep ≈``fraction`` of rows by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thr = int(fraction * _M32)

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h, valid = _hash_col(t, key, salt)
        keep = h < thr
        if valid is not None:
            keep &= valid            # NULL keys never sample (SQL twin)
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def bottom_k_sample(ds, key: str, k: int, *, salt: int = 0,
                    keep_priority: bool = False):
    """Exactly-k deterministic uniform sample: the k smallest key hashes.

    Equivalent to a seeded reservoir sample but reproducible under any
    partitioning; distributed as per-block k-best partials + one fan-in
    merge (no all-to-all sort)."""
    from saber_ray.stages.topk import topk

    def add_prio(t: pa.Table) -> pa.Table:
        h, valid = _hash_col(t, key, salt)
        if valid is not None:
            # NULL keys sort last (can only be picked if < k real keys) —
            # matches SQL ORDER BY ... NULLS LAST
            h = np.where(valid, h, np.iinfo(np.int64).max)
        return t.append_column("__prio", pa.array(h, type=pa.int64()))

    out = topk(ds.map_batches(add_prio, batch_format="pyarrow",
                              zero_copy_batch=True),
               ["__prio", key], k, descending=False)
    return out if keep_priority else out.drop_columns(["__prio"])


def stratified_sample(ds, group_keys, key: str, k: int, *, salt: int = 0):
    """Exactly-k deterministic uniform sample PER GROUP (balanced training
    mixes: k docs per language, k conversations per tool, ...).

    SQL twin: ``ROW_NUMBER() OVER (PARTITION BY group_keys ORDER BY h(key),
    key) <= k`` with the canonical hash above. Distributed with the
    grouped_topk shape: per-block per-group k-best partials → ONE key
    exchange shipping ≤ k rows per (block, group) → per-block final k. NULL
    group keys form one group (SQL PARTITION BY); NULL sample keys sort
    last (NULLS LAST)."""
    from saber_ray.stages.topk import grouped_topk

    def add_prio(t: pa.Table) -> pa.Table:
        h, valid = _hash_col(t, key, salt)
        if valid is not None:
            h = np.where(valid, h, np.iinfo(np.int64).max)
        return t.append_column("__prio", pa.array(h, type=pa.int64()))

    out = grouped_topk(ds.map_batches(add_prio, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       group_keys, ["__prio", key], k, descending=False)
    return out.drop_columns(["__prio"])
