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


# ---------------------------------------------------------------------------
# deterministic split + corpus mixing
# ---------------------------------------------------------------------------

def _split_thresholds(splits: dict[str, float]) -> list[tuple[str, int]]:
    """(label, exclusive upper hash bound) in declaration order; bounds are
    exact cumulative integer thresholds over the 2^32 hash space, the SAME
    integers the SQL twin compares against."""
    if not splits:
        raise ValueError("splits must name at least one label")
    total = 0.0
    out: list[tuple[str, int]] = []
    acc = 0
    for label, frac in splits.items():
        if frac < 0:
            raise ValueError(f"negative fraction for {label!r}")
        total += frac
        acc += int(frac * _M32)
        out.append((label, acc))
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    if abs(total - 1.0) <= 1e-9:
        out[-1] = (out[-1][0], _M32)     # close the last bucket exactly
    return out


def hash_split(ds, key: str, splits: dict[str, float], *, salt: int = 0,
               label_col: str = "split"):
    """Deterministic train/val/test assignment: label each row by which
    cumulative hash bucket ``h(key)`` lands in. Stable under re-sharding
    and across runs (same Knuth hash as hash_sample); rows falling past the
    last bucket (when fractions sum < 1) and NULL keys get a NULL label.
    SQL twin: ``split_sql_case`` below — identical integer thresholds, so
    the oracle matches by value."""
    bounds = _split_thresholds(splits)
    cuts = np.array([b for _, b in bounds], dtype=np.int64)
    labels = pa.array([lbl for lbl, _ in bounds], pa.string())

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(label_col,
                                   pa.array([], pa.string()))
        h, valid = _hash_col(t, key, salt)
        idx = np.searchsorted(cuts, h, side="right")
        ok = idx < len(cuts)
        if valid is not None:
            ok &= valid
        lab = labels.take(pa.array(np.where(ok, idx, 0), type=pa.int64()))
        lab = pc.if_else(pa.array(ok), lab, pa.scalar(None, pa.string()))
        return t.append_column(label_col, lab)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def split_sql_case(key: str, splits: dict[str, float], salt: int = 0) -> str:
    """SQL CASE expression computing hash_split's label column."""
    bounds = _split_thresholds(splits)
    h = (f"(((((({key} % {_M31}) + {_M31}) % {_M31}) * {_KNUTH} + {salt}) "
         f"% {_M32}) + {_M32}) % {_M32}")
    arms = " ".join(f"WHEN ({h}) < {b} THEN '{lbl}'" for lbl, b in bounds)
    return f"CASE {arms} ELSE NULL END"


def mix_datasets(sources: dict[str, tuple], key: str, *, salt: int = 0,
                 source_col: str = "source"):
    """Weighted deterministic corpus mixing: for each named source
    ``{name: (dataset, rate)}``, keep a ``rate`` hash-sample and union the
    survivors with a ``source`` tag — the data-mixture step of a training
    pipeline (e.g. 100% wiki + 30% web + 5% logs), reproducible at any
    partitioning.

    The per-source salt is added BEFORE the Knuth multiply
    (``h = ((key % 2^31 + s) * 2654435761) % 2^32``): an additive
    post-multiply salt (hash_sample's) only rotates the threshold window,
    which would make two sources over the same key universe sample nearly
    the SAME rows — pre-multiply salting decorrelates them (measured
    Jaccard ≈ rate/(2-rate), the independent-sample value). ``mix_sql``
    emits the UNION ALL twin with identical arithmetic. Source schemas
    must already agree (select the shared columns first); streams, never
    materializes."""
    parts = []
    for i, name in enumerate(sorted(sources)):
        ds, rate = sources[name]
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0, 1]")
        s = salt + 1000003 * i
        thr = int(rate * _M32)

        def pick(t: pa.Table, _s=s, _thr=thr, _n=name) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column(source_col,
                                       pa.array([], pa.string()))
            k = t[key].cast(pa.int64())
            if isinstance(k, pa.ChunkedArray):
                k = k.combine_chunks()
            valid = (k.is_valid().to_numpy(zero_copy_only=False)
                     if k.null_count else None)
            kn = pc.fill_null(k, 0).to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            hh = (((kn % _M31) + _s) * _KNUTH) % _M32
            keep = hh < _thr
            if valid is not None:
                keep &= valid              # NULL keys never sample
            out = t.filter(pa.array(keep))
            return out.append_column(
                source_col, pa.array(np.full(out.num_rows, _n,
                                             dtype=object), pa.string()))

        parts.append(ds.map_batches(pick, batch_format="pyarrow",
                                    zero_copy_batch=True))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def mix_sql(sources: dict[str, tuple], key: str, *, salt: int = 0,
            source_col: str = "source", columns: str = "*") -> str:
    """The UNION ALL twin of mix_datasets: ``{name: (table_sql, rate)}``."""
    selects = []
    for i, name in enumerate(sorted(sources)):
        table_sql, rate = sources[name]
        s = salt + 1000003 * i
        thr = int(rate * _M32)
        h = (f"((((({key} % {_M31}) + {_M31}) % {_M31}) + {s}) * {_KNUTH}) "
             f"% {_M32}")
        pred = f"((({h}) + {_M32}) % {_M32}) < {thr}"
        selects.append(f"SELECT {columns}, '{name}' AS {source_col} "
                       f"FROM {table_sql} WHERE {pred}")
    return " UNION ALL ".join(selects)
