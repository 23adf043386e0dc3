"""Mergeable heavy-hitters (frequent items) via Misra–Gries summaries.

The 100 TB problem: "top tools / domains / error strings by count" over a
column whose cardinality is too large for a full ``groupby`` — the exact
answer shuffles every distinct value. A Misra–Gries summary of capacity m
is a mergeable sketch (Agarwal et al., *Mergeable Summaries*, PODS'12):

- per block: exact value counts, then COMPRESS — subtract the (m+1)-th
  largest count from every count and keep the positives (≤ m survivors);
- merge: concatenate summaries, sum counts per value, compress once more.

Each compression undercounts every value it touched by exactly its cut, so
``true(v) - est(v) ≤ Σ(all cuts)`` for every v, and any value with true
count > Σ(cuts) is guaranteed present; Σ(cuts) ≤ n/(m+1). Each partial
carries its cut under a unique summary id, so the final merge recovers the
exact Σ — reported per row as ``max_undercount``. With capacity above the
column's distinct count no cut ever happens and the result is EXACT —
which is what makes the gate oracle-checkable (same trick as stats.py's
sketch quantiles).

Distribution shape: map_batches partials (≤ capacity rows each, a few KB)
→ ONE tiny fan-in (``repartition(1)``) summing ests per value and cuts per
summary id. Fan-in volume is O(blocks × capacity) summary rows — at 100k
1 GB-blocks and capacity 1024 that is ~100M tiny rows; raise block size or
lower capacity before reaching for a merge tree (a mid-tier merge cannot
track per-branch cuts exactly once summaries concatenate). The reference
has no frequency sketches at all (SURVEY.md §2.7).
"""

from __future__ import annotations

import uuid
from typing import Optional

import numpy as np
import pyarrow as pa

_VAL, _EST = "__hh_val", "__hh_est"
_DED, _SID = "__hh_ded", "__hh_sid"


def _counts(t: pa.Table, col: str) -> tuple[pa.Array, np.ndarray]:
    vc = pa.table({_VAL: t[col]}).group_by(
        [_VAL], use_threads=False).aggregate([([], "count_all")])
    vals = vc[_VAL]
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    counts = vc["count_all"].to_numpy(zero_copy_only=False) \
        .astype(np.int64, copy=False)
    return vals, counts


def _cut(counts: np.ndarray, capacity: int) -> int:
    """The Misra–Gries decrement: the (capacity+1)-th largest count
    (0 when everything fits)."""
    if len(counts) <= capacity:
        return 0
    return int(np.partition(counts, len(counts) - capacity - 1)
               [len(counts) - capacity - 1])


def heavy_hitters(ds, col: str, *, capacity: int = 1024,
                  k: Optional[int] = None):
    """Approximate top-k frequent values of ``col``.

    Output: (``col``, ``est_count``, ``max_undercount``) sorted by
    est_count desc then value (top ``k`` rows if given). Guarantees:
    ``est_count ≤ true ≤ est_count + max_undercount`` for every reported
    value; every value with true count > max_undercount is reported;
    max_undercount ≤ rows/(capacity+1). Exact (max_undercount = 0) when
    ``capacity`` is at least the column's distinct count. NULL is a value
    (one group), like SQL GROUP BY.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        vtype = t.schema.field(col).type
        if t.num_rows == 0:
            return pa.table({_VAL: pa.array([], vtype),
                             _EST: pa.array([], pa.int64()),
                             _DED: pa.array([], pa.int64()),
                             _SID: pa.array([], pa.string())})
        vals, counts = _counts(t, col)
        c = _cut(counts, capacity)
        if c:
            keep = counts > c
            vals = vals.filter(pa.array(keep))
            counts = counts[keep] - c
            if len(counts) == 0:
                # uniform block: the cut removed everything — still ship a
                # ledger-only row (est 0, filtered at finish) so the cut
                # is not lost from the undercount bound
                vals = pa.array([None], type=t.schema.field(col).type)
                counts = np.zeros(1, dtype=np.int64)
        n = len(counts)
        # the unique summary id exists ONLY to deduplicate the cut ledger
        # at the fan-in; ests/cuts (hence the output) are deterministic
        sid = uuid.uuid4().hex
        return pa.table({_VAL: vals,
                         _EST: pa.array(counts, type=pa.int64()),
                         _DED: pa.array(np.full(n, c), type=pa.int64()),
                         _SID: pa.array([sid] * n, type=pa.string())})

    def finish(t: pa.Table) -> pa.Table:
        vtype = t.schema.field(_VAL).type
        if t.num_rows == 0:
            return pa.table({col: pa.array([], vtype),
                             "est_count": pa.array([], pa.int64()),
                             "max_undercount": pa.array([], pa.int64())})
        led = pa.table({_SID: t[_SID], _DED: t[_DED]}).group_by(
            [_SID], use_threads=False).aggregate([(_DED, "max")])
        ded_total = int(np.sum(led[f"{_DED}_max"].to_numpy(
            zero_copy_only=False)))
        agg = pa.table({_VAL: t[_VAL], _EST: t[_EST]}).group_by(
            [_VAL], use_threads=False).aggregate([(_EST, "sum")])
        vals = agg[_VAL]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        counts = agg[f"{_EST}_sum"].to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        c = _cut(counts, capacity)
        if c:
            keep = counts > c
            vals = vals.filter(pa.array(keep))
            counts = counts[keep] - c
            ded_total += c
        pos = counts > 0            # drop ledger-only zero-est rows
        if not pos.all():
            vals = vals.filter(pa.array(pos))
            counts = counts[pos]
        # deterministic order: est desc, then value ascending (nulls last)
        order = pa.compute.sort_indices(
            pa.table({"e": pa.array(counts), "v": vals}),
            sort_keys=[("e", "descending"), ("v", "ascending")])
        order = order.to_numpy(zero_copy_only=False)
        if k is not None:
            order = order[:k]
        return pa.table({
            col: vals.take(pa.array(order)),
            "est_count": pa.array(counts[order], type=pa.int64()),
            "max_undercount": pa.array(
                np.full(len(order), ded_total), type=pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .repartition(1) \
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
