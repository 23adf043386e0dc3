"""Streaming uniform-sample view: "k random rows of everything so far".

The fourth materialized-snapshot engine (SnapshotViewEngine — frequency,
cardinality, rank, now membership): a continuously-maintained exactly-k
uniform sample of the stream, the live-inspection primitive ("show me
1000 random turns seen so far") and the streaming twin of the batch
``bottom_k_sample``.

Priority sampling (bottom-k by key hash — the mergeable, deterministic
equivalent of a seeded reservoir): every row's priority is the engine's
canonical sample hash of its key (stages/sample._hash_col — the SAME
hash the batch twin and its SQL predicate use), each key-partition actor
keeps its k smallest (priority, key) rows, and the view is the global k
smallest of the partition union — a union of disjoint-row bottom-k sets
always contains the global bottom-k, so the merge is one sort + slice.
Bit-for-bit EQUAL to ``bottom_k_sample`` over the ingested prefix (the
pytest oracle), and trivially exactly-once: state is a ≤ k-row table per
partition, resumed runs re-emit the identical sample.

Sampling ignores event-time order (every row is a candidate regardless
of lateness), so the watermark is pinned out of the way like the other
views.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from saber_ray.stages.sample import _hash_col
from saber_ray.streaming_keyed import SnapshotViewEngine

_PRIO = "__prio"


def _add_prio(t: pa.Table, key: str, salt: int) -> pa.Table:
    h, valid = _hash_col(t, key, salt)
    if valid is not None:
        # NULL keys sort last (picked only when < k real keys exist) —
        # the batch twin's NULLS LAST semantics
        h = np.where(valid, h, np.iinfo(np.int64).max)
    return t.append_column(_PRIO, pa.array(h, type=pa.int64()))


def _best_k(t: pa.Table, key: str, k: int) -> pa.Table:
    order = pc.sort_indices(t, sort_keys=[
        (_PRIO, "ascending"), (key, "ascending")])
    return t.take(order.slice(0, k)).combine_chunks()


class _SampleState:
    """One key partition: its k smallest (priority, key) rows."""

    def __init__(self, key: str, k: int, salt: int):
        self.key = key
        self.k = k
        self.salt = salt
        self.best: Optional[pa.Table] = None   # ≤ k rows, with __prio
        self.pend: list[pa.Table] = []
        self._seen: set = set()

    def ingest(self, epoch: int, src: str, t: pa.Table) -> None:
        if (epoch, src) in self._seen or t.num_rows == 0:
            return
        self._seen.add((epoch, src))
        # pre-shrink: only a batch's own k-best can ever enter the state
        self.pend.append(_best_k(_add_prio(t, self.key, self.salt),
                                 self.key, self.k))

    def process(self, watermark: Optional[int]) -> pa.Table:
        if self.pend:
            parts = ([self.best] if self.best is not None else []) \
                + self.pend
            self.pend = []
            self._seen.clear()
            self.best = _best_k(
                pa.concat_tables(parts, promote_options="default"),
                self.key, self.k)
        return self.best if self.best is not None else pa.table({})

    def snapshot(self, path: str) -> None:
        if self.best is not None:
            pq.write_table(self.best, path)
        elif os.path.exists(path):
            os.remove(path)

    def restore(self, path: str) -> None:
        if os.path.exists(path):
            self.best = pq.read_table(path)


SampleStateActor = ray.remote(_SampleState)


class StreamingSample(SnapshotViewEngine):
    """Continuously-maintained exactly-k uniform sample of an ordered
    file stream, keyed by the int-castable ``key`` column. ``results()``
    is the CURRENT sample: the same rows ``bottom_k_sample(key, k,
    salt)`` picks from everything ingested so far, in the same
    (priority, key) order, priority column dropped."""

    _snap_prefix = "smpstate-"
    _out_prefix = "smpview-"

    def __init__(self, out_dir: str, *, key: str, k: int,
                 columns: Optional[Sequence[str]] = None,
                 salt: int = 0, ts_col: str = "ts",
                 num_partitions: int = 4, monitor=None):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.monitor = monitor
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.key = key
        self.k = k
        self.salt = salt
        self.columns = list(columns) if columns is not None else None
        self.keys = [key]          # rows hash-partition by the sample key
        self.ts_col = ts_col
        self.n = num_partitions
        self.lateness = 1 << 62    # every row is a candidate; never late

    def _ingest_columns(self):
        return self.columns

    def _spawn_actors(self):
        return [SampleStateActor.remote(self.key, self.k, self.salt)
                for _ in range(self.n)]

    def _empty_view(self) -> pa.Table:
        return pa.table({})

    def _finalize_view(self, t: pa.Table) -> pa.Table:
        t = _best_k(t, self.key, self.k).drop_columns([_PRIO])
        if "__t" in t.column_names and self.ts_col not in t.column_names:
            # the shared ingest stages event time as int64 ``__t``; give
            # it back its name (int64 epoch-us — the engines' emit dtype)
            t = t.rename_columns(
                [self.ts_col if c == "__t" else c for c in t.column_names])
        return t
