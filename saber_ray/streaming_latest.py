"""Streaming latest-per-key view: the compacted-changelog / upsert table.

The fifth materialized-snapshot engine (SnapshotViewEngine): every epoch
each key partition folds its new rows into "the most recent row per
key" state and emits the CURRENT compacted table — the dimension-table-
maintenance primitive ("the latest profile per user", "each
conversation's last turn") and the streaming dual of a keyed upsert.

Recency is (event time, then ``tie_break`` DESC) — ties on the
timestamp need a total order to be deterministic under any
partitioning, so ``tie_break`` (e.g. a sequence/turn/event id) is
REQUIRED; rows equal on both are interchangeable duplicates and either
survives. The batch twin is the SQL window query ``ROW_NUMBER() OVER
(PARTITION BY key ORDER BY ts DESC, tie_break DESC) = 1`` — the pytest
oracle, checked mid-stream (prefix), at end-of-stream, and across
kill/resume.

Per-partition state is one row per LIVE key (bounded by key
cardinality, not stream length). Watermarks are pinned out of the way:
an out-of-order row is still a legal upsert — recency is decided by
EVENT time, so late data folds in correctly rather than dead-lettering.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from saber_ray.streaming_keyed import SnapshotViewEngine


def _latest_per_key(t: pa.Table, keys: list, tie: str) -> pa.Table:
    order = pc.sort_indices(t, sort_keys=[
        *[(k, "ascending") for k in keys],
        ("__t", "descending"), (tie, "descending")])
    t = t.take(order).combine_chunks()
    from saber_ray.core.segments import key_change_mask
    first = key_change_mask(t, keys)
    return t.filter(pa.array(first))


class _LatestState:
    """One key partition: the most recent row per key."""

    def __init__(self, keys: list, tie: str):
        self.keys = keys
        self.tie = tie
        self.best: Optional[pa.Table] = None
        self.pend: list[pa.Table] = []
        self._seen: set = set()

    def ingest(self, epoch: int, src: str, t: pa.Table) -> None:
        if (epoch, src) in self._seen or t.num_rows == 0:
            return
        self._seen.add((epoch, src))
        # pre-compact: only a batch's own winners can enter the state
        self.pend.append(_latest_per_key(t, self.keys, self.tie))

    def process(self, watermark: Optional[int]) -> pa.Table:
        if self.pend:
            parts = ([self.best] if self.best is not None else []) \
                + self.pend
            self.pend = []
            self._seen.clear()
            self.best = _latest_per_key(
                pa.concat_tables(parts, promote_options="default"),
                self.keys, self.tie)
        return self.best if self.best is not None else pa.table({})

    def snapshot(self, path: str) -> None:
        if self.best is not None:
            pq.write_table(self.best, path)
        elif os.path.exists(path):
            os.remove(path)

    def restore(self, path: str) -> None:
        if os.path.exists(path):
            self.best = pq.read_table(path)


LatestStateActor = ray.remote(_LatestState)


class StreamingLatest(SnapshotViewEngine):
    """Continuously-maintained latest-row-per-key view of an ordered
    file stream. ``results()`` is the CURRENT compacted table: one row
    per key seen so far — the key columns, every ingested value column,
    and the event time as int64 epoch-us under ``ts_col``'s name."""

    _snap_prefix = "lstate-"
    _out_prefix = "lview-"

    def __init__(self, out_dir: str, *, keys: Sequence[str] | str,
                 tie_break: str, columns: Optional[Sequence[str]] = None,
                 ts_col: str = "ts", num_partitions: int = 4,
                 monitor=None):
        self.monitor = monitor
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.tie = tie_break
        self.columns = sorted(set(columns) | {tie_break}) \
            if columns is not None else None
        self.ts_col = ts_col
        self.n = num_partitions
        # a late row is still a legal upsert — event time decides recency
        self.lateness = 1 << 62

    def _ingest_columns(self):
        return self.columns

    def _spawn_actors(self):
        return [LatestStateActor.remote(self.keys, self.tie)
                for _ in range(self.n)]

    def _empty_view(self) -> pa.Table:
        return pa.table({})

    def _finalize_view(self, t: pa.Table) -> pa.Table:
        # partitions own disjoint keys: concat IS the compacted table
        t = t.take(pc.sort_indices(t, sort_keys=[
            (k, "ascending") for k in self.keys]))
        if "__t" in t.column_names and self.ts_col not in t.column_names:
            t = t.rename_columns(
                [self.ts_col if c == "__t" else c for c in t.column_names])
        return t
