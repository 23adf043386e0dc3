"""Streaming grouped top-k view: the continuously-maintained leaderboard.

The sixth materialized-snapshot engine (SnapshotViewEngine): every epoch
each key partition folds its new rows into "the k best rows per key"
state and emits the CURRENT view — per-conversation longest turns,
per-source highest-quality documents, per-user largest purchases. The
latest-per-key view (streaming_latest.py) is exactly the k=1,
order-by-recency special case of this engine; this one generalizes the
selection to any ``order_by`` columns.

Selection semantics match the batch twin ``stages/topk.grouped_topk``
and the SQL window ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY
order_by...) <= k`` with DuckDB default NULLS LAST — ties are broken by
later ``order_by`` columns, so include a unique id as the last order
column for fully deterministic output (the pytest oracles do).

Top-k by VALUE is a bounded, time-independent fold: per-partition state
is ≤ k rows per live key (key cardinality × k, not stream length), and
an out-of-order row is still a legal candidate — it competes on its
value, so late data folds in correctly rather than dead-lettering
(watermarks are pinned out of the way, the streaming_latest discipline).
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


def _sort_spec(keys: list, order_by: list, descending: list):
    return [*[(c, "ascending") for c in keys],
            *[(c, "descending" if d else "ascending")
              for c, d in zip(order_by, descending)]]


def _topk_per_key(t: pa.Table, keys: list, order_by: list,
                  descending: list, k: int) -> pa.Table:
    """Keep each key's first k rows under the selection order — one
    vectorized sort + run-position arithmetic (no per-group dispatch)."""
    order = pc.sort_indices(
        t, sort_keys=_sort_spec(keys, order_by, descending))
    t = t.take(order).combine_chunks()
    from saber_ray.core.segments import key_change_mask
    first = key_change_mask(t, keys)
    starts = np.flatnonzero(first)
    n = t.num_rows
    lens = np.diff(np.append(starts, n))
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    return t.filter(pa.array(pos < k))


class _TopKState:
    """One key partition: the k best rows per key."""

    def __init__(self, keys: list, order_by: list, descending: list,
                 k: int):
        self.keys = keys
        self.order_by = order_by
        self.descending = descending
        self.k = k
        self.best: Optional[pa.Table] = None
        self.pend: list[pa.Table] = []
        self._seen: set = set()

    def ingest(self, epoch: int, src: str, t: pa.Table) -> None:
        if (epoch, src) in self._seen or t.num_rows == 0:
            return
        self._seen.add((epoch, src))
        # pre-compact: only a batch's own top-k can enter the state
        self.pend.append(_topk_per_key(
            t, self.keys, self.order_by, self.descending, self.k))

    def process(self, watermark: Optional[int]) -> pa.Table:
        if self.pend:
            parts = ([self.best] if self.best is not None else []) \
                + self.pend
            self.pend = []
            self._seen.clear()
            self.best = _topk_per_key(
                pa.concat_tables(parts, promote_options="default"),
                self.keys, self.order_by, self.descending, self.k)
        return self.best if self.best is not None else pa.table({})

    def snapshot(self, path: str) -> None:
        if self.best is not None:
            pq.write_table(self.best, path)
        elif os.path.exists(path):
            os.remove(path)

    def restore(self, path: str) -> None:
        if os.path.exists(path):
            self.best = pq.read_table(path)


TopKStateActor = ray.remote(_TopKState)


class StreamingGroupedTopK(SnapshotViewEngine):
    """Continuously-maintained per-key top-k view of an ordered file
    stream. ``results()`` is the CURRENT leaderboard: ≤ k rows per key
    seen so far — the key columns, every ingested value column, and the
    event time as int64 epoch-us under ``ts_col``'s name."""

    _snap_prefix = "tkstate-"
    _out_prefix = "tkview-"

    def __init__(self, out_dir: str, *, keys: Sequence[str] | str,
                 order_by: Sequence[str] | str, k: int,
                 descending: Sequence[bool] | bool = True,
                 columns: Optional[Sequence[str]] = None,
                 ts_col: str = "ts", num_partitions: int = 4,
                 monitor=None):
        if k <= 0:
            raise ValueError(f"k must be > 0, got {k}")
        self.monitor = monitor
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = [order_by] if isinstance(order_by, str) \
            else list(order_by)
        if isinstance(descending, bool):
            descending = [descending] * len(self.order_by)
        if len(descending) != len(self.order_by):
            raise ValueError(
                f"descending has {len(descending)} entries for "
                f"{len(self.order_by)} order_by columns")
        self.descending = list(descending)
        self.k = int(k)
        self.columns = sorted(set(columns) | set(self.order_by)) \
            if columns is not None else None
        self.ts_col = ts_col
        self.n = num_partitions
        # a late row is still a legal candidate — it competes on value
        self.lateness = 1 << 62

    def _ingest_columns(self):
        return self.columns

    def _spawn_actors(self):
        return [TopKStateActor.remote(self.keys, self.order_by,
                                      self.descending, self.k)
                for _ in range(self.n)]

    def _empty_view(self) -> pa.Table:
        return pa.table({})

    def _finalize_view(self, t: pa.Table) -> pa.Table:
        # partitions own disjoint keys: concat IS the leaderboard
        if "__t" in t.column_names and self.ts_col not in t.column_names:
            t = t.rename_columns(
                [self.ts_col if c == "__t" else c for c in t.column_names])
        return t.take(pc.sort_indices(t, sort_keys=_sort_spec(
            self.keys, self.order_by, self.descending)))
