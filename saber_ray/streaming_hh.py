"""Streaming heavy hitters: a continuously-maintained top-k view.

The fourth emission shape in the streaming family — aggregate/join/
session/CEP/shift/rolling all APPEND finalized rows; a frequency view is
instead a MATERIALIZED SNAPSHOT that supersedes itself every epoch
("current top tools / hottest conversations so far"). Built on the shared
epoch driver: each epoch every partition actor folds its new rows into a
Misra–Gries summary (stages/heavy_hitters.py algebra — per-epoch counts,
merge, compress to capacity) and emits its CURRENT summary; ``results()``
reads only the LATEST epoch's snapshot.

Watermarks are irrelevant to counting (every row counts regardless of
event-time order), so the engine pins ``allowed_lateness`` high enough
that the dead-letter path never triggers; ingest still tracks event time,
so the checkpoint shows stream progress.

Error bound (inherited from Misra–Gries, per partition): values hash-
partition across actors, so each actor sees EVERY occurrence of its
values; per reported value, ``est ≤ true ≤ est + max_undercount`` where
``max_undercount`` is that actor's accumulated compression cut, and any
value with true count > its actor's cut is guaranteed present. With
``capacity`` at least each partition's distinct count the view is EXACT
(the pytest twin vs a batch GROUP BY).

Exactly-once: the per-epoch snapshot write is an idempotent overwrite and
the summary state snapshots with the checkpoint — a killed+resumed run
re-emits the identical view.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from saber_ray.stages.heavy_hitters import _counts, _cut
from saber_ray.streaming_keyed import SnapshotViewEngine

_CUT_META = b"saber_ray.hh_cut"


class _HHState:
    """One hash partition of the frequency view: a Misra–Gries summary
    (value → est) plus the accumulated compression cut."""

    def __init__(self, col: str, capacity: int):
        self.col = col
        self.capacity = capacity
        self.summary: Optional[pa.Table] = None   # (__v, __e)
        self.cut = 0
        self.pend: list[pa.Table] = []
        self._seen: set = set()

    def ingest(self, epoch: int, src: str, t: pa.Table) -> None:
        if (epoch, src) in self._seen or t.num_rows == 0:
            return
        self._seen.add((epoch, src))
        self.pend.append(t.select([self.col]))

    def process(self, watermark: Optional[int]) -> pa.Table:
        if self.pend:
            new = pa.concat_tables(self.pend, promote_options="default")
            self.pend = []
            self._seen.clear()
            vals, counts = _counts(new, self.col)
            inc = pa.table({"__v": vals,
                            "__e": pa.array(counts, type=pa.int64())})
            parts = [inc] if self.summary is None \
                else [self.summary, inc]
            merged = pa.concat_tables(parts, promote_options="default") \
                .group_by(["__v"], use_threads=False) \
                .aggregate([("__e", "sum")]) \
                .rename_columns(["__v", "__e"])
            ests = merged["__e"].to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            c = _cut(ests, self.capacity)
            if c:
                keep = ests > c
                merged = merged.filter(pa.array(keep))
                merged = merged.set_column(
                    1, "__e", pa.array(ests[keep] - c, type=pa.int64()))
                self.cut += c
            self.summary = merged.combine_chunks()
        s = self.summary
        vtype = s.schema.field("__v").type if s is not None else pa.null()
        schema = pa.schema([("value", vtype),
                            ("est_count", pa.int64()),
                            ("max_undercount", pa.int64())])
        if s is None or s.num_rows == 0:
            return schema.empty_table()
        return pa.Table.from_arrays(
            [s["__v"], s["__e"],
             pa.array(np.full(s.num_rows, self.cut), type=pa.int64())],
            schema=schema)

    def snapshot(self, path: str) -> None:
        # an EMPTY summary still snapshots: compression can remove every
        # row (tied counts at tiny capacity) while the accumulated cut —
        # the error bound — must survive a kill+resume
        if self.summary is not None:
            pq.write_table(self.summary.replace_schema_metadata(
                {_CUT_META: str(self.cut).encode()}), path)
        elif os.path.exists(path):
            os.remove(path)

    def restore(self, path: str) -> None:
        if os.path.exists(path):
            self.summary = pq.read_table(path)
            md = self.summary.schema.metadata or {}
            if _CUT_META in md:
                self.cut = int(md[_CUT_META])
        else:
            self.summary = None


HHStateActor = ray.remote(_HHState)


class StreamingHeavyHitters(SnapshotViewEngine):
    """Continuously-maintained approximate top-k frequent values of
    ``col`` over an ordered file stream. ``results()`` is the CURRENT
    view: (value, est_count, max_undercount) sorted by est_count desc
    then value, top ``k`` rows if given — the per-epoch snapshots before
    it are superseded, not appended."""

    _snap_prefix = "hhstate-"
    _out_prefix = "hhview-"

    def __init__(self, out_dir: str, *, col: str, capacity: int = 1024,
                 k: Optional[int] = None, ts_col: str = "ts",
                 num_partitions: int = 4, monitor=None):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.monitor = monitor
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.col = col
        self.capacity = capacity
        self.k = k
        self.keys = [col]          # values hash-partition across actors
        self.ts_col = ts_col
        self.n = num_partitions
        # counting never treats rows as late — pin the watermark far
        # below any event time so the dead-letter path can't trigger
        self.lateness = 1 << 62

    def _ingest_columns(self):
        return [self.col]

    def _spawn_actors(self):
        return [HHStateActor.remote(self.col, self.capacity)
                for _ in range(self.n)]

    def _empty_view(self) -> pa.Table:
        # value: null type — promotes to the real dtype under concat, so
        # empty and non-empty polls never have conflicting schemas
        return pa.table({"value": pa.nulls(0, pa.null()),
                         "est_count": pa.array([], pa.int64()),
                         "max_undercount": pa.array([], pa.int64())})

    def _finalize_view(self, t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[
            ("est_count", "descending"), ("value", "ascending")])
        t = t.take(order)
        return t.slice(0, self.k) if self.k is not None else t
