"""Streaming distinct-count view: "how many distinct users/convs so far".

A second materialized-snapshot engine (SnapshotViewEngine, like the
heavy-hitters view): per value-partition actors fold each epoch's value
hashes into a KMV sketch (stages/stats.py — Bar-Yossef et al. '02, the
mergeable k-minimum-values summary); every epoch emits the per-partition
sketches, and ``results()`` merges the LAST committed epoch's sketches
into one row: ``n_rows, n_nulls, n_distinct`` plus ``exact`` (True while
every partition is below its sketch capacity — modulo 64-bit hash
collisions, ~n²/2⁶⁴).

Values hash-partition across actors, so partition sketches cover
DISJOINT value sets — their union is a plain KMV merge and the exactness
regime is per partition (k × partitions distincts total). Counting
ignores event-time order, so lateness is pinned out of the way like the
heavy-hitters view. State per actor is O(k) hashes; exactly-once resume
comes from the snapshot/checkpoint protocol unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from saber_ray.stages.stats import KmvSketch, _value_hashes
from saber_ray.streaming_keyed import SnapshotViewEngine


class _DistinctState:
    """One value partition: a KMV sketch + row/null counters."""

    def __init__(self, col: str, kmv_k: int):
        self.col = col
        self.kmv = KmvSketch(kmv_k)
        self.n_rows = 0
        self.n_nulls = 0
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
            col = new[self.col].combine_chunks()
            self.n_rows += new.num_rows
            self.n_nulls += col.null_count
            if col.null_count:
                col = col.drop_null()
            vals = col.to_numpy(zero_copy_only=False)
            if len(vals):
                self.kmv.add_hashes(np.unique(_value_hashes(vals)))
        return pa.table({
            "n_rows": pa.array([self.n_rows], pa.int64()),
            "n_nulls": pa.array([self.n_nulls], pa.int64()),
            "exact": pa.array([len(self.kmv.hashes) < self.kmv.k],
                              pa.bool_()),
            "kmv": _kmv_list(self.kmv.hashes)})

    def snapshot(self, path: str) -> None:
        pq.write_table(pa.table({
            "n_rows": pa.array([self.n_rows], pa.int64()),
            "n_nulls": pa.array([self.n_nulls], pa.int64()),
            "kmv": _kmv_list(self.kmv.hashes)}), path)

    def restore(self, path: str) -> None:
        if os.path.exists(path):
            t = pq.read_table(path)
            self.n_rows = int(t["n_rows"][0].as_py())
            self.n_nulls = int(t["n_nulls"][0].as_py())
            self.kmv.hashes = _kmv_np(t["kmv"])[0]


def _kmv_list(hashes: np.ndarray) -> pa.ListArray:
    """One-row list<uint64> wrapping the sketch zero-copy (tolist()/
    as_py() round-trips materialize 100k+ Python ints per epoch)."""
    return pa.ListArray.from_arrays(
        pa.array([0, len(hashes)], pa.int32()),
        pa.array(hashes, pa.uint64()))


def _kmv_np(col) -> list:
    """Per-row uint64 numpy views of a list<uint64> column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.uint64, copy=False)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    return [flat[offs[i]:offs[i + 1]] for i in range(len(arr))]


DistinctStateActor = ray.remote(_DistinctState)


class StreamingDistinct(SnapshotViewEngine):
    """Continuously-maintained distinct count of ``col`` over an ordered
    file stream. ``results()`` is ONE row: (n_rows, n_nulls, n_distinct,
    exact) — the current view; ``exact`` is True while every partition's
    sketch is below capacity (n_distinct is then the true COUNT(DISTINCT
    col), nulls excluded as in SQL)."""

    _snap_prefix = "dstate-"
    _out_prefix = "dview-"

    def __init__(self, out_dir: str, *, col: str, kmv_k: int = 4096,
                 ts_col: str = "ts", num_partitions: int = 4,
                 monitor=None):
        if kmv_k < 2:
            raise ValueError("kmv_k must be >= 2")
        self.monitor = monitor
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.col = col
        self.kmv_k = kmv_k
        self.keys = [col]          # values hash-partition across actors
        self.ts_col = ts_col
        self.n = num_partitions
        self.lateness = 1 << 62    # counting never treats rows as late

    def _ingest_columns(self):
        return [self.col]

    def _spawn_actors(self):
        return [DistinctStateActor.remote(self.col, self.kmv_k)
                for _ in range(self.n)]

    def _empty_view(self) -> pa.Table:
        return pa.table({"n_rows": pa.array([0], pa.int64()),
                         "n_nulls": pa.array([0], pa.int64()),
                         "n_distinct": pa.array([0], pa.int64()),
                         "exact": pa.array([True], pa.bool_())})

    def _finalize_view(self, t: pa.Table) -> pa.Table:
        # partition sketches cover DISJOINT value sets: exact partitions
        # contribute their true count; estimating partitions merge into
        # one residual sketch (union of disjoint sets = sum of exacts +
        # merged estimate)
        n_distinct = 0
        resid = KmvSketch(self.kmv_k)
        any_est = False
        exacts = t["exact"].to_pylist()
        per_row = _kmv_np(t["kmv"])
        for i in range(t.num_rows):
            hashes = per_row[i]
            if exacts[i]:
                n_distinct += len(hashes)
            else:
                any_est = True
                s = KmvSketch(self.kmv_k)
                s.hashes = hashes
                resid.merge(s)
        if any_est:
            n_distinct += resid.estimate()
        import pyarrow.compute as pc
        return pa.table({
            "n_rows": pa.array([int(pc.sum(t["n_rows"]).as_py())],
                               pa.int64()),
            "n_nulls": pa.array([int(pc.sum(t["n_nulls"]).as_py())],
                                pa.int64()),
            "n_distinct": pa.array([int(n_distinct)], pa.int64()),
            "exact": pa.array([not any_est], pa.bool_())})
