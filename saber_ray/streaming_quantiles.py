"""Streaming grouped-quantiles view: "current p50/p95 per key so far".

The third materialized-snapshot engine (SnapshotViewEngine — heavy
hitters = frequency, distinct = cardinality, this = rank), completing
the mergeable-sketch view family: per key-partition actors fold each
epoch's values into per-key rank sketches (stages/stats.QuantileSketch —
the MRL/KLL-family summary the batch ``grouped_quantiles_approx`` path
already uses); every epoch emits the CURRENT per-key quantile rows, and
``results()`` reads the LAST committed epoch's view.

Rows hash-partition by the GROUP KEY across actors, so each actor owns
its keys completely — no cross-partition sketch merge, and the exactness
regime is per key: while a key's sketch has never compacted (≤ k values)
its quantiles are EXACTLY DuckDB ``quantile_disc`` (the sketch's query
rule is pinned to it), which is what the pytest twin exploits; past
capacity the rank error is the documented O(levels/k).

Quantiles over "all rows so far" ignore event-time order, so lateness is
pinned out of the way like the other views; ingest still tracks event
time so the checkpoint shows stream progress. Exactly-once resume comes
from the snapshot/checkpoint protocol unchanged — sketches serialize
losslessly (levels + RNG state), so a killed+resumed run re-emits the
identical view even in the compacting regime.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from saber_ray.core.aggregates import group_by_null_safe
from saber_ray.stages.stats import QuantileSketch
from saber_ray.streaming_keyed import SnapshotViewEngine


def q_label(q: float) -> str:
    """Column name for a quantile point: 0.5 → p50, 0.999 → p99_9."""
    return "p" + ("%g" % (q * 100)).replace(".", "_")


class _QuantState:
    """One key partition: key tuple → QuantileSketch (+ non-null count)."""

    def __init__(self, keys: list, col: str, qs: list, k: int):
        self.keys = keys
        self.col = col
        self.qs = qs
        self.k = k
        self.sk: dict[tuple, QuantileSketch] = {}
        self._ktypes: Optional[list] = None   # arrow key types, once seen
        self._vtype: Optional[pa.DataType] = None
        self.pend: list[pa.Table] = []
        self._seen: set = set()

    def ingest(self, epoch: int, src: str, t: pa.Table) -> None:
        if (epoch, src) in self._seen or t.num_rows == 0:
            return
        self._seen.add((epoch, src))
        self.pend.append(t.select(self.keys + [self.col]))

    def _fold(self) -> None:
        new = pa.concat_tables(self.pend, promote_options="default")
        self.pend = []
        self._seen.clear()
        grouped = group_by_null_safe(new, self.keys,
                                     [(self.col, "list")])
        if self._ktypes is None:
            self._ktypes = [grouped.schema.field(k).type for k in self.keys]
            self._vtype = new.schema.field(self.col).type
        lists = grouped[f"{self.col}_list"].combine_chunks()
        kcols = [grouped[k] for k in self.keys]
        for i in range(grouped.num_rows):
            kt = tuple(c[i].as_py() for c in kcols)
            vals = lists.slice(i, 1).flatten().drop_null()
            s = self.sk.get(kt)
            if s is None:
                s = self.sk[kt] = QuantileSketch(self.k)
            if len(vals):
                s.add(vals.to_numpy(zero_copy_only=False))

    def process(self, watermark: Optional[int]) -> pa.Table:
        if self.pend:
            self._fold()
        if not self.sk:
            return pa.table({})
        items = sorted(self.sk.items(),
                       key=lambda kv: tuple(
                           (v is None, v) for v in kv[0]))
        cols: dict[str, pa.Array] = {}
        for j, k in enumerate(self.keys):
            cols[k] = pa.array([kt[j] for kt, _ in items],
                               type=self._ktypes[j])
        cols["n"] = pa.array([s.n for _, s in items], pa.int64())
        # a sketch that never compacted (only level 0) answers exactly
        cols["exact"] = pa.array([len(s.levels) <= 1 for _, s in items],
                                 pa.bool_())
        per_key = [s.query(self.qs) if s.n else [None] * len(self.qs)
                   for _, s in items]
        for qi, q in enumerate(self.qs):
            cols[q_label(q)] = pa.array([r[qi] for r in per_key],
                                        type=self._vtype)
        return pa.table(cols)

    def snapshot(self, path: str) -> None:
        if not self.sk:
            if os.path.exists(path):
                os.remove(path)
            return
        items = list(self.sk.items())
        cols: dict[str, object] = {}
        for j, k in enumerate(self.keys):
            cols[k] = pa.array([kt[j] for kt, _ in items],
                               type=self._ktypes[j])
        cols["__n"] = pa.array([s.n for _, s in items], pa.int64())
        # per key: all levels concatenated + the level lengths (empty
        # levels included) — losslessly reconstructs the sketch; the RNG
        # state rides along so a resumed run compacts IDENTICALLY to an
        # uninterrupted one
        # an all-null key has NO levels — its empty placeholder must keep
        # the VALUE dtype, or np.concatenate promotes every key's values
        # to float64 and int64 above 2^53 corrupt on resume
        npdtype = next((lv.dtype for _, s in items for lv in s.levels
                        if len(lv)), np.float64)
        flat_per_key = [
            np.concatenate(s.levels) if s.levels
            else np.empty(0, dtype=npdtype) for _, s in items]
        flat = np.concatenate(flat_per_key) if flat_per_key else np.empty(0)
        voffs = np.zeros(len(items) + 1, dtype=np.int64)
        np.cumsum([len(a) for a in flat_per_key], out=voffs[1:])
        cols["__vals"] = pa.ListArray.from_arrays(
            pa.array(voffs, pa.int32()),
            pa.array(flat, type=self._vtype) if len(flat)
            else pa.nulls(0, self._vtype))
        lens = [[len(lv) for lv in s.levels] for _, s in items]
        loffs = np.zeros(len(items) + 1, dtype=np.int64)
        np.cumsum([len(x) for x in lens], out=loffs[1:])
        cols["__lvl_lens"] = pa.ListArray.from_arrays(
            pa.array(loffs, pa.int32()),
            pa.array([x for row in lens for x in row], pa.int64()))
        cols["__rng"] = pa.array(
            [json.dumps(s.rng.bit_generator.state) for _, s in items],
            pa.string())
        pq.write_table(pa.table(cols), path)

    def restore(self, path: str) -> None:
        if not os.path.exists(path):
            return
        t = pq.read_table(path)
        self._ktypes = [t.schema.field(k).type for k in self.keys]
        vals_col = t["__vals"].combine_chunks()
        self._vtype = vals_col.type.value_type
        kcols = [t[k] for k in self.keys]
        ns = t["__n"].to_pylist()
        rngs = t["__rng"].to_pylist()
        lens_col = t["__lvl_lens"].combine_chunks()
        for i in range(t.num_rows):
            kt = tuple(c[i].as_py() for c in kcols)
            s = QuantileSketch(self.k)
            s.n = int(ns[i])
            vals = vals_col.slice(i, 1).flatten() \
                .to_numpy(zero_copy_only=False)
            pos = 0
            for ln in lens_col.slice(i, 1).flatten().to_pylist():
                s.levels.append(vals[pos:pos + ln].copy())
                pos += ln
            s.rng = np.random.default_rng()
            s.rng.bit_generator.state = json.loads(rngs[i])
            self.sk[kt] = s


QuantStateActor = ray.remote(_QuantState)


class StreamingGroupedQuantiles(SnapshotViewEngine):
    """Continuously-maintained per-key quantiles of ``col`` grouped by
    ``keys`` over an ordered file stream. ``results()`` is the CURRENT
    view: one row per key — key columns, ``n`` (non-null values seen),
    ``exact`` (sketch never compacted: quantiles are exactly DuckDB
    ``quantile_disc``), and one column per requested quantile point
    (``p50``, ``p95``, ...) in the VALUE column's dtype."""

    _snap_prefix = "qstate-"
    _out_prefix = "qview-"

    def __init__(self, out_dir: str, *, keys: Sequence[str] | str,
                 col: str, qs: Sequence[float] = (0.5, 0.95),
                 k: int = 4096, ts_col: str = "ts",
                 num_partitions: int = 4, monitor=None):
        if k < 2:
            raise ValueError("k must be >= 2")
        qs = list(qs)
        if not qs or any(not (0 < q <= 1) for q in qs):
            raise ValueError("each quantile point must be in (0, 1]")
        if len({q_label(q) for q in qs}) != len(qs):
            raise ValueError(f"duplicate quantile points in {qs!r}")
        self.monitor = monitor
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.col = col
        self.qs = qs
        self.k = k
        self.ts_col = ts_col
        self.n = num_partitions
        self.lateness = 1 << 62   # rank over "all rows so far": no lateness

    def _ingest_columns(self):
        return [self.col]

    def _spawn_actors(self):
        return [QuantStateActor.remote(self.keys, self.col, self.qs,
                                       self.k) for _ in range(self.n)]

    def _empty_view(self) -> pa.Table:
        cols = {k: pa.nulls(0, pa.null()) for k in self.keys}
        cols["n"] = pa.array([], pa.int64())
        cols["exact"] = pa.array([], pa.bool_())
        for q in self.qs:
            cols[q_label(q)] = pa.nulls(0, pa.null())
        return pa.table(cols)

    def _finalize_view(self, t: pa.Table) -> pa.Table:
        return t.take(pc.sort_indices(
            t, sort_keys=[(k, "ascending") for k in self.keys]))
