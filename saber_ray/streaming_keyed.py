"""Shared epoch driver for single-stream keyed streaming engines.

The CEP / shift / rolling engines (and any future keyed state engine)
differ only in their state actor and file prefixes; the epoch protocol —
checkpoint load, parallel fragment ingest with direct actor pushes,
watermark advance, process, atomic output write, snapshot, fsync'd
checkpoint replace, stale-snapshot cleanup, end-of-stream finalize — is
identical and lives HERE once. A protocol fix (e.g. the checkpoint fsync)
now lands in one place.

Subclass contract: set ``out_dir / keys / ts_col / n / lateness /
monitor`` in ``__init__`` plus the two prefixes, and implement
``_spawn_actors()`` (fresh state actors for one run) and
``_ingest_columns()`` (value columns to read besides keys + ts).

State-actor contract (what ``run`` calls):
- ``ingest(epoch, src, table)`` — idempotent per (epoch, src).
- ``process(watermark) -> pa.Table`` — watermark None = end-of-stream.
- ``snapshot(path)`` / ``restore(path)``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from saber_ray.streaming import (_write_late, epoch_stat_row,
                                 ingest_epoch_files)


class KeyedStreamEngine:
    # subclasses override
    _snap_prefix = "kstate-"
    _out_prefix = "out-"

    out_dir: str
    keys: list
    ts_col: str
    n: int
    lateness: int
    monitor = None

    def _spawn_actors(self) -> list:
        raise NotImplementedError

    def _ingest_columns(self) -> Optional[list]:
        raise NotImplementedError

    @property
    def _ckpt_path(self):
        return os.path.join(self.out_dir, "checkpoint.json")

    def _snap(self, pid, epoch):
        return os.path.join(
            self.out_dir, f"{self._snap_prefix}p{pid:03d}-e{epoch:05d}"
                          ".parquet")

    def _store_ckpt(self, ck: dict) -> None:
        tmp = self._ckpt_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ck, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._ckpt_path)

    def _gc_snaps(self, keep_epoch: int) -> None:
        for f in os.listdir(self.out_dir):
            if f.startswith(self._snap_prefix) \
                    and f"-e{keep_epoch:05d}." not in f:
                os.remove(os.path.join(self.out_dir, f))

    def run(self, files: Sequence[str], *, epoch_size: int = 4,
            end_of_stream: bool = True,
            max_epochs: Optional[int] = None) -> dict:
        files = list(files)
        ck = {"offset": 0, "epoch": 0, "watermark": None,
              "metrics": {"emitted_rows": 0, "late_dropped": 0}}
        if os.path.exists(self._ckpt_path):
            with open(self._ckpt_path) as f:
                ck = json.load(f)
        actors = self._spawn_actors()
        try:
            ray.get([a.restore.remote(self._snap(i, ck["epoch"]))
                     for i, a in enumerate(actors)])
            epochs = 0
            while ck["offset"] < len(files):
                if max_epochs is not None and epochs >= max_epochs:
                    break
                t0 = time.monotonic()
                chunk = files[ck["offset"]:ck["offset"] + epoch_size]
                wm = ck["watermark"]
                sides, late_tables, sub = ingest_epoch_files(
                    chunk, wm, actors, ck["epoch"], keys=self.keys,
                    ts_col=self.ts_col, columns=self._ingest_columns(),
                    monitor=self.monitor)
                _write_late(self.out_dir, ck["epoch"], late_tables)
                s = sides.get(0, {"max_ts": None, "late": 0, "rows": 0})
                mx, late, rows_in = s["max_ts"], s["late"], s["rows"]
                new_wm = wm if mx is None else (
                    (mx - self.lateness) if wm is None
                    else max(mx - self.lateness, wm))
                outs = ray.get([a.process.remote(new_wm) for a in actors])
                emitted = _write_epoch(self.out_dir, self._out_prefix,
                                       ck["epoch"], outs)
                wall = time.monotonic() - t0
                nxt = ck["epoch"] + 1
                ray.get([a.snapshot.remote(self._snap(i, nxt))
                         for i, a in enumerate(actors)])
                ck.update(offset=ck["offset"] + len(chunk), epoch=nxt,
                          watermark=new_wm)
                ck["metrics"]["emitted_rows"] += emitted
                ck["metrics"]["late_dropped"] += late
                ck["metrics"].setdefault("epoch_stats", []).append(
                    epoch_stat_row(nxt - 1, wall, rows_in, emitted,
                                   sub_epoch=sub))
                self._store_ckpt(ck)
                self._gc_snaps(nxt)
                epochs += 1
            if end_of_stream and ck["offset"] >= len(files) \
                    and not ck.get("finalized"):
                outs = ray.get([a.process.remote(None) for a in actors])
                emitted = _write_epoch(self.out_dir, self._out_prefix,
                                       ck["epoch"], outs)
                nxt = ck["epoch"] + 1
                ray.get([a.snapshot.remote(self._snap(i, nxt))
                         for i, a in enumerate(actors)])
                ck.update(epoch=nxt, finalized=True)
                ck["metrics"]["emitted_rows"] += emitted
                self._store_ckpt(ck)
                self._gc_snaps(nxt)
            return ck
        finally:
            for a in actors:
                ray.kill(a)

    def _collect(self, prefix: str) -> pa.Table:
        files = sorted(
            os.path.join(self.out_dir, f) for f in os.listdir(self.out_dir)
            if f.startswith(prefix) and f.endswith(".parquet"))
        if not files:
            return pa.table({})
        return pa.concat_tables([pq.read_table(f) for f in files],
                                promote_options="default")

    def results(self) -> pa.Table:
        return self._collect(self._out_prefix)

    def late_results(self) -> pa.Table:
        return self._collect("late-")


def _write_epoch(out_dir: str, prefix: str, epoch: int,
                 tables: list) -> int:
    tables = [t for t in tables if t.num_rows]
    path = os.path.join(out_dir, f"{prefix}{epoch:05d}.parquet")
    if not tables:
        if os.path.exists(path):
            os.remove(path)
        return 0
    out = pa.concat_tables(tables, promote_options="default")
    tmp = path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    return out.num_rows


def backfill_keys(job: KeyedStreamEngine, files, batch_op, *,
                  columns=None) -> pa.Table:
    """Correct a FINALIZED keyed streaming job's output for
    watermark-dropped rows — the keyed-engine consumer of the dead-letter
    channel (the aggregate engine's ``streaming.backfill`` analogue,
    where the selective unit is the KEY instead of the window).

    A late row only ever affects its own key's rows (every keyed engine
    partitions state and output by key), so: affected keys come from
    ``late_results()``; ONE column-pruned re-read of the stream keeps
    only rows hashing into that key set (a vectorized membership test —
    a hash collision merely recomputes one extra key, which is
    idempotent); ``batch_op`` — the operator's BATCH twin — recomputes
    those keys' complete output; emitted rows of unaffected keys pass
    through untouched. At scale late data is rare, so the re-read is a
    sliver and the recompute touches a handful of keys.

    ``batch_op(ds)`` must return the streaming output schema (timestamp
    columns are auto-cast to the int64 epoch-us the engines emit).
    """
    import numpy as np
    import ray
    import ray.data as rd

    from saber_ray.core.hashing import hash_columns

    emitted = job.results()
    late = job.late_results()
    if late.num_rows == 0:
        return emitted
    with open(job._ckpt_path) as f:
        if not json.load(f).get("finalized"):
            raise ValueError(
                "backfill requires a finalized run (end_of_stream=True): "
                "open state would be recomputed from a partial stream")
    keys = list(job.keys)
    affected = np.unique(hash_columns(late, keys))
    aff_ref = ray.put(affected)

    def prune(t: pa.Table, _ref=aff_ref) -> pa.Table:
        members = ray.get(_ref)
        keep = np.isin(hash_columns(t, keys), members)
        return t.filter(pa.array(keep))

    cols = None
    if columns is not None:
        cols = sorted(set(columns) | set(keys) | {job.ts_col})
    src = rd.read_parquet(list(files), columns=cols)
    corrected = batch_op(src.map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True))
    ct = pa.concat_tables([ray.get(r) for r in corrected.to_arrow_refs()],
                          promote_options="default")
    # align dtypes with the streaming output (engines emit int64 epoch-us)
    for i, f in enumerate(ct.schema):
        want = emitted.schema.field(f.name).type \
            if f.name in emitted.column_names else pa.int64()
        if pa.types.is_timestamp(f.type) and pa.types.is_integer(want):
            ct = ct.set_column(i, f.name, ct[f.name].cast(pa.int64()))
    if emitted.num_columns == 0 or emitted.num_rows == 0:
        # nothing was ever emitted (e.g. a CEP run with zero matches) —
        # the recompute IS the whole corrected output
        return ct
    ct = ct.select(emitted.column_names)
    keep = ~np.isin(hash_columns(emitted, keys), affected)
    untouched = emitted.filter(pa.array(keep))
    return pa.concat_tables(
        [untouched, ct.cast(untouched.schema)],
        promote_options="default")


class SnapshotViewEngine(KeyedStreamEngine):
    """Base for MATERIALIZED-VIEW engines (heavy hitters, distinct
    counts): every epoch emits the CURRENT state snapshot, superseding —
    not appending to — the previous one. ``results()`` resolves exactly
    the last committed epoch from the checkpoint (an absent file means
    the current view is genuinely empty — falling back to an older file
    would report stale state), superseded view files are GC'd with the
    state snapshots, and subclasses shape the final table via
    ``_finalize_view`` / ``_empty_view``."""

    def _finalize_view(self, t: pa.Table) -> pa.Table:
        return t

    def _empty_view(self) -> pa.Table:
        return pa.table({})

    def _gc_snaps(self, keep_epoch: int) -> None:
        super()._gc_snaps(keep_epoch)
        # superseded view snapshots are dead once the next one commits —
        # keep only the epoch just written (keep_epoch - 1); compare
        # PARSED epochs (lexicographic compare breaks past the pad width)
        for f in os.listdir(self.out_dir):
            if f.startswith(self._out_prefix) and f.endswith(".parquet"):
                try:
                    ep = int(f[len(self._out_prefix):-len(".parquet")])
                except ValueError:
                    continue
                if ep < keep_epoch - 1:
                    os.remove(os.path.join(self.out_dir, f))

    def results(self) -> pa.Table:
        if not os.path.exists(self._ckpt_path):
            return self._empty_view()
        with open(self._ckpt_path) as fh:
            epoch = int(json.load(fh)["epoch"])
        path = os.path.join(
            self.out_dir, f"{self._out_prefix}{epoch - 1:05d}.parquet")
        if epoch <= 0 or not os.path.exists(path):
            return self._empty_view()
        return self._finalize_view(pq.read_table(path))
