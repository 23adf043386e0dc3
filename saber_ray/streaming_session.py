"""Streaming session windows: gap-timeout sessions closed by the watermark.

North-rule extension (the reference has no session windows at all,
WindowDefinition.java:5-8) in streaming form. Shares the epoch/checkpoint
shape of saber_ray/streaming.py.

State model: an open session is an **atom** — (keys..., start, last,
partial-aggregate columns). Session merging is interval merging with a gap
allowance, and the aggregate partials merge with the same associative
algebra as windows (PartialResultSlot.java:186-212 semantics), so atoms
compose exactly:

1. Each epoch's new rows are sessionized alone with the exact per-event rule
   (sort by ts; break where diff > gap) — one vectorized pandas pass —
   producing new-session atoms.
2. Per key, open-state atoms + new atoms merge with the interval rule
   ``next.start - running_max(last) <= gap`` (a small per-key pass over
   ATOMS, not events; atom count ≈ open sessions + new sessions).
3. Atoms with ``last + gap < watermark`` can never be extended (any future
   row has ts >= watermark, so its distance to ``last`` exceeds the gap) —
   they close, finalize (AVG division at close, Aggregation.java:920-929)
   and emit with a per-key session ordinal matching the batch engine's
   0-based ``session_id``; sessions of a key always close in start order
   (an earlier session's close threshold precedes the next session's start
   by construction), so ordinals are stable across epochs.

Late rows below the watermark are dropped and counted, as in streaming.py.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from saber_ray.core.aggregates import (AggSpec, ROWS, arrow_merge_aggs,
                                       finalize, partial_columns, _p)
from saber_ray.streaming import _key_hash


def _row_partials(df: pd.DataFrame, aggs: list) -> pd.DataFrame:
    """Per-row partial columns (a single event is its own partial)."""
    out = {}
    for colname, fns in partial_columns(aggs).items():
        v = df[colname].to_numpy()
        for fn in fns:
            if fn == "cnt":
                out[_p(colname, fn)] = (~pd.isna(df[colname])).astype("int64")
            else:
                out[_p(colname, fn)] = v
    out[ROWS] = np.ones(len(df), dtype=np.int64)
    return pd.DataFrame(out, index=df.index)


_MERGE_FN = {"sum": "sum", "cnt": "sum", "min": "min", "max": "max"}


def _partial_agg_map(aggs: list) -> dict:
    m = {ROWS: "sum"}
    for colname, fns in partial_columns(aggs).items():
        for fn in fns:
            m[_p(colname, fn)] = _MERGE_FN[fn]
    return m


@ray.remote
class SessionStateActor:
    """One hash partition of open-session atoms."""

    def __init__(self, keys: list, gap: int, aggs: list):
        self.keys = list(keys)
        self.gap = gap
        self.aggs = [AggSpec(**a) for a in aggs]
        self.pmap = _partial_agg_map(self.aggs)
        self.open = pd.DataFrame()           # atoms: keys + __start/__last + partials
        self.ordinal: dict = {}              # key tuple -> next session_id

    def _sessionize_new(self, df: pd.DataFrame) -> pd.DataFrame:
        """Events → new-session atoms (vectorized, exact per-event rule)."""
        df = df.sort_values(self.keys + ["__t"], kind="mergesort") \
               .reset_index(drop=True)
        t = df["__t"].to_numpy()
        same = np.ones(len(df), dtype=bool)
        for k in self.keys:
            kv = df[k].to_numpy()
            same[1:] &= kv[1:] == kv[:-1]
        same[0] = False
        brk = np.ones(len(df), dtype=np.int64)
        brk[1:] = np.where(same[1:] & (np.diff(t) <= self.gap), 0, 1)
        df = pd.concat([df, _row_partials(df, self.aggs)], axis=1)
        df["__sess"] = np.cumsum(brk)
        gb = df.groupby("__sess", sort=True)
        atom = pd.DataFrame({k: gb[k].first() for k in self.keys})
        atom["__start"] = gb["__t"].min()
        atom["__last"] = gb["__t"].max()
        for c, fn in self.pmap.items():
            atom[c] = getattr(gb[c], fn)()
        return atom.reset_index(drop=True)

    def _merge_atoms(self, atoms: pd.DataFrame) -> pd.DataFrame:
        """Interval-merge atoms per key (gap allowance, running-max last)."""
        atoms = atoms.sort_values(self.keys + ["__start", "__last"],
                                  kind="mergesort").reset_index(drop=True)
        groups = np.zeros(len(atoms), dtype=np.int64)
        gid = -1
        prev_key, running_last = None, None
        starts = atoms["__start"].to_numpy()
        lasts = atoms["__last"].to_numpy()
        keymat = [atoms[k].to_numpy() for k in self.keys]
        for i in range(len(atoms)):
            key = tuple(km[i] for km in keymat)
            if key != prev_key or starts[i] - running_last > self.gap:
                gid += 1
                prev_key, running_last = key, lasts[i]
            else:
                running_last = max(running_last, lasts[i])
            groups[i] = gid
        atoms["__g"] = groups
        gb = atoms.groupby("__g", sort=True)
        out = pd.DataFrame({k: gb[k].first() for k in self.keys})
        out["__start"] = gb["__start"].min()
        out["__last"] = gb["__last"].max()
        for c, fn in self.pmap.items():
            out[c] = getattr(gb[c], fn)()
        return out.reset_index(drop=True)

    def process(self, new_rows: Optional[pa.Table],
                watermark: Optional[int]) -> pa.Table:
        if new_rows is not None and new_rows.num_rows:
            from saber_ray.core.aggregates import apply_scales, scaled_columns
            scales = scaled_columns(self.aggs)
            if scales:
                # fixed-point aggs: accumulate exact scaled ints; finalize
                # descales at close (core/aggregates.py scale note)
                new_rows = apply_scales(new_rows, scales)
            atoms = self._sessionize_new(new_rows.to_pandas())
            both = pd.concat([self.open, atoms], ignore_index=True) \
                if len(self.open) else atoms
            self.open = self._merge_atoms(both)
        if len(self.open) == 0:
            return pa.table({})
        if watermark is None:
            closed, self.open = self.open, self.open.iloc[0:0]
        else:
            done = self.open["__last"].to_numpy() + self.gap < watermark
            closed = self.open[done]
            self.open = self.open[~done].reset_index(drop=True)
        if len(closed) == 0:
            return pa.table({})
        closed = closed.sort_values(self.keys + ["__start"], kind="mergesort")
        sids = np.empty(len(closed), dtype=np.int64)
        keymat = [closed[k].to_numpy() for k in self.keys]
        for i in range(len(closed)):
            key = tuple(km[i] for km in keymat)
            sids[i] = self.ordinal.get(key, 0)
            self.ordinal[key] = sids[i] + 1
        t = pa.Table.from_pandas(closed, preserve_index=False)
        cols = {k: t[k] for k in self.keys}
        cols["session_id"] = pa.array(sids, type=pa.int64())
        cols["session_start_us"] = t["__start"].cast(pa.int64())
        cols["session_end_us"] = t["__last"].cast(pa.int64())
        cols.update(finalize(t, self.aggs))
        return pa.table(cols)

    def snapshot(self, path: str) -> None:
        # ordinal counters ride in a parquet sidecar so key types round-trip
        ks = list(self.ordinal.keys())
        ocols = {k: [key[i] for key in ks] for i, k in enumerate(self.keys)}
        ocols["__next"] = [int(v) for v in self.ordinal.values()]
        pq.write_table(pa.table(ocols), path + ".ord")
        pq.write_table(pa.Table.from_pandas(self.open, preserve_index=False),
                       path)

    def restore(self, path: str) -> None:
        if os.path.exists(path):
            self.open = pq.read_table(path).to_pandas()
            od = pq.read_table(path + ".ord").to_pandas()
            self.ordinal = {
                tuple(row[k] for k in self.keys): int(row["__next"])
                for _, row in od.iterrows()}


class StreamingSessionWindows:
    """Micro-batch streaming sessionization over an ordered file stream.

    Output schema matches ``stages.session.session_windows`` (the batch
    oracle): keys..., session_id, session_start_us, session_end_us, aggs.
    """

    def __init__(self, out_dir: str, *, gap: int, aggs: Sequence[AggSpec],
                 keys: Sequence[str] = ("conv_id",), ts_col: str = "ts",
                 num_partitions: int = 4, allowed_lateness: int = 0,
                 columns: Optional[Sequence[str]] = None):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.gap = gap
        self.aggs = list(aggs)
        self.keys = list(keys)
        self.ts_col = ts_col
        self.n = num_partitions
        self.lateness = allowed_lateness
        self.columns = list(columns) if columns else None

    @property
    def _ckpt_path(self):
        return os.path.join(self.out_dir, "checkpoint.json")

    def _snap(self, pid, epoch):
        return os.path.join(self.out_dir,
                            f"sstate-p{pid:03d}-e{epoch:05d}.parquet")

    def run(self, files: Sequence[str], *, epoch_size: int = 4,
            end_of_stream: bool = True, max_epochs: Optional[int] = None) -> dict:
        files = list(files)
        ck = {"offset": 0, "epoch": 0, "watermark": None,
              "metrics": {"emitted_rows": 0, "late_dropped": 0}}
        if os.path.exists(self._ckpt_path):
            with open(self._ckpt_path) as f:
                ck = json.load(f)
        actors = [SessionStateActor.remote(
            self.keys, self.gap,
            [dict(op=a.op, column=a.column, alias=a.alias, scale=a.scale) for a in self.aggs])
            for _ in range(self.n)]
        try:
            ray.get([a.restore.remote(self._snap(i, ck["epoch"]))
                     for i, a in enumerate(actors)])
            epochs = 0
            while ck["offset"] < len(files):
                if max_epochs is not None and epochs >= max_epochs:
                    break
                import time
                t0 = time.monotonic()
                chunk = files[ck["offset"]:ck["offset"] + epoch_size]
                wm = ck["watermark"]
                cols = None
                if self.columns:
                    cols = sorted(set(self.columns) | set(self.keys)
                                  | {self.ts_col})
                t = pa.concat_tables([pq.read_table(f, columns=cols)
                                      for f in chunk])
                ts = t[self.ts_col]
                if not pa.types.is_integer(ts.type):
                    ts = ts.cast(pa.int64())
                tn = (ts.combine_chunks() if isinstance(ts, pa.ChunkedArray)
                      else ts).to_numpy(zero_copy_only=False)
                # None (not 0) for a rowless chunk: ts 0 is valid data and
                # must advance the watermark (truthiness would lose it)
                mx = int(tn.max()) if len(tn) else None
                rows_in = t.num_rows        # pre-late-filter (engine parity)
                late = 0
                if wm is not None:
                    ok = tn >= wm
                    late = int((~ok).sum())
                    if late:
                        t = t.filter(pa.array(ok))
                        tn = tn[ok]
                t = t.drop_columns([self.ts_col]).append_column(
                    "__t", pa.array(tn, type=pa.int64()))
                part = _key_hash(t, self.keys, self.n)
                # wm==0 is a valid frontier; only None means unset (and a
                # negative-ts stream must not be floored at 0)
                new_wm = wm if mx is None else (
                    (mx - self.lateness) if wm is None
                    else max(mx - self.lateness, wm))
                outs = ray.get([
                    a.process.remote(
                        t.filter(pa.array(part == i)) if (part == i).any()
                        else None,
                        new_wm)
                    for i, a in enumerate(actors)])
                emitted = _write(self.out_dir, ck["epoch"], outs)
                wall = time.monotonic() - t0
                nxt = ck["epoch"] + 1
                ray.get([a.snapshot.remote(self._snap(i, nxt))
                         for i, a in enumerate(actors)])
                ck.update(offset=ck["offset"] + len(chunk), epoch=nxt,
                          watermark=new_wm)
                ck["metrics"]["emitted_rows"] += emitted
                ck["metrics"]["late_dropped"] += late
                from saber_ray.streaming import epoch_stat_row
                ck["metrics"].setdefault("epoch_stats", []).append(
                    epoch_stat_row(nxt - 1, wall, rows_in, emitted))
                tmp = self._ckpt_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(ck, f)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, self._ckpt_path)
                for f2 in os.listdir(self.out_dir):
                    if f2.startswith("sstate-") and f"-e{nxt:05d}." not in f2:
                        os.remove(os.path.join(self.out_dir, f2))
                epochs += 1
            if end_of_stream and ck["offset"] >= len(files) \
                    and not ck.get("finalized"):
                outs = ray.get([a.process.remote(None, None) for a in actors])
                emitted = _write(self.out_dir, ck["epoch"], outs)
                nxt = ck["epoch"] + 1
                ray.get([a.snapshot.remote(self._snap(i, nxt))
                         for i, a in enumerate(actors)])
                ck.update(epoch=nxt, finalized=True)
                ck["metrics"]["emitted_rows"] += emitted
                tmp = self._ckpt_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(ck, f)
                os.replace(tmp, self._ckpt_path)
            return ck
        finally:
            for a in actors:
                ray.kill(a)

    def results(self) -> pa.Table:
        files = sorted(
            os.path.join(self.out_dir, f) for f in os.listdir(self.out_dir)
            if f.startswith("sess-") and f.endswith(".parquet"))
        if not files:
            return pa.table({})
        return pa.concat_tables([pq.read_table(f) for f in files],
                                promote_options="default")


def _write(out_dir: str, epoch: int, tables: list[pa.Table]) -> int:
    tables = [t for t in tables if t.num_rows]
    path = os.path.join(out_dir, f"sess-{epoch:05d}.parquet")
    if not tables:
        if os.path.exists(path):
            os.remove(path)
        return 0
    out = pa.concat_tables(tables, promote_options="default")
    tmp = path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    return out.num_rows
