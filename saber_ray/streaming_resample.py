"""Streaming resample / gap-fill: dense per-key bin grids over an
unbounded stream.

The epoch/checkpoint twin of ``stages/resample.py`` on the shared
keyed-stream engine template. The batch operator densifies each key's
tumbling aggregate onto its [min_bin, max_bin] grid; the streaming engine
emits exactly that grid INCREMENTALLY as the watermark seals bins — the
union of all epochs' emissions over a finite stream equals the batch
operator's output row-for-row (tested against the same DuckDB oracle).

Emission rule (exactly-once, per key, ``next_emit`` pointer):

- a bin b is SEALED when ``(b + 1) * step <= watermark`` — no row for it
  can still arrive (older rows are dead-lettered),
- ``fill in ("null", "zero", "ffill")``: emit bins in
  ``[next_emit, min(sealed_max, key_max_observed_bin)]`` — every gap's
  value depends only on the PRIOR observation, which is sealed; trailing
  bins past the key's last observation are never emitted (they may not be
  on the batch grid at all),
- ``fill="linear"``: emit bins in ``[next_emit, last sealed OBSERVED
  bin]`` — an interior gap also needs its NEXT observation, so gaps wait
  until that bin seals (end-of-stream seals everything).

State per partition (hash-routed by key, same exactly-once ingest
contract as the other keyed engines): merged pane partials for unsealed /
unemitted bins, plus one carry row per key — (last observed bin, its
FINALIZED values, next_emit). The carry row is prepended to each epoch's
kernel input as a pseudo-observation, so the batch fill kernels
(segmented accumulate from stages/resample.py) continue seamlessly across
epochs; rows below ``next_emit`` are cut after the fill.
"""

from __future__ import annotations

import os
from dataclasses import asdict as _dc_asdict
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.ipc as pa_ipc
import pyarrow.parquet as pq

import ray

from saber_ray.core.aggregates import AggSpec, finalize
from saber_ray.core.windows import Window
from saber_ray.stages.resample import (FILLS, _segment_starts,
                                       _segmented_last, _segmented_next)
from saber_ray.stages.window_agg import (PanePartialAgg, PartialMerge, _WID,
                                         _encode_null_keys)
from saber_ray.streaming_keyed import KeyedStreamEngine

_NEXT = "__next_emit"
_OBS = "__observed"


def _ipc(t: Optional[pa.Table]) -> Optional[bytes]:
    if t is None:
        return None
    import io
    buf = io.BytesIO()
    with pa_ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    return buf.getvalue()


def _unipc(b) -> Optional[pa.Table]:
    if b is None:
        return None
    return pa_ipc.open_stream(b).read_all()


class _ResampleState:
    """One hash partition of resample state (see module docstring)."""

    def __init__(self, keys: list, step: int, aggs: list, fill: str,
                 round_decimals):
        self.keys = list(keys)
        self.step = int(step)
        self.aggs = [AggSpec(**a) for a in aggs]
        self.fill = fill
        self.round_decimals = round_decimals
        self.partial = PanePartialAgg(
            Window.tumbling(self.step), self.aggs, self.keys, "__t")
        self.enc, self.dec, self.sort_keys = _encode_null_keys(self.keys)
        self.merge = PartialMerge(self.aggs, self.keys,
                                  extra_keys=[f"__nn_{k}" for k in self.keys])
        self.open: Optional[pa.Table] = None      # enc partials, _WID bins
        self.carry: Optional[pa.Table] = None     # enc keys + _WID + _NEXT + fin
        self.pend: list[pa.Table] = []
        self._seen: set = set()

    # -- ingest ----------------------------------------------------------
    def ingest(self, epoch: int, src: str, t: pa.Table) -> None:
        if (epoch, src) in self._seen or t.num_rows == 0:
            return
        self._seen.add((epoch, src))
        p = self.partial(t)
        if p.num_rows:
            self.pend.append(self.enc(p))

    # -- helpers ---------------------------------------------------------
    def _fin_type(self, arr_type: pa.DataType) -> pa.DataType:
        if self.fill == "linear" and (pa.types.is_integer(arr_type)
                                      or pa.types.is_floating(arr_type)):
            return pa.float64()
        return arr_type

    # -- process ---------------------------------------------------------
    def process(self, watermark: Optional[int]) -> pa.Table:
        if self.pend:
            parts = ([self.open] if self.open is not None
                     and self.open.num_rows else []) + self.pend
            self.open = self.merge(
                pa.concat_tables(parts, promote_options="default"))
            self.pend = []
            self._seen.clear()
        m = self.open
        sealed_max = None if watermark is None \
            else watermark // self.step - 1

        # a 0-row result is dropped by the epoch writer — schema irrelevant
        if (m is None or m.num_rows == 0) and self.carry is None:
            return pa.table({})

        # observed rows: finalized values from merged partials
        fin_names = [a.alias for a in self.aggs]
        enc_cols = [c for k in self.keys for c in (f"__nn_{k}", k)]
        obs_tabs = []
        if m is not None and m.num_rows:
            fin = finalize(m, self.aggs, round_decimals=self.round_decimals)
            cols = {c: m[c] for c in enc_cols}
            cols[_WID] = m[_WID]
            for a in self.aggs:
                arr = fin[a.alias]
                t_want = self._fin_type(arr.type)
                if arr.type != t_want:
                    arr = pc.cast(arr, t_want)
                cols[a.alias] = arr
            cols[_OBS] = pa.array(np.ones(m.num_rows, dtype=bool))
            cols[_NEXT] = pa.nulls(m.num_rows, type=pa.int64())
            obs_tabs.append(pa.table(cols))
        if self.carry is not None and self.carry.num_rows:
            obs_tabs.append(self.carry)
        u = pa.concat_tables(obs_tabs, promote_options="default") \
            .combine_chunks()
        u = u.sort_by([(k, "ascending") for k in self.sort_keys]
                      + [(_WID, "ascending"), (_NEXT, "ascending")]) \
            .combine_chunks()
        # duplicate (key, bin): carry pseudo-row + re-observation cannot
        # happen (sealed bins never re-observe) — no dedup needed.

        wid = u[_WID].to_numpy(zero_copy_only=False)
        n = u.num_rows
        seg_new = _segment_starts(u, self.sort_keys) if self.sort_keys \
            else np.concatenate(([True], np.zeros(n - 1, dtype=bool)))
        seg_first = np.flatnonzero(seg_new)
        seg_last = np.append(seg_first[1:], n) - 1
        seg_of_row = np.cumsum(seg_new) - 1

        # per-segment carry info: the carry row (if any) is the row with a
        # non-null _NEXT — at most one per key, and it sorts FIRST in its
        # segment (its bin precedes all new observations)
        nxt_np = u[_NEXT].to_numpy(zero_copy_only=False)
        has_carry = np.zeros(len(seg_first), dtype=bool)
        carry_next = np.zeros(len(seg_first), dtype=np.int64)
        cmask = ~np.isnan(nxt_np) if nxt_np.dtype.kind == "f" \
            else pa.compute.is_valid(u[_NEXT]).to_numpy(zero_copy_only=False)
        crow = np.flatnonzero(cmask)
        has_carry[seg_of_row[crow]] = True
        carry_next[seg_of_row[crow]] = nxt_np[crow].astype(np.int64)

        # per-segment emission bounds
        if self.fill == "linear":
            # last OBSERVED bin that is sealed (carry pseudo counts: it was
            # a real observation)
            if sealed_max is None:
                hi = wid[seg_last]
            else:
                sealed_obs = np.where(wid <= sealed_max, wid,
                                      np.iinfo(np.int64).min)
                hi = np.maximum.reduceat(sealed_obs, seg_first)
        else:
            hi = wid[seg_last] if sealed_max is None \
                else np.minimum(wid[seg_last], sealed_max)
        lo = np.where(has_carry, carry_next, wid[seg_first])
        # grid always starts at the segment's first row (the fill anchor);
        # rows below `lo` are cut after the fill
        glo = wid[seg_first]
        counts = np.maximum(hi - glo + 1, 0)
        total = int(counts.sum())
        if total == 0:
            return pa.table({})
        csum = np.concatenate(([0], np.cumsum(counts)))
        rep = np.repeat(np.arange(len(seg_first)), counts)
        offs = np.arange(total) - csum[rep]
        grid_wid = glo[rep] + offs

        pos = csum[seg_of_row] + (wid - glo[seg_of_row])
        inside = (counts[seg_of_row] > 0) & (wid >= glo[seg_of_row]) \
            & (wid <= hi[seg_of_row])
        src = np.flatnonzero(inside)
        idx = np.full(total, -1, dtype=np.int64)
        idx[pos[src]] = src
        observed = idx >= 0
        take_obs = pa.array(np.where(observed, idx, 0))
        obs_mask = pa.array(observed)

        key_take = pa.array(seg_first[rep])
        cols: dict[str, pa.Array] = {}
        for c in enc_cols:
            col = u[c].combine_chunks() if isinstance(u[c], pa.ChunkedArray) \
                else u[c]
            cols[c] = col.take(key_take)
        cols[_WID] = pa.array(grid_wid, type=pa.int64())
        # pseudo-carry rows are real prior observations, not gaps
        cols["is_gap"] = pc.invert(obs_mask)

        if self.fill == "ffill":
            last = _segmented_last(observed, csum[rep])
            ok = last >= 0
            fidx = pa.array(np.maximum(idx[np.where(ok, last, 0)], 0))
            ok_pa = pa.array(ok)
        if self.fill == "linear":
            last = _segmented_last(observed, csum[rep])
            nxt = _segmented_next(observed, csum[rep] + counts[rep])

        for a in self.aggs:
            arr = u[a.alias]
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
                else arr
            g = pc.if_else(obs_mask, arr.take(take_obs),
                           pa.scalar(None, arr.type))
            if self.fill == "zero" and (pa.types.is_integer(g.type)
                                        or pa.types.is_floating(g.type)):
                g = pc.fill_null(g, pa.scalar(0, g.type))
            elif self.fill == "ffill":
                g = pc.if_else(ok_pa, arr.take(fidx),
                               pa.scalar(None, arr.type))
            elif self.fill == "linear" and (pa.types.is_integer(g.type)
                                            or pa.types.is_floating(g.type)):
                v = pc.cast(arr, pa.float64()).to_numpy(zero_copy_only=False)
                okl = (last >= 0) & (nxt >= 0)
                li = np.where(okl, last, 0)
                ni = np.where(okl, nxt, 0)
                v0, v1 = v[idx[li]], v[idx[ni]]
                span = (ni - li).astype(np.float64)
                span[span == 0] = 1.0
                w = (np.arange(total) - li) / span
                out = v0 + w * (v1 - v0)
                if self.round_decimals is not None:
                    out = np.round(out, self.round_decimals)
                g = pc.if_else(pa.array(okl), pa.array(out, pa.float64()),
                               pa.scalar(None, pa.float64()))
            cols[a.alias] = g

        grid = pa.table(cols)
        emit_mask = grid_wid >= lo[rep]
        emitted = grid.filter(pa.array(emit_mask))
        out_names = self.keys + [_WID, "is_gap"] + fin_names
        emitted = self.dec(emitted).select(out_names)

        # -- advance state -------------------------------------------
        # new carry per emitting segment: last observed grid row <= hi
        seg_end = csum[1:]
        last_all = _segmented_last(observed, csum[rep])
        seg_last_obs = np.where(seg_end > csum[:-1],
                                last_all[np.maximum(seg_end - 1, 0)], -1)
        emit_seg = (counts > 0) & (hi >= lo)
        keep_old = ~emit_seg & has_carry
        carry_parts = []
        live = np.flatnonzero(emit_seg & (seg_last_obs >= 0))
        if len(live):
            gi = seg_last_obs[live]                 # grid row of last obs
            src_row = pa.array(idx[gi])
            ccols = {c: (u[c].combine_chunks()
                         if isinstance(u[c], pa.ChunkedArray) else u[c])
                     .take(src_row) for c in enc_cols}
            ccols[_WID] = pa.array(grid_wid[gi], type=pa.int64())
            for a in self.aggs:
                arr = u[a.alias]
                arr = arr.combine_chunks() \
                    if isinstance(arr, pa.ChunkedArray) else arr
                ccols[a.alias] = arr.take(src_row)
            ccols[_OBS] = pa.array(np.ones(len(live), dtype=bool))
            ccols[_NEXT] = pa.array(hi[live] + 1, type=pa.int64())
            carry_parts.append(pa.table(ccols))
        old_keep = np.flatnonzero(keep_old)
        if len(old_keep) and self.carry is not None:
            # carry rows of segments that emitted nothing pass through;
            # match by key via the carry-marked source rows
            rows = crow[np.isin(seg_of_row[crow], old_keep)]
            if len(rows):
                carry_parts.append(u.take(pa.array(rows)).select(
                    enc_cols + [_WID] + fin_names + [_OBS, _NEXT]))
        self.carry = pa.concat_tables(carry_parts,
                                      promote_options="default") \
            .combine_chunks() if carry_parts else None

        # retained partials: bins beyond each segment's emitted range
        if watermark is None:
            self.open = None
            self.carry = None
        elif m is not None and m.num_rows:
            mw = m[_WID].to_numpy(zero_copy_only=False)
            # map each partial row to its segment bound: partial rows are a
            # subset of u's observed rows — recompute segments on m
            msort = m.sort_by([(k, "ascending") for k in self.sort_keys]
                              + [(_WID, "ascending")]).combine_chunks()
            mseg = _segment_starts(msort, self.sort_keys) if self.sort_keys \
                else np.concatenate(([True],
                                     np.zeros(msort.num_rows - 1,
                                              dtype=bool)))
            # per-key hi bound: join via the same sort order as u's segments
            # (u may contain extra carry-only segments; align by key match)
            keep = self._keep_mask(msort, hi, emit_seg, u, seg_first,
                                   enc_cols)
            self.open = msort.filter(pa.array(keep))
        return emitted

    def _keep_mask(self, msort, hi, emit_seg, u, seg_first, enc_cols):
        """True for partial rows whose bin was NOT emitted (bin > its key's
        emitted hi). Key alignment via an Acero hash join on the encoded
        key columns (exact, vectorized)."""
        useg = u.take(pa.array(seg_first)).select(enc_cols)
        bound = np.where(emit_seg, hi, np.iinfo(np.int64).min)
        useg = useg.append_column("__hi", pa.array(bound, type=pa.int64()))
        if not enc_cols:
            b = int(bound[0])
            return msort[_WID].to_numpy(zero_copy_only=False) > b
        j = msort.select(enc_cols).append_column(
            "__row", pa.array(np.arange(msort.num_rows))) \
            .join(useg, keys=enc_cols, join_type="left outer")
        j = j.sort_by("__row")
        hi_per_row = j["__hi"].to_numpy(zero_copy_only=False)
        hi_per_row = np.where(np.isnan(hi_per_row)
                              if hi_per_row.dtype.kind == "f"
                              else ~pa.compute.is_valid(j["__hi"]).to_numpy(
                                  zero_copy_only=False),
                              np.iinfo(np.int64).min, hi_per_row)
        return msort[_WID].to_numpy(zero_copy_only=False) \
            > hi_per_row.astype(np.int64)

    # -- snapshot / restore -----------------------------------------------
    def snapshot(self, path: str) -> None:
        if (self.open is None or self.open.num_rows == 0) \
                and (self.carry is None or self.carry.num_rows == 0):
            if os.path.exists(path):
                os.remove(path)
            return
        t = pa.table({"open": pa.array([_ipc(self.open)], pa.binary()),
                      "carry": pa.array([_ipc(self.carry)], pa.binary())})
        pq.write_table(t, path)

    def restore(self, path: str) -> None:
        if os.path.exists(path):
            t = pq.read_table(path)
            self.open = _unipc(t["open"][0].as_py())
            self.carry = _unipc(t["carry"][0].as_py())
        else:
            self.open = None
            self.carry = None


ResampleStateActor = ray.remote(_ResampleState)


class StreamingResample(KeyedStreamEngine):
    """Micro-batch streaming resample over an ordered file stream. The
    union of emitted rows over a finite stream equals the batch
    ``stages/resample.resample`` output on the concatenated input (same
    per-key [min_bin, max_bin] dense grid, same fill) — tested vs the same
    DuckDB grid oracle, kill/resume-stable."""

    _snap_prefix = "rsstate-"
    _out_prefix = "resample-"

    def __init__(self, out_dir: str, *, step: int, aggs: Sequence[AggSpec],
                 keys: Sequence[str] = ("user_id",), ts_col: str = "ts",
                 fill: str = "ffill", round_decimals=None,
                 num_partitions: int = 4, allowed_lateness: int = 0,
                 monitor=None):
        if fill not in FILLS:
            raise ValueError(f"fill must be one of {FILLS}, got {fill!r}")
        if step <= 0:
            raise ValueError(f"step must be positive, got {step}")
        if not keys:
            raise ValueError("streaming resample requires at least one key "
                             "(the global grid is the batch operator's job)")
        self.monitor = monitor
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.step = int(step)
        self.aggs = list(aggs)
        self.fill = fill
        self.round_decimals = round_decimals
        self.keys = list(keys)
        self.ts_col = ts_col
        self.n = num_partitions
        self.lateness = allowed_lateness

    def _ingest_columns(self):
        from saber_ray.core.aggregates import input_columns
        # ingest renames ts_col -> __t; PanePartialAgg bins over __t
        return [c for c in input_columns(self.aggs) if c != self.ts_col]

    def _spawn_actors(self):
        # ingest replaces ts_col with the int64 ``__t`` column — remap
        # aggregates over the event time itself (StreamingRolling idiom)
        specs = []
        for a in self.aggs:
            d = _dc_asdict(a)
            if d.get("column") == self.ts_col:
                d["column"] = "__t"
            if d.get("order_col") == self.ts_col:
                d["order_col"] = "__t"
            specs.append(d)
        return [ResampleStateActor.remote(
            self.keys, self.step, specs, self.fill, self.round_decimals)
            for _ in range(self.n)]
