"""Time-series resample / gap-fill: one output row per (key, grid bin).

The windowed aggregates (stages/window_agg.py) emit only NON-EMPTY windows —
the reference behaves the same way (a window with no tuples produces no
result, Aggregation.java:920-929). Real time-series consumers (dashboards,
training-feature grids, rate computations) need the EMPTY bins too, with a
fill policy. ``resample`` densifies a per-key tumbling aggregate onto the
full bin grid and fills the gaps:

- ``fill="null"``   — synthesized bins carry NULL aggregates,
- ``fill="zero"``   — numeric aggregates become 0 (COUNT-like semantics),
- ``fill="ffill"``  — last observed value per key carries forward (leading
  gaps stay NULL; SQL twin: ``last_value(x IGNORE NULLS) OVER (PARTITION BY
  key ORDER BY bin ROWS UNBOUNDED PRECEDING)``),
- ``fill="linear"`` — linear interpolation between the neighbouring observed
  bins (float64 output; leading/trailing gaps stay NULL).

Ray-native plan — the same two-stage shape as the keyed sortmerge aggregate:
per-batch combiner-reduced partials (PanePartialAgg with a tumbling window
of size ``step``), ONE range-shuffle ``sort`` on the KEY ALONE (equal keys
co-locate per Ray's sort boundary semantics — a key's whole timeline must
meet in one task to know its gaps), then a per-block vectorized kernel:
merge partials per (key, bin), build every key's dense grid with
np.repeat/arange, scatter the observed rows in with one ``take``, and fill
with segmented maximum.accumulate index tricks — no Python loop over keys,
rows, or bins.

Scale/partitioning assumptions (documented): shuffled rows are partials —
≤ one per (key, bin) per upstream block; a key's DENSE grid
(span // step rows) materializes in its reducer, so ``step`` must be sized
so the busiest key's bin count fits a task (same per-key-state class as
session windows). With ``keys=()`` the grid is global and bounded by
span // step — it rides the tree path (repartition(1)).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from saber_ray.core.aggregates import AggSpec, finalize
from saber_ray.core.windows import Window
from saber_ray.stages.window_agg import (PanePartialAgg, PartialMerge, _WID,
                                         _encode_null_keys)

FILLS = ("null", "zero", "ffill", "linear")


def _segment_starts(tbl: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Row indices where a new key segment begins (tbl sorted by keys).
    Key columns are null-free here (encoded), so plain != is total."""
    n = tbl.num_rows
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in keys:
        col = tbl[k].combine_chunks() if isinstance(tbl[k], pa.ChunkedArray) \
            else tbl[k]
        neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        new[1:] |= neq.to_numpy(zero_copy_only=False)
    return new


class _GridFill:
    """Post-shuffle kernel: merge partials, densify per key, finalize, fill."""

    def __init__(self, aggs, enc_keys, sort_keys, dec, *, step, fill,
                 range_us, round_decimals, emit_start, out_names, out_types):
        self.aggs = list(aggs)
        self.enc_keys = list(enc_keys)      # decoded later by ``dec``
        self.sort_keys = list(sort_keys)
        self.dec = dec
        self.step = int(step)
        self.fill = fill
        self.range_us = range_us
        self.round_decimals = round_decimals
        self.emit_start = emit_start
        self.out_names = out_names
        self.out_types = out_types
        self.merge = PartialMerge(aggs, self.enc_keys,
                                  extra_keys=[f"__nn_{k}" for k in enc_keys])

    def _empty(self) -> pa.Table:
        return pa.schema(list(zip(self.out_names, self.out_types))) \
            .empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._empty()
        m = self.merge(batch)
        m = m.sort_by([(k, "ascending") for k in self.sort_keys]
                      + [(_WID, "ascending")]).combine_chunks()
        wid = m[_WID].to_numpy(zero_copy_only=False)
        n = m.num_rows

        if self.sort_keys:
            seg_new = _segment_starts(m, self.sort_keys)
        else:
            seg_new = np.zeros(n, dtype=bool)
            seg_new[0] = True
        seg_first = np.flatnonzero(seg_new)               # per segment
        seg_last = np.append(seg_first[1:], n) - 1
        if self.range_us is not None:
            lo_us, hi_us = self.range_us
            lo = np.full(len(seg_first), lo_us // self.step, dtype=np.int64)
            hi = np.full(len(seg_first), (hi_us - 1) // self.step,
                         dtype=np.int64)
        else:
            lo, hi = wid[seg_first], wid[seg_last]
        counts = hi - lo + 1
        total = int(counts.sum())
        csum = np.concatenate(([0], np.cumsum(counts)))   # grid seg offsets

        # dense grid bins: per segment lo..hi
        rep = np.repeat(np.arange(len(seg_first)), counts)
        offs = np.arange(total) - csum[rep]
        grid_wid = lo[rep] + offs
        # observed row -> grid position
        seg_of_row = np.cumsum(seg_new) - 1
        pos = csum[seg_of_row] + (wid - lo[seg_of_row])
        inside = (wid >= lo[seg_of_row]) & (wid <= hi[seg_of_row])
        src = np.flatnonzero(inside)                      # kept observed rows
        pos = pos[src]
        idx = np.full(total, -1, dtype=np.int64)
        idx[pos] = src
        observed = idx >= 0
        take_obs = pa.array(np.where(observed, idx, 0))
        obs_mask = pa.array(observed)

        fin = finalize(m, self.aggs, round_decimals=self.round_decimals)
        key_take = pa.array(seg_first[rep])

        cols: dict[str, pa.Array] = {}
        for k in self.enc_keys:
            col = m[k].combine_chunks() if isinstance(m[k], pa.ChunkedArray) \
                else m[k]
            cols[k] = col.take(key_take)
        for k in self.enc_keys:
            nn = m[f"__nn_{k}"]
            nn = nn.combine_chunks() if isinstance(nn, pa.ChunkedArray) else nn
            cols[f"__nn_{k}"] = nn.take(key_take)
        cols[_WID] = pa.array(grid_wid, type=pa.int64())
        if self.emit_start:
            cols["window_start_us"] = pa.array(grid_wid * self.step,
                                               type=pa.int64())
        cols["is_gap"] = pc.invert(obs_mask)

        if self.fill == "ffill":
            # last observed grid row at-or-before each row, within segment
            last = _segmented_last(observed, csum[rep])
            ok = last >= 0
            # unobserved grid row 0 leaves idx[0] = -1 — mask before take
            fill_idx = pa.array(np.maximum(idx[np.where(ok, last, 0)], 0))
            ok_pa = pa.array(ok)
        if self.fill == "linear":
            last = _segmented_last(observed, csum[rep])
            nxt = _segmented_next(observed, csum[rep] + counts[rep])

        for a in self.aggs:
            arr = fin[a.alias]
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
                else arr
            g = pc.if_else(obs_mask, arr.take(take_obs),
                           pa.scalar(None, arr.type))
            if self.fill == "zero" and (pa.types.is_integer(g.type)
                                        or pa.types.is_floating(g.type)):
                g = pc.fill_null(g, pa.scalar(0, g.type))
            elif self.fill == "ffill":
                filled = arr.take(fill_idx)
                g = pc.if_else(ok_pa, filled, pa.scalar(None, arr.type))
            elif self.fill == "linear" and (pa.types.is_integer(g.type)
                                            or pa.types.is_floating(g.type)):
                v = pc.cast(arr, pa.float64()).to_numpy(zero_copy_only=False)
                ok = (last >= 0) & (nxt >= 0)
                li = np.where(ok, last, 0)
                ni = np.where(ok, nxt, 0)
                v0 = v[idx[li]]
                v1 = v[idx[ni]]
                span = (ni - li).astype(np.float64)
                span[span == 0] = 1.0
                w = (np.arange(total) - li) / span
                out = v0 + w * (v1 - v0)
                if self.round_decimals is not None:
                    # round-half-even like the observed path
                    out = np.round(out, self.round_decimals)
                g = pc.if_else(pa.array(ok), pa.array(out, pa.float64()),
                               pa.scalar(None, pa.float64()))
            cols[a.alias] = g

        t = pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols.values()], names=list(cols))
        t = self.dec(t)
        return t.select(self.out_names)


def _segmented_last(observed: np.ndarray, seg_start: np.ndarray) -> np.ndarray:
    """For each grid row, index of the last observed grid row at-or-before it
    in its own segment (-1 when none). ``seg_start[i]`` = grid index where
    row i's segment begins; a global running max is segment-correct because
    indices from earlier segments are all < seg_start."""
    n = len(observed)
    run = np.maximum.accumulate(np.where(observed, np.arange(n), -1))
    return np.where(run >= seg_start, run, -1)


def _segmented_next(observed: np.ndarray, seg_end: np.ndarray) -> np.ndarray:
    """Mirror of _segmented_last: next observed grid row at-or-after each
    grid row within its segment (-1 when none); ``seg_end`` is
    one-past-the-end of the row's segment."""
    n = len(observed)
    run = np.minimum.accumulate(
        np.where(observed, np.arange(n), n + 1)[::-1])[::-1]
    return np.where(run < seg_end, run, -1)


def resample(
    ds, *,
    step: int,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] | str = (),
    ts_col: str = "ts",
    fill: str = "ffill",
    range_us: Optional[tuple[int, int]] = None,
    round_decimals: Optional[int] = None,
    emit_start: bool = False,
    shuffle_partitions: Optional[int] = None,
):
    """Tumbling aggregate of ``step`` microseconds per key, densified onto
    the full bin grid (per-key [min_bin, max_bin], or the explicit
    ``range_us=(lo_us, hi_us)`` half-open span for every key) with gap rows
    synthesized per ``fill`` (see module docstring). Output: key columns,
    ``window_id`` (= ts // step), optional ``window_start_us``, ``is_gap``
    (true for synthesized rows), then one column per aggregate alias.
    ``fill="linear"`` emits float64 for numeric aggregates."""
    if fill not in FILLS:
        raise ValueError(f"fill must be one of {FILLS}, got {fill!r}")
    if step <= 0:
        raise ValueError(f"step must be positive, got {step}")
    if range_us is not None and range_us[1] <= range_us[0]:
        raise ValueError(f"empty range_us {range_us}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    aggs = list(aggs)
    seen = set()
    for a in aggs:
        if a.alias in seen:
            raise ValueError(f"duplicate aggregate alias {a.alias!r}")
        seen.add(a.alias)

    schema = ds.schema()
    if schema is None:
        return ds.limit(0)
    types = {n: t for n, t in zip(schema.names, schema.types)}

    window = Window.tumbling(step)
    partial = PanePartialAgg(window, aggs, keys, ts_col)
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    enc, dec, sort_keys = _encode_null_keys(keys)

    # output schema (fixed up-front so empty blocks agree)
    out_names = list(keys) + [_WID] \
        + (["window_start_us"] if emit_start else []) + ["is_gap"] \
        + [a.alias for a in aggs]
    probe = pa.schema([(n, types[n]) for n in schema.names]).empty_table()
    fin = finalize(partial(probe), aggs, round_decimals=round_decimals)
    fin_types = {}
    for a in aggs:
        t = fin[a.alias].type
        if fill == "linear" and (pa.types.is_integer(t)
                                 or pa.types.is_floating(t)):
            t = pa.float64()
        fin_types[a.alias] = t
    out_types = [types[k] for k in keys] + [pa.int64()] \
        + ([pa.int64()] if emit_start else []) + [pa.bool_()] \
        + [fin_types[a.alias] for a in aggs]

    gridfill = _GridFill(aggs, keys, sort_keys, dec, step=step, fill=fill,
                         range_us=range_us, round_decimals=round_decimals,
                         emit_start=emit_start, out_names=out_names,
                         out_types=out_types)
    if keys:
        import ray
        nparts = shuffle_partitions or max(
            8, int(ray.cluster_resources().get("CPU", 8)))
        return partials.map_batches(enc, batch_format="pyarrow",
                                    zero_copy_batch=True) \
            .repartition(nparts).sort(sort_keys) \
            .map_batches(gridfill, batch_format="pyarrow",
                         zero_copy_batch=True)
    # global grid: bounded (span // step rows) — tree fan-in, no shuffle
    return partials.repartition(1).map_batches(
        gridfill, batch_format="pyarrow", zero_copy_batch=True)
