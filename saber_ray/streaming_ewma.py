"""Streaming per-key EWMA over an unbounded stream.

The epoch/checkpoint twin of ``stages/ewma.py`` on the shared keyed-stream
template. EWMA is a pure left-to-right recurrence, so the streaming story
is the cleanest of the family: a row emits as soon as it is SEALED
(``event_time < watermark`` — no later row can sort before it, late rows
are dead-lettered), and the retained state per key is O(1): the running
(S, W) numerator/weight pair at the last emitted non-null row (for
``adjust=False`` W is the plain y with S = y, W = 1). The union of
emissions over a finite stream equals the batch operator row-for-row.

Mechanics: the carry pair re-enters each epoch's kernel as ONE pseudo-row
per key with event time -inf (sorts first in its key segment, always
sealed); the pseudo-row's contribution seeds the same chunked
closed-form scan the batch kernel uses (``ewma._chunked_scan``), and
pseudo-rows are cut from the output. Ties on event time are broken by
``tiebreak`` columns — give a unique one (the batch operator's
determinism contract).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from saber_ray.stages.ewma import _chunked_scan
from saber_ray.stages.resample import _segment_starts
from saber_ray.streaming_keyed import KeyedStreamEngine

_TMIN = np.iinfo(np.int64).min


class _EwmaState:
    """One hash partition: unsealed row buffer + one carry row per key."""

    def __init__(self, keys: list, col: str, tiebreak: list, alpha: float,
                 adjust: bool, alias: str, ts_out: str):
        from saber_ray.stages.window_agg import _encode_null_keys
        self.keys = list(keys)
        self.col = col
        self.tiebreak = list(tiebreak)
        self.alpha = float(alpha)
        self.adjust = bool(adjust)
        self.alias = alias
        self.ts_out = ts_out
        self.enc, self.dec, self.sort_keys = _encode_null_keys(self.keys)
        self.open: Optional[pa.Table] = None   # enc rows: keys,__t,tb,col
        self.carry: Optional[pa.Table] = None  # enc keys,__t=-inf,__cs,__cw
        self.pend: list[pa.Table] = []
        self._seen: set = set()

    def ingest(self, epoch: int, src: str, t: pa.Table) -> None:
        if (epoch, src) in self._seen or t.num_rows == 0:
            return
        self._seen.add((epoch, src))
        self.pend.append(self.enc(t))

    def _with_state_cols(self, t: pa.Table, carry: bool) -> pa.Table:
        n = t.num_rows
        if carry:
            return t
        t = t.append_column("__cs", pa.nulls(n, pa.float64()))
        t = t.append_column("__cw", pa.nulls(n, pa.float64()))
        return t

    def process(self, watermark: Optional[int]) -> pa.Table:
        parts = []
        if self.open is not None and self.open.num_rows:
            parts.append(self.open)
        parts += [self._with_state_cols(p, False) for p in self.pend]
        self.pend = []
        self._seen.clear()
        if self.carry is not None and self.carry.num_rows:
            parts.append(self.carry)
        if not parts:
            return pa.table({})
        u = pa.concat_tables(parts, promote_options="default") \
            .combine_chunks()
        u = u.sort_by([(k, "ascending") for k in self.sort_keys]
                      + [("__t", "ascending")]
                      + [(tb, "ascending") for tb in self.tiebreak]) \
            .combine_chunks()
        self.open = None

        ts = u["__t"].to_numpy(zero_copy_only=False)
        sealed = np.ones(len(ts), dtype=bool) if watermark is None \
            else ts < watermark
        is_carry = pc.is_valid(u["__cw"]).to_numpy(zero_copy_only=False)

        seg_new = _segment_starts(u, self.sort_keys)
        seg_id = np.cumsum(seg_new) - 1

        # the recurrence runs over SEALED rows only (they form each key's
        # prefix); carry pseudo-rows are always sealed (ts = -inf)
        e_idx = np.flatnonzero(sealed)
        out_y = np.full(len(ts), np.nan)
        new_carry = None
        if len(e_idx):
            x = pc.cast(u[self.col], pa.float64()) \
                .to_numpy(zero_copy_only=False)[e_idx]
            cs = u["__cs"].to_numpy(zero_copy_only=False)[e_idx]
            cw = u["__cw"].to_numpy(zero_copy_only=False)[e_idx]
            carry_m = is_carry[e_idx]
            sid = seg_id[e_idx]
            valid = carry_m | ~np.isnan(x)
            v = np.flatnonzero(valid)
            if len(v):
                xv, sv = x[v], sid[v]
                cm = carry_m[v]
                new = np.concatenate(([True], sv[1:] != sv[:-1]))
                seg_first = np.maximum.accumulate(
                    np.where(new, np.arange(len(v)), -1))
                b = 1.0 - self.alpha
                L = 4096 if b >= 0.995 else max(
                    8, min(4096, int(250.0 / -np.log10(b))))
                first = new                     # first valid row of segment
                # a carry pseudo-row sorts first (ts = -inf), so a segment
                # is carry-led iff cm is true at its first valid row
                carried = cm[seg_first]
                if self.adjust:
                    c_s = np.where(cm, cs[v], xv)
                    c_w = np.where(cm, cw[v], 1.0)
                else:
                    # y-recurrence: carry rows contribute their y; the
                    # first REAL valid row of an UNSEEDED segment
                    # contributes x (y_0 = x_0), every later row alpha*x
                    c_s = np.where(cm, cs[v],
                                   np.where(first & ~carried, xv,
                                            self.alpha * xv))
                    c_w = None
                s = _chunked_scan(c_s, seg_first, b, L)
                if self.adjust:
                    w = _chunked_scan(c_w, seg_first, b, L)
                    yv = s / w
                else:
                    w = np.ones(len(v))
                    yv = s
                real = ~cm
                gi = e_idx[v[real]]
                out_y[gi] = yv[real]
                # new carry: per segment, the state at its LAST valid row
                seg_last = np.append(
                    np.flatnonzero(new)[1:], len(v)) - 1
                rows_u = e_idx[v[seg_last]]     # row in u (real or carry)
                ccols = {}
                for k in self.sort_keys:
                    colk = u[k].combine_chunks() \
                        if isinstance(u[k], pa.ChunkedArray) else u[k]
                    ccols[k] = colk.take(pa.array(rows_u))
                ccols["__t"] = pa.array(
                    np.full(len(rows_u), _TMIN), pa.int64())
                ccols["__cs"] = pa.array(s[seg_last], pa.float64())
                ccols["__cw"] = pa.array(w[seg_last], pa.float64())
                base = u.slice(0, 0).drop_columns(
                    [c for c in u.column_names if c in ccols])
                other = {c: pa.nulls(len(rows_u),
                                     base.schema.field(c).type)
                         for c in base.column_names}
                new_carry = pa.table({**ccols, **other}).select(
                    u.column_names)
        # keys that had sealed valid rows (including their own old carry
        # pseudo-row, which is always sealed) got a fresh carry above; the
        # left-anti pass below is a belt-and-braces guard for any old
        # carry key that somehow produced none
        keep_old = []
        if self.carry is not None and self.carry.num_rows:
            if new_carry is not None and new_carry.num_rows:
                oldk = self.carry.select(self.sort_keys)
                newk = new_carry.select(self.sort_keys) \
                    .append_column("__has", pa.array(
                        np.ones(new_carry.num_rows, dtype=np.int8)))
                j = oldk.append_column(
                    "__row", pa.array(np.arange(self.carry.num_rows))) \
                    .join(newk, keys=self.sort_keys,
                          join_type="left outer").sort_by("__row")
                miss = ~pc.is_valid(j["__has"]).to_numpy(
                    zero_copy_only=False)
                if miss.any():
                    keep_old.append(self.carry.filter(pa.array(miss)))
            else:
                keep_old.append(self.carry)
        carries = ([new_carry] if new_carry is not None
                   and new_carry.num_rows else []) + keep_old
        self.carry = pa.concat_tables(carries, promote_options="default") \
            .combine_chunks() if carries else None

        # retained buffer: unsealed REAL rows
        keep_mask = ~sealed & ~is_carry
        if watermark is None:
            self.open = None
            self.carry = None
        elif keep_mask.any():
            self.open = u.filter(pa.array(keep_mask))

        # emitted: sealed real rows, with y (NULL where x null)
        emit_rows = np.flatnonzero(sealed & ~is_carry)
        if not len(emit_rows):
            return pa.table({})
        em = u.take(pa.array(emit_rows))
        y = out_y[emit_rows]
        ok = ~np.isnan(y)
        arr = pc.if_else(pa.array(ok),
                         pa.array(np.where(ok, y, 0.0), pa.float64()),
                         pa.scalar(None, pa.float64()))
        em = em.append_column(self.alias, arr)
        em = self.dec(em)
        names = [self.ts_out if c == "__t" else c for c in em.column_names]
        em = em.rename_columns(names)
        return em.select(self.keys + [self.ts_out] + self.tiebreak
                         + [self.col, self.alias])

    def snapshot(self, path: str) -> None:
        import io
        import pyarrow.ipc as pa_ipc

        def ipc(t):
            if t is None:
                return None
            buf = io.BytesIO()
            with pa_ipc.new_stream(buf, t.schema) as w:
                w.write_table(t)
            return buf.getvalue()
        if (self.open is None or self.open.num_rows == 0) \
                and (self.carry is None or self.carry.num_rows == 0):
            if os.path.exists(path):
                os.remove(path)
            return
        pq.write_table(pa.table({
            "open": pa.array([ipc(self.open)], pa.binary()),
            "carry": pa.array([ipc(self.carry)], pa.binary())}), path)

    def restore(self, path: str) -> None:
        import pyarrow.ipc as pa_ipc

        def unipc(b):
            return None if b is None else pa_ipc.open_stream(b).read_all()
        if os.path.exists(path):
            t = pq.read_table(path)
            self.open = unipc(t["open"][0].as_py())
            self.carry = unipc(t["carry"][0].as_py())
        else:
            self.open = None
            self.carry = None


EwmaStateActor = ray.remote(_EwmaState)


class StreamingEwma(KeyedStreamEngine):
    """Micro-batch streaming EWMA over an ordered file stream; union of
    emissions == the batch ``stages/ewma.ewma`` on the concatenated input
    (same order_by = event time + tiebreak), kill/resume-stable."""

    _snap_prefix = "ewstate-"
    _out_prefix = "ewma-"

    def __init__(self, out_dir: str, *, col: str, alpha: float,
                 adjust: bool = False, keys: Sequence[str] = ("user_id",),
                 ts_col: str = "ts", tiebreak: Sequence[str] = (),
                 alias: Optional[str] = None,
                 num_partitions: int = 4, allowed_lateness: int = 0,
                 monitor=None):
        if not (0.0 < alpha < 1.0):
            raise ValueError(f"alpha must be in (0, 1), got {alpha}")
        if not keys:
            raise ValueError("streaming ewma requires at least one key")
        self.monitor = monitor
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.col = col
        self.alpha = float(alpha)
        self.adjust = bool(adjust)
        self.keys = list(keys)
        self.ts_col = ts_col
        self.tiebreak = [t for t in tiebreak if t != ts_col]
        self.alias = alias or f"{col}_ewma"
        self.n = num_partitions
        self.lateness = allowed_lateness

    def _ingest_columns(self):
        return list(dict.fromkeys([self.col] + self.tiebreak))

    def _spawn_actors(self):
        col = "__t" if self.col == self.ts_col else self.col
        return [EwmaStateActor.remote(
            self.keys, col, self.tiebreak, self.alpha, self.adjust,
            self.alias, self.ts_col) for _ in range(self.n)]
