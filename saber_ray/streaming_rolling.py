"""Streaming rolling RANGE-frame aggregates over an unbounded stream.

The epoch/checkpoint twin of ``stages/rolling.py`` (range mode) on the
shared keyed-stream engine template: per key, one output row per input
row carrying ``agg(col) OVER (PARTITION BY keys ORDER BY event_time
RANGE BETWEEN p PRECEDING AND f FOLLOWING)`` — running
events-in-the-last-hour / moving-average features, the per-row streaming
counterpart of the reference's per-window aggregates (SURVEY.md §2.1).

Both engines share the SAME per-block kernel (``rolling.rolling_block``);
the streaming side only decides WHICH rows are final. Emission is a pure
time threshold, which makes the exactly-once argument one line:

- a row emits iff ``t_i + f < watermark``: every frame row has event time
  <= t_i + f < watermark, so all are sealed and present (late rows are
  dead-lettered), and no future row (ts >= watermark) can ever enter the
  frame — the aggregate equals the batch kernel's.
- the threshold ``watermark - f`` is monotone, so "emit rows in
  [prev_threshold, new_threshold)" emits every row exactly once with no
  per-row bookkeeping.
- retained state = rows with event time >= threshold - p: un-emitted rows
  plus exactly the context a future row's frame can reach back into.
  Bounded by the (p + f + lateness)-wide time band per key.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from saber_ray.stages.rolling import _OPS, rolling_block
from saber_ray.streaming_keyed import KeyedStreamEngine

_META_KEY = b"saber_ray.emit_below"


class _RollingState:
    """One hash partition of rolling state: the retained row buffer (Arrow
    table with ``__t`` event time) plus the monotone emission threshold,
    re-running the shared batch kernel over the bounded buffer per epoch."""

    def __init__(self, keys: list, col: str, aggs: dict,
                 preceding: int, following: int, keep: list, ts_out: str):
        from saber_ray.stages.window_agg import _encode_null_keys
        self.keys = list(keys)
        self.col = col
        self.aggs = dict(aggs)
        self.p = int(preceding)
        self.f = int(following)
        self.keep = list(keep)
        self.ts_out = ts_out
        self.enc, self.dec, self.sort_keys = _encode_null_keys(self.keys)
        self.open: Optional[pa.Table] = None
        self.emit_below: Optional[int] = None
        self.pend: list[pa.Table] = []
        self._seen: set = set()

    def ingest(self, epoch: int, src: str, t: pa.Table) -> None:
        """Same exactly-once contract as SessionStateActor.ingest: a
        retried task re-pushes with the same (epoch, src) and is dropped."""
        if (epoch, src) in self._seen or t.num_rows == 0:
            return
        self._seen.add((epoch, src))
        self.pend.append(t)

    def _rename(self, out: pa.Table) -> pa.Table:
        names = [self.ts_out if c == "__t" else c
                 for c in out.column_names]
        return out.rename_columns(names)

    def _empty(self, t: Optional[pa.Table]) -> pa.Table:
        def ftype(c):
            return t.schema.field(c).type if t is not None else pa.int64()
        fields = [(k, ftype(k)) for k in self.keys]
        fields.append((self.ts_out, pa.int64()))
        fields += [(c, ftype(c)) for c in self.keep]
        from saber_ray.stages.rolling import rolling_out_type
        vt = ftype(self.col)
        fields += [(a, rolling_out_type(op, vt))
                   for a, op in self.aggs.items()]
        return pa.schema(fields).empty_table()

    def process(self, watermark: Optional[int]) -> pa.Table:
        if self.pend:
            parts = ([self.open] if self.open is not None
                     and self.open.num_rows else []) + self.pend
            self.open = pa.concat_tables(parts, promote_options="default")
            self.pend = []
            self._seen.clear()               # epoch boundary
        t = self.open
        if t is None or t.num_rows == 0:
            return self._empty(t)
        thresh = None if watermark is None else watermark - self.f
        full = rolling_block(
            self.enc(t), sort_keys=self.sort_keys, order_by=["__t"],
            col=self.col, aggs=self.aggs, rows_p=None, rows_f=None,
            range_preceding=self.p, range_following=self.f, keep=self.keep)
        full = self.dec(full)
        ts = full["__t"]
        emit = pc.less(ts, thresh) if thresh is not None \
            else pa.array([True] * full.num_rows)
        if self.emit_below is not None:
            emit = pc.and_(emit, pc.greater_equal(ts, self.emit_below))
        out = self._rename(full.filter(emit))
        out = out.select([self.ts_out if c == "__t" else c for c in
                          self.keys + ["__t"] + self.keep
                          + list(self.aggs)])
        if watermark is None:                # end-of-stream finalize
            self.open = None
        else:
            self.open = t.filter(
                pc.greater_equal(t["__t"], thresh - self.p))
            self.emit_below = thresh
        return out

    def snapshot(self, path: str) -> None:
        if self.open is not None and self.open.num_rows:
            meta = {_META_KEY: str(self.emit_below).encode()} \
                if self.emit_below is not None else {}
            pq.write_table(self.open.replace_schema_metadata(meta), path)
        elif os.path.exists(path):
            os.remove(path)

    def restore(self, path: str) -> None:
        if os.path.exists(path):
            self.open = pq.read_table(path)
            md = self.open.schema.metadata or {}
            if _META_KEY in md:
                self.emit_below = int(md[_META_KEY])
        else:
            self.open = None


RollingStateActor = ray.remote(_RollingState)


class StreamingRolling(KeyedStreamEngine):
    """Micro-batch streaming rolling RANGE aggregates over an ordered file
    stream. Output matches the batch operator (``stages/rolling.py`` range
    mode) / SQL RANGE window oracle over the concatenated stream:
    keys..., ts (int64 event time), keep..., one column per agg alias.
    Epoch protocol lives in ``streaming_keyed.KeyedStreamEngine``.
    """

    _snap_prefix = "rlstate-"
    _out_prefix = "roll-"

    def __init__(self, out_dir: str, *, col: str, aggs: dict[str, str],
                 range_preceding: int = 0, range_following: int = 0,
                 keys: Sequence[str] = ("conv_id",), ts_col: str = "ts",
                 keep: Sequence[str] = (),
                 num_partitions: int = 4, allowed_lateness: int = 0,
                 monitor=None):
        if not aggs:
            raise ValueError("aggs must name at least one aggregate")
        for a, op in aggs.items():
            if op not in _OPS:
                raise ValueError(f"unsupported op {op!r} for {a!r}")
        if range_preceding < 0 or range_following < 0:
            raise ValueError("range bounds must be >= 0")
        self.monitor = monitor
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.col = col
        self.aggs = dict(aggs)
        self.p = int(range_preceding)
        self.f = int(range_following)
        self.keys = list(keys)
        self.ts_col = ts_col
        self.keep = list(keep)
        self.n = num_partitions
        self.lateness = allowed_lateness

    def _ingest_columns(self):
        return list(dict.fromkeys(self.keep + [self.col]))

    def _spawn_actors(self):
        # ingest replaces ts_col with the int64 ``__t`` column — remap a
        # value column that aggregates the event time itself
        col = "__t" if self.col == self.ts_col else self.col
        return [RollingStateActor.remote(
            self.keys, col, self.aggs, self.p, self.f, self.keep,
            self.ts_col) for _ in range(self.n)]
