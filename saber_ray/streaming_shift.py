"""Streaming LAG/LEAD: per-key row-offset access over an unbounded stream.

The epoch/checkpoint twin of ``stages/shift.py`` on the shared keyed-stream
engine template (streaming_session.py / streaming_cep.py shape:
hash-partitioned state actors, parallel direct-push ingest,
watermark-driven emission, exactly-once resume). The reference never
exposes neighbouring tuples (its windows aggregate — SURVEY.md §2.1), but
LAG/LEAD is the bread-and-butter per-row streaming feature (previous-turn
text, response pairing, turn-gap) and the natural streaming counterpart of
the batch operator.

Semantics: per key, ordered by event time (+ tiebreak), output one row per
input row carrying ``LAG(col, k)`` / ``LEAD(col, k)`` values, NULL where
the offset row falls outside the key's partition — exactly the batch
kernel / SQL window-function oracle over the whole stream.

Watermark correctness argument (why emission is exactly-once AND equal to
the batch kernel):

- late rows (ts < watermark at ingest) are dead-lettered, so every future
  row has ts >= watermark. Sealed rows (ts < watermark) of a key are a
  ts-sorted PREFIX of its run that no future row can ever sort into.
- a row emits iff it is sealed AND its ``max_fwd``-th in-run successor is
  sealed (or end-of-stream): its LAG sources sort before it (sealed), and
  positions i+1..i+max_fwd are final because no future row can sort among
  sealed rows — so every offset value (and every NULL-at-partition-edge)
  is exactly what the batch kernel computes.
- retained state per key = unsealed rows + the sealed-but-unemittable tail
  (at most ``max_fwd`` rows) + the last ``max_back`` emitted rows flagged
  ``__ctx`` (LAG context for future rows; they never re-emit). Because the
  buffer always keeps the FULL ``max_back`` context when it exists, a
  missing LAG source means the key's run genuinely started — never a drop.
  Bounded state for unbounded streams.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from saber_ray.streaming_keyed import KeyedStreamEngine
from saber_ray.streaming_session import _key_codes, _same_as_prev


class _ShiftState:
    """One hash partition of shift state: the retained row buffer (Arrow
    table with ``__t`` event time and ``__ctx`` emitted-context flag),
    processed per epoch with one sort + vectorized offset takes — zero
    per-row/per-key Python."""

    def __init__(self, keys: list, specs: dict, tiebreak: list,
                 keep: list, ts_out: str):
        self.keys = list(keys)
        self.specs = {a: (c, int(off)) for a, (c, off) in specs.items()}
        self.tiebreak = list(tiebreak)
        self.keep = list(keep)
        self.ts_out = ts_out
        self.max_back = max((off for _, off in self.specs.values()
                             if off > 0), default=0)
        self.max_fwd = max((-off for _, off in self.specs.values()
                            if off < 0), default=0)
        self.open: Optional[pa.Table] = None
        self.pend: list[pa.Table] = []
        self._seen: set = set()

    def ingest(self, epoch: int, src: str, t: pa.Table) -> None:
        """Same exactly-once contract as SessionStateActor.ingest: a
        retried task re-pushes with the same (epoch, src) and is dropped."""
        if (epoch, src) in self._seen or t.num_rows == 0:
            return
        self._seen.add((epoch, src))
        if "__ctx" not in t.column_names:
            t = t.append_column(
                "__ctx", pa.array(np.zeros(t.num_rows, dtype=bool)))
        self.pend.append(t)

    def _out_schema(self, t: Optional[pa.Table]) -> pa.Schema:
        def ftype(c):
            return t.schema.field(c).type if t is not None else pa.int64()
        fields = [(k, ftype(k)) for k in self.keys]
        fields.append((self.ts_out, pa.int64()))
        fields += [(c, ftype(c)) for c in self.tiebreak + self.keep]
        fields += [(a, ftype(c)) for a, (c, _) in self.specs.items()]
        return pa.schema(fields)

    def process(self, watermark: Optional[int]) -> pa.Table:
        if self.pend:
            parts = ([self.open] if self.open is not None
                     and self.open.num_rows else []) + self.pend
            self.open = pa.concat_tables(parts, promote_options="default")
            self.pend = []
            self._seen.clear()               # epoch boundary
        t = self.open
        if t is None or t.num_rows == 0:
            return self._out_schema(t).empty_table()
        order = pc.sort_indices(t, sort_keys=[
            (k, "ascending") for k in self.keys + ["__t"] + self.tiebreak])
        t = t.take(order).combine_chunks()
        n = t.num_rows
        ts = t["__t"].to_numpy(zero_copy_only=False)
        ctx = t["__ctx"].to_numpy(zero_copy_only=False)
        same = _same_as_prev(_key_codes(t, self.keys), n)
        rid = np.cumsum(~same)               # key run id per row
        idx = np.arange(n, dtype=np.int64)
        chg = ~same
        run_start = np.maximum.accumulate(np.where(chg, idx, 0))
        sealed = np.ones(n, dtype=bool) if watermark is None \
            else ts < watermark
        if watermark is None:                # end-of-stream finalize
            emit = ~ctx
        else:
            emit = sealed & ~ctx
            if self.max_fwd:
                # successor i+max_fwd exists in-run and is sealed (sealed
                # rows are a prefix per run, so this implies sealed[i] too)
                succ = idx + self.max_fwd
                safe = np.minimum(succ, n - 1)
                emit &= (succ < n) & (rid[safe] == rid) & sealed[safe]
        starts = np.flatnonzero(emit)
        out = self._emit(t, starts, rid, run_start) if len(starts) \
            else self._out_schema(t).empty_table()
        # retention: final rows are a prefix of each run (ctx prefix, then
        # the emittable range); keep the last max_back finals as __ctx
        # context + everything non-final
        if watermark is None:
            self.open = None
        else:
            final = ctx | emit
            # first non-final index per run (capped at the RUN's end — a
            # fully-final run must keep ITS last max_back rows as context,
            # not rows at the end of the whole buffer), broadcast to rows
            nf_idx = np.where(final, n, idx)
            run_heads = np.flatnonzero(chg)
            run_lens = np.diff(np.append(run_heads, n))
            b_run = np.minimum(np.minimum.reduceat(nf_idx, run_heads),
                               run_heads + run_lens)
            b = np.repeat(b_run, run_lens)
            keep_mask = idx >= np.maximum(b - self.max_back, run_start)
            kept = t.filter(pa.array(keep_mask))
            kept = kept.set_column(
                kept.schema.get_field_index("__ctx"), "__ctx",
                pa.array(final[keep_mask]))
            self.open = kept
        return out

    def _emit(self, t: pa.Table, rows: np.ndarray, rid: np.ndarray,
              run_start: np.ndarray) -> pa.Table:
        n = t.num_rows
        cols = [t[k].combine_chunks().take(pa.array(rows))
                for k in self.keys]
        ts = t["__t"].to_numpy(zero_copy_only=False)
        cols.append(pa.array(ts[rows], type=pa.int64()))
        for c in self.tiebreak + self.keep:
            cols.append(t[c].combine_chunks().take(pa.array(rows)))
        for alias, (c, off) in self.specs.items():
            src = rows - off
            ok = (src >= 0) & (src < n)
            safe = np.clip(src, 0, n - 1)
            ok &= rid[safe] == rid[rows]     # same key run
            safe = np.where(ok, safe, 0)
            cols.append(t[c].combine_chunks().take(
                pa.array(safe, mask=~ok)))   # null index -> null output
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols], schema=self._out_schema(t))

    def snapshot(self, path: str) -> None:
        if self.open is not None and self.open.num_rows:
            pq.write_table(self.open, path)
        elif os.path.exists(path):
            os.remove(path)

    def restore(self, path: str) -> None:
        self.open = pq.read_table(path) if os.path.exists(path) else None


ShiftStateActor = ray.remote(_ShiftState)


class StreamingShift(KeyedStreamEngine):
    """Micro-batch streaming LAG/LEAD over an ordered file stream.

    Output matches the batch kernel (``stages/shift.py``) run on the
    concatenated stream with ``order_by=[ts]+tiebreak`` — the DuckDB
    LAG()/LEAD() window-function oracle: keys..., ts (int64 event time),
    tiebreak..., keep..., one column per spec alias. Epoch protocol
    (ingest/watermark/snapshot/exactly-once resume) lives in
    ``streaming_keyed.KeyedStreamEngine``.
    """

    _snap_prefix = "shstate-"
    _out_prefix = "shift-"

    def __init__(self, out_dir: str, *,
                 specs: dict[str, tuple[str, int]],
                 keys: Sequence[str] = ("conv_id",), ts_col: str = "ts",
                 tiebreak: Sequence[str] = (),
                 keep: Sequence[str] = (),
                 num_partitions: int = 4, allowed_lateness: int = 0,
                 monitor=None):
        if not specs:
            raise ValueError("specs must name at least one shifted column")
        for a, (c, off) in specs.items():
            if int(off) == 0:
                raise ValueError(
                    f"offset 0 for {a!r}: use the column directly")
        self.monitor = monitor
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.specs = dict(specs)
        self.keys = list(keys)
        self.ts_col = ts_col
        self.tiebreak = list(tiebreak)
        self.keep = list(keep)
        self.n = num_partitions
        self.lateness = allowed_lateness

    def _ingest_columns(self):
        src_cols = [c for c, _ in self.specs.values()]
        return list(dict.fromkeys(self.tiebreak + self.keep + src_cols))

    def _spawn_actors(self):
        # ingest replaces ts_col with the int64 ``__t`` column — remap
        # specs that shift the event-time column itself
        actor_specs = {a: ("__t" if c == self.ts_col else c, off)
                       for a, (c, off) in self.specs.items()}
        return [ShiftStateActor.remote(
            self.keys, actor_specs, self.tiebreak, self.keep, self.ts_col)
            for _ in range(self.n)]
