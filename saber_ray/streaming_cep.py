"""Streaming CEP: sequence-pattern matching over an unbounded stream.

The canonically-streaming workload (the reference's whole premise is
unbounded in-order streams, QueryApplication.java:51-61); the batch kernel
lives in stages/cep.py — this is its epoch/checkpoint twin on the shared
engine template (streaming_session.py shape: hash-partitioned state actors,
parallel direct-push ingest, watermark-driven emission, exactly-once
resume).

Semantics: per key, ordered by event time, a match is ``len(pattern)``
CONSECUTIVE rows where step j's predicate holds on row start+j (LEAD
semantics — matches may overlap, every starting position reports
independently), optionally with ``last.ts - first.ts <= within``.
Output: keys..., ``match_start_us``, ``match_end_us``.

Watermark correctness argument (why emission is exactly-once AND equal to
the batch kernel over the whole stream):

- late rows (ts < watermark at ingest) are dead-lettered, so every future
  row has ts >= watermark. A row with ts < watermark is therefore SEALED:
  nothing can ever sort between it and any other sealed row again.
- a match is emitted iff ALL its rows are sealed — its row adjacencies are
  final, so the match is exactly what the batch kernel would find.
- retained state per key = all unsealed rows + the LAST ``len(pattern)-1``
  sealed rows (the only sealed rows a future match can reach: a future
  match must include a future row, which sorts after every sealed row, so
  its start is at most ``len(pattern)-1`` positions back). An emitted
  match's ``len(pattern)`` rows can never all fit inside that
  ``len(pattern)-1``-row tail, so its start row is dropped — the same
  match can never re-emit. Bounded state for unbounded streams.

``non_overlapping`` (SKIP PAST LAST ROW) is supported — round-5 upgrade of
the round-4 batch-only limitation. Why the sealed-prefix argument extends
to greedy acceptance: per key, rows are ts-sorted and ``sealed`` is a
PREFIX of the run, so candidate ENDS are ordered with candidate starts —
every candidate whose end row is sealed has only sealed-end candidates
before it in the greedy left-to-right scan. Sealed-end candidates are
therefore decidable exactly in scan order, now, and for ever (no unsealed
candidate can precede them). The only cross-epoch state the scan needs is
the per-key acceptance cursor — "the last accepted match ended at this
row" — carried as a ``__cep_blk`` flag ON the retained sealed tail rows
themselves (the streaming-shift context-row trick), so it snapshots,
restores and hash-partitions with the buffer for free. A future candidate
whose start falls at-or-before a blocked row is rejected exactly as the
batch scan would; accepted ends behind the retained tail cannot overlap
any future start (future starts live inside the tail). Kill/resume safety
follows from the flag living in the snapshot parquet.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from saber_ray.streaming_keyed import KeyedStreamEngine
from saber_ray.streaming_session import _key_codes, _same_as_prev


class _PatternState:
    """One hash partition of CEP state: the retained row buffer (Arrow
    table with ``__t`` event time), processed per epoch with the SAME
    vectorized mask-shift kernel as the batch operator — step predicates
    evaluated once over the whole buffer, zero per-row/per-key Python."""

    def __init__(self, keys: list, pattern: list, within: Optional[int],
                 tiebreak: list, non_overlapping: bool = False):
        self.keys = list(keys)
        self.pattern = list(pattern)
        self.m = len(pattern)
        self.within = within
        self.tiebreak = list(tiebreak)
        self.non_overlapping = non_overlapping
        self.open: Optional[pa.Table] = None
        self.pend: list[pa.Table] = []
        self._seen: set = set()

    def ingest(self, epoch: int, src: str, t: pa.Table) -> None:
        """Same exactly-once contract as SessionStateActor.ingest: a
        retried task re-pushes with the same (epoch, src) and is dropped."""
        if (epoch, src) in self._seen or t.num_rows == 0:
            return
        self._seen.add((epoch, src))
        self.pend.append(t)

    def _out_schema(self, t: Optional[pa.Table]) -> pa.Schema:
        fields = []
        for k in self.keys:
            typ = t.schema.field(k).type if t is not None else pa.int64()
            fields.append((k, typ))
        fields += [("match_start_us", pa.int64()),
                   ("match_end_us", pa.int64())]
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
        m = self.m
        order = pc.sort_indices(t, sort_keys=[
            (k, "ascending") for k in self.keys + ["__t"] + self.tiebreak])
        t = t.take(order).combine_chunks()
        n = t.num_rows
        ts = t["__t"].to_numpy(zero_copy_only=False)
        same = _same_as_prev(_key_codes(t, self.keys), n)
        rid = np.cumsum(~same)               # key run id per row
        sealed = np.ones(n, dtype=bool) if watermark is None \
            else ts < watermark
        # per-key acceptance cursor carried on the retained rows (module
        # docstring): last blocked (= consumed by an accepted match) index
        blk_last: dict[int, int] = {}
        if self.non_overlapping and "__cep_blk" in t.column_names:
            bcol = pc.fill_null(t["__cep_blk"].combine_chunks(), False)
            for i in np.flatnonzero(bcol.to_numpy(zero_copy_only=False)):
                blk_last[int(rid[i])] = int(i)    # ascending → max wins
        starts = np.zeros(0, dtype=np.int64)
        if n >= m:
            ok = np.ones(n - m + 1, dtype=bool)
            for j, pred in enumerate(self.pattern):
                mask = pred(t)
                if isinstance(mask, pa.ChunkedArray):
                    mask = mask.combine_chunks()
                mj = np.asarray(pc.fill_null(mask, False).to_numpy(
                    zero_copy_only=False), dtype=bool)
                ok &= mj[j:n - m + 1 + j]
            ok &= rid[:n - m + 1] == rid[m - 1:]   # one key run
            if self.within is not None:
                ok &= (ts[m - 1:] - ts[:n - m + 1]) <= self.within
            ok &= sealed[m - 1:]             # ALL rows sealed (ts sorted)
            starts = np.flatnonzero(ok)
        if self.non_overlapping and len(starts):
            # greedy from the left per key run, seeded by the carried
            # cursor — sealed-end candidates are a PREFIX of each run's
            # candidate order, so this decision is final (module docstring)
            keep_s, last_end, last_rid = [], -1, -1
            for s in starts:
                r = int(rid[s])
                if r != last_rid:
                    last_rid, last_end = r, blk_last.get(r, -1)
                if s > last_end:
                    keep_s.append(int(s))
                    last_end = s + m - 1
            starts = np.asarray(keep_s, dtype=np.int64)
        # retention: per key run, unsealed rows + last m-1 sealed rows
        # (sealed rows are a ts-sorted prefix of each run)
        if watermark is None:
            self.open = None                 # end-of-stream finalize
        else:
            idx = np.arange(n, dtype=np.int64)
            chg = ~same                           # run starts (chg[0]=True)
            run_start = np.maximum.accumulate(np.where(chg, idx, 0))
            run_heads = np.flatnonzero(chg)
            run_lens = np.diff(np.concatenate((run_heads, [n])))
            per_run_sealed = np.add.reduceat(sealed.astype(np.int64),
                                             run_heads)
            totals = np.repeat(per_run_sealed, run_lens)
            pos = idx - run_start                 # 0-based within run
            keep = (~sealed) | (pos >= totals - (m - 1))
            if self.non_overlapping:
                # refresh the acceptance-cursor flags BEFORE trimming:
                # blocked = at-or-before the last accepted end of the run
                nrun = int(rid[-1]) if n else 0
                new_last = np.full(nrun + 1, -1, dtype=np.int64)
                for r, i in blk_last.items():
                    new_last[r] = i
                if len(starts):
                    ends_acc = starts + m - 1
                    np.maximum.at(new_last, rid[ends_acc], ends_acc)
                blk_arr = pa.array(idx <= new_last[rid])
                if "__cep_blk" in t.column_names:
                    t = t.set_column(t.column_names.index("__cep_blk"),
                                     "__cep_blk", blk_arr)
                else:
                    t = t.append_column("__cep_blk", blk_arr)
            self.open = t.filter(pa.array(keep))
        if not len(starts):
            return self._out_schema(t).empty_table()
        ends_i = starts + m - 1
        cols = [t[k].combine_chunks().take(pa.array(starts))
                for k in self.keys]
        cols += [pa.array(ts[starts], type=pa.int64()),
                 pa.array(ts[ends_i], type=pa.int64())]
        return pa.Table.from_arrays(cols, schema=self._out_schema(t))

    def snapshot(self, path: str) -> None:
        if self.open is not None and self.open.num_rows:
            pq.write_table(self.open, path)
        elif os.path.exists(path):
            os.remove(path)

    def restore(self, path: str) -> None:
        self.open = pq.read_table(path) if os.path.exists(path) else None


PatternStateActor = ray.remote(_PatternState)


class StreamingMatchPattern(KeyedStreamEngine):
    """Micro-batch streaming CEP over an ordered file stream.

    Output matches the batch kernel run on the concatenated stream with
    ``order_by=ts`` (the DuckDB LEAD() oracle twin in tests/test_cep.py):
    keys..., match_start_us, match_end_us. Epoch protocol lives in
    ``streaming_keyed.KeyedStreamEngine``.
    """

    _snap_prefix = "cstate-"
    _out_prefix = "match-"

    def __init__(self, out_dir: str, *,
                 pattern: Sequence[Callable[[pa.Table], object]],
                 keys: Sequence[str] = ("conv_id",), ts_col: str = "ts",
                 within: Optional[int] = None,
                 tiebreak: Sequence[str] = (),
                 non_overlapping: bool = False,
                 num_partitions: int = 4, allowed_lateness: int = 0,
                 columns: Optional[Sequence[str]] = None,
                 monitor=None):
        if not pattern:
            raise ValueError("pattern must have at least one step")
        if any(isinstance(s, tuple) for s in pattern):
            raise ValueError(
                "streaming CEP does not support quantified steps "
                "(pred, '+'): a greedy run open at the watermark has "
                "unbounded look-ahead, so sealed emission is impossible "
                "without a length bound — use the batch match_pattern")
        self.monitor = monitor
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.pattern = list(pattern)
        self.keys = list(keys)
        self.ts_col = ts_col
        self.within = within
        self.tiebreak = list(tiebreak)
        self.non_overlapping = non_overlapping
        self.n = num_partitions
        self.lateness = allowed_lateness
        self.columns = list(columns) if columns else None

    def _ingest_columns(self):
        return list(dict.fromkeys(
            (self.columns or []) + self.tiebreak)) or None

    def _spawn_actors(self):
        return [PatternStateActor.remote(
            self.keys, self.pattern, self.within, self.tiebreak,
            self.non_overlapping)
            for _ in range(self.n)]
