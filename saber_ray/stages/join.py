"""Joins: broadcast hash, partitioned hash, and windowed stream-stream (theta).

Parity target: Saber's ThetaJoin — two-stream windowed join, arbitrary
predicate, timestamp-ordered dual scan with window eviction (reference:
cql/operators/cpu/ThetaJoin.java:15-321, scan loop :96-272, eviction
:171-196,239-267; two-stream dispatch dispatchers/JoinTaskDispatcher.java:282-403).
The reference keeps each stream's open window in its circular buffer; a pair
is emitted when both tuples fall inside each other's current window and the
predicate holds.

Ray-native designs (NOT a nested-loop port):

- **broadcast_join** — small side materialized once to the object store via
  ``ray.put`` and joined per batch with pyarrow's vectorized hash join inside
  ``map_batches`` (an actor pool: the dereferenced table is cached per actor
  in ``__init__``). No shuffle. This is the YSB dim-table pattern.
- **hash_join** — both sides large: Ray Data's hash-partitioned
  ``Dataset.join`` (hash shuffle on the key on both sides).
- **windowed_join** — the streaming equi+time-band join: tag sides, align
  schemas, union, ONE range shuffle ``sort(key)`` (equal keys co-locate —
  same partition invariant as window_agg's sortmerge), then a PER-BLOCK
  fully vectorized multi-key merge join in event time: keys are factorized
  to codes, the right side is lexsorted by (code, ts), and every left row's
  candidate band ``[tL - before, tL + after]`` within its key segment is
  found with TWO ``np.searchsorted`` calls over a composite
  ``code * span + ts`` int64 axis — no Python loop over keys or rows,
  O((nL+nR) log nR) per block. Rows with NULL join keys are dropped (SQL
  equi-join semantics). Window eviction is implicit in the band bound
  (watermark-driven at scale: the band IS the retained state). An optional
  residual theta ``predicate`` filters the candidate pairs (equi+band prune
  first, arbitrary theta after — same output as the reference's pure theta
  scan restricted to the band).

Skew note: a hot join key concentrates its pairs in one group. The band join
is near-linear per key, which absorbs most skew; for pathological keys,
band-partition by ts with ``before+after`` overlap (documented assumption;
see SURVEY.md §7.4 join state bounded-ness).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


# ---------------------------------------------------------------------------
# broadcast hash join (small side in object store)
# ---------------------------------------------------------------------------

class _BroadcastJoiner:
    def __init__(self, table_ref, on, right_on, how):
        small = ray.get(table_ref)
        if isinstance(small, pd.DataFrame):
            small = pa.Table.from_pandas(small, preserve_index=False)
        self.small = small.combine_chunks()
        self.on = list(on)
        self.right_on = list(right_on)
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 and self.how == "inner":
            return batch
        return batch.join(self.small, keys=self.on, right_keys=self.right_on,
                          join_type=self.how)


def broadcast_join(ds, small, on: Sequence[str] | str, *,
                   right_on: Optional[Sequence[str] | str] = None,
                   how: str = "inner", batch_size: Optional[int] = None,
                   mode: str = "task",
                   concurrency: int | tuple[int, int] = (1, 8),
                   num_cpus: float = 0.5):
    """Join ``ds`` against a small in-memory table broadcast via ray.put.

    ``small``: pyarrow.Table or pandas.DataFrame (deduplicate keys yourself if
    you need 1:1). The table ships to the object store ONCE (``ray.put``) and
    is never re-shipped per batch.

    ``mode="task"`` (default): stateless map_batches tasks dereference the
    ref per call — a zero-copy local object-store read, so the stage scales
    with the whole cluster and has no actor spin-up latency. ``mode="actor"``:
    an actor pool caching the dereferenced table in ``__init__`` — use when
    the join also needs per-actor derived state (e.g. a built index) whose
    construction cost should be paid once.
    """
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    ref = ray.put(small.combine_chunks())
    if mode == "task":
        def join_batch(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 and how == "inner":
                return batch
            return batch.join(ray.get(ref), keys=on, right_keys=right_on,
                              join_type=how)
        kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
        if batch_size is not None:
            kwargs["batch_size"] = batch_size
        return ds.map_batches(join_batch, **kwargs)
    # fractional num_cpus + bounded pool: an actor pool that reserves
    # every CPU starves the upstream read stage and the pipeline deadlocks
    # (the guide's "pool fits the node alongside other stages" rule).
    kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True,
              "concurrency": concurrency, "num_cpus": num_cpus,
              "fn_constructor_kwargs": {"table_ref": ref, "on": on,
                                        "right_on": right_on, "how": how}}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(_BroadcastJoiner, **kwargs)


# ---------------------------------------------------------------------------
# partitioned hash join (both sides large)
# ---------------------------------------------------------------------------

def hash_join(left, right, on: Sequence[str] | str, *,
              right_on: Optional[Sequence[str] | str] = None,
              how: str = "inner", num_partitions: int = 32,
              left_suffix: Optional[str] = None,
              right_suffix: Optional[str] = "_r"):
    """Hash-partitioned equi-join of two Datasets (shuffles both sides)."""
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = on if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on))
    return left.join(right, join_type=how, num_partitions=num_partitions,
                     on=on, right_on=right_on,
                     left_suffix=left_suffix, right_suffix=right_suffix)


# ---------------------------------------------------------------------------
# windowed stream-stream join (equi key + event-time band + optional theta)
# ---------------------------------------------------------------------------

def windowed_join(
    left, right, *,
    on: Sequence[str] | str,
    before: int, after: int,
    left_ts: str = "ts", right_ts: str = "ts",
    left_cols: Optional[Sequence[str]] = None,
    right_cols: Optional[Sequence[str]] = None,
    predicate: Optional[Callable[[pd.DataFrame], np.ndarray]] = None,
    suffixes: tuple[str, str] = ("_l", "_r"),
):
    """Pairs (l, r) with equal key and ``tL - before <= tR <= tL + after``.

    ``before``/``after`` are microseconds of event time. Non-key column names
    colliding across sides get ``suffixes``; ts columns become ``ts_l``/``ts_r``
    (int64 epoch us). ``predicate`` (optional residual theta) sees the joined
    pandas frame and returns a boolean mask.
    """
    on = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in (left_cols if left_cols is not None
                         else left.schema().names) if c not in on and c != left_ts]
    rcols = [c for c in (right_cols if right_cols is not None
                         else right.schema().names) if c not in on and c != right_ts]
    sl, sr = suffixes
    lmap = {c: (c + sl if c in rcols else c) for c in lcols}
    rmap = {c: (c + sr if c in lcols else c) for c in rcols}

    # Determine each side's column types up-front so null columns are typed.
    rschema = right.schema()
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    lschema = left.schema()
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}

    def make_tagger(side: int, ts_col, own_cols, other_cols, other_types):
        def tag(b: pa.Table) -> pa.Table:
            cols: dict[str, pa.Array] = {k: b[k] for k in on}
            cols["__ts"] = b[ts_col].cast(pa.int64())
            cols["__side"] = pa.array(np.full(b.num_rows, side, dtype=np.int8))
            prefix_own = "L__" if side == 0 else "R__"
            prefix_other = "R__" if side == 0 else "L__"
            for c in own_cols:
                cols[prefix_own + c] = b[c]
            for c in other_cols:
                cols[prefix_other + c] = pa.nulls(b.num_rows, type=other_types[c])
            arrs, names = [], []
            for n in sorted(cols):
                v = cols[n]
                arrs.append(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
                names.append(n)
            return pa.Table.from_arrays(arrs, names=names)
        return tag

    tl = left.map_batches(make_tagger(0, left_ts, lcols, rcols, rtypes),
                          batch_format="pyarrow", zero_copy_batch=True)
    tr = right.map_batches(make_tagger(1, right_ts, rcols, lcols, ltypes),
                           batch_format="pyarrow", zero_copy_batch=True)
    both = tl.union(tr)

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = (on + ["ts_l", "ts_r"] + [lmap[c] for c in lcols]
                    + [rmap[c] for c in rcols])
        empty = pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        if len(g) == 0:
            return empty
        # factorize the (possibly composite) key to dense codes; SQL
        # equi-join semantics: NULL keys never match -> drop them
        if len(on) == 1:
            codes, _ = pd.factorize(g[on[0]], use_na_sentinel=True)
        else:
            codes, _ = pd.factorize(
                pd.MultiIndex.from_frame(g[on]), use_na_sentinel=True)
        keep = codes >= 0
        if not keep.all():
            g = g[keep].reset_index(drop=True)
            codes = codes[keep]
        side = g["__side"].to_numpy()
        ts = g["__ts"].to_numpy()
        lmask = side == 0
        lg, rg = g[lmask], g[~lmask]
        if len(lg) == 0 or len(rg) == 0:
            return empty
        cL, tLa = codes[lmask], ts[lmask]
        cR, tRa = codes[~lmask], ts[~lmask]
        # composite (code, ts) axis: ts normalized to [1, span-band-1] so the
        # band probes never cross a code boundary; int64-safe because codes
        # and the per-block ts span are both block-local.
        t0 = int(ts.min())
        span = int(ts.max()) - t0 + before + after + 3
        n_codes = int(codes.max()) + 1
        if (n_codes + 1) * span >= 2 ** 62:
            # composite axis would overflow int64 (pathological: huge key
            # count x huge time span in ONE block) — probe per key instead.
            parts = []
            rgb = {k: grp for k, grp in rg.groupby(on[0] if len(on) == 1
                                                   else list(on), sort=False)}
            for k, lgrp in lg.groupby(on[0] if len(on) == 1 else list(on),
                                      sort=False):
                rgrp = rgb.get(k)
                if rgrp is None:
                    continue
                sub = pd.concat([lgrp, rgrp.sort_values("__ts")])
                parts.append(per_block(sub.reset_index(drop=True)))
            return pd.concat(parts, ignore_index=True) if parts else empty
        r_order = np.lexsort((tRa, cR))
        cRs, tRs = cR[r_order], tRa[r_order]
        r_axis = cRs.astype(np.int64) * span + (tRs - t0) + 1
        q_lo = cL.astype(np.int64) * span + np.maximum(
            (tLa - before - t0) + 1, 0)
        q_hi = cL.astype(np.int64) * span + np.minimum(
            (tLa + after - t0) + 1, span - 1)
        lo = np.searchsorted(r_axis, q_lo, side="left")
        hi = np.searchsorted(r_axis, q_hi, side="right")
        counts = hi - lo
        li = np.repeat(np.arange(len(tLa)), counts)
        offs = np.arange(counts.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        ri = r_order[lo[li] + offs]
        res = {k: lg[k].to_numpy()[li] for k in on}
        res["ts_l"] = tLa[li]
        res["ts_r"] = tRa[ri]
        for c in lcols:
            res[lmap[c]] = lg["L__" + c].to_numpy()[li]
        for c in rcols:
            res[rmap[c]] = rg["R__" + c].to_numpy()[ri]
        df = pd.DataFrame(res)
        if predicate is not None and len(df):
            df = df[np.asarray(predicate(df), dtype=bool)]
        return df

    # range shuffle by key: equal keys co-locate in one block (Ray sort
    # boundary semantics — see stages/window_agg.py sortmerge notes)
    return both.sort(on).map_batches(per_block, batch_format="pandas")
