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
import pyarrow.compute as pc

import ray


def _group_codes(g: pa.Table, cols: Sequence[str]) -> np.ndarray:
    """Block-local int64 group code per row over the key tuple — pure
    Arrow/numpy (no pandas MultiIndex staging of key columns through
    Python objects). Single key: one ``dictionary_encode``. Multi-key:
    per-column dictionary codes combined pairwise with an exact
    ``code * base + (next + 1)`` mix (nulls carry code -1, so the +1
    shift keeps the mix injective — 0 <= next+1 <= max+1 < base — for
    any mixture of null and non-null tuples), re-densified by
    ``np.unique`` after every step so magnitudes stay < block rows (no
    overflow for any key count). A null key is one ordinary value per
    column (('B', null) never collides with ('A', 'p')). Codes are
    equality labels only — numbering is arbitrary."""
    def col_codes(c):
        a = g[c]
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        idx = a.dictionary_encode().indices
        if idx.null_count:          # pd.factorize parity: every null -> -1
            idx = pc.fill_null(idx, -1)
        return idx.to_numpy(zero_copy_only=False).astype(np.int64)
    codes = col_codes(cols[0])
    for c in cols[1:]:
        ci = col_codes(c)
        comb = codes * (int(ci.max(initial=0)) + 2) + (ci + 1)
        _, codes = np.unique(comb, return_inverse=True)
        codes = codes.astype(np.int64)
    return codes


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
        # no empty-batch shortcut: joining an empty batch is cheap and keeps
        # every output block schema-uniform (the raw left schema would lack
        # the right side's columns and break downstream column references)
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
            # join even when empty — keeps blocks schema-uniform (see
            # _BroadcastJoiner.__call__ note)
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


def _empty_side_join(left, right, on, r_on, how, right_cols, right_suffix):
    """Degenerate merge_join when a side executed to ZERO rows and Ray
    lost its schema (Dataset.schema() is None — 0-row blocks are dropped
    on this Ray version, so the side's column types are unrecoverable).
    The SQL answer is still well-defined; types are best-effort:

    - right empty: inner/semi/right_outer → empty; anti → all of left
      (nothing can match); left/full outer → left rows with null right
      columns, typed from the LEFT schema where inferable (join keys take
      the left key's type; other ``right_cols`` sharing a left column's
      name take that type; the rest are null-typed).
    - left empty: inner/semi/anti/left_outer → empty; right/full outer →
      the right rows with the keys as data columns (the outer-join
      convention below) — the left columns are unknowable and omitted,
      and right columns keep their bare names (no suffix collisions with
      an unknown-empty left).
    Empty results return the empty input itself: ANY empty Dataset on
    this Ray version reports schema() = None, so no typed-empty contract
    is lost vs the regular path."""
    lschema, rschema = left.schema(), right.schema()
    if lschema is None:
        if how not in ("right_outer", "full_outer") or rschema is None:
            # inner-family: empty; both sides empty: empty either way
            return left
        rn_all = list(right_cols) if right_cols is not None \
            else list(rschema.names)
        rnames = list(r_on) + [c for c in rn_all if c not in r_on]
        return right.map_batches(
            lambda t: t.select(rnames),
            batch_format="pyarrow", zero_copy_batch=True)
    # right side is the empty one
    if how in ("inner", "semi", "right_outer"):
        return left.limit(0)
    if how == "anti":
        return left
    lnames = list(lschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rnames = [c for c in (right_cols or []) if c not in r_on]
    if how == "full_outer":
        rnames = list(r_on) + rnames
    rmap = {c: (c + right_suffix if c in lnames else c) for c in rnames}

    def _rtype(c):
        if c in r_on:
            return ltypes[on[r_on.index(c)]]
        return ltypes.get(c, pa.null())

    def add_null_right(t: pa.Table) -> pa.Table:
        arrs = [t[c] for c in lnames] + \
            [pa.nulls(t.num_rows, type=_rtype(c)) for c in rnames]
        return pa.Table.from_arrays(
            [(a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
             for a in arrs], names=lnames + [rmap[c] for c in rnames])

    return left.map_batches(add_null_right, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# windowed stream-stream join (equi key + event-time band + optional theta)
# ---------------------------------------------------------------------------

def merge_join(
    left, right, *,
    on: Sequence[str] | str,
    right_on: Optional[Sequence[str] | str] = None,
    how: str = "inner",
    right_cols: Optional[Sequence[str]] = None,
    right_suffix: str = "_r",
    prefilter: bool = False,
):
    """Engine-owned distributed equi join: ONE sort co-location exchange +
    per-block vectorized pairing. ``how ∈ {inner, semi, anti, left_outer,
    right_outer, full_outer}`` — semi/anti/outer are join types the
    reference lacks entirely (SURVEY.md §2.7) and Ray's Dataset.join cannot
    express directly (or crashes — below).

    Why not Ray's hash join: this Ray version's hash-shuffle join crashes
    when a partition receives zero left rows (see dedup.connected_components
    note); the sort exchange has no such failure mode, and equal keys
    co-locate per Ray's sort boundary semantics. NULL keys never match (SQL
    ON-clause semantics): they are dropped from sides whose rows only appear
    when matched (both for inner/semi; left for right_outer; right for
    anti/left_outer) and kept — unmatched — on sides an outer/anti emits.

    NULL-key note for ``anti``: this is LEFT ANTI JOIN semantics (DuckDB
    ``ANTI JOIN`` / ``NOT EXISTS``) — a left row with a NULL key can never
    match, so it is KEPT. SQL ``NOT IN`` differs: a NULL key compares
    UNKNOWN and drops the row whenever the subquery is non-empty. Gates
    using a NOT IN oracle rely on non-null keys in the gate data; the
    NULL-key behavior is pinned by pytest (test_join.py).

    Per block the pairing reuses the band kernel with a zero-width band
    (``_band_pairs`` with all timestamps 0): two searchsorted calls answer
    every left row with its right-match range — counts>0 is the semi mask,
    counts==0 the anti mask, the expanded (li, ri) the inner pairs, and the
    never-matched flags on either side the outer emissions.
    """
    if how not in ("inner", "semi", "anti", "left_outer", "right_outer",
                   "full_outer"):
        raise ValueError(f"unsupported how={how!r}")
    on = [on] if isinstance(on, str) else list(on)
    r_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    if prefilter and how not in ("inner", "semi"):
        # validate BEFORE any data-dependent short-circuit so the misuse
        # raises deterministically, not only when the sides are non-empty
        raise ValueError(
            "prefilter=True is only sound for how='inner'/'semi'")
    # Ray 2.49 drops 0-row blocks: a Dataset that executed to zero rows
    # reports schema() = None, which would crash the taggers below. An
    # empty side has a DEGENERATE SQL answer anyway — short-circuit it
    # (before the prefilter, whose bloom build would also choke).
    if left.schema() is None or right.schema() is None:
        return _empty_side_join(left, right, on, r_on, how,
                                right_cols, right_suffix)
    if prefilter:
        # bloom pre-filter of the left side (build_join_bloom below): only
        # sound when left rows need a match to be emitted — for inner/semi
        # dropped rows could never appear (NULL keys drop either way)
        right = right.materialize()
        bloom_ref = ray.put(build_join_bloom(right, r_on))
        left = bloom_prefilter(left, bloom_ref, on)
    rnames = [c for c in (right_cols if right_cols is not None
                          else right.schema().names) if c not in r_on]
    if how in ("right_outer", "full_outer"):
        # the right KEY must survive on right-only rows (the left key column
        # is NULL there) — ship it as a data column, SQL RIGHT/FULL style
        rnames = list(r_on) + rnames
    lschema = left.schema()
    rschema = right.schema()
    rtypes = dict(zip(rschema.names, rschema.types))
    ltypes = dict(zip(lschema.names, lschema.types))
    lnames = list(lschema.names)
    rmap = {c: (c + right_suffix if c in lnames else c) for c in rnames}
    pairing = how in ("inner", "left_outer", "right_outer", "full_outer")

    from saber_ray.core.aggregates import null_fill_scalar

    def _key_cols(b, keys):
        """(filled key columns dict, all-valid int8 array) — null keys ride
        filled + flagged so Ray's sort never compares None; flagged rows are
        assigned the no-match code in per_block."""
        valid = None
        filled = {}
        for i, k in enumerate(keys):
            col = b[k]
            v = pc.is_valid(col)
            valid = v if valid is None else pc.and_(valid, v)
            if col.null_count:
                col = pc.fill_null(col, null_fill_scalar(col.type))
            filled[f"__k_{i}"] = col
        va = (pc.cast(valid, pa.int8()) if valid is not None
              else pa.array(np.ones(b.num_rows, dtype=np.int8)))
        return filled, va

    def tag_left(b: pa.Table) -> pa.Table:
        if how in ("inner", "semi", "right_outer"):
            mask = None
            for k in on:
                v = pc.is_valid(b[k])
                mask = v if mask is None else pc.and_(mask, v)
            if mask is not None and not pc.all(mask).as_py():
                b = b.filter(mask)
        cols, kv = _key_cols(b, on)
        cols["__kv"] = kv
        cols["__side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        for c in lnames:
            cols["L__" + c] = b[c]
        for c in rnames:
            cols["R__" + c] = pa.nulls(b.num_rows, type=rtypes[c])
        return pa.Table.from_arrays(
            [(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
             for v in (cols[n] for n in sorted(cols))], names=sorted(cols))

    def tag_right(b: pa.Table) -> pa.Table:
        if how not in ("right_outer", "full_outer"):
            # null-key right rows can never match and are never emitted
            mask = None
            for k in r_on:
                v = pc.is_valid(b[k])
                mask = v if mask is None else pc.and_(mask, v)
            if mask is not None and not pc.all(mask).as_py():
                b = b.filter(mask)
        cols, kv = _key_cols(b, r_on)
        cols["__kv"] = kv
        cols["__side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        for c in lnames:
            cols["L__" + c] = pa.nulls(b.num_rows, type=ltypes[c])
        for c in rnames:
            cols["R__" + c] = b[c]
        return pa.Table.from_arrays(
            [(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
             for v in (cols[n] for n in sorted(cols))], names=sorted(cols))

    both = left.map_batches(tag_left, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .union(right.map_batches(tag_right, batch_format="pyarrow",
                                 zero_copy_batch=True))

    key_cols = [f"__k_{i}" for i in range(len(on))]
    if pairing:
        out_schema = pa.schema(
            [(c, ltypes[c]) for c in lnames]
            + [(rmap[c], rtypes[c]) for c in rnames])
    else:
        out_schema = pa.schema([(c, ltypes[c]) for c in lnames])

    def per_block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        side = g["__side"].to_numpy(zero_copy_only=False)
        codes = _group_codes(g, key_cols)
        # rows whose original key was NULL can never match (SQL semantics)
        kv = g["__kv"].to_numpy(zero_copy_only=False)
        codes = np.where(kv == 0, -1, codes)
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side != 0)
        cL, cR = codes[l_idx], codes[r_idx]
        if not len(l_idx) and how not in ("right_outer", "full_outer"):
            return out_schema.empty_table()
        matched = np.zeros(len(l_idx), dtype=bool)
        matched_r = np.zeros(len(r_idx), dtype=bool)
        # null-key rows never match — exclude them from the probe so a
        # fill-sentinel collision can't cost O(nulls x sentinel-matches)
        probe_l = np.flatnonzero(cL >= 0)
        probe_r = np.flatnonzero(cR >= 0)
        li = ri = np.zeros(0, dtype=np.int64)
        if len(probe_l) and len(probe_r):
            pli, pri = _band_pairs(cL[probe_l],
                                   np.zeros(len(probe_l), dtype=np.int64),
                                   cR[probe_r],
                                   np.zeros(len(probe_r), dtype=np.int64),
                                   0, 0)
            li, ri = probe_l[pli], probe_r[pri]
            matched[li] = True
            matched_r[ri] = True

        def build(gl: pa.Table, gr: Optional[pa.Table]) -> pa.Table:
            cols = [gl["L__" + c] for c in lnames]
            if pairing:
                src = gr if gr is not None else gl
                cols += [src["R__" + c] for c in rnames]
            return pa.Table.from_arrays(
                [(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
                 for v in cols], schema=out_schema)

        if how == "semi":
            return build(g.take(pa.array(l_idx[matched])), None)
        if how == "anti":
            return build(g.take(pa.array(l_idx[~matched])), None)
        parts = []
        if len(li):
            parts.append(build(g.take(pa.array(l_idx[li])),
                               g.take(pa.array(r_idx[ri]))))
        if how in ("left_outer", "full_outer") and (~matched).any():
            parts.append(build(g.take(pa.array(l_idx[~matched])), None))
        if how in ("right_outer", "full_outer") and (~matched_r).any():
            # right-side rows carry null L__ columns from the tagger, so the
            # same table serves both column groups
            ur = g.take(pa.array(r_idx[~matched_r]))
            parts.append(build(ur, ur))
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts)

    return both.sort(["__kv"] + key_cols).map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True)


def asof_join(
    left, right, *,
    on: Sequence[str] | str,
    left_ts: str = "ts", right_ts: str = "ts",
    tie_break: Optional[str] = None,
    tolerance: Optional[int] = None,
    left_cols: Optional[Sequence[str]] = None,
    right_cols: Optional[Sequence[str]] = None,
    suffixes: tuple[str, str] = ("_l", "_r"),
):
    """As-of join: for every left row, the LATEST right row of the same key
    with ``tR <= tL`` (within ``tolerance`` microseconds when given). Inner
    semantics: left rows with no match are dropped (mirrors DuckDB
    ``ASOF JOIN``, the conformance oracle).

    Not in the reference (its only join is the windowed theta scan,
    ThetaJoin.java:15-321) — a north-rule/custom-operator extension built on
    the same machinery as ``windowed_join``: tag sides, union, ONE range
    shuffle ``sort(on)`` (equal keys co-locate per Ray's sort boundary
    semantics), then a per-block vectorized kernel — right side lexsorted by
    (key_code, ts), every left row answered by one ``np.searchsorted`` over
    the composite axis. NULL keys drop at the tagger.

    Ties: when several right rows share the matched (key, ts), pass
    ``tie_break`` (a right-side column name, e.g. an event id) to pick the
    row with the LARGEST tie value deterministically; without it the pick is
    block-order dependent (as is the SQL oracle's own arbitrary choice —
    the gate data has no (key, ts) duplicates, verified).
    """
    on = [on] if isinstance(on, str) else list(on)
    if left.schema() is None or right.schema() is None:
        # a side executed to zero rows (Ray drops 0-row blocks and loses
        # the schema) — inner semantics: the join is empty
        return left.limit(0)
    lcols = [c for c in (left_cols if left_cols is not None
                         else left.schema().names) if c not in on and c != left_ts]
    rcols = [c for c in (right_cols if right_cols is not None
                         else right.schema().names) if c not in on and c != right_ts]
    sl, sr = suffixes
    lmap = {c: (c + sl if c in rcols else c) for c in lcols}
    rmap = {c: (c + sr if c in lcols else c) for c in rcols}
    rschema, lschema = right.schema(), left.schema()
    rtypes = dict(zip(rschema.names, rschema.types))
    ltypes = dict(zip(lschema.names, lschema.types))

    def tagger(side, ts_col, own_cols, other_cols, other_types):
        def tag(b: pa.Table) -> pa.Table:
            mask = None
            for k in on:
                v = pc.is_valid(b[k])
                mask = v if mask is None else pc.and_(mask, v)
            if mask is not None and not pc.all(mask).as_py():
                b = b.filter(mask)
            cols: dict[str, object] = {k: b[k] for k in on}
            cols["__ts"] = b[ts_col].cast(pa.int64())
            cols["__side"] = pa.array(np.full(b.num_rows, side, dtype=np.int8))
            po, px = ("L__", "R__") if side == 0 else ("R__", "L__")
            for c in own_cols:
                cols[po + c] = b[c]
            for c in other_cols:
                cols[px + c] = pa.nulls(b.num_rows, type=other_types[c])
            return pa.Table.from_arrays(
                [(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
                 for v in (cols[n] for n in sorted(cols))],
                names=sorted(cols))
        return tag

    both = left.map_batches(tagger(0, left_ts, lcols, rcols, rtypes),
                            batch_format="pyarrow", zero_copy_batch=True) \
        .union(right.map_batches(tagger(1, right_ts, rcols, lcols, ltypes),
                                 batch_format="pyarrow", zero_copy_batch=True))

    out_schema = pa.schema(
        [(k, ltypes[k]) for k in on]
        + [("ts_l", pa.int64()), ("ts_r", pa.int64())]
        + [(lmap[c], ltypes[c]) for c in lcols]
        + [(rmap[c], rtypes[c]) for c in rcols])

    def per_block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        side = g["__side"].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        codes = _group_codes(g, on)
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side != 0)
        if not len(l_idx) or not len(r_idx):
            return out_schema.empty_table()
        cL, tL = codes[l_idx], ts[l_idx]
        cR, tR = codes[r_idx], ts[r_idx]
        if tie_break is not None:
            # int-safe extraction: the R__ column is nullable (left rows
            # hold nulls), and float64 staging would collide ids above 2^53
            # and rank NULL ties largest; fill with int64 min so null tie
            # values lose to every real id
            tb_col = g["R__" + tie_break].combine_chunks().cast(pa.int64())
            tb = pc.fill_null(tb_col, np.iinfo(np.int64).min) \
                .to_numpy(zero_copy_only=False).astype(np.int64)[r_idx]
            r_order = np.lexsort((tb, tR, cR))
        else:
            r_order = np.lexsort((tR, cR))
        cRs, tRs = cR[r_order], tR[r_order]
        t0 = int(min(tL.min(), tRs.min()))
        span = int(max(tL.max(), tRs.max())) - t0 + 2
        # loud, not silent, on the pathological huge-keys x huge-span block
        assert (int(codes.max()) + 1) * span < 2 ** 62, \
            "asof composite axis would overflow int64"
        r_axis = cRs * span + (tRs - t0)
        q = cL * span + (tL - t0)
        pos = np.searchsorted(r_axis, q, side="right") - 1
        # match is valid only within the left row's own key segment
        ok = pos >= 0
        ok &= np.where(ok, cRs[np.maximum(pos, 0)] == cL, False)
        if tolerance is not None:
            ok &= np.where(ok, tL - tRs[np.maximum(pos, 0)] <= tolerance, False)
        li = np.flatnonzero(ok)
        ri = r_order[pos[li]]
        if not len(li):
            return out_schema.empty_table()
        gl = g.take(pa.array(l_idx[li]))
        gr = g.take(pa.array(r_idx[ri]))
        cols: dict[str, object] = {k: gl[k] for k in on}
        cols["ts_l"] = gl["__ts"]
        cols["ts_r"] = gr["__ts"]
        for c in lcols:
            cols[lmap[c]] = gl["L__" + c]
        for c in rcols:
            cols[rmap[c]] = gr["R__" + c]
        return pa.Table.from_arrays(
            [(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
             for v in cols.values()], schema=out_schema)

    return both.sort(on).map_batches(per_block, batch_format="pyarrow",
                                     zero_copy_batch=True)


def _band_pairs(cL, tL, cR, tR, before: int, after: int):
    """Vectorized band-join kernel: for every left row i, all right rows j
    with equal code and ``tL[i] - before <= tR[j] <= tL[i] + after``.

    Returns (li, ri) index arrays into the left/right inputs. The fast path
    builds a composite ``code * span + ts`` int64 axis (ts normalized so a
    band probe never crosses a code boundary) and answers every left row with
    TWO ``np.searchsorted`` calls — no Python loop over keys or rows,
    O((nL+nR) log nR). A per-code-run fallback covers the pathological case
    where the composite axis would overflow int64."""
    r_order = np.lexsort((tR, cR))
    cRs, tRs = cR[r_order], tR[r_order]
    t0 = int(min(tL.min(), tR.min()))
    span = int(max(tL.max(), tR.max())) - t0 + before + after + 3
    n_codes = int(max(cL.max(), cR.max())) + 1
    if (n_codes + 1) * span < 2 ** 62:
        r_axis = cRs * span + (tRs - t0) + 1
        q_lo = cL * span + np.maximum((tL - before - t0) + 1, 0)
        q_hi = cL * span + np.minimum((tL + after - t0) + 1, span - 1)
        lo = np.searchsorted(r_axis, q_lo, side="left")
        hi = np.searchsorted(r_axis, q_hi, side="right")
    else:
        starts = np.searchsorted(cRs, np.arange(n_codes + 1))
        lo = np.empty(len(cL), dtype=np.int64)
        hi = np.empty(len(cL), dtype=np.int64)
        l_order = np.argsort(cL, kind="stable")
        cLs = cL[l_order]
        run_start = np.flatnonzero(np.concatenate(
            ([True], cLs[1:] != cLs[:-1])))
        run_end = np.append(run_start[1:], len(cLs))
        for s, e in zip(run_start, run_end):
            c = int(cLs[s])
            a, b = starts[c], starts[c + 1]
            sub = tRs[a:b]
            idx = l_order[s:e]
            lo[idx] = a + np.searchsorted(sub, tL[idx] - before, side="left")
            hi[idx] = a + np.searchsorted(sub, tL[idx] + after, side="right")
    counts = hi - lo
    li = np.repeat(np.arange(len(tL)), counts)
    offs = np.arange(counts.sum()) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
    ri = r_order[lo[li] + offs]
    return li, ri


def windowed_join(
    left, right, *,
    on: Optional[Sequence[str] | str] = None,
    before: int, after: int,
    left_ts: str = "ts", right_ts: str = "ts",
    left_cols: Optional[Sequence[str]] = None,
    right_cols: Optional[Sequence[str]] = None,
    predicate: Optional[Callable[[pa.Table], np.ndarray]] = None,
    suffixes: tuple[str, str] = ("_l", "_r"),
    band_partition: bool = False,
):
    """Pairs (l, r) with ``tL - before <= tR <= tL + after`` and equal key
    (when ``on`` is given).

    ``band_partition=True`` (implied by ``on=None``) additionally splits
    every KEY by time cell: the exchange sorts on (key..., cell) instead of
    the key alone, so a pathologically hot key's pairs spread over its many
    time cells instead of landing in one reducer block — the explicit skew
    path SURVEY.md §7.4 documents (state per block = one band's worth).
    Costs ≤ 2x replication of the right side; output is identical (each
    pair still meets in exactly one (key, cell)) — asserted in pytest.

    ``before``/``after`` are microseconds of event time. Non-key column names
    colliding across sides get ``suffixes``; ts columns become ``ts_l``/``ts_r``
    (int64 epoch us). ``predicate`` (optional residual theta) sees the joined
    Arrow batch and returns a boolean mask.

    ``on=None`` is the reference's PURE theta join — an arbitrary predicate
    with no equi key (cql/operators/cpu/ThetaJoin.java:15-321 with a bare
    IntComparisonPredicate, e.g. TestThetaJoin.java:193-196), restricted to
    the time band (the reference's window). Ray-native: both streams are
    band-partitioned on ``ts`` into cells of ``before + after`` microseconds;
    left rows go to their own cell, right rows are replicated to every cell
    whose left owners could match (≤ 2 cells since the band spans at most one
    boundary), so each (l, r) pair meets in EXACTLY one cell — no pair dedup
    needed. The cell id then acts as the join code in the same vectorized
    merge kernel. This is the documented band-partitioning assumption of
    SURVEY.md §7.4 (join state bounded by the band).

    Per-block all Arrow: keys are dictionary-encoded to dense codes, pairs
    come from ``_band_pairs``, and outputs are gathered with ``Table.take`` —
    source dtypes survive exactly (no pandas null→float64 widening). NULL
    join keys are dropped at the tagger (SQL equi-join semantics: they can
    never match; it also keeps Ray's sort from comparing None).
    """
    keyless = on is None or on == []
    on = [] if keyless else ([on] if isinstance(on, str) else list(on))
    band = keyless or band_partition
    cell = max(int(before) + int(after), 1)
    if left.schema() is None or right.schema() is None:
        # a side executed to zero rows (Ray drops 0-row blocks and loses
        # the schema) — an inner theta join over it is empty
        return left.limit(0)
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
            if on:
                # NULL keys never join — drop before the shuffle (Ray's sort
                # cannot compare None; SQL equi-join semantics)
                mask = None
                for k in on:
                    v = pc.is_valid(b[k])
                    mask = v if mask is None else pc.and_(mask, v)
                if not pc.all(mask).as_py():
                    b = b.filter(mask)
            ts_arr = b[ts_col].cast(pa.int64())
            if isinstance(ts_arr, pa.ChunkedArray):
                ts_arr = ts_arr.combine_chunks()
            ts_np = ts_arr.to_numpy(zero_copy_only=False)
            cols: dict[str, pa.Array] = {k: b[k] for k in on}
            cols["__ts"] = ts_arr
            prefix_own = "L__" if side == 0 else "R__"
            prefix_other = "R__" if side == 0 else "L__"
            for c in own_cols:
                cols[prefix_own + c] = b[c]
            for c in other_cols:
                cols[prefix_other + c] = pa.nulls(b.num_rows, type=other_types[c])
            take = None
            if band:
                if side == 0:
                    cells = ts_np // cell
                else:
                    # right row r matches left rows with tL in
                    # [tR - after, tR + before] → replicate to those cells
                    lo_c = (ts_np - after) // cell
                    hi_c = (ts_np + before) // cell
                    extra = np.flatnonzero(hi_c > lo_c)
                    take = np.concatenate([np.arange(len(ts_np)), extra])
                    cells = np.concatenate([lo_c, hi_c[extra]])
            if take is not None:
                cols = {n: (v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                            else v).take(pa.array(take))
                        for n, v in cols.items()}
                nrows = len(take)
            else:
                nrows = b.num_rows
            cols["__side"] = pa.array(np.full(nrows, side, dtype=np.int8))
            if band:
                cols["__cell"] = pa.array(cells, type=pa.int64())
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

    out_schema = pa.schema(
        [(k, ltypes[k]) for k in on]
        + [("ts_l", pa.int64()), ("ts_r", pa.int64())]
        + [(lmap[c], ltypes[c]) for c in lcols]
        + [(rmap[c], rtypes[c]) for c in rcols])

    def per_block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        side = g["__side"].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        if keyless:
            codes = g["__cell"].to_numpy(zero_copy_only=False)
            codes = codes - codes.min()        # dense-ish, block-local
        else:
            codes = _group_codes(g, on + (["__cell"] if band else []))
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side != 0)
        if not len(l_idx) or not len(r_idx):
            return out_schema.empty_table()
        li, ri = _band_pairs(codes[l_idx], ts[l_idx], codes[r_idx], ts[r_idx],
                             before, after)
        if not len(li):
            return out_schema.empty_table()
        gl = g.take(pa.array(l_idx[li]))
        gr = g.take(pa.array(r_idx[ri]))
        cols: dict[str, object] = {k: gl[k] for k in on}
        cols["ts_l"] = gl["__ts"]
        cols["ts_r"] = gr["__ts"]
        for c in lcols:
            cols[lmap[c]] = gl["L__" + c]
        for c in rcols:
            cols[rmap[c]] = gr["R__" + c]
        out = pa.Table.from_arrays(
            [(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
             for v in cols.values()], schema=out_schema)
        if predicate is not None and out.num_rows:
            out = out.filter(pa.array(np.asarray(predicate(out), dtype=bool)))
        return out

    # range shuffle by key (or time cell): equal codes co-locate in one block
    # (Ray sort boundary semantics — see stages/window_agg.py sortmerge notes)
    sort_cols = ["__cell"] if keyless else (on + ["__cell"] if band else on)
    return both.sort(sort_cols).map_batches(per_block, batch_format="pyarrow",
                                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Bloom-filter join pre-filter (shuffle-volume lever for selective joins)
# ---------------------------------------------------------------------------

def _join_key_hashes(t: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """One 64-bit hash per row over the key tuple — FNV-style column
    mixing so multi-column keys hash identically on both sides.

    Buffer-level Arrow hashing (core/hashing.py): strings hash straight
    from the offsets+data buffers (no ``to_pylist`` object staging —
    VERDICT r3 #2/#5), nulls carry a validity mix so a filled null never
    collides with a genuine default value."""
    from saber_ray.core.hashing import hash_columns
    return hash_columns(t, keys)


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing — h split into two halves,
    probe i at (h1 + i*h2) mod m."""
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)          # odd → full cycle
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def build_join_bloom(small, on: Sequence[str] | str, *,
                     n_keys: Optional[int] = None, bits_per_key: int = 10,
                     k: int = 7) -> dict:
    """Bloom filter of ``small``'s join keys: per-block bitmaps OR-reduced
    (each block ships one m/8-byte bitmap, never its rows). ~1% false
    positives at the default 10 bits/key — false positives only let extra
    big-side rows through to the EXACT join, never change its result.
    Returns {"bitmap", "m_bits", "k"} ready to ``ray.put``."""
    on = [on] if isinstance(on, str) else list(on)
    if n_keys is None:
        # materialize once: count() would otherwise execute the upstream
        # pipeline a first time and the bitmap pass a second time
        small = small.materialize()
        n_keys = max(int(small.count()), 1)
    m_bits = 1 << max(16, int(np.ceil(np.log2(bits_per_key * n_keys))))
    nbytes = m_bits // 8

    def block_bitmap(t: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, dtype=np.uint8)
        if t.num_rows:
            pos = _bloom_positions(_join_key_hashes(t, on), m_bits, k)
            np.bitwise_or.at(bm, pos.ravel() >> 3,
                             np.uint8(1) << (pos.ravel() & 7).astype(np.uint8))
        return pa.table({"bitmap": pa.array([bm.tobytes()], pa.binary())})

    acc = np.zeros(nbytes, dtype=np.uint8)
    for b in small.map_batches(block_bitmap, batch_format="pyarrow",
                               zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for buf in b["bitmap"].to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint8)
    return {"bitmap": acc, "m_bits": m_bits, "k": k}


def bloom_prefilter(big, bloom_ref, on: Sequence[str] | str):
    """Drop big-side rows whose join key cannot exist on the small side
    (Bloom membership — zero false negatives, so
    ``merge_join(bloom_prefilter(big, ref, on), small, on=on)`` equals the
    unfiltered join for inner/semi, with shuffle volume cut to the match
    fraction (+ ~1% false positives). ``bloom_ref`` = ``ray.put`` of
    :func:`build_join_bloom`'s result (ships once, read per batch from
    shared memory). NULL keys hash like values but never survive the
    downstream exact join's NULL-never-matches rule for inner/semi."""
    on = [on] if isinstance(on, str) else list(on)

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        bl = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) \
            else bloom_ref
        bm, m_bits, k = bl["bitmap"], bl["m_bits"], bl["k"]
        pos = _bloom_positions(_join_key_hashes(t, on), m_bits, k)
        bits = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return t.filter(pa.array(bits.all(axis=1)))

    return big.map_batches(probe, batch_format="pyarrow",
                           zero_copy_batch=True)


# ---------------------------------------------------------------------------
# interval (point-in-range) join
# ---------------------------------------------------------------------------


def _stab_pairs(cP, tP, cI, sI):
    """Vectorized interval-stabbing candidate kernel: for every point row i,
    all interval rows j with equal code and ``sI[j] <= tP[i]`` (the end-bound
    check happens on the candidate pairs afterwards, outside this kernel).

    Same composite-axis trick as ``_band_pairs``: intervals are lexsorted by
    (code, clipped start); one ``np.searchsorted`` over ``code * span + s``
    answers every point with its candidate prefix inside its own code run.
    Returns (pi, ii) index arrays into the point/interval inputs.
    """
    i_order = np.lexsort((sI, cI))
    cIs, sIs = cI[i_order], sI[i_order]
    t0 = int(min(tP.min(), sI.min()))
    span = int(max(tP.max(), sI.max())) - t0 + 3
    n_codes = int(max(cP.max(), cI.max())) + 1
    if (n_codes + 1) * span < 2 ** 62:
        i_axis = cIs * span + (sIs - t0) + 1
        q_lo = cP * span                       # start of the code run
        q_hi = cP * span + (tP - t0) + 1       # inclusive: s <= t
        lo = np.searchsorted(i_axis, q_lo, side="left")
        hi = np.searchsorted(i_axis, q_hi, side="right")
    else:
        starts = np.searchsorted(cIs, np.arange(n_codes + 1))
        lo = np.empty(len(cP), dtype=np.int64)
        hi = np.empty(len(cP), dtype=np.int64)
        p_order = np.argsort(cP, kind="stable")
        cPs = cP[p_order]
        run_start = np.flatnonzero(np.concatenate(([True], cPs[1:] != cPs[:-1])))
        run_end = np.append(run_start[1:], len(cPs))
        for s, e in zip(run_start, run_end):
            c = int(cPs[s])
            a, b = starts[c], starts[c + 1]
            sub = sIs[a:b]
            idx = p_order[s:e]
            lo[idx] = a
            hi[idx] = a + np.searchsorted(sub, tP[idx], side="right")
    counts = hi - lo
    pi = np.repeat(np.arange(len(tP)), counts)
    offs = np.arange(counts.sum()) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
    ii = i_order[lo[pi] + offs]
    return pi, ii


def interval_join(
    points, intervals, *,
    on=None,
    point_ts: str = "ts",
    start_col: str = "start", end_col: str = "end",
    cell_us=None,
    point_cols=None, interval_cols=None,
    suffixes=("_p", "_i"),
):
    """Point-in-interval join: pairs (p, i) with
    ``i.start <= p.ts <= i.end`` (both bounds inclusive, SQL BETWEEN) and
    equal key when ``on`` is given.

    Variable-length intervals break the fixed band of ``windowed_join``
    (|tL - tR| <= const). Ray-native design: time is cut into cells of
    ``cell_us`` microseconds; each POINT goes to exactly its own cell,
    each INTERVAL is replicated to every cell it overlaps, so every
    matching pair meets in EXACTLY one cell (the point's) — no pair dedup.
    ONE ``sort(key..., cell)`` exchange co-locates a cell's points and
    interval copies, then a per-block vectorized kernel (lexsort +
    searchsorted over a composite code*span+start axis) finds, for each
    point, the intervals in its cell whose CLIPPED start (max(start,
    cell_lo)) <= ts, and filters ``end >= ts`` on the candidates. Within
    the point's own cell, clipped-start <= ts iff start <= ts, so the
    prefix is exact on the lower bound.

    Scale/partitioning assumptions (documented, SURVEY.md §7.4 style):
    - replication factor per interval = ceil(len / cell_us) + 1; pick
      ``cell_us`` near the typical interval length (the default samples
      up to 4096 intervals and uses the p90 length).
    - candidate fan-out per point = number of intervals overlapping its
      cell that started at-or-before it; deeply stacked intervals cost
      candidates — that density is also the output's own size driver.

    ``cell_us=None`` derives the cell from a bounded sample (never
    materializes the interval side). NULL keys / NULL bounds never join
    and are dropped at the tagger. Output columns: key cols, ``ts``
    (point event time, int64 us), ``start`` / ``end`` (int64 us), then
    point/interval payload columns with ``suffixes`` on collisions.
    """
    on = [] if on is None else ([on] if isinstance(on, str) else list(on))
    if points.schema() is None or intervals.schema() is None:
        return points.limit(0)

    if cell_us is None:
        parts = list(intervals.limit(4096).select_columns(
            [start_col, end_col]).iter_batches(batch_format="pyarrow",
                                               batch_size=4096))
        sample = pa.concat_tables(parts) if parts else None
        if sample is None or sample.num_rows == 0:
            return points.limit(0)
        # null-bound rows never join (dropped at the tagger) — exclude
        # them from the cell estimate instead of poisoning the quantile
        # with NaN (int64-with-nulls → float64 NaN via to_numpy)
        sample = sample.drop_null()
        if sample.num_rows == 0:
            cell_us = 3_600_000_000  # all-null sample: 1 h fallback cell
        else:
            s = sample[start_col].cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            e = sample[end_col].cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            ln = np.maximum(e - s, 0)
            cell_us = max(int(np.quantile(ln, 0.9)) + 1, 1)
    cell = int(cell_us)

    pschema, ischema = points.schema(), intervals.schema()
    ptypes = {n: t for n, t in zip(pschema.names, pschema.types)}
    itypes = {n: t for n, t in zip(ischema.names, ischema.types)}
    pcols = [c for c in (point_cols if point_cols is not None else pschema.names)
             if c not in on and c != point_ts]
    icols = [c for c in (interval_cols if interval_cols is not None
                         else ischema.names)
             if c not in on and c not in (start_col, end_col)]
    sp, si = suffixes
    pmap = {c: (c + sp if c in icols else c) for c in pcols}
    imap = {c: (c + si if c in pcols else c) for c in icols}

    def _drop_null(b: pa.Table, need):
        mask = None
        for k in need:
            v = pc.is_valid(b[k])
            mask = v if mask is None else pc.and_(mask, v)
        if mask is not None and not pc.all(mask).as_py():
            b = b.filter(mask)
        return b

    def tag_points(b: pa.Table) -> pa.Table:
        b = _drop_null(b, on + [point_ts])
        ts = b[point_ts].cast(pa.int64())
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        ts_np = ts.to_numpy(zero_copy_only=False)
        cols = {k: b[k] for k in on}
        cols["__ts"] = ts
        cols["__s"] = pa.nulls(b.num_rows, type=pa.int64())
        cols["__e"] = pa.nulls(b.num_rows, type=pa.int64())
        for c in pcols:
            cols["P__" + c] = b[c]
        for c in icols:
            cols["I__" + c] = pa.nulls(b.num_rows, type=itypes[c])
        cols["__cell"] = pa.array(ts_np // cell, type=pa.int64())
        cols["__side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        arrs = [(cols[n].combine_chunks() if isinstance(cols[n], pa.ChunkedArray)
                 else cols[n]) for n in sorted(cols)]
        return pa.Table.from_arrays(arrs, names=sorted(cols))

    def tag_intervals(b: pa.Table) -> pa.Table:
        b = _drop_null(b, on + [start_col, end_col])
        s = b[start_col].cast(pa.int64())
        e = b[end_col].cast(pa.int64())
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        e = e.combine_chunks() if isinstance(e, pa.ChunkedArray) else e
        s_np = s.to_numpy(zero_copy_only=False)
        e_np = e.to_numpy(zero_copy_only=False)
        keep = e_np >= s_np
        if not keep.all():
            b = b.filter(pa.array(keep))
            s_np, e_np = s_np[keep], e_np[keep]
        lo_c = s_np // cell
        hi_c = e_np // cell
        counts = (hi_c - lo_c + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s_np)), counts)
        # csum[idx] (not repeat of a 1-prefixed cumsum) so a batch whose
        # rows are ALL dropped (null bounds / end<start / empty block)
        # yields empty arrays instead of a broadcast ValueError
        csum = np.concatenate(([0], np.cumsum(counts)))
        offs = np.arange(int(counts.sum())) - csum[idx]
        cells = lo_c[idx] + offs
        take = pa.array(idx)
        cols = {k: b[k].combine_chunks().take(take)
                if isinstance(b[k], pa.ChunkedArray) else b[k].take(take)
                for k in on}
        cols["__ts"] = pa.nulls(len(idx), type=pa.int64())
        cols["__s"] = pa.array(s_np[idx], type=pa.int64())
        cols["__e"] = pa.array(e_np[idx], type=pa.int64())
        for c in pcols:
            cols["P__" + c] = pa.nulls(len(idx), type=ptypes[c])
        for c in icols:
            v = b[c]
            v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            cols["I__" + c] = v.take(take)
        cols["__cell"] = pa.array(cells, type=pa.int64())
        cols["__side"] = pa.array(np.ones(len(idx), dtype=np.int8))
        arrs = [(cols[n].combine_chunks() if isinstance(cols[n], pa.ChunkedArray)
                 else cols[n]) for n in sorted(cols)]
        return pa.Table.from_arrays(arrs, names=sorted(cols))

    tp = points.map_batches(tag_points, batch_format="pyarrow",
                            zero_copy_batch=True)
    ti = intervals.map_batches(tag_intervals, batch_format="pyarrow",
                               zero_copy_batch=True)
    both = tp.union(ti)

    out_schema = pa.schema(
        [(k, ptypes[k]) for k in on]
        + [("ts", pa.int64()), ("start", pa.int64()), ("end", pa.int64())]
        + [(pmap[c], ptypes[c]) for c in pcols]
        + [(imap[c], itypes[c]) for c in icols])

    def per_block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        side = g["__side"].to_numpy(zero_copy_only=False)
        cells = g["__cell"].to_numpy(zero_copy_only=False)
        p_idx = np.flatnonzero(side == 0)
        i_idx = np.flatnonzero(side != 0)
        if not len(p_idx) or not len(i_idx):
            return out_schema.empty_table()
        if on:
            codes = _group_codes(g, on + ["__cell"])
        else:
            codes = cells - cells.min()
        tP = g["__ts"].to_numpy(zero_copy_only=False)[p_idx].astype(np.int64)
        sI = g["__s"].to_numpy(zero_copy_only=False)[i_idx].astype(np.int64)
        eI = g["__e"].to_numpy(zero_copy_only=False)[i_idx].astype(np.int64)
        # clip each interval copy's start to its cell's lower bound: within
        # the point's own cell, clipped_start <= ts  <=>  start <= ts
        cell_lo = cells[i_idx] * cell
        sI_clip = np.maximum(sI, cell_lo)
        pi, ii = _stab_pairs(codes[p_idx], tP, codes[i_idx], sI_clip)
        if not len(pi):
            return out_schema.empty_table()
        keep = eI[ii] >= tP[pi]
        pi, ii = pi[keep], ii[keep]
        if not len(pi):
            return out_schema.empty_table()
        gp = g.take(pa.array(p_idx[pi]))
        gi = g.take(pa.array(i_idx[ii]))
        cols = {k: gp[k] for k in on}
        cols["ts"] = gp["__ts"]
        cols["start"] = gi["__s"]
        cols["end"] = gi["__e"]
        for c in pcols:
            cols[pmap[c]] = gp["P__" + c]
        for c in icols:
            cols[imap[c]] = gi["I__" + c]
        return pa.Table.from_arrays(
            [(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
             for v in cols.values()], schema=out_schema)

    sort_cols = on + ["__cell"] if on else ["__cell"]
    # coalesce the (usually filtered-small) tagged blocks to ~one per core
    # before the range shuffle: sort cost at this shape is dominated by
    # per-block fixed overhead (window_agg.py sortmerge note)
    import ray as _ray
    nparts = max(8, int(_ray.cluster_resources().get("CPU", 8)))
    return both.repartition(nparts).sort(sort_cols) \
        .map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True)


def interval_overlap_join(
    left, right, *,
    on=None,
    left_start: str = "start", left_end: str = "end",
    right_start: str = "start", right_end: str = "end",
    cell_us=None,
    left_cols=None, right_cols=None,
    suffixes=("_l", "_r"),
):
    """Interval-overlap join: pairs (l, r) with
    ``l.start <= r.end AND r.start <= l.end`` (closed intervals, the SQL
    overlap predicate) and equal key when ``on`` is given — the
    interval×interval generalization of ``interval_join`` (temporal
    validity joins, downtime×incident overlap, span intersection).

    Same cell scheme: BOTH sides replicate to every time cell they cover;
    an overlapping pair shares every cell of its intersection, so it is
    counted ONLY in the cell containing the overlap START
    ``max(l.start, r.start)`` — each pair meets in exactly one cell with
    no dedup exchange. ONE ``sort(key..., cell)`` co-locates a cell's
    copies; the per-block kernel probes the ``_stab_pairs`` composite axis
    (left copies ordered by clipped start, right rows probe with their
    end: clipped_lstart <= r.end is exact inside the cell) and filters the
    candidates on ``l.end >= r.start`` and overlap-start-in-this-cell.

    Scale assumptions: replication factor = ceil(len / cell_us) + 1 PER
    SIDE; candidate fan-out per right copy = left intervals in the cell
    starting at-or-before its end — stacked-interval density drives both
    candidates and true output. ``cell_us=None`` samples both sides
    (p90 of the pooled lengths). NULL keys / NULL bounds never join.
    Output: key cols, ``start_l/end_l/start_r/end_r`` (int64 us), then
    payload columns with ``suffixes`` on collisions."""
    on = [] if on is None else ([on] if isinstance(on, str) else list(on))
    if left.schema() is None or right.schema() is None:
        return left.limit(0)

    if cell_us is None:
        lens, sampled = [], False
        for ds_, s_, e_ in ((left, left_start, left_end),
                            (right, right_start, right_end)):
            parts = list(ds_.limit(2048).select_columns([s_, e_])
                         .iter_batches(batch_format="pyarrow",
                                       batch_size=2048))
            if parts:
                sampled = True
                t = pa.concat_tables(parts).drop_null()  # null bounds
                if t.num_rows == 0:                      # never join
                    continue
                s = t[s_].cast(pa.int64()).to_numpy(zero_copy_only=False)
                e = t[e_].cast(pa.int64()).to_numpy(zero_copy_only=False)
                lens.append(np.maximum(e - s, 0))
        if not lens:
            if not sampled:
                return left.limit(0)       # both inputs genuinely empty
            cell_us = 3_600_000_000        # all-null samples: 1 h cell
        else:
            pooled = np.concatenate(lens)
            cell_us = max(int(np.quantile(pooled, 0.9)) + 1, 1)
    cell = int(cell_us)

    lschema, rschema = left.schema(), right.schema()
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    lcols = [c for c in (left_cols if left_cols is not None
                         else lschema.names)
             if c not in on and c not in (left_start, left_end)]
    rcols = [c for c in (right_cols if right_cols is not None
                         else rschema.names)
             if c not in on and c not in (right_start, right_end)]
    sl, sr = suffixes
    lmap = {c: (c + sl if c in rcols else c) for c in lcols}
    rmap = {c: (c + sr if c in lcols else c) for c in rcols}

    def _drop_null(b: pa.Table, need):
        mask = None
        for k in need:
            v = pc.is_valid(b[k])
            mask = v if mask is None else pc.and_(mask, v)
        if mask is not None and not pc.all(mask).as_py():
            b = b.filter(mask)
        return b

    def _tagger(side: int):
        s_col = left_start if side == 0 else right_start
        e_col = left_end if side == 0 else right_end
        own, other = (lcols, rcols) if side == 0 else (rcols, lcols)
        own_t = ltypes if side == 0 else rtypes
        oth_t = rtypes if side == 0 else ltypes
        pfx, opfx = ("L__", "R__") if side == 0 else ("R__", "L__")
        sn, en = ("__sl", "__el") if side == 0 else ("__sr", "__er")
        osn, oen = ("__sr", "__er") if side == 0 else ("__sl", "__el")

        def tag(b: pa.Table) -> pa.Table:
            b = _drop_null(b, on + [s_col, e_col])
            s = b[s_col].cast(pa.int64())
            e = b[e_col].cast(pa.int64())
            s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
            e = e.combine_chunks() if isinstance(e, pa.ChunkedArray) else e
            s_np = s.to_numpy(zero_copy_only=False)
            e_np = e.to_numpy(zero_copy_only=False)
            keep = e_np >= s_np
            if not keep.all():
                b = b.filter(pa.array(keep))
                s_np, e_np = s_np[keep], e_np[keep]
            lo_c = s_np // cell
            hi_c = e_np // cell
            counts = (hi_c - lo_c + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(s_np)), counts)
            # csum[idx] formulation — safe for all-dropped/empty batches
            # (same fix as interval_join's tag_intervals)
            csum = np.concatenate(([0], np.cumsum(counts)))
            offs = np.arange(int(counts.sum())) - csum[idx]
            cells = lo_c[idx] + offs
            take = pa.array(idx)
            cols = {k: (b[k].combine_chunks()
                        if isinstance(b[k], pa.ChunkedArray)
                        else b[k]).take(take) for k in on}
            cols[sn] = pa.array(s_np[idx], type=pa.int64())
            cols[en] = pa.array(e_np[idx], type=pa.int64())
            cols[osn] = pa.nulls(len(idx), type=pa.int64())
            cols[oen] = pa.nulls(len(idx), type=pa.int64())
            for c in own:
                v = b[c]
                v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
                cols[pfx + c] = v.take(take)
            for c in other:
                cols[opfx + c] = pa.nulls(len(idx), type=oth_t[c])
            cols["__cell"] = pa.array(cells, type=pa.int64())
            cols["__side"] = pa.array(
                np.full(len(idx), side, dtype=np.int8))
            arrs = [(cols[n].combine_chunks()
                     if isinstance(cols[n], pa.ChunkedArray) else cols[n])
                    for n in sorted(cols)]
            return pa.Table.from_arrays(arrs, names=sorted(cols))
        return tag

    tl = left.map_batches(_tagger(0), batch_format="pyarrow",
                          zero_copy_batch=True)
    tr = right.map_batches(_tagger(1), batch_format="pyarrow",
                           zero_copy_batch=True)
    both = tl.union(tr)

    out_schema = pa.schema(
        [(k, ltypes[k]) for k in on]
        + [("start_l", pa.int64()), ("end_l", pa.int64()),
           ("start_r", pa.int64()), ("end_r", pa.int64())]
        + [(lmap[c], ltypes[c]) for c in lcols]
        + [(rmap[c], rtypes[c]) for c in rcols])

    def per_block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        side = g["__side"].to_numpy(zero_copy_only=False)
        cells = g["__cell"].to_numpy(zero_copy_only=False)
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side != 0)
        if not len(l_idx) or not len(r_idx):
            return out_schema.empty_table()
        if on:
            codes = _group_codes(g, on + ["__cell"])
        else:
            codes = cells - cells.min()
        sL = g["__sl"].to_numpy(zero_copy_only=False)[l_idx].astype(np.int64)
        eL = g["__el"].to_numpy(zero_copy_only=False)[l_idx].astype(np.int64)
        sR = g["__sr"].to_numpy(zero_copy_only=False)[r_idx].astype(np.int64)
        eR = g["__er"].to_numpy(zero_copy_only=False)[r_idx].astype(np.int64)
        cell_lo_l = cells[l_idx] * cell
        sL_clip = np.maximum(sL, cell_lo_l)
        # probe: right copies with their end; candidates = left copies in
        # the same (key, cell) whose clipped start <= r.end — exact for
        # the lower bound inside the cell (both cover this cell)
        ri, li = _stab_pairs(codes[r_idx], eR, codes[l_idx], sL_clip)
        if not len(ri):
            return out_schema.empty_table()
        # true overlap + meet-in-exactly-this-cell (overlap start here)
        os_ = np.maximum(sL[li], sR[ri])
        c0 = cells[r_idx[ri]] * cell
        keep = (eL[li] >= sR[ri]) & (os_ >= c0) & (os_ < c0 + cell)
        li, ri = li[keep], ri[keep]
        if not len(li):
            return out_schema.empty_table()
        gl = g.take(pa.array(l_idx[li]))
        gr = g.take(pa.array(r_idx[ri]))
        cols = {k: gl[k] for k in on}
        cols["start_l"] = gl["__sl"]
        cols["end_l"] = gl["__el"]
        cols["start_r"] = gr["__sr"]
        cols["end_r"] = gr["__er"]
        for c in lcols:
            cols[lmap[c]] = gl["L__" + c]
        for c in rcols:
            cols[rmap[c]] = gr["R__" + c]
        return pa.Table.from_arrays(
            [(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
             for v in cols.values()], schema=out_schema)

    sort_cols = on + ["__cell"] if on else ["__cell"]
    # coalesce tagged blocks to ~one per core before the range shuffle
    # (sort fixed-overhead note in windowed_aggregate's sortmerge path)
    import ray as _ray
    nparts = max(8, int(_ray.cluster_resources().get("CPU", 8)))
    return both.repartition(nparts).sort(sort_cols) \
        .map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True)
