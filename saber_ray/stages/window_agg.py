"""Windowed (optionally grouped) aggregation — the heart of the engine.

Parity target: Saber's Aggregation operator — CNT/SUM/AVG/MIN/MAX over
column(s) per tumbling/sliding window, optional group-by, emitting one row per
(window[, key]) (reference: cql/operators/cpu/Aggregation.java:27-394 dispatch;
pane classification WindowBatch.java:339-643; fragment merge
handlers/PartialResultSlot.java:136-300; ordered commit
handlers/ResultAggregator.java:150-231).

Ray-Data-native design (NOT a port — replaces the fragment/slot-ring machinery):

1. **Pane partials inside map_batches** (stateless, vectorized, zero-copy
   Arrow): each batch computes ``pane_id = t // pane`` and pre-aggregates per
   (keys..., pane_id) with ``pyarrow.Table.group_by``. Because panes are the
   gcd(size, slide) grid, a pane never straddles a window boundary — the
   opening/closing/pending/complete fragment kinds collapse into "a bag of
   pane partials", and batch boundaries stop mattering entirely (the property
   Saber's slot ring works hard to restore; see test_window_agg.py's
   batch-size-invariance property test).
2. **Pane→window expansion + in-batch re-merge**: each pane partial is
   replicated to the ~size/slide windows covering it and re-merged per
   (keys..., window_id) — still inside the batch, so the shuffle input is at
   most (#keys × #windows-touched) rows per batch, independent of row count.
   This is the "pre-aggregate before groupby" combiner pattern.
3. **ONE hash shuffle**: ``groupby(keys + [window_id]).aggregate(...)``
   merges partials with the associative algebra of
   PartialResultSlot.java:186-212 (sum/cnt add, min/max, AVG finalized at
   emit per Aggregation.java:920-929).
4. **Finalize** (stateless map_batches): compute requested outputs, window
   bounds, and optionally drop windows not yet closed by the watermark
   (watermark-driven flushing replaces the slot-ring commit frontier).

Scale notes: the shuffle moves only merged partials (keys × windows), never
raw rows; hot keys are pre-combined per batch, so a key appears at most once
per (batch, window) — classic combiner-based skew mitigation. Wide payload
columns (e.g. transcript ``text``) never enter the shuffle: project derived
numeric columns first (SURVEY.md §7.4).

Row (count-based) windows take ``ts_col`` = an explicit ordinal column (e.g.
``turn_idx`` per conv_id). **Partitioning assumption**: the ordinal must be a
globally consistent row numbering within each group (reference computes it
from physical stream position, WindowBatch.java:499-643, which only exists on
a single totally-ordered stream; a distributed engine needs the ordinal
materialized — see sources/transcripts.py helpers).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from saber_ray.core.aggregates import (
    AggSpec, ROWS, append_sq_columns, apply_scales, arrow_merge_aggs,
    arrow_partial_aggs, finalize, group_by_null_safe, input_columns,
    null_fill_scalar, ray_merge_aggs, scaled_columns,
)
from saber_ray.core.windows import Window

_PANE = "__pane"
_WID = "window_id"
_SALT = "__salt"


class PanePartialAgg:
    """Per-batch pane partial aggregation (steps 1+2 above).

    A plain callable class usable both as a stateless map_batches fn and in an
    actor pool; all per-call work is vectorized Arrow/numpy.
    """

    def __init__(self, window: Window, aggs: Sequence[AggSpec],
                 keys: Sequence[str], ts_col: str, salt: int = 0,
                 expand: bool = True):
        self.window = window
        self.aggs = list(aggs)
        self.keys = list(keys)
        self.ts_col = ts_col
        self.salt = salt
        # expand=False emits PANE-granularity partials (column __pane) for
        # merge paths that partition by key only and expand post-shuffle —
        # ~size/slide fewer shuffle rows for sliding windows.
        self.expand = expand
        self.scales = scaled_columns(aggs)
        self.partial_spec, self.partial_rename = arrow_partial_aggs(aggs)
        self.merge_spec, self.merge_rename = arrow_merge_aggs(aggs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = self.window
        t = batch[self.ts_col]
        if not pa.types.is_integer(t.type):
            t = t.cast(pa.int64())          # timestamp[us] → epoch microseconds
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        pane_np = t.to_numpy(zero_copy_only=False) // w.pane

        cols = [batch[k] for k in self.keys] + \
               [batch[c] for c in input_columns(self.aggs)] + \
               [pa.array(pane_np, type=pa.int64())]
        names = self.keys + input_columns(self.aggs) + [_PANE]
        tbl = pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
            names=names)
        if self.scales:
            tbl = apply_scales(tbl, self.scales)
        tbl = append_sq_columns(tbl, self.aggs)

        p1 = group_by_null_safe(tbl, self.keys + [_PANE], self.partial_spec)
        p1 = p1.rename_columns([self.partial_rename.get(n, n) for n in p1.column_names])

        if w.is_tumbling:
            # pane == window: just rename (panes_per_slide == panes_per_window == 1)
            idx = p1.column_names.index(_PANE)
            out = p1.set_column(idx, _WID, p1[_PANE])
        elif not self.expand:
            out = p1                       # pane partials; expansion post-shuffle
        else:
            panes = p1[_PANE].to_numpy(zero_copy_only=False)
            row_sel, window_id = w.expand_panes(panes)
            p2 = p1.drop_columns([_PANE]).take(row_sel)
            p2 = p2.append_column(_WID, pa.array(window_id, type=pa.int64()))
            p3 = group_by_null_safe(p2, self.keys + [_WID], self.merge_spec)
            out = p3.rename_columns([self.merge_rename.get(n, n) for n in p3.column_names])
        if self.salt:
            # per-block salt: spreads a hot key's block-partials over `salt`
            # first-round reducers (deterministic — derived from block content,
            # stable across retries of the same block).
            sv = int(pane_np[0] ^ pane_np[-1] ^ len(pane_np)) % self.salt
            out = out.append_column(
                _SALT, pa.array(np.full(out.num_rows, sv, dtype=np.int64)))
        return out


class PaneToWindowMerge:
    """Post-shuffle pane→window path: merge pane partials per (keys, pane),
    expand panes to their covering windows, merge per (keys, window).

    Correct ONLY when the exchange co-located each key entirely (partition
    by keys alone — NOT by (keys, pane), which could split a window's panes
    across reducers). Equivalent to pre-expansion by associativity; moves
    ~size/slide fewer rows through the shuffle."""

    def __init__(self, aggs: Sequence[AggSpec], keys: Sequence[str],
                 window: Window, extra_keys: Sequence[str] = ()):
        self.keys = list(keys) + list(extra_keys)
        self.window = window
        self.merge_spec, self.merge_rename = arrow_merge_aggs(aggs)

    def _rename(self, t: pa.Table) -> pa.Table:
        return t.rename_columns([self.merge_rename.get(n, n)
                                 for n in t.column_names])

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            idx = batch.column_names.index(_PANE)
            return batch.set_column(idx, _WID, batch[_PANE])
        m = self._rename(group_by_null_safe(batch, self.keys + [_PANE],
                                            self.merge_spec))
        panes = m[_PANE].to_numpy(zero_copy_only=False)
        row_sel, window_id = self.window.expand_panes(panes)
        t = m.drop_columns([_PANE]).take(row_sel)
        t = t.append_column(_WID, pa.array(window_id, type=pa.int64()))
        return self._rename(group_by_null_safe(t, self.keys + [_WID],
                                               self.merge_spec))


class PartialMerge:
    """Re-merge pane/window partials inside a block (pyarrow group_by with the
    associative algebra — PartialResultSlot.java:186-212). Used by the
    tree-reduce merge path."""

    def __init__(self, aggs: Sequence[AggSpec], keys: Sequence[str],
                 extra_keys: Sequence[str] = (), id_col: str = _WID):
        self.keys = list(keys) + list(extra_keys)
        self.id_col = id_col            # _WID (window) or _PANE granularity
        self.merge_spec, self.merge_rename = arrow_merge_aggs(aggs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        m = group_by_null_safe(batch, self.keys + [self.id_col], self.merge_spec)
        return m.rename_columns([self.merge_rename.get(n, n) for n in m.column_names])


def _encode_null_keys(keys: Sequence[str]):
    """SQL GROUP BY keeps NULL groups, but Ray's sort boundaries can't
    compare None — so around the sort each key column k rides with a
    validity companion __nn_k and nulls filled with a type default; the
    encoded tuple (__nn_k, k) uniquely determines the original key, so
    equal-key co-location is preserved. Decoded right after the sort."""
    import pyarrow.compute as pc

    def enc(t: pa.Table) -> pa.Table:
        for k in keys:
            col = t[k]
            t = t.append_column(f"__nn_{k}", pc.cast(pc.is_valid(col), pa.int64()))
            if col.null_count:        # fill is identity on non-null values
                idx = t.column_names.index(k)
                t = t.set_column(idx, k,
                                 pc.fill_null(col, null_fill_scalar(col.type)))
        # uniform single-chunk layout: appending an unchunked column next to
        # multi-chunk ones makes a heterogeneously-chunked table, which the
        # shuffle's slice+serialize path corrupts (invalid binary offsets)
        return t.combine_chunks()

    def dec(t: pa.Table) -> pa.Table:
        from saber_ray.core.aggregates import compact_array
        for k in keys:
            # compaction first: pc.if_else on a SLICED string chunk emits
            # invalid binary offsets on this pyarrow (see compact_array)
            valid = compact_array(pc.equal(t[f"__nn_{k}"], pa.scalar(1, pa.int64())))
            col = compact_array(t[k])
            idx = t.column_names.index(k)
            t = t.set_column(idx, k, pc.if_else(valid, col,
                                                pa.scalar(None, col.type)))
        return t.drop_columns([f"__nn_{k}" for k in keys]).combine_chunks()

    sort_keys = [c for k in keys for c in (f"__nn_{k}", k)]
    return enc, dec, sort_keys


class FinalizeWindows:
    """Step 4: partials → requested output columns (+ window bounds, watermark
    filter). AVG division happens here (Aggregation.java:920-929 semantics)."""

    def __init__(self, window: Window, aggs: Sequence[AggSpec],
                 keys: Sequence[str], *, watermark: Optional[int],
                 emit_start: bool, round_decimals: Optional[int]):
        self.window = window
        self.aggs = list(aggs)
        self.keys = list(keys)
        self.watermark = watermark
        self.emit_start = emit_start
        self.round_decimals = round_decimals

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = self.window
        if self.watermark is not None and batch.num_rows:
            wid = batch[_WID].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(w.closed_mask(wid, self.watermark)))
        cols: dict[str, pa.Array] = {k: batch[k] for k in self.keys}
        cols[_WID] = batch[_WID]
        if self.emit_start:
            starts = batch[_WID].to_numpy(zero_copy_only=False) * w.slide
            cols["window_start_us"] = pa.array(starts, type=pa.int64())
        cols.update(finalize(batch, self.aggs, round_decimals=self.round_decimals))
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols.values()],
            names=list(cols.keys()))


def windowed_aggregate(
    ds,
    *,
    window: Window,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = (),
    ts_col: str = "ts",
    watermark: Optional[int] = None,
    emit_start: bool = False,
    round_decimals: Optional[int] = None,
    batch_size: Optional[int] = None,
    merge: str = "sortmerge",
    shuffle_partitions: Optional[int] = None,
    salt: int = 8,
):
    """Windowed grouped aggregation over a Dataset (see module docstring).

    ``watermark``: event-time microseconds; if given, only windows with
    ``end <= watermark`` are emitted (closed windows). ``None`` = end-of-stream
    flush of every non-empty window (finite-input semantics).

    ``merge`` picks the global pane-merge strategy:

    - ``"sortmerge"`` (default): range shuffle ``sort(keys + window_id)``
      followed by a per-block pyarrow re-merge. Correct because Ray's sort
      assigns partitions by value boundaries (``boundaries[i] <= x <
      boundaries[i+1]``, table_block.py _find_partitions_sorted) — rows with
      equal sort keys can NEVER split across reduce partitions, and each
      reduce task emits one merged block — so every block holds complete
      (keys, window) groups. Measured ~5x faster than Ray's sort-based
      ``groupby().aggregate()`` on the same partials, and fully distributed
      (output stays sharded by key range — the scale path for
      high-cardinality keys like conv_id).
    - ``"tree"``: coalesce + in-block pyarrow re-merge, twice (fan-in tree,
      no all-to-all). Correct for ANY keys (the algebra is associative and
      every partial reaches the root), but the root task holds all distinct
      (keys, window) rows — use when that product is bounded (low-cardinality
      group keys like role/tool/campaign, or global windows), where it
      removes shuffle overhead entirely. This is the Saber ResultAggregator
      analogue: a small ordered merge of partials, not a data-sized exchange
      (handlers/ResultAggregator.java:76-135).
    - ``"salted"``: the explicit skew path for hot keys (north rule:
      "skew-aware repartitioning of hot conv_id keys"). Each block's
      partials get a deterministic ``__salt ∈ [0, salt)``; round 1 merges
      per (salt, key, window) so a hot key's block-partials spread over up
      to ``salt`` reducers; round 2 merges the ≤ salt remaining rows per
      (key, window). Safe for any key because the §2.5 algebra is
      associative/commutative (SURVEY.md §7.2 skew note).
    - ``"shuffle"``: Ray Data's native ``groupby(keys + window_id)``
      aggregate — kept as the conservative fallback (no reliance on sort
      partition semantics).
    """
    aggs = list(aggs)
    keys = list(keys)
    # keyed sortmerge AND salted ship PANE partials (~size/slide fewer rows)
    # and expand post-shuffle — legal because the final exchange partitions
    # by key only, so all of a key's panes co-locate (PaneToWindowMerge
    # docstring). Shipping window-granularity partials through the salted
    # double exchange would multiply its shuffle volume by panes-per-window.
    post_expand = merge in ("sortmerge", "salted") and bool(keys) \
        and not window.is_tumbling
    partial = PanePartialAgg(window, aggs, keys, ts_col,
                             salt=salt if merge == "salted" else 0,
                             expand=not post_expand)
    kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    partials = ds.map_batches(partial, **kwargs)
    if merge == "salted":
        import ray
        nparts = shuffle_partitions or max(
            8, int(ray.cluster_resources().get("CPU", 8)))
        enc, dec, sort_keys = _encode_null_keys(keys)
        nn = [f"__nn_{k}" for k in keys]
        if post_expand:
            # round 1 at PANE granularity: a hot key's block-partials land
            # on up to `salt` reducers, each merging its pane share — the
            # per-key pane row count shrinks by ~blocks/salt before the
            # expansion-heavy round 2.
            r1 = partials.map_batches(enc, batch_format="pyarrow",
                                      zero_copy_batch=True) \
                .repartition(nparts).sort([_SALT] + sort_keys) \
                .map_batches(PartialMerge(aggs, keys,
                                          extra_keys=[_SALT] + nn,
                                          id_col=_PANE),
                             batch_format="pyarrow", zero_copy_batch=True)
            # round 2: partition by KEY only (a window's panes must not
            # split); merge panes, expand to windows, window-merge in-task.
            merged = r1.drop_columns([_SALT]) \
                .repartition(max(8, nparts // 4)).sort(sort_keys) \
                .map_batches(PaneToWindowMerge(aggs, keys, window,
                                               extra_keys=nn),
                             batch_format="pyarrow", zero_copy_batch=True) \
                .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)
        else:
            # tumbling/global: pane == window, merge per (salt, key, window)
            # then a tiny final merge per (key, window).
            r1 = partials.map_batches(enc, batch_format="pyarrow",
                                      zero_copy_batch=True) \
                .repartition(nparts).sort([_SALT] + sort_keys + [_WID]) \
                .map_batches(PartialMerge(aggs, keys, extra_keys=[_SALT] + nn),
                             batch_format="pyarrow", zero_copy_batch=True)
            merged = r1.drop_columns([_SALT]) \
                .repartition(max(8, nparts // 4)).sort(sort_keys + [_WID]) \
                .map_batches(PartialMerge(aggs, keys, extra_keys=nn),
                             batch_format="pyarrow", zero_copy_batch=True) \
                .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)
    elif merge == "tree":
        # single fan-in: per-block combining already happened in the partial
        # stage, so the root sees ≤ blocks × (keys × windows) tiny rows —
        # one coalesce + one in-task merge, no all-to-all.
        remerge = PartialMerge(aggs, keys)
        merged = partials.repartition(1).map_batches(
            remerge, batch_format="pyarrow", zero_copy_batch=True)
    elif merge == "sortmerge":
        import ray
        enc, dec, sort_keys = _encode_null_keys(keys)
        if post_expand:
            # partition by KEY only (equal keys can't split across reducers);
            # panes merge, expand to windows, and window-merge in one task.
            remerge = PaneToWindowMerge(aggs, keys, window,
                                        extra_keys=[f"__nn_{k}" for k in keys])
            sort_cols = sort_keys
        else:
            remerge = PartialMerge(aggs, keys,
                                   extra_keys=[f"__nn_{k}" for k in keys])
            sort_cols = sort_keys + [_WID]
        # Coalesce the (already combiner-reduced) partials to ~one block per
        # core before the range shuffle: the sort's cost is dominated by
        # per-block fixed overhead (sampling + partition tasks), so 200 tiny
        # partial blocks sort ~6x slower than 32 right-sized ones. At
        # multi-node scale this tracks total cluster cores.
        nparts = shuffle_partitions or max(
            8, int(ray.cluster_resources().get("CPU", 8)))
        merged = partials.map_batches(enc, batch_format="pyarrow",
                                      zero_copy_batch=True) \
            .repartition(nparts).sort(sort_cols).map_batches(
                remerge, batch_format="pyarrow", zero_copy_batch=True) \
            .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)
    else:
        enc, dec, sort_keys = _encode_null_keys(keys)
        merged = partials.map_batches(enc, batch_format="pyarrow",
                                      zero_copy_batch=True) \
            .groupby(sort_keys + [_WID]).aggregate(*ray_merge_aggs(aggs)) \
            .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)
    fin = FinalizeWindows(window, aggs, keys, watermark=watermark,
                          emit_start=emit_start, round_decimals=round_decimals)
    return merged.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def assign_windows(ds, window: Window, *, ts_col: str = "ts",
                   window_id_alias: str = _WID):
    """Explode each row into every window containing it (one output row per
    (row, window) pair; expansion factor ≈ size/slide, rows in gap panes of
    a slide>size window emit nothing).

    The compositional primitive behind custom per-window logic the packaged
    aggregates don't cover — per-window DISTINCT (windowed_distinct_count),
    per-window top-k (``assign_windows |> grouped_topk``), per-window
    medians (``|> grouped_quantiles``) — anything expressible per (key,
    window_id) group. Window math is the pane decomposition
    (WindowDefinition.java:28-57 parity, core/windows.expand_panes).
    """
    def per_block(t: pa.Table) -> pa.Table:
        tc = t[ts_col]
        if not pa.types.is_integer(tc.type):
            tc = tc.cast(pa.int64())
        if isinstance(tc, pa.ChunkedArray):
            tc = tc.combine_chunks()
        if tc.null_count:
            raise ValueError(
                f"assign_windows: NULL {ts_col!r} has no window (filter "
                "nulls first — SQL GROUP BY would keep a NULL window key, "
                "which the pane math cannot represent)")
        pane = window.pane_ids(tc.to_numpy(zero_copy_only=False))
        row_sel, wid = window.expand_panes(pane)
        out = t.take(pa.array(row_sel))
        return out.append_column(window_id_alias,
                                 pa.array(wid, type=pa.int64()))

    return ds.map_batches(per_block, batch_format="pyarrow",
                          zero_copy_batch=True)


def windowed_distinct_count(ds, window: Window, col: str, *,
                            keys: Sequence[str] = (), ts_col: str = "ts",
                            alias: str = "n_distinct",
                            approx: bool = False, kmv_k: int = 4096):
    """COUNT(DISTINCT col) per (keys, window) — absent from the reference
    (no distinct machinery, SURVEY §2.7) and NOT pane-mergeable (distinct
    sets don't sum), so it composes assign_windows with the grouped
    order-statistics engine: one explode + ONE null-safe sort exchange on
    (keys, window_id). ``approx=True`` swaps in the mergeable KMV sketch
    path for giant windows (bounded error, no window need fit a block)."""
    from saber_ray.stages.stats import grouped_quantiles
    exploded = assign_windows(ds, window, ts_col=ts_col)
    gk = list(keys) + [_WID]
    return grouped_quantiles(exploded, gk, col, {},
                             count_distinct_alias=alias,
                             approx=approx, kmv_k=kmv_k)
