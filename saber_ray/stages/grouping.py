"""GROUPING SETS / ROLLUP / CUBE over the existing partial-merge algebra.

Relational-surface extension (the reference has single-key grouped windows
only — cql/operators/AggregationType.java:3-5); SQL semantics match DuckDB's
``GROUP BY GROUPING SETS / ROLLUP / CUBE`` including the ``GROUPING()``
bitmask and one-NULL-group-per-key behavior.

Scale shape: each block's rows are pre-aggregated ONCE PER SET inside
``map_batches`` (pyarrow ``group_by`` — combiner-reduced partials, and a
coarser set's partials are strictly fewer rows than the finest set's), then
ONE sort exchange on ``(grouping_id, encoded keys)`` co-locates every
group's partials, and the standard associative merge + finalize runs per
block. Shuffle volume = Σ per-block group counts across sets — never raw
rows. Rolled-up key columns are emitted as real NULLs; ``grouping_id``
disambiguates them from genuine NULL key values exactly like SQL
``GROUPING()``.
"""

from __future__ import annotations

from itertools import combinations
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from saber_ray.core.aggregates import (AggSpec, apply_scales,
                                       arrow_partial_aggs, finalize,
                                       group_by_null_safe, scaled_columns)
from saber_ray.stages.window_agg import PartialMerge, _encode_null_keys

_GID = "grouping_id"

__all__ = ["grouping_sets", "rollup", "cube"]


def rollup(*keys: str) -> list[list[str]]:
    """SQL ROLLUP(k1..kn) = {(k1..kn), (k1..kn-1), ..., (k1), ()}."""
    return [list(keys[:i]) for i in range(len(keys), -1, -1)]


def cube(*keys: str) -> list[list[str]]:
    """SQL CUBE(k1..kn) = all 2^n subsets (key order preserved)."""
    out: list[list[str]] = []
    for r in range(len(keys), -1, -1):
        out.extend(list(c) for c in combinations(keys, r))
    return out


class _SetPartials:
    """Per-block partials for every grouping set, stacked into one table
    with a literal ``grouping_id`` — grouping by ``[_GID] + set`` also
    covers the empty set (one global group per block)."""

    def __init__(self, sets, gids, all_keys, aggs):
        self.sets, self.gids, self.all_keys = sets, gids, all_keys
        self.spec, self.rename = arrow_partial_aggs(aggs)
        self.scales = scaled_columns(aggs)

    def __call__(self, t: pa.Table) -> pa.Table:
        if _GID in t.column_names:
            raise ValueError(
                f"input already has a {_GID!r} column — rename it before "
                "grouping_sets (the name is reserved for the bitmask)")
        t = apply_scales(t, self.scales)
        key_types = {k: t.schema.field(k).type for k in self.all_keys}
        outs = []
        order: Optional[list[str]] = None
        for s, gid in zip(self.sets, self.gids):
            tt = t.append_column(_GID, pa.array(
                np.full(t.num_rows, gid, dtype=np.int64)))
            g = group_by_null_safe(tt, [_GID] + s, self.spec)
            g = g.rename_columns(
                [self.rename.get(c, c) for c in g.column_names])
            for k in self.all_keys:
                if k not in s:
                    g = g.append_column(k, pa.nulls(g.num_rows,
                                                    key_types[k]))
            if order is None:
                order = [_GID] + self.all_keys + sorted(
                    c for c in g.column_names
                    if c not in self.all_keys and c != _GID)
            outs.append(g.select(order))
        return pa.concat_tables(outs, promote_options="default") \
            .combine_chunks()


def grouping_sets(ds, sets: Sequence[Sequence[str]], aggs: Sequence[AggSpec],
                  *, round_decimals: Optional[int] = None,
                  shuffle_partitions: Optional[int] = None):
    """Aggregate ``ds`` once per grouping set in a single pipeline.

    ``sets`` — e.g. ``rollup("a", "b")`` or ``cube("a", "b")`` or an
    explicit list of key lists. Output: the union of key columns (NULL
    where rolled up), ``grouping_id`` (the SQL ``GROUPING(all_keys...)``
    bitmask, first key = most significant bit), and one column per agg
    alias. Duplicate sets are rejected (SQL would duplicate their rows —
    ambiguous under an unordered union, so make the intent explicit).
    """
    import ray

    aggs = list(aggs)
    sets = [list(s) for s in sets]
    if any(_GID in s for s in sets) or any(a.alias == _GID for a in aggs):
        raise ValueError(
            f"{_GID!r} is reserved for the grouping-set bitmask output")
    seen: set[str] = set()
    all_keys: list[str] = []
    for s in sets:
        if len(set(s)) != len(s):
            raise ValueError(f"duplicate key inside grouping set {s}")
        for k in s:
            if k not in seen:
                seen.add(k)
                all_keys.append(k)
    sigs = {tuple(sorted(s)) for s in sets}
    if len(sigs) != len(sets):
        raise ValueError("duplicate grouping sets")
    n = len(all_keys)
    gids = [sum(1 << (n - 1 - j)
                for j, k in enumerate(all_keys) if k not in s)
            for s in sets]

    partials = ds.map_batches(_SetPartials(sets, gids, all_keys, aggs),
                              batch_format="pyarrow", zero_copy_batch=True)
    enc, dec, sort_keys = _encode_null_keys(all_keys)
    nn = [f"__nn_{k}" for k in all_keys]
    nparts = shuffle_partitions or max(
        8, int(ray.cluster_resources().get("CPU", 8)))
    merged = partials.map_batches(enc, batch_format="pyarrow",
                                  zero_copy_batch=True) \
        .repartition(nparts).sort([_GID] + sort_keys) \
        .map_batches(PartialMerge(aggs, all_keys, extra_keys=nn,
                                  id_col=_GID),
                     batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)

    def fin(batch: pa.Table) -> pa.Table:
        cols: dict = {k: batch[k] for k in all_keys}
        cols[_GID] = batch[_GID]
        cols.update(finalize(batch, aggs, round_decimals=round_decimals))
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols.values()],
            names=list(cols.keys()))

    return merged.map_batches(fin, batch_format="pyarrow",
                              zero_copy_batch=True)
