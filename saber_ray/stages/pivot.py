"""PIVOT: long → wide by conditional aggregation.

Absent from the reference (single-output-schema operators only); standard
in curation reporting — "tokens per (source, lang)" as one wide row per
source, per-category quality-bucket counts, per-split sample tallies.

Ray-native shape: pivot IS conditional aggregation, so it composes the two
primitives the engine already has instead of growing a new exchange:

1. one ``map_batches`` projection masks the value column per category
   (``value if pivot_col == v else NULL`` — one vectorized ``pc.if_else``
   per category, NULL-safe);
2. the existing ``windowed_aggregate`` (all-time tumbling window ≡ plain
   GROUP BY) aggregates every masked column in ONE combiner-reduced
   exchange — per-block partials mean a block ships one row per
   (group, window), regardless of category count.

Cell semantics match SQL ``agg(value) FILTER (WHERE pivot = v)``: empty
cells are NULL for sum/avg/min/max and 0 for count. ``values`` (the
category list) is explicit — at 100 TB you know your categories; pass
``values=None`` to discover them with a small distinct pre-pass (one extra
scan of the pivot column only, combiner-reduced per block).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from saber_ray.core.aggregates import avg, cnt, max_, min_, sum_
from saber_ray.core.windows import Window

_AGG = {"sum": sum_, "avg": avg, "min": min_, "max": max_, "count": cnt}


def distinct_values(ds, column: str, *, limit: int = 10_000) -> list:
    """Small-cardinality distinct discovery: per-block distinct (the
    combiner — a block ships at most its own distincts), one fan-in block,
    final distinct. Raises above ``limit`` — a pivot that wide is a bug."""
    def per_block(t: pa.Table) -> pa.Table:
        u = pc.unique(t[column].combine_chunks()
                      if isinstance(t[column], pa.ChunkedArray)
                      else t[column])
        if len(u) > limit:
            raise ValueError(f"{column!r} has > {limit} distinct values "
                             "in one block — not a pivot column")
        return pa.table({column: u})

    out = ds.map_batches(per_block, batch_format="pyarrow",
                         zero_copy_batch=True).repartition(1) \
            .map_batches(per_block, batch_format="pyarrow",
                         zero_copy_batch=True)
    import ray
    # the fan-in block is already unique and limit-checked (per_block ran
    # on it last); the driver only collects and drops NULL
    tbl = pa.concat_tables(ray.get(out.to_arrow_refs()),
                           promote_options="default")
    return sorted(v for v in tbl[column].to_pylist() if v is not None)


def pivot(ds, group_keys: Sequence[str] | str, pivot_col: str,
          value_col: str, *, agg: str = "sum",
          values: Optional[Sequence] = None,
          scale: Optional[int] = None,
          round_decimals: Optional[int] = None,
          prefix: str = ""):
    """One row per ``group_keys`` tuple; one column ``{prefix}{v}`` per
    category ``v`` holding ``agg(value_col) FILTER (WHERE pivot_col = v)``.

    ``scale=`` forwards the engine's fixed-point exactness to sum/avg on
    decimal currency data. Category values must be scalars; column names
    are ``str(v)`` with an optional ``prefix``.
    """
    group_keys = [group_keys] if isinstance(group_keys, str) \
        else list(group_keys)
    if agg not in _AGG:
        raise ValueError(f"agg must be one of {sorted(_AGG)}, got {agg!r}")
    if values is None:
        values = distinct_values(ds, pivot_col)
    values = list(values)
    if not values:
        raise ValueError("values is empty — nothing to pivot")
    masked = [f"__pv_{i}" for i in range(len(values))]
    out_names = [f"{prefix}{v}" for v in values]
    if len(set(out_names)) != len(out_names):
        raise ValueError(f"duplicate pivot column names: {out_names}")
    clash = set(out_names) & set(group_keys)
    if clash:
        # FinalizeWindows writes aggregates into a {name: col} dict keyed
        # by alias — a category named like a group key would silently
        # REPLACE the key column with aggregate values
        raise ValueError(f"pivot column names collide with group keys: "
                         f"{sorted(clash)} — set prefix=")

    def mask(t: pa.Table) -> pa.Table:
        pv = t[pivot_col]
        val = t[value_col]
        if isinstance(pv, pa.ChunkedArray):
            pv = pv.combine_chunks()
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        cols, names = [t[k] for k in group_keys], list(group_keys)
        # synthetic constant event time: the all-time tumbling window puts
        # every row in window 0 — plain GROUP BY through the agg exchange
        import numpy as np
        cols.append(pa.array(np.zeros(t.num_rows, dtype=np.int64)))
        names.append("__pv_ts")
        for mc, v in zip(masked, values):
            # NULL-safe: pivot NULL never equals v, masked cell stays NULL
            hit = pc.equal(pv, pa.scalar(v, type=pv.type))
            hit = pc.fill_null(hit, False)
            cols.append(pc.if_else(hit, val, pa.scalar(None, type=val.type)))
            names.append(mc)
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols], names=names)

    kw = {} if scale is None else {"scale": scale}
    fn = _AGG[agg]
    aggs = [fn(mc, alias=name, **kw) if agg != "count"
            else fn(mc, alias=name)
            for mc, name in zip(masked, out_names)]
    from saber_ray.stages.window_agg import windowed_aggregate
    out = windowed_aggregate(
        ds.map_batches(mask, batch_format="pyarrow", zero_copy_batch=True),
        window=Window.tumbling(10 ** 18), ts_col="__pv_ts", keys=group_keys,
        aggs=aggs, round_decimals=round_decimals)
    return out.drop_columns(["window_id"])


def unpivot(ds, id_keys: Sequence[str] | str, value_cols: Sequence[str], *,
            var_name: str = "variable", value_name: str = "value",
            drop_null: bool = False):
    """UNPIVOT / melt: wide → long, the inverse reshape of :func:`pivot`.

    Each input row emits one output row per column in ``value_cols``:
    ``id_keys + (variable, value)``. Value columns are cast to a common
    Arrow type (unified via their promoted supertype) so the long
    ``value`` column is well-typed. SQL twin: DuckDB
    ``UNPIVOT t ON c1, c2 INTO NAME variable VALUE value`` —
    which DROPS NULL cells; pass ``drop_null=True`` to match, default
    keeps them (pandas ``melt`` semantics).

    Embarrassingly parallel: one concat of column slices per batch, no
    shuffle, no row loops.
    """
    id_keys = [id_keys] if isinstance(id_keys, str) else list(id_keys)
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    clash = set(id_keys) & {var_name, value_name}
    if clash or var_name == value_name:
        raise ValueError(f"output name collision: {clash or var_name}")

    def per_batch(t: pa.Table) -> pa.Table:
        vtype = t.schema.field(value_cols[0]).type
        for c in value_cols[1:]:
            vtype = pa.unify_schemas(
                [pa.schema([("v", vtype)]),
                 pa.schema([("v", t.schema.field(c).type)])],
                promote_options="permissive").field("v").type
        outs = []
        for c in value_cols:
            part = t.select(id_keys)
            part = part.append_column(
                var_name, pa.repeat(pa.scalar(c, pa.string()), t.num_rows))
            part = part.append_column(value_name, t[c].cast(vtype))
            outs.append(part)
        out = pa.concat_tables(outs, promote_options="default")
        if drop_null and out.num_rows:
            out = out.filter(pc.is_valid(out[value_name]))
        return out.combine_chunks()

    return ds.map_batches(per_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
