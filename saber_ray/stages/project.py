"""Projection (map) stage.

Parity target: Saber's Projection operator — per-tuple evaluation of an
expression array producing a new output schema (reference:
cql/operators/cpu/Projection.java:12-84; schema derivation
cql/expressions/ExpressionsUtil.java:92-120). Saber's benchmark stresses
arbitrarily deep arithmetic expression trees (scheduling/W1.java:138-151);
ours evaluate as chained pyarrow.compute kernels, vectorized per batch.

Ray-native: ONE stateless ``map_batches``; output schema is exactly the
expression aliases, in order.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

from saber_ray.core.expressions import Expr, as_array


def projection(ds, exprs: Sequence[Expr], *, keep: Sequence[str] = (), batch_size=None):
    """Evaluate expressions per batch → new schema [*keep, *expr aliases]."""

    names = [e.name for e in exprs]
    if len(set(list(keep) + names)) != len(keep) + len(names):
        raise ValueError(f"duplicate output column names in {list(keep) + names}")

    def _project(batch: pa.Table) -> pa.Table:
        cols, out_names = [], []
        for k in keep:
            cols.append(batch[k]); out_names.append(k)
        for e in exprs:
            cols.append(as_array(e(batch), batch.num_rows)); out_names.append(e.name)
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
            names=out_names)

    kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(_project, **kwargs)
