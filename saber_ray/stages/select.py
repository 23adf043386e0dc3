"""Selection (filter) stage.

Parity target: Saber's Selection operator — per-tuple predicate, satisfying
tuples copied to the output buffer (reference: cql/operators/cpu/Selection.java:11-70,
predicate trees cql/predicates/*.java).

Ray-native: ONE vectorized ``map_batches`` computing a boolean mask with
pyarrow.compute and filtering the Arrow batch zero-copy. Stateless tasks; no
shuffle; streaming-friendly.
"""

from __future__ import annotations

import pyarrow as pa

from saber_ray.core.expressions import Expr


def selection(ds, predicate: Expr, *, batch_size=None):
    """Filter a Dataset by a vectorized predicate expression."""

    def _filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        mask = predicate(batch)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        return batch.filter(mask)

    kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(_filter, **kwargs)
