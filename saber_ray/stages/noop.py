"""NoOp (identity) stage — the throughput baseline operator.

Parity target: Saber's NoOp operator, which copies input tuples unchanged to
the output buffer and exists purely to measure the engine's data-path ceiling
(reference: cql/operators/cpu/NoOp.java:9-61; used by
experiments/microbenchmarks/TestNoop.java).

Ray-native: a zero-copy Arrow identity ``map_batches`` — the measured cost is
exactly the object-store + scheduling overhead, which is the analogue of
Saber's buffer-copy ceiling.
"""

from __future__ import annotations

import pyarrow as pa


def noop(ds, *, batch_size=None):
    """Identity transform (data-path throughput baseline)."""

    def _id(batch: pa.Table) -> pa.Table:
        return batch

    kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(_id, **kwargs)
