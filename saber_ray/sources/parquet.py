"""Parquet source helpers.

The reference has no real source — applications push byte arrays into a
circular buffer (reference: QueryApplication.java:51-85,
dispatchers/TaskDispatcher.java:83-98). Our stream source is ordered Parquet:
``ray.data.read_parquet`` with column pruning and pyarrow row-group filter
pushdown, which at 100 TB means only referenced columns/row groups leave
storage.

``column_minmax`` reads parquet FOOTER statistics only — the watermark of a
finite input (max event ts) costs a metadata read, not a data scan.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import pyarrow.parquet as pq
import ray.data as rd


def _seed_fsspec_http_stub() -> None:
    """Make concurrent read_parquet calls thread-safe in this environment.

    Every ``read_parquet`` runs Ray's ``_is_http_filesystem``, which attempts
    ``from fsspec.implementations.http import HTTPFileSystem``. Here that
    import always fails (no aiohttp), and Ray only catches
    ``ModuleNotFoundError`` — but when two threads race the import, Python
    raises a plain ImportError from the partially-initialized module, which
    escapes and kills one reader. Seeding a stub module with a never-matching
    HTTPFileSystem class makes the import succeed deterministically (the
    isinstance check it feeds is then simply False, identical to the
    ModuleNotFoundError path).
    """
    import sys
    import types
    name = "fsspec.implementations.http"
    try:
        __import__(name)
        return                        # real module imports fine — nothing to do
    except ImportError:
        pass
    if name in sys.modules:
        return
    stub = types.ModuleType(name)
    class HTTPFileSystem:             # pragma: no cover - never instantiated
        pass
    stub.HTTPFileSystem = HTTPFileSystem
    sys.modules[name] = stub


_seed_fsspec_http_stub()


def read_table(sf_dir: str, name: str, *, columns: Optional[Sequence[str]] = None,
               **kwargs):
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=list(columns) if columns else None, **kwargs)


def read_with_global_ordinal(path: str, *,
                             columns: Optional[Sequence[str]] = None,
                             ord_col: str = "__ord"):
    """Parquet read that attaches the GLOBAL stream position of every row.

    The reference computes count-window pane ids from physical stream
    position (reference: WindowBatch.java:499-643 — ``streamPtr/tupleSize``),
    which only exists on its single totally-ordered stream. Distributed
    equivalent (SURVEY.md §7.4): a driver-side prefix-sum over row-group
    METADATA (footer reads only — no data scan) gives every row group its
    starting ordinal; each fragment is then read in its own task and gets a
    vectorized ``arange(start, start+n)`` ordinal column. Parallelism =
    number of row groups across files; ordinals are globally consistent and
    deterministic regardless of task scheduling, so ``Window(mode='row')``
    over ``ts_col=ord_col`` reproduces stream-position count windows exactly.
    """
    import numpy as np
    import pyarrow as pa

    frags = []
    start = 0
    for f in _files(path):
        md = pq.read_metadata(f)
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            frags.append({"file": f, "rg": rg, "start": start})
            start += n
    cols = list(columns) if columns else None

    def read_frag(b: pa.Table) -> pa.Table:
        out = []
        for row in b.to_pylist():
            t = pq.ParquetFile(row["file"]).read_row_group(row["rg"],
                                                           columns=cols)
            ords = np.arange(row["start"], row["start"] + t.num_rows,
                             dtype=np.int64)
            out.append(t.append_column(ord_col, pa.array(ords)))
        return pa.concat_tables(out)

    return rd.from_items(frags, override_num_blocks=max(1, len(frags))) \
        .map_batches(read_frag, batch_format="pyarrow", zero_copy_batch=True)


def _files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return [path]


def column_minmax(path: str, column: str) -> tuple:
    """(min, max) of a column across files from row-group footer stats."""
    lo, hi = None, None
    for f in _files(path):
        md = pq.read_metadata(f)
        idx = md.schema.to_arrow_schema().get_field_index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError(f"no min/max stats for {column} in {f}")
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return lo, hi


def watermark_us(path: str, ts_column: str = "ts") -> int:
    """End-of-input watermark: max event-time in epoch microseconds."""
    _, hi = column_minmax(path, ts_column)
    if hasattr(hi, "timestamp"):
        return int(hi.timestamp() * 1_000_000)
    return int(hi)
