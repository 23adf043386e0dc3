"""Ordered CSV / JSONL sources with the Parquet source's contract.

The reference's demo ingests a flat file it splits itself
(DemoWithGoogleClusterData.java:166-209 — length-prefixed records pushed
into the circular buffer); real pipelines start from CSV/JSONL logs. These
readers give text files the same three properties as sources/parquet.py:

- **ordered**: fragments are planned in (file, offset) order and the
  ordinal column (below) gives every row its exact global line position
  deterministically, regardless of task scheduling — the same contract as
  ``sources/parquet.read_with_global_ordinal`` (Ray block ARRIVAL order is
  not guaranteed by default; order-sensitive consumers key on the
  ordinal, exactly like the Parquet path);
- **pruned**: CSV parses only ``columns`` (ConvertOptions.include_columns —
  unreferenced columns are never materialized); JSONL must parse the line
  to find the fields, so pruning drops columns post-parse (documented
  format cost, not a reader deficiency);
- **global ordinal** (opt-in): text files have no footer row counts, so
  ``with_global_ordinal=True`` runs ONE parallel counting pass (a byte
  scan per fragment — the honest CSV analogue of Parquet's free metadata)
  and prefix-sums per-fragment counts on the driver (bytes never leave
  the tasks), then the read pass attaches ``arange(start, start+n)``.

Splitting: each file is cut into ~``target_bytes`` byte ranges; a fragment
owns every line whose FIRST byte lies in ``[start, end)`` (a line starts at
offset 0 or right after a newline — the classic distributed text-split
rule), so a line straddling a boundary is read exactly once, by the
fragment it starts in. Tasks seek; they never read the whole file.

Gzip (``*.csv.gz`` / ``*.jsonl.gz``, the standard delivery format for
sharded web corpora): gzip members are not byte-seekable, so the FILE is
the split unit — parallelism comes from the shard count, each task
decompresses its whole shard (files should be shard-sized; one giant .gz
is a data-layout problem no reader can split). Multi-member (concatenated)
gzip decodes transparently. Everything else — ordering, ordinal contract,
column pruning, header handling — is identical to the plain path, and
plain and .gz shards may be mixed in one directory. Honest cost note:
``with_global_ordinal=True`` inflates each gz shard TWICE (the counting
pass cannot byte-scan a compressed file; line counts require a full
inflate, then the read pass inflates again) — for ordinal-heavy flows
over compressed data, prefer Parquet or plain shards, where the count is
metadata/byte-scan-cheap.
"""

from __future__ import annotations

import glob
import io
import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import ray.data as rd

import saber_ray.sources.parquet  # noqa: F401  (thread-safe read seeding)

_TARGET_BYTES = 32 << 20


def _text_files(path: str, ext: str) -> list[str]:
    if os.path.isdir(path):
        plain = glob.glob(os.path.join(path, "**", f"*{ext}"),
                          recursive=True)
        gz = glob.glob(os.path.join(path, "**", f"*{ext}.gz"),
                       recursive=True)
        return sorted(plain + gz)
    return [path]


def _gz_first_line(f: str) -> bytes:
    import gzip
    with gzip.open(f, "rb") as fh:
        return fh.readline()


def _plan_fragments(files: Sequence[str], target_bytes: int,
                    skip_header: bool) -> tuple[list[dict], Optional[str]]:
    """(fragments, header_line) — fragments in (file, offset) order. With
    ``skip_header`` the first line of EVERY file is the (identical) header;
    fragment 0 of each file starts past it."""
    header = None
    frags = []
    for f in files:
        size = os.path.getsize(f)
        if f.endswith(".gz"):
            # gzip members are not byte-seekable: the file IS the split
            # unit (parallelism across shard files — the standard layout
            # for compressed web corpora; one giant .gz is a data-layout
            # smell this reader cannot fix). The task decompresses the
            # whole shard, so files should be shard-sized.
            if size == 0:
                continue                  # interrupted writer's empty shard
            if skip_header:
                line = _gz_first_line(f)
                if not line:
                    continue              # empty gzip member — no rows
                h = line.decode("utf-8").rstrip("\r\n")
                if header is None:
                    header = h
                elif header != h:
                    raise ValueError(f"CSV header mismatch in {f}")
            frags.append({"file": f, "start": 0, "end": int(size),
                          "fstart": 0, "gz": True,
                          "skip_hdr": bool(skip_header)})
            continue
        first = 0
        if skip_header:
            with open(f, "rb") as fh:
                line = fh.readline()
            h = line.decode("utf-8").rstrip("\r\n")
            if header is None:
                header = h
            elif header != h:
                raise ValueError(f"CSV header mismatch in {f}")
            first = len(line)
        if size <= first:
            continue
        n_parts = max(1, (size - first + target_bytes - 1) // target_bytes)
        bounds = np.linspace(first, size, n_parts + 1).astype(np.int64)
        for i in range(n_parts):
            if bounds[i + 1] > bounds[i]:
                frags.append({"file": f, "start": int(bounds[i]),
                              "end": int(bounds[i + 1]),
                              "fstart": first,
                              "gz": False, "skip_hdr": False})
    return frags, header


def _owned_bytes(frag: dict) -> bytes:
    """All complete lines that START in [start, end) — see module doc.
    A gzip fragment owns its whole (decompressed) file, minus the header
    line for CSV."""
    if frag.get("gz"):
        import gzip
        with gzip.open(frag["file"], "rb") as fh:
            buf = fh.read()
        if frag.get("skip_hdr"):
            nl = buf.find(b"\n")
            buf = buf[nl + 1:] if nl >= 0 else b""
        return buf
    start, end = frag["start"], frag["end"]
    with open(frag["file"], "rb") as fh:
        if start > frag["fstart"]:
            # a line starts at `start` only if byte start-1 is a newline;
            # otherwise the straddling line belongs to the previous fragment
            fh.seek(start - 1)
            prev = fh.read(1)
            if prev != b"\n":
                fh.readline()                 # skip the partial line
        else:
            fh.seek(start)
        pos = fh.tell()
        if pos >= end:
            return b""
        buf = fh.read(end - pos)
        if not buf.endswith(b"\n"):
            buf += fh.readline()              # finish the straddling line
    return buf


def _count_lines(frag: dict) -> int:
    buf = _owned_bytes(frag)
    if not buf:
        return 0
    n = int(np.count_nonzero(np.frombuffer(buf, dtype=np.uint8)
                             == ord("\n")))
    return n + (0 if buf.endswith(b"\n") else 1)


def _header_names(header: str) -> list[str]:
    import csv as _csv
    return next(_csv.reader([header]))


def _parse_csv(buf: bytes, header: str, columns, column_types) -> pa.Table:
    from pyarrow import csv
    names = _header_names(header)
    conv = csv.ConvertOptions(
        include_columns=list(columns) if columns else None,
        column_types=column_types)
    return csv.read_csv(
        io.BytesIO(buf),
        read_options=csv.ReadOptions(column_names=names),
        convert_options=conv)


def _parse_jsonl(buf: bytes, columns) -> pa.Table:
    from pyarrow import json as pj
    t = pj.read_json(io.BytesIO(buf))
    if columns:
        t = t.select(list(columns))
    return t


def _empty_schema(fmt, header, columns, column_types, ord_col) -> pa.Schema:
    """0-row schema for a fragment whose lines were all owned elsewhere
    (only possible when one line exceeds target_bytes). CSV columns default
    to string unless typed; JSONL cannot know field types without a row."""
    if fmt != "csv":
        return pa.schema([(c, pa.string()) for c in (columns or [])])
    names = _header_names(header)
    if columns:
        names = [n for n in names if n in set(columns)]
    fields = [(n, (column_types or {}).get(n, pa.string())) for n in names]
    if ord_col is not None:
        fields.append((ord_col, pa.int64()))
    return pa.schema(fields)


def _fragment_reader(fmt: str, header, columns, column_types, ord_col):
    def read(b: pa.Table) -> pa.Table:
        out = []
        for row in b.to_pylist():             # fragment DESCRIPTORS (tiny)
            buf = _owned_bytes(row)
            if not buf:
                continue
            t = (_parse_csv(buf, header, columns, column_types)
                 if fmt == "csv" else _parse_jsonl(buf, columns))
            if ord_col is not None:
                ords = np.arange(row["ord_start"],
                                 row["ord_start"] + t.num_rows,
                                 dtype=np.int64)
                t = t.append_column(ord_col, pa.array(ords))
            out.append(t)
        if not out:
            return _empty_schema(fmt, header, columns, column_types,
                                 ord_col).empty_table()
        return pa.concat_tables(out, promote_options="default")

    return read


def _read_text(path: str, fmt: str, *, columns=None, column_types=None,
               target_bytes: int = _TARGET_BYTES, ord_col=None):
    ext = ".csv" if fmt == "csv" else ".jsonl"
    files = _text_files(path, ext)
    if not files:
        raise FileNotFoundError(f"no {ext}[.gz] files under {path}")
    frags, header = _plan_fragments(files, target_bytes, fmt == "csv")
    if not frags:
        raise ValueError(f"only empty {ext} files under {path}")
    if ord_col is not None:
        # counting pass: fragment byte scans in parallel tasks; only the
        # per-fragment COUNTS come back for the driver prefix-sum
        counts = rd.from_items(frags, override_num_blocks=len(frags)) \
            .map_batches(
                lambda b: pa.table({"n": pa.array(
                    [_count_lines(r) for r in b.to_pylist()],
                    type=pa.int64())}),
                batch_format="pyarrow") \
            .to_pandas()["n"].to_numpy()
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        for frag, s in zip(frags, starts):
            frag["ord_start"] = int(s)
    reader = _fragment_reader(fmt, header, columns, column_types, ord_col)
    return rd.from_items(frags, override_num_blocks=len(frags)) \
        .map_batches(reader, batch_format="pyarrow", zero_copy_batch=True)


def read_csv(path: str, *, columns: Optional[Sequence[str]] = None,
             column_types: Optional[dict] = None,
             target_bytes: int = _TARGET_BYTES,
             with_global_ordinal: bool = False, ord_col: str = "__ord"):
    """Ordered, pruned, fragment-parallel CSV read (header row required,
    identical across files). ``column_types`` pins dtypes so per-fragment
    inference can never diverge across fragments (pass it for any column
    whose inferred type is data-dependent)."""
    return _read_text(path, "csv", columns=columns,
                      column_types=column_types, target_bytes=target_bytes,
                      ord_col=ord_col if with_global_ordinal else None)


def read_jsonl(path: str, *, columns: Optional[Sequence[str]] = None,
               target_bytes: int = _TARGET_BYTES,
               with_global_ordinal: bool = False, ord_col: str = "__ord"):
    """Ordered, fragment-parallel JSONL read (one JSON object per line)."""
    return _read_text(path, "jsonl", columns=columns,
                      target_bytes=target_bytes,
                      ord_col=ord_col if with_global_ordinal else None)
