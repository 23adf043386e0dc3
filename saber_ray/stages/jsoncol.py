"""JSON column extraction: typed scalar fields out of a JSON-string column.

Log pipelines carry semi-structured payloads as JSON strings (the
``events.props`` column); filtering or aggregating on a field first needs
it extracted as a typed column. pyarrow.compute has no JSON kernel, so a
naive implementation falls back to ``json.loads`` per row — a Python loop
on the hot path. Instead each batch's column is re-assembled into one
NDJSON buffer (a single vectorized ``binary_join_element_wise``) and
parsed by ``pyarrow.json.read_json`` — the C++ block parser — giving one
struct row per input row in order.

Constraints (both validated, both raise loudly):

- every non-null value must be a single-line JSON object — legal JSON
  never contains a RAW newline inside a string (escaped ``\\n`` is
  fine), so any newline in the column means pretty-printed/invalid input
  and raises rather than silently misaligning rows;
- each extracted field must hold ONE JSON type across rows (nulls
  aside) — the C++ reader types columns, and typed extraction treats a
  sometimes-number-sometimes-string field as a data error.

NULL/empty inputs yield NULL outputs for every field.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc


def json_extract(ds, col: str, fields: dict[str, tuple[str, pa.DataType]],
                 *, keep: Optional[Sequence[str]] = None,
                 strict: bool = True):
    """Extract top-level fields from JSON-string column ``col``.

    ``fields``: output alias → (json key, Arrow type). Missing keys and
    JSON nulls become NULL; values are cast to the requested type
    (``strict=False`` turns uncastable values into NULL instead of
    raising). Output: ``keep`` columns (default: all others) + one column
    per alias.
    """
    if not fields:
        raise ValueError("fields must name at least one extraction")

    import pyarrow.json as pajson

    def f(t: pa.Table) -> pa.Table:
        cols = list(keep) if keep is not None else \
            [c for c in t.column_names if c != col]
        names = cols + list(fields)
        if len(set(names)) != len(names):
            raise ValueError(f"json_extract output collision: {names}")
        out_fields = [(c, t.schema.field(c).type) for c in cols] \
            + [(a, typ) for a, (_, typ) in fields.items()]
        schema = pa.schema(out_fields)
        n = t.num_rows
        if n == 0:
            return schema.empty_table()
        from saber_ray.core.aggregates import compact_array
        c = compact_array(t[col])   # de-slice BEFORE if_else (pyarrow
        #                             16.1 sliced-string-offset quirk)
        valid = pc.and_(pc.is_valid(c), pc.not_equal(
            pc.fill_null(c, ""), ""))
        filled = pc.if_else(valid, c, pa.scalar("{}"))
        if pc.any(pc.match_substring(filled, "\n")).as_py():
            raise ValueError(
                f"{col!r} contains raw newlines — not single-line JSON "
                "(legal JSON escapes newlines inside strings)")
        # ONE vectorized append of "\n" per value; the resulting array's
        # DATA buffer is then already the contiguous NDJSON byte stream
        withnl = pc.binary_join_element_wise(filled, pa.scalar("\n"), "")
        arr = compact_array(withnl)              # re-base the offsets
        import numpy as np
        off0 = int(np.frombuffer(arr.buffers()[1], dtype=np.int32,
                                 count=1)[0])
        nbytes = int(pc.sum(pc.binary_length(arr)).as_py())
        buf = arr.buffers()[2].slice(off0, nbytes)
        try:
            parsed = pajson.read_json(pa.BufferReader(buf))
        except pa.ArrowInvalid as e:
            # the C++ reader requires ONE JSON type per field across rows
            # (nulls aside) — typed extraction semantics; a field that is
            # sometimes a number and sometimes a string is a data error.
            # Other parse failures (malformed JSON, oversized rows) keep
            # their original message.
            if "changed from" in str(e):
                raise ValueError(
                    f"{col!r}: inconsistent JSON field types across rows "
                    f"({e}) — each extracted field must hold one JSON "
                    "type") from e
            raise
        if parsed.num_rows != n:
            raise ValueError(
                f"{col!r}: parsed {parsed.num_rows} JSON rows from {n} "
                "input rows — values are not one JSON object per row")
        arrays = [t[c2] for c2 in cols]
        invalid = pc.invert(valid)
        any_invalid = pc.any(invalid).as_py()
        for alias, (key, typ) in fields.items():
            if key in parsed.column_names:
                v = parsed[key]
                v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) \
                    else v
                v = v.cast(typ) if strict else pc.cast(v, typ, safe=False)
                if any_invalid:
                    v = pc.if_else(invalid, pa.scalar(None, typ), v)
            else:
                v = pa.nulls(n, typ)
            arrays.append(v)
        return pa.Table.from_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in arrays], schema=schema)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
