"""List-column tokenize / unnest (explode) stages.

The reference's type system has no nested values at all (TupleSchema.java:5-8
— fixed-width ints/floats/longs), so these are scale extensions in the
training-data-pipeline family: tokenization produces ``list<string>``
columns, UNNEST flattens them one-token-per-row for vocabulary counts,
n-gram mining, per-token joins against blocklists, and token-level quality
filters.

Both stages are embarrassingly parallel ``map_batches`` transforms — no
shuffle, no state:

- ``tokenize`` is one ``pyarrow.compute`` split kernel per batch
  (``split_pattern`` / regex / whitespace); the exact DuckDB twin is
  ``string_split(text, sep)`` / ``string_split_regex``.
- ``unnest`` is ``list_flatten`` + ``list_parent_indices`` + one ``take``
  of the kept columns — all zero-copy Arrow, no per-row Python. Rows with
  NULL or empty lists disappear, exactly like SQL ``UNNEST``; pass
  ``ordinal=`` for the 0-based position within its source list (DuckDB
  ``generate_subscripts``-style) computed by run arithmetic from the list
  offsets.

At 100 TB this is the hot path in front of every vocabulary ``groupby`` —
keeping it a pure per-block kernel means the only exchange in a token-count
pipeline is the (pre-combined) aggregate itself.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tokenize(ds, text_col: str = "text", *, out: str = "tokens",
             sep: Optional[str] = " ", regex: Optional[str] = None,
             lower: bool = False):
    """Append ``out``: list<string> of the split pieces of ``text_col``.

    Exactly one of ``sep`` / ``regex`` applies (``regex`` wins when given);
    ``sep=" "`` is the bit-exact twin of DuckDB ``string_split(text, ' ')``
    (adjacent separators yield empty-string tokens, same as SQL). NULL text
    → NULL list (dropped by a following ``unnest``).
    """
    if regex is None and sep is None:
        raise ValueError("one of sep= / regex= is required")

    def f(t: pa.Table) -> pa.Table:
        c = t[text_col]
        if lower:
            c = pc.utf8_lower(c)
        pieces = (pc.split_pattern_regex(c, regex) if regex is not None
                  else pc.split_pattern(c, sep))
        return t.append_column(out, pieces)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def unnest(ds, list_col: str, *, keep: Sequence[str] | None = None,
           out: Optional[str] = None, ordinal: Optional[str] = None):
    """Explode ``list_col``: one output row per list element.

    ``keep`` columns are repeated per element (default: every other
    column); ``out`` renames the element column (default: ``list_col``).
    NULL and empty lists produce no rows (SQL ``UNNEST`` semantics).
    ``ordinal`` adds an int64 0-based position of each element within its
    source list.
    """
    def f(t: pa.Table) -> pa.Table:
        cols = list(keep) if keep is not None else \
            [c for c in t.column_names if c != list_col]
        named = cols + [out or list_col] + ([ordinal] if ordinal else [])
        if len(set(named)) != len(named):
            # pa.Table.from_arrays accepts duplicate names silently —
            # downstream column access would be ambiguous
            raise ValueError(f"unnest output column collision: {named}")
        lc = t[list_col]
        if isinstance(lc, pa.ChunkedArray):
            lc = lc.combine_chunks()
        if not (pa.types.is_list(lc.type) or pa.types.is_large_list(lc.type)):
            raise TypeError(f"{list_col!r} is {lc.type}, not a list column")
        flat = pc.list_flatten(lc)
        parents = pc.list_parent_indices(lc)
        names = cols + [out or list_col]
        arrays = [t[c].take(parents) for c in cols] + [flat]
        if ordinal is not None:
            # element position = global index − its list's start offset,
            # computed from the parent run starts (no per-list Python)
            p = parents.to_numpy(zero_copy_only=False)
            idx = np.arange(len(p), dtype=np.int64)
            if len(p):
                chg = np.concatenate(([True], p[1:] != p[:-1]))
                start = np.maximum.accumulate(np.where(chg, idx, 0))
            else:
                start = idx
            names.append(ordinal)
            arrays.append(pa.array(idx - start, type=pa.int64()))
        return pa.Table.from_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in arrays], names=names)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
