"""SQL set operations: EXCEPT / INTERSECT (DISTINCT and ALL).

The reference has no set operations (its only multi-stream operator is the
join — SURVEY.md §2.7); these complete the relational surface for the usual
curation jobs: "documents in snapshot A but not snapshot B" (EXCEPT),
"ids present in both shards" (INTERSECT), blocklist subtraction.

Shape (one exchange, combiner-reduced — the prompt's pre-aggregate rule):

1. per-block partial: count occurrences of each distinct tuple on its side
   (one ``pc.sort_indices`` + run arithmetic per block — a block never
   ships more than one row per distinct tuple per side);
2. ONE null-safe sort co-location exchange on the FULL tuple (equal whole
   sort tuples co-locate — the documented-safe Ray sort case);
3. per-block final: sum per-side counts per tuple run, emit by bag algebra
   — DISTINCT: ``l>0 and r==0`` (EXCEPT) / ``l>0 and r>0`` (INTERSECT);
   ALL: ``max(l−r, 0)`` / ``min(l, r)`` copies via one ``np.repeat``.

NULLs compare equal (SQL set-op semantics, unlike ``=``) — the same
``__nn_`` validity-companion encoding the aggregate exchange uses.

Quirk: a result with ZERO rows loses its schema (``ds.schema() is None``)
— Ray 2.49's all-to-all drops fully-empty blocks, same behavior as every
other shuffle-bearing stage here. Row data is never affected.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_L, _R = "__setop_l", "__setop_r"


def _partial_counts(side: str, cols: Sequence[str]):
    """Per-block: distinct tuples + occurrence count on one side. Column
    order is fixed (cols, _L, _R) so the two sides' partials union cleanly."""

    def f(t: pa.Table) -> pa.Table:
        t = t.select(list(cols))
        n = t.num_rows
        if n == 0:
            counts = np.zeros(0, dtype=np.int64)
        else:
            t = t.take(pc.sort_indices(t, sort_keys=[(c, "ascending")
                                                     for c in cols])) \
                 .combine_chunks()
            from saber_ray.core.segments import key_change_mask
            chg = key_change_mask(t, list(cols))
            starts = np.flatnonzero(chg)
            counts = np.diff(np.append(starts, n))
            t = t.take(pa.array(starts)).combine_chunks()
        zero = np.zeros(len(counts), dtype=np.int64)
        t = t.append_column(_L, pa.array(counts if side == _L else zero,
                                         type=pa.int64()))
        return t.append_column(_R, pa.array(counts if side == _R else zero,
                                            type=pa.int64()))

    return f


def _emit(op: str, distinct: bool, cols: Sequence[str], sort_keys):
    # change detection runs over sort_keys (the __nn_ validity companions +
    # null-FILLED key columns): post-encode, a NULL and the fill default are
    # identical in `cols` alone — only the encoded tuple separates them
    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.drop_columns([_L, _R])
        t = t.take(pc.sort_indices(t, sort_keys=[(c, "ascending")
                                                 for c in sort_keys])) \
             .combine_chunks()
        from saber_ray.core.segments import key_change_mask
        chg = key_change_mask(t, list(sort_keys))
        starts = np.flatnonzero(chg)
        seg = np.cumsum(chg) - 1
        l = np.bincount(seg, weights=t[_L].to_numpy(zero_copy_only=False),
                        minlength=len(starts)).astype(np.int64)
        r = np.bincount(seg, weights=t[_R].to_numpy(zero_copy_only=False),
                        minlength=len(starts)).astype(np.int64)
        if distinct:
            # EXCEPT: in left and NOT in right (regardless of multiplicity);
            # INTERSECT: in both — SQL DISTINCT set semantics
            copies = ((l > 0) & (r == 0) if op == "except"
                      else (l > 0) & (r > 0)).astype(np.int64)
        else:
            # bag semantics (EXCEPT ALL / INTERSECT ALL)
            copies = np.maximum(l - r, 0) if op == "except" \
                else np.minimum(l, r)
        t = t.drop_columns([_L, _R])
        return t.take(pa.array(np.repeat(starts, copies))).combine_chunks()

    return f


def _setop(left, right, op: str, *, distinct: bool,
           on: Sequence[str] | None):
    cols = list(on) if on else None

    def run(cols: list[str]):
        from saber_ray.stages.window_agg import _encode_null_keys
        enc, dec, sort_keys = _encode_null_keys(cols)
        kw = {"batch_format": "pyarrow", "zero_copy_batch": True}
        # _partial_counts selects `cols` itself — no separate project stage
        l = left.map_batches(_partial_counts(_L, cols), **kw)
        r = right.map_batches(_partial_counts(_R, cols), **kw)
        return l.union(r) \
            .map_batches(enc, **kw) \
            .sort(sort_keys) \
            .map_batches(_emit(op, distinct, cols, sort_keys), **kw) \
            .map_batches(dec, **kw)

    if cols is not None:
        return run(cols)
    # full-row set op: column set comes from the (lazy) schema; an EMPTY
    # dataset's schema() can be None on this Ray version — fall back to
    # the other side (empty-side rows contribute nothing either way)
    sch = left.schema() or right.schema()
    if sch is None:
        return left          # both sides empty and schemaless
    return run(sch.names)


def except_(left, right, *, on: Sequence[str] | None = None,
            distinct: bool = True):
    """``left EXCEPT [ALL] right`` over ``on`` (default: all of left's
    columns, which must match right's). ``distinct=False`` = EXCEPT ALL."""
    return _setop(left, right, "except", distinct=distinct, on=on)


def intersect(left, right, *, on: Sequence[str] | None = None,
              distinct: bool = True):
    """``left INTERSECT [ALL] right``; ``distinct=False`` = INTERSECT ALL."""
    return _setop(left, right, "intersect", distinct=distinct, on=on)
