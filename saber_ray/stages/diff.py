"""Corpus snapshot diff: added / removed / changed documents between two
corpus versions.

The data-ops primitive behind incremental crawls and dataset versioning
("what changed between snapshot A and snapshot B, without shipping
text"): each side reduces to (id, content fingerprint) — text never
enters the exchange — then ONE full-outer co-location join classifies
every id. Unchanged documents (same id, same fingerprint) are omitted;
the output is proportional to the churn, not the corpus.

md5 is used as the content fingerprint so every gate has a DuckDB
``md5()`` value twin; any collision-resistant content hash slots in.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def corpus_diff(ds_old, ds_new, *, id_col: str = "doc_id",
                text_col: str = "text"):
    """Diff two corpus versions: one row per non-identical document —
    (``id_col``, status ∈ {'added', 'removed', 'changed'}). ``added`` =
    id only in ``ds_new``, ``removed`` = only in ``ds_old``, ``changed``
    = same id, different content. SQL twin: full outer join of
    ``(id, md5(text))`` filtered to mismatches."""
    from saber_ray.stages.join import merge_join
    from saber_ray.stages.text import md5_fingerprint

    def side(ds):
        return md5_fingerprint(ds, text_col).select_columns(
            [id_col, "fingerprint"])

    def _idt(ds):
        """The side's id type, or None when unknowable: schema lost to
        Ray's 0-row block dropping (schema() = None), or the id column
        is Arrow null-typed (an EMPTY corpus version built from plain
        ``[]`` lists types its columns null)."""
        s = ds.schema()
        if s is None:
            return None
        t = dict(zip(s.names, s.types)).get(id_col)
        return None if t is None or pa.types.is_null(t) else t

    def _normalize(ds, idt):
        """Give an id-typeless side the OTHER side's id type (the join
        equates the two columns, so this is the only type it can carry):
        rebuild 0-row sides as a typed empty; cast an all-null id column
        in place."""
        s = ds.schema()
        if s is None:
            import ray.data as rd
            return rd.from_arrow(pa.schema(
                [(id_col, idt), ("fingerprint", pa.string())]).empty_table())
        if pa.types.is_null(dict(zip(s.names, s.types))[id_col]):
            def cast_id(t: pa.Table) -> pa.Table:
                i = t.schema.get_field_index(id_col)
                return t.set_column(i, id_col, t[id_col].cast(idt))
            return ds.map_batches(cast_id, batch_format="pyarrow",
                                  zero_copy_batch=True)
        return ds

    old_s, new_s = side(ds_old), side(ds_new)
    idt = _idt(old_s) or _idt(new_s) or pa.int64()
    old_s, new_s = _normalize(old_s, idt), _normalize(new_s, idt)

    j = merge_join(old_s, new_s, on=id_col, how="full_outer",
                   right_cols=[id_col, "fingerprint"], right_suffix="_r")
    rid = f"{id_col}_r"

    def classify(t: pa.Table) -> pa.Table:
        schema = pa.schema([(id_col, t.schema.field(id_col).type),
                            ("status", pa.string())])
        if t.num_rows == 0:
            return schema.empty_table()
        old_missing = pc.is_null(t[id_col])
        new_missing = pc.is_null(t[rid])
        changed = pc.and_kleene(
            pc.and_(pc.invert(old_missing), pc.invert(new_missing)),
            pc.not_equal(t["fingerprint"], t["fingerprint_r"]))
        changed = pc.fill_null(changed, False)
        keep = pc.or_(pc.or_(old_missing, new_missing), changed)
        t = t.filter(keep)
        status = pc.if_else(
            pc.is_null(t[id_col]), pa.scalar("added"),
            pc.if_else(pc.is_null(t[rid]), pa.scalar("removed"),
                       pa.scalar("changed")))
        ids = pc.coalesce(t[id_col], t[rid])
        return pa.Table.from_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
             else ids,
             status.combine_chunks() if isinstance(status, pa.ChunkedArray)
             else status], schema=schema)

    return j.map_batches(classify, batch_format="pyarrow",
                         zero_copy_batch=True)
