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

    j = merge_join(side(ds_old), side(ds_new), on=id_col, how="full_outer",
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
