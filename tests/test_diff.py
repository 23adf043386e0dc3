"""corpus_diff vs a DuckDB full-outer md5 oracle."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from saber_ray.stages.diff import corpus_diff
from tests.oracle_util import canon, to_pandas


def _versions(sf_dir):
    """Deterministic snapshot pair from the documents table: B drops
    doc_id % 7 == 0, rewrites text for doc_id % 5 == 0, and adds new ids
    (doc_id + 10**7 for doc_id % 11 == 0)."""
    base = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def _mod(arr, m):
        return pc.subtract(arr, pc.multiply(
            pc.divide(arr, pa.scalar(m, pa.int64())),
            pa.scalar(m, pa.int64())))

    def to_b(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        kept = t.filter(pc.not_equal(_mod(ids, 7), 0))
        mod5 = pc.equal(_mod(kept["doc_id"], 5), 0)
        text = pc.if_else(mod5, pc.binary_join_element_wise(
            kept["text"], pa.scalar("EDITED"), " "), kept["text"])
        kept = kept.set_column(kept.schema.get_field_index("text"),
                               "text", text)
        added = t.filter(pc.equal(_mod(ids, 11), 0))
        added = added.set_column(
            added.schema.get_field_index("doc_id"), "doc_id",
            pc.add(added["doc_id"], 10**7))
        return pa.concat_tables([kept, added])

    return base, base.map_batches(to_b, batch_format="pyarrow")


_ORACLE = """
    WITH a AS (SELECT doc_id, md5(text) AS h
               FROM read_parquet('{p}')),
    b_kept AS (SELECT doc_id,
                      md5(CASE WHEN doc_id % 5 = 0
                          THEN text || ' EDITED' ELSE text END) AS h
               FROM read_parquet('{p}') WHERE doc_id % 7 <> 0),
    b AS (SELECT * FROM b_kept UNION ALL
          SELECT doc_id + 10000000, md5(text)
          FROM read_parquet('{p}') WHERE doc_id % 11 = 0)
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.h <> b.h"""


def test_corpus_diff_vs_duckdb(ray_session, sf_dir):
    a, b = _versions(sf_dir)
    got = canon(to_pandas(corpus_diff(a, b)))
    want = canon(duckdb.sql(
        _ORACLE.format(p=f"{sf_dir}/documents.parquet")).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got["status"]) == {"added", "removed", "changed"}


def test_corpus_diff_identical_is_empty(ray_session, sf_dir):
    a = rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    assert corpus_diff(a, a).count() == 0


def test_corpus_diff_property_random_edits(ray_session):
    """Property: for random add/remove/edit sets over a synthetic corpus,
    corpus_diff equals the full-outer md5 oracle."""
    import duckdb as dk
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(data=st.data())
    def check(data):
        n = data.draw(st.integers(min_value=1, max_value=40))
        texts = [f"doc {i} body" for i in range(n)]
        removed = data.draw(st.sets(
            st.integers(min_value=0, max_value=n - 1), max_size=n))
        edited = data.draw(st.sets(
            st.integers(min_value=0, max_value=n - 1), max_size=n))
        added = data.draw(st.sets(
            st.integers(min_value=n, max_value=n + 10), max_size=5))
        a = pa.table({"doc_id": list(range(n)),
                      "text": pa.array(texts, pa.string())})
        b_ids, b_txt = [], []
        for i in range(n):
            if i in removed:
                continue
            b_ids.append(i)
            b_txt.append(texts[i] + " EDITED" if i in edited else texts[i])
        for i in sorted(added):
            b_ids.append(i)
            b_txt.append(f"new {i}")
        b = pa.table({"doc_id": b_ids,
                      "text": pa.array(b_txt, pa.string())})
        got = canon(to_pandas(corpus_diff(
            rd.from_arrow(a), rd.from_arrow(b))))
        dk.register("pa_", a)
        dk.register("pb_", b)
        try:
            want = canon(dk.sql("""
                WITH x AS (SELECT doc_id, md5(text) h FROM pa_),
                y AS (SELECT doc_id, md5(text) h FROM pb_)
                SELECT COALESCE(x.doc_id, y.doc_id) AS doc_id,
                       CASE WHEN x.doc_id IS NULL THEN 'added'
                            WHEN y.doc_id IS NULL THEN 'removed'
                            ELSE 'changed' END AS status
                FROM x FULL OUTER JOIN y ON x.doc_id = y.doc_id
                WHERE x.doc_id IS NULL OR y.doc_id IS NULL
                   OR x.h <> y.h""").df())
        finally:
            dk.unregister("pa_")
            dk.unregister("pb_")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    check()


def test_corpus_diff_empty_sides(ray_session):
    """Pinned regressions for 0-row corpus versions (hypothesis-found):
    Ray drops 0-row blocks (schema() = None) and a plain-[] empty table
    types its id column null — both must still classify correctly."""
    docs = pa.table({"doc_id": [0, 1],
                     "text": pa.array(["alpha", "beta"], pa.string())})
    # null-typed empty, exactly as `pa.table({"doc_id": []})` builds it
    empty = pa.table({"doc_id": pa.array([], pa.null()),
                      "text": pa.array([], pa.string())})

    got = canon(to_pandas(corpus_diff(rd.from_arrow(docs),
                                      rd.from_arrow(empty))))
    assert got["status"].tolist() == ["removed", "removed"]
    assert sorted(got["doc_id"].tolist()) == [0, 1]

    got = canon(to_pandas(corpus_diff(rd.from_arrow(empty),
                                      rd.from_arrow(docs))))
    assert got["status"].tolist() == ["added", "added"]
    assert sorted(got["doc_id"].tolist()) == [0, 1]

    got = to_pandas(corpus_diff(rd.from_arrow(empty), rd.from_arrow(empty)))
    assert len(got) == 0
