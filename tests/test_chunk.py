"""chunk_documents vs a DuckDB list-slice oracle."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.chunk import chunk_documents
from tests.oracle_util import canon, to_pandas

MAXT, OVER = 12, 4
STRIDE = MAXT - OVER

_ORACLE = r"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(COALESCE(text, ''), '\s+'),
                         w -> w <> '') AS ws
      FROM {src}),
    n AS (SELECT doc_id, ws, len(ws) AS n FROM d WHERE len(ws) > 0),
    c AS (SELECT doc_id, ws, n,
                 1 + greatest(0, CAST(ceil((n - {maxt}) / {stride}.0)
                                      AS BIGINT)) AS n_chunks
          FROM n),
    e AS (SELECT doc_id, ws, n, n_chunks,
                 unnest(range(n_chunks)) AS i FROM c)
    SELECT doc_id, i AS chunk_idx, n_chunks,
           array_to_string(ws[1 + i * {stride} :
                              i * {stride} + {maxt}], ' ') AS chunk_text,
           least({maxt}, n - i * {stride}) AS n_tokens
    FROM e"""


def _oracle(src, maxt=MAXT, stride=STRIDE):
    return canon(duckdb.sql(_ORACLE.format(
        src=src, maxt=maxt, stride=stride)).df())


def test_chunk_vs_duckdb(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    got = canon(to_pandas(chunk_documents(
        ds, max_tokens=MAXT, overlap=OVER)))
    want = _oracle(f"read_parquet('{sf_dir}/documents.parquet')")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_chunk_edges(ray_session):
    t = pa.table({  # noqa: F841
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["one two three", "", None, "   ",
                 " ".join(f"w{i}" for i in range(25))]})
    got = canon(to_pandas(chunk_documents(
        rd.from_arrow(t), max_tokens=MAXT, overlap=OVER)))
    want = _oracle("t")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # empty/null/whitespace-only docs emit no chunks
    assert set(got["doc_id"]) == {1, 5}
    # 25 tokens, max 12, stride 8 -> chunks at 0/8/16 (3, not 4): the
    # chunk starting at 16 reaches the end, no contained tail chunk
    assert int(got[got["doc_id"] == 5]["n_chunks"].iloc[0]) == 3
    # overlap: chunk1 starts 4 tokens before chunk0's end
    c5 = got[got["doc_id"] == 5].sort_values("chunk_idx")
    t0 = c5.iloc[0]["chunk_text"].split(" ")
    t1 = c5.iloc[1]["chunk_text"].split(" ")
    assert t0[-OVER:] == t1[:OVER]


def test_chunk_no_overlap_partition(ray_session):
    """overlap=0: chunks partition the token sequence exactly."""
    text = " ".join(f"w{i}" for i in range(30))
    t = pa.table({"doc_id": [1], "text": [text]})
    got = to_pandas(chunk_documents(rd.from_arrow(t), max_tokens=7)) \
        .sort_values("chunk_idx")
    joined = " ".join(got["chunk_text"])
    assert joined == text
    assert list(got["n_tokens"]) == [7, 7, 7, 7, 2]


def test_chunk_block_invariance(ray_session, sf_dir):
    outs = [canon(to_pandas(chunk_documents(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"],
                        override_num_blocks=nb),
        max_tokens=MAXT, overlap=OVER))) for nb in (1, 7)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_chunk_validation(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        chunk_documents(ds, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(ds, max_tokens=5, overlap=5)


def test_chunk_large_string_and_all_null(ray_session):
    """Regression (found by review): large_string text columns and
    all-null (null-typed) columns must work — parquet round-trips and
    polars interop produce large_string; empty corpora infer null."""
    big = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["alpha beta gamma", None],
                                     pa.large_string())})
    got = to_pandas(chunk_documents(rd.from_arrow(big), max_tokens=2))
    assert list(got["chunk_text"]) == ["alpha beta", "gamma"]
    assert str(got["chunk_text"].dtype) == "object"
    nulls = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.nulls(2, pa.null())})
    assert chunk_documents(rd.from_arrow(nulls), max_tokens=4).count() == 0


def test_chunk_property_random_text(ray_session):
    """Property: random whitespace-heavy unicode text chunks identically
    to the DuckDB oracle for random (max_tokens, overlap) — pins the
    engine/oracle tokenizer parity (RE2 \\s on both sides)."""
    from hypothesis import given, settings, strategies as st

    words = st.text(
        alphabet=st.characters(blacklist_categories=("Zs", "Zl", "Zp",
                                                     "Cc", "Cs")),
        min_size=1, max_size=6)
    ws = st.sampled_from([" ", "  ", "\t", "\n", " \t ", " "])
    doc = st.lists(st.tuples(words, ws), min_size=0, max_size=40).map(
        lambda ps: "".join(w + s for w, s in ps))

    @settings(max_examples=12, deadline=None)
    @given(docs=st.lists(doc, min_size=1, max_size=10),
           maxt=st.integers(min_value=1, max_value=9),
           data=st.data())
    def check(docs, maxt, data):
        over = data.draw(st.integers(min_value=0, max_value=maxt - 1))
        t = pa.table({"doc_id": list(range(len(docs))),
                      "text": pa.array(docs, pa.string())})
        duckdb.register("prop_docs", t)
        try:
            got = canon(to_pandas(chunk_documents(
                rd.from_arrow(t), max_tokens=maxt, overlap=over)))
            want = _oracle("prop_docs", maxt=maxt, stride=maxt - over)
        finally:
            duckdb.unregister("prop_docs")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    check()
