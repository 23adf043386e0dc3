"""json_extract vs DuckDB JSON-operator oracle."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.jsoncol import json_extract
from tests.oracle_util import canon, to_pandas


def test_json_extract_vs_duckdb(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "props"])
    got = canon(to_pandas(json_extract(
        ds, "props", {"k": ("k", pa.int64())})))
    want = canon(duckdb.sql(f"""
        SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
        FROM read_parquet('{sf_dir}/events.parquet')""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_json_extract_null_empty_missing(ray_session):
    t = pa.table({"id": [1, 2, 3, 4, 5],
                  "props": ['{"k": 5, "x": "a"}', None, '{}',
                            '{"k": null}', '']})
    out = to_pandas(json_extract(
        rd.from_arrow(t), "props",
        {"k": ("k", pa.int64()), "x": ("x", pa.string())})) \
        .set_index("id").sort_index()
    assert out.loc[1, "k"] == 5 and out.loc[1, "x"] == "a"
    for i in (2, 3, 4, 5):
        assert pd.isna(out.loc[i, "k"])
    assert list(out.columns) == ["k", "x"]


def test_json_extract_missing_key_everywhere(ray_session):
    t = pa.table({"id": [1, 2], "props": ['{"a": 1}', '{"a": 2}']})
    out = to_pandas(json_extract(rd.from_arrow(t), "props",
                                 {"zz": ("zz", pa.float64())}))
    assert out["zz"].isna().all()


def test_json_extract_rejects_multiline(ray_session):
    t = pa.table({"id": [1], "props": ['{\n "k": 1\n}']})
    with pytest.raises(Exception, match="newline"):
        to_pandas(json_extract(rd.from_arrow(t), "props",
                               {"k": ("k", pa.int64())}))


def test_json_extract_validation(ray_session):
    ds = rd.from_arrow(pa.table({"props": ['{"k":1}']}))
    with pytest.raises(ValueError):
        json_extract(ds, "props", {})


def test_json_extract_property_random_values(ray_session):
    """Property: for random JSON-encodable scalars (unicode strings with
    escaped newlines/quotes, ints, floats, nulls, missing keys), the
    extraction equals json.loads row-by-row."""
    import json as pyjson

    from hypothesis import given, settings, strategies as st

    # each field keeps ONE JSON type across rows (the documented
    # contract — pyarrow's reader types columns); nulls/missing mix in
    def field(typ):
        base = st.integers(min_value=-2**53, max_value=2**53) \
            if typ == "int" else st.text(max_size=20)
        return st.one_of(st.none(), base)

    types = st.tuples(st.sampled_from(["int", "text"]),
                      st.sampled_from(["int", "text"]))

    @settings(max_examples=15, deadline=None)
    @given(data=st.data(), types=types)
    def check(data, types):
        rows = data.draw(st.lists(
            st.fixed_dictionaries({}, optional={
                "k": field(types[0]), "x": field(types[1])}),
            min_size=1, max_size=30))
        props = [pyjson.dumps(r, ensure_ascii=False) for r in rows]
        t = pa.table({"id": list(range(len(rows))), "props": props})
        out = to_pandas(json_extract(
            rd.from_arrow(t), "props",
            {"k": ("k", pa.string()), "x": ("x", pa.string())},
            strict=False)).sort_values("id").reset_index(drop=True)
        for i, r in enumerate(rows):
            for f in ("k", "x"):
                want = r.get(f)
                got = out.loc[i, f]
                if want is None:
                    assert pd.isna(got)
                else:
                    assert str(want) == str(got), (r, got)

    check()


def test_json_extract_mixed_types_raise(ray_session):
    t = pa.table({"id": [1, 2], "props": ['{"k": 1}', '{"k": "s"}']})
    with pytest.raises(Exception, match="one JSON type"):
        to_pandas(json_extract(rd.from_arrow(t), "props",
                               {"k": ("k", pa.string())}))
