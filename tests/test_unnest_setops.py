"""tokenize/unnest (list explode) and EXCEPT/INTERSECT set operations,
each checked against its DuckDB twin on the sf0.001 tables."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.sources.parquet import read_table
from saber_ray.stages.setops import except_, intersect
from saber_ray.stages.unnest import tokenize, unnest

SF = "/root/testdata/sf0.001"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "events", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).df()


# ---------------------------------------------------------------------------
# unnest / tokenize
# ---------------------------------------------------------------------------

def test_tokenize_unnest_vs_duckdb(ray_session):
    docs = read_table(SF, "documents", columns=["doc_id", "text"])
    got = canon(unnest(tokenize(docs, "text", out="tok"), "tok",
                       keep=["doc_id"], out="token").to_pandas())
    want = canon(duck(
        "SELECT doc_id, unnest(string_split(text, ' ')) AS token "
        "FROM documents"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_unnest_ordinal_and_empty_null_lists(ray_session):
    t = pa.table({
        "id": [1, 2, 3, 4],
        "xs": pa.array([["a", "b"], [], None, ["c"]],
                       type=pa.list_(pa.string())),
    })
    out = unnest(rd.from_arrow(t), "xs", out="x", ordinal="pos") \
        .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True)
    # empty + NULL lists vanish (SQL UNNEST); ordinal restarts per list
    assert out["id"].tolist() == [1, 1, 4]
    assert out["x"].tolist() == ["a", "b", "c"]
    assert out["pos"].tolist() == [0, 1, 0]


def test_tokenize_regex_and_lower(ray_session):
    import ray
    t = pa.table({"text": ["Foo  Bar", None]})
    # materialize as Arrow: Ray's to_pandas can't cast ragged list<string>
    out = pa.concat_tables(ray.get(
        tokenize(rd.from_arrow(t), "text", out="tok",
                 regex=r"\s+", lower=True).to_arrow_refs()))
    toks = out["tok"].to_pylist()
    assert toks[0] == ["foo", "bar"]          # regex collapses runs
    assert toks[1] is None

    with pytest.raises(ValueError):
        tokenize(rd.from_arrow(t), "text", sep=None)

    with pytest.raises(Exception):            # non-list column rejected
        unnest(rd.from_arrow(t), "text").materialize()

    # output-name collision with a kept column must fail loudly (Arrow
    # accepts duplicate names silently; access would be ambiguous)
    t2 = pa.table({"id": [1], "xs": pa.array([["a"]],
                                             type=pa.list_(pa.string()))})
    with pytest.raises(Exception):
        unnest(rd.from_arrow(t2), "xs", out="id").materialize()


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

def _orders_halves():
    a = read_table(SF, "orders", columns=["o_custkey", "o_orderstatus"])
    b = read_table(SF, "orders", columns=["o_custkey", "o_orderstatus"]) \
        .filter(lambda r: r["o_custkey"] % 3 == 0)
    return a, b


@pytest.mark.parametrize("op,sql_op,distinct", [
    (except_, "EXCEPT", True),
    (except_, "EXCEPT ALL", False),
    (intersect, "INTERSECT", True),
    (intersect, "INTERSECT ALL", False),
])
def test_setops_vs_duckdb(ray_session, op, sql_op, distinct):
    a, b = _orders_halves()
    got = canon(op(a, b, distinct=distinct).to_pandas())
    want = canon(duck(
        "SELECT o_custkey, o_orderstatus FROM orders "
        f"{sql_op} "
        "SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 3 = 0"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_setops_null_tuples_compare_equal(ray_session):
    left = rd.from_arrow(pa.table({
        "k": pa.array([None, None, 1, 2], type=pa.int64()),
        "s": pa.array(["x", "x", None, "y"]),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([None, 2], type=pa.int64()),
        "s": pa.array(["x", "y"]),
    }))
    # SQL set ops treat NULLs as equal: (NULL,'x') is IN right
    got_e = canon(except_(left, right).to_pandas())
    assert got_e.values.tolist() == [[1.0, None]] or \
        got_e.astype(object).values.tolist() == [[1, None]]
    got_i = canon(intersect(left, right).to_pandas())
    assert len(got_i) == 2                     # (NULL,'x') and (2,'y')
    # EXCEPT ALL keeps the surplus duplicate of (NULL,'x')
    got_ea = canon(except_(left, right, distinct=False).to_pandas())
    assert len(got_ea) == 2


def test_setops_on_subset_and_empty_result(ray_session):
    a, _ = _orders_halves()
    got = except_(a, a, on=["o_custkey"]).to_pandas()
    # schema is lost on fully-empty shuffle output (documented Ray 2.49
    # quirk, setops.py module docstring) — assert emptiness only
    assert len(got) == 0


def test_setops_empty_sides(ray_session):
    """Full-row set ops tolerate empty inputs (an empty Dataset's
    schema() is None on this Ray version — regression for the
    hypothesis-found crash)."""
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.setops import except_, intersect

    t = pa.table({"k": pa.array([1, 2, 2], pa.int64()),
                  "s": pa.array(["a", "b", "b"], pa.string())})
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "s": pa.array([], pa.string())})
    full, none = rd.from_arrow(t), rd.from_arrow(empty)
    assert except_(none, full).count() == 0
    got = except_(full, none, distinct=False).to_pandas()
    assert len(got) == 3
    assert intersect(full, none).count() == 0
    assert intersect(none, none).count() == 0
