"""pivot (long → wide conditional aggregation) vs DuckDB FILTER twins."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.sources.parquet import read_table
from saber_ray.stages.pivot import distinct_values, pivot

SF = "/root/testdata/sf0.001"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).df()


def test_pivot_count_vs_duckdb(ray_session):
    docs = read_table(SF, "documents", columns=["source", "lang", "doc_id"])
    langs = ["en", "es", "fr", "de"]
    got = canon(pivot(docs, "source", "lang", "doc_id", agg="count",
                      values=langs, prefix="n_").to_pandas())
    want = canon(duck(
        "SELECT source, "
        + ", ".join(f"COUNT(doc_id) FILTER (WHERE lang = '{l}') AS n_{l}"
                    for l in langs)
        + " FROM documents GROUP BY source"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pivot_sum_fixed_point_vs_duckdb(ray_session):
    orders = read_table(SF, "orders",
                        columns=["o_orderpriority", "o_orderstatus",
                                 "o_totalprice"])
    sts = ["F", "O", "P"]
    got = canon(pivot(orders, "o_orderpriority", "o_orderstatus",
                      "o_totalprice", agg="sum", values=sts, scale=2,
                      round_decimals=4, prefix="tot_").to_pandas())
    want = canon(duck(
        "SELECT o_orderpriority, "
        + ", ".join(
            "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) "
            f"FILTER (WHERE o_orderstatus = '{s}') AS DOUBLE), 4) AS tot_{s}"
            for s in sts)
        + " FROM orders GROUP BY o_orderpriority"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pivot_discovers_values_and_null_pivot(ray_session):
    t = pa.table({
        "g": ["a", "a", "b", "b", "b"],
        "p": pa.array(["x", None, "x", "y", "y"]),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, None]),
    })
    ds = rd.from_arrow(t)
    assert distinct_values(ds, "p") == ["x", "y"]   # NULL never a category
    got = canon(pivot(ds, "g", "p", "v", agg="sum").to_pandas())
    want = pd.DataFrame({"g": ["a", "b"], "x": [1.0, 3.0], "y": [None, 4.0]})
    pd.testing.assert_frame_equal(got, canon(want), check_dtype=False)

    with pytest.raises(ValueError):
        pivot(ds, "g", "p", "v", agg="median")
    with pytest.raises(ValueError):
        pivot(ds, "g", "p", "v", values=[])
    with pytest.raises(ValueError):
        pivot(ds, "g", "p", "v", values=["x", "x"])
    # a category named like a group key would silently REPLACE the key
    # column with aggregate values — must fail loudly (prefix= avoids it)
    with pytest.raises(ValueError):
        pivot(ds, "g", "p", "v", values=["g", "x"])
    got = canon(pivot(ds, "g", "p", "v", values=["g", "x"],
                      prefix="c_").to_pandas())
    assert set(got.columns) == {"g", "c_g", "c_x"}


def test_unpivot_vs_duckdb(ray_session):
    """unpivot(drop_null=True) == DuckDB UNPIVOT (which drops NULL
    cells); default keeps NULL cells (melt semantics). Mixed int/float
    value columns unify to float64."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.pivot import unpivot

    t = pa.table({
        "k": pa.array(["a", "b", "c"], pa.string()),
        "x": pa.array([1, None, 3], pa.int64()),
        "y": pa.array([0.5, 2.5, None], pa.float64()),
    })
    ds = rd.from_arrow(t).repartition(2)
    got = unpivot(ds, "k", ["x", "y"], drop_null=True).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "UNPIVOT t ON x, y INTO NAME variable VALUE value").df()
    key = ["k", "variable"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True), check_dtype=False)

    kept = unpivot(ds, "k", ["x", "y"]).to_pandas()
    assert len(kept) == 6 and kept["value"].isna().sum() == 2

    # round trip: unpivot of a pivot-shaped frame preserves cell values
    import pytest
    with pytest.raises(ValueError):
        unpivot(ds, "k", [])
    with pytest.raises(ValueError):
        unpivot(ds, "k", ["x"], var_name="k")
