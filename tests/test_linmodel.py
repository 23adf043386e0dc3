"""corr_matrix vs DuckDB corr/covar_samp; fit_linear vs numpy lstsq."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from saber_ray.stages.linmodel import corr_matrix, fit_linear, predict_linear
from tests.oracle_util import to_pandas


def test_corr_matrix_matches_duckdb(ray_session, sf_dir):
    """Every pairwise r and covariance equals DuckDB's corr/covar_samp
    over the lineitem numerics."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
    got_r = corr_matrix(ds, cols).to_pandas().set_index("column")
    got_c = corr_matrix(ds, cols, covariance=True).to_pandas() \
        .set_index("column")
    t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=cols)  # noqa
    for a in cols:
        for b in cols:
            want_r = duckdb.sql(
                f"SELECT corr({a}, {b}) FROM t").fetchone()[0]
            want_c = duckdb.sql(
                f"SELECT covar_samp({a}, {b}) FROM t").fetchone()[0]
            assert abs(got_r.loc[a, b] - want_r) < 1e-9, (a, b)
            assert abs(got_c.loc[a, b] - want_c) < 1e-6 * max(
                1.0, abs(want_c)), (a, b)


def test_corr_matrix_nulls_complete_case(ray_session):
    """Rows with a null in ANY column drop (complete-case): equals
    DuckDB corr over the null-free filtered rows."""
    t = pa.table({
        "x": pa.array([1.0, 2.0, None, 4.0, 5.0, 6.0]),
        "y": pa.array([2.0, None, 3.0, 8.0, 11.0, 11.5])})
    got = corr_matrix(rd.from_arrow(t), ["x", "y"]).to_pandas() \
        .set_index("column")
    want = duckdb.sql("""
        SELECT corr(x, y) FROM t
        WHERE x IS NOT NULL AND y IS NOT NULL""").fetchone()[0]
    assert abs(got.loc["x", "y"] - want) < 1e-12
    assert abs(got.loc["x", "x"] - 1.0) < 1e-12


def test_fit_linear_matches_numpy(ray_session, sf_dir):
    """Distributed normal-equation OLS equals driver-side lstsq on the
    gathered data — weights, intercept, and predictions."""
    feats = ["l_quantity", "l_discount", "l_tax"]
    target = "l_extendedprice"
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=feats + [target])
    model = fit_linear(ds, feats, target)
    t = pq.read_table(f"{sf_dir}/lineitem.parquet",
                      columns=feats + [target])
    X = np.column_stack([t[c].to_numpy(zero_copy_only=False)
                         for c in feats]).astype(np.float64)
    X1 = np.column_stack([X, np.ones(len(X))])
    y = t[target].to_numpy(zero_copy_only=False).astype(np.float64)
    want = np.linalg.lstsq(X1, y, rcond=None)[0]
    assert np.allclose(model["weights"], want[:-1], rtol=1e-6, atol=1e-6)
    assert abs(model["intercept"] - want[-1]) < 1e-4 * max(
        1.0, abs(want[-1]))
    assert model["n"] == len(X)

    pred = to_pandas(predict_linear(ds, model, keep=[target]))
    manual = X @ np.asarray(model["weights"]) + model["intercept"]
    # same rows, order-independent: compare sorted
    assert np.allclose(np.sort(pred["prediction"].to_numpy()),
                       np.sort(manual), rtol=1e-9, atol=1e-6)


def test_fit_linear_no_intercept_and_validation(ray_session):
    t = pa.table({"x": pa.array([1.0, 2.0, 3.0, 4.0]),
                  "y": pa.array([2.0, 4.0, 6.0, 8.0])})
    m = fit_linear(rd.from_arrow(t), ["x"], "y", intercept=False)
    assert abs(m["weights"][0] - 2.0) < 1e-12 and m["intercept"] == 0.0
    with pytest.raises(ValueError, match="at least one feature"):
        fit_linear(rd.from_arrow(t), [], "y")
    with pytest.raises(ValueError, match="at least two"):
        corr_matrix(rd.from_arrow(t), ["x"])
    const = pa.table({"x": pa.array([3.0, 3.0, 3.0]),
                      "y": pa.array([1.0, 2.0, 3.0])})
    r = corr_matrix(rd.from_arrow(const), ["x", "y"]).to_pandas() \
        .set_index("column")
    assert np.isnan(r.loc["x", "y"])        # constant column: undefined
