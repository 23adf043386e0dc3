"""hash_split / mix_datasets vs their exact SQL twins."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.sample import (hash_split, mix_datasets, mix_sql,
                                     split_sql_case)
from tests.oracle_util import canon, to_pandas


def _docs(n=5000, seed=2, with_null=False):
    rng = np.random.default_rng(seed)
    ids = rng.integers(-10**6, 10**6, n).astype(object)
    if with_null:
        ids[rng.random(n) < 0.05] = None
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array([f"t{i}" for i in range(n)])})


@pytest.mark.parametrize("splits", [
    {"train": 0.8, "val": 0.1, "test": 0.1},      # sums to 1 → closed
    {"train": 0.5, "val": 0.2},                   # remainder → NULL label
])
def test_hash_split_matches_sql(ray_session, splits):
    t = _docs(with_null=True)
    con = duckdb.connect()
    con.register("t", t)
    case = split_sql_case("doc_id", splits, salt=7)
    want = canon(con.sql(
        f"SELECT doc_id, text, {case} AS split FROM t").df())
    for parts in (1, 6):
        got = canon(to_pandas(hash_split(
            rd.from_arrow(t).repartition(parts), "doc_id", splits, salt=7)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: proportions land near targets over 5k rows
    lab = to_pandas(hash_split(rd.from_arrow(t), "doc_id", splits, salt=7))
    frac = (lab["split"] == "train").mean()
    assert abs(frac - splits["train"]) < 0.05


def test_hash_split_disjoint_and_exhaustive(ray_session):
    t = _docs()
    got = to_pandas(hash_split(rd.from_arrow(t), "doc_id",
                               {"a": 0.6, "b": 0.4}))
    assert got["split"].notna().all()          # sums to 1 → no unassigned
    assert set(got["split"].unique()) <= {"a", "b"}


def test_mix_datasets_matches_sql(ray_session):
    a = _docs(2000, seed=4)
    b = _docs(1500, seed=5)
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)
    spec = {"wiki": ("a", 1.0), "web": ("b", 0.3)}
    want = canon(con.sql(mix_sql(spec, "doc_id", salt=3)).df())
    got = canon(to_pandas(mix_datasets(
        {"wiki": (rd.from_arrow(a).repartition(4), 1.0),
         "web": (rd.from_arrow(b).repartition(3), 0.3)},
        "doc_id", salt=3)))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["source"] == "wiki").sum() == a.num_rows   # rate 1.0 keeps all


def test_mix_sources_sampled_independently(ray_session):
    """Two sources over the SAME key universe must not sample the same
    rows (distinct derived salts)."""
    t = _docs(4000, seed=6)
    got = to_pandas(mix_datasets(
        {"x": (rd.from_arrow(t), 0.5), "y": (rd.from_arrow(t), 0.5)},
        "doc_id"))
    x = set(got.loc[got["source"] == "x", "doc_id"])
    y = set(got.loc[got["source"] == "y", "doc_id"])
    jac = len(x & y) / len(x | y)
    assert 0.15 < jac < 0.55          # ≈1/3 for independent 50% samples
