"""Mirror of the driver's correctness gate: every queries() entry vs its
oracle_sql() on the parquet views (row count + schema + values)."""

import pytest

import __ray_entry__ as entry_mod
from tests.oracle_util import assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(name, ray_session, sf_dir):
    result = QUERIES[name](sf_dir)
    assert_matches_oracle(result, ORACLES[name], sf_dir)


def test_queries_within_driver_window():
    """The driver compares only the first 50 queries() entries; every entry
    must get a CORRECTNESS row, so the dict stays at exactly ≤50 and fully
    oracle-backed (VERDICT r2 #6). Non-SQL pipelines live in
    pytest_only_queries()."""
    assert len(QUERIES) <= 50
    assert set(ORACLES) == set(QUERIES)
    assert not set(entry_mod.pytest_only_queries()) & set(QUERIES)


@pytest.mark.parametrize("name", sorted(entry_mod.pytest_only_queries()))
def test_pytest_only_query_runs(name, ray_session, sf_dir):
    """Driver-shape check for the non-SQL pipelines (their VALUE checks —
    determinism, containment, recall — live in their own test modules)."""
    from tests.oracle_util import to_pandas
    result = to_pandas(entry_mod.pytest_only_queries()[name](sf_dir))
    assert len(result) > 0


def test_entry_smoke(ray_session):
    out = entry_mod.entry()
    import ray.data as rd
    assert isinstance(out, rd.Dataset)
    df = out.to_pandas()
    assert len(df) >= 0
    assert set(df.columns) == {"role", "window_id", "sum_len", "n_turns"}
