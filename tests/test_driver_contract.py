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


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(name, ray_session, sf_dir):
    from tests.oracle_util import to_pandas
    result = to_pandas(QUERIES[name](sf_dir))
    assert len(result) > 0


def test_entry_smoke(ray_session):
    out = entry_mod.entry()
    import ray.data as rd
    assert isinstance(out, rd.Dataset)
    df = out.to_pandas()
    assert len(df) >= 0
    assert set(df.columns) == {"role", "window_id", "sum_len", "n_turns"}
