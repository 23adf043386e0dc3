"""resample / gap-fill vs DuckDB generate-grid oracles.

The engine's windowed aggregates (like the reference's,
Aggregation.java:920-929) emit only non-empty windows; ``resample``
densifies onto the full grid with null/zero/ffill/linear fill
(stages/resample.py)."""

import duckdb
import pandas as pd
import pytest

from saber_ray.core.aggregates import avg, cnt, max_, sum_
from saber_ray.sources.parquet import read_table
from saber_ray.stages.resample import resample
from tests.oracle_util import canon, to_pandas

HOUR = 3_600_000_000
STEP = 6 * HOUR


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    return con

_BASE = f"""
WITH t AS (SELECT user_id, epoch_us(ts)//{STEP} AS window_id, value
           FROM events),
agg AS (SELECT user_id, window_id, COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE),6)
          AS sum_value
        FROM t GROUP BY 1,2),
s AS (SELECT user_id, MIN(window_id) lo, MAX(window_id) hi
      FROM agg GROUP BY 1),
grid AS (SELECT user_id, unnest(range(lo, hi+1)) AS window_id FROM s),
j AS (SELECT g.user_id, g.window_id, a.n, a.sum_value,
      a.user_id IS NULL AS is_gap FROM grid g
      LEFT JOIN agg a ON g.user_id=a.user_id AND g.window_id=a.window_id)
"""

_AGGS = [cnt(alias="n"), sum_("value", "sum_value", scale=2)]


def _events(sf_dir):
    return read_table(sf_dir, "events", columns=["ts", "user_id", "value"])


def _assert_eq(res, oracle_df):
    a = canon(to_pandas(res))
    b = canon(oracle_df)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                  check_dtype=False)


def test_ffill_vs_oracle(ray_session, sf_dir):
    res = resample(_events(sf_dir), step=STEP, keys="user_id", aggs=_AGGS,
                   fill="ffill", round_decimals=6)
    oracle = _duck(sf_dir).execute(_BASE + """
        SELECT user_id, window_id, is_gap,
          last_value(n IGNORE NULLS) OVER w AS n,
          last_value(sum_value IGNORE NULLS) OVER w AS sum_value
        FROM j WINDOW w AS (PARTITION BY user_id ORDER BY window_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""").df()
    _assert_eq(res, oracle)


def test_null_and_zero_vs_oracle(ray_session, sf_dir):
    res = resample(_events(sf_dir), step=STEP, keys="user_id", aggs=_AGGS,
                   fill="null", round_decimals=6)
    oracle = _duck(sf_dir).execute(
        _BASE + "SELECT user_id, window_id, is_gap, n, sum_value FROM j").df()
    _assert_eq(res, oracle)

    res0 = resample(_events(sf_dir), step=STEP, keys="user_id", aggs=_AGGS,
                    fill="zero", round_decimals=6)
    oracle0 = _duck(sf_dir).execute(
        _BASE + "SELECT user_id, window_id, is_gap, COALESCE(n, 0) AS n, "
                "COALESCE(sum_value, 0.0) AS sum_value FROM j").df()
    _assert_eq(res0, oracle0)


def test_linear_vs_oracle(ray_session, sf_dir):
    res = resample(_events(sf_dir), step=STEP, keys="user_id",
                   aggs=[avg("value", "avg_value", scale=2)],
                   fill="linear", round_decimals=6)
    oracle = _duck(sf_dir).execute(f"""
WITH t AS (SELECT user_id, epoch_us(ts)//{STEP} AS window_id, value
           FROM events),
agg AS (SELECT user_id, window_id,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
              / COUNT(value), 6) AS avg_value
        FROM t GROUP BY 1,2),
s AS (SELECT user_id, MIN(window_id) lo, MAX(window_id) hi
      FROM agg GROUP BY 1),
grid AS (SELECT user_id, unnest(range(lo, hi+1)) AS window_id FROM s),
j AS (SELECT g.user_id, g.window_id, a.avg_value,
      a.user_id IS NULL AS is_gap FROM grid g
      LEFT JOIN agg a ON g.user_id=a.user_id AND g.window_id=a.window_id),
k AS (SELECT *,
  last_value(CASE WHEN is_gap THEN NULL ELSE window_id END IGNORE NULLS)
    OVER wp AS pw,
  last_value(avg_value IGNORE NULLS) OVER wp AS pv,
  first_value(CASE WHEN is_gap THEN NULL ELSE window_id END IGNORE NULLS)
    OVER wf AS nw,
  first_value(avg_value IGNORE NULLS) OVER wf AS nv
  FROM j WINDOW
  wp AS (PARTITION BY user_id ORDER BY window_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  wf AS (PARTITION BY user_id ORDER BY window_id
         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, window_id, is_gap,
  CASE WHEN NOT is_gap THEN ROUND(avg_value, 6)
       WHEN pw IS NULL OR nw IS NULL THEN NULL
       ELSE ROUND(pv + (window_id - pw) * (nv - pv) / (nw - pw), 6)
  END AS avg_value
FROM k""").df()
    _assert_eq(res, oracle)


def test_global_grid_and_range(ray_session, sf_dir):
    """keys=() global resample; explicit range_us pads every key to the
    same span (half-open)."""
    res = resample(_events(sf_dir), step=STEP, aggs=_AGGS, fill="zero",
                   round_decimals=6, emit_start=True)
    df = to_pandas(res)
    # dense global grid: consecutive window ids, starts = id * step
    wid = df["window_id"].sort_values().to_numpy()
    assert (wid[1:] - wid[:-1] == 1).all()
    assert (df["window_start_us"] == df["window_id"] * STEP).all()
    oracle = _duck(sf_dir).execute(f"""
WITH t AS (SELECT epoch_us(ts)//{STEP} AS window_id, value FROM events),
agg AS (SELECT window_id, COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE),6)
          AS sum_value FROM t GROUP BY 1),
s AS (SELECT MIN(window_id) lo, MAX(window_id) hi FROM agg),
grid AS (SELECT unnest(range(lo, hi+1)) AS window_id FROM s)
SELECT g.window_id, g.window_id * {STEP} AS window_start_us,
       a.window_id IS NULL AS is_gap,
       COALESCE(a.n, 0) AS n, COALESCE(a.sum_value, 0.0) AS sum_value
FROM grid g LEFT JOIN agg a ON g.window_id=a.window_id""").df()
    _assert_eq(res, oracle)

    lo, hi = int(wid.min() - 2) * STEP, int(wid.max() + 3) * STEP
    padded = to_pandas(resample(
        _events(sf_dir), step=STEP, keys="user_id", aggs=_AGGS,
        fill="null", round_decimals=6, range_us=(lo, hi)))
    per_key = padded.groupby("user_id")["window_id"]
    assert (per_key.min() == wid.min() - 2).all()
    assert (per_key.max() == wid.max() + 2).all()


def test_partitioning_invariance(ray_session, sf_dir):
    """Fill results are a pure function of the data — any shuffle fan-in or
    input block size must give identical rows."""
    base = canon(to_pandas(resample(
        _events(sf_dir), step=STEP, keys="user_id", aggs=_AGGS,
        fill="ffill", round_decimals=6)))
    for parts in (2, 17):
        other = canon(to_pandas(resample(
            _events(sf_dir).repartition(parts), step=STEP, keys="user_id",
            aggs=_AGGS, fill="ffill", round_decimals=6,
            shuffle_partitions=parts)))
        pd.testing.assert_frame_equal(base, other)


def test_validation(ray_session, sf_dir):
    with pytest.raises(ValueError, match="fill"):
        resample(_events(sf_dir), step=STEP, aggs=_AGGS, fill="pad")
    with pytest.raises(ValueError, match="step"):
        resample(_events(sf_dir), step=0, aggs=_AGGS)
    with pytest.raises(ValueError, match="range"):
        resample(_events(sf_dir), step=STEP, aggs=_AGGS, range_us=(5, 5))
    with pytest.raises(ValueError, match="duplicate"):
        resample(_events(sf_dir), step=STEP,
                 aggs=[cnt(alias="x"), max_("value", alias="x")])


def test_empty_input(ray_session, sf_dir):
    ds = _events(sf_dir).filter(lambda r: False)
    out = resample(ds, step=STEP, keys="user_id", aggs=_AGGS, fill="ffill")
    assert to_pandas(out).shape[0] == 0
