"""interval_join (point-in-range) vs DuckDB BETWEEN-join oracles.

The fixed band of ``windowed_join`` cannot express variable-length
intervals; this operator is the cell-replicated stabbing join
(stages/join.py:interval_join). Reference parity: Saber's ThetaJoin with
an arbitrary time predicate (cql/operators/cpu/ThetaJoin.java:15-321)
restricted to s <= t <= e per right tuple."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from saber_ray.stages.join import interval_join
from tests.oracle_util import canon, to_pandas

_DAY = 86_400_000_000


def _points(sf_dir):
    def f(t: pa.Table) -> pa.Table:
        m = (t["l_partkey"].to_numpy(zero_copy_only=False) % 101) == 0
        return t.filter(pa.array(m))
    return rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_shipdate"]) \
        .map_batches(f, batch_format="pyarrow")


def _intervals(sf_dir, mod=37):
    def f(t: pa.Table) -> pa.Table:
        m = (t["o_orderkey"].to_numpy(zero_copy_only=False) % mod) == 0
        t = t.filter(pa.array(m))
        s = t["o_orderdate"].cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"], "start": s,
                         "end": pc.add(s, 2 * _DAY),
                         "o_totalprice": t["o_totalprice"]})
    return rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(f, batch_format="pyarrow")


_ORACLE = """
 SELECT i.o_orderkey, epoch_us(p.l_shipdate) AS ts,
        epoch_us(i.o_orderdate) AS start,
        epoch_us(i.o_orderdate) + 172800000000 AS "end",
        p.l_orderkey, p.l_partkey, i.o_totalprice
 FROM (SELECT * FROM lineitem WHERE l_partkey % 101 = 0) p
 JOIN (SELECT * FROM orders WHERE o_orderkey % 37 = 0) i
 ON epoch_us(p.l_shipdate) BETWEEN epoch_us(i.o_orderdate)
    AND epoch_us(i.o_orderdate) + 172800000000
"""


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _assert_eq(res, oracle_df):
    a = canon(to_pandas(res))
    b = canon(oracle_df)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                  check_dtype=False)


def test_keyless_matches_oracle(ray_session, sf_dir):
    res = interval_join(_points(sf_dir), _intervals(sf_dir),
                        point_ts="l_shipdate")
    _assert_eq(res, _duck(sf_dir).execute(_ORACLE).df())


def test_cell_size_invariance(ray_session, sf_dir):
    """The cell is a physical partitioning knob — any positive value must
    give identical output (pairs meet in exactly one cell)."""
    base = canon(to_pandas(interval_join(
        _points(sf_dir), _intervals(sf_dir), point_ts="l_shipdate",
        cell_us=7 * _DAY)))
    for cell in (_DAY // 3, _DAY, 40 * _DAY):
        other = canon(to_pandas(interval_join(
            _points(sf_dir), _intervals(sf_dir), point_ts="l_shipdate",
            cell_us=cell)))
        pd.testing.assert_frame_equal(base, other)


def test_keyed_path(ray_session, sf_dir):
    """Equi key (hash bucket of the order key) + containment."""
    def add_kp(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False) % 3
        return t.append_column("bucket", pa.array(k, pa.int64()))

    def add_ki(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False) % 3
        return t.append_column("bucket", pa.array(k, pa.int64()))

    pts = _points(sf_dir).map_batches(add_kp, batch_format="pyarrow")
    ivs = _intervals(sf_dir, mod=11).map_batches(
        add_ki, batch_format="pyarrow")
    res = interval_join(pts, ivs, on="bucket", point_ts="l_shipdate")
    o = _duck(sf_dir).execute("""
     SELECT p.l_orderkey % 3 AS bucket, i.o_orderkey,
            epoch_us(p.l_shipdate) AS ts,
            epoch_us(i.o_orderdate) AS start,
            epoch_us(i.o_orderdate) + 172800000000 AS "end",
            p.l_orderkey, p.l_partkey, i.o_totalprice
     FROM (SELECT * FROM lineitem WHERE l_partkey % 101 = 0) p
     JOIN (SELECT * FROM orders WHERE o_orderkey % 11 = 0) i
     ON p.l_orderkey % 3 = i.o_orderkey % 3
        AND epoch_us(p.l_shipdate) BETWEEN epoch_us(i.o_orderdate)
        AND epoch_us(i.o_orderdate) + 172800000000
    """).df()
    _assert_eq(res, o)


def test_null_and_inverted_intervals_dropped(ray_session):
    pts = rd.from_arrow(pa.table({
        "ts": pa.array([5, 15, 25, None], pa.int64()),
        "pid": pa.array([1, 2, 3, 4], pa.int64())}))
    ivs = rd.from_arrow(pa.table({
        "start": pa.array([0, 20, 30, None], pa.int64()),
        "end": pa.array([10, 10, 40, 50], pa.int64()),   # 2nd inverted
        "iid": pa.array([10, 20, 30, 40], pa.int64())}))
    res = to_pandas(interval_join(pts, ivs, cell_us=10))
    got = sorted(zip(res["pid"], res["iid"]))
    assert got == [(1, 10)]  # inverted, NULL-bound, NULL-ts all excluded


def test_long_interval_replication(ray_session):
    """An interval spanning many cells still pairs each point once."""
    pts = rd.from_arrow(pa.table({
        "ts": pa.array(list(range(0, 1000, 37)), pa.int64())}))
    ivs = rd.from_arrow(pa.table({
        "start": pa.array([0], pa.int64()),
        "end": pa.array([999], pa.int64()),
        "iid": pa.array([7], pa.int64())}))
    res = to_pandas(interval_join(pts, ivs, cell_us=13))
    assert len(res) == len(range(0, 1000, 37))
    assert res["iid"].nunique() == 1
    assert sorted(res["ts"]) == list(range(0, 1000, 37))


def test_empty_sides(ray_session):
    pts = rd.from_arrow(pa.table({"ts": pa.array([], pa.int64())}))
    ivs = rd.from_arrow(pa.table({
        "start": pa.array([0], pa.int64()),
        "end": pa.array([10], pa.int64())}))
    assert to_pandas(interval_join(pts, ivs, cell_us=10)).shape[0] == 0
    pts2 = rd.from_arrow(pa.table({"ts": pa.array([5], pa.int64())}))
    ivs2 = rd.from_arrow(pa.table({
        "start": pa.array([], pa.int64()),
        "end": pa.array([], pa.int64())}))
    assert to_pandas(interval_join(pts2, ivs2)).shape[0] == 0


# ---------------------------------------------------------------------------
# interval_overlap_join (interval x interval)
# ---------------------------------------------------------------------------

from saber_ray.stages.join import interval_overlap_join  # noqa: E402


def _iv(sf_dir, mod, days, name):
    def f(t: pa.Table) -> pa.Table:
        m = (t["o_orderkey"].to_numpy(zero_copy_only=False) % mod) == 0
        t = t.filter(pa.array(m))
        s = t["o_orderdate"].cast(pa.int64())
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "bucket": pa.array(
                t["o_orderkey"].to_numpy(zero_copy_only=False) % 3,
                pa.int64()),
            "start": s, "end": pc.add(s, days * _DAY),
            "tag": pa.array([name] * t.num_rows)})
    return rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(f, batch_format="pyarrow")


def _overlap_oracle(sf_dir, key=False):
    con = _duck(sf_dir)
    keycond = " AND a.o_orderkey % 3 = b.o_orderkey % 3" if key else ""
    keysel = "a.o_orderkey % 3 AS bucket, " if key else ""
    return con.execute(f"""
WITH a AS (SELECT o_orderkey, epoch_us(o_orderdate) AS s,
           epoch_us(o_orderdate) + {3 * _DAY} AS e
           FROM orders WHERE o_orderkey % 7 = 0),
b AS (SELECT o_orderkey, epoch_us(o_orderdate) AS s,
      epoch_us(o_orderdate) + {5 * _DAY} AS e
      FROM orders WHERE o_orderkey % 11 = 0)
SELECT {keysel}a.s AS start_l, a.e AS end_l, b.s AS start_r, b.e AS end_r,
       a.o_orderkey AS o_orderkey_l, 'a' AS tag_l,
       b.o_orderkey AS o_orderkey_r, 'b' AS tag_r
FROM a JOIN b ON a.s <= b.e AND b.s <= a.e{keycond}""").df()


def test_overlap_keyless(ray_session, sf_dir):
    res = interval_overlap_join(
        _iv(sf_dir, 7, 3, "a"), _iv(sf_dir, 11, 5, "b"),
        left_cols=["o_orderkey", "tag"], right_cols=["o_orderkey", "tag"])
    got = canon(to_pandas(res))
    assert len(got) > 50        # dense enough to exercise the kernel
    _assert_eq(res, _overlap_oracle(sf_dir))


def test_overlap_keyed(ray_session, sf_dir):
    res = interval_overlap_join(
        _iv(sf_dir, 7, 3, "a"), _iv(sf_dir, 11, 5, "b"), on="bucket",
        left_cols=["o_orderkey", "tag"], right_cols=["o_orderkey", "tag"])
    _assert_eq(res, _overlap_oracle(sf_dir, key=True))


def test_overlap_cell_invariance(ray_session, sf_dir):
    base = canon(to_pandas(interval_overlap_join(
        _iv(sf_dir, 7, 3, "a"), _iv(sf_dir, 11, 5, "b"),
        left_cols=["o_orderkey"], right_cols=["o_orderkey"],
        cell_us=10 * _DAY)))
    for cell in (_DAY // 2, 2 * _DAY, 100 * _DAY):
        other = canon(to_pandas(interval_overlap_join(
            _iv(sf_dir, 7, 3, "a"), _iv(sf_dir, 11, 5, "b"),
            left_cols=["o_orderkey"], right_cols=["o_orderkey"],
            cell_us=cell)))
        pd.testing.assert_frame_equal(base, other)


# ---------------------------------------------------------------------------
# degenerate-batch hardening (ADVICE r4): all-NULL bounds / end<start /
# zero-row blocks must be dropped per the documented contract, not crash
# the tagger's offset arithmetic
# ---------------------------------------------------------------------------

def _mk_points(rows):
    return rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "pv": pa.array([r[2] for r in rows], pa.int64())}))


def _mk_iv(rows):
    return rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "start": pa.array([r[1] for r in rows], pa.int64()),
        "end": pa.array([r[2] for r in rows], pa.int64()),
        "iv": pa.array([r[3] for r in rows], pa.int64())}))


def test_interval_join_all_null_bounds(ray_session):
    pts = _mk_points([(1, 100, 7), (1, 200, 8)])
    iv = _mk_iv([(1, None, None, 1), (1, None, 50, 2), (1, 300, None, 3)])
    out = to_pandas(interval_join(pts, iv, on="k", point_ts="ts"))
    assert len(out) == 0


def test_interval_join_all_inverted_bounds(ray_session):
    pts = _mk_points([(1, 100, 7)])
    iv = _mk_iv([(1, 500, 400, 1), (1, 900, 100, 2)])
    out = to_pandas(interval_join(pts, iv, on="k", point_ts="ts"))
    assert len(out) == 0


def test_interval_join_mixed_null_bounds(ray_session):
    """NULL-bound rows drop; valid rows in the SAME input still join,
    and the auto-derived cell ignores the nulls."""
    pts = _mk_points([(1, 100, 7), (2, 100, 9)])
    iv = _mk_iv([(1, None, None, 1), (1, 50, 150, 2), (2, None, 120, 3),
                 (2, 90, 110, 4)])
    out = to_pandas(interval_join(pts, iv, on="k", point_ts="ts"))
    got = sorted(zip(out["k"], out["iv"]))
    assert got == [(1, 2), (2, 4)]


def test_overlap_join_all_null_bounds(ray_session):
    a = _mk_iv([(1, None, None, 1), (1, 10, None, 2)])
    b = _mk_iv([(1, 5, 20, 3)])
    out = to_pandas(interval_overlap_join(
        a, b, on="k", left_cols=["iv"], right_cols=["iv"]))
    assert len(out) == 0
    # symmetric: null side on the right, plus an inverted-bound left row
    a2 = _mk_iv([(1, 5, 20, 1), (1, 30, 20, 2)])
    b2 = _mk_iv([(1, None, 9, 3), (1, None, None, 4)])
    out2 = to_pandas(interval_overlap_join(
        a2, b2, on="k", left_cols=["iv"], right_cols=["iv"]))
    assert len(out2) == 0


def test_overlap_join_mixed_null_bounds(ray_session):
    a = _mk_iv([(1, 10, 30, 1), (1, None, 25, 2)])
    b = _mk_iv([(1, 20, 40, 3), (1, 90, None, 4)])
    out = to_pandas(interval_overlap_join(
        a, b, on="k", left_cols=["iv"], right_cols=["iv"]))
    assert sorted(zip(out["iv_l"], out["iv_r"])) == [(1, 3)]
