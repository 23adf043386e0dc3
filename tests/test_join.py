"""Join stage tests: broadcast hash, partitioned hash, windowed stream-stream."""

import numpy as np

from saber_ray import broadcast_join, hash_join, windowed_join
from saber_ray.core.windows import HOUR
from saber_ray.sources.parquet import read_table
from tests.oracle_util import assert_matches_oracle, canon, to_pandas


def test_broadcast_join_dim(ray_session, sf_dir):
    import pyarrow.parquet as pq
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    cust_full = read_table(sf_dir, "customer",
                           columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    out = broadcast_join(cust_full, nat, on="c_nationkey", right_on="n_nationkey")
    assert_matches_oracle(
        out,
        "SELECT c_custkey, c_nationkey, c_mktsegment, n_name "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey",
        sf_dir)


def test_hash_join_large(ray_session, sf_dir):
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                       num_partitions=8)
    from saber_ray import Window, sum_, windowed_aggregate, cnt
    import pyarrow as pa
    # plain grouped rollup of the joined stream
    agg = joined.groupby("o_orderpriority").aggregate()
    from ray.data.aggregate import Sum, Count
    agg = joined.groupby("o_orderpriority").aggregate(
        Sum("l_extendedprice", alias_name="rev_raw"), Count(alias_name="n"))
    out = agg.map_batches(
        lambda t: pa.table({"o_orderpriority": t["o_orderpriority"],
                            "revenue": np.round(t["rev_raw"].to_numpy(zero_copy_only=False), 4),
                            "n": t["n"]}),
        batch_format="pyarrow")
    assert_matches_oracle(
        out,
        "SELECT o_orderpriority, ROUND(SUM(l_extendedprice), 4) AS revenue, "
        "COUNT(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY 1",
        sf_dir, atol=1e-3)


def test_windowed_join_self(ray_session, sf_dir):
    """Purchases joined to clicks of the same user within ±6h (equi + band)."""
    ev = read_table(sf_dir, "events",
                    columns=["ts", "user_id", "event_type", "value", "event_id"])
    from saber_ray import col, selection
    purchases = selection(ev, col("event_type") == "purchase")
    clicks = selection(ev, col("event_type") == "click")
    out = windowed_join(
        purchases, clicks, on="user_id", before=6 * HOUR, after=6 * HOUR,
        left_cols=["user_id", "ts", "event_id", "value"],
        right_cols=["user_id", "ts", "event_id", "value"])
    out = out.select_columns(["user_id", "ts_l", "ts_r", "event_id_l",
                              "event_id_r", "value_l", "value_r"])
    assert_matches_oracle(
        out,
        f"SELECT p.user_id, epoch_us(p.ts) AS ts_l, epoch_us(c.ts) AS ts_r, "
        "p.event_id AS event_id_l, c.event_id AS event_id_r, "
        "p.value AS value_l, c.value AS value_r "
        "FROM events p JOIN events c ON p.user_id = c.user_id "
        "AND p.event_type = 'purchase' AND c.event_type = 'click' "
        f"AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - {6*HOUR} "
        f"AND epoch_us(p.ts) + {6*HOUR}",
        sf_dir)


def test_windowed_join_residual_theta(ray_session, sf_dir):
    """Arbitrary theta predicate on top of the band (ThetaJoin parity)."""
    ev = read_table(sf_dir, "events",
                    columns=["ts", "user_id", "event_type", "value", "event_id"])
    from saber_ray import col, selection
    purchases = selection(ev, col("event_type") == "purchase")
    clicks = selection(ev, col("event_type") == "click")
    out = windowed_join(
        purchases, clicks, on="user_id", before=6 * HOUR, after=6 * HOUR,
        left_cols=["user_id", "ts", "event_id", "value"],
        right_cols=["user_id", "ts", "event_id", "value"],
        predicate=lambda df: (df["value_l"].to_numpy() > df["value_r"].to_numpy()))
    out = out.select_columns(["user_id", "event_id_l", "event_id_r"])
    assert_matches_oracle(
        out,
        "SELECT p.user_id, p.event_id AS event_id_l, c.event_id AS event_id_r "
        "FROM events p JOIN events c ON p.user_id = c.user_id "
        "AND p.event_type = 'purchase' AND c.event_type = 'click' "
        f"AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - {6*HOUR} "
        f"AND epoch_us(p.ts) + {6*HOUR} AND p.value > c.value",
        sf_dir)


def test_keyless_theta_join(ray_session, sf_dir):
    """Pure theta join (no equi key) — the reference's ThetaJoin with a bare
    comparison predicate (ThetaJoin.java:96-272, TestThetaJoin.java:193-196),
    restricted to the time band. Exercises the band-partitioned replication
    path (each pair meets in exactly one time cell)."""
    from saber_ray import selection, col
    from saber_ray.core.windows import HOUR
    ev = read_table(sf_dir, "events",
                    columns=["ts", "event_type", "value", "event_id"])
    purchases = selection(ev, col("event_type") == "purchase")
    clicks = selection(ev, col("event_type") == "click")
    out = windowed_join(
        purchases, clicks, on=None, before=HOUR, after=HOUR,
        left_cols=["event_id", "value"], right_cols=["event_id", "value"],
        predicate=lambda t: t["value_l"].to_numpy() > t["value_r"].to_numpy())
    assert_matches_oracle(
        out.select_columns(["ts_l", "ts_r", "event_id_l", "event_id_r",
                            "value_l", "value_r"]),
        "SELECT epoch_us(p.ts) AS ts_l, epoch_us(c.ts) AS ts_r, "
        "p.event_id AS event_id_l, c.event_id AS event_id_r, "
        "p.value AS value_l, c.value AS value_r "
        "FROM events p JOIN events c ON p.event_type = 'purchase' "
        "AND c.event_type = 'click' "
        f"AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - {HOUR} "
        f"AND epoch_us(p.ts) + {HOUR} AND p.value > c.value",
        sf_dir)


def test_asof_join(ray_session, sf_dir):
    """As-of join vs DuckDB's native ASOF JOIN, plus tolerance semantics."""
    from saber_ray import selection, col
    from saber_ray.stages.join import asof_join
    from saber_ray.core.windows import DAY
    ev = read_table(sf_dir, "events",
                    columns=["ts", "user_id", "event_type", "value", "event_id"])
    purchases = selection(ev, col("event_type") == "purchase")
    clicks = selection(ev, col("event_type") == "click")
    out = asof_join(purchases, clicks, on="user_id",
                    left_cols=["event_id"], right_cols=["event_id"])
    assert_matches_oracle(
        out.select_columns(["user_id", "ts_l", "ts_r",
                            "event_id_l", "event_id_r"]),
        "SELECT p.user_id, epoch_us(p.ts) AS ts_l, epoch_us(c.ts) AS ts_r, "
        "p.event_id AS event_id_l, c.event_id AS event_id_r "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND epoch_us(p.ts) >= epoch_us(c.ts)",
        sf_dir)
    # tolerance bound: matched click must lie within the window
    tol = asof_join(purchases, clicks, on="user_id", tolerance=2 * DAY,
                    left_cols=["event_id"], right_cols=["event_id"])
    df = to_pandas(tol)
    assert ((df["ts_l"] - df["ts_r"]) <= 2 * DAY).all()
    assert ((df["ts_l"] - df["ts_r"]) >= 0).all()


def test_merge_join_all_modes(ray_session, sf_dir):
    """Engine-owned sort-merge equi join: inner/semi/anti/left_outer vs SQL,
    including NULL-key handling (null keys never match; kept for anti/outer)."""
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.join import merge_join
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    assert_matches_oracle(
        merge_join(cust, orders, on="c_custkey", right_on="o_custkey",
                   how="semi"),
        "SELECT c_custkey, c_mktsegment FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders)", sf_dir)
    from saber_ray import selection, col
    urgent = selection(orders, col("o_orderpriority") == "1-URGENT")
    assert_matches_oracle(
        merge_join(cust, urgent, on="c_custkey", right_on="o_custkey",
                   how="anti"),
        "SELECT c_custkey, c_mktsegment FROM customer "
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
        "WHERE o_orderpriority = '1-URGENT')", sf_dir)
    assert_matches_oracle(
        merge_join(cust, orders, on="c_custkey", right_on="o_custkey",
                   how="inner"),
        "SELECT c_custkey, c_mktsegment, o_orderpriority FROM customer "
        "JOIN orders ON c_custkey = o_custkey", sf_dir)
    assert_matches_oracle(
        merge_join(cust, orders, on="c_custkey", right_on="o_custkey",
                   how="left_outer"),
        "SELECT c_custkey, c_mktsegment, o_orderpriority FROM customer "
        "LEFT JOIN orders ON c_custkey = o_custkey", sf_dir)
    # NULL keys: two left rows with null key — dropped for inner/semi,
    # kept unmatched for anti/left_outer
    lt = pa.table({"k": pa.array([1, None, 2, None], pa.int64()),
                   "v": pa.array([10, 11, 12, 13], pa.int64())})
    rt = pa.table({"k": pa.array([1, 1, 3], pa.int64()),
                   "w": pa.array([100, 101, 102], pa.int64())})
    l, r = rd.from_arrow(lt).repartition(2), rd.from_arrow(rt).repartition(2)
    from tests.oracle_util import to_pandas as tp
    inner = tp(merge_join(l, r, on="k", how="inner")).sort_values("w")
    assert inner["v"].tolist() == [10, 10] and inner["w"].tolist() == [100, 101]
    semi = tp(merge_join(l, r, on="k", how="semi"))
    assert semi["v"].tolist() == [10]
    anti = tp(merge_join(l, r, on="k", how="anti")).sort_values("v")
    assert anti["v"].tolist() == [11, 12, 13]
    outer = tp(merge_join(l, r, on="k", how="left_outer")).sort_values(["v", "w"])
    assert len(outer) == 5 and outer["w"].isna().sum() == 3


def test_merge_join_outer_modes(ray_session, sf_dir):
    """right_outer / full_outer vs SQL, incl. NULL-key emission (VERDICT r2
    #5): null-key rows never match but ARE emitted by the outer side(s)."""
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.join import merge_join
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    from saber_ray import selection, col
    urgent = selection(orders, col("o_orderpriority") == "1-URGENT")
    assert_matches_oracle(
        merge_join(urgent, cust, on="o_custkey", right_on="c_custkey",
                   how="right_outer"),
        "SELECT o_custkey, o_orderpriority, c_custkey, c_mktsegment "
        "FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o "
        "RIGHT JOIN customer ON o_custkey = c_custkey", sf_dir)
    assert_matches_oracle(
        merge_join(urgent, cust, on="o_custkey", right_on="c_custkey",
                   how="full_outer"),
        "SELECT o_custkey, o_orderpriority, c_custkey, c_mktsegment "
        "FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o "
        "FULL OUTER JOIN customer ON o_custkey = c_custkey", sf_dir)
    # NULL keys on BOTH sides: never match, each emitted by its outer side
    lt = pa.table({"k": pa.array([1, None, 2], pa.int64()),
                   "v": pa.array([10, 11, 12], pa.int64())})
    rt = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                   "w": pa.array([100, 101, 102], pa.int64())})
    l, r = rd.from_arrow(lt).repartition(2), rd.from_arrow(rt).repartition(2)
    from tests.oracle_util import to_pandas as tp
    ro = tp(merge_join(l, r, on="k", how="right_outer")).sort_values("w")
    assert ro["w"].tolist() == [100, 101, 102]
    assert ro["v"].tolist()[:1] == [10] and ro["v"].isna().sum() == 2
    fo = tp(merge_join(l, r, on="k", how="full_outer"))
    assert len(fo) == 5                     # 1 match + 2 left-only + 2 right-only
    assert fo["v"].isna().sum() == 2 and fo["w"].isna().sum() == 2
    # robust to empty partitions (one side empty entirely)
    empty = rd.from_arrow(lt.slice(0, 0))
    fo2 = tp(merge_join(empty, r, on="k", how="full_outer"))
    assert len(fo2) == 3 and fo2["v"].isna().all()


def test_asof_join_tie_break_deterministic(ray_session):
    """Duplicate (key, ts) right rows: tie_break pins the pick regardless of
    block layout (review r2 finding)."""
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.join import asof_join
    lt = pa.table({"k": pa.array([1], pa.int64()),
                   "ts": pa.array([100], pa.int64()),
                   "lv": pa.array([7], pa.int64())})
    rt = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                   "ts": pa.array([50, 50, 40], pa.int64()),
                   "rid": pa.array([3, 9, 1], pa.int64())})
    for parts in (1, 2, 3):
        out = to_pandas(asof_join(
            rd.from_arrow(lt), rd.from_arrow(rt).repartition(parts),
            on="k", tie_break="rid",
            left_cols=["lv"], right_cols=["rid"]))
        assert out["rid"].tolist() == [9]     # largest tie value at ts=50


def test_windowed_join_band_partition_equivalent(ray_session, sf_dir):
    """The hot-key skew path (band_partition=True: exchange on (key, cell),
    right side replicated to candidate cells) produces EXACTLY the default
    path's pairs — SURVEY §7.4's documented assumption, now implemented."""
    from saber_ray import selection, col
    ev = read_table(sf_dir, "events",
                    columns=["ts", "user_id", "event_type", "event_id"])
    purchases = selection(ev, col("event_type") == "purchase")
    clicks = selection(ev, col("event_type") == "click")
    kw = dict(on="user_id", before=6 * HOUR, after=6 * HOUR,
              left_cols=["event_id"], right_cols=["event_id"])
    base = canon(to_pandas(windowed_join(purchases, clicks, **kw)))
    banded = canon(to_pandas(windowed_join(purchases, clicks,
                                           band_partition=True, **kw)))
    import pandas as pd
    assert len(base) > 0
    pd.testing.assert_frame_equal(base, banded)


def test_bloom_prefilter_join_equivalence(ray_session):
    """Bloom pre-filter never changes the exact join's result (zero false
    negatives), and on a selective join it removes most of the big side
    before the exchange."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd
    from saber_ray.stages.join import (bloom_prefilter, build_join_bloom,
                                       merge_join)

    rng = np.random.default_rng(5)
    n = 50_000
    big = pa.table({
        "k": pa.array(rng.integers(0, 100_000, n), pa.int64()),
        "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
    })
    keys = rng.choice(100_000, 200, replace=False)
    small = pa.table({
        "k": pa.array(keys, pa.int64()),
        "w": pa.array(np.arange(200), pa.int64()),
    })
    big_ds = rd.from_arrow(big).repartition(8)
    small_ds = rd.from_arrow(small).repartition(2)

    bloom = build_join_bloom(small_ds, "k")
    ref = ray.put(bloom)
    filtered = bloom_prefilter(big_ds, ref, "k")
    n_kept = filtered.count()
    match_rows = int(np.isin(big["k"].to_numpy(), keys).sum())
    assert n_kept >= match_rows                       # no false negatives
    assert n_kept <= match_rows + int(0.05 * n)       # selective: ≤ +5% FP

    got = merge_join(bloom_prefilter(big_ds, ref, "k"), small_ds,
                     on="k", how="inner").to_pandas()
    want = merge_join(big_ds, small_ds, on="k", how="inner").to_pandas()
    key = ["k", "v", "w"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[key],
        want.sort_values(key).reset_index(drop=True)[key])


def test_bloom_prefilter_multicol_and_nulls(ray_session):
    """Multi-column keys hash consistently on both sides; NULL-key rows
    may pass the bloom but the exact join still drops them (inner)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd
    from saber_ray.stages.join import (bloom_prefilter, build_join_bloom,
                                       merge_join)

    big = pa.table({
        "a": pa.array([1, 1, 2, None, 3], pa.int64()),
        "b": pa.array(["x", "y", "x", "x", None], pa.string()),
        "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
    })
    small = pa.table({
        "a": pa.array([1, 2], pa.int64()),
        "b": pa.array(["x", "x"], pa.string()),
        "w": pa.array([7, 8], pa.int64()),
    })
    big_ds = rd.from_arrow(big).repartition(2)
    small_ds = rd.from_arrow(small)
    ref = ray.put(build_join_bloom(small_ds, ["a", "b"]))
    got = merge_join(bloom_prefilter(big_ds, ref, ["a", "b"]), small_ds,
                     on=["a", "b"], how="inner").to_pandas()
    want = merge_join(big_ds, small_ds, on=["a", "b"],
                      how="inner").to_pandas()
    key = ["a", "b", "v", "w"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[key],
        want.sort_values(key).reset_index(drop=True)[key])
    assert set(got["v"]) == {10, 30}


def test_merge_join_prefilter_flag(ray_session):
    """merge_join(prefilter=True) equals the plain join for inner/semi
    and rejects outer/anti modes."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from saber_ray.stages.join import merge_join

    rng = np.random.default_rng(9)
    l = pa.table({"k": pa.array(rng.integers(0, 1000, 5000), pa.int64()),
                  "v": pa.array(np.arange(5000), pa.int64())})
    r = pa.table({"k": pa.array(rng.choice(1000, 50, replace=False),
                                pa.int64()),
                  "w": pa.array(np.arange(50), pa.int64())})
    lds, rds = rd.from_arrow(l).repartition(4), rd.from_arrow(r)
    for how in ("inner", "semi"):
        got = merge_join(lds, rds, on="k", how=how,
                         prefilter=True).to_pandas()
        want = merge_join(lds, rds, on="k", how=how).to_pandas()
        cols = sorted(want.columns)
        pd.testing.assert_frame_equal(
            got.sort_values(cols).reset_index(drop=True)[cols],
            want.sort_values(cols).reset_index(drop=True)[cols])
    with pytest.raises(ValueError, match="prefilter"):
        merge_join(lds, rds, on="k", how="left_outer", prefilter=True)


def test_merge_join_empty_side_schema_loss(ray_session):
    """merge_join vs sides that executed to ZERO rows: Ray drops 0-row
    blocks, so .schema() is None and the column types are gone — the
    degenerate SQL answers must still come out (hypothesis-found crash
    via corpus_diff)."""
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.join import merge_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "v": pa.array(["a", "b"], pa.string())}))
    # a 0-row dataset whose schema Ray has dropped (map_batches loses it)
    empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "w": pa.array([], pa.float64())})).map_batches(
            lambda t: t, batch_format="pyarrow")
    assert empty.schema() is None  # the Ray quirk this test pins

    def rows(ds):
        return to_pandas(ds)

    # right side empty
    for how in ("inner", "semi", "right_outer"):
        assert len(rows(merge_join(left, empty, on="k", how=how,
                                   right_cols=["w"]))) == 0
    anti = rows(merge_join(left, empty, on="k", how="anti",
                           right_cols=["w"]))
    assert sorted(anti["k"].tolist()) == [1, 2]
    lo = rows(merge_join(left, empty, on="k", how="left_outer",
                         right_cols=["w"])).sort_values("k")
    assert lo["k"].tolist() == [1, 2] and lo["w"].isna().all()
    fo = rows(merge_join(left, empty, on="k", how="full_outer",
                         right_cols=["w"])).sort_values("k")
    assert fo["k"].tolist() == [1, 2] and fo["w"].isna().all()

    # left side empty
    right = rd.from_arrow(pa.table({
        "k": pa.array([3], pa.int64()),
        "w": pa.array([0.5], pa.float64())}))
    for how in ("inner", "semi", "anti", "left_outer"):
        assert len(rows(merge_join(empty, right, on="k", how=how,
                                   right_cols=["w"]))) == 0
    for how in ("right_outer", "full_outer"):
        ro = rows(merge_join(empty, right, on="k", how=how,
                             right_cols=["w"]))
        assert ro["k"].tolist() == [3] and ro["w"].tolist() == [0.5]

    # both sides empty
    assert len(rows(merge_join(empty, empty, on="k", how="full_outer",
                               right_cols=["w"]))) == 0


def test_asof_and_windowed_join_empty_sides(ray_session):
    """asof/windowed joins (inner semantics) vs a 0-row side whose
    schema Ray dropped: empty result, no crash."""
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.stages.join import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "ts": pa.array([100], pa.int64()),
        "v": pa.array([2.0], pa.float64())}))
    empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "w": pa.array([], pa.float64())})).map_batches(
            lambda t: t, batch_format="pyarrow")
    assert empty.schema() is None

    assert len(to_pandas(asof_join(left, empty, on="k"))) == 0
    assert len(to_pandas(asof_join(empty, left, on="k"))) == 0
    assert len(to_pandas(windowed_join(
        left, empty, on="k", before=10, after=10))) == 0
    assert len(to_pandas(windowed_join(
        empty, left, on="k", before=10, after=10))) == 0


def test_merge_join_empty_both_sides_no_right_cols(ray_session):
    """Both sides schema-less + outer how + right_cols=None: empty
    result, no crash; prefilter misuse raises even on empty sides."""
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from saber_ray.stages.join import merge_join

    empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "w": pa.array([], pa.float64())})).map_batches(
            lambda t: t, batch_format="pyarrow")
    assert empty.schema() is None
    for how in ("full_outer", "right_outer", "inner", "anti"):
        assert len(to_pandas(merge_join(empty, empty, on="k",
                                        how=how))) == 0
    with pytest.raises(ValueError, match="prefilter"):
        merge_join(empty, empty, on="k", how="left_outer", prefilter=True)


def test_group_codes_null_keys_stay_distinct():
    """Regression: mixing the null code -1 into code*(max+1)+ci made
    ('A','p') and ('B',null) share group code 0. Null is one ordinary
    value per column — distinct tuples must get distinct codes."""
    import pyarrow as pa

    from saber_ray.stages.join import _group_codes
    t = pa.table({"a": ["A", "B"], "b": ["p", None]})
    c = _group_codes(t, ["a", "b"])
    assert c[0] != c[1]
    t2 = pa.table({"a": ["A", "B", "A", "B"], "b": ["p", None, "p", None]})
    c2 = _group_codes(t2, ["a", "b"])
    assert c2[0] == c2[2] and c2[1] == c2[3] and c2[0] != c2[1]
    t3 = pa.table({"a": ["A", "A", None], "b": [None, "x", "x"],
                   "c": [1, None, 1]})
    assert len(set(_group_codes(t3, ["a", "b", "c"]).tolist())) == 3
