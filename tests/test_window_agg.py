"""Windowed aggregation parity vs DuckDB oracle + batch-size invariance.

The invariance property (same input split at ANY batch boundary ⇒ identical
window outputs) is exactly what Saber's fragment/slot-ring machinery enforces
(SURVEY.md §5); the pane-partial design makes it structural.
"""

import numpy as np
import pandas as pd
import pytest

from saber_ray import Window, avg, cnt, max_, min_, sum_, windowed_aggregate
from saber_ray.core.windows import DAY, HOUR
from saber_ray.sources.parquet import read_table, watermark_us
from saber_ray.sources.transcripts import TRANSCRIPTS_SQL, transcripts_from_events
from tests.oracle_util import assert_matches_oracle, canon, to_pandas

ALL_AGGS = [cnt(alias="n"), sum_("value", "sum_value"), avg("value", "avg_value"),
            min_("value", "min_value"), max_("value", "max_value")]
ALL_SQL = ("COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value, "
           "ROUND(AVG(value), 6) AS avg_value, ROUND(MIN(value), 6) AS min_value, "
           "ROUND(MAX(value), 6) AS max_value")


def test_tumbling_grouped_all_aggs(ray_session, sf_dir):
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = windowed_aggregate(ds, window=Window.tumbling(DAY), aggs=ALL_AGGS,
                             keys=["event_type"], round_decimals=6)
    assert_matches_oracle(
        out,
        f"SELECT event_type, epoch_us(ts) // {DAY} AS window_id, {ALL_SQL} "
        "FROM events GROUP BY 1, 2",
        sf_dir)


def test_tumbling_global(ray_session, sf_dir):
    ds = read_table(sf_dir, "events", columns=["ts", "value"])
    out = windowed_aggregate(ds, window=Window.tumbling(6 * HOUR), aggs=ALL_AGGS,
                             round_decimals=6)
    assert_matches_oracle(
        out,
        f"SELECT epoch_us(ts) // {6 * HOUR} AS window_id, {ALL_SQL} "
        "FROM events GROUP BY 1",
        sf_dir)


def _sliding_sql(size_slides: int, slide_us: int, select: str, group_extra: str = "",
                 table: str = "events", cols: str = "value"):
    offsets = ",".join(f"({i})" for i in range(size_slides))
    return (
        f"WITH t AS (SELECT epoch_us(ts) // {slide_us} AS s, * FROM {table}), "
        f"w AS (SELECT t.*, t.s - o.i AS window_id FROM t "
        f"CROSS JOIN (VALUES {offsets}) o(i) WHERE t.s - o.i >= 0) "
        f"SELECT {select} FROM w GROUP BY {group_extra}window_id")


def test_sliding_global(ray_session, sf_dir):
    ds = read_table(sf_dir, "events", columns=["ts", "value"])
    out = windowed_aggregate(ds, window=Window.sliding(4 * DAY, DAY),
                             aggs=ALL_AGGS, round_decimals=6)
    assert_matches_oracle(
        out, _sliding_sql(4, DAY, f"window_id, {ALL_SQL}"), sf_dir)


def test_sliding_grouped(ray_session, sf_dir):
    ds = read_table(sf_dir, "events", columns=["ts", "user_id", "value"])
    out = windowed_aggregate(ds, window=Window.sliding(2 * DAY, 12 * HOUR),
                             aggs=[avg("value", "avg_value"), cnt(alias="n")],
                             keys=["user_id"], round_decimals=6)
    assert_matches_oracle(
        out,
        _sliding_sql(4, 12 * HOUR,
                     "user_id, window_id, ROUND(AVG(value),6) AS avg_value, "
                     "COUNT(*) AS n", group_extra="user_id, "),
        sf_dir)


def test_sliding_noninteger_ratio(ray_session, sf_dir):
    # size/slide not integral → gcd pane path (pane=2h, 5 panes/window, 2/slide)
    ds = read_table(sf_dir, "events", columns=["ts", "value"])
    w = Window.sliding(10 * HOUR, 4 * HOUR)
    out = windowed_aggregate(ds, window=w, aggs=[cnt(alias="n")], round_decimals=6)
    # oracle: window w covers [w*4h, w*4h + 10h)
    got = canon(to_pandas(out))
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')")
    want = con.sql(
        f"WITH t AS (SELECT epoch_us(ts) AS tu FROM events), "
        f"b AS (SELECT tu // {4*HOUR} AS hi FROM t), "
        f"w AS (SELECT t.tu, g.w FROM t, LATERAL (SELECT UNNEST(range("
        f"GREATEST(0, (t.tu - {10*HOUR}) // {4*HOUR} + 1), t.tu // {4*HOUR} + 1)) AS w) g "
        f"WHERE t.tu >= g.w * {4*HOUR} AND t.tu < g.w * {4*HOUR} + {10*HOUR}) "
        f"SELECT w AS window_id, COUNT(*) AS n FROM w GROUP BY 1").df()
    con.close()
    want = canon(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_watermark_closed_only(ray_session, sf_dir):
    import os
    wm = watermark_us(os.path.join(sf_dir, "events.parquet"))
    ds = read_table(sf_dir, "events", columns=["ts", "value"])
    w = Window.sliding(4 * DAY, DAY)
    out = windowed_aggregate(ds, window=w, aggs=[cnt(alias="n")], watermark=wm)
    got = to_pandas(out)
    # every emitted window closed: end <= watermark
    assert ((got["window_id"] * DAY + 4 * DAY) <= wm).all()
    # and it is exactly the closed subset of the flush-everything run
    all_out = to_pandas(windowed_aggregate(ds, window=w, aggs=[cnt(alias="n")]))
    expect = all_out[(all_out["window_id"] * DAY + 4 * DAY) <= wm]
    pd.testing.assert_frame_equal(canon(got), canon(expect), check_dtype=False)


def test_row_window_per_key(ray_session, sf_dir):
    # count-based tumbling window of 4 turns per conversation over turn_idx
    ts = transcripts_from_events(sf_dir)
    out = windowed_aggregate(
        ts, window=Window.tumbling(4, mode="row"),
        aggs=[cnt(alias="n_turns")], keys=["conv_id"], ts_col="turn_idx")
    assert_matches_oracle(
        out,
        f"WITH transcripts AS ({TRANSCRIPTS_SQL}) "
        "SELECT conv_id, CAST(turn_idx // 4 AS BIGINT) AS window_id, "
        "COUNT(*) AS n_turns FROM transcripts GROUP BY 1, 2",
        sf_dir)


def test_batch_size_invariance(ray_session, sf_dir):
    """Same input at any batch split ⇒ identical windows (the slot-ring property)."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id", "value"])
    w = Window.sliding(3 * DAY, DAY)
    aggs = [sum_("value", "s"), cnt(alias="n"), min_("value", "mn"), max_("value", "mx")]
    outs = []
    for bs in (37, 512, None):
        out = windowed_aggregate(ds, window=w, aggs=aggs, keys=["user_id"],
                                 batch_size=bs, round_decimals=6)
        outs.append(canon(to_pandas(out)))
    pd.testing.assert_frame_equal(outs[0], outs[1], check_dtype=False)
    pd.testing.assert_frame_equal(outs[0], outs[2], check_dtype=False)


def test_merge_strategies_agree(ray_session, sf_dir):
    """sortmerge / tree / salted / shuffle all implement the same algebra."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id", "value"])
    w = Window.sliding(2 * DAY, 12 * HOUR)
    aggs = [avg("value", "a"), sum_("value", "s"), cnt(alias="n"),
            min_("value", "mn"), max_("value", "mx")]
    outs = {}
    for m in ("sortmerge", "tree", "salted", "shuffle"):
        out = windowed_aggregate(ds, window=w, aggs=aggs, keys=["user_id"],
                                 merge=m, round_decimals=6)
        outs[m] = canon(to_pandas(out))
    for m in ("tree", "salted", "shuffle"):
        pd.testing.assert_frame_equal(outs["sortmerge"], outs[m], check_dtype=False)


def test_salted_merge_hot_key(ray_session, tmp_path):
    """One pathologically hot key: salted two-stage merge = plain merge."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    n = 50_000
    rng = np.random.default_rng(7)
    key = np.where(rng.random(n) < 0.9, "hot", "k" + pd.Series(
        rng.integers(0, 50, n).astype(str)))   # 90% of rows on one key
    t = pa.table({
        "ts": pa.array(rng.integers(0, 10 * DAY, n), type=pa.timestamp("us")),
        "k": pa.array(key.astype(object), type=pa.string()),
        "value": rng.random(n),
    })
    p = str(tmp_path / "hot.parquet")
    pq.write_table(t, p)
    w = Window.sliding(2 * DAY, DAY)
    aggs = [sum_("value", "s"), cnt(alias="n")]
    plain = canon(to_pandas(windowed_aggregate(
        rd.read_parquet(p), window=w, aggs=aggs, keys=["k"],
        merge="sortmerge", round_decimals=6)))
    salted = canon(to_pandas(windowed_aggregate(
        rd.read_parquet(p), window=w, aggs=aggs, keys=["k"],
        merge="salted", salt=4, round_decimals=6)))
    pd.testing.assert_frame_equal(plain, salted, check_dtype=False)


def test_emit_start(ray_session, sf_dir):
    ds = read_table(sf_dir, "events", columns=["ts", "value"])
    out = to_pandas(windowed_aggregate(
        ds, window=Window.tumbling(DAY), aggs=[cnt(alias="n")], emit_start=True))
    assert (out["window_start_us"] == out["window_id"] * DAY).all()


def test_null_group_keys_all_strategies(ray_session, tmp_path):
    """SQL GROUP BY keeps ONE null group; every merge strategy must agree
    (pyarrow's multi-key group_by splits null keys — core/aggregates.py
    group_by_null_safe — and Ray's sort can't compare None — the
    _encode_null_keys companion encoding)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    rng = np.random.default_rng(5)
    n = 20_000
    key = np.array([None if i % 7 == 0 else f"k{i % 5}" for i in range(n)],
                   dtype=object)
    p = str(tmp_path / "nullkey.parquet")
    pq.write_table(pa.table({
        "ts": pa.array(rng.integers(0, 5 * DAY, n), type=pa.timestamp("us")),
        "k": pa.array(key, type=pa.string()),
        "v": rng.random(n)}), p)
    con = duckdb.connect()
    want = con.execute(f"""
      WITH t AS (SELECT *, epoch_us(ts) // {DAY} AS s FROM read_parquet('{p}')),
      w AS (SELECT t.*, t.s - o.i AS window_id FROM t
            CROSS JOIN (VALUES (0),(1)) o(i) WHERE t.s - o.i >= 0)
      SELECT k, window_id, COUNT(*) AS n, ROUND(SUM(v),6) AS s
      FROM w GROUP BY 1,2""").fetchdf()
    con.close()
    want = canon(want)
    for m in ("sortmerge", "tree", "salted", "shuffle"):
        got = canon(to_pandas(windowed_aggregate(
            rd.read_parquet(p), window=Window.sliding(2 * DAY, DAY),
            aggs=[cnt(alias="n"), sum_("v", "s")], keys=["k"], merge=m,
            round_decimals=6)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sliding_row_window_per_key(ray_session, sf_dir):
    """Count-based SLIDING window (size 6 rows, slide 2) per conversation
    over the turn ordinal — the reference's ROW_BASED sliding mode
    (WindowDefinition.java:5-8) keyed per stream."""
    ts = transcripts_from_events(sf_dir)
    out = windowed_aggregate(
        ts, window=Window.sliding(6, 2, mode="row"),
        aggs=[cnt(alias="n_turns")], keys=["conv_id"], ts_col="turn_idx")
    assert_matches_oracle(
        out,
        f"WITH transcripts AS ({TRANSCRIPTS_SQL}), "
        "w AS (SELECT conv_id, turn_idx, CAST(turn_idx // 2 AS BIGINT) - o.i "
        "      AS window_id FROM transcripts "
        "      CROSS JOIN (VALUES (0),(1),(2)) o(i) "
        "      WHERE CAST(turn_idx // 2 AS BIGINT) - o.i >= 0 "
        "        AND turn_idx >= (CAST(turn_idx // 2 AS BIGINT) - o.i) * 2 "
        "        AND turn_idx < (CAST(turn_idx // 2 AS BIGINT) - o.i) * 2 + 6) "
        "SELECT conv_id, window_id, COUNT(*) AS n_turns FROM w GROUP BY 1, 2",
        sf_dir)


def test_scaled_agg_partition_invariance(ray_session, sf_dir):
    """Fixed-point (scale=2) aggregation is bit-identical under ANY merge
    strategy and ANY shuffle partitioning — int64 cents make the sum exact,
    so distribution cannot perturb the last ulp (the float path is
    order-dependent there; see core/aggregates.py scale note)."""
    aggs = [cnt(alias="n"), sum_("value", "sum_value", scale=2),
            avg("value", "avg_value", scale=2),
            min_("value", "min_value", scale=2)]
    ref = None
    for merge, nparts in [("sortmerge", 2), ("sortmerge", 7), ("sortmerge", 32),
                          ("tree", 4), ("salted", 5), ("shuffle", 3)]:
        ds = read_table(sf_dir, "events", columns=["ts", "value"])
        out = windowed_aggregate(ds, window=Window.tumbling(6 * HOUR),
                                 aggs=aggs, round_decimals=6, merge=merge,
                                 shuffle_partitions=nparts)
        df = canon(to_pandas(out))
        if ref is None:
            ref = df
        else:
            pd.testing.assert_frame_equal(df, ref, check_exact=True)


def test_global_ordinal_multi_fragment(ray_session, tmp_path):
    """Ordinals from row-group prefix sums stay globally consistent across
    files AND row groups, regardless of task scheduling."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from saber_ray.sources.parquet import read_with_global_ordinal
    vals = np.arange(1000, dtype=np.int64)
    for i in range(4):                      # 4 files x 2 row groups of 125
        part = vals[i * 250:(i + 1) * 250]
        pq.write_table(pa.table({"v": part}),
                       os.path.join(tmp_path, f"f{i}.parquet"),
                       row_group_size=125)
    ds = read_with_global_ordinal(str(tmp_path))
    df = to_pandas(ds).sort_values("__ord").reset_index(drop=True)
    assert (df["__ord"].to_numpy() == np.arange(1000)).all()
    assert (df["v"].to_numpy() == vals).all()     # ordinal == file position
    # and a row window over the ordinal matches a simple partition
    out = windowed_aggregate(ds, window=Window.tumbling(100, mode="row"),
                             ts_col="__ord", aggs=[cnt(alias="n")])
    odf = to_pandas(out)
    assert len(odf) == 10 and (odf["n"] == 100).all()


def test_variance_stddev_tumbling_grouped(ray_session, sf_dir):
    """VAR/STD through the pane-partial merge algebra vs DuckDB
    var_samp/stddev_samp (tumbling grouped — partials merge per pane)."""
    from saber_ray import std_, var_
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = windowed_aggregate(
        ds, window=Window.tumbling(DAY),
        aggs=[cnt("value", "n"), var_("value", "v"), std_("value", "s")],
        keys=["event_type"], round_decimals=6)
    assert_matches_oracle(
        out,
        f"SELECT event_type, epoch_us(ts) // {DAY} AS window_id, "
        "COUNT(value) AS n, ROUND(var_samp(value), 6) AS v, "
        "ROUND(stddev_samp(value), 6) AS s FROM events GROUP BY 1, 2",
        sf_dir)


def test_variance_sliding_pane_merge(ray_session, sf_dir):
    """Sliding windows: sumsq partials must survive the pane → window
    expansion and the post-shuffle merge identically to sum/cnt."""
    from saber_ray import var_
    ds = read_table(sf_dir, "events", columns=["ts", "value"])
    out = windowed_aggregate(
        ds, window=Window.sliding(4 * DAY, DAY),
        aggs=[var_("value", "v")], round_decimals=6)
    assert_matches_oracle(
        out, _sliding_sql(4, DAY,
                          "window_id, ROUND(var_samp(value), 6) AS v"),
        sf_dir)


def test_variance_null_and_singleton_groups(ray_session):
    """var_samp semantics: NULL below 2 non-null values; exact on a
    hand-computable group; all-null group NULL."""
    import pyarrow as pa
    import ray.data as rd
    from saber_ray import var_, std_
    t = pa.table({
        "ts": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "k": ["a", "a", "a", "b", "c", "c"],
        "value": pa.array([1.0, 2.0, 3.0, 7.0, None, None]),
    })
    out = to_pandas(windowed_aggregate(
        rd.from_arrow(t), window=Window.tumbling(10**9),
        aggs=[var_("value", "v"), std_("value", "s")], keys=["k"],
        round_decimals=6)).set_index("k")
    assert abs(out.loc["a", "v"] - 1.0) < 1e-12       # var_samp({1,2,3})
    assert abs(out.loc["a", "s"] - 1.0) < 1e-12
    assert pd.isna(out.loc["b", "v"])                 # one value
    assert pd.isna(out.loc["c", "v"])                 # all NULL


def test_variance_session_windows(ray_session):
    """The session path's segment reducer computes the same moments."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd
    from saber_ray import session_windows, var_
    t = pa.table({
        "conv_id": ["x"] * 5 + ["y"] * 3,
        "ts": pa.array([0, 10, 20, 10_000_000, 10_000_010,
                        5, 15, 20_000_000], pa.int64()),
        "value": pa.array([1.0, 5.0, 9.0, 2.0, 4.0, 3.0, 3.0, 8.0]),
    })
    out = to_pandas(session_windows(
        rd.from_arrow(t), gap=1_000_000,
        aggs=[var_("value", "v")], keys=["conv_id"], round_decimals=6))
    want = duckdb.sql("""
        WITH g AS (SELECT conv_id, ts, value,
            CASE WHEN ts - LAG(ts) OVER (PARTITION BY conv_id
                ORDER BY ts) > 1000000 THEN 1 ELSE 0 END AS brk
            FROM t),
        s AS (SELECT conv_id, value,
            SUM(brk) OVER (PARTITION BY conv_id ORDER BY ts) AS sid
            FROM g)
        SELECT conv_id, sid, ROUND(var_samp(value), 6) AS v
        FROM s GROUP BY 1, 2""").df()
    got = out.sort_values(["conv_id", "session_id"])["v"].tolist()
    exp = want.sort_values(["conv_id", "sid"])["v"].tolist()
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert (pd.isna(g) and pd.isna(e)) or abs(g - e) < 1e-9


def test_skew_kurt_tumbling_grouped(ray_session, sf_dir):
    """SKEW/KURT through the pane-partial merge algebra vs DuckDB
    skewness()/kurtosis() (raw power-sum moments, merged per pane)."""
    from saber_ray import kurt_, skew_
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = windowed_aggregate(
        ds, window=Window.tumbling(DAY),
        aggs=[cnt("value", "n"), skew_("value", "sk"),
              kurt_("value", "ku")],
        keys=["event_type"], round_decimals=6)
    assert_matches_oracle(
        out,
        f"SELECT event_type, epoch_us(ts) // {DAY} AS window_id, "
        "COUNT(value) AS n, ROUND(skewness(value), 6) AS sk, "
        "ROUND(kurtosis(value), 6) AS ku FROM events GROUP BY 1, 2",
        sf_dir)


def test_skew_kurt_sliding_pane_merge(ray_session, sf_dir):
    """Sliding windows: sumcube/sumquad partials must survive the pane →
    window expansion and the post-shuffle merge identically to sumsq."""
    from saber_ray import kurt_, skew_
    ds = read_table(sf_dir, "events", columns=["ts", "value"])
    out = windowed_aggregate(
        ds, window=Window.sliding(4 * DAY, DAY),
        aggs=[skew_("value", "sk"), kurt_("value", "ku")],
        round_decimals=6)
    assert_matches_oracle(
        out, _sliding_sql(4, DAY,
                          "window_id, ROUND(skewness(value), 6) AS sk, "
                          "ROUND(kurtosis(value), 6) AS ku"),
        sf_dir)


def test_skew_kurt_small_and_constant_groups(ray_session):
    """DuckDB NULL semantics: skewness NULL below 3 values, kurtosis NULL
    below 4, both NULL on zero variance; exact on a known group."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd
    from saber_ray import kurt_, skew_
    t = pa.table({
        "ts": pa.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11], pa.int64()),
        "k": ["a"] * 5 + ["two"] * 2 + ["three"] * 3 + ["const"] * 2,
        "value": pa.array([1.0, 2.5, 3.7, 0.2, 9.1,
                           4.0, 5.0,
                           1.0, 2.0, 4.0,
                           7.7, 7.7]),
    })
    out = to_pandas(windowed_aggregate(
        rd.from_arrow(t), window=Window.tumbling(10**9),
        aggs=[skew_("value", "sk"), kurt_("value", "ku")], keys=["k"],
        round_decimals=6)).set_index("k")
    con = duckdb.connect()
    con.register("t", t)
    o = con.execute(
        "SELECT k, ROUND(skewness(value), 6) sk, "
        "ROUND(kurtosis(value), 6) ku FROM t GROUP BY k").df().set_index("k")
    for k in ("a", "two", "three", "const"):
        for c in ("sk", "ku"):
            got, want = out.loc[k, c], o.loc[k, c]
            assert (pd.isna(got) and pd.isna(want)) or got == want, \
                (k, c, got, want)
