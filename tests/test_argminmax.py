"""ARG_MAX / ARG_MIN (SQL MAX_BY/MIN_BY) vs a deterministic DuckDB twin.

The engine's tie rule is explicit — among rows sharing the extremal order
value, return the MAX value — so the twin is the two-level
``max(v) FILTER (WHERE o = extremal(o))`` form, not DuckDB's own
scan-order-dependent arg_max. Rows with NULL in either column are ignored
(both sides filter)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from saber_ray.core.aggregates import arg_max_, arg_min_, cnt, max_
from saber_ray.core.windows import Window
from saber_ray.stages.window_agg import windowed_aggregate
from tests.oracle_util import canon, to_pandas

_ALLTIME = Window.tumbling(10**18)


def _data(n=4000, seed=11):
    rng = np.random.default_rng(seed)
    keys = np.array(["en", "es", "fr", None, "de"], dtype=object)[
        rng.integers(0, 5, n)]
    # coarse order values force plenty of ties; nulls in both columns
    o = rng.integers(0, 40, n).astype(object)
    o[rng.random(n) < 0.1] = None
    vs = np.array([f"d{i % 97}" for i in range(n)], dtype=object)
    vs[rng.random(n) < 0.1] = None
    vf = rng.normal(0, 1e3, n).round(3).astype(object)
    vf[rng.random(n) < 0.1] = None
    vi = rng.integers(-10**9, 10**9, n).astype(object)
    vi[rng.random(n) < 0.1] = None
    return pa.table({
        "k": pa.array(keys, pa.string()),
        "ts": pa.array(np.zeros(n, np.int64)),     # all-time window
        "o": pa.array(o, pa.int64()),
        "vs": pa.array(vs, pa.string()),
        "vf": pa.array(vf, pa.float64()),
        "vi": pa.array(vi, pa.int64()),
    })


_TWIN = """
WITH f AS (SELECT k, o, {v} AS v FROM t WHERE o IS NOT NULL
           AND {v} IS NOT NULL),
 m AS (SELECT k, max(o) AS mo, min(o) AS mn FROM f GROUP BY k)
SELECT COALESCE(f.k, m.k) AS k,
       max(CASE WHEN o = mo THEN v END) AS amax,
       max(CASE WHEN o = mn THEN v END) AS amin
FROM f JOIN m ON f.k IS NOT DISTINCT FROM m.k GROUP BY 1
"""


def _run(t, aggs, merge, **kw):
    out = windowed_aggregate(rd.from_arrow(t).repartition(7),
                             window=_ALLTIME, ts_col="ts", keys=["k"],
                             aggs=aggs, merge=merge, **kw)
    df = to_pandas(out)
    return canon(df.drop(columns=["window_id"]))


def test_arg_all_types_all_merges(ray_session):
    t = _data()
    con = duckdb.connect()
    con.register("t", t)
    for vcol, vtype in (("vs", "string"), ("vf", "float64"),
                        ("vi", "int64")):
        want = canon(con.sql(_TWIN.format(v=vcol) + " ORDER BY 1").df())
        aggs = [arg_max_(vcol, "o", "amax", value_type=vtype),
                arg_min_(vcol, "o", "amin", value_type=vtype)]
        for merge in ("sortmerge", "tree", "salted", "ray"):
            got = _run(t, aggs, merge)
            pd.testing.assert_frame_equal(got, want, check_dtype=False), \
                (vcol, merge)


def test_arg_timestamp_value(ray_session):
    t = _data()
    ts_v = pa.compute.cast(
        pa.compute.multiply(pa.compute.coalesce(t["vi"], pa.scalar(0)),
                            pa.scalar(0)), pa.int64())
    # timestamp value column: epoch-us derived from o so decode is checkable
    base = pa.compute.add(pa.compute.cast(t["o"], pa.int64()),
                          pa.scalar(1_600_000_000_000_000))
    t = t.append_column("vt", pa.compute.cast(base, pa.timestamp("us")))
    del ts_v
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(_TWIN.format(v="vt") + " ORDER BY 1").df())
    got = _run(t, [arg_max_("vt", "o", "amax", value_type="timestamp"),
                   arg_min_("vt", "o", "amin", value_type="timestamp")],
               "sortmerge")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_arg_sliding_window_latest_text(ray_session):
    """The canonical use: latest event payload per sliding window — runs the
    encoding through pane expansion + PaneToWindowMerge."""
    rng = np.random.default_rng(5)
    n = 3000
    t = pa.table({
        "k": pa.array(np.array(["a", "b", "c"], dtype=object)[
            rng.integers(0, 3, n)], pa.string()),
        "ts": pa.array(rng.integers(0, 10_000, n), pa.int64()),
        "txt": pa.array([f"m{i}" for i in range(n)], pa.string()),
    })
    size, slide = 400, 100
    con = duckdb.connect()
    con.register("t", t)
    want = canon(con.sql(f"""
        WITH s AS (SELECT *, ts // {slide} AS __s FROM t),
         w AS (SELECT s.*, s.__s - o.i AS wid FROM s
               CROSS JOIN (VALUES (0),(1),(2),(3)) o(i)
               WHERE s.__s - o.i >= 0),
         m AS (SELECT k, wid, max(ts) AS mo FROM w GROUP BY 1, 2)
        SELECT w.k, w.wid AS window_id, count(*) AS n,
               max(CASE WHEN ts = mo THEN txt END) AS latest
        FROM w JOIN m ON w.k = m.k AND w.wid = m.wid GROUP BY 1, 2
        ORDER BY 1, 2""").df())
    for merge in ("sortmerge", "salted"):
        out = windowed_aggregate(
            rd.from_arrow(t).repartition(6),
            window=Window.sliding(size, slide), ts_col="ts", keys=["k"],
            aggs=[cnt(alias="n"),
                  arg_max_("txt", "ts", "latest", value_type="string")],
            merge=merge)
        got = canon(to_pandas(out))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_arg_group_all_null_order_yields_null(ray_session):
    t = pa.table({"k": pa.array(["a", "a", "b", "b"]),
                  "ts": pa.array([0, 0, 0, 0], pa.int64()),
                  "o": pa.array([None, None, 3, 7], pa.int64()),
                  "v": pa.array(["x", "y", "p", "q"])})
    out = windowed_aggregate(rd.from_arrow(t), window=_ALLTIME, ts_col="ts",
                             keys=["k"],
                             aggs=[arg_max_("v", "o", "am",
                                            value_type="string"),
                                   max_("o", "mo")], merge="sortmerge")
    got = to_pandas(out).sort_values("k").reset_index(drop=True)
    assert got.loc[0, "k"] == "a" and pd.isna(got.loc[0, "am"])
    assert got.loc[1, "am"] == "q"


def test_arg_extreme_numeric_exactness(ray_session):
    """int64 beyond 2^53 and float64 denormals/negatives round-trip the
    encoding bit-exactly (asserted through Arrow, not pandas — see the
    int64+null pandas corruption note in BASELINE.md)."""
    big = [2**62 + 3, -(2**62 + 7), 2**53 + 1, -1, 0]
    t = pa.table({"k": pa.array(["g"] * 5), "ts": pa.array([0] * 5, pa.int64()),
                  "o": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "vi": pa.array(big, pa.int64()),
                  "vf": pa.array([5e-324, -5e-324, -0.0, 1e308, -1e308],
                                 pa.float64())})
    out = windowed_aggregate(
        rd.from_arrow(t), window=_ALLTIME, ts_col="ts", keys=["k"],
        aggs=[arg_max_("vi", "o", "ami", value_type="int64"),
              arg_min_("vi", "o", "ani", value_type="int64"),
              arg_max_("vf", "o", "amf", value_type="float64"),
              arg_min_("vf", "o", "anf", value_type="float64")],
        merge="tree")
    tbl = pa.concat_tables(ray_batches(out))
    row = {c: tbl[c][0].as_py() for c in tbl.column_names}
    assert row["ami"] == 0 and row["ani"] == big[0]
    assert row["amf"] == -1e308 and row["anf"] == 5e-324


def ray_batches(ds):
    return list(ds.iter_batches(batch_format="pyarrow"))


def test_arg_streaming_matches_batch(ray_session, tmp_path):
    """Streaming engine with arg aggs (string partials through the epoch
    checkpoint) == batch engine on the same stream + kill/resume parity."""
    import pyarrow.parquet as pq

    from saber_ray.core.windows import HOUR
    from saber_ray.streaming import StreamingWindowedAggregate

    rng = np.random.default_rng(3)
    n = 2400
    t = pa.table({
        "k": pa.array(np.array(["a", "b"], dtype=object)[
            rng.integers(0, 2, n)], pa.string()),
        "ts": pa.array(np.sort(rng.integers(0, 48 * HOUR, n)), pa.int64()),
        "txt": pa.array([f"m{i}" for i in range(n)], pa.string()),
    })
    files = []
    for i in range(8):
        part = t.slice(i * n // 8, n // 8)
        p = str(tmp_path / f"f{i}.parquet")
        pq.write_table(part, p)
        files.append(p)
    w = Window.sliding(4 * HOUR, HOUR)
    aggs = [cnt(alias="n"),
            arg_max_("txt", "ts", "latest", value_type="string"),
            arg_min_("txt", "ts", "earliest", value_type="string")]
    job = StreamingWindowedAggregate(str(tmp_path / "out"), window=w,
                                     aggs=aggs, keys=["k"],
                                     num_partitions=2)
    job.run(files[:4], epoch_size=2, end_of_stream=False)
    job2 = StreamingWindowedAggregate(str(tmp_path / "out"), window=w,
                                      aggs=aggs, keys=["k"],
                                      num_partitions=2)
    job2.run(files, epoch_size=2)
    got = canon(job2.results().to_pandas())
    out = windowed_aggregate(rd.from_arrow(t), window=w, ts_col="ts",
                             keys=["k"], aggs=aggs)
    want = canon(to_pandas(out))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
