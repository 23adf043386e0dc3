"""PageRank: integer fixed-point iterative graph algorithm.

Checks three independent properties:
- bit-exact match vs the generated DuckDB unrolled-CTE twin
  (``pagerank_sql`` is built from the SAME parameters, so the oracle
  cannot drift from the implementation);
- convergence sanity vs a float numpy reference (the fixed-point values
  divided by scale approximate the float PageRank to ~iterations * n/scale);
- mass accounting: total rank <= scale (dangling/floor loss only shrinks).
"""

import numpy as np
import pyarrow as pa
import pytest

from tests.oracle_util import duck


def _toy_edges():
    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, 400).astype(np.int64)
    dst = rng.integers(0, 50, 400).astype(np.int64)
    keep = src != dst
    return pa.table({"src": src[keep], "dst": dst[keep]})


def _ranks_float(src, dst, iterations, d=0.85):
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s in src:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1 - d) / n)
        for s, t in zip(src, dst):
            nxt[idx[t]] += d * r[idx[s]] / out[idx[s]]
        r = nxt
    return nodes, r


@pytest.mark.parametrize("iterations", [1, 4])
def test_pagerank_vs_duckdb(ray_session, tmp_path, iterations):
    import pyarrow.parquet as pq
    import ray

    from saber_ray.stages.graph import pagerank, pagerank_sql

    edges = _toy_edges()
    p = tmp_path / "edges.parquet"
    pq.write_table(edges, p)

    got = pagerank(ray.data.read_parquet(str(p)), iterations=iterations)

    con = duck(str(tmp_path))
    sql = pagerank_sql(f"SELECT src, dst FROM read_parquet('{p}')",
                       iterations=iterations)
    want = con.sql(sql).fetch_arrow_table()
    con.close()

    assert got.num_rows == want.num_rows
    assert got["node"].to_pylist() == want["node"].to_pylist()
    assert got["rank"].to_pylist() == want["rank"].to_pylist()

    # mass conservation: floor-division and dangling nodes only LOSE mass
    total = sum(got["rank"].to_pylist())
    assert total <= 10 ** 12
    assert total > 0.5 * 10 ** 12

    # float sanity: fixed-point/scale tracks the float reference
    nodes, ref = _ranks_float(edges["src"].to_numpy(), edges["dst"].to_numpy(),
                              iterations)
    np.testing.assert_allclose(
        np.array(got["rank"].to_pylist(), dtype=float) / 1e12, ref, atol=1e-6)


def test_pagerank_empty_and_dangling(ray_session):
    import ray

    from saber_ray.stages.graph import pagerank

    empty = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
    out = pagerank(ray.data.from_arrow(empty))
    assert out.num_rows == 0

    # node 3 is a pure sink (dangling): present in output, contributes nothing
    edges = pa.table({"src": pa.array([1, 2], pa.int64()),
                      "dst": pa.array([3, 3], pa.int64())})
    out = pagerank(ray.data.from_arrow(edges), iterations=2)
    assert out["node"].to_pylist() == [1, 2, 3]
    ranks = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
    assert ranks[3] > ranks[1] == ranks[2]


def test_weighted_pagerank_vs_duckdb(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray

    from saber_ray.stages.graph import pagerank, pagerank_sql

    rng = np.random.default_rng(11)
    src = rng.integers(0, 30, 300).astype(np.int64)
    dst = rng.integers(0, 40, 300).astype(np.int64)
    w = rng.integers(1, 9, 300).astype(np.int64)
    keep = src != dst
    edges = pa.table({"src": src[keep], "dst": dst[keep], "w": w[keep]})
    p = tmp_path / "wedges.parquet"
    pq.write_table(edges, p)

    got = pagerank(ray.data.read_parquet(str(p)), weight="w", iterations=3)
    con = duck(str(tmp_path))
    want = con.sql(pagerank_sql(
        f"SELECT src, dst, w FROM read_parquet('{p}')",
        weight="w", iterations=3)).fetch_arrow_table()
    con.close()
    assert got["node"].to_pylist() == want["node"].to_pylist()
    assert got["rank"].to_pylist() == want["rank"].to_pylist()

    # weight=1 everywhere must equal the uniform variant exactly
    ones = edges.set_column(2, "w", pa.array(np.ones(edges.num_rows,
                                                     np.int64)))
    p1 = tmp_path / "ones.parquet"
    pq.write_table(ones, p1)
    uw = pagerank(ray.data.read_parquet(str(p1)), weight="w", iterations=3)
    plain = pagerank(ray.data.read_parquet(str(p1)), iterations=3)
    assert uw["rank"].to_pylist() == plain["rank"].to_pylist()


def test_degrees_vs_duckdb(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq
    import ray

    from saber_ray.stages.graph import degrees

    edges = _toy_edges()
    p = tmp_path / "edges.parquet"
    pq.write_table(edges, p)
    got = degrees(ray.data.read_parquet(str(p)))
    want = duckdb.sql(f"""
        WITH e AS (SELECT * FROM read_parquet('{p}')),
        o AS (SELECT src AS node, COUNT(*) AS out_deg FROM e GROUP BY 1),
        i AS (SELECT dst AS node, COUNT(*) AS in_deg FROM e GROUP BY 1)
        SELECT COALESCE(o.node, i.node) AS node,
               COALESCE(out_deg, 0) AS out_deg,
               COALESCE(in_deg, 0) AS in_deg
        FROM o FULL OUTER JOIN i ON o.node = i.node ORDER BY node
    """).fetch_arrow_table()
    assert got["node"].to_pylist() == want["node"].to_pylist()
    assert got["out_deg"].to_pylist() == want["out_deg"].to_pylist()
    assert got["in_deg"].to_pylist() == want["in_deg"].to_pylist()


def test_pagerank_bit_exact_high_scale(ray_session, tmp_path):
    """Integer scatter-add keeps bit-exactness where a float64-weighted
    bincount would round: scale=10^15 with a hot destination whose
    incoming partials sum near the full mass (VERDICT r4 item 3)."""
    import pyarrow.parquet as pq
    import ray

    from saber_ray.stages.graph import pagerank, pagerank_sql

    # 4000 sources all pointing at node 0 (plus a back-edge so 0 is not
    # dangling): per-destination sums ~ scale, far above 2^53/n precision
    n = 4000
    src = np.concatenate([np.arange(1, n + 1), [0]]).astype(np.int64)
    dst = np.concatenate([np.zeros(n, np.int64), [1]])
    edges = pa.table({"src": src, "dst": dst})
    p = tmp_path / "star.parquet"
    pq.write_table(edges, p)

    scale = 10 ** 15
    got = pagerank(ray.data.read_parquet(str(p)), iterations=3, scale=scale)
    con = duck(str(tmp_path))
    want = con.sql(pagerank_sql(
        f"SELECT src, dst FROM read_parquet('{p}')",
        iterations=3, scale=scale)).fetch_arrow_table()
    con.close()
    assert got["node"].to_pylist() == want["node"].to_pylist()
    assert got["rank"].to_pylist() == want["rank"].to_pylist()


def test_weighted_pagerank_precondition_guards(ray_session):
    """Documented preconditions are enforced, not silently wrapped:
    non-positive weights and scale*num*max_w >= 2^63 both raise."""
    import ray

    from saber_ray.stages.graph import pagerank

    edges = pa.table({"src": pa.array([1, 2], pa.int64()),
                      "dst": pa.array([2, 1], pa.int64()),
                      "w": pa.array([0, 3], pa.int64())})
    with pytest.raises(Exception) as ei:
        pagerank(ray.data.from_arrow(edges), weight="w", iterations=1)
    assert "positive" in str(ei.value)

    big = pa.table({"src": pa.array([1, 2], pa.int64()),
                    "dst": pa.array([2, 1], pa.int64()),
                    "w": pa.array([1, 10 ** 6], pa.int64())})
    with pytest.raises(Exception) as ei:
        pagerank(ray.data.from_arrow(big), weight="w", iterations=1,
                 scale=10 ** 14)
    assert "overflow" in str(ei.value)


def test_pagerank_partitioned_bit_identical(ray_session, tmp_path):
    """The past-the-broadcast-bound path (rank table as a partitioned
    Dataset, zero driver node state) must be BIT-identical to the
    broadcast path — uniform and weighted, with dangling nodes."""
    import pyarrow.parquet as pq
    import ray

    from saber_ray.stages.graph import pagerank, pagerank_partitioned

    rng = np.random.default_rng(5)
    src = rng.integers(0, 60, 500).astype(np.int64)
    dst = rng.integers(0, 80, 500).astype(np.int64)   # 60-79: dangling
    w = rng.integers(1, 7, 500).astype(np.int64)
    keep = src != dst
    edges = pa.table({"src": src[keep], "dst": dst[keep], "w": w[keep]})
    p = tmp_path / "pp.parquet"
    pq.write_table(edges, p)

    for kw in ({}, {"weight": "w"}):
        want = pagerank(ray.data.read_parquet(str(p)), iterations=3, **kw)
        got = pagerank_partitioned(ray.data.read_parquet(str(p)),
                                   iterations=3, nparts=5, **kw) \
            .sort("node").to_pandas()
        assert got["node"].tolist() == want["node"].to_pylist()
        assert got["rank"].tolist() == want["rank"].to_pylist()


def test_pagerank_partitioned_empty(ray_session):
    import ray

    from saber_ray.stages.graph import pagerank_partitioned
    empty = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
    out = pagerank_partitioned(ray.data.from_arrow(empty))
    assert out.count() == 0
