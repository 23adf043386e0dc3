"""Iterative graph algorithms over an edge Dataset: PageRank.

The reference has no graph operators; this is part of the north rule's
"beyond the reference" surface (iterative algorithms are the one named
family the round-3 inventory still lacked — every other op is a single
dataflow pass, PageRank is a driver-coordinated fixpoint LOOP of passes,
the shape Ray Data handles with a materialized edge Dataset re-scanned
per iteration from the object store).

Exact-oracle design — integer fixed-point algebra
--------------------------------------------------
Ranks are int64 in units of ``1/scale`` (default scale 10^12). One
iteration, with damping ``d = damping_num/damping_den``:

    base        = floor(scale * (den - num) / (den * n_nodes))
    contrib(u)  = floor(rank(u) * num / (den * outdeg(u)))   per out-edge
    rank'(v)    = base + sum over in-edges (u, v) of contrib(u)

Every operation is integer floor-division and integer summation —
order-independent and bit-exact — so a DuckDB twin with the iterations
UNROLLED as chained CTEs (``pagerank_sql``) reproduces the Ray result
hash-for-hash, no float tolerance anywhere. Dangling nodes (outdeg 0)
drop their mass — the simplified variant; both sides implement it
identically. floor(rank*num/(den*outdeg)) stays < 2^63 for
scale ≤ 10^15 (rank ≤ scale·iterations bounded by total mass ≤ scale).

Scale shape (100 TB edges, cites the round-1 CC design in
stages/dedup.py:105 which this generalizes):

- the edge Dataset is materialized ONCE (object-store blocks, spillable)
  and re-scanned per iteration — the unavoidable cost of an iterative
  algorithm; no per-iteration parquet re-read.
- the rank vector is O(nodes), not O(edges): nodes are factorized to a
  dense index on the driver ONCE and each iteration broadcasts ONE
  ``ray.put`` of the per-source contribution array (already divided by
  outdegree, so map tasks do a single gather + segment-sum, no division
  in the hot path). ``max_nodes`` (default 50M ≈ 400 MB int64 vector)
  guards the broadcast assumption explicitly; beyond it the rank table
  must become a partitioned Dataset joined per iteration — documented,
  not silently attempted.
- per iteration, each edge block emits ≤ distinct-dst-per-block partial
  rows (block-local combiner: factorize dst + bincount) and ONE small
  ``groupby(dst).sum`` exchange of ≤ n_nodes rows closes the round —
  edges themselves are never shuffled after the initial materialize.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _np_i64(col) -> np.ndarray:
    return col.combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)


def pagerank(edges, *, src: str = "src", dst: str = "dst",
             iterations: int = 4, damping_num: int = 85,
             damping_den: int = 100, scale: int = 10 ** 12,
             max_nodes: int = 50_000_000):
    """PageRank over the (src, dst) int edge Dataset; returns a pyarrow
    Table (node:int64, rank:int64) with rank in units of 1/scale, sorted
    by node. Exact integer algebra — see module docstring."""
    import ray

    edges = edges.materialize()

    # -- node universe + outdegrees (one pass, block-local combine) --------
    def block_deg(t: pa.Table) -> pa.Table:
        s = t[src].cast(pa.int64()).combine_chunks()
        d = t[dst].cast(pa.int64()).combine_chunks()
        su, counts = np.unique(s.to_numpy(zero_copy_only=False), return_counts=True)
        du = pc.unique(d).to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([su.astype(np.int64), du])
        deg = np.concatenate([counts.astype(np.int64), np.zeros(len(du), np.int64)])
        return pa.table({"node": node, "val": deg})

    def run_sum(t: pa.Table) -> pa.Table:
        """Sorted (node, val) rows → one summed row per node. Ray's sort
        never splits equal keys across blocks (same contract the CC
        exchange in dedup.py:105 relies on), so block-local reduceat is
        globally correct."""
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        t = t.combine_chunks()
        node = _np_i64(t["node"])
        val = _np_i64(t["val"])
        starts = np.flatnonzero(np.concatenate(([True], node[1:] != node[:-1])))
        return pa.table({"node": node[starts],
                         "val": np.add.reduceat(val, starts)})

    def _collect(ds) -> pa.Table:
        """O(n_nodes) result → one Arrow table, zero-copy per block (no
        take_all(): 50M dict rows on the driver would dwarf the ~400 MB
        int64 vectors this path is designed around)."""
        blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
        if not blocks:
            return pa.table({"node": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        return pa.concat_tables(blocks).combine_chunks()

    deg_tbl = _collect(
        edges.map_batches(block_deg, batch_format="pyarrow",
                          zero_copy_batch=True)
        .sort("node")
        .map_batches(run_sum, batch_format="pyarrow", zero_copy_batch=True))
    n_nodes = deg_tbl.num_rows
    if n_nodes == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    if n_nodes > max_nodes:
        raise ValueError(
            f"pagerank broadcast path supports <= {max_nodes} nodes "
            f"(got {n_nodes}); partition the rank table instead")
    nodes = _np_i64(deg_tbl["node"])
    outdeg = _np_i64(deg_tbl["val"])

    base = (scale * (damping_den - damping_num)) // (damping_den * n_nodes)
    ranks = np.full(n_nodes, scale // n_nodes, np.int64)
    safe_deg = np.maximum(outdeg, 1)  # dangling: contrib never read (deg 0)

    class _Contrib:
        """Per-block partial: gather each edge's precomputed source
        contribution, combine by dst in-block (factorize + bincount)."""

        def __init__(self, nodes_ref, contrib_ref):
            self.nodes = ray.get(nodes_ref)
            self.contrib = ray.get(contrib_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            s = _np_i64(t[src])
            d = _np_i64(t[dst])
            c = self.contrib[np.searchsorted(self.nodes, s)]
            uniq_d, inv = np.unique(d, return_inverse=True)
            # int64-exact segment sum (bincount would detour through float)
            acc = np.zeros(len(uniq_d), np.int64)
            np.add.at(acc, inv, c)
            return pa.table({"node": uniq_d, "val": acc})

    nodes_ref = ray.put(nodes)
    for _ in range(iterations):
        contrib = (ranks * damping_num) // (damping_den * safe_deg)
        contrib_ref = ray.put(contrib)
        parts = edges.map_batches(
            _Contrib, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=(1, 8),
            fn_constructor_args=(nodes_ref, contrib_ref))
        summed = _collect(parts.sort("node").map_batches(
            run_sum, batch_format="pyarrow", zero_copy_batch=True))
        new = np.full(n_nodes, base, np.int64)
        if summed.num_rows:
            snode = _np_i64(summed["node"])
            sval = _np_i64(summed["val"])
            new[np.searchsorted(nodes, snode)] += sval
        ranks = new

    return pa.table({"node": nodes, "rank": ranks})


def pagerank_sql(edges_sql: str, *, src: str = "src", dst: str = "dst",
                 iterations: int = 4, damping_num: int = 85,
                 damping_den: int = 100, scale: int = 10 ** 12) -> str:
    """DuckDB twin of :func:`pagerank`, iterations unrolled as chained
    CTEs — generated from the SAME parameters so the two sides cannot
    drift. ``edges_sql`` is any query producing (src, dst) columns.
    Integer floor-division throughout (// in DuckDB): bit-exact."""
    num, den = damping_num, damping_den
    cte = [f"pr_e AS (SELECT CAST({src} AS BIGINT) AS src, "
           f"CAST({dst} AS BIGINT) AS dst FROM ({edges_sql}))",
           "pr_n AS (SELECT src AS node FROM pr_e UNION SELECT dst FROM pr_e)",
           "pr_nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM pr_n)",
           "pr_deg AS (SELECT node, (SELECT COUNT(*) FROM pr_e "
           "WHERE pr_e.src = pr_n.node) AS outdeg FROM pr_n)",
           f"pr_r0 AS (SELECT node, CAST({scale} // (SELECT c FROM pr_nn) "
           "AS BIGINT) AS rank FROM pr_n)"]
    for i in range(iterations):
        cte.append(
            f"pr_r{i + 1} AS (SELECT pr_n.node, "
            f"CAST({scale} * {den - num} // ({den} * (SELECT c FROM pr_nn)) AS BIGINT)"
            f" + COALESCE((SELECT SUM(r.rank * {num} // ({den} * d.outdeg)) "
            f"FROM pr_e JOIN pr_r{i} r ON r.node = pr_e.src "
            f"JOIN pr_deg d ON d.node = pr_e.src "
            f"WHERE pr_e.dst = pr_n.node), 0) AS rank FROM pr_n)")
    return ("WITH " + ",\n".join(cte)
            + f"\nSELECT node, CAST(rank AS BIGINT) AS rank "
            f"FROM pr_r{iterations} ORDER BY node")
