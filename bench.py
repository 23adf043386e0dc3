#!/usr/bin/env python
"""Benchmark harness: the headline CM1/CM2 + SG1-SG3 + YSB suite over a
deterministic synthetic transcript stream (BASELINE.json input_hint shape).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "n_turns": ..., "turns_per_sec": ...}

Default mode runs the 6 queries CONCURRENTLY (the reference's own
multi-query deployment model — scheduling workloads W1/W2, SURVEY.md §3.3);
SABER_BENCH_SEQUENTIAL=1 times each query alone.

--scaling: runs the same bench in two fresh taskset-pinned processes
(worker cores N vs 4N, default 6 vs 24, + 2 control-plane cores each,
sequential, same cached input) and prints one JSON line with both
throughputs and the scaling efficiency — the sandbox evidence for the north
rule's N-vs-4N-nodes criterion (see run_scaling comments for why pinning
and the +2 control-plane cores make this faithful to node scaling).

Environment:
  GRAFT_SF_DIR        sf dir (default /root/testdata/sf0.1) — reported, and
                      sets the synthetic size tier
  RAY_GRAFT_CPUS      num_cpus for ray.init (default 32)
  SABER_BENCH_TURNS   override synthetic turn count
  SABER_BENCH_SEQUENTIAL=1   time queries one at a time
  --curation          curation-stage throughput over synthetic documents
                      (SABER_BENCH_DOCS overrides the corpus size)
  --text              retrieval/LM ops throughput (inverted index, BM25,
                      LM train, perplexity, bigram vocabulary)
  --relational        interval joins / resample / normalize / winsorize
                      throughput over the real sf tables
  --dedup             near-dup family throughput (minhash signatures,
                      LSH candidate pairs, LSH clusters, simhash)
  --multimodal        codec throughput: decode+feature / resize / log-mel
                      over a PPM+PNG+JPEG+GIF+WAV+raw-video corpus
                      (SABER_BENCH_MEDIA overrides the item count)
  --sources           text-source read throughput: csv/jsonl, plain vs
                      .gz shards, ± global ordinal
                      (SABER_BENCH_LINES overrides the row count)
  --streaming         sustained micro-batch load on the streaming engines:
                      >= 20 epochs each of windowed aggregate + band join
                      + CEP + quantile view, sustained rows/s + p50/p95
                      per-epoch emit latency
                      (SABER_STREAM_FILES overrides the file count)
  RAY_GRAFT_SCALE_LO / _HI   scaling pair (default 6 / 24)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

_TURNS_BY_SF = {"sf0.001": 40_000, "sf0.01": 400_000, "sf0.1": 4_000_000}


def _n_turns() -> int:
    if "SABER_BENCH_TURNS" in os.environ:
        return int(os.environ["SABER_BENCH_TURNS"])
    tier = os.path.basename(os.path.normpath(SF_DIR))
    return _TURNS_BY_SF.get(tier, 4_000_000)


def run_suite() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from saber_ray.pipelines import suite
    from saber_ray.sources.transcripts import generate_transcripts, read_transcripts

    n_turns = _n_turns()
    data_dir = os.path.join("/tmp/saber_ray_bench", f"transcripts-{n_turns}")
    # fixed file count: the num_cpus=8 and =32 runs must read IDENTICAL input
    generate_transcripts(data_dir, n_turns=n_turns, n_files=64)

    # block granularity: ~2 blocks per core, but never blocks above ~750k
    # rows — at low core counts cpu-proportional sizing would create 4M-row
    # mega-blocks whose task granularity (and memory) differs from the high
    # level, distorting the scaling comparison.
    nblocks = max(2 * NUM_CPUS, n_turns // 750_000)

    def src(*cols):
        # column-pruned read: only the columns a query touches leave storage
        return read_transcripts(data_dir, columns=list(cols),
                                override_num_blocks=nblocks)

    # untimed warmup: spin up the Ray worker pool, warm the page cache for
    # EVERY column the suite touches (disk IO is a shared fixed cost that
    # would otherwise distort the CPU-scaling comparison), and exercise the
    # shuffle path once — so the timed pass measures SUSTAINED throughput
    # (the baseline metric), not first-query startup latency.
    src("conv_id", "turn_idx", "role", "text", "tool", "ts").map_batches(
        lambda b: b.select(["turn_idx"]), batch_format="pyarrow").count()
    suite.sg2(src("conv_id", "ts", "text")).count()

    pipelines = {
        "cm1": lambda: suite.cm1(src("role", "ts", "text")),
        "cm2": lambda: suite.cm2(src("tool", "ts", "text")),
        "sg1": lambda: suite.sg1(src("ts", "text")),
        "sg2": lambda: suite.sg2(src("conv_id", "ts", "text")),
        "sg3": lambda: suite.sg3(src("conv_id", "ts", "text")),
        "ysb": lambda: suite.ysb(src("role", "tool", "ts")),
    }
    sequential = os.environ.get("SABER_BENCH_SEQUENTIAL", "") == "1"

    def timed_pass() -> tuple[float, dict]:
        per_query = {}
        if sequential:
            total = 0.0
            for name, build in pipelines.items():
                t0 = time.monotonic()
                out = build()
                n_rows = out.count() if hasattr(out, "count") else len(out)
                dt = time.monotonic() - t0
                per_query[name] = round(dt, 3)
                total += dt
                sys.stderr.write(f"[bench] {name}: {dt:.2f}s → {n_rows} rows\n")
            return total, per_query
        # concurrent multi-query execution — the reference's own deployment
        # model (concurrent queries over shared input, scheduling workloads
        # W1/W2, SURVEY.md §3.3): one query's shuffle barrier overlaps
        # another's scan, which is what "sustained" throughput means for a
        # streaming engine serving a query suite. Per-query values are
        # completion times from the common start.
        from concurrent.futures import ThreadPoolExecutor
        t0 = time.monotonic()

        def one(item):
            name, build = item
            out = build()
            n_rows = out.count() if hasattr(out, "count") else len(out)
            dt = time.monotonic() - t0
            sys.stderr.write(f"[bench] {name}: done at {dt:.2f}s → {n_rows} rows\n")
            return name, round(dt, 3)

        with ThreadPoolExecutor(max_workers=len(pipelines)) as ex:
            for name, dt in ex.map(one, pipelines.items()):
                per_query[name] = dt
        return time.monotonic() - t0, per_query

    # this shared VM sees bursts of host contention (1-2% steal inflates a
    # 3s suite to 5-7s run-to-run); repeats damp that: report the BEST pass
    # (closest to the machine's actual capability) and every pass for honesty
    repeats = int(os.environ.get("SABER_BENCH_REPEATS", "3"))
    runs = [timed_pass() for _ in range(repeats)]
    total, per_query = min(runs, key=lambda r: r[0])
    ray.shutdown()
    tps = n_turns * len(pipelines) / total
    return {
        "metric": "saber_ray CM/SG/YSB suite wall time over synthetic transcripts",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "all_runs_sec": [round(t, 3) for t, _ in runs],
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "turns_per_sec": round(tps),
    }


def run_skew() -> dict:
    """--skew: evidence that the explicit skew paths WIN on skewed data
    (VERDICT r2 #8). Builds a transcript stream where ONE conv_id owns ~50%
    of all rows, then times, best-of-N:

    - grouped windowed aggregation keyed by the skewed conv_id with a FINE
      slide (4 h window / 1 min slide), ``merge="sortmerge"`` (hot key's
      pane partials + window expansion → one reducer) vs ``merge="salted"``
      (block-partials spread over `salt` round-1 reducers);
    - windowed self-join on the skewed key (±1 min band), plain key
      partitioning vs ``band_partition=True`` ((key, time-cell) cells).

    Regime note (measured honestly): with COARSE windows the pane-partial
    combiner already neutralizes agg skew pre-shuffle — sortmerge wins and
    salted's second exchange is pure overhead. Skew only bites when partials
    stop compressing (fine slide ⇒ pane ≈ row granularity), which is the
    adversarial case benchmarked here. Row counts are asserted identical
    across variants — same answer, faster under skew."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from saber_ray import Window, cnt, sum_
    from saber_ray.core.windows import DAY, HOUR
    from saber_ray.sources.transcripts import generate_transcripts
    from saber_ray.stages.join import windowed_join
    from saber_ray.stages.window_agg import windowed_aggregate

    # the agg straggler needs enough rows that one reducer's excess work
    # dominates shuffle overhead; the join's pair count grows ~n² on the hot
    # key, so it runs on a smaller stream
    agg_turns = int(os.environ.get("SABER_SKEW_TURNS",
                                   str(min(_n_turns(), 4_000_000))))
    join_turns = min(agg_turns, 1_000_000)
    hot_frac = float(os.environ.get("SABER_SKEW_HOT", "0.5"))

    def remap(b: pa.Table) -> pa.Table:
        import pandas as pd
        h = pd.util.hash_array(
            b["conv_id"].to_pandas().to_numpy(dtype=object))
        hot = (h % 1000) < int(hot_frac * 1000)
        conv = pc.if_else(pa.array(hot), pa.scalar("HOT-CONV"),
                          b["conv_id"].combine_chunks())
        return b.set_column(b.column_names.index("conv_id"), "conv_id", conv) \
                .combine_chunks()

    def make_skewed(n: int) -> str:
        base_dir = os.path.join("/tmp/saber_ray_bench", f"transcripts-{n}")
        generate_transcripts(base_dir, n_turns=n, n_files=64)
        skew_dir = os.path.join("/tmp/saber_ray_bench", f"skew-{n}-h{hot_frac}")
        manifest = os.path.join(skew_dir, "_MANIFEST")
        tag = f"turns={n} hot={hot_frac} v1"
        if not (os.path.exists(manifest) and open(manifest).read() == tag):
            rd.read_parquet(base_dir).map_batches(
                remap, batch_format="pyarrow").write_parquet(skew_dir)
            with open(manifest, "w") as f:
                f.write(tag)
        return skew_dir

    agg_dir, join_dir = make_skewed(agg_turns), make_skewed(join_turns)

    def src_from(d, n, *cols):
        return rd.read_parquet(d, columns=list(cols),
                               override_num_blocks=max(2 * NUM_CPUS,
                                                       n // 750_000))

    def src(*cols):
        return src_from(agg_dir, agg_turns, *cols)

    def jsrc(*cols):
        return src_from(join_dir, join_turns, *cols)

    from saber_ray.core.windows import MINUTE
    w = Window.sliding(4 * HOUR, MINUTE)       # fine slide: partials ≈ rows
    aggs = [sum_("turn_idx", "sum_v"), cnt(alias="n")]
    variants = {
        "agg_sortmerge": lambda: windowed_aggregate(
            src("conv_id", "ts", "turn_idx"), window=w, aggs=aggs,
            keys=["conv_id"], merge="sortmerge"),
        "agg_salted": lambda: windowed_aggregate(
            src("conv_id", "ts", "turn_idx"), window=w, aggs=aggs,
            keys=["conv_id"], merge="salted"),
        "join_plain": lambda: windowed_join(
            jsrc("conv_id", "ts"), jsrc("conv_id", "ts"), on="conv_id",
            before=MINUTE, after=MINUTE, band_partition=False),
        "join_band": lambda: windowed_join(
            jsrc("conv_id", "ts"), jsrc("conv_id", "ts"), on="conv_id",
            before=MINUTE, after=MINUTE, band_partition=True),
    }
    src("conv_id", "ts", "turn_idx").count()        # warm page cache
    jsrc("conv_id", "ts").count()
    repeats = int(os.environ.get("SABER_BENCH_REPEATS", "3"))
    times, rows = {}, {}
    for name, build in variants.items():
        best = None
        for _ in range(repeats):
            t0 = time.monotonic()
            rows[name] = build().count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
            sys.stderr.write(f"[skew] {name}: {dt:.2f}s → {rows[name]} rows\n")
        times[name] = round(best, 3)
    ray.shutdown()
    assert rows["agg_sortmerge"] == rows["agg_salted"], rows
    assert rows["join_plain"] == rows["join_band"], rows
    return {
        "metric": (f"skewed-key (one conv_id with ~{int(hot_frac * 100)} pct "
                   f"of rows) — skew paths vs default, best-of-{repeats} sec"),
        "agg_turns": agg_turns, "join_turns": join_turns,
        "hot_frac": hot_frac, "num_cpus": NUM_CPUS,
        **times,
        "agg_rows": rows["agg_sortmerge"], "join_rows": rows["join_plain"],
        "agg_speedup_salted": round(times["agg_sortmerge"]
                                    / times["agg_salted"], 3),
        "join_speedup_band": round(times["join_plain"]
                                   / times["join_band"], 3),
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        # scaling evidence runs a much larger stream than the per-round bench
        # so both levels are CPU-bound — fixed per-query latency (barrier
        # scheduling, driver coordination) isn't what the N-vs-4N criterion
        # measures; sustained throughput on a sizeable stream is. Queries run
        # sequentially at both levels (stable, no cross-query contention).
        env.setdefault("SABER_BENCH_TURNS", str(12 * _n_turns()))
        env.setdefault("SABER_BENCH_SEQUENTIAL", "1")
        # long sequential runs self-average host noise; no repeats needed
        env.setdefault("SABER_BENCH_REPEATS", "1")
        # taskset pins the WHOLE process tree (driver + raylet + workers +
        # arrow/io threadpools) — ray.init(num_cpus=N) alone only caps Ray
        # task slots, letting library threadpools silently borrow the other
        # cores, which would inflate the low level. Each level gets ncpu
        # worker cores + 2 cores for the Ray control plane (raylet, object
        # store, driver) — on a real cluster that overhead is per NODE and
        # identical at N and 4N nodes; folding it into the worker budget
        # would instead tax the small level ~4x harder than a real N-node
        # cluster is taxed.
        cmd = [sys.executable, os.path.join(REPO, "bench.py")]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu + 1}"] + cmd
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             check=True, cwd=REPO).stdout
        return json.loads(out.strip().splitlines()[-1])
    # 6 vs 24 worker cores: 4x apart, and the high level (24+2 pinned cores)
    # still leaves headroom on this 32-core box so it isn't throttled by
    # single-socket memory-bandwidth saturation — a single-machine artifact a
    # real 4N-node cluster (4x memory controllers) doesn't have.
    lo = int(os.environ.get("RAY_GRAFT_SCALE_LO", "6"))
    hi = int(os.environ.get("RAY_GRAFT_SCALE_HI", "24"))
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": f"scaling efficiency, same suite at num_cpus={lo} vs {hi} "
                  "(pinned cores, sequential, same input)",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "turns_per_sec_lo": r_lo["turns_per_sec"],
        "turns_per_sec_hi": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "queries_lo": r_lo["queries"], "queries_hi": r_hi["queries"],
        "sf": SF_DIR, "n_turns": r_lo["n_turns"],
    }


def _stream_dir(n_turns: int, n_files: int) -> str:
    """Time-ordered stream files for the streaming bench (cached): the
    suite's synthetic transcripts sorted by ts and cut into ``n_files``
    sequential parquet files with several row groups each (row groups =
    intra-epoch ingest parallelism)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from saber_ray.sources.transcripts import generate_transcripts

    out = os.path.join("/tmp/saber_ray_bench",
                       f"stream-{n_turns}-{n_files}")
    manifest = os.path.join(out, "_MANIFEST")
    tag = f"turns={n_turns} files={n_files} v1"
    if os.path.exists(manifest) and open(manifest).read() == tag:
        return out
    base = os.path.join("/tmp/saber_ray_bench", f"transcripts-{n_turns}")
    generate_transcripts(base, n_turns=n_turns, n_files=64)
    t = pq.read_table(base, columns=["conv_id", "role", "ts", "text"])
    t = t.append_column("text_len", pc.cast(pc.utf8_length(t["text"]),
                                            pa.int64()))
    t = t.drop_columns(["text"])
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    os.makedirs(out, exist_ok=True)
    n = t.num_rows
    for i in range(n_files):
        part = t.slice(i * n // n_files,
                       (i + 1) * n // n_files - i * n // n_files)
        pq.write_table(part, os.path.join(out, f"f{i:03d}.parquet"),
                       row_group_size=max(part.num_rows // 8, 4096))
    with open(manifest, "w") as f:
        f.write(tag)
    return out


def _latency_stats(epoch_stats: list) -> dict:
    """Sustained rows/s + p50/p95 per-epoch emit latency (warm epochs only:
    epoch 0 pays actor spin-up; a latency CLIFF after warm-up would show
    here as p95 >> p50)."""
    import numpy as np
    warm = epoch_stats[1:] if len(epoch_stats) > 2 else epoch_stats
    lat = np.array([e["emit_latency_wall_ms"] for e in warm])
    rows = sum(e["rows_in"] for e in epoch_stats)
    wall = sum(e["wall_sec"] for e in epoch_stats)
    return {
        "epochs": len(epoch_stats),
        "rows_in": int(rows),
        "sustained_rows_per_sec": int(rows / wall) if wall else None,
        "emit_latency_ms_p50": round(float(np.percentile(lat, 50)), 1),
        "emit_latency_ms_p95": round(float(np.percentile(lat, 95)), 1),
        "emit_latency_ms_max": round(float(lat.max()), 1),
    }


def run_streaming() -> dict:
    """--streaming: sustained micro-batch load on the streaming engines —
    the figure-11 analogue (reference: per-epoch latency under sustained
    ingest). Drives StreamingWindowedAggregate and StreamingWindowedJoin
    over the sf-tier transcript stream for >= 20 epochs each; reports
    sustained rows/s and p50/p95 per-epoch emit latency (wall from epoch
    start to output visible — ingest + state merge + emission + snapshot)."""
    import shutil

    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from saber_ray import Window, cnt, sum_
    from saber_ray.core.windows import HOUR, MINUTE
    from saber_ray.streaming import StreamingWindowedAggregate
    from saber_ray.streaming_join import StreamingWindowedJoin

    n_turns = _n_turns()
    n_files = int(os.environ.get("SABER_STREAM_FILES", "40"))
    epoch_size = 2                               # >= 20 epochs at 40 files
    src = _stream_dir(n_turns, n_files)
    files = sorted(os.path.join(src, f) for f in os.listdir(src)
                   if f.endswith(".parquet"))
    parts = max(4, NUM_CPUS // 4)
    work = "/tmp/saber_ray_bench/streaming_run"

    shutil.rmtree(work, ignore_errors=True)
    # live metrics endpoint (RESTfulServer.java analogue): the bench polls
    # it MID-RUN over real HTTP — throughput/watermark-lag visibility on a
    # long job without touching checkpoint files
    import threading
    import urllib.request

    from saber_ray.monitor import MetricsServer
    agg_dir = os.path.join(work, "agg")
    os.makedirs(agg_dir, exist_ok=True)
    srv = MetricsServer(agg_dir)
    samples: list[dict] = []
    stop_poll = threading.Event()

    def _poll():
        while not stop_poll.is_set():
            try:
                with urllib.request.urlopen(srv.url, timeout=2) as r:
                    samples.append(json.loads(r.read()))
            except Exception:
                pass
            stop_poll.wait(0.3)

    poller = threading.Thread(target=_poll, daemon=True)
    poller.start()
    agg = StreamingWindowedAggregate(
        agg_dir,
        window=Window.sliding(4 * HOUR, 30 * MINUTE),
        aggs=[sum_("text_len", "sum_len"), cnt(alias="n_turns")],
        keys=["role"], num_partitions=parts,
        columns=["role", "text_len", "ts"], monitor=srv)
    t0 = time.monotonic()
    ck_a = agg.run(files, epoch_size=epoch_size)
    agg_wall = time.monotonic() - t0
    stop_poll.set()
    poller.join(timeout=5)
    srv.stop()
    agg_stats = _latency_stats(ck_a["metrics"]["epoch_stats"])
    mid = [s for s in samples
           if s.get("watermark") is not None and not s.get("finalized")]
    endpoint = {
        "polls": len(samples), "mid_run_polls": len(mid),
        "live_ticks_seen": sum(1 for s in samples if s.get("live")),
        "watermark_lag_us_last_mid_run":
            (mid[-1].get("watermark_lag_us") if mid else None),
    }

    join = StreamingWindowedJoin(
        os.path.join(work, "join"), on="conv_id",
        before=5 * MINUTE, after=5 * MINUTE,
        left_cols=["conv_id", "ts", "text_len"],
        right_cols=["conv_id", "ts", "text_len"],
        num_partitions=parts)
    t0 = time.monotonic()
    ck_j = join.run(files, files, epoch_size=epoch_size)
    join_wall = time.monotonic() - t0
    join_stats = _latency_stats(ck_j["metrics"]["epoch_stats"])

    # CEP — the canonical streaming workload (the reference's premise is
    # unbounded in-order pattern streams): user -> assistant -> user
    # within 24 h per conv, sealed-prefix emission
    from saber_ray.core.expressions import col
    from saber_ray.streaming_cep import StreamingMatchPattern
    cep = StreamingMatchPattern(
        os.path.join(work, "cep"),
        pattern=[col("role") == "user", col("role") == "assistant",
                 col("role") == "user"],
        keys=["conv_id"], ts_col="ts", within=24 * HOUR,
        columns=["role"], num_partitions=parts)
    t0 = time.monotonic()
    ck_c = cep.run(files, epoch_size=epoch_size)
    cep_wall = time.monotonic() - t0
    cep_stats = _latency_stats(ck_c["metrics"]["epoch_stats"])

    # materialized-view family (snapshot engines share one epoch driver;
    # the quantiles view is the heaviest: every value folds into a
    # per-key rank sketch each epoch)
    from saber_ray.streaming_quantiles import StreamingGroupedQuantiles
    view = StreamingGroupedQuantiles(
        os.path.join(work, "qview"), keys=["role"], col="text_len",
        qs=(0.5, 0.95, 0.99), k=4096, num_partitions=parts)
    t0 = time.monotonic()
    ck_v = view.run(files, epoch_size=epoch_size)
    view_wall = time.monotonic() - t0
    view_stats = _latency_stats(ck_v["metrics"]["epoch_stats"])
    ray.shutdown()
    return {
        "metric": ("streaming engines under sustained load: per-epoch emit "
                   "latency p50/p95 + sustained rows/s (agg: sliding "
                   "4h/30min by role; join: self band-join +-5min on "
                   "conv_id; cep: user->assistant->user within 24h; "
                   "view: per-role p50/p95/p99 text_len quantile view)"),
        "value": round(agg_wall + join_wall + cep_wall + view_wall, 3),
        "unit": "sec",
        "n_turns": n_turns, "n_files": n_files, "epoch_size": epoch_size,
        "num_partitions": parts,
        "agg": {**agg_stats, "wall_sec": round(agg_wall, 3),
                "rows_out": ck_a["metrics"]["emitted_rows"]},
        "metrics_endpoint": endpoint,
        "join": {**join_stats, "wall_sec": round(join_wall, 3),
                 "rows_out": ck_j["metrics"]["emitted_rows"]},
        "cep": {**cep_stats, "wall_sec": round(cep_wall, 3),
                "rows_out": ck_c["metrics"]["emitted_rows"]},
        "view": {**view_stats, "wall_sec": round(view_wall, 3),
                 "rows_out": ck_v["metrics"]["emitted_rows"]},
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
    }


_DOCS_BY_SF = {"sf0.001": 10_000, "sf0.01": 100_000, "sf0.1": 1_000_000}


def generate_documents(out_dir: str, n_docs: int, *, words_per_doc: int = 32,
                       vocab: int = 1000, dup_frac: float = 0.01,
                       topics: int = 1, seed: int = 7) -> str:
    """Deterministic synthetic document corpus for the curation bench:
    vectorized word sampling (no per-doc Python), ~dup_frac exact
    duplicates so dedup has real work, a sprinkle of PII-shaped spans so
    redaction has real matches. ``topics`` > 1 assigns each doc a topic
    whose words come from that topic's vocab slice — giving the corpus
    REAL cluster structure for the embedding/cluster benches. Cached on
    disk keyed by size."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tpart = f"-t{topics}" if topics > 1 else ""
    path = os.path.join(
        out_dir, f"documents-{n_docs}-w{words_per_doc}-v{vocab}"
                 f"-d{dup_frac}{tpart}-s{seed}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    lex = np.array([f"w{i:04d}" for i in range(vocab)], dtype=object)
    if topics > 1:
        per = vocab // topics
        topic = rng.integers(0, topics, n_docs)
        lo = (topic * per)[:, None]
        grid = lex[lo + rng.integers(0, per, (n_docs, words_per_doc))]
    else:
        grid = lex[rng.integers(0, vocab, (n_docs, words_per_doc))]
    text = grid[:, 0]
    for j in range(1, words_per_doc):          # 31 vectorized concats
        text = text + " " + grid[:, j]
    pii = rng.random(n_docs) < 0.05
    text = np.where(pii, text + " mail bot@example.com ph 555-123-4567",
                    text)
    ndup = int(n_docs * dup_frac)
    if ndup:
        text[rng.choice(n_docs, ndup, replace=False)] = text[0]
    # small row groups: a single-row-group file reads as ONE task and
    # serializes the scan — the Amdahl term that capped curation scaling
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(text, pa.string())}), path,
        row_group_size=max(n_docs // 256, 4096))
    return path


def run_curation() -> dict:
    """Curation-stage throughput: dedup → quality → lang-id → repetition
    → PII redaction → token stats over a synthetic corpus, docs/sec."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from saber_ray.stages.curation import redact_pii, repetition_stats
    from saber_ray.stages.dedup import exact_dedup
    from saber_ray.stages.text import lang_id, quality_score, token_stats

    tier = os.path.basename(os.path.normpath(SF_DIR))
    n_docs = int(os.environ.get("SABER_BENCH_DOCS",
                                _DOCS_BY_SF.get(tier, 1_000_000)))
    path = generate_documents("/tmp/saber_ray_bench", n_docs)

    def pipeline():
        ds = rd.read_parquet(path, override_num_blocks=2 * NUM_CPUS)
        return token_stats(redact_pii(repetition_stats(
            quality_score(lang_id(exact_dedup(ds)))))).count()

    pipeline()                                   # untimed warmup
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        rows = pipeline()
        runs.append(round(time.monotonic() - t0, 3))
    best = min(runs)
    ray.shutdown()
    return {
        "metric": "curation pipeline wall time (dedup->quality->lang->"
                  "repetition->pii->tokens) over synthetic documents",
        "value": best, "unit": "sec", "all_runs_sec": runs,
        "n_docs": n_docs, "rows_out": rows,
        "docs_per_sec": int(n_docs / best),
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
    }


def run_graph() -> dict:
    """--graph: PageRank throughput — the iterative family's bench leg.
    Synthetic hash-mixed edge table (10% of destinations remapped to one
    hot node for skew realism), 4 fixed-point iterations; reports
    edge-traversals/sec (edges x iterations / wall)."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from saber_ray.stages.graph import pagerank

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    tier = os.path.basename(os.path.normpath(SF_DIR))
    n_edges = int(os.environ.get(
        "SABER_BENCH_EDGES",
        {"sf0.001": 200_000, "sf0.01": 2_000_000}.get(tier, 20_000_000)))
    n_nodes = max(n_edges // 10, 1)
    iters = 4

    def to_edge(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy().astype(np.int64)
        src = (i * 2654435761) % n_nodes
        dst = (i * 97 + (i >> 7) * 31) % n_nodes
        dst[i % 10 == 0] = 0                      # 10% hot destination
        return pa.table({"src": src, "dst": dst})

    def edges():
        return rd.range(n_edges, override_num_blocks=2 * NUM_CPUS) \
            .map_batches(to_edge, batch_format="pyarrow")

    t0 = time.monotonic()
    out = pagerank(edges(), iterations=iters)
    wall = time.monotonic() - t0

    # the past-the-broadcast-bound path on the SAME graph: zero driver
    # node state, two sort exchanges per iteration — report the honest
    # cost ratio and assert bit-identical total mass
    from saber_ray.stages.graph import pagerank_partitioned
    t0 = time.monotonic()
    pout = pagerank_partitioned(edges(), iterations=iters)
    p_total = int(pout.map_batches(
        lambda t: pa.table({"s": [int(np.sum(
            t["rank"].to_numpy(zero_copy_only=False)))]}),
        batch_format="pyarrow").sum("s"))
    p_wall = time.monotonic() - t0
    ray.shutdown()
    total = int(sum(out["rank"].to_pylist()))
    assert p_total == total, (p_total, total)
    return {
        "metric": "PageRank wall time (4 integer fixed-point iterations, "
                  "hash-mixed edges, 10% hot destination)",
        "value": round(wall, 3), "unit": "sec",
        "n_edges": n_edges, "n_nodes": int(out.num_rows), "iterations": iters,
        "edge_traversals_per_sec": int(n_edges * iters / wall),
        "total_rank": total,
        "partitioned_sec": round(p_wall, 3),
        "partitioned_edge_traversals_per_sec": int(n_edges * iters / p_wall),
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
    }


def run_relational() -> dict:
    """--relational: throughput of the late-round-4 relational/time-series
    family over the REAL sf tables — interval stabbing + overlap joins,
    dense-grid resample, z-score normalize, winsorize (rows_out/sec)."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from saber_ray.core.aggregates import cnt, sum_
    from saber_ray.stages.join import interval_join, interval_overlap_join
    from saber_ray.stages.normalize import normalize, winsorize
    from saber_ray.stages.resample import resample

    HOUR = 3_600_000_000
    DAY = 24 * HOUR

    def events():
        return rd.read_parquet(f"{SF_DIR}/events.parquet",
                               columns=["ts", "user_id", "event_type",
                                        "value"])

    def points():
        def f(t: pa.Table) -> pa.Table:
            m = (t["l_partkey"].to_numpy(zero_copy_only=False) % 101) == 0
            return t.filter(pa.array(m))
        return rd.read_parquet(
            f"{SF_DIR}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_shipdate"]) \
            .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    def intervals(mod, days):
        def f(t: pa.Table) -> pa.Table:
            m = (t["o_orderkey"].to_numpy(zero_copy_only=False) % mod) == 0
            t = t.filter(pa.array(m))
            s = t["o_orderdate"].cast(pa.int64())
            return pa.table({"o_orderkey": t["o_orderkey"], "start": s,
                             "end": pc.add(s, days * DAY)})
        return rd.read_parquet(
            f"{SF_DIR}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"]) \
            .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    legs = {
        "interval_join": lambda: interval_join(
            points(), intervals(37, 2), point_ts="l_shipdate").count(),
        "interval_overlap_join": lambda: interval_overlap_join(
            intervals(7, 3), intervals(11, 5),
            left_cols=["o_orderkey"], right_cols=["o_orderkey"]).count(),
        "resample_ffill": lambda: resample(
            events(), step=6 * HOUR, keys="user_id",
            aggs=[cnt(alias="n"), sum_("value", "sum_value", scale=2)],
            fill="ffill", round_decimals=6).count(),
        "normalize_zscore": lambda: normalize(
            rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                            columns=["l_returnflag", "l_extendedprice"]),
            "l_extendedprice", keys="l_returnflag", method="zscore",
            scale=2, round_decimals=6).count(),
        "winsorize": lambda: winsorize(
            rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                            columns=["l_returnflag", "l_extendedprice"]),
            "l_extendedprice", keys="l_returnflag", p=(0.01, 0.99)).count(),
    }
    for fn in legs.values():                     # untimed warmup
        fn()
    times, rows_out = {}, {}
    for name, fn in legs.items():
        t0 = time.monotonic()
        rows_out[name] = fn()
        times[name] = round(time.monotonic() - t0, 3)
    ray.shutdown()
    return {
        "metric": "relational/time-series op wall time over the sf tables "
                  "(interval joins, resample, normalize, winsorize)",
        "value": round(sum(times.values()), 3), "unit": "sec",
        "ops_sec": times, "rows_out": rows_out,
        "rows_out_per_sec": {k: int(rows_out[k] / times[k])
                             for k in times if times[k] > 0},
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
    }


def run_text() -> dict:
    """--text: throughput of the retrieval / language-model ops over the
    curation bench corpus — inverted index, BM25 search, unigram-LM
    train, perplexity scoring, bigram vocabulary (docs/sec each)."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from saber_ray.stages.lm import (ngram_counts, perplexity_score,
                                     train_unigram_lm)
    from saber_ray.stages.search import bm25_search, build_inverted_index

    tier = os.path.basename(os.path.normpath(SF_DIR))
    n_docs = int(os.environ.get("SABER_BENCH_DOCS",
                                _DOCS_BY_SF.get(tier, 1_000_000)))
    path = generate_documents("/tmp/saber_ray_bench", n_docs)

    def ds():
        return rd.read_parquet(path, override_num_blocks=2 * NUM_CPUS)

    times = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        times[name] = round(time.monotonic() - t0, 3)
        return out

    timed("inverted_index", lambda: build_inverted_index(ds()).count())
    timed("bm25_search", lambda: bm25_search(
        ds(), ["w0001 w0002 w0003", "w0500 w0900"], k=10).count())
    lm = timed("train_lm", lambda: train_unigram_lm(ds()))
    timed("perplexity", lambda: perplexity_score(ds(), lm).count())
    timed("bigram_vocab", lambda: ngram_counts(ds(), n=2).count())

    # text → embedding → cluster family (hashed TF-IDF + SemDeDup) over
    # a TOPIC-structured variant of the corpus (real clusters — the flat
    # random corpus collapses into one mega-cluster and measures only
    # the max_cluster chunk guard, not the operator's parallel shape)
    from saber_ray.stages.cluster import semdedup
    from saber_ray.stages.embed import embed_hashed, train_idf
    tpath = generate_documents("/tmp/saber_ray_bench", n_docs, topics=64)

    def tds():
        return rd.read_parquet(tpath, override_num_blocks=2 * NUM_CPUS)

    idf = timed("train_idf", lambda: train_idf(tds(), dim=256))
    timed("embed_hashed", lambda: embed_hashed(
        tds(), dim=256, idf=idf).count())
    timed("semdedup", lambda: semdedup(
        embed_hashed(tds(), dim=256), n_clusters=max(8, n_docs // 2048),
        eps=0.999, id_col="doc_id", train_size=20_000).count())
    ray.shutdown()
    return {
        "metric": "retrieval/LM ops wall time over synthetic documents "
                  "(inverted index, BM25, LM train, perplexity, bigrams)",
        "value": round(sum(times.values()), 3), "unit": "sec",
        "ops_sec": times, "n_docs": n_docs,
        "docs_per_sec": {k: int(n_docs / v) for k, v in times.items()},
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
    }


def run_dedup() -> dict:
    """--dedup: near-dup family throughput over the curation bench corpus —
    minhash signatures, banded LSH candidate pairs, full LSH clustering
    (pairs + distributed connected components), and simhash fingerprints
    (docs/sec each). The signature stage is the per-byte hot path of a
    100-TB curation run; this leg is the regression guard for the
    round-5 Arrow-native (bytescan token runs + rolling w-gram) rewrite."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from saber_ray.stages.dedup import (minhash_candidate_pairs,
                                        minhash_lsh_clusters,
                                        minhash_signatures, simhash)

    tier = os.path.basename(os.path.normpath(SF_DIR))
    n_docs = int(os.environ.get("SABER_BENCH_DOCS",
                                _DOCS_BY_SF.get(tier, 1_000_000)))
    # 2% exact dups -> real LSH buckets/pairs/components to cluster
    path = generate_documents("/tmp/saber_ray_bench", n_docs, dup_frac=0.02)

    def ds():
        return rd.read_parquet(path, override_num_blocks=2 * NUM_CPUS)

    times, rows = {}, {}

    def timed(name, fn):
        t0 = time.monotonic()
        rows[name] = fn()
        times[name] = round(time.monotonic() - t0, 3)

    ds().count()                                # warm page cache
    timed("minhash_signatures", lambda: minhash_signatures(ds()).count())
    timed("lsh_candidate_pairs",
          lambda: minhash_candidate_pairs(ds(), threshold=0.9).count())
    timed("lsh_clusters",
          lambda: minhash_lsh_clusters(ds(), threshold=0.9).count())
    timed("simhash", lambda: simhash(ds()).count())
    ray.shutdown()
    return {
        "metric": "near-dup family wall time over synthetic documents "
                  "(minhash signatures, LSH pairs, LSH clusters, simhash)",
        "value": round(sum(times.values()), 3), "unit": "sec",
        "ops_sec": times, "rows_out": rows, "n_docs": n_docs,
        "docs_per_sec": {k: int(n_docs / v) for k, v in times.items()},
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
    }


def run_multimodal() -> dict:
    """--multimodal: codec / actor-pool throughput over a mixed
    PPM + PNG + JPEG + WAV + raw-video corpus. The corpus is synthesized
    IN PARALLEL (map_batches over seed shards — JPEG/PNG encoding is
    itself real compute) and materialized first, so the timings isolate
    the decode paths: full decode→feature actor pool (items/s and
    payload MB/s), image resize+re-encode, and log-mel over the WAV
    subset. Payloads are sized up vs the test fixtures (64-160 px
    images) so decode work dominates per-item overhead."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.multimodal import (decode_features,
                                             mel_spectrogram, resize_images)

    n_items = int(os.environ.get("SABER_BENCH_MEDIA", "8000"))
    shard = 100
    n_shards = max(1, n_items // shard)

    def synth(batch: pa.Table) -> pa.Table:
        from saber_ray.stages.multimodal import synthesize_media
        out = []
        for s in batch["seed"].to_pylist():
            t = synthesize_media(shard, seed=1000 + s, include_png=True,
                                 include_jpeg=True, include_gif=True,
                                 img_px=(64, 160),
                                 wav_samples=(4000, 32000))
            # re-key media_id so ids stay globally unique across shards
            t = t.set_column(0, "media_id",
                             pa.array(t["media_id"].to_numpy() + s * shard,
                                      type=pa.int64()))
            out.append(t)
        return pa.concat_tables(out)

    media = rd.from_arrow(pa.table({"seed": list(range(n_shards))})) \
        .repartition(n_shards) \
        .map_batches(synth, batch_size=1, batch_format="pyarrow") \
        .materialize()
    n_total = media.count()
    total_bytes = media.map_batches(
        lambda t: pa.table({"b": [sum(len(p) for p in
                                      t["payload"].to_pylist())]}),
        batch_format="pyarrow").sum("b")

    times, rows = {}, {}

    def timed(name, fn):
        t0 = time.monotonic()
        rows[name] = fn()
        times[name] = round(time.monotonic() - t0, 3)

    timed("decode_features",
          lambda: decode_features(media, feature_dim=16).count())
    images = media.filter(
        lambda r: r["media_type"].startswith("image/")).materialize()
    n_images = images.count()
    timed("resize_images", lambda: resize_images(images, 64, 64).count())
    audio = media.filter(
        lambda r: r["media_type"] == "audio/wav").materialize()
    n_audio = audio.count()
    timed("mel_spectrogram", lambda: mel_spectrogram(audio).count())
    ray.shutdown()
    return {
        "metric": "multimodal codec wall time (decode+feature, resize "
                  "re-encode, log-mel) over synthesized media",
        "value": round(sum(times.values()), 3), "unit": "sec",
        "ops_sec": times, "rows_out": rows,
        "n_items": n_total, "n_images": n_images, "n_audio": n_audio,
        "payload_mb": round(total_bytes / 1e6, 1),
        "items_per_sec": {
            "decode_features": int(n_total / times["decode_features"]),
            "resize_images": int(n_images / times["resize_images"]),
            "mel_spectrogram": int(n_audio / times["mel_spectrogram"]),
        },
        "decode_mb_per_sec": round(
            total_bytes / 1e6 / times["decode_features"], 1),
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
    }


def run_sources() -> dict:
    """--sources: ordered text-source throughput — CSV and JSONL, plain
    (byte-range fragment splitting) vs .gz shards (file-unit splitting),
    each with and without the global-ordinal counting pass. Corpus =
    deterministic event-like lines sharded across files."""
    import gzip

    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from saber_ray.sources.text_files import read_csv, read_jsonl

    n_rows = int(os.environ.get("SABER_BENCH_LINES", "2000000"))
    n_shards = 32
    root = "/tmp/saber_ray_src_bench"
    marker = os.path.join(root, f"_DONE_{n_rows}")
    if not os.path.exists(marker):
        import shutil
        if os.path.exists(root):
            shutil.rmtree(root)
        os.makedirs(os.path.join(root, "csv"))
        os.makedirs(os.path.join(root, "csv_gz"))
        os.makedirs(os.path.join(root, "jsonl"))
        os.makedirs(os.path.join(root, "jsonl_gz"))
        per = n_rows // n_shards
        hdr = "event_id,ts,user_id,value\n"
        for s in range(n_shards):
            base = s * per
            lines_c = [f"{base+i},{1700000000+i},{(base+i)*7%100000},"
                       f"{(i%1000)/10.0}\n" for i in range(per)]
            lines_j = [('{"event_id": %d, "ts": %d, "user_id": %d, '
                        '"value": %.1f}\n')
                       % (base + i, 1700000000 + i, (base + i) * 7 % 100000,
                          (i % 1000) / 10.0) for i in range(per)]
            cbuf = (hdr + "".join(lines_c)).encode()
            jbuf = "".join(lines_j).encode()
            open(f"{root}/csv/s{s:02d}.csv", "wb").write(cbuf)
            open(f"{root}/csv_gz/s{s:02d}.csv.gz", "wb").write(
                gzip.compress(cbuf, compresslevel=1))
            open(f"{root}/jsonl/s{s:02d}.jsonl", "wb").write(jbuf)
            open(f"{root}/jsonl_gz/s{s:02d}.jsonl.gz", "wb").write(
                gzip.compress(jbuf, compresslevel=1))
        open(marker, "w").write("ok\n")

    import pyarrow as pa
    ctypes = {"event_id": pa.int64(), "ts": pa.int64(),
              "user_id": pa.int64(), "value": pa.float64()}
    legs = {
        "csv": lambda: read_csv(f"{root}/csv", column_types=ctypes),
        "csv_gz": lambda: read_csv(f"{root}/csv_gz", column_types=ctypes),
        "csv_gz_ordinal": lambda: read_csv(
            f"{root}/csv_gz", column_types=ctypes,
            with_global_ordinal=True),
        "jsonl": lambda: read_jsonl(f"{root}/jsonl"),
        "jsonl_gz": lambda: read_jsonl(f"{root}/jsonl_gz"),
        "jsonl_pruned": lambda: read_jsonl(f"{root}/jsonl",
                                           columns=["event_id"]),
    }
    times, rows = {}, {}
    legs["csv"]().count()                         # warm page cache
    for name, build in legs.items():
        t0 = time.monotonic()
        rows[name] = build().count()
        times[name] = round(time.monotonic() - t0, 3)
    ray.shutdown()
    assert all(r == n_rows for r in rows.values()), rows
    return {
        "metric": "text-source read wall time (plain vs gz, csv vs jsonl)",
        "value": round(sum(times.values()), 3), "unit": "sec",
        "ops_sec": times,
        "rows_per_sec": {k: int(n_rows / v) for k, v in times.items()},
        "n_rows": n_rows, "n_shards": n_shards,
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        result = run_scaling()
    elif "--skew" in sys.argv:
        result = run_skew()
    elif "--curation" in sys.argv:
        result = run_curation()
    elif "--streaming" in sys.argv:
        result = run_streaming()
    elif "--text" in sys.argv:
        result = run_text()
    elif "--relational" in sys.argv:
        result = run_relational()
    elif "--graph" in sys.argv:
        result = run_graph()
    elif "--dedup" in sys.argv:
        result = run_dedup()
    elif "--multimodal" in sys.argv:
        result = run_multimodal()
    elif "--sources" in sys.argv:
        result = run_sources()
    else:
        result = run_suite()
    print(json.dumps(result))
