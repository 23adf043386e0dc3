#!/usr/bin/env python
"""Benchmark harness: the headline CM1/CM2 + SG1-SG3 + YSB suite over a
deterministic synthetic transcript stream (BASELINE.json input_hint shape).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "n_turns": ..., "turns_per_sec": ...}

--scaling: runs the same bench in two fresh processes (RAY_GRAFT_CPUS=8 and
=32, same cached input) and prints one JSON line with both throughputs and
the scaling efficiency — the sandbox evidence for the north rule's N vs 4N
cluster criterion.

Environment:
  GRAFT_SF_DIR        sf dir (default /root/testdata/sf0.1) — reported, and
                      sets the synthetic size tier
  RAY_GRAFT_CPUS      num_cpus for ray.init (default 32)
  SABER_BENCH_TURNS   override synthetic turn count
"""

from __future__ import annotations

import json
import os
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
    generate_transcripts(data_dir, n_turns=n_turns, n_files=max(8, NUM_CPUS))

    # warm the page cache (untimed): one pass over the narrow ts column
    read_transcripts(data_dir, columns=["ts"]).count()

    def src(*cols):
        # column-pruned read: only the columns a query touches leave storage
        return read_transcripts(data_dir, columns=list(cols))

    pipelines = {
        "cm1": lambda: suite.cm1(src("role", "ts", "text")),
        "cm2": lambda: suite.cm2(src("tool", "ts", "text")),
        "sg1": lambda: suite.sg1(src("ts", "text")),
        "sg2": lambda: suite.sg2(src("conv_id", "ts", "text")),
        "sg3": lambda: suite.sg3(src("conv_id", "ts", "text")),
        "ysb": lambda: suite.ysb(src("role", "tool", "ts")),
    }
    per_query, total = {}, 0.0
    for name, build in pipelines.items():
        t0 = time.monotonic()
        out = build()
        n_rows = out.count() if hasattr(out, "count") else len(out)
        dt = time.monotonic() - t0
        per_query[name] = round(dt, 3)
        total += dt
        sys.stderr.write(f"[bench] {name}: {dt:.2f}s → {n_rows} rows\n")
    ray.shutdown()
    tps = n_turns * len(pipelines) / total
    return {
        "metric": "saber_ray CM/SG/YSB suite wall time over synthetic transcripts",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "turns_per_sec": round(tps),
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=REPO).stdout
        return json.loads(out.strip().splitlines()[-1])
    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency, same suite at num_cpus=8 vs 32",
        "sec_8": r_lo["value"], "sec_32": r_hi["value"],
        "turns_per_sec_8": r_lo["turns_per_sec"],
        "turns_per_sec_32": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "queries_8": r_lo["queries"], "queries_32": r_hi["queries"],
        "sf": SF_DIR, "n_turns": r_lo["n_turns"],
    }


if __name__ == "__main__":
    result = run_scaling() if "--scaling" in sys.argv else run_suite()
    print(json.dumps(result))
