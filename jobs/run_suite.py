#!/usr/bin/env python
"""Cluster job entry point: run the CM/SG/YSB suite (or one query) as a Ray job.

Submit to a running cluster (north rule: "run via ray job submit on fixed
multi-node clusters"):

    ray job submit --address http://<head>:8265 \
        --working-dir /root/repo \
        -- python jobs/run_suite.py --sf-dir /data/transcripts --out /data/out

In this sandbox there is no multi-node cluster; the same entry runs against
the local session (``ray.init(address="local")`` fallback) and the N-vs-4N
scaling criterion is evidenced by ``bench.py --scaling`` (two parallelism
levels in fresh processes).

The job writes results through the exactly-once sink (state/checkpoint.py):
one partition per query, resumable — re-submitting a killed job skips
completed queries and produces the identical output set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="directory with the driver parquet tables (events, ...)")
    ap.add_argument("--out", default="/tmp/saber_ray_job_out",
                    help="output root (exactly-once sink manifest lives here)")
    ap.add_argument("--queries", default="cm1,cm2,sg1,sg2,sg3,ysb",
                    help="comma-separated suite subset")
    ap.add_argument("--no-resume", action="store_true",
                    help="discard the manifest and recompute everything")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        # under `ray job submit` the address comes from the environment;
        # standalone falls back to a local session.
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 ignore_reinit_error=True)

    from saber_ray.pipelines import suite
    from saber_ray.sources.transcripts import transcripts_from_events
    from saber_ray.state.checkpoint import run_partitioned, emitted_rows

    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    builders = {name: getattr(suite, name) for name in names}

    def build(spec):
        return builders[spec](transcripts_from_events(args.sf_dir))

    t0 = time.monotonic()
    manifest = run_partitioned(
        build, [(name, name) for name in names], args.out,
        resume=not args.no_resume,
        on_progress=lambda r: print(
            f"[job] {r.partition_id}: {r.rows} rows in {r.wall_sec:.2f}s",
            flush=True))
    print(json.dumps({
        "queries": names,
        "out": args.out,
        "emitted_rows": emitted_rows(args.out),
        "epoch": manifest["epoch"],
        "wall_sec": round(time.monotonic() - t0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
