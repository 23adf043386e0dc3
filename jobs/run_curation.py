#!/usr/bin/env python
"""Cluster job entry point: the end-to-end corpus-curation pipeline.

The flagship composition of the training-data operators — what a user
would actually submit against a 100 TB document corpus:

    dedup (exact, content-hash) → quality / language / repetition
    signals → threshold filter → PII redaction → test-set
    decontamination → curated parquet

Scale shape:

- The corpus is processed in **content-hash partitions** (``--buckets``):
  identical texts always land in the same bucket, so exact dedup is
  correct per partition with NO global shuffle — each partition is an
  independent unit of work.
- Output goes through the exactly-once sink (``state/checkpoint.py``):
  one directory per bucket, atomic rename + manifest. A killed job
  re-submitted with the same ``--out`` skips completed buckets.
- The decontamination blocklist is built ONCE from the held-out split
  (``doc_id % 17 == 0`` — stand-in for a benchmark suite) and broadcast
  via ``ray.put``; every partition reuses the same object.

Submit on a cluster / run locally:

    ray job submit --address http://<head>:8265 --working-dir /root/repo \
        -- python jobs/run_curation.py --sf-dir /data/docs --out /data/curated
    python jobs/run_curation.py --sf-dir /root/testdata/sf0.01 --out /tmp/cur
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_curation(sf_dir: str, bucket: int, n_buckets: int, bl_ref,
                   *, min_quality: float = 0.3, max_dup_word: float = 0.9):
    """One content-hash bucket of the curation pipeline → Dataset."""
    import numpy as np
    import pyarrow as pa

    from saber_ray.sources.parquet import read_table
    from saber_ray.stages.curation import (decontaminate, redact_pii,
                                           repetition_stats)
    from saber_ray.stages.dedup import exact_dedup
    from saber_ray.stages.text import quality_score, lang_id, token_stats

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "lang", "source"])

    def in_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd
        h = pd.util.hash_array(
            np.asarray(t["text"].to_pylist(), dtype=object))
        return t.filter(pa.array(h % n_buckets == bucket))

    part = docs.map_batches(in_bucket, batch_format="pyarrow",
                            zero_copy_batch=True)
    deduped = exact_dedup(part, on="text", id_col="doc_id")
    scored = repetition_stats(quality_score(lang_id(deduped)))

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = pc.and_(pc.greater_equal(t["quality"],
                                     pa.scalar(min_quality)),
                    pc.less_equal(t["dup_word_frac"],
                                  pa.scalar(max_dup_word)))
        return t.filter(m)

    kept = scored.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)
    redacted = redact_pii(kept, "text")
    decon = decontaminate(redacted, bl_ref, "text", n=3)

    def drop_contaminated(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.invert(t["contaminated"]))
        return t.drop_columns(["contaminated", "n_contaminated"])

    return token_stats(
        decon.map_batches(drop_contaminated, batch_format="pyarrow",
                          zero_copy_batch=True))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="/tmp/saber_ray_curated")
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    from saber_ray.sources.parquet import read_table
    from saber_ray.stages.curation import build_shingle_blocklist
    from saber_ray.state.checkpoint import emitted_rows, run_partitioned

    t0 = time.monotonic()
    docs = read_table(args.sf_dir, "documents", columns=["doc_id", "text"])

    def held_out(t: pa.Table) -> pa.Table:
        import numpy as np
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 17 == 0))

    bl = build_shingle_blocklist(
        docs.map_batches(held_out, batch_format="pyarrow",
                         zero_copy_batch=True), "text", n=3)
    bl_ref = ray.put(bl)

    parts = [(f"bucket{i:03d}", i) for i in range(args.buckets)]
    manifest = run_partitioned(
        lambda b: build_curation(args.sf_dir, b, args.buckets, bl_ref,
                                 min_quality=args.min_quality),
        parts, args.out, resume=not args.no_resume)
    out = {"out_dir": args.out, "buckets": args.buckets,
           "blocklist_shingles": len(bl),
           "rows_curated": emitted_rows(args.out),
           "wall_sec": round(time.monotonic() - t0, 3),
           "partitions_done": len(manifest["partitions"])}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
