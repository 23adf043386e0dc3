#!/usr/bin/env python
"""Cluster job entry point: the end-to-end MEDIA-curation pipeline.

The multimodal flagship composition — what a user would submit against a
petabyte media corpus (images / audio / video as opaque binary columns):

    decode (real PPM/PNG/JPEG/GIF/WAV/raw-video codecs, actor pool)
    → per-item feature vectors → embedding-cosine near-dup DROP
    → resize surviving images → exactly-once partitioned output

Scale shape:

1. **Decode happens ONCE.** Features are computed in one actor-pool pass
   (payload-byte-sized batches); the near-dup decision reduces to a
   feature table of (media_id, feature) — payloads never enter the
   similarity stage or any shuffle.
2. **Near-dup drop** uses ``embedding_near_dup_pairs`` (auto: exact
   broadcast-matmul below ``max_exact_rows``, LSH-bucketed above — the
   same dispatch as the text/embedding path). Of every pair (a < b,
   cos ≥ threshold) the LATER id drops; the drop set is id-sized and
   broadcast once via ``ray.put`` (ids, not payloads).
3. **Resize + write** stream the surviving rows once; the resized
   dataset is materialized (object store, spillable) so the per-bucket
   commit pass below filters blocks instead of re-decoding — total
   decode work stays 1× the corpus regardless of bucket count.
4. **Exactly-once output** through ``state/checkpoint.run_partitioned``:
   media_id-hash buckets, tmp dir + atomic rename + manifest per bucket.
   A killed job re-submitted with the same ``--out`` skips completed
   buckets.

Submit on a cluster / run locally:

    ray job submit --address http://<head>:8265 --working-dir /root/repo \
        -- python jobs/run_media.py --media-dir /data/media --out /data/cur
    python jobs/run_media.py --synthesize 2000 --out /tmp/media_cur
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synthesize_corpus(media_dir: str, n_items: int, *, shard: int = 100,
                      seed0: int = 5000) -> None:
    """Deterministic parallel media synthesis → parquet (atomic, resumable:
    a completed dir is detected by its marker and skipped)."""
    import pyarrow as pa
    import ray.data as rd

    marker = os.path.join(media_dir, "_SYNTH_DONE")
    if os.path.exists(marker):
        return
    # exact item count: full shards + one remainder shard
    sizes = [shard] * (n_items // shard)
    if n_items % shard:
        sizes.append(n_items % shard)
    starts = [sum(sizes[:i]) for i in range(len(sizes))]

    def synth(batch: pa.Table) -> pa.Table:
        from saber_ray.stages.multimodal import synthesize_media
        out = []
        for s, sz, st in zip(batch["seed"].to_pylist(),
                             batch["size"].to_pylist(),
                             batch["start"].to_pylist()):
            t = synthesize_media(sz, seed=seed0 + s, include_png=True,
                                 include_jpeg=True, include_gif=True)
            t = t.set_column(
                0, "media_id",
                pa.array(t["media_id"].to_numpy() + st, type=pa.int64()))
            out.append(t)
        return pa.concat_tables(out)

    tmp = media_dir + ".tmp"
    import shutil
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    rd.from_arrow(pa.table({"seed": list(range(len(sizes))),
                            "size": sizes, "start": starts})) \
        .repartition(len(sizes)) \
        .map_batches(synth, batch_size=1, batch_format="pyarrow") \
        .write_parquet(tmp)
    if os.path.exists(media_dir):
        shutil.rmtree(media_dir)
    os.replace(tmp, media_dir)
    with open(marker, "w") as f:
        f.write("ok\n")


def run(media_dir: str, out_dir: str, *, threshold: float = 0.98,
        feature_dim: int = 16, img_h: int = 64, img_w: int = 64,
        n_buckets: int = 8, resume: bool = True) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from saber_ray.stages.multimodal import decode_features, resize_images
    from saber_ray.stages.similarity import embedding_near_dup_pairs
    from saber_ray.state.checkpoint import run_partitioned

    t0 = time.monotonic()
    media = rd.read_parquet(media_dir)
    n_in = media.count()

    # 1) decode once → feature table (ids + vectors only; payloads stay
    # put). MATERIALIZED: the near-dup stage consumes this dataset several
    # times (auto-dispatch count, corpus refs, scoring pass) — without
    # this the decode actor pool (the dominant cost) would re-run per
    # consumption
    feats = decode_features(media, feature_dim=feature_dim) \
        .map_batches(lambda t: t.select(["media_id", "feature"])
                     .rename_columns(["vec_id", "embedding"]),
                     batch_format="pyarrow").materialize()

    # 2) near-dup pairs (a < b, cos >= threshold) → drop the later id
    pairs = embedding_near_dup_pairs(feats, threshold=threshold)
    drop_ids = np.unique(np.asarray(
        [r["b"] for r in pairs.select_columns(["b"]).take_all()],
        dtype=np.int64))
    n_dropped = int(len(drop_ids))
    drop_ref = ray.put(drop_ids)

    def keep(batch: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        mask = pc.invert(pc.is_in(
            batch["media_id"], value_set=pa.array(drop, type=pa.int64())))
        return batch.filter(mask)

    survivors = media.map_batches(keep, batch_format="pyarrow")

    # 3) resize surviving images once, then materialize so the bucket
    # commit pass filters blocks instead of re-decoding
    curated = resize_images(survivors, img_h, img_w).materialize()

    # 4) exactly-once bucketed output
    def build(spec):
        b = spec["bucket"]

        def flt(t: pa.Table) -> pa.Table:
            ids = t["media_id"].to_numpy(zero_copy_only=False)
            # multiplicative hash mixes into the HIGH bits — take them
            # (a product mod 2^k would be a no-op: 2654435761 ≡ 1 mod 64,
            # leaving bucket == id % 2^k and any id stride unmixed)
            h = ((ids.astype(np.uint64) * np.uint64(2654435761))
                 >> np.uint64(32)) % np.uint64(n_buckets)
            return t.filter(pa.array(h == b))

        return curated.map_batches(flt, batch_format="pyarrow")

    manifest = run_partitioned(
        build, [(f"b{b:02d}", {"bucket": b}) for b in range(n_buckets)],
        out_dir, resume=resume)
    rows_out = sum(int(p["rows"]) for p in manifest["partitions"].values())
    return {
        "metric": "media curation job wall time",
        "value": round(time.monotonic() - t0, 3), "unit": "sec",
        "items_in": n_in, "near_dups_dropped": n_dropped,
        "rows_out": rows_out, "threshold": threshold,
        "n_buckets": n_buckets, "out": out_dir,
    }


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--media-dir", default="/tmp/saber_ray_media")
    ap.add_argument("--out", required=True)
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate a deterministic N-item corpus first")
    ap.add_argument("--threshold", type=float, default=0.98)
    ap.add_argument("--img", type=int, nargs=2, default=(64, 64),
                    metavar=("H", "W"))
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        # honor RAY_ADDRESS so `ray job submit` connects to the cluster
        # instead of silently starting a fresh single-node instance
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    if args.synthesize:
        synthesize_corpus(args.media_dir, args.synthesize)
    result = run(args.media_dir, args.out, threshold=args.threshold,
                 img_h=args.img[0], img_w=args.img[1],
                 n_buckets=args.buckets, resume=not args.no_resume)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
    import ray
    ray.shutdown()
