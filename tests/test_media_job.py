"""End-to-end media curation job (jobs/run_media.py): decode-once →
feature near-dup drop → resize → exactly-once bucketed output, with
resume-skip and the empty-bucket commit edge."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jobs.run_media import run
from saber_ray.stages.multimodal import ppm_encode


@pytest.fixture()
def media_corpus(tmp_path):
    """40 solid-color PPM items (distinct hue directions → features far
    apart) + 5 byte-identical duplicates of items 0-4 under new ids."""
    rows = {k: [] for k in ("media_id", "media_type", "payload",
                            "meta_width", "meta_height",
                            "meta_sample_rate", "meta_n_frames")}

    def add(mid, payload, w, h):
        rows["media_id"].append(mid)
        rows["media_type"].append("image/ppm")
        rows["payload"].append(payload)
        rows["meta_width"].append(w)
        rows["meta_height"].append(h)
        rows["meta_sample_rate"].append(0)
        rows["meta_n_frames"].append(0)

    payloads = []
    for i in range(40):
        color = np.array([(i * 97 + 13) % 256, (i * 57 + 101) % 256,
                          (i * 31 + 201) % 256], np.uint8)
        img = np.broadcast_to(color, (16, 16, 3)).copy()
        p = ppm_encode(img)
        payloads.append(p)
        add(i, p, 16, 16)
    for j in range(5):                       # exact duplicates, new ids
        add(100 + j, payloads[j], 16, 16)
    t = pa.table({
        "media_id": pa.array(rows["media_id"], type=pa.int64()),
        "media_type": pa.array(rows["media_type"], type=pa.string()),
        "payload": pa.array(rows["payload"], type=pa.binary()),
        "meta_width": pa.array(rows["meta_width"], type=pa.int32()),
        "meta_height": pa.array(rows["meta_height"], type=pa.int32()),
        "meta_sample_rate": pa.array(rows["meta_sample_rate"],
                                     type=pa.int32()),
        "meta_n_frames": pa.array(rows["meta_n_frames"], type=pa.int32()),
    })
    d = tmp_path / "media"
    d.mkdir()
    pq.write_table(t, str(d / "part-0.parquet"))
    return str(d)


def _read_out(out_dir):
    parts = [p for p in os.listdir(out_dir) if p.startswith("part=")]
    tables = []
    for p in parts:
        full = os.path.join(out_dir, p)
        files = [f for f in os.listdir(full) if f.endswith(".parquet")]
        for f in files:
            tables.append(pq.read_table(os.path.join(full, f)))
    return pa.concat_tables(tables) if tables else None


def test_media_job_end_to_end(ray_session, media_corpus, tmp_path):
    out = str(tmp_path / "out")
    # n_buckets > survivor count forces empty buckets — they must commit
    # (manifest rows=0) instead of crashing the atomic rename
    res = run(media_corpus, out, threshold=0.9999, n_buckets=64,
              img_h=8, img_w=8)
    # every byte-identical duplicate (cosine exactly 1) must drop — a dup
    # pair (a<b) always drops the LATER id, so ids 100-104 vanish
    got = _read_out(out)
    ids = set(got["media_id"].to_pylist())
    assert not ids & {100, 101, 102, 103, 104}
    assert res["near_dups_dropped"] >= 5
    assert res["rows_out"] == 45 - res["near_dups_dropped"]
    assert res["rows_out"] == len(ids)
    # survivors were resized to 8x8 and re-encoded
    for w, h in zip(got["meta_width"].to_pylist(),
                    got["meta_height"].to_pylist()):
        assert (w, h) == (8, 8)
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert len(manifest["partitions"]) == 64
    assert any(p["rows"] == 0 for p in manifest["partitions"].values())


def test_media_job_resume_skips_completed(ray_session, media_corpus,
                                          tmp_path):
    out = str(tmp_path / "out")
    r1 = run(media_corpus, out, threshold=0.9999, n_buckets=8,
             img_h=8, img_w=8)
    m1 = json.load(open(os.path.join(out, "manifest.json")))
    r2 = run(media_corpus, out, threshold=0.9999, n_buckets=8,
             img_h=8, img_w=8)
    m2 = json.load(open(os.path.join(out, "manifest.json")))
    assert r1["rows_out"] == r2["rows_out"]
    # all partitions keep their epoch-1 commit: nothing re-ran
    assert {k: v["rows"] for k, v in m1["partitions"].items()} \
        == {k: v["rows"] for k, v in m2["partitions"].items()}
    assert all(v["epoch"] == 1 for v in m2["partitions"].values())
