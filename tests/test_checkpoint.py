"""Exactly-once sink: kill mid-job → resume → identical output to a clean run."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from saber_ray import Window, cnt, sum_, windowed_aggregate
from saber_ray.core.windows import DAY
from saber_ray.sources.parquet import read_table
from saber_ray.state.checkpoint import (completed_partitions, emitted_rows,
                                        run_partitioned)

N_BUCKETS = 4


def _partitions():
    return [(f"b{i}", i) for i in range(N_BUCKETS)]


def _build_factory(sf_dir):
    # key-hash-partitioned grouped windowed aggregate: each user_id bucket is
    # computable independently (the documented partitioning assumption)
    def build(bucket):
        ds = read_table(sf_dir, "events", columns=["ts", "user_id", "value"])
        ds = ds.map_batches(
            lambda t: t.filter(
                pd.util.hash_array(t["user_id"].to_numpy()) % N_BUCKETS == bucket),
            batch_format="pyarrow")
        return windowed_aggregate(ds, window=Window.tumbling(DAY),
                                  keys=["user_id"],
                                  aggs=[sum_("value", "s"), cnt(alias="n")],
                                  round_decimals=6)
    return build


def _read_all(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "**", "*.parquet"),
                             recursive=True))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    return df.sort_values(["user_id", "window_id"]).reset_index(drop=True)


def test_kill_resume_exactly_once(ray_session, sf_dir, tmp_path):
    clean_dir, crash_dir = str(tmp_path / "clean"), str(tmp_path / "crash")
    build = _build_factory(sf_dir)

    run_partitioned(build, _partitions(), clean_dir, resume=False)
    clean = _read_all(clean_dir)
    assert emitted_rows(clean_dir) == len(clean)

    # crash after two partitions
    calls = {"n": 0}
    def crashing_build(bucket):
        if calls["n"] == 2:
            raise RuntimeError("simulated kill")
        calls["n"] += 1
        return build(bucket)
    with pytest.raises(RuntimeError):
        run_partitioned(crashing_build, _partitions(), crash_dir, resume=False)
    assert completed_partitions(crash_dir) == {"b0", "b1"}

    # resume: only the unfinished partitions run
    ran = []
    def resuming_build(bucket):
        ran.append(bucket)
        return build(bucket)
    manifest = run_partitioned(resuming_build, _partitions(), crash_dir, resume=True)
    assert ran == [2, 3]
    assert set(manifest["partitions"]) == {p for p, _ in _partitions()}
    # lineage + metrics present per partition
    for entry in manifest["partitions"].values():
        assert entry["rows"] >= 0 and "lineage" in entry and entry["epoch"] >= 1

    pd.testing.assert_frame_equal(_read_all(crash_dir), clean)

    # idempotent: a third run does nothing
    manifest2 = run_partitioned(
        lambda b: (_ for _ in ()).throw(AssertionError("must not build")),
        _partitions(), crash_dir, resume=True)
    assert set(manifest2["partitions"]) == set(manifest["partitions"])
    pd.testing.assert_frame_equal(_read_all(crash_dir), clean)


def test_job_entry_resumable(tmp_path):
    """jobs/run_suite.py runs via its CLI, commits per-query partitions, and a
    re-run with an intact manifest is a no-op (same emitted rows, epoch+1)."""
    import json
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = str(tmp_path / "job_out")
    cmd = [sys.executable, os.path.join(repo, "jobs", "run_suite.py"),
           "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir,
           "--queries", "cm2,ysb"]
    env = dict(os.environ, RAY_ADDRESS="local")
    r1 = subprocess.run(cmd, env=env, cwd=repo, capture_output=True, text=True,
                        timeout=420)
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["emitted_rows"] > 0
    r2 = subprocess.run(cmd, env=env, cwd=repo, capture_output=True, text=True,
                        timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["emitted_rows"] == s1["emitted_rows"]
    assert s2["epoch"] == s1["epoch"] + 1
    assert s2["wall_sec"] < s1["wall_sec"]      # resume skipped all partitions


def test_curation_job_end_to_end_and_resume(ray_session, sf_dir, tmp_path):
    """jobs/run_curation.py: ONE partitioning scan shards the corpus (each
    doc exactly once — no per-bucket re-scan), curated output is complete
    across buckets (union of bucket outputs = the same pipeline run
    unpartitioned), no doc appears twice, and a second run skips both the
    completed partition pass and every completed bucket."""
    import ray
    import pyarrow.parquet as pq
    import ray.data as rd

    from jobs.run_curation import (build_curation, bucket_dirs,
                                   heldout_dir, partition_corpus)
    from saber_ray.stages.curation import build_shingle_blocklist

    shards = partition_corpus(sf_dir, str(tmp_path / "shards"), 3)
    parts = bucket_dirs(shards)
    assert 1 <= len(parts) <= 3

    # scan-amplification guard: the shards hold each corpus doc EXACTLY
    # once (plus the heldout copy) — per-bucket reads are disjoint slices
    # of one scan, total shard bytes ≈ 1× corpus
    corpus = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id"])
    shard_ids = pd.concat(
        [pq.read_table(f, columns=["doc_id"]).to_pandas()
         for _, d in parts
         for f in glob.glob(os.path.join(d, "*.parquet"))],
        ignore_index=True)["doc_id"]
    assert sorted(shard_ids) == sorted(corpus["doc_id"].to_pylist())
    ho = heldout_dir(shards)
    held = pd.concat(
        [pq.read_table(f, columns=["doc_id"]).to_pandas()
         for f in glob.glob(os.path.join(ho, "*.parquet"))],
        ignore_index=True)["doc_id"]
    assert (held % 17 == 0).all()

    bl_ref = ray.put(build_shingle_blocklist(
        rd.read_parquet(ho, columns=["text"]), "text", n=3))

    out = str(tmp_path / "curated")
    m1 = run_partitioned(lambda d: build_curation(d, bl_ref), parts, out)
    assert len(m1["partitions"]) == len(parts)
    got = pq.read_table(glob.glob(os.path.join(out, "part=*/*.parquet"))
                        ).to_pandas().sort_values("doc_id")
    assert len(got) > 0
    assert got["doc_id"].is_unique            # dedup held across buckets
    assert (got["n_ws_tokens"] > 0).all()     # token stats present

    # one-bucket run over the whole corpus must produce the same doc set
    shards1 = partition_corpus(sf_dir, str(tmp_path / "shards1"), 1)
    whole = run_partitioned(
        lambda d: build_curation(d, bl_ref),
        bucket_dirs(shards1), str(tmp_path / "whole"))
    ref = pq.read_table(glob.glob(
        str(tmp_path / "whole" / "part=*/*.parquet"))).to_pandas()
    assert set(ref["doc_id"]) == set(got["doc_id"])

    # resume: the partition pass is a marker-guarded no-op...
    import os.path as osp
    mtime = osp.getmtime(osp.join(shards, "_PARTITIONED"))
    assert partition_corpus(sf_dir, str(tmp_path / "shards"), 3) == shards
    assert osp.getmtime(osp.join(shards, "_PARTITIONED")) == mtime
    # ...and nothing re-builds (manifest rows/epoch untouched per bucket)
    m2 = run_partitioned(
        lambda d: (_ for _ in ()).throw(AssertionError("must not rebuild")),
        parts, out)
    assert m2["partitions"] == m1["partitions"]


def test_jsonl_export_roundtrip_and_resume(ray_session, sf_dir, tmp_path):
    """format='jsonl': the training-export path — NDJSON shards under the
    same exactly-once commit protocol; content roundtrips through a JSON
    reader, manifest rows come from line counts, resume is a no-op."""
    import json

    import ray

    from saber_ray.pipelines.sft import sft_pairs
    from saber_ray.sources.transcripts import transcripts_from_events

    out = str(tmp_path / "export")

    def build(_spec):
        return sft_pairs(transcripts_from_events(sf_dir))

    man = run_partitioned(build, [("all", None)], out, format="jsonl")
    assert set(man["partitions"]) == {"all"}
    n = emitted_rows(out)
    assert n > 0

    files = sorted(glob.glob(os.path.join(out, "part=all", "*.json")))
    assert files
    rows = [json.loads(line) for f in files for line in open(f)]
    assert len(rows) == n
    assert set(rows[0]) == {"conv_id", "turn_idx", "prompt", "response"}
    want = sft_pairs(transcripts_from_events(sf_dir)).to_pandas()
    # JSON carries no integer width: int32 turn_idx comes back int64
    want["turn_idx"] = want["turn_idx"].astype("int64")
    got = pd.DataFrame(rows)
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[want.columns],
        want.sort_values(key).reset_index(drop=True))

    # resume skips the committed partition entirely (build never called)
    def explode(_spec):
        raise AssertionError("resume must skip completed partitions")

    man2 = run_partitioned(explode, [("all", None)], out, format="jsonl")
    assert emitted_rows(out) == n and set(man2["partitions"]) == {"all"}

    with pytest.raises(ValueError):
        run_partitioned(build, [("x", None)], str(tmp_path / "bad"),
                        format="csv")
