"""CSV/JSONL sources vs the Parquet source contract (values, pruning,
global ordinal, fragment boundaries).

Row ARRIVAL order is not part of the contract (Ray Data schedules blocks
freely, same as the Parquet source); the deterministic-order contract is
the global ordinal column — every test that checks order keys on it.
"""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from saber_ray.sources.text_files import read_csv, read_jsonl
from tests.oracle_util import to_pandas

CTYPES = {"event_id": pa.int64(), "ts": pa.int64(),
          "user_id": pa.int64(), "value": pa.float64()}


@pytest.fixture(scope="module")
def events_twins(tmp_path_factory, sf_dir):
    """CSV and JSONL twins of the events table, split over two files."""
    root = tmp_path_factory.mktemp("text_src")
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     t["ts"].cast(pa.int64()))
    half = t.num_rows // 2
    for i, part in enumerate([t.slice(0, half), t.slice(half)]):
        pacsv.write_csv(part, str(root / f"ev{i}.csv"))
        with open(root / f"ev{i}.jsonl", "w") as f:
            for row in part.to_pylist():
                f.write(json.dumps(row) + "\n")
    return str(root), t


def _sorted_by(df, col):
    return df.sort_values(col, kind="mergesort").reset_index(drop=True)


def test_csv_roundtrip_values(ray_session, events_twins):
    root, t = events_twins
    got = to_pandas(read_csv(root, column_types=CTYPES))
    want = t.to_pandas()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(_sorted_by(got, "event_id"),
                                  _sorted_by(want, "event_id"),
                                  check_dtype=False)


def test_csv_tiny_fragments_split_on_lines(ray_session, events_twins):
    """target_bytes far below line size forces every boundary case: each
    line is read exactly once, by the fragment it starts in — no dup, no
    loss, regardless of where byte boundaries cut."""
    root, t = events_twins
    got = to_pandas(read_csv(root, column_types=CTYPES, target_bytes=256))
    pd.testing.assert_frame_equal(_sorted_by(got, "event_id"),
                                  _sorted_by(t.to_pandas(), "event_id"),
                                  check_dtype=False)


def test_csv_column_pruning(ray_session, events_twins):
    root, _ = events_twins
    got = read_csv(root, columns=["event_id", "event_type"],
                   column_types=CTYPES)
    assert set(got.schema().names) == {"event_id", "event_type"}


def test_csv_global_ordinal_is_line_position(ray_session, events_twins):
    """Ordinals are the exact global line positions — a permutation of
    0..n-1 that, once sorted on, reproduces the files' line order exactly
    (the deterministic-order contract), independent of fragmentation."""
    root, t = events_twins
    got = to_pandas(read_csv(root, column_types=CTYPES, target_bytes=512,
                             with_global_ordinal=True))
    got = _sorted_by(got, "__ord")
    assert (got["__ord"].to_numpy() == np.arange(t.num_rows)).all()
    assert (got["event_id"].to_numpy()
            == t["event_id"].to_numpy()).all()


def test_jsonl_roundtrip(ray_session, events_twins):
    root, t = events_twins
    got = to_pandas(read_jsonl(root, target_bytes=2048))
    want = t.to_pandas()
    got = got[list(want.columns)]
    pd.testing.assert_frame_equal(_sorted_by(got, "event_id"),
                                  _sorted_by(want, "event_id"),
                                  check_dtype=False)


def test_jsonl_pruning_and_ordinal(ray_session, events_twins):
    root, t = events_twins
    got = to_pandas(read_jsonl(root, columns=["event_id"],
                               with_global_ordinal=True))
    assert list(got.columns) == ["event_id", "__ord"]
    got = _sorted_by(got, "__ord")
    assert (got["__ord"].to_numpy() == np.arange(t.num_rows)).all()
    assert (got["event_id"].to_numpy()
            == t["event_id"].to_numpy()).all()


@pytest.fixture(scope="module")
def gz_twins(tmp_path_factory, sf_dir):
    """Gzipped CSV/JSONL shards of the events table: 3 .gz shards plus one
    PLAIN shard mixed into the same directory (per the reader contract),
    one gz shard written as concatenated members (multi-member gzip)."""
    import gzip
    root = tmp_path_factory.mktemp("text_src_gz")
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     t["ts"].cast(pa.int64()))
    q = t.num_rows // 4
    parts = [t.slice(0, q), t.slice(q, q), t.slice(2 * q, q),
             t.slice(3 * q)]
    import io as _io
    for i, part in enumerate(parts):
        sink = _io.BytesIO()
        pacsv.write_csv(part, sink)
        csv_bytes = sink.getvalue()
        jl = "".join(json.dumps(r) + "\n" for r in part.to_pylist()) \
            .encode()
        if i == 3:                       # plain shard mixed in
            (root / f"ev{i}.csv").write_bytes(csv_bytes)
            (root / f"ev{i}.jsonl").write_bytes(jl)
        elif i == 2:                     # multi-member gzip: one logical
            # shard stored as two concatenated members (header only in
            # the first — it is one csv stream, just compressed in parts)
            half = len(jl) // 2
            cut = jl.rfind(b"\n", 0, half) + 1
            (root / f"ev{i}.jsonl.gz").write_bytes(
                gzip.compress(jl[:cut]) + gzip.compress(jl[cut:]))
            chalf = csv_bytes.find(b"\n", len(csv_bytes) // 2) + 1
            (root / f"ev{i}.csv.gz").write_bytes(
                gzip.compress(csv_bytes[:chalf])
                + gzip.compress(csv_bytes[chalf:]))
        else:
            (root / f"ev{i}.csv.gz").write_bytes(gzip.compress(csv_bytes))
            (root / f"ev{i}.jsonl.gz").write_bytes(gzip.compress(jl))
    return str(root), t


def test_gz_csv_roundtrip_mixed_shards(ray_session, gz_twins):
    """.csv.gz shards (incl. one multi-member) + a plain .csv in one dir:
    values and global line order match the source table exactly."""
    root, t = gz_twins
    got = to_pandas(read_csv(root, column_types=CTYPES,
                             with_global_ordinal=True))
    want = t.to_pandas()
    got = _sorted_by(got, "__ord")
    assert (got["__ord"].to_numpy() == np.arange(t.num_rows)).all()
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    pd.testing.assert_frame_equal(
        got[list(want.columns)], want, check_dtype=False)


def test_gz_jsonl_roundtrip_and_pruning(ray_session, gz_twins):
    root, t = gz_twins
    got = to_pandas(read_jsonl(root, columns=["event_id"],
                               with_global_ordinal=True))
    assert list(got.columns) == ["event_id", "__ord"]
    got = _sorted_by(got, "__ord")
    assert (got["__ord"].to_numpy() == np.arange(t.num_rows)).all()
    assert (got["event_id"].to_numpy()
            == t["event_id"].to_numpy()).all()


def test_empty_gz_shard_is_skipped(ray_session, gz_twins, tmp_path):
    """A 0-byte .gz (interrupted writer) and an empty-but-valid gzip
    member must be skipped, not poison the CSV header or crash."""
    import gzip
    import shutil
    root, t = gz_twins
    alt = tmp_path / "with_empty"
    shutil.copytree(root, alt)
    (alt / "aaa0.csv.gz").write_bytes(b"")             # sorts FIRST
    (alt / "aaa1.csv.gz").write_bytes(gzip.compress(b""))
    (alt / "aaa0.jsonl.gz").write_bytes(b"")
    got = to_pandas(read_csv(str(alt), column_types=CTYPES))
    assert len(got) == t.num_rows
    got_j = to_pandas(read_jsonl(str(alt), columns=["event_id"]))
    assert len(got_j) == t.num_rows
