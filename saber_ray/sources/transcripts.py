"""The transcript stream: schema, derivation from `events`, synthetic generator.

Input shape (BASELINE.json input_hint):
  (conv_id: string, turn_idx: int32, role: string, text: string,
   tool: string, ts: timestamp[us])

Two ways to obtain it:

1. ``transcripts_from_events`` — a deterministic, SQL-expressible derivation
   from the driver's ``events`` table, so every transcript query has an exact
   DuckDB oracle (`TRANSCRIPTS_SQL` is the same mapping in ANSI SQL). turn_idx
   is the per-conversation row number ordered by (ts, event_id) — computed
   distributed via one groupby(conv) shuffle.
2. ``generate_transcripts`` — a seeded, vectorized synthetic generator for
   benchmarks (multi-file Parquet → parallel reads). No external data.

The per-conv ordinal (turn_idx) is ALSO the ordinal column for row/count-based
windows (reference: count windows over physical stream position,
WindowBatch.java:499-643) — the documented partitioning assumption of
stages/window_agg.py row mode.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

import saber_ray.sources.parquet  # noqa: F401  (thread-safe read seeding)

SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

# The SQL twin of transcripts_from_events — prepend to oracle queries as:
#   WITH transcripts AS ({TRANSCRIPTS_SQL}) SELECT ...
TRANSCRIPTS_SQL = """
    SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
                AS INTEGER) AS turn_idx,
           CASE WHEN event_type IN ('click','view') THEN 'user'
                WHEN event_type IN ('purchase','signup') THEN 'assistant'
                ELSE 'system' END AS role,
           props AS text,
           CASE WHEN event_type = 'error' THEN 'debugger'
                WHEN event_type = 'purchase' THEN 'checkout' END AS tool,
           ts
    FROM events
"""


_ROLE_OF = {"click": "user", "view": "user",
            "purchase": "assistant", "signup": "assistant"}
_TOOL_OF = {"error": "debugger", "purchase": "checkout"}


def transcripts_from_events(sf_dir: str):
    """Derive the transcript stream from the sf dir's Parquet `events`
    table (see TRANSCRIPTS_SQL and transcripts_from_events_ds)."""
    return transcripts_from_events_ds(rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"]))


def transcripts_from_events_ds(ds):
    """Derive the transcript stream from an events Dataset (any source —
    Parquet, CSV, JSONL — with the events columns; see TRANSCRIPTS_SQL).

    Distributed per-key ordinal WITHOUT per-group dispatch (VERDICT r2 #2):
    ONE sort co-location exchange on ``user_id`` alone (Ray's sort never
    splits equal keys across blocks — and the sort key must be the group key
    ONLY, not (key, ts): equal full sort tuples co-locate, equal prefixes do
    not), then a per-block vectorized pass lexsorts by (user, ts, event_id)
    and assigns ``turn_idx`` by run detection. role/tool are dictionary-level
    lookups (one Python step per DISTINCT event_type, ≤5 values)."""
    import pyarrow.compute as pc

    def per_block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "role": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "tool": pa.array([], pa.string()),
                "ts": pa.array([], t.schema.field("ts").type)})
        t = t.combine_chunks()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts_i = t["ts"].cast(pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts_i, uid))
        t = t.take(pa.array(order))
        uid = uid[order]
        # turn_idx = per-user ordinal: arange minus each run's start offset
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        run_start = np.where(new_user, np.arange(n), 0)
        np.maximum.accumulate(run_start, out=run_start)
        turn_idx = np.arange(n) - run_start
        # conv_id = 'c' || user_id (C-level string build)
        conv_id = pc.binary_join_element_wise(
            pa.array(np.full(n, "c"), type=pa.string()),
            t["user_id"].cast(pa.string()).combine_chunks(), "")
        # role/tool: map the ≤5 distinct event_type dictionary values once.
        # A NULL event_type takes the CASE ... ELSE branch ('system' role,
        # NULL tool) like the TRANSCRIPTS_SQL twin — a null index must not
        # propagate a NULL role.
        et = t["event_type"].combine_chunks().dictionary_encode()
        vals = et.dictionary.to_pylist()
        idx = et.indices
        if idx.null_count:
            vals = vals + [None]
            idx = pc.fill_null(idx, len(vals) - 1)
        role = pa.DictionaryArray.from_arrays(
            idx,
            pa.array([_ROLE_OF.get(v, "system") for v in vals],
                     type=pa.string())).cast(pa.string())
        tool = pa.DictionaryArray.from_arrays(
            idx,
            pa.array([_TOOL_OF.get(v) for v in vals],
                     type=pa.string())).cast(pa.string())
        return pa.table({
            "conv_id": conv_id,
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": role,
            "text": t["props"].combine_chunks(),
            "tool": tool,
            "ts": t["ts"].combine_chunks(),
        })

    return ds.sort("user_id").map_batches(per_block, batch_format="pyarrow",
                                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# synthetic generator (benchmarks; deterministic, no external data)
# ---------------------------------------------------------------------------

_WORDS = np.array(
    "the quick brown fox jumps over lazy dog stream window pane merge batch "
    "agent tool call reply plan search code run test fix error retry done "
    "hello thanks please result data query join group count model token".split())
_ROLES = np.array(["user", "assistant", "system"])
_TOOLS = np.array(["search", "python", "browser", "editor"])


def _gen_chunk(chunk_id: int, n_convs: int, mean_turns: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed * 1_000_003 + chunk_id)
    turns = rng.geometric(1.0 / mean_turns, size=n_convs).clip(2, 400)
    total = int(turns.sum())
    conv_ord = np.repeat(np.arange(n_convs), turns)
    conv_id_str = np.array([f"c{chunk_id:05d}_{i:06d}" for i in range(n_convs)])
    turn_idx = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(turns)[:-1])), turns)
    # roles: alternate user/assistant, ~4% system
    role = np.where(turn_idx % 2 == 0, "user", "assistant")
    role = np.where(rng.random(total) < 0.04, "system", role)
    # tool calls on ~25% of assistant turns
    tool = np.where((role == "assistant") & (rng.random(total) < 0.25),
                    _TOOLS[rng.integers(0, len(_TOOLS), total)], None)
    # text: 3-40 words — vectorized via Arrow list + binary_join (no row loop)
    import pyarrow.compute as pc
    nw = rng.integers(3, 41, size=total)
    words = _WORDS[rng.integers(0, len(_WORDS), size=int(nw.sum()))]
    offsets = np.concatenate(([0], np.cumsum(nw))).astype(np.int32)
    word_arr = pa.array(words, type=pa.string())
    if isinstance(word_arr, pa.ChunkedArray):
        word_arr = word_arr.combine_chunks()
    word_lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                          word_arr)
    text = pc.binary_join(word_lists, " ")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # ts: conv start uniform over 30 days, gaps lognormal seconds w/ occasional
    # session-sized gaps (> 30 min) for sessionization workloads
    base = np.int64(1_700_000_000_000_000)  # fixed epoch anchor, us
    conv_start = rng.integers(0, 30 * 86_400_000_000, size=n_convs)
    gaps = (rng.lognormal(1.5, 1.0, size=total) * 1_000_000).astype(np.int64)
    big = rng.random(total) < 0.02
    gaps[big] += np.int64(45 * 60 * 1_000_000)
    gaps[turn_idx == 0] = 0
    # per-conv cumulative gap: global cumsum minus the cumsum at each conv start
    cs = np.cumsum(gaps)
    conv_first = np.concatenate(([0], np.cumsum(turns)[:-1]))
    offset = np.repeat(cs[conv_first] - gaps[conv_first], turns)
    ts = base + conv_start[conv_ord] + (cs - offset)
    return pa.table({
        "conv_id": pa.array(conv_id_str[conv_ord], type=pa.string()),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": text,
        "tool": pa.array(tool, type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


def generate_transcripts(out_dir: str, *, n_turns: int = 1_000_000,
                         mean_turns: int = 12, seed: int = 42,
                         n_files: int = 32, force: bool = False) -> str:
    """Write a deterministic synthetic transcript table as n_files parquet
    files under out_dir. Returns out_dir. Cached: skipped when the manifest
    matches (same params → same bytes)."""
    tag = f"turns={n_turns} mean={mean_turns} seed={seed} files={n_files} v1"
    manifest = os.path.join(out_dir, "_MANIFEST")
    if not force and os.path.exists(manifest) and open(manifest).read() == tag:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    convs_per_file = max(1, n_turns // (mean_turns * n_files))

    def _write_one(i: int) -> None:
        t = _gen_chunk(i, convs_per_file, mean_turns, seed)
        pq.write_table(t, os.path.join(out_dir, f"part-{i:05d}.parquet"),
                       row_group_size=64 * 1024)

    import ray
    if ray.is_initialized():
        gen = ray.remote(_write_one)
        ray.get([gen.remote(i) for i in range(n_files)])
    else:
        for i in range(n_files):
            _write_one(i)
    with open(manifest, "w") as f:
        f.write(tag)
    return out_dir


def read_transcripts(path: str, *, columns=None, **kwargs):
    return rd.read_parquet(path, columns=list(columns) if columns else None,
                           **kwargs)
