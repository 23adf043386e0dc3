"""SFT training-pair extraction from agent transcripts — batch + streaming.

The composition a training-data user actually runs over the north-rule
transcript table: pair every user turn with the immediately-following
assistant turn of the same conversation → (prompt, response) rows for
supervised fine-tuning. Built entirely from existing engine stages so it
inherits their 100 TB shape:

- batch: ``stages/shift.py`` (one null-safe sort co-location exchange,
  per-block Arrow takes) + the vectorized pair predicate;
- streaming: ``streaming_shift.StreamingShift`` (watermark-sealed
  LAG/LEAD emission, bounded per-key context, exactly-once resume) with
  the SAME pair predicate mapped over its emissions — the engine's
  flagship payload at 10^12-turn scale: training pairs extracted
  continuously from an unbounded transcript stream.

Both paths share ``_pairs_batch``; the whole-stream SQL twin is exact
(no floats):

    SELECT conv_id, turn_idx, text AS prompt, next_text AS response
    FROM (... LEAD(role/text/ts) OVER (PARTITION BY conv_id
              ORDER BY turn_idx) ...)
    WHERE role = 'user' AND next_role = 'assistant'
      [AND next_ts_us - ts_us <= max_gap_us]
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from saber_ray.stages.shift import shift


def _pairs_batch(t: pa.Table, *, user_role: str, assistant_role: str,
                 max_gap_us: Optional[int], min_prompt_chars: int,
                 min_response_chars: int) -> pa.Table:
    """Vectorized pair predicate + projection over a shifted table
    (columns role, text, next_role, next_text [, ts, next_ts])."""
    m = pc.and_kleene(pc.equal(t["role"], user_role),
                      pc.equal(t["next_role"], assistant_role))
    if min_prompt_chars > 0:
        m = pc.and_kleene(m, pc.greater_equal(
            pc.utf8_length(t["text"]), min_prompt_chars))
    if min_response_chars > 0:
        m = pc.and_kleene(m, pc.greater_equal(
            pc.utf8_length(t["next_text"]), min_response_chars))
    if max_gap_us is not None:
        gap = pc.subtract(t["next_ts"].cast(pa.int64()),
                          t["ts"].cast(pa.int64()))
        m = pc.and_kleene(m, pc.less_equal(gap, max_gap_us))
    t = t.filter(pc.fill_null(m, False))
    return pa.table({"conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
                     "prompt": t["text"], "response": t["next_text"]})


def sft_pairs(ts_ds, *, user_role: str = "user",
              assistant_role: str = "assistant",
              max_gap_us: Optional[int] = None,
              min_prompt_chars: int = 0,
              min_response_chars: int = 0):
    """(conv_id, turn_idx, prompt, response) pairs: each ``user_role``
    turn joined to its immediate ``assistant_role`` successor within the
    conversation, optionally gated on reply latency (``max_gap_us``) and
    minimum text lengths (0 = disabled; 1 already drops empty strings).
    Expects the transcript schema (conv_id, turn_idx, role, text, ts)."""
    need_ts = max_gap_us is not None
    specs = {"next_role": ("role", -1), "next_text": ("text", -1)}
    keep = ["role", "text"] + (["ts"] if need_ts else [])
    if need_ts:
        specs["next_ts"] = ("ts", -1)
    shifted = shift(ts_ds, "conv_id", "turn_idx", specs, keep=keep)

    def to_pairs(t: pa.Table) -> pa.Table:
        return _pairs_batch(
            t, user_role=user_role, assistant_role=assistant_role,
            max_gap_us=max_gap_us, min_prompt_chars=min_prompt_chars,
            min_response_chars=min_response_chars)

    return shifted.map_batches(to_pairs, batch_format="pyarrow",
                               zero_copy_batch=True)


def streaming_sft_pairs(out_dir: str, files, *, epoch_size: int = 2,
                        user_role: str = "user",
                        assistant_role: str = "assistant",
                        max_gap_us: Optional[int] = None,
                        min_prompt_chars: int = 0,
                        min_response_chars: int = 0,
                        num_partitions: int = 4,
                        allowed_lateness: int = 0):
    """The streaming twin: drive ``StreamingShift`` over the ordered file
    stream (epoch/checkpoint/exactly-once protocol inherited from the
    keyed engine), then apply the same pair predicate to its sealed
    emissions. Returns an in-memory pyarrow Table (the keyed engines'
    ``results()`` convention — emissions read back from the exactly-once
    output shards), unlike batch :func:`sft_pairs` which returns a
    streaming Dataset; whole-stream rows are equal."""
    from saber_ray.streaming_shift import StreamingShift

    need_ts = max_gap_us is not None
    specs = {"next_role": ("role", -1), "next_text": ("text", -1)}
    if need_ts:
        specs["next_ts"] = ("ts", -1)
    job = StreamingShift(out_dir, specs=specs, keys=["conv_id"],
                         ts_col="ts", tiebreak=["turn_idx"],
                         keep=["role", "text"],
                         num_partitions=num_partitions,
                         allowed_lateness=allowed_lateness)
    job.run(files, epoch_size=epoch_size)

    # results() is an in-memory Table (emissions, read back from the
    # exactly-once output shards) — apply the predicate directly
    return _pairs_batch(
        job.results().combine_chunks(), user_role=user_role,
        assistant_role=assistant_role, max_gap_us=max_gap_us,
        min_prompt_chars=min_prompt_chars,
        min_response_chars=min_response_chars)
