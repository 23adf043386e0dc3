"""SFT training-pair extraction from agent transcripts.

The composition a training-data user actually runs over the north-rule
transcript table: pair every user turn with the immediately-following
assistant turn of the same conversation → (prompt, response) rows for
supervised fine-tuning. Built entirely from existing engine stages —
``shift`` (one null-safe sort co-location exchange, then per-block Arrow
takes; stages/shift.py) + a vectorized predicate — so it inherits their
100 TB shape: the only exchange is the (conv_id, turn_idx) sort, strings
never leave Arrow, and the output streams.

SQL twin (exact, no floats):

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


def sft_pairs(ts_ds, *, user_role: str = "user",
              assistant_role: str = "assistant",
              max_gap_us: Optional[int] = None,
              min_prompt_chars: int = 1,
              min_response_chars: int = 1):
    """(conv_id, turn_idx, prompt, response) pairs: each ``user_role``
    turn joined to its immediate ``assistant_role`` successor within the
    conversation, optionally gated on reply latency (``max_gap_us``) and
    minimum text lengths. Expects the transcript schema (conv_id,
    turn_idx, role, text, ts)."""
    need_ts = max_gap_us is not None
    specs = {"next_role": ("role", -1), "next_text": ("text", -1)}
    keep = ["role", "text"] + (["ts"] if need_ts else [])
    if need_ts:
        specs["next_ts"] = ("ts", -1)
    shifted = shift(ts_ds, "conv_id", "turn_idx", specs, keep=keep)

    def to_pairs(t: pa.Table) -> pa.Table:
        m = pc.and_kleene(pc.equal(t["role"], user_role),
                          pc.equal(t["next_role"], assistant_role))
        if min_prompt_chars > 1:
            m = pc.and_kleene(m, pc.greater_equal(
                pc.utf8_length(t["text"]), min_prompt_chars))
        if min_response_chars > 1:
            m = pc.and_kleene(m, pc.greater_equal(
                pc.utf8_length(t["next_text"]), min_response_chars))
        if need_ts:
            gap = pc.subtract(t["next_ts"].cast(pa.int64()),
                              t["ts"].cast(pa.int64()))
            m = pc.and_kleene(m, pc.less_equal(gap, max_gap_us))
        t = t.filter(pc.fill_null(m, False))
        return pa.table({"conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
                         "prompt": t["text"], "response": t["next_text"]})

    return shifted.map_batches(to_pairs, batch_format="pyarrow",
                               zero_copy_batch=True)
