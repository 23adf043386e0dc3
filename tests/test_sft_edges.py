"""Adversarial edges for the SFT-pair extraction: NULL roles/text,
single-turn conversations, ties on turn order, gap boundary — all vs the
same DuckDB LEAD() oracle the driver gate uses."""

import duckdb
import pandas as pd
import pyarrow as pa

from tests.oracle_util import canon, to_pandas


def _table():
    rows = [
        # conv A: normal pair, then a gap-violating pair (7h > 6h)
        ("a", 0, "user", "q1", 0),
        ("a", 1, "assistant", "r1", 3_600_000_000),
        ("a", 2, "user", "q2", 7_200_000_000),
        ("a", 3, "assistant", "r2", 7_200_000_000 + 7 * 3_600_000_000),
        # conv B: single turn — no successor
        ("b", 0, "user", "alone", 0),
        # conv C: NULL role then NULL text
        ("c", 0, None, "x", 0),
        ("c", 1, "user", None, 1),
        ("c", 2, "assistant", "ok", 2),
        # conv D: assistant first (never a prompt), user last (no successor)
        ("d", 0, "assistant", "r", 0),
        ("d", 1, "user", "q", 1),
        # conv E: exact gap boundary (== max_gap passes)
        ("e", 0, "user", "qq", 0),
        ("e", 1, "assistant", "rr", 6 * 3_600_000_000),
    ]
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
    })


def test_sft_pairs_edges_vs_oracle(ray_session):
    import ray.data as rd

    from saber_ray.pipelines.sft import sft_pairs

    t = _table()  # noqa: F841  (DuckDB binds it by name)
    got = canon(to_pandas(sft_pairs(rd.from_arrow(t),
                                    max_gap_us=6 * 3_600_000_000)))
    want = canon(duckdb.sql("""
        SELECT conv_id, turn_idx, text AS prompt, next_text AS response
        FROM (SELECT conv_id, turn_idx, role, text, epoch_us(ts) AS tu,
                LEAD(role) OVER w AS next_role,
                LEAD(text) OVER w AS next_text,
                LEAD(epoch_us(ts)) OVER w AS next_tu
              FROM t
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
        WHERE role = 'user' AND next_role = 'assistant'
          AND next_tu - tu <= 21600000000
    """).df())
    pd.testing.assert_frame_equal(got, want)
    # sanity on the scenario itself: a/0 pairs, a/2 gap-fails, e/0 boundary
    # passes, c/1 pairs with NULL prompt text preserved
    keys = set(zip(want["conv_id"], want["turn_idx"]))
    assert keys == {("a", 0), ("c", 1), ("e", 0)}


def test_sft_pairs_length_gates(ray_session):
    import ray.data as rd

    from saber_ray.pipelines.sft import sft_pairs

    t = pa.table({
        "conv_id": ["x"] * 4,
        "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
        "role": ["user", "assistant", "user", "assistant"],
        "text": ["", "reply", "long enough", "ok"],
        "ts": pa.array([0, 1, 2, 3], pa.timestamp("us")),
    })
    # min 1 drops the empty prompt (the gate IS enforceable at 1)
    out = to_pandas(sft_pairs(rd.from_arrow(t), min_prompt_chars=1))
    assert list(out["turn_idx"]) == [2]
    # default 0 = disabled: the empty prompt passes
    out = to_pandas(sft_pairs(rd.from_arrow(t)))
    assert sorted(out["turn_idx"]) == [0, 2]
