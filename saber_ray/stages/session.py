"""Session windows with gap timeout.

North-rule extension — the reference has no session windows (its
WindowDefinition.java:5-8 supports only ROW/RANGE tumbling/sliding); semantics
are defined here and property-tested:

  For each key, sort events by (ts, *order_by); a new session starts at the
  first event and whenever ``ts - prev_ts > gap``. ``session_id`` is the
  0-based session ordinal within the key. One output row per (key, session)
  with the requested aggregates plus session bounds.

Ray-native: ONE range shuffle ``sort(keys)`` co-locates and orders each key
(Ray's sort partitions by value boundaries, so equal keys never split across
reduce outputs — same invariant stages/window_agg.py's sortmerge relies on),
then a per-block vectorized pandas pass sessionizes EVERY key in the block at
once (lexsort → diff → cumsum → groupby agg) — no per-group Python call, no
per-group function dispatch. State never outlives a block; a streaming
deployment would hold open sessions in the checkpointed pane store
(state/checkpoint.py) keyed by conv_id and close them when the watermark
passes ``last_ts + gap``.

Scale note: one group = one conversation — bounded and small for transcripts.
The shuffle key is conv_id; skew means a single huge conversation, which is
bounded by context-length in practice (documented partitioning assumption).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from saber_ray.core.aggregates import AggSpec, CNT, AVG
from saber_ray.core.windows import SessionWindow


def _ts_to_us(s: pd.Series) -> np.ndarray:
    """Event time → int64 epoch microseconds, robust to pandas datetime64
    resolution (ns in pandas<2 round-trips, us when Arrow timestamp[us]
    converts directly) and to already-integer ordinal columns."""
    if s.dtype.kind in "iu":
        return s.to_numpy(dtype=np.int64)
    return s.astype("datetime64[us]").astype("int64").to_numpy()


def _agg_series(gb, a: AggSpec) -> pd.Series:
    if a.op == CNT and a.column is None:
        return gb.size()
    if a.op == CNT:
        return gb[a.column].count()
    if a.op == AVG:
        return gb[a.column].mean()
    return getattr(gb[a.column], a.op)()


def session_windows(
    ds,
    *,
    gap: int,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = ("conv_id",),
    ts_col: str = "ts",
    order_by: Sequence[str] = (),
    round_decimals: Optional[int] = None,
):
    """Sessionize per key; returns one row per (key..., session_id)."""
    sw = SessionWindow(gap)
    keys = list(keys)
    order_by = list(order_by)
    aggs = list(aggs)

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        # block holds complete key groups (sorted by keys); order within each
        # key by (ts, order_by) and sessionize all keys in one vector pass.
        g = g.sort_values(keys + [ts_col] + order_by,
                          kind="mergesort").reset_index(drop=True)
        t = _ts_to_us(g[ts_col])
        same_key = np.ones(len(g), dtype=bool)
        for k in keys:
            kv = g[k].to_numpy()
            same_key[1:] &= kv[1:] == kv[:-1]
        same_key[0] = False
        brk = np.ones(len(t), dtype=np.int64)      # new session at key change
        brk[1:] = np.where(same_key[1:] & (np.diff(t) <= sw.gap), 0, 1)
        sess = np.cumsum(brk) - 1                  # global session ordinal
        # session_id = ordinal within the key (0-based)
        first_of_key = ~same_key
        key_start_sess = np.where(first_of_key, sess, 0)
        np.maximum.accumulate(key_start_sess, out=key_start_sess)
        g = g.assign(__sess=sess, __sid=sess - key_start_sess, __t=t)
        gb = g.groupby("__sess", sort=True)
        out = pd.DataFrame({k: gb[k].first() for k in keys})
        out["session_id"] = gb["__sid"].first().to_numpy(dtype=np.int64)
        out["session_start_us"] = gb["__t"].min()
        out["session_end_us"] = gb["__t"].max()
        for a in aggs:
            s = _agg_series(gb, a)
            if round_decimals is not None and s.dtype.kind == "f":
                # correctly-rounded, matching the SQL oracle's ROUND
                s = s.map(lambda v: round(v, round_decimals))
            out[a.alias] = s
        return out.reset_index(drop=True)

    return ds.sort(keys).map_batches(per_block, batch_format="pandas")
