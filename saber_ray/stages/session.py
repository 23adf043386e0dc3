"""Session windows with gap timeout.

North-rule extension — the reference has no session windows (its
WindowDefinition.java:5-8 supports only ROW/RANGE tumbling/sliding); semantics
are defined here and property-tested:

  For each key, sort events by (ts, *order_by); a new session starts at the
  first event and whenever ``ts - prev_ts > gap``. ``session_id`` is the
  0-based session ordinal within the key. One output row per (key, session)
  with the requested aggregates plus session bounds.

Ray-native: ``groupby(keys).map_groups`` — the hash shuffle co-locates each
key, the per-group function is vectorized pandas (diff → cumsum → groupby).
State never outlives a group; a streaming deployment would hold open sessions
in the checkpointed pane store (state/checkpoint.py) keyed by conv_id and
close them when the watermark passes ``last_ts + gap``.

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

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        g = g.sort_values([ts_col] + order_by, kind="mergesort")
        t = _ts_to_us(g[ts_col])
        brk = np.zeros(len(t), dtype=np.int64)
        brk[1:] = (np.diff(t) > sw.gap).astype(np.int64)
        g = g.assign(__sess=np.cumsum(brk), __t=t)
        gb = g.groupby("__sess", sort=True)
        out = pd.DataFrame({k: gb[k].first() for k in keys})
        out["session_id"] = out.index.to_numpy(dtype=np.int64)
        out["session_start_us"] = gb["__t"].min()
        out["session_end_us"] = gb["__t"].max()
        for a in aggs:
            s = _agg_series(gb, a)
            if round_decimals is not None and s.dtype.kind == "f":
                # correctly-rounded, matching the SQL oracle's ROUND
                s = s.map(lambda v: round(v, round_decimals))
            out[a.alias] = s
        return out.reset_index(drop=True)

    return ds.groupby(keys).map_groups(per_key, batch_format="pandas")
