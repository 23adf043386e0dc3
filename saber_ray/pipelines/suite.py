"""The headline query suite: CM1/CM2, SG1-SG3, YSB — re-targeted to transcripts.

Saber's paper benchmark suite (SURVEY.md §7.0; the reference's benchmark
scripts are stubs — scripts/experiments/benchmarks/cluster-monitoring/
cluster-monitoring.sh:1-5 is `CLS="TBD"`, so queries follow the published
SIGMOD'16 §6 workloads and the Google-cluster schema of
DemoWithGoogleClusterData.java:127-155), mapped onto the transcript stream:

- CM1  grouped windowed SUM over a categorical key →
       SUM(length(text)) per role, sliding window
- CM2  grouped windowed AVG per id key → AVG(length(text)) per tool (tool≠null)
- SG1  sliding GLOBAL AVG over ts (no key)
- SG2  sliding per-key AVG, key = conv_id (the hot-key skew case)
- SG3  per-key aggregate joined against the global aggregate → count of
       above-average keys per window
- YSB  filter → project → broadcast-join small dim table → tumbling COUNT per
       joined key (Yahoo streaming benchmark shape)

Every pipeline keeps the wide ``text`` column OUT of the shuffle: text length
is derived in the first stateless map_batches, then only (key, window,
partial) rows move (SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
import pyarrow as pa

from saber_ray import (Window, avg, cnt, col, projection, selection, sum_,
                       windowed_aggregate, broadcast_join)
from saber_ray.core.windows import DAY, HOUR


@dataclass(frozen=True)
class SuiteWindows:
    """Window parameters, scaled to the input's time span."""
    cm1: Window
    cm2: Window
    sg: Window      # shared by SG1/SG2/SG3 so SG3's join keys line up
    ysb: Window


# events-derived transcripts span ~30 days → day-scale windows
DEFAULT = SuiteWindows(
    cm1=Window.sliding(2 * DAY, 12 * HOUR),
    cm2=Window.tumbling(DAY),
    sg=Window.sliding(4 * DAY, DAY),
    ysb=Window.tumbling(6 * HOUR),
)

# tool → campaign dim table (YSB's static campaign join, broadcast via ray.put)
TOOL_DIM = pa.table({
    "tool": ["debugger", "checkout", "search", "python", "browser", "editor"],
    "campaign": ["ops", "sales", "research", "eng", "research", "eng"],
})
TOOL_DIM_SQL = ("(VALUES ('debugger','ops'), ('checkout','sales'), "
                "('search','research'), ('python','eng'), ('browser','research'), "
                "('editor','eng')) AS dim(tool, campaign)")


def _with_text_len(ts_ds, keep):
    """Derive text_len and DROP the wide text column immediately — only
    (keep..., ts, text_len) flow further (SURVEY.md §7.4: text never enters
    a shuffle). Callers select the needed input columns first so the parquet
    read prunes at the source."""
    return projection(ts_ds, [col("text").str_len().cast(pa.int64()).alias("text_len"),
                              col("ts").alias("ts")],
                      keep=list(keep))


def cm1(ts_ds, w: Window = DEFAULT.cm1, **kw):
    """Sliding grouped SUM(length(text)) per role."""
    ds = _with_text_len(ts_ds.select_columns(["role", "ts", "text"]), keep=["role"])
    kw.setdefault("merge", "tree")      # 4 roles × windows — bounded output
    return windowed_aggregate(ds, window=w, keys=["role"],
                              aggs=[sum_("text_len", "sum_len"), cnt(alias="n_turns")],
                              round_decimals=6, **kw)


def cm2(ts_ds, w: Window = DEFAULT.cm2, **kw):
    """Tumbling grouped AVG(length(text)) per tool, tool IS NOT NULL."""
    ds = _with_text_len(ts_ds.select_columns(["tool", "ts", "text"]), keep=["tool"])
    ds = selection(ds, col("tool").is_not_null())
    kw.setdefault("merge", "tree")      # ~16 tools × windows — bounded output
    return windowed_aggregate(ds, window=w, keys=["tool"],
                              aggs=[avg("text_len", "avg_len"), cnt(alias="n_turns")],
                              round_decimals=6, **kw)


def sg1(ts_ds, w: Window = DEFAULT.sg, **kw):
    """Sliding GLOBAL AVG(length(text))."""
    ds = _with_text_len(ts_ds.select_columns(["ts", "text"]), keep=[])
    kw.setdefault("merge", "tree")      # global: one row per window
    return windowed_aggregate(ds, window=w,
                              aggs=[avg("text_len", "avg_len"), cnt(alias="n_turns")],
                              round_decimals=6, **kw)


def sg2(ts_ds, w: Window = DEFAULT.sg, **kw):
    """Sliding per-conv_id AVG(length(text)) — the hot-key case. The pane
    combiner bounds each key to one partial per (batch, window), which is the
    skew mitigation (window_agg.py scale notes)."""
    ds = _with_text_len(ts_ds.select_columns(["conv_id", "ts", "text"]),
                        keep=["conv_id"])
    return windowed_aggregate(ds, window=w, keys=["conv_id"],
                              aggs=[avg("text_len", "avg_len")],
                              round_decimals=6, **kw)


def sg3(ts_ds, w: Window = DEFAULT.sg, **kw):
    """Per-window count of conversations whose avg text length exceeds the
    window's global avg (SG outlier query): SG2 ⋈ SG1 on window_id.

    Single-scan: ONE pass + ONE pane-merge shuffle computes per-(conv, window)
    (sum, cnt) partials; the global average per window is re-derived from
    those same partials (sum of sums / sum of counts — the associative
    algebra guarantees equality with a fresh SG1 scan), so the input is read
    once, not twice. The materialized per-conv aggregate is |convs|×|windows|
    rows — orders of magnitude below the input, safe to hold. The global side
    (≤ #windows rows) broadcast-joins back with ray.put, no second shuffle."""
    ds = _with_text_len(ts_ds.select_columns(["conv_id", "ts", "text"]),
                        keep=["conv_id"])
    per_conv = windowed_aggregate(
        ds, window=w, keys=["conv_id"],
        aggs=[avg("text_len", "avg_len"), sum_("text_len", "__s"),
              cnt("text_len", "__c")],
        round_decimals=6, **kw).materialize()

    # global avg per window: in-block partial sums + one-task fan-in — the
    # output is ≤ #windows rows, no all-to-all needed.
    def _gpartial(t: pa.Table) -> pa.Table:
        return t.select(["window_id", "__s", "__c"]).group_by(
            ["window_id"], use_threads=False).aggregate(
            [("__s", "sum"), ("__c", "sum")]).rename_columns(
            ["window_id", "__s", "__c"])
    gdf = per_conv.map_batches(_gpartial, batch_format="pyarrow",
                               zero_copy_batch=True) \
                  .repartition(1) \
                  .map_batches(_gpartial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    from saber_ray.core.aggregates import round_oracle_np
    global_avg = pd.DataFrame({
        "window_id": gdf["window_id"],
        "global_avg": round_oracle_np(
            (gdf["__s"].to_numpy(dtype="float64")
             / gdf["__c"].to_numpy(dtype="float64")), 6),
    })
    joined = broadcast_join(per_conv.drop_columns(["__s", "__c"]),
                            global_avg, on="window_id")
    hot = selection(joined, col("avg_len") > col("global_avg"))

    # count hot convs per window: same in-block partial + fan-in shape.
    def _cpartial(t: pa.Table) -> pa.Table:
        if "n_hot_convs" in t.column_names:
            return t.group_by(["window_id"], use_threads=False).aggregate(
                [("n_hot_convs", "sum")]).rename_columns(
                ["window_id", "n_hot_convs"])
        return t.group_by(["window_id"], use_threads=False).aggregate(
            [([], "count_all")]).rename_columns(["window_id", "n_hot_convs"])
    return hot.map_batches(_cpartial, batch_format="pyarrow",
                           zero_copy_batch=True) \
              .repartition(1) \
              .map_batches(_cpartial, batch_format="pyarrow",
                           zero_copy_batch=True)


def ysb(ts_ds, w: Window = DEFAULT.ysb, **kw):
    """Filter(role='assistant' AND tool NOT NULL) → project → broadcast join
    dim(tool → campaign) → tumbling COUNT per campaign."""
    ds = ts_ds.select_columns(["role", "tool", "ts"])
    ds = selection(ds, (col("role") == "assistant") & col("tool").is_not_null())
    ds = projection(ds, [col("tool").alias("tool"), col("ts").alias("ts")])
    joined = broadcast_join(ds, TOOL_DIM, on="tool")
    kw.setdefault("merge", "tree")      # few campaigns × windows
    return windowed_aggregate(joined, window=w, keys=["campaign"],
                              aggs=[cnt(alias="n_turns")], **kw)
