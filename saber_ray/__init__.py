"""saber_ray — a from-scratch Ray-Data-native streaming/windowed query engine.

Re-expresses the capabilities of lsds/Saber (SIGMOD'16, window-based hybrid
stream processing; see /root/reference) as idiomatic Ray Data pipelines:

- streams        = ordered Parquet-backed ``ray.data.Dataset``s of Arrow blocks
- operators      = vectorized ``map_batches`` stages (zero-copy pyarrow)
- windowed aggs  = pane-partial combiners inside map_batches + ONE hash shuffle
                   (``groupby(keys + window_id)``) merging with the associative
                   algebra of Saber's fragment merge (PartialResultSlot.java:186-212)
- stateful ops   = actor-pool map_batches stages / groupby().map_groups
- exactly-once   = partitioned parquet sink + atomic manifest (state/checkpoint.py)

Nothing is ported: the execution engine is Ray Data's streaming executor; only
the *semantics* (window fragment algebra, operator surface, query suite) follow
the reference, cited per-module as reference file:line.
"""

from saber_ray.core.expressions import col, lit, Expr
from saber_ray.core.windows import Window
from saber_ray.core.aggregates import (AggSpec, cnt, sum_, avg, min_,
                                       max_, var_, std_, skew_, kurt_,
                                       arg_max_, arg_min_)
from saber_ray.stages.select import selection
from saber_ray.stages.project import projection
from saber_ray.stages.noop import noop
from saber_ray.stages.window_agg import windowed_aggregate, \
    assign_windows, windowed_distinct_count
from saber_ray.stages.cep import match_pattern
from saber_ray.stages.session import session_windows
from saber_ray.stages.join import windowed_join, hash_join, broadcast_join
from saber_ray.stages.topk import topk, grouped_topk
from saber_ray.stages.rolling import rolling_agg
from saber_ray.stages.shift import shift
from saber_ray.stages.rank import rank_window
from saber_ray.stages.sample import hash_sample, bottom_k_sample, \
    stratified_sample
from saber_ray.stages.heavy_hitters import heavy_hitters
from saber_ray.stages.grouping import grouping_sets, rollup, cube
from saber_ray.stages.curation import (repetition_stats, redact_pii,
                                       decontaminate, normalize_text,
                                       build_shingle_blocklist)
from saber_ray.stages.stats import grouped_quantiles, profile
from saber_ray.stages.cluster import (train_kmeans, assign_clusters,
                                      semdedup, cluster_sample)
from saber_ray.stages.embed import embed_hashed, train_idf
from saber_ray.stages.linmodel import (corr_matrix, fit_linear,
                                      predict_linear)
from saber_ray.stages.nbayes import train_nb, predict_nb

__all__ = [
    "col", "lit", "Expr", "Window", "AggSpec",
    "cnt", "sum_", "avg", "min_", "max_", "var_", "std_", "skew_", "kurt_",
    "arg_max_", "arg_min_",
    "selection", "projection", "noop", "windowed_aggregate", "session_windows",
    "assign_windows", "windowed_distinct_count",
    "match_pattern",
    "windowed_join", "hash_join", "broadcast_join", "topk",
    "grouped_topk", "rolling_agg", "shift", "rank_window",
    "hash_sample", "bottom_k_sample", "stratified_sample", "heavy_hitters",
    "grouping_sets", "rollup", "cube",
    "repetition_stats", "redact_pii", "decontaminate", "normalize_text",
    "build_shingle_blocklist", "grouped_quantiles", "profile",
    "train_kmeans", "assign_clusters", "semdedup", "cluster_sample",
    "embed_hashed",
    "train_idf", "corr_matrix", "fit_linear", "predict_linear",
    "train_nb", "predict_nb",
]

__version__ = "0.1.0"
