"""Engine tuning knobs (analogue of SystemConf/QueryConf in the reference,
reference: SystemConf.java:20-55, QueryConf.java:9 — but Ray-Data-shaped:
batch sizes, shuffle partition counts, skew salting, instead of circular
buffer sizes and worker-thread pinning)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class EngineConf:
    # rows per map_batches call in stateless vectorized stages. None lets Ray
    # use whole blocks (best for zero-copy Arrow); set for memory-heavy stages.
    batch_size: int | None = None
    # partition count for wide ops (groupby/sort) — Ray picks by default;
    # exposed for bench experiments.
    num_shuffle_partitions: int | None = None
    # salt factor for skewed keys in map_groups-based stages
    skew_salt: int = 8
    # rows under which a join side is broadcast instead of shuffled
    broadcast_threshold: int = 2_000_000
    # float output rounding used for oracle-comparable results
    round_decimals: int | None = 6


DEFAULT = EngineConf()
