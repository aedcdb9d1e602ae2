"""Operator-level utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def maybe_fanout(df: DataFrame, min_fraction_of_cores: int = 4) -> DataFrame:
    """Fan a starved scan out across cores; no-op when the input
    already parallelizes.

    Single-row-group files (or any source with fewer splits than
    cores) pin map-side work — e.g. the per-row decimal casts feeding
    a partial aggregate — to a handful of tasks. When input partitions
    < cores/4 we insert one round-robin repartition so that work
    spreads. On a real multi-file lake input partitions >> cores and
    this returns the input unchanged: no shuffle is ever added at
    scale (SCALE.md, Scan & ingest).
    """
    cores = df.sparkSession.sparkContext.defaultParallelism
    target = max(cores // min_fraction_of_cores, 2)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def fanout_by_key(
    df: DataFrame, key: str, min_fraction_of_cores: int = 4
) -> DataFrame:
    """Key-hash variant of :func:`maybe_fanout` for the multimodal
    payload builders: same starved-scan rule (fan out only when input
    partitions < cores/4, no-op — and no shuffle — when the source is
    already wide), but hash-partitioned on ``key`` so a later
    key-grouped stage can reuse the exchange."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    target = max(cores // min_fraction_of_cores, 2)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key)
