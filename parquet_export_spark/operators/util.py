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
