"""Scale patterns as first-class operators (SURVEY.md §7.4 rules).

- **Salted aggregation**: two-phase groupBy for skewed keys — phase 1
  aggregates (key, salt) partials, phase 2 merges per key. Results are
  identical to a plain groupBy (so it carries a DuckDB oracle); the
  point is the shuffle histogram: no single reducer owns a hot key.
- **Bucketed co-located join**: persist both join sides bucketed by
  the join key; subsequent joins read bucket-aligned partitions and
  skip the shuffle entirely (verified by plan assertion in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_export_spark.functions.scalar import dsum

N_SALTS = 16


def salted_agg_user_value(t: dict[str, DataFrame], n_salts: int = N_SALTS) -> DataFrame:
    """Per-user event totals via salt -> partial -> merge.

    A plain ``groupBy(user_id)`` sends every row of a hot user to one
    reducer; salting spreads each key over ``n_salts`` partials first.
    Counts and exact-decimal sums re-aggregate losslessly.
    """
    ev = t["events"]
    salted = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(n_salts)))
    partial = salted.groupBy("user_id", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("value").cast("decimal(30,6)")).alias("_v"),
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("_n").alias("n_events"),
            F.sum("_v").cast("double").alias("total_value"),
        )
        .orderBy("user_id")
    )


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist a bucketed managed table (bucket pruning + shuffle-free
    joins on the bucket column)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join_revenue(spark: SparkSession) -> DataFrame:
    """Join two pre-bucketed tables on the bucket key.

    With both sides bucketed by the key into the same bucket count,
    Catalyst plans a SortMergeJoin with NO Exchange on either side —
    at 100 TB this removes the dominant shuffle of fact-fact joins.
    Requires ``write_bucketed`` to have materialized
    ``bkt_lineitem`` / ``bkt_orders``.
    """
    li = spark.table("bkt_lineitem")
    o = spark.table("bkt_orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
        .orderBy("o_orderstatus")
    )
