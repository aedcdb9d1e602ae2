"""Hive-partitioned output + partition pruning (data-skipping layer)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parquet_export_spark.export.writer import write_table
from parquet_export_spark.plans import inspect as P
from parquet_export_spark.sources.lake import load_table
from parquet_export_spark.tables import TableSpec

SPEC = TableSpec(name="events_by_day", datatypes={}, rows_per_file=100_000)


def test_partitioned_write_and_prune(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path)
    files = write_table(events, out, SPEC, partition_by=["day"])
    assert files and all("day=" in f for f in files)
    n_days = events.select("day").distinct().count()
    assert len({f.split("/")[0] for f in files}) == n_days

    back = spark.read.parquet(os.path.join(out, SPEC.name))
    one_day = back.filter(F.col("day") == "2024-01-05")
    plan = P.plan_string(one_day)
    # the date predicate prunes partitions at plan time — it appears in
    # PartitionFilters, not as a data filter
    assert "PartitionFilters" in plan
    assert "2024-01-05" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    want = events.filter(F.col("day") == "2024-01-05").count()
    assert one_day.count() == want > 0
