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


def test_dynamic_partition_overwrite_is_scoped(spark, sf_dir, tmp_path):
    """Re-exporting ONE day must replace exactly that partition:
    other partitions' files stay byte-identical (same names, same
    mtimes untouched content) and their rows unchanged — the
    idempotent-republish contract overwrite_partitions provides."""
    from parquet_export_spark.export.maintenance import overwrite_partitions

    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = os.path.join(str(tmp_path), "events_dyn")
    overwrite_partitions(events, out, ["day"])
    days = sorted(r.day for r in events.select("day").distinct().collect())
    target, others = days[2], [d for d in days if d != days[2]]

    def file_state(day):
        d = os.path.join(out, f"day={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if not f.startswith(".")
        }

    before = {d: file_state(d) for d in others}
    # re-export the target day with modified values
    patch = events.filter(F.col("day") == target).withColumn(
        "value", F.col("value") * 2
    )
    overwrite_partitions(patch, out, ["day"])
    back = spark.read.parquet(out)
    # target day carries the patched values
    want = patch.agg(F.sum(F.round("value").cast("long"))).collect()[0][0]
    got = (
        back.filter(F.col("day") == target)
        .agg(F.sum(F.round("value").cast("long")))
        .collect()[0][0]
    )
    assert got == want
    # every other partition is untouched on disk
    assert {d: file_state(d) for d in others} == before
    # and total row count is preserved
    assert back.count() == events.count()
