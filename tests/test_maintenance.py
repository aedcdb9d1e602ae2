"""MERGE/upsert and compaction tests."""

from __future__ import annotations

import os
from dataclasses import replace
from datetime import datetime

from pyspark.sql import functions as F

from parquet_export_spark.export.maintenance import compact_table, merge_upsert
from parquet_export_spark.export.writer import write_table
from parquet_export_spark.tables import TableSpec


def test_merge_upsert_semantics(spark):
    cur = spark.createDataFrame(
        [
            ("a", 1, datetime(2024, 1, 1)),
            ("b", 2, datetime(2024, 1, 1)),
            ("c", 3, datetime(2024, 1, 3)),
        ],
        ["id", "v", "updated_at"],
    )
    chg = spark.createDataFrame(
        [
            ("b", 20, datetime(2024, 1, 2)),   # newer -> wins
            ("c", 30, datetime(2024, 1, 2)),   # STALE -> dropped
            ("d", 40, datetime(2024, 1, 2)),   # new key -> inserted
        ],
        ["id", "v", "updated_at"],
    )
    out = {r.id: r.v for r in merge_upsert(cur, chg, "id").collect()}
    assert out == {"a": 1, "b": 20, "c": 3, "d": 40}

    # without updated_col: changes always win
    out2 = {r.id: r.v for r in merge_upsert(cur, chg, "id", updated_col=None).collect()}
    assert out2 == {"a": 1, "b": 20, "c": 30, "d": 40}


def test_compaction(spark, tmp_path):
    spec = TableSpec(name="cmp", datatypes={"k": "Int64", "s": "string"}, rows_per_file=10)
    df = spark.createDataFrame([(i, f"s{i}") for i in range(100)], ["k", "s"])
    # fragment: 20 partitions -> many small files
    write_table(df.repartition(20), str(tmp_path), spec)
    table_dir = os.path.join(str(tmp_path), "cmp")
    n_before = len([f for f in os.listdir(table_dir) if f.endswith(".parquet")])
    assert n_before >= 10

    big = replace(spec, rows_per_file=50)
    files = compact_table(spark, table_dir, big)
    assert len(files) == 2  # 100 rows / 50 per file
    back = spark.read.parquet(table_dir)
    assert back.count() == 100
    assert {r.k for r in back.collect()} == set(range(100))
