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


def test_zorder_layout_skipping(spark, sf_dir, tmp_path):
    """Z-order clustering must make per-file min/max ranges selective
    on BOTH clustered columns (random layout gives ~full-range files)."""
    import pyarrow.parquet as pq

    from parquet_export_spark.export.maintenance import zorder_table
    from parquet_export_spark.sources.lake import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    spec = TableSpec(
        name="orders_z",
        datatypes={"o_orderkey": "Int64", "o_custkey": "Int64",
                   "o_totalprice": "float64"},
        rows_per_file=150,
    )
    files = zorder_table(spark, orders, ["o_custkey", "o_totalprice"],
                         str(tmp_path), spec)
    assert len(files) >= 4
    table_dir = os.path.join(str(tmp_path), "orders_z")

    def mean_range_frac(col_idx_name):
        spans, glo, ghi = [], None, None
        for f in files:
            meta = pq.read_metadata(os.path.join(table_dir, f))
            lo = min(meta.row_group(i).column(col_idx_name).statistics.min
                     for i in range(meta.num_row_groups))
            hi = max(meta.row_group(i).column(col_idx_name).statistics.max
                     for i in range(meta.num_row_groups))
            spans.append(hi - lo)
            glo = lo if glo is None else min(glo, lo)
            ghi = hi if ghi is None else max(ghi, hi)
        return sum(spans) / len(spans) / (ghi - glo)

    # columns: 0=o_orderkey, 1=o_custkey, 2=o_totalprice
    assert mean_range_frac(1) < 0.6
    assert mean_range_frac(2) < 0.6
    back = spark.read.parquet(table_dir)
    assert back.count() == orders.count()


def test_zorder_bits_guard(spark):
    import pytest as _pytest

    from parquet_export_spark.export.maintenance import zorder_values

    df = spark.range(10).selectExpr("id a", "id b", "id c", "id d")
    with _pytest.raises(ValueError, match="63-bit"):
        zorder_values(df, ["a", "b", "c", "d"], bits=16)


def test_manifest_consistent_read(spark, sf_dir, tmp_path):
    """load_manifest_table reads exactly the committed files — a stray
    uncommitted parquet file in the prefix is invisible."""
    from parquet_export_spark.export.pipeline import export_lake
    from parquet_export_spark.sources.lake import load_manifest_table
    from tests.vera_fixtures import fixture_dataframes

    out = str(tmp_path / "lake")
    dfs = fixture_dataframes(spark, 30)
    from parquet_export_spark.tables import TABLES
    export_lake(spark, lambda s, spec: dfs[spec.name], out, tables=TABLES)
    # plant a stray file a plain directory read would pick up
    stray_src = dfs["code"].limit(5)
    stray_src.write.mode("overwrite").parquet(str(tmp_path / "stray"))
    import shutil
    stray_part = next(
        f for f in os.listdir(str(tmp_path / "stray")) if f.endswith(".parquet")
    )
    shutil.copy(
        os.path.join(str(tmp_path / "stray"), stray_part),
        os.path.join(out, "code", "stray_uncommitted.parquet"),
    )
    n_manifest = load_manifest_table(spark, out, "code").count()
    n_dir = spark.read.parquet(os.path.join(out, "code")).count()
    assert n_manifest == 30
    assert n_dir == 35  # directory read sees the stray file
