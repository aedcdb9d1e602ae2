"""Lake maintenance operators: MERGE/upsert and small-file compaction.

The reference republishes full snapshots every run; a continuously
maintained lake needs key-based upsert (apply a change batch to the
previous snapshot) and compaction (heal the small-file accumulation
that incremental writes cause). Both are plain DataFrame plans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_export_spark.export.writer import write_table
from parquet_export_spark.tables import TableSpec


def merge_upsert(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    updated_col: str | None = "updated_at",
) -> DataFrame:
    """MERGE semantics: rows from ``changes`` win on key collision;
    unmatched current rows survive.

    Implemented as union + windowless groupBy-free anti-join (one
    shuffle on the key): ``current LEFT ANTI changes ∪ changes``.
    When ``updated_col`` is given, a changed row only wins if strictly
    newer (late-arriving stale updates are dropped).
    """
    if updated_col is not None:
        stale = (
            changes.alias("c")
            .join(current.alias("p"), key)
            .filter(F.col(f"c.{updated_col}") <= F.col(f"p.{updated_col}"))
            .select(f"c.{key}")
        )
        changes = changes.join(stale, key, "left_anti")
    survivors = current.join(changes.select(key), key, "left_anti")
    return survivors.unionByName(changes)


def compact_table(
    spark,
    table_dir: str,
    spec: TableSpec,
    target_rows_per_file: int | None = None,
) -> list[str]:
    """Rewrite a table prefix into right-sized files (bin-packing).

    Reads the current files, coalesces to ceil(rows/target) output
    tasks, rewrites with the same naming scheme. At scale this runs
    per partition-prefix; ordering inside the table is not preserved
    (column-store semantics — consumers sort).
    """
    target = target_rows_per_file or spec.rows_per_file
    df = spark.read.schema(spec.schema).parquet(table_dir)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target))
    out_parent = os.path.dirname(table_dir.rstrip("/"))
    compacted = df.repartition(n_files)
    return write_table(compacted, out_parent, spec)
