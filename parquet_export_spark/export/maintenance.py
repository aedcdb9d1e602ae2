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


def zorder_values(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Attach a ``_zvalue`` column: Morton (bit-interleaved) index over
    the given numeric columns, each rank-scaled to ``bits`` bits.

    Pure JVM bit arithmetic (shifts/or — ANSI-overflow-free). The one
    driver-side step is a single min/max bounds row per column (same
    pattern as JDBC partition bounds): scaling needs global extents.
    """
    from pyspark.sql import functions as F

    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} columns x {bits} bits exceeds a 63-bit Z-value; "
            "lower bits or cluster fewer columns"
        )
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"{c}_min") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"{c}_max") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = bounds[f"{c}_min"], bounds[f"{c}_max"]
        if lo is None or hi is None:
            # empty table or all-null column: no clustering signal —
            # constant bucket beats an opaque NoneType crash
            scaled.append(F.lit(0).cast("long").alias(f"_s{len(scaled)}"))
            continue
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                # nulls -> bucket 0 (they carry no range information;
                # without the coalesce they silently landed in the TOP
                # bucket via least()'s null-skipping and wrecked that
                # bucket's min/max skipping stats)
                F.coalesce(
                    (
                        (F.col(c).cast("double") - F.lit(lo))
                        / F.lit(span)
                        * top
                    ).cast("long"),
                    F.lit(0),
                ),
            ).alias(f"_s{len(scaled)}")
        )
    df = df.select("*", *scaled)
    n = len(cols)
    terms = " | ".join(
        f"shiftleft(shiftright(_s{i}, {b}) & 1, {b * n + i})"
        for b in range(bits)
        for i in range(n)
    )
    return df.withColumn("_zvalue", F.expr(terms)).drop(
        *[f"_s{i}" for i in range(n)]
    )


def zorder_table(
    spark,
    df: DataFrame,
    cols: list[str],
    out_dir: str,
    spec: TableSpec,
    bits: int = 16,
) -> list[str]:
    """Rewrite a table clustered by Z-order over ``cols``.

    Range-repartition + sort on the Morton index co-locates rows that
    are close in EVERY listed dimension, so per-file parquet min/max
    stats become selective on all of them at once — multi-column data
    skipping, the layout optimization a single-column sort can't give.
    One range shuffle (sampled boundaries), executor-parallel write;
    at 100 TB this runs per partition-prefix like compaction.
    """
    n_rows = df.count()
    n_files = max(1, -(-n_rows // spec.rows_per_file))
    from pyspark.sql import functions as F

    clustered = (
        zorder_values(df, cols, bits=bits)
        .repartitionByRange(n_files, F.col("_zvalue"))
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
    )
    return write_table(clustered, out_dir, spec)


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


def overwrite_partitions(
    df: DataFrame, table_dir: str, partition_by: list[str]
) -> None:
    """Idempotent partition re-export: INSERT-OVERWRITE semantics
    scoped to exactly the partitions present in ``df`` (dynamic
    partition overwrite) — the reference republishes FULL snapshots
    (reference README.md:5); at lake scale the unit of republish is
    the partition (a day of events, a chain of contracts), and every
    other partition's files must stay untouched byte-for-byte.

    STATIC overwrite mode (Spark's default) would delete the whole
    table directory first; the dynamic mode deletes only partitions
    the incoming frame writes into, so a re-run of one day's export is
    idempotent and concurrent readers of other partitions never see a
    gap. The mode rides as a PER-WRITE DataFrameWriter option, never a
    session-conf flip: a session-global toggle would race with
    concurrent writes from other driver threads (the thread pool
    export_lake itself uses) — a thread catching the window between
    set and restore would silently fall back to STATIC and delete its
    table's sibling partitions.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(table_dir)
    )
