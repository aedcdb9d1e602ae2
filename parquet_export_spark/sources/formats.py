"""Additional source formats (SURVEY.md §2B.11).

The reference reads only PostgreSQL and writes only parquet; the lake
engine also ingests CSV and JSON-lines with the same declared-schema
discipline (never inferred in production paths — inference is a debug
affordance)."""

from __future__ import annotations

import typing

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.options(**options).csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """ORC lake read — same columnar pushdown/pruning posture as
    parquet (both are native vectorized scans with predicate pushdown
    and column pruning in Catalyst)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).orc(path)


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    df.write.mode("overwrite").option("compression", compression).orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-file ingestion for the multimodal path: one row per file
    with (path, modificationTime, length, content binary).

    This is how image/audio/video blobs enter the lake before
    operators.multimodal decodes/features them — content stays an
    opaque binary column end-to-end. ``glob`` filters by pattern
    (e.g. ``*.png``). Driver never touches the bytes; each file is
    read by the executor that owns its split.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | None = None,
) -> DataFrame:
    """XML ingestion (native DataSource in Spark 4 — the donated
    spark-xml module). Same declared-schema discipline as CSV/JSONL:
    pass ``schema`` in production paths; inference is debug-only.
    """
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """XML export via the native Spark 4 writer (one element per row
    under ``row_tag``); executor-parallel like every other sink here."""
    df.write.mode("overwrite").format("xml").option("rowTag", row_tag).save(path)


class AuditedRead(typing.NamedTuple):
    """Result of :func:`read_jsonl_audited`. Call ``release()`` once
    both outputs are consumed — the split requires caching the scan
    (SPARK-21610), and the pin lives until released or the session
    ends; a loop auditing many inputs without releasing would
    accumulate cached relations until the store spills."""

    good: DataFrame
    bad: DataFrame
    release: typing.Callable[[], None]


def read_jsonl_audited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> AuditedRead:
    """Permissive JSONL ingest with a malformed-row QUARANTINE:
    returns (good_rows, bad_rows, release).

    The at-scale ingest contract: one broken line in 100 TB must
    neither kill the job (FAILFAST) nor vanish silently
    (DROPMALFORMED). PERMISSIVE mode routes unparseable lines into a
    ``_corrupt_record`` column; we split the stream so good rows flow
    on with the declared schema and bad raw lines land in an
    auditable side output (count them, alert, replay after a fix).
    Spark requires the corrupt-record column to be cached before it
    can be filtered on (SPARK-21610 guard), hence the explicit cache
    + the ``release`` handle for the caller to drop the pin.
    """
    corrupt = "_corrupt_record"
    full = T.StructType(
        schema.fields + [T.StructField(corrupt, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(path)
        .cache()
    )
    good = df.filter(F.col(corrupt).isNull()).drop(corrupt)
    bad = df.filter(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw_line")
    )
    return AuditedRead(good, bad, lambda: df.unpersist())
