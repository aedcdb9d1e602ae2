"""SparkSession factory.

Defaults chosen for the reference's semantics (UTC-naive timestamps,
zstd parquet — reference main.py:24, 117-119) and for scale (AQE on,
skew-join handling, sane shuffle partitioning). On a real cluster the
master/memory settings come from spark-submit; everything set here is
cluster-safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # Reference parity: timestamps are wall-clock UTC without zone
    # (reference main.py:117-119); session TZ pins all parsing/casts.
    "spark.sql.session.timeZone": "UTC",
    # Reference intent is zstd output (main.py:24, README.md:75).
    "spark.sql.parquet.compression.codec": "zstd",
    # Scale posture: adaptive execution re-plans shuffles at runtime,
    # coalesces small partitions, splits skewed ones.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas_udf / applyInPandas / toPandas hop.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast joins for dim tables (region/nation/supplier class).
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # ANSI off: we want permissive casts like the reference's pandas
    # astype semantics (nulls over errors for bad rows).
    "spark.sql.ansi.enabled": "false",
    # The driver's testdata carries TIMESTAMP(NANOS) parquet columns;
    # this reads them as timestamp_ntz (µs truncation) instead of failing.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def configure_s3(
    spark: SparkSession,
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
) -> None:
    """Point the s3a filesystem at an S3-compatible store (AWS, R2,
    MinIO). After this, export output paths can be ``s3a://bucket/...``
    — the writer and manifest code are path-scheme agnostic, which is
    how the reference's upload step (main.py:155-176) becomes a direct
    distributed write with committed-files semantics.

    MANUAL VERIFICATION RECIPE (this sandbox has no object-store
    endpoint and no ``hadoop-aws`` jar, so the live path cannot run in
    CI here — what IS proven locally is every scheme-agnostic step via
    the Hadoop FS shim, incl. a non-``file:`` scheme double; see
    tests/test_export.py). On any machine with Docker:

    1. ``docker run -p 9000:9000 minio/minio server /data``
    2. ``spark-submit --packages org.apache.hadoop:hadoop-aws:<hadoop
       version, e.g. 3.4.1>,org.apache.spark:spark-hadoop-cloud_2.13:
       <spark version> your_job.py`` where the job calls
       ``configure_s3(spark, "http://localhost:9000", "minioadmin",
       "minioadmin")`` and then
       ``export_lake(spark, src_dir, "s3a://bucket/lake")``.
    3. Expected object listing under ``s3a://bucket/lake``: one
       ``<table>/`` prefix per table containing
       ``<table>_<start>_<end>_zstd.parquet`` objects (rows_per_file-
       bounded, actual-rows end naming) plus a single top-level
       ``manifest.json`` whose per-table lists name exactly the
       committed objects — no ``.staging`` or ``.old`` prefixes left.
    """
    conf = spark._jsc.hadoopConfiguration()
    conf.set("fs.s3a.endpoint", endpoint)
    conf.set("fs.s3a.access.key", access_key)
    conf.set("fs.s3a.secret.key", secret_key)
    conf.set("fs.s3a.path.style.access", str(path_style).lower())
    # object stores have no cheap rename: use the magic committer
    conf.set("fs.s3a.committer.name", "magic")
    conf.set(
        "spark.sql.sources.commitProtocolClass",
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    )


def get_spark(
    app_name: str = "parquet-export-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when not running
    under a cluster manager; ``shuffle_partitions`` defaults to the local
    core count (a cluster deployment should pass its own or rely on AQE).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions if shuffle_partitions is not None else int(cpus)
    )
    # Local-mode niceties; harmless on a cluster where submit overrides.
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    conf.setdefault("spark.ui.enabled", "false")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
