"""parquet_export_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of
``verifier-alliance/parquet-export`` (reference surveyed in SURVEY.md),
re-expressed Spark-first:

- ``session``    : SparkSession factory (UTC, AQE, zstd parquet defaults)
- ``tables``     : declared table specs + dtype->Spark type factory
                   (parity with reference config.py / main.py:133-153)
- ``export``     : normalize -> size-bounded zstd parquet sink -> manifest
                   (parity with reference main.py:94-263)
- ``sources``    : parquet lake reader + partitioned JDBC reader
- ``operators``  : the query surface (joins/aggs/windows/dedup/similarity/
                   text/multimodal) — SURVEY.md §2B/§2C
- ``streaming``  : incremental / watermarked variants (SURVEY.md §2B.9)
"""

__version__ = "0.1.0"

from parquet_export_spark.session import get_spark  # noqa: F401
