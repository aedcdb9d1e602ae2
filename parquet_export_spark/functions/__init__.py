from parquet_export_spark.functions.scalar import dsum, davg  # noqa: F401
