from parquet_export_spark.export.pipeline import export_lake, export_table  # noqa: F401
