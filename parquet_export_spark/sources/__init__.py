from parquet_export_spark.sources.lake import load_table, load_tables, register_temp_views  # noqa: F401
