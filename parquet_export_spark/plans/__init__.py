from parquet_export_spark.plans.inspect import (  # noqa: F401
    FIXED_CARDINALITY_TABLES,
    broadcast_hint_subtrees,
    count_broadcast_joins,
    count_shuffles,
    plan_string,
    read_schemas,
    pushed_filters,
)
