from pg_parquet_spark.functions.metadata import (  # noqa: F401
    parquet_column_stats,
    parquet_file_metadata,
    parquet_kv_metadata,
    parquet_list,
    parquet_metadata,
    parquet_schema,
    schema_drift,
)
from pg_parquet_spark.functions.types import apply_write_policies  # noqa: F401
