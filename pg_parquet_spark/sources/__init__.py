from pg_parquet_spark.sources.reader import read_parquet  # noqa: F401
from pg_parquet_spark.sources.writer import write_parquet  # noqa: F401
