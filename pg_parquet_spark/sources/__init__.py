from pg_parquet_spark.sources.reader import read_parquet  # noqa: F401
from pg_parquet_spark.sources.writer import write_parquet  # noqa: F401
from pg_parquet_spark.sources.pipe import (  # noqa: F401
    copy_from_program,
    copy_from_stream,
    copy_to_program,
    copy_to_stream,
)
