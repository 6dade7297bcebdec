"""pg_parquet_spark — a PySpark-native engine with the query and
data-processing capabilities of CrunchyData/pg_parquet.

The reference (surveyed in SURVEY.md) is a PostgreSQL extension bridging
``COPY`` to Parquet on local/cloud storage plus six ``parquet.*`` metadata
table functions. This package re-expresses that surface Spark-first:

- :mod:`pg_parquet_spark.session` — SparkSession with reference-equivalent
  defaults (ANSI strict casts, snappy, writer v1, field-id read/write).
- :mod:`pg_parquet_spark.sources` — ``read_parquet`` / ``write_parquet``
  with pg_parquet's COPY option surface (compression + levels,
  row_group_size(_bytes), file_size_bytes splitting, field_ids,
  parquet_version, match_by position|name, strict schema matching with the
  read-time coercion matrix, WHERE-on-load, glob scans).
- :mod:`pg_parquet_spark.functions` — the six ``parquet.*`` metadata
  functions on pyarrow footers, and the PG type-policy layer.
- :mod:`pg_parquet_spark.operators` — the delegated query surface helpers
  plus LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal columns) designed for 100 TB scale.
- :mod:`pg_parquet_spark.streaming` — Structured Streaming variants.
"""

from pg_parquet_spark.session import get_spark, load_tables  # noqa: F401
from pg_parquet_spark.sources.reader import read_parquet  # noqa: F401
from pg_parquet_spark.sources.writer import write_parquet  # noqa: F401

__version__ = "0.1.0"
