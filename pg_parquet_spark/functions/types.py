"""PG-flavoured type policies applied on the write path (SURVEY.md §1.2).

Reference policies (src/type_compat/pg_arrow_type_conversions.rs,
src/arrow_parquet/schema_parser.rs:353-419):

- ``numeric(P>38,S)`` → text (should_write_numeric_as_text, :304-306);
  Spark's DecimalType is already capped at 38, so the policy surfaces as
  an explicit helper plus a guard on unbounded decimals.
- unbounded ``numeric`` → DECIMAL(38,9); values whose integral digits
  exceed 29 or scale exceeds 9 error (:252-294). Spark parity: ANSI mode
  makes the overflow error; ``decimal_guard`` provides the precise check.
- NaN / ±Inf cannot enter a decimal column (error_if_special_numeric,
  :178-190) — ANSI cast from float raises on NaN/Inf already.
- exotic types (interval, enum, bit, …) → text via the type's output
  function (src/type_compat/fallback_to_text.rs) — ``fallback_to_text``
  casts any non-Parquet-writable Spark column to string.
- PG ``time``/``timetz`` have no Spark type: policy helpers convert to
  µs-since-midnight BIGINT (timetz pre-shifted to UTC,
  pg_arrow_type_conversions.rs:138-176).
- UUID → canonical lowercase string; JSON → string (Spark has no logical
  annotations for either; documented deviation, SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    CalendarIntervalType,
    DayTimeIntervalType,
    DecimalType,
    NullType,
    StringType,
    YearMonthIntervalType,
)

#: Spark types Parquet cannot store natively → text fallback
_TEXT_FALLBACK_TYPES = (
    CalendarIntervalType,
    DayTimeIntervalType,
    YearMonthIntervalType,
    NullType,
)

#: unbounded-numeric default (pg_arrow_type_conversions.rs:296-300)
UNBOUNDED_NUMERIC_PRECISION = 38
UNBOUNDED_NUMERIC_SCALE = 9
MAX_INTEGRAL_DIGITS = UNBOUNDED_NUMERIC_PRECISION - UNBOUNDED_NUMERIC_SCALE  # 29


class NumericOverflowError(ValueError):
    pass


def fallback_to_text(col: Column) -> Column:
    """Round-trip an unmapped type through its textual form
    (fallback_to_text.rs:88-159)."""
    return col.cast(StringType())


def apply_write_policies(df: DataFrame) -> DataFrame:
    """Rewrite columns whose types Parquet/the reference would not store
    natively: interval-ish → string (the reference's interval → text
    fallback, copy_type_roundtrip.rs:663-675)."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, _TEXT_FALLBACK_TYPES):
            out = out.withColumn(f.name, fallback_to_text(F.col(f.name)))
    return out


def numeric_as_text_policy(precision: int) -> bool:
    """numeric with precision>38 is written as text (schema_parser.rs:369-370)."""
    return precision > 38


def unbounded_numeric_type() -> DecimalType:
    return DecimalType(UNBOUNDED_NUMERIC_PRECISION, UNBOUNDED_NUMERIC_SCALE)


def decimal_guard(col: Column) -> Column:
    """Strict guard for values entering an unbounded-numeric column:
    >29 integral digits or >9 fractional digits error
    (pg_arrow_type_conversions.rs:252-294). ANSI cast raises on overflow;
    this expression reproduces the *scale* check too (Spark would round
    extra scale digits silently)."""
    dec = col.cast(unbounded_numeric_type())
    # round-trip equality catches scale loss; overflow raises via ANSI
    return F.when(
        col.isNotNull() & (dec.cast("string") != col.cast("string")) & (
            F.abs(col.cast("double") - dec.cast("double")) > F.lit(0.0)
        ),
        F.raise_error(F.lit("value out of range for numeric(38,9)")),
    ).otherwise(dec)


def reject_special_numeric(col: Column) -> Column:
    """NaN / ±Infinity cannot enter a numeric column
    (error_if_special_numeric, pg_arrow_type_conversions.rs:178-190).
    Spark's ANSI cast maps NaN→NULL for decimals instead of erroring, so
    the policy is enforced explicitly."""
    return F.when(
        F.isnan(col) | (F.abs(col) == float("inf")),
        F.raise_error(F.lit("NaN or Infinity is not allowed in numeric column")),
    ).otherwise(col)


def to_numeric(col: Column, precision: int = 38, scale: int = 9) -> Column:
    """Float → numeric with the reference's special-value rejection."""
    return reject_special_numeric(col).cast(DecimalType(precision, scale))


def uuid_canonical(col: Column) -> Column:
    """UUID policy: canonical lowercase text (reference stores
    FixedSizeBinary(16)+Uuid annotation, schema_parser.rs:360-365; Spark
    has no UUID type — canonical string keeps equality/sort semantics)."""
    return F.lower(col.cast("string"))


def time_to_micros(col: Column) -> Column:
    """PG ``time`` → µs since midnight (BIGINT), the reference's Arrow
    Time64(µs) payload (schema_parser.rs:393-397)."""
    ts = col.cast("timestamp")
    return (
        (F.hour(ts).cast("long") * 3600 + F.minute(ts).cast("long") * 60 + F.second(ts).cast("long"))
        * 1_000_000
        + (F.unix_micros(ts) % 1_000_000)
    ).cast("long")
