"""Skew-mitigation utilities (100 TB posture, SURVEY.md §7 Phase 4:
"designed to shuffle-scale, salted keys where needed").

AQE's skew-join splitting (on in the session) handles most cases at
runtime; these helpers cover the two patterns AQE can't: skewed
*aggregation* keys, and broadcast-ineligible skewed joins where one key
dominates a partition.

- ``salted_aggregate``: two-phase agg — partial per (key, salt) then
  final per key. The hot key's rows spread over ``salt_buckets``
  reducers in phase 1; phase 2 only merges ``salt_buckets`` partials.
- ``salted_join``: replicate the small side per salt bucket, salt the
  big side uniformly — the hot key's probe rows land on distinct
  partitions.

Both are deterministic (salt = pmod(hash(row_id-ish), n)) and
semantically transparent — results equal the unsalted equivalents (test-
asserted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[Column], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(buckets))


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max} (the decomposable aggregates — partial and
    final combine with the same op, except count which finalizes as sum).
    ``salt_source`` columns feed the salt hash (default: all non-group
    columns — any row-distinguishing value works).
    """
    supported = {"sum", "count", "min", "max"}
    for out, (_, fn) in aggs.items():
        if fn not in supported:
            raise ValueError(f"unsupported salted aggregate fn {fn!r} for {out!r}")
    salt_cols = [F.col(c) for c in (salt_source or df.columns)]
    salted = df.withColumn("_salt", _salt(salt_cols, salt_buckets))

    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        else:
            partial_exprs.append(getattr(F, fn)(col).alias(f"_p_{out}"))
            final_exprs.append(getattr(F, fn)(f"_p_{out}").alias(out))

    partial = salted.groupBy(*group_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*group_cols).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side uniformly, replicate
    the small side across every salt bucket, join on (key, salt).

    Shuffle cost: big side unchanged; small side × salt_buckets (still
    tiny by assumption). The hot key's rows spread over ``salt_buckets``
    partitions instead of one straggler."""
    big_salted = big.withColumn("_salt", _salt([F.col(c) for c in big.columns], salt_buckets))
    small_rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = big_salted.join(small_rep, on=[on, "_salt"], how=how)
    return joined.drop("_salt")
