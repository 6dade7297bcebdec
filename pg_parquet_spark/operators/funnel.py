"""Ordered-funnel analysis over event streams (beyond-reference
surface): how many users complete stage1 → stage2 → … in temporal order.

Classic product-analytics / sequence-mining operator the reference's SQL
surface can express only painfully. Implementation is one conditional
aggregation per stage (each a hash-groupBy on user_id — same-key shuffles
that co-locate after the first, and AQE reuses the exchange), not a
self-join chain — at 100 TB the N-stage funnel costs N map-side-combined
aggregations, never a quadratic join.

Deterministic (min timestamps + counts) → DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user first-completion time of each stage, honoring order:
    stage k counts only strictly after the user's stage k-1 time.
    Output: (user, s0_ts, s1_ts, …) with NULLs where the funnel broke."""
    out = events.groupBy(user_col).agg(
        F.min(F.when(F.col(type_col) == stages[0], F.col(ts_col))).alias("s0_ts")
    )
    for k, stage in enumerate(stages[1:], start=1):
        prev = f"s{k-1}_ts"
        stage_min = (
            events.join(out.select(user_col, prev), user_col)
            .groupBy(user_col)
            .agg(
                F.min(
                    F.when(
                        (F.col(type_col) == stage)
                        & (F.col(ts_col) > F.col(prev)),
                        F.col(ts_col),
                    )
                ).alias(f"s{k}_ts")
            )
        )
        out = out.join(stage_min, user_col, "left")
    return out


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Users reaching each stage (in order): (stage_idx, stage, users)."""
    times = funnel_stage_times(events, stages, user_col, type_col, ts_col)
    counts = times.agg(
        *[
            F.count(F.col(f"s{k}_ts")).alias(f"c{k}")
            for k in range(len(stages))
        ]
    )
    rows = [
        F.struct(
            F.lit(k).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.col(f"c{k}").alias("users"),
        )
        for k, stage in enumerate(stages)
    ]
    return (
        counts.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.stage_idx", "r.stage", "r.users")
        .orderBy("stage_idx")
    )
