"""Distributed global ranks / prefix folds — the shared two-pass
pattern behind every "global window" in the engine.

A naive ``row_number().over(Window.orderBy(...))`` funnels the whole
frame through ONE task: fine for bounded dimension tables, fatal for
anything corpus-shaped (a web-scale vocabulary is billions of tokens,
a web graph billions of nodes). The fix is the classic scan
decomposition, already proven in :func:`text.token_stream_layout` and
:func:`sampling.select_token_budget`:

1. ``repartitionByRange`` on the order key — Spark's RangePartitioner
   assigns contiguous key ranges to partitions in partition-id order,
   so partition ids themselves follow the global order;
2. a PER-PARTITION window (partitioned by ``spark_partition_id()``)
   computes local ranks / local folds in parallel;
3. the per-partition totals (#partitions rows — bounded by the shuffle
   setting, NOT by data size) are prefix-folded on the driver-adjacent
   tiny frame and broadcast back as offsets.

The result is bit-identical to the single-window formulation at any
partition placement (range boundaries move ranks between partitions
but ``offset + local`` is invariant), which is why the DuckDB oracles
keep their single-window SQL: equality against them IS the composition
proof. Tests pin 1/4/32-partition invariance.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OrderCol = Union[str, Column]


def distributed_row_number(
    df: DataFrame, order_cols: Sequence[OrderCol], out_col: str = "rk"
) -> DataFrame:
    """``df`` + ``out_col`` = the global ``row_number()`` over
    ``order_cols`` (which must be a unique key for a deterministic
    result), computed without a single-task window.

    Plan shape: one range exchange for the data, one bounded
    (#partitions-row) offsets frame joined back broadcast."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parts = df.repartitionByRange(*cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = parts.withColumn("_lrk", F.row_number().over(w).cast("long"))
    offsets = (
        local.groupBy("_pid")
        .agg(F.max("_lrk").alias("_pn"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_pn").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_lrk")).cast("long"))
        .drop("_pid", "_lrk", "_offset")
    )


def distributed_running_max(
    df: DataFrame,
    order_col: OrderCol,
    value_col: str,
    out_col: str = "_best_prev",
) -> DataFrame:
    """``df`` + ``out_col`` = max of ``value_col`` over all rows
    STRICTLY BEFORE the current one in ``order_col`` order (NULL for
    the global first row — i.e. ``rows between unbounded preceding
    and 1 preceding``), without a single-task window.

    ``order_col`` must be unique per row (e.g. a level key after a
    groupBy); NULL handling matches the window form because
    ``F.greatest`` ignores NULL operands."""
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    parts = df.repartitionByRange(oc).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(oc).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = parts.withColumn("_local_prev", F.max(value_col).over(w_local))
    offsets = (
        parts.groupBy("_pid")
        .agg(F.max(value_col).alias("_pmax"))
        .withColumn(
            "_prev_pmax",
            F.max("_pmax").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("_pid", "_prev_pmax")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.greatest("_local_prev", "_prev_pmax"))
        .drop("_pid", "_local_prev", "_prev_pmax")
    )


def distributed_running_sum(
    df: DataFrame,
    order_cols: Sequence[OrderCol],
    value_col: str,
    out_col: str = "_cum",
) -> DataFrame:
    """``df`` + ``out_col`` = INCLUSIVE running sum of ``value_col``
    over ``order_cols`` order (``rows between unbounded preceding and
    current row``), without a single-task window — the prefix-sum twin
    of :func:`distributed_running_max` (r14, built for the exact KS
    statistic's cumulative counts). Single-column convenience wrapper
    over :func:`distributed_running_sums`."""
    return distributed_running_sums(df, order_cols, {out_col: value_col})


def distributed_running_sums(
    df: DataFrame,
    order_cols: Sequence[OrderCol],
    sums: dict,
) -> DataFrame:
    """``df`` + one inclusive running-sum column per ``sums`` entry
    ({out_col: value_col}) — ALL prefix sums ride ONE range exchange,
    one per-partition window, one offsets frame (review, r14: KS paid
    two back-to-back range exchanges for its two CDFs; N columns
    should never cost N shuffles).

    ``order_cols`` must be a unique key per row for a deterministic
    result. The per-partition totals fold exactly like
    :func:`distributed_row_number`'s offsets, so sums must be
    order-independent — integers/DECIMALs, the house arithmetic.
    NULL values count as 0 (COALESCE on both the local window and the
    partition totals)."""
    if not sums:
        raise ValueError("sums must map at least one out_col to a value_col")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parts = df.repartitionByRange(*cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = parts
    for out_col, value_col in sums.items():
        local = local.withColumn(
            f"_l{out_col}",
            F.sum(F.coalesce(F.col(value_col), F.lit(0))).over(w_local),
        )
    w_prev = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = parts.groupBy("_pid").agg(
        *[
            F.sum(F.coalesce(F.col(value_col), F.lit(0))).alias(
                f"_pt{out_col}"
            )
            for out_col, value_col in sums.items()
        ]
    )
    for out_col in sums:
        offsets = offsets.withColumn(
            f"_o{out_col}",
            F.coalesce(F.sum(f"_pt{out_col}").over(w_prev), F.lit(0)),
        )
    offsets = offsets.select(
        "_pid", *[f"_o{out_col}" for out_col in sums]
    )
    out = local.join(F.broadcast(offsets), "_pid")
    for out_col in sums:
        out = out.withColumn(
            out_col, F.col(f"_o{out_col}") + F.col(f"_l{out_col}")
        )
    return out.drop(
        "_pid",
        *[f"_l{c}" for c in sums],
        *[f"_o{c}" for c in sums],
    )
