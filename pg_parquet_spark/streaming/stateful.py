"""Custom stateful streaming operator via applyInPandasWithState
(the brief's "custom stateful operators" row; beyond-reference scope —
the reference has no stream processing, SURVEY.md §2.C).

Operator: per-user running engagement tracker — for every micro-batch it
updates (event_count, total_value, last_seen) state per user_id and
emits the refreshed aggregate row. State is GroupState-managed (executor
state store, checkpointed); timeouts evict idle users.

Scale: state is keyed by user_id → partitioned across executors by the
stream's groupBy shuffle; eviction via processing-time timeout bounds the
store. The pandas interface is Arrow-batched per group-partition.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, event_count BIGINT, total_value DOUBLE, last_event_id BIGINT"
STATE_SCHEMA = "event_count BIGINT, total_value DOUBLE, last_event_id BIGINT"


def _update_user_state(
    key: tuple, rows: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        count, total, last_id = state.get
    else:
        count, total, last_id = 0, 0.0, -1
    for pdf in rows:
        count += len(pdf)
        total += float(pdf["value"].sum())
        batch_last = int(pdf.loc[pdf["event_id"].idxmax(), "event_id"])
        last_id = max(last_id, batch_last)
    state.update((count, total, last_id))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "event_count": count,
                "total_value": total,
                "last_event_id": last_id,
            }
        ]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Stateful per-user aggregates over a stream of events.

    ``events`` must be a streaming DataFrame with (user_id, event_id,
    value) columns.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EVICT_OUTPUT_SCHEMA = (
    "user_id BIGINT, event_count BIGINT, total_value DOUBLE, "
    "last_event_id BIGINT, evicted BOOLEAN"
)


def running_user_stats_with_ttl(events: DataFrame, ttl_ms: int = 60_000) -> DataFrame:
    """TTL variant (ROADMAP r2 #8 — the eviction path was untested):
    processing-time timeout evicts idle users, emitting one final row with
    ``evicted=true`` and removing their state. This is what bounds the
    state store at 100 TB — without eviction, per-key state grows with
    the key universe forever.
    """

    def update(key: tuple, rows, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            count, total, last_id = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "event_count": count,
                        "total_value": total,
                        "last_event_id": last_id,
                        "evicted": True,
                    }
                ]
            )
            return
        if state.exists:
            count, total, last_id = state.get
        else:
            count, total, last_id = 0, 0.0, -1
        for pdf in rows:
            count += len(pdf)
            total += float(pdf["value"].sum())
            last_id = max(last_id, int(pdf["event_id"].max()))
        state.update((count, total, last_id))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "event_count": count,
                    "total_value": total,
                    "last_event_id": last_id,
                    "evicted": False,
                }
            ]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EVICT_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_stateful_available_now(sdf: DataFrame, timeout_sec: int = 120) -> DataFrame:
    """Drain with AvailableNow; update-mode sink → keep the LAST emitted
    row per user (the final state)."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    name = f"pgpq_state_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"pgpq_ckpt_{name}")
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"stateful drain did not finish within {timeout_sec}s"
        )
    spark = sdf.sparkSession
    raw = spark.table(name)
    # last update per user wins (event_count monotonically grows)
    return (
        raw.groupBy("user_id")
        .agg(
            F.max("event_count").alias("event_count"),
            F.max_by("total_value", "event_count").alias("total_value"),
            F.max("last_event_id").alias("last_event_id"),
        )
    )

