"""SCD-2 (slowly-changing-dimension, history-keeping) MERGE over the
versioned layout: instead of overwriting a matched row (merge_upsert's
SCD-1), close its validity interval and insert the new state — the
dimension-table pattern every warehouse migration off Postgres needs
(reference scope: pg_parquet moves the data; interval semantics are the
beyond-reference surface).

Contract per update row (key, attrs, effective):

- new key                → insert (valid_from = effective, valid_to = NULL)
- matched, attrs CHANGED → close the current row (valid_to = effective)
                           and insert the new state
- matched, attrs EQUAL   → no-op — so re-applying a batch is IDEMPOTENT,
                           which is what makes a crashed-then-replayed
                           pipeline converge (same argument as the
                           sketch refresh)
- effective ≤ current row's valid_from → RAISE (out-of-order update;
  silent acceptance would write a negative/zero-length interval)
- duplicate keys in one batch → RAISE (the merge_upsert rule: dedupe
  upstream with a documented precedence)

Scale shape: one key-equi join of the CURRENT rows (a fraction of the
table; closed history never joins) against the batch, column-wise
null-safe change detection (no row hashing — hash collisions would
silently drop a real change), then ``layout.publish_snapshot`` flips
the pointer crash-atomically with time travel retained. History rows
are carried by union, never rewritten — at 100 TB, partition the
dataset by a valid_to bucket upstream so the carried union prunes.

Point-in-time reads: ``read_scd2_asof`` filters
valid_from ≤ t < coalesce(valid_to, ∞) — the AS OF join every
training-data lineage audit runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_parquet_spark.sources import layout

VALID_FROM = "_valid_from"
VALID_TO = "_valid_to"


def _changed(tracked: list[str]) -> F.Column:
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
    return cond


def merge_scd2(
    spark: SparkSession,
    root_uri: str,
    updates: DataFrame,
    key_cols: list[str],
    effective_col: str,
    tracked_cols: list[str] | None = None,
    keep_history: int | None = None,
) -> None:
    """Apply one update batch with SCD-2 semantics and publish the new
    snapshot. ``effective_col`` (a monotone long/timestamp in the
    update batch) becomes the interval boundary; ``_valid_to`` is typed
    to the effective column's own type (ADVICE r9: a hardcoded long
    NULL made a timestamp effective_col fail the union of open rows
    against closed rows carrying timestamp ``_close_at``)."""
    for reserved in (VALID_FROM, VALID_TO):
        if reserved in updates.columns:
            raise ValueError(
                f"updates must not carry the reserved column {reserved}"
            )
    attr_cols = [
        c for c in updates.columns if c not in key_cols and c != effective_col
    ]
    tracked = tracked_cols if tracked_cols is not None else attr_cols
    dup = (
        updates.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1)
    ).collect()
    if dup:
        raise ValueError(
            f"updates contain duplicate keys (e.g. {dup[0]}) — SCD-2 needs "
            "one state per key per batch; dedupe upstream with a documented "
            "precedence"
        )
    eff_type = updates.schema[effective_col].dataType
    upd = updates.select(
        *key_cols,
        *attr_cols,
        F.col(effective_col).alias(VALID_FROM),
        F.lit(None).cast(eff_type).alias(VALID_TO),
    )

    if layout.read_manifest(root_uri.rstrip("/")) is None:
        layout.publish_snapshot(spark, root_uri, upd, keep_history=keep_history)
        return

    base = layout.read_versioned(spark, root_uri)
    cur = base.filter(F.col(VALID_TO).isNull()).alias("cur")
    hist = base.filter(F.col(VALID_TO).isNotNull())
    j = cur.join(upd.alias("upd"), key_cols, "inner")

    # out-of-order guard applies only to rows that would WRITE (changed
    # attrs): a replayed no-op batch carries effective == the current
    # valid_from it itself created, and must stay a no-op — gating the
    # check on change is what preserves replay idempotence
    stale = (
        j.filter(_changed(tracked))
        .filter(F.col(f"upd.{VALID_FROM}") <= F.col(f"cur.{VALID_FROM}"))
        .limit(1)
        .collect()
    )
    if stale:
        raise ValueError(
            "out-of-order update: an update row's effective value is ≤ its "
            f"current row's {VALID_FROM} (e.g. key "
            f"{[stale[0][k] for k in key_cols]}) — SCD-2 intervals must "
            "advance strictly; replay the batches in order"
        )

    changed_keys = (
        # a list join-spec coalesces the key columns, so plain names are
        # unambiguous here
        j.filter(_changed(tracked))
        .select(*key_cols, F.col(f"upd.{VALID_FROM}").alias("_close_at"))
    )
    closed = (
        cur.join(F.broadcast(changed_keys), key_cols, "inner")
        .select(
            *key_cols,
            *[F.col(f"cur.{c}") for c in attr_cols],
            F.col(f"cur.{VALID_FROM}").alias(VALID_FROM),
            F.col("_close_at").alias(VALID_TO),
        )
    )
    kept = cur.join(changed_keys.select(*key_cols), key_cols, "left_anti").select(
        *key_cols, *attr_cols, VALID_FROM, VALID_TO
    )
    # inserts: update rows for a NEW key, or whose tracked attrs differ
    # from the current row (matched-and-equal rows drop — the no-op that
    # makes batch replay idempotent). NULL-safe comparison throughout:
    # a change to/from NULL is a real change, and `_has_cur` (not an
    # attr's nullness) decides whether a current row exists at all.
    cur_keys = cur.select(
        *key_cols,
        F.lit(True).alias("_has_cur"),
        *[F.col(f"cur.{c}").alias(f"_c_{c}") for c in tracked],
    )
    diff = F.lit(False)
    for c in tracked:
        diff = diff | ~F.col(c).eqNullSafe(F.col(f"_c_{c}"))
    inserts = (
        # key-equi shuffle join: `cur_keys` is table-fraction-sized (too
        # big to broadcast); the batch-sized sides that CAN broadcast
        # (changed_keys above) already do
        upd.join(cur_keys, key_cols, "left")
        .filter(F.col("_has_cur").isNull() | diff)
        .select(*key_cols, *attr_cols, VALID_FROM, VALID_TO)
    )

    result = hist.select(*key_cols, *attr_cols, VALID_FROM, VALID_TO).unionByName(
        closed
    ).unionByName(kept).unionByName(inserts)
    layout.publish_snapshot(spark, root_uri, result, keep_history=keep_history)


def read_scd2_asof(spark: SparkSession, root_uri: str, asof) -> DataFrame:
    """Rows valid AT ``asof``: valid_from ≤ asof < valid_to (open
    intervals count) — the point-in-time dimension read."""
    base = layout.read_versioned(spark, root_uri)
    return base.filter(
        (F.col(VALID_FROM) <= F.lit(asof))
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > F.lit(asof)))
    )


def scd2_oracle_sql(
    batches: list[tuple[str, str]],
    key_cols: list[str],
    attr_cols: list[str],
    tracked_cols: list[str] | None = None,
    effective_sql_type: str = "BIGINT",
) -> str:
    """DuckDB replica of applying ``batches`` in order to an empty
    dataset — each entry is (updates_subquery_sql, effective_expr);
    the update subquery must produce key + attr columns. Unrolled into
    chained CTEs like the PageRank oracle; NULL-safe comparison via
    IS DISTINCT FROM mirrors eqNullSafe. ``effective_sql_type`` types
    the open-interval NULL (pass TIMESTAMP for a timestamp effective
    column, mirroring merge_scd2's typed NULL)."""
    tracked = tracked_cols if tracked_cols is not None else attr_cols
    keys = ", ".join(key_cols)
    attrs = ", ".join(attr_cols)
    keys_eq = " AND ".join(f"c.{k} = u.{k}" for k in key_cols)
    diff = " OR ".join(f"c.{t} IS DISTINCT FROM u.{t}" for t in tracked)
    same = " AND ".join(f"NOT (c.{t} IS DISTINCT FROM u.{t})" for t in tracked)
    ctes = []
    u1, eff1 = batches[0]
    ctes.append(f"u0 AS ({u1})")
    ctes.append(
        f"s0 AS (SELECT {keys}, {attrs}, {eff1} AS _valid_from, "
        f"CAST(NULL AS {effective_sql_type}) AS _valid_to FROM u0)"
    )
    for i, (usql, eff) in enumerate(batches[1:], start=1):
        prev = f"s{i - 1}"
        ctes.append(f"u{i} AS ({usql})")
        ctes.append(
            f"""s{i} AS (
  SELECT * FROM {prev} WHERE _valid_to IS NOT NULL
  UNION ALL
  SELECT c.{', c.'.join(key_cols)}, c.{', c.'.join(attr_cols)},
         c._valid_from, {eff} AS _valid_to
  FROM (SELECT * FROM {prev} WHERE _valid_to IS NULL) c
  JOIN u{i} u ON {keys_eq} WHERE {diff}
  UNION ALL
  SELECT c.* FROM (SELECT * FROM {prev} WHERE _valid_to IS NULL) c
  WHERE NOT EXISTS (SELECT 1 FROM u{i} u WHERE {keys_eq} AND ({diff}))
  UNION ALL
  SELECT u.{', u.'.join(key_cols)}, u.{', u.'.join(attr_cols)},
         {eff} AS _valid_from, CAST(NULL AS {effective_sql_type}) AS _valid_to
  FROM u{i} u
  WHERE NOT EXISTS (
    SELECT 1 FROM (SELECT * FROM {prev} WHERE _valid_to IS NULL) c
    WHERE {keys_eq} AND {same})
)"""
        )
    last = f"s{len(batches) - 1}"
    order = ", ".join(key_cols)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT * FROM {last} ORDER BY {order}, _valid_from"
    )
