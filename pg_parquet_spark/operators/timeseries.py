"""Time-series rollups — the hypertable-style CONTINUOUS AGGREGATE
(TimescaleDB's time_bucket / OHLC family), Spark-first (r9).

Scale shape: one shuffle on (series key, bucket) with full map-side
partial aggregation — shuffle volume is the bucket count, never the
event count. Sums run through DECIMAL (order-independent exact
arithmetic); the open/close points use min_by/max_by on a composite
integer order key, so results are identical under any partitioning —
and replicate bit-exactly in DuckDB (arg_min/arg_max on the same key;
tests/test_analytics_ops.py).

Composes with the versioned layout for the standard maintenance story:
materialize a rollup per time range, MERGE-refresh only the buckets an
ingest batch touched (merge_upsert keyed on (key, bucket)), and the
manifest pointer publishes the refresh atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: order-key multiplier: okey = epoch_seconds * _OKEY_BASE + row id.
#: Collision-free while ids stay below the base; overflow-safe while
#: epoch * base stays under 2^63 (fine until year ~31k at 1e7).
_OKEY_BASE = 10_000_000


def rollup_time_buckets(
    df: DataFrame,
    width_sec: int = 3600,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-(key, time-bucket) OHLC rollup: row count, exact sum, min,
    max, and the FIRST/LAST value by event time (ties broken on
    ``id_col``, which must be < 1e7 — see ``_OKEY_BASE``). The bucket
    is the epoch-second floor multiple of ``width_sec`` (BIGINT — a
    timezone-free bucket identity that compares identically on every
    engine; render it with ``timestamp_seconds`` for humans).

    The ``id_col < _OKEY_BASE`` contract is ENFORCED, not advisory
    (ADVICE r9: an id ≥ 1e7 would bleed into the seconds field of the
    packed order key and silently reorder open/close): the packed key
    is built behind a ``raise_error`` branch, so any out-of-range or
    NULL id fails the job loudly in the SAME pass — no separate
    validation scan. Streaming refresh loops feeding ever-growing ids
    therefore fail fast at the boundary instead of corrupting. Rows with
    NULL ``ts_col``/``key_col`` land in NULL-keyed groups — and NULL
    merge keys break the (key, bucket)-keyed MERGE refresh (SQL NULL
    never equi-joins), so filter or default them upstream before using
    ``refresh_rollup_buckets``."""
    # epoch seconds, truncating (= floor post-1970). NTZ casts through
    # TIMESTAMP first (session tz is pinned UTC, so the instant matches
    # DuckDB's wall-clock epoch()); a direct NTZ→long cast is illegal.
    es = F.col(ts_col).cast("timestamp").cast("long")
    # in-pass fail-fast: the when() guard rides the main aggregation
    # scan, so validation is free when the contract holds (cf. the
    # weighted_sample/copurchase_edges fail-fast stance)
    okey = F.when(
        (F.col(id_col) >= 0) & (F.col(id_col) < _OKEY_BASE),
        es * F.lit(_OKEY_BASE) + F.col(id_col),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"rollup_time_buckets: {id_col} must be a non-NULL integer "
                f"in [0, {_OKEY_BASE}) — larger ids would corrupt the "
                "packed open/close order key"
            )
        ).cast("long")
    )
    v = F.col(val_col)
    return (
        df.select(
            F.col(key_col),
            (es - (es % width_sec)).alias("bucket_epoch"),  # pure integer ops
            v.alias("_v"),
            okey.alias("_ok"),
        )
        .groupBy(key_col, "bucket_epoch")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("_v").cast("decimal(18,6)"))
            .cast("double")
            .alias("v_sum"),
            F.min("_v").alias("v_min"),
            F.max("_v").alias("v_max"),
            F.min_by("_v", "_ok").alias("v_open"),
            F.max_by("_v", "_ok").alias("v_close"),
        )
        .orderBy(key_col, "bucket_epoch")
    )


def refresh_rollup_buckets(
    spark,
    rollup_uri: str,
    events: DataFrame,
    new_events: DataFrame,
    width_sec: int = 3600,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> int:
    """Incremental CONTINUOUS-AGGREGATE refresh (the materialized-view
    maintenance TimescaleDB's refresh policy runs): recompute ONLY the
    (key, bucket) groups the ingest batch touched — from the full
    event set of those buckets — and MERGE them into the materialized
    rollup through the crash-atomic versioned publish.

    Scale shape: the touched-group set is bounded by the batch's span
    (hours × keys), broadcasts into a semi-join that prunes the event
    scan (with events partitioned/z-ordered on time, that's partition
    pruning); the MERGE shuffles only the recomputed groups. Refresh
    cost is proportional to the batch's time span, never the
    aggregate's history. Returns the number of refreshed groups."""
    touched = (
        rollup_time_buckets(
            new_events, width_sec, key_col, ts_col, val_col, id_col
        )
        .select(key_col, "bucket_epoch")
    )
    es = F.col(ts_col).cast("timestamp").cast("long")
    scoped = events.withColumn(
        "bucket_epoch", es - (es % width_sec)
    ).join(F.broadcast(touched), [key_col, "bucket_epoch"], "left_semi").drop(
        "bucket_epoch"
    )
    updates = rollup_time_buckets(
        scoped, width_sec, key_col, ts_col, val_col, id_col
    )
    from pg_parquet_spark.sources.layout import merge_upsert

    merge_upsert(
        spark, rollup_uri, updates, [key_col, "bucket_epoch"], versioned=True
    )
    return touched.count()


def rollup_oracle_sql(
    width_sec: int = 3600,
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """DuckDB replica: FLOOR(epoch()) matches Spark's timestamp→long
    truncation for post-1970 data; integer bucket arithmetic, DECIMAL
    sum, arg_min/arg_max on the identical composite order key."""
    return f"""
WITH e AS (
  SELECT {key_col},
         CAST(FLOOR(epoch({ts_col})) AS BIGINT) AS es,
         {val_col} AS v, {id_col} AS rid
  FROM {table}
)
SELECT {key_col},
       (es // {width_sec}) * {width_sec} AS bucket_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS v_sum,
       MIN(v) AS v_min,
       MAX(v) AS v_max,
       arg_min(v, es * {_OKEY_BASE} + rid) AS v_open,
       arg_max(v, es * {_OKEY_BASE} + rid) AS v_close
FROM e GROUP BY 1, 2 ORDER BY 1, 2
"""


def seasonal_outliers(
    events: DataFrame,
    id_col: str = "event_id",
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    season: str = "hour",
    c_x10000: int = 44478,
) -> DataFrame:
    """Seasonal robust anomaly detection: a value is judged against the
    median/MAD fence of ITS OWN SEASON (same hour-of-day / weekday /
    month within the group), so a nightly batch spike isn't flagged
    just for being in the quiet hours — the time-series rendition of
    the drift tier's robust fences, and the heavy-tail-safe alternative
    to the exact-moment z-score gate.

    Pure composition: the season key folds into the group key
    (``grp = group:season``) and the fence machinery is
    :func:`pg_parquet_spark.operators.drift.robust_outliers` verbatim
    — same integer med×2/MAD×4 determinism, same DuckDB oracle shape
    (``concat(group, ':', hour(ts))`` replicates; Spark and DuckDB
    agree on hour/dayofmonth/month values). Scale shape unchanged: two
    season-keyed exact percentiles + broadcast fences.

    ``season``: one of hour / dow-free keys that hash identically in
    both engines ("hour", "day", "month")."""
    from pg_parquet_spark.operators.drift import robust_outliers

    fns = {"hour": F.hour, "day": F.dayofmonth, "month": F.month}
    if season not in fns:
        raise ValueError(
            f"season must be one of {sorted(fns)} (engine-identical "
            f"calendar keys), got {season!r}"
        )
    key = F.concat_ws(
        ":", F.col(group_col).cast("string"), fns[season](F.col(ts_col)).cast("string")
    )
    return robust_outliers(
        events,
        id_col=id_col,
        group_col=key,
        value_col=value_col,
        c_x10000=c_x10000,
    )


def seasonal_outliers_oracle_sql(
    id_col: str = "event_id",
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    season: str = "hour",
    c_x10000: int = 44478,
    table: str = "events",
) -> str:
    """DuckDB replica: same composite season key through the same
    robust fence arithmetic (flagged ROWS, matching robust_outliers)."""
    fns = {"hour": "hour", "day": "dayofmonth", "month": "month"}
    key = (
        f"concat(CAST({group_col} AS VARCHAR), ':', "
        f"CAST({fns[season]}({ts_col}) AS VARCHAR))"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {key} AS grp,
         CAST(floor(CAST({value_col} AS DOUBLE) * 1000 + 0.5) AS BIGINT)
           AS v_milli
  FROM {table} WHERE {value_col} IS NOT NULL
), med AS (
  SELECT grp, CAST(quantile_cont(v_milli, 0.5) * 2 AS BIGINT) AS med2
  FROM base GROUP BY grp
), dev AS (
  SELECT base.grp, id, v_milli, abs(v_milli * 2 - med2) AS dev_milli_x2
  FROM base JOIN med USING (grp)
), mad AS (
  SELECT grp, CAST(quantile_cont(dev_milli_x2, 0.5) * 2 AS BIGINT) AS mad4
  FROM dev GROUP BY grp
)
SELECT id, dev.grp, v_milli, dev_milli_x2
FROM dev JOIN mad USING (grp)
WHERE dev_milli_x2 * 2 * 10000 > {int(c_x10000)} * mad4
ORDER BY dev.grp, id
"""


def interpolate_gaps(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    unit: int = 1000,
) -> DataFrame:
    """Linear-interpolation gap fill — the second resampling tier next
    to the LOCF gapfill (TimescaleDB's ``interpolate()`` vs ``locf()``):
    daily per-key totals on a generated date spine, missing days filled
    by the straight line between the surrounding known days; leading/
    trailing gaps take the nearest known value (no extrapolation).

    Determinism: day totals are exact integer milli-units (floor·unit
    +0.5 per value, integer SUM), and the interpolation is the
    POSITIVE-weighted integer average
    ``(prev·(nd−d) + next·(d−pd)) div (nd−pd)`` — exact integer
    arithmetic, identical on both engines while the operands stay
    non-negative. Negative day totals would make Spark's truncating
    ``div`` and DuckDB's flooring ``//`` diverge, so they FAIL FAST
    in-pass (the okey-guard stance) rather than silently drifting.

    Scale shape (the gapfill twin): one shuffle into the daily
    aggregate; the spine generates map-side from per-key min/max; the
    prev/next scans are two windows over the key partition — rows
    bounded by keys × days, never the event count."""
    from pyspark.sql import Window

    day_milli = F.floor(F.col(val_col) * unit + F.lit(0.5)).cast("long")
    daily = (
        events.select(
            F.col(key_col),
            F.to_date(ts_col).alias("day"),
            day_milli.alias("_vm"),
        )
        .groupBy(key_col, "day")
        .agg(F.sum("_vm").alias("vm"))
    )
    # NULL vm = a day whose values were ALL NULL (SUM over nothing):
    # it passes the guard untouched and flows as a GAP — exactly what
    # the oracle computes — instead of tripping the negative-total
    # error via NULL >= 0 evaluating NULL (ADVICE r10)
    guarded_vm = F.when(
        F.col("vm").isNull() | (F.col("vm") >= 0), F.col("vm")
    ).otherwise(
        F.raise_error(
            F.lit(
                "interpolate_gaps: negative day totals break integer-"
                "division parity between engines — shift values upstream"
            )
        ).cast("long")
    )
    daily = daily.select(key_col, "day", guarded_vm.alias("vm"))
    spine = (
        daily.groupBy(key_col)
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            key_col,
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    wp = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    j = spine.join(daily, [key_col, "day"], "left")
    known_day = F.when(F.col("vm").isNotNull(), F.col("day"))
    pv = F.last("vm", ignorenulls=True).over(wp)
    pd_ = F.last(known_day, ignorenulls=True).over(wp)
    nv = F.first("vm", ignorenulls=True).over(wn)
    nd = F.first(known_day, ignorenulls=True).over(wn)
    interp = (
        F.when(F.col("vm").isNotNull(), F.col("vm"))
        .when(pd_.isNull(), nv)
        .when(nd.isNull(), pv)
        .otherwise(
            F.expr(
                "(_pv * datediff(_nd, day) + _nv * datediff(day, _pd)) "
                "div datediff(_nd, _pd)"
            )
        )
    )
    return (
        j.select(
            key_col,
            "day",
            "vm",
            pv.alias("_pv"),
            pd_.alias("_pd"),
            nv.alias("_nv"),
            nd.alias("_nd"),
        )
        .select(
            key_col,
            F.col("day").cast("date").alias("day"),
            interp.cast("long").alias("filled_milli"),
            F.col("vm").isNull().alias("is_gap"),
        )
        .orderBy(key_col, "day")
    )


def interpolate_oracle_sql(
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    unit: int = 1000,
    table: str = "events",
    where: str | None = None,
) -> str:
    """DuckDB replica: same integer day totals, generate_series spine,
    IGNORE NULLS window scans, positive-weight integer interpolation
    (``//`` ≡ Spark ``div`` on non-negative operands)."""
    w = f"WHERE {where}" if where else ""
    return f"""
WITH daily AS (
  SELECT {key_col}, CAST({ts_col} AS DATE) AS day,
         SUM(CAST(FLOOR({val_col} * {unit} + 0.5) AS BIGINT)) AS vm
  FROM {table} {w}
  GROUP BY 1, 2
), bounds AS (
  SELECT {key_col}, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
), spine AS (
  SELECT {key_col},
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), j AS (
  SELECT s.{key_col}, s.day, d.vm,
    last_value(d.vm IGNORE NULLS) OVER
      (PARTITION BY s.{key_col} ORDER BY s.day
       ROWS UNBOUNDED PRECEDING) AS pv,
    last_value(CASE WHEN d.vm IS NOT NULL THEN s.day END IGNORE NULLS) OVER
      (PARTITION BY s.{key_col} ORDER BY s.day
       ROWS UNBOUNDED PRECEDING) AS pd,
    first_value(d.vm IGNORE NULLS) OVER
      (PARTITION BY s.{key_col} ORDER BY s.day
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN d.vm IS NOT NULL THEN s.day END IGNORE NULLS) OVER
      (PARTITION BY s.{key_col} ORDER BY s.day
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM spine s LEFT JOIN daily d USING ({key_col}, day)
)
SELECT {key_col}, day,
  CAST(CASE
    WHEN vm IS NOT NULL THEN vm
    WHEN pd IS NULL THEN nv
    WHEN nd IS NULL THEN pv
    ELSE (pv * (nd - day) + nv * (day - pd)) // (nd - pd)
  END AS BIGINT) AS filled_milli,
  vm IS NULL AS is_gap
FROM j ORDER BY {key_col}, day
"""


def active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Rolling active users (r14 — the DAU/WAU/MAU dashboard series):
    for every day on the activity spine, the EXACT count of distinct
    users with at least one event in the trailing ``window_days``-day
    window. Returns (day, active_users) for every day between the
    corpus's first and last activity, zero-filled, ordered.

    Sliding COUNT(DISTINCT) doesn't window-fold, so this uses the
    interval-delta decomposition instead of the quadratic day×user
    join the oracle runs: each user's activity day ``a`` (next
    activity ``a'``) covers exactly the report days
    ``[a, min(a+w−1, a'−1, last_day)]`` — the days where ``a`` is the
    user's latest in-window activity — so the union over activities
    counts every (user, day) cell exactly once. Each interval emits
    +1/−1 boundary deltas and a running sum over the day spine
    reconstructs the counts.

    Scale shape: one (user, day) distinct (the only event-volume
    shuffle, two narrow columns), one user-keyed LEAD window, then
    2 deltas per user-day into a days-sized aggregate; the final
    running sum is a single ordered window over the DAYS-sized frame
    (thousands of rows for years of history — counts-sized, never
    event-sized). NULL user/ts rows drop in BOTH engines."""
    return active_users_from_index(
        user_day_index(events, user_col, ts_col), window_days
    )


def user_day_index(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """The (user_id, day) distinct-activity index :func:`active_users`
    computes over — exposed because it is a MERGEABLE summary
    (set-union ≡ unionByName + distinct, idempotent), so a streaming
    drain can maintain it continuously
    (:func:`pg_parquet_spark.streaming.stream.drain_with_active_users`)
    and the dashboard reads it via :func:`active_users_from_index`
    without rescanning history. ``day`` is the integer epoch day
    (engine-neutral, ~12 bytes/row with the user id)."""
    return (
        events.filter(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("user_id"),
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).alias("day"),
        )
        .distinct()
    )


def active_users_from_index(
    index: DataFrame,
    window_days: int = 7,
) -> DataFrame:
    """:func:`active_users` from a materialized
    :func:`user_day_index` frame (columns ``user_id``, ``day`` as
    integer epoch days) — the read path of the streaming drain. Same
    output contract and interval-delta shape as active_users."""
    from pyspark.sql import Window

    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    w = int(window_days)
    ud = index.select(
        F.col("user_id").alias("_u"), F.col("day").cast("int").alias("_d")
    ).distinct()
    bounds = ud.agg(F.min("_d").alias("_d0"), F.max("_d").alias("_d1"))
    nxt = F.lead("_d").over(Window.partitionBy("_u").orderBy("_d"))
    ivals = (
        ud.withColumn("_nx", nxt)
        .crossJoin(F.broadcast(bounds))
        .select(
            F.col("_d").alias("_s"),
            F.least(
                F.col("_d") + (w - 1),
                F.coalesce(F.col("_nx") - 1, F.col("_d1")),
                F.col("_d1"),
            ).alias("_e"),
        )
    )
    deltas = (
        ivals.select(
            F.explode(
                F.array(
                    F.struct(F.col("_s").alias("_day"), F.lit(1).alias("_dl")),
                    F.struct(
                        (F.col("_e") + 1).alias("_day"), F.lit(-1).alias("_dl")
                    ),
                )
            ).alias("_x")
        )
        .select("_x._day", "_x._dl")
        .groupBy("_day")
        .agg(F.sum("_dl").alias("_delta"))
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(_d0, _d1)")).alias("_day")
    )
    wc = Window.orderBy("_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(deltas, "_day", "left")
        .select("_day", F.coalesce("_delta", F.lit(0)).alias("_delta"))
        .withColumn("active_users", F.sum("_delta").over(wc))
        .select(
            F.date_add(F.lit("1970-01-01"), F.col("_day").cast("int")).alias(
                "day"
            ),
            F.col("active_users").cast("long").alias("active_users"),
        )
        .orderBy("day")
    )


def active_users_oracle_sql(
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    table: str = "events",
) -> str:
    """DuckDB replica — deliberately the BRUTE-FORCE day×activity
    range join with COUNT(DISTINCT): oracle equality against it IS the
    proof that the interval-delta decomposition counts each (user,
    day) cell exactly once."""
    w = int(window_days)
    return f"""
WITH ud AS (
  SELECT DISTINCT {user_col} AS u, CAST({ts_col} AS DATE) AS d
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
), bounds AS (
  SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ud
), spine AS (
  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT s.day, CAST(COUNT(DISTINCT ud.u) AS BIGINT) AS active_users
FROM spine s LEFT JOIN ud
  ON ud.d <= s.day AND ud.d >= s.day - INTERVAL {w - 1} DAY
GROUP BY s.day ORDER BY s.day
"""


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    unit: int = 1000,
) -> DataFrame:
    """RFM customer segmentation (r14 — recency / frequency / monetary,
    the classic CRM cut): each user gets three 1-4 quartile scores —
    recency in whole days since their last event (LOWER is better),
    event count, and exact integer-milli spend — scored against the
    population quartiles, then the segments are aggregated. Returns
    (r_score, f_score, m_score, users, monetary_milli) ordered — at
    most 64 rows regardless of input size.

    Determinism: monetary folds through integer millis (floor·unit+0.5
    per value, NULL-safe to 0); quartiles ride the winsorize-proven
    ``percentile`` ≡ ``quantile_cont`` pairing ×4 (quartiles of
    integers land on exact .25 binary fractions, so ``q×4`` is an
    exact BIGINT in both engines — the robust-fence med×2/MAD×4 rule
    one notch finer); scores compare ``metric×4 > q×4`` in pure
    integers. Recency inverts the comparison (strictly below a
    quartile earns the point), so ties sit in the same band as the
    high-is-good metrics.

    Scale shape: one user-keyed aggregate (map-side partial), ONE
    1-row global frame carrying the anchor timestamp AND the nine
    quartile literals (crossJoin broadcast — the bounds-frame house
    pattern), and a ≤4³-group aggregate. No windows, no global sort."""
    anchor = events.filter(F.col(ts_col).isNotNull()).agg(
        F.max(F.col(ts_col).cast("timestamp").cast("long")).alias("_a")
    )
    per_user = (
        events.filter(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .groupBy(F.col(user_col).alias("_u"))
        .agg(
            F.max(F.col(ts_col).cast("timestamp").cast("long")).alias("_last"),
            F.count(F.lit(1)).alias("_f"),
            F.coalesce(
                F.sum(
                    F.floor(F.col(val_col).cast("double") * unit + F.lit(0.5))
                    .cast("long")
                ),
                F.lit(0),
            ).alias("_m"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "_u",
            F.expr("(_a - _last) div 86400").alias("_r"),
            "_f",
            "_m",
        )
    )
    qs = per_user.agg(
        *[
            (F.percentile(m, F.lit(q)) * 4).cast("long").alias(f"{m}q{int(q * 100)}")
            for m in ("_r", "_f", "_m")
            for q in (0.25, 0.5, 0.75)
        ]
    )
    scored = per_user.crossJoin(F.broadcast(qs))

    def hi(m: str):
        return (
            F.lit(1)
            + (F.col(m) * 4 > F.col(f"{m}q25")).cast("int")
            + (F.col(m) * 4 > F.col(f"{m}q50")).cast("int")
            + (F.col(m) * 4 > F.col(f"{m}q75")).cast("int")
        )

    r_score = (
        F.lit(1)
        + (F.col("_r") * 4 < F.col("_rq75")).cast("int")
        + (F.col("_r") * 4 < F.col("_rq50")).cast("int")
        + (F.col("_r") * 4 < F.col("_rq25")).cast("int")
    )
    return (
        scored.select(
            r_score.alias("r_score"),
            hi("_f").alias("f_score"),
            hi("_m").alias("m_score"),
            F.col("_m"),
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("users"),
            F.sum("_m").alias("monetary_milli"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def rfm_oracle_sql(
    user_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    unit: int = 1000,
    table: str = "events",
) -> str:
    """DuckDB replica: same integer-milli monetary fold, quantile_cont
    ×4 quartiles, inverted-recency scoring, segment aggregate."""
    return f"""
WITH per_user AS (
  SELECT {user_col} AS u,
         (SELECT CAST(FLOOR(epoch(MAX({ts_col}))) AS BIGINT) FROM {table})
           - CAST(FLOOR(epoch(MAX({ts_col}))) AS BIGINT) AS rec_s,
         COUNT(*) AS f,
         COALESCE(SUM(CAST(FLOOR({val_col} * {unit} + 0.5) AS BIGINT)), 0)
           AS m
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY u
), metrics AS (
  SELECT u, rec_s // 86400 AS r, f, m FROM per_user
), qs AS (
  SELECT
    CAST(quantile_cont(r, 0.25) * 4 AS BIGINT) AS rq25,
    CAST(quantile_cont(r, 0.50) * 4 AS BIGINT) AS rq50,
    CAST(quantile_cont(r, 0.75) * 4 AS BIGINT) AS rq75,
    CAST(quantile_cont(f, 0.25) * 4 AS BIGINT) AS fq25,
    CAST(quantile_cont(f, 0.50) * 4 AS BIGINT) AS fq50,
    CAST(quantile_cont(f, 0.75) * 4 AS BIGINT) AS fq75,
    CAST(quantile_cont(m, 0.25) * 4 AS BIGINT) AS mq25,
    CAST(quantile_cont(m, 0.50) * 4 AS BIGINT) AS mq50,
    CAST(quantile_cont(m, 0.75) * 4 AS BIGINT) AS mq75
  FROM metrics
), scored AS (
  SELECT
    1 + CAST(r * 4 < rq75 AS INT) + CAST(r * 4 < rq50 AS INT)
      + CAST(r * 4 < rq25 AS INT) AS r_score,
    1 + CAST(f * 4 > fq25 AS INT) + CAST(f * 4 > fq50 AS INT)
      + CAST(f * 4 > fq75 AS INT) AS f_score,
    1 + CAST(m * 4 > mq25 AS INT) + CAST(m * 4 > mq50 AS INT)
      + CAST(m * 4 > mq75 AS INT) AS m_score,
    m
  FROM metrics, qs
)
SELECT r_score, f_score, m_score, COUNT(*) AS users,
       CAST(SUM(m) AS BIGINT) AS monetary_milli
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def mean_shift_changepoints(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    window_days: int = 3,
    top_k: int = 5,
    unit: int = 1000,
) -> DataFrame:
    """Level-shift changepoint scan (r14 — "when did this series
    change?"): per key, the daily integer-milli total series is
    zero-filled on its own min-max day spine (a missing day IS zero
    activity, unlike the gap-filling resamplers), and every day ``d``
    with a full ``window_days`` history on both sides is scored
    ``delta = sum(days [d, d+w-1]) − sum(days [d−w, d−1])`` — the
    two-sided moving-sum contrast whose peaks mark mean shifts.
    Returns the top ``top_k`` days per key by |delta| (ties broken on
    the earlier day): (key, day, delta_milli, rank) ordered.

    Exactness: window counts gate full frames only, sums are integer
    millis end-to-end, and ranking is over the exact integer |delta|
    with a deterministic day tiebreak — engine-identical.

    Scale shape: one shuffle into the (key, day) aggregate; the spine
    explodes map-side from per-key bounds; two moving-sum windows and
    the rank window all ride the SAME key partitioning over a
    keys×days-bounded frame — never the event count."""
    from pyspark.sql import Window

    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    daily = (
        events.filter(
            F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(key_col).alias("_k"),
            F.to_date(ts_col).alias("day"),
            F.floor(F.col(val_col).cast("double") * unit + F.lit(0.5))
            .cast("long")
            .alias("_vm"),
        )
        .groupBy("_k", "day")
        .agg(F.coalesce(F.sum("_vm"), F.lit(0)).alias("vm"))
    )
    spine = (
        daily.groupBy("_k")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "_k",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    grid = spine.join(daily, ["_k", "day"], "left").select(
        "_k", "day", F.coalesce("vm", F.lit(0)).alias("vm")
    )
    w = int(window_days)
    wp = Window.partitionBy("_k").orderBy("day").rowsBetween(-w, -1)
    wn = Window.partitionBy("_k").orderBy("day").rowsBetween(0, w - 1)
    scored = grid.select(
        "_k",
        "day",
        (F.sum("vm").over(wn) - F.sum("vm").over(wp)).alias("delta_milli"),
        (F.count("vm").over(wp) == w).alias("_full_p"),
        (F.count("vm").over(wn) == w).alias("_full_n"),
    ).filter(F.col("_full_p") & F.col("_full_n"))
    wr = Window.partitionBy("_k").orderBy(
        F.abs(F.col("delta_milli")).desc(), F.col("day").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_k)
        .select(F.col("_k").alias(key_col), "day", "delta_milli", "rank")
        .orderBy(key_col, "rank")
    )


def changepoint_oracle_sql(
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    window_days: int = 3,
    top_k: int = 5,
    unit: int = 1000,
    table: str = "events",
) -> str:
    """DuckDB replica: generate_series spine, zero-filled daily millis,
    identical ROWS frames and |delta| ranking."""
    w = int(window_days)
    return f"""
WITH daily AS (
  SELECT {key_col} AS k, CAST({ts_col} AS DATE) AS day,
         COALESCE(SUM(CAST(FLOOR({val_col} * {unit} + 0.5) AS BIGINT)), 0)
           AS vm
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY 1, 2
), bounds AS (
  SELECT k, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
), spine AS (
  SELECT k,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), grid AS (
  SELECT s.k, s.day, COALESCE(d.vm, 0) AS vm
  FROM spine s LEFT JOIN daily d ON s.k = d.k AND s.day = d.day
), scored AS (
  SELECT k, day,
    SUM(vm) OVER (PARTITION BY k ORDER BY day
                  ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
    - SUM(vm) OVER (PARTITION BY k ORDER BY day
                    ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING)
      AS delta_milli,
    COUNT(*) OVER (PARTITION BY k ORDER BY day
                   ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING) AS np,
    COUNT(*) OVER (PARTITION BY k ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS nn
  FROM grid
), ranked AS (
  SELECT k AS {key_col}, day, CAST(delta_milli AS BIGINT) AS delta_milli,
         ROW_NUMBER() OVER (PARTITION BY k
                            ORDER BY ABS(delta_milli) DESC, day ASC) AS rank
  FROM scored WHERE np = {w} AND nn = {w}
)
SELECT * FROM ranked WHERE rank <= {int(top_k)}
ORDER BY {key_col}, rank
"""


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict ordered funnel analysis (r13 — the product-analytics
    staple next to cohort retention and Markov transitions): a user
    reaches step k when a step-k event exists at or after their
    FIRST completion of step k−1 (each step's completion time is the
    earliest qualifying event, so progress is deterministic and one
    pass per step suffices). Returns one row per step:
    (step, event_type, users, conversion_ppm) — conversion is exact
    integer ppm against the step-1 population, ordered by step.

    Scale shape: k−1 user-keyed join+aggregate stages, each shuffling
    only (user, timestamp) pairs; the min-aggregate BEFORE each join
    keeps the carried frame at one row per user, so a power user
    never fans out. No windows, no text, no wide rows. k is the
    funnel length (bounded, typically 3-6)."""
    if len(steps) < 2:
        raise ValueError(
            f"funnel_steps needs at least 2 steps, got {len(steps)}"
        )
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_steps: duplicate step types")
    spark = events.sparkSession
    base = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
    )
    # each step both counts AND feeds the next join — persist so step
    # i's count never re-executes steps 1..i-1's chains from the scan
    reached = (
        base.filter(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_done"))
        .persist()
    )
    counts = [reached.count()]
    for s in steps[1:]:
        nxt = base.filter(F.col("_t") == s).select("_u", "_ts")
        prev = reached
        reached = (
            nxt.join(prev, "_u")
            .filter(F.col("_ts") >= F.col("_done"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_done"))
            .persist()
        )
        counts.append(reached.count())
        prev.unpersist()
    reached.unpersist()
    rows = []
    for i, (s, c) in enumerate(zip(steps, counts), start=1):
        conv = 0 if counts[0] == 0 else c * 1_000_000 // counts[0]
        rows.append((i, s, c, conv))
    return spark.createDataFrame(
        rows,
        "step long, event_type string, users long, conversion_ppm long",
    )


def retention_cohorts(
    events: DataFrame,
    period_sec: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention analysis (r14 — the second product-analytics
    staple next to :func:`funnel_steps`): users are cohorted by the
    period of their FIRST event (``period_sec``-wide epoch buckets,
    integer floor division — timezone-free identities like the rollup's
    ``bucket_epoch``), and each (cohort, age) cell counts the distinct
    users active ``age`` periods after their cohort period. Returns
    (cohort_epoch, age, users, retention_ppm) ordered — retention is
    exact integer ppm against the cohort's size (its age-0 row, which
    is the full cohort by construction: the first event is always in
    the cohort period, so retention_ppm starts at 1_000_000).

    Scale shape: one user-keyed shuffle to the per-user first-event
    period (map-side partial MIN), one (user, period) distinct over
    the activity pairs (the shuffle carries two longs per active
    user-period, never events), a user-keyed join of the two (both
    sides already user-clustered), and a counts-sized (cohort, age)
    aggregate joined to the broadcast-sized cohort totals. Rows with
    NULL user/ts are dropped in BOTH engines (a NULL user is not a
    cohort member)."""
    if period_sec <= 0:
        raise ValueError(f"period_sec must be positive, got {period_sec}")
    base = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        # NTZ → TIMESTAMP (session tz pinned UTC) → truncating epoch
        # seconds, then pure-integer period buckets (the rollup rule)
        F.expr(
            f"CAST(CAST({ts_col} AS TIMESTAMP) AS LONG) div {int(period_sec)}"
        ).alias("_p"),
    )
    acts = base.distinct()
    cohorts = base.groupBy("_u").agg(F.min("_p").alias("_c"))
    sizes = cohorts.groupBy("_c").agg(F.count(F.lit(1)).alias("_n0"))
    cells = (
        acts.join(cohorts, "_u")
        .groupBy("_c", (F.col("_p") - F.col("_c")).alias("age"))
        .agg(F.count(F.lit(1)).alias("users"))
    )
    return (
        cells.join(F.broadcast(sizes), "_c")
        .select(
            (F.col("_c") * period_sec).alias("cohort_epoch"),
            F.col("age"),
            F.col("users"),
            F.expr("users * 1000000 div _n0").alias("retention_ppm"),
        )
        .orderBy("cohort_epoch", "age")
    )


def retention_oracle_sql(
    period_sec: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    table: str = "events",
) -> str:
    """DuckDB replica: same integer period buckets (``//`` ≡ Spark's
    truncating ``div`` on post-1970 epochs), same distinct-activity /
    first-period join, integer ppm against the age-0 cohort size."""
    return f"""
WITH base AS (
  SELECT {user_col} AS u,
         CAST(FLOOR(epoch({ts_col})) AS BIGINT) // {period_sec} AS p
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
), cohorts AS (
  SELECT u, MIN(p) AS c FROM base GROUP BY u
), sizes AS (
  SELECT c, COUNT(*) AS n0 FROM cohorts GROUP BY c
), acts AS (
  SELECT DISTINCT u, p FROM base
), cells AS (
  SELECT cohorts.c, acts.p - cohorts.c AS age, COUNT(*) AS users
  FROM acts JOIN cohorts USING (u) GROUP BY 1, 2
)
SELECT c * {period_sec} AS cohort_epoch, age, users,
       users * 1000000 // n0 AS retention_ppm
FROM cells JOIN sizes USING (c)
ORDER BY cohort_epoch, age
"""


def attribution_report(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: list[str] | None = None,
    mode: str = "last",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Single-touch conversion attribution (r14 — the marketing-
    analytics staple): every ``conversion_type`` event is credited to
    the user's last (or first, ``mode='first'``) ``touch_types`` event
    STRICTLY before it in the composite (ts, id) order; conversions
    with no preceding touch credit the literal ``direct`` channel.
    Returns (channel, conversions, share_ppm) ordered — share is exact
    integer ppm of all conversions.

    Scale shape: ONE user-keyed window shuffle (narrow columns only);
    the carried-touch scan is a running FIRST/LAST over the user
    partition, so a user's cost is their event count; the report is a
    channels-sized aggregate against a 1-row total frame. NULL
    user/ts/id rows are dropped in BOTH engines; NULL types can never
    match a step literal so they flow through as non-touch filler."""
    touches = touch_types if touch_types is not None else ["view", "click"]
    if not touches:
        raise ValueError("attribution_report: touch_types must be non-empty")
    if conversion_type in touches:
        raise ValueError(
            "attribution_report: conversion_type cannot also be a touch type"
        )
    if mode not in ("first", "last"):
        raise ValueError(f"mode must be 'first' or 'last', got {mode!r}")
    from pyspark.sql import Window

    base = events.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    w = (
        Window.partitionBy("_u")
        .orderBy("_ts", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("_t").isin(list(touches)), F.col("_t"))
    carried = (
        F.first(touch, ignorenulls=True).over(w)
        if mode == "first"
        else F.last(touch, ignorenulls=True).over(w)
    )
    conv = base.withColumn("_ch", carried).filter(
        F.col("_t") == conversion_type
    )
    counts = conv.groupBy(
        F.coalesce(F.col("_ch"), F.lit("direct")).alias("channel")
    ).agg(F.count(F.lit(1)).alias("conversions"))
    wt = Window.partitionBy()
    return (
        counts.withColumn("_tot", F.sum("conversions").over(wt))
        .select(
            "channel",
            "conversions",
            F.expr("conversions * 1000000 div _tot").alias("share_ppm"),
        )
        .orderBy("channel")
    )


def attribution_oracle_sql(
    conversion_type: str = "purchase",
    touch_types: list[str] | None = None,
    mode: str = "last",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    table: str = "events",
) -> str:
    """DuckDB replica: first_value/last_value IGNORE NULLS over the
    identical (user / ts, id) window with the same 1-PRECEDING frame,
    same integer ppm shares."""
    touches = touch_types if touch_types is not None else ["view", "click"]
    if not touches:
        raise ValueError("attribution: touch_types must be non-empty")
    if mode not in ("first", "last"):
        raise ValueError(f"mode must be 'first' or 'last', got {mode!r}")

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    in_list = ", ".join(lit(t) for t in touches)
    fn = "first_value" if mode == "first" else "last_value"
    return f"""
WITH base AS (
  SELECT {user_col} AS u, {type_col} AS t, {ts_col} AS ts0, {id_col} AS rid
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {id_col} IS NOT NULL
), marked AS (
  SELECT t,
    {fn}(CASE WHEN t IN ({in_list}) THEN t END IGNORE NULLS) OVER (
      PARTITION BY u ORDER BY ts0, rid
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS ch
  FROM base
), counts AS (
  SELECT COALESCE(ch, 'direct') AS channel, COUNT(*) AS conversions
  FROM marked WHERE t = {lit(conversion_type)} GROUP BY 1
)
SELECT channel, conversions,
       CAST(conversions * 1000000 // SUM(conversions) OVER () AS BIGINT)
         AS share_ppm
FROM counts ORDER BY channel
"""


#: persisted funnel-chain frames (funnel_latency): each step's per-user
#: frame feeds BOTH its latency aggregate and the next step's join, so
#: they stay cached until the caller's action — registered here and
#: FIFO-trimmed (the drift/dedup self-cleaning-cache convention).
_CACHED_FRAMES: list[DataFrame] = []
_CACHE_KEEP = 16


def release_cached() -> None:
    while _CACHED_FRAMES:
        _CACHED_FRAMES.pop().unpersist()


def _trim_cache() -> None:
    while len(_CACHED_FRAMES) > _CACHE_KEEP:
        _CACHED_FRAMES.pop(0).unpersist()


def funnel_latency(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel step-latency report (r14 — "how long does each step
    take?", the timing companion to :func:`funnel_steps`): for every
    step k ≥ 2, over the users who reached it under the same strict
    min-completion semantics, the user count plus the MEDIAN seconds
    from the previous step and from funnel entry. Returns
    (step, event_type, users, med_step_sec2, med_total_sec2) ordered —
    medians ride the robust-fence med×2 integer trick (exact
    percentile of integer epoch-second diffs ×2 is an exact BIGINT on
    both engines); a step nobody reached reports (0, NULL, NULL).
    The whole chain runs at WHOLE-SECOND granularity (timestamps
    truncate to epoch seconds before comparing — the latency unit), so
    same-second progressions count just as in funnel_steps, but an
    event earlier within the same second also counts; counts can
    differ from funnel_steps only at sub-second resolution.

    Scale shape: the funnel chain's k−1 user-keyed join+min stages
    (one row per user carried, the funnel_steps contract) with the
    entry timestamp riding along; each step's frame feeds its 1-row
    latency aggregate AND the next join, persisted so the chain
    evaluates once per step (the funnel O(k²) lesson), registered in
    the module cache for FIFO cleanup."""
    if len(steps) < 2:
        raise ValueError(
            f"funnel_latency needs at least 2 steps, got {len(steps)}"
        )
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_latency: duplicate step types")
    _trim_cache()
    es = F.col(ts_col).cast("timestamp").cast("long")
    base = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        es.alias("_es"),
    )
    prev = (
        base.filter(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_es").alias("_done"))
        .select("_u", "_done", F.col("_done").alias("_d1"))
        .persist()
    )
    _CACHED_FRAMES.append(prev)
    med2 = lambda c: (F.percentile(c, F.lit(0.5)) * 2).cast("long")  # noqa: E731
    out = None
    for i, s in enumerate(steps[1:], start=2):
        nxt = base.filter(F.col("_t") == s).select("_u", "_es")
        cur = (
            nxt.join(prev, "_u")
            .filter(F.col("_es") >= F.col("_done"))
            .groupBy("_u")
            .agg(
                F.min("_es").alias("_new"),
                F.min("_done").alias("_prev"),
                F.min("_d1").alias("_d1x"),
            )
            .persist()
        )
        _CACHED_FRAMES.append(cur)
        agg = cur.agg(
            F.count(F.lit(1)).alias("users"),
            med2(F.col("_new") - F.col("_prev")).alias("med_step_sec2"),
            med2(F.col("_new") - F.col("_d1x")).alias("med_total_sec2"),
        ).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(s).alias("event_type"),
            "users",
            "med_step_sec2",
            "med_total_sec2",
        )
        out = agg if out is None else out.unionByName(agg)
        prev = cur.select(
            "_u", F.col("_new").alias("_done"), F.col("_d1x").alias("_d1")
        )
    return out.orderBy("step")


def funnel_latency_oracle_sql(
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    table: str = "events",
) -> str:
    """DuckDB replica: the min-completion chain unrolled as CTEs with
    the entry and previous-step timestamps carried per user,
    quantile_cont ×2 medians over the same integer second diffs."""
    if len(steps) < 2:
        raise ValueError("funnel_latency needs >= 2 steps")

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    parts = [
        f"""s1 AS (
  SELECT {user_col} AS u,
         MIN(CAST(FLOOR(epoch({ts_col})) AS BIGINT)) AS done,
         MIN(CAST(FLOOR(epoch({ts_col})) AS BIGINT)) AS d1
  FROM {table} WHERE {type_col} = {lit(steps[0])} GROUP BY {user_col}
)"""
    ]
    for i, s in enumerate(steps[1:], start=2):
        parts.append(f"""s{i} AS (
  SELECT e.{user_col} AS u,
         MIN(CAST(FLOOR(epoch(e.{ts_col})) AS BIGINT)) AS done,
         MIN(p.done) AS prevdone, MIN(p.d1) AS d1
  FROM {table} e JOIN s{i - 1} p ON e.{user_col} = p.u
  WHERE e.{type_col} = {lit(s)}
    AND CAST(FLOOR(epoch(e.{ts_col})) AS BIGINT) >= p.done
  GROUP BY e.{user_col}
)""")
    selects = []
    for i, s in enumerate(steps[1:], start=2):
        selects.append(
            f"SELECT CAST({i} AS BIGINT) AS step, {lit(s)} AS event_type, "
            f"CAST((SELECT COUNT(*) FROM s{i}) AS BIGINT) AS users, "
            f"(SELECT CAST(quantile_cont(done - prevdone, 0.5) * 2 AS BIGINT) "
            f"FROM s{i}) AS med_step_sec2, "
            f"(SELECT CAST(quantile_cont(done - d1, 0.5) * 2 AS BIGINT) "
            f"FROM s{i}) AS med_total_sec2"
        )
    body = ",\n".join(parts)
    union = "\nUNION ALL\n".join(selects)
    return f"WITH {body}\nSELECT * FROM ({union}) ORDER BY step\n"


def funnel_oracle_sql(
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    table: str = "events",
) -> str:
    """DuckDB replica: the same per-step min-completion chain unrolled
    as CTEs, integer ppm conversion."""
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    parts = [
        f"""s1 AS (
  SELECT {user_col} AS u, MIN({ts_col}) AS done
  FROM {table} WHERE {type_col} = {lit(steps[0])} GROUP BY {user_col}
)"""
    ]
    for i, s in enumerate(steps[1:], start=2):
        parts.append(f"""s{i} AS (
  SELECT e.{user_col} AS u, MIN(e.{ts_col}) AS done
  FROM {table} e JOIN s{i - 1} p ON e.{user_col} = p.u
  WHERE e.{type_col} = {lit(s)} AND e.{ts_col} >= p.done
  GROUP BY e.{user_col}
)""")
    selects = []
    for i, s in enumerate(steps, start=1):
        selects.append(
            f"SELECT CAST({i} AS BIGINT) AS step, {lit(s)} AS event_type, "
            f"CAST((SELECT COUNT(*) FROM s{i}) AS BIGINT) AS users, "
            f"CAST(CASE WHEN (SELECT COUNT(*) FROM s1) = 0 THEN 0 "
            f"ELSE (SELECT COUNT(*) FROM s{i}) * 1000000 "
            f"// (SELECT COUNT(*) FROM s1) END AS BIGINT) AS conversion_ppm"
        )
    body = ",\n".join(parts)
    union = "\nUNION ALL\n".join(selects)
    return f"WITH {body}\nSELECT * FROM ({union}) ORDER BY step\n"


def trend_slopes(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    unit: int = 1000,
) -> DataFrame:
    """Per-key daily trend estimation (r14 — "is this series growing?"):
    OLS slope of the daily integer-milli totals against the day index
    (days since the key's own first active day; only OBSERVED days
    regress — a silent day is absence of evidence here, unlike the
    changepoint scan's zero-fill, and the docstring is the contract).
    Returns (key, n_days, slope_milli_per_day_micro) ordered — the
    slope in milli-units/day, floor-quantized to micro precision.

    Determinism: the five regression moments (n, Σx, Σy, Σxy, Σx²)
    fold as exact integers/decimals (x = small day index, y = exact
    milli totals); the closed-form slope
    (n·Σxy − Σx·Σy) / (n·Σx² − Σx²) evaluates in doubles mirrored
    op-for-op (each input cast is correctly rounded, the op sequence
    identical — the q_outlier_zscore contract). Keys with < 2 active
    days report NULL.

    Scale shape: one shuffle into the (key, day) aggregate, a per-key
    min-day broadcast join, then a key-keyed 5-moment aggregate —
    counts-sized everywhere after the daily fold."""
    daily = (
        events.filter(
            F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(key_col).alias("_k"),
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).alias("_d"),
            F.floor(F.col(val_col).cast("double") * unit + F.lit(0.5))
            .cast("long")
            .alias("_vm"),
        )
        .groupBy("_k", "_d")
        .agg(F.coalesce(F.sum("_vm"), F.lit(0)).alias("y"))
    )
    mins = daily.groupBy("_k").agg(F.min("_d").alias("_d0"))
    xy = daily.join(F.broadcast(mins), "_k").select(
        "_k",
        (F.col("_d") - F.col("_d0")).cast("decimal(38,0)").alias("x"),
        F.col("y").cast("decimal(38,0)").alias("yv"),
    )
    m = xy.groupBy("_k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("x") * F.col("yv")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxyd, sxxd = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    den = nd * sxxd - sxd * sxd
    # NULL-guarded denominator (the cuped_report CSE lesson)
    slope = F.when(
        (F.col("n") >= 2) & (den > 0),
        (nd * sxyd - sxd * syd) / F.when(den > 0, den),
    )
    return m.select(
        F.col("_k").alias(key_col),
        F.col("n").cast("long").alias("n_days"),
        F.floor(slope * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("slope_milli_per_day_micro"),
    ).orderBy(key_col)


def trend_slopes_oracle_sql(
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    unit: int = 1000,
    table: str = "events",
) -> str:
    """DuckDB replica: same integer daily totals and day indexes, the
    same five exact moments, the same double op order and floor
    quantization."""
    return f"""
WITH daily AS (
  SELECT {key_col} AS k, CAST({ts_col} AS DATE) AS d,
         COALESCE(SUM(CAST(FLOOR({val_col} * {unit} + 0.5) AS BIGINT)), 0)
           AS y
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY 1, 2
), mins AS (
  SELECT k, MIN(d) AS d0 FROM daily GROUP BY 1
), xy AS (
  SELECT daily.k, CAST(daily.d - mins.d0 AS HUGEINT) AS x,
         CAST(y AS HUGEINT) AS yv
  FROM daily JOIN mins ON daily.k = mins.k
), m AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(yv) AS DOUBLE) AS sy,
         CAST(SUM(x * yv) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM xy GROUP BY 1
)
SELECT k AS {key_col}, n AS n_days,
  CAST(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
       THEN FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx)
                  * 1000000 + 0.5) END AS BIGINT)
    AS slope_milli_per_day_micro
FROM m ORDER BY {key_col}
"""


def entry_paths(
    events: DataFrame,
    depth: int = 3,
    top_k: int = 10,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Entry-path analysis (r14 — "how do users start?"): each user's
    first ``depth`` events (composite (ts, id) order) join into a
    ``a>b>c`` path string; paths rank by user count. Returns the top
    ``top_k`` rows (path, users, share_ppm) — share against ALL users
    with ≥1 qualifying event; ties rank alphabetically on the path.
    Users with fewer than ``depth`` events contribute their shorter
    prefix (real onboarding truncates — dropping them would hide
    bounce paths).

    Scale shape: one user-keyed window keeps only rank ≤ depth rows
    (narrow columns — a power user contributes ``depth`` rows, never
    their history), one user-keyed sorted-collect over those ≤ depth
    rows, and a paths-sized count aggregate; the final rank rides the
    counts frame. NULL user/ts/id/type rows drop in BOTH engines."""
    from pyspark.sql import Window

    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    base = events.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(id_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    w = Window.partitionBy("_u").orderBy("_ts", "_id")
    firsts = base.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= depth
    )
    paths = (
        firsts.groupBy("_u")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_r", "_t"))
            ).alias("_seq")
        )
        .select(
            F.concat_ws(
                ">", F.transform(F.col("_seq"), lambda s: s["_t"])
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("users"))
    wt = Window.partitionBy()
    wr = Window.orderBy(F.col("users").desc(), F.col("path").asc())
    return (
        counts.withColumn("_tot", F.sum("users").over(wt))
        .withColumn("_rk", F.row_number().over(wr))
        .filter(F.col("_rk") <= top_k)
        .select(
            "path",
            "users",
            F.expr("users * 1000000 div _tot").alias("share_ppm"),
        )
        .orderBy(F.col("users").desc(), F.col("path").asc())
    )


def entry_paths_oracle_sql(
    depth: int = 3,
    top_k: int = 10,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    table: str = "events",
) -> str:
    """DuckDB replica: ROW_NUMBER over the identical (user / ts, id)
    window, ordered string_agg, same counts and tie-breaks."""
    return f"""
WITH base AS (
  SELECT {user_col} AS u, {type_col} AS t, {ts_col} AS ts0, {id_col} AS rid,
         ROW_NUMBER() OVER (
           PARTITION BY {user_col} ORDER BY {ts_col}, {id_col}
         ) AS r
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {id_col} IS NOT NULL AND {type_col} IS NOT NULL
), paths AS (
  SELECT u, string_agg(t, '>' ORDER BY r) AS path
  FROM base WHERE r <= {int(depth)} GROUP BY u
), counts AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS users FROM paths GROUP BY path
), ranked AS (
  SELECT path, users,
         CAST(users * 1000000 // SUM(users) OVER () AS BIGINT) AS share_ppm,
         ROW_NUMBER() OVER (ORDER BY users DESC, path ASC) AS rk
  FROM counts
)
SELECT path, users, share_ppm FROM ranked
WHERE rk <= {int(top_k)} ORDER BY users DESC, path ASC
"""


def engagement_gini(
    events: DataFrame,
    user_col: str = "user_id",
) -> DataFrame:
    """Engagement-concentration report (r14 — the whale-analysis
    stat): the Gini coefficient of per-user event counts, exact via
    the rank identity G = (2·Σᵢ i·xᵢ) / (n·Σx) − (n+1)/n over counts
    sorted ascending (ties on user id — any total order over equal
    values yields the same sum). Returns ONE row
    (n_users, n_events, gini_ppm) — gini in exact integer ppm:
    ppm = (2·Σ i·xᵢ·10⁶ − (n+1)·Σx·10⁶) div (n·Σx), pure BIGINT
    arithmetic end-to-end (no float at all).

    Scale shape: one user-keyed count aggregate (map-side partials),
    then the rank over the USERS-sized counts frame (a single ordered
    window over counts, not events) and a 1-row fold. NULL users drop
    in BOTH engines."""
    from pyspark.sql import Window

    per = (
        events.filter(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.count(F.lit(1)).alias("_x"))
    )
    w = Window.orderBy(F.col("_x").asc(), F.col("_u").asc())
    ranked = per.withColumn("_i", F.row_number().over(w))
    # DECIMAL(38,0) moment folds (review, late-r14): pure-BIGINT
    # 2·Σi·xᵢ·10⁶ overflows int64 near ~3M users (Σi·x ≈ n²/2) — the
    # whale-analysis stat must survive whale-scale input. The identity
    # is unchanged; only the carrier widens (the cuped/trend rule).
    return ranked.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("_x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("_i").cast("decimal(38,0)") * F.col("_x")).alias("six"),
    ).select(
        F.col("n").cast("long").alias("n_users"),
        F.col("sx").cast("long").alias("n_events"),
        F.expr(
            "CASE WHEN n = 0 OR sx = 0 THEN NULL "
            "ELSE (2 * six - (n + 1) * sx) * 1000000 div (n * sx) "
            "END"
        )
        .cast("long")
        .alias("gini_ppm"),
    )


def engagement_gini_oracle_sql(
    user_col: str = "user_id",
    table: str = "events",
) -> str:
    """DuckDB replica: identical rank identity in pure BIGINTs."""
    return f"""
WITH per AS (
  SELECT {user_col} AS u, CAST(COUNT(*) AS BIGINT) AS x
  FROM {table} WHERE {user_col} IS NOT NULL GROUP BY 1
), ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x ASC, u ASC) AS i FROM per
), m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(CAST(i AS HUGEINT) * x) AS HUGEINT) AS six
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_users, CAST(sx AS BIGINT) AS n_events,
  CAST(CASE WHEN n = 0 OR sx = 0 THEN NULL
       ELSE (2 * six - (n + 1) * sx) * 1000000 // (n * sx)
       END AS BIGINT) AS gini_ppm
FROM m
"""


def cohort_ltv(
    events: DataFrame,
    period_sec: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    unit: int = 1000,
) -> DataFrame:
    """Cohort LTV curves (r14 — the revenue dimension
    :func:`retention_cohorts` lacks): per (cohort, age) cell, the
    period's exact integer-milli revenue, its running cumulative, and
    the cumulative PER COHORT USER (the curve growth teams plot).
    Returns (cohort_epoch, age, period_milli, cum_milli,
    cum_per_user_milli) ordered — all exact integers; the per-user
    division is integer ``div`` against the FULL cohort size (not the
    period's active users — lapsed users dilute LTV, which is the
    point of the metric). Ages with activity but all-NULL values
    report 0 revenue; silent (cohort, age) cells don't emit rows
    (join the retention grid if a dense matrix is needed).

    Scale shape: one per-user MIN shuffle for the cohort key, one
    user-keyed equi-join carrying (user, period, value_milli), a
    (cohort, age) counts-sized aggregate, a cohort-partitioned cumsum
    window over that counts frame, and a broadcast cohort-size join."""
    if period_sec <= 0:
        raise ValueError(f"period_sec must be positive, got {period_sec}")
    from pyspark.sql import Window

    base = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.expr(
            f"CAST(CAST({ts_col} AS TIMESTAMP) AS LONG) div {int(period_sec)}"
        ).alias("_p"),
        F.coalesce(
            F.floor(F.col(val_col).cast("double") * unit + F.lit(0.5))
            .cast("long"),
            F.lit(0),
        ).alias("_vm"),
    )
    cohorts = base.groupBy("_u").agg(F.min("_p").alias("_c"))
    sizes = cohorts.groupBy("_c").agg(F.count(F.lit(1)).alias("_n0"))
    cells = (
        base.join(cohorts, "_u")
        .groupBy("_c", (F.col("_p") - F.col("_c")).alias("age"))
        .agg(F.sum("_vm").alias("period_milli"))
    )
    wc = (
        Window.partitionBy("_c")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.withColumn("cum_milli", F.sum("period_milli").over(wc))
        .join(F.broadcast(sizes), "_c")
        .select(
            (F.col("_c") * period_sec).alias("cohort_epoch"),
            "age",
            "period_milli",
            "cum_milli",
            F.expr("cum_milli div _n0").alias("cum_per_user_milli"),
        )
        .orderBy("cohort_epoch", "age")
    )


def cohort_ltv_oracle_sql(
    period_sec: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    unit: int = 1000,
    table: str = "events",
) -> str:
    """DuckDB replica: same integer periods/millis, same cohort join,
    running-sum window and integer per-user division."""
    return f"""
WITH base AS (
  SELECT {user_col} AS u,
         CAST(FLOOR(epoch({ts_col})) AS BIGINT) // {int(period_sec)} AS p,
         COALESCE(CAST(FLOOR({val_col} * {unit} + 0.5) AS BIGINT), 0) AS vm
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
), cohorts AS (
  SELECT u, MIN(p) AS c FROM base GROUP BY u
), sizes AS (
  SELECT c, COUNT(*) AS n0 FROM cohorts GROUP BY c
), cells AS (
  SELECT cohorts.c, base.p - cohorts.c AS age,
         CAST(SUM(vm) AS BIGINT) AS period_milli
  FROM base JOIN cohorts USING (u) GROUP BY 1, 2
), cum AS (
  SELECT c, age, period_milli,
         CAST(SUM(period_milli) OVER (
           PARTITION BY c ORDER BY age
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_milli
  FROM cells
)
SELECT c * {int(period_sec)} AS cohort_epoch, age, period_milli, cum_milli,
       cum_milli // n0 AS cum_per_user_milli
FROM cum JOIN sizes USING (c)
ORDER BY cohort_epoch, age
"""


def ewma_anomaly(
    events: DataFrame,
    period_sec: int = 86400,
    k_lags: int = 8,
    band_mult: int = 3,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """EWMA control band over per-(key, period) event counts (r14 —
    the smoothing/alerting primitive the monitors in :mod:`drift`
    lack): each period's count is compared against the exponentially
    weighted moving average of the ``k_lags`` PRIOR periods, and
    flagged when it exceeds ``band_mult``× the forecast (or falls
    under 1/``band_mult`` of it) — the ops-dashboard "traffic spiked /
    collapsed" alert.

    Exact integer arithmetic end-to-end: the truncated α=1/2 EWMA over
    lags 1..K is  Σⱼ 2^(K−j)·x_{t−j} / (2^K − 1), so
    ewma_milli = 1000·Σ div (2^K−1) — pure BIGINT, no float (the
    geometric weights are exact powers of two; truncating the series
    at K lags is what makes the normalizer a closed integer). Gaps are
    zero-filled on the dense per-key period grid first (an absent
    period IS zero traffic — skipping it would both shift the lag
    window and hide the collapse the band exists to catch). The first
    K grid periods per key have no full window and report NULL ewma /
    false flags in BOTH engines.

    Returns (key, period_epoch, n_events, ewma_milli, anomaly_high,
    anomaly_low) ordered. NULL key/ts rows drop.

    Scale shape: one (key, period) count aggregate (map-side
    partials), a per-key span fold, the grid explode (periods are
    wall-clock-bounded — the time axis does not grow with data
    volume), and ONE key-partitioned window for row_number + the K
    lags. Nothing corpus-sized crosses a single task; K is a literal,
    so the lag fan-in is a fixed column list in codegen, not an
    iteration."""
    if period_sec <= 0:
        raise ValueError(f"period_sec must be positive, got {period_sec}")
    per = key_period_counts(events, period_sec, key_col, ts_col)
    return ewma_from_counts(per, period_sec, k_lags, band_mult)


def key_period_counts(
    events: DataFrame,
    period_sec: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(key, period, n) count index — :func:`ewma_anomaly`'s entire
    sufficient statistic (and a streaming-maintainable one: counts
    merge by SUM, see ``stream.drain_with_ewma_alerts``). NULL key/ts
    rows drop."""
    if period_sec <= 0:
        raise ValueError(f"period_sec must be positive, got {period_sec}")
    return (
        events.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.expr(
                f"CAST(CAST({ts_col} AS TIMESTAMP) AS LONG) div {int(period_sec)}"
            ).alias("period"),
        )
        .groupBy("key", "period")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ewma_from_counts(
    counts: DataFrame,
    period_sec: int,
    k_lags: int = 8,
    band_mult: int = 3,
) -> DataFrame:
    """The EWMA band computed from a (key, period, n) count index —
    the read side of the streaming drain; ``ewma_anomaly(df) ≡
    ewma_from_counts(key_period_counts(df))`` bit-for-bit (asserted in
    tests). Everything here is counts-sized."""
    if period_sec <= 0:
        raise ValueError(f"period_sec must be positive, got {period_sec}")
    if not (1 <= k_lags <= 30):
        raise ValueError(f"k_lags must be in [1, 30], got {k_lags}")
    if band_mult < 2:
        raise ValueError(f"band_mult must be >= 2, got {band_mult}")
    from pyspark.sql import Window

    per = counts.select(
        "key", F.col("period").alias("_p"), F.col("n").alias("_x")
    )
    grid = (
        per.groupBy("key")
        .agg(F.min("_p").alias("_lo"), F.max("_p").alias("_hi"))
        .select("key", F.explode(F.expr("sequence(_lo, _hi)")).alias("_p"))
    )
    filled = grid.join(per, ["key", "_p"], "left").select(
        "key", "_p", F.coalesce("_x", F.lit(0)).alias("_x")
    )
    w = Window.partitionBy("key").orderBy("_p")
    den = (1 << k_lags) - 1
    num = None
    for j in range(1, k_lags + 1):
        term = F.lag("_x", j).over(w) * F.lit(1 << (k_lags - j))
        num = term if num is None else num + term
    out = (
        filled.withColumn("_rn", F.row_number().over(w))
        .withColumn("_num", num)
        .select(
            "key",
            (F.col("_p") * period_sec).alias("period_epoch"),
            F.col("_x").alias("n_events"),
            F.when(
                F.col("_rn") > k_lags,
                F.expr(f"(1000 * _num) div {den}"),
            ).alias("ewma_milli"),
            "_rn",
        )
    )
    return out.select(
        "key",
        "period_epoch",
        "n_events",
        "ewma_milli",
        (
            F.col("ewma_milli").isNotNull()
            & (F.col("n_events") * 1000 > F.col("ewma_milli") * band_mult)
        ).alias("anomaly_high"),
        (
            F.col("ewma_milli").isNotNull()
            & (F.col("n_events") * 1000 * band_mult < F.col("ewma_milli"))
        ).alias("anomaly_low"),
    ).orderBy("key", "period_epoch")


def ewma_anomaly_oracle_sql(
    period_sec: int = 86400,
    k_lags: int = 8,
    band_mult: int = 3,
    key_col: str = "event_type",
    ts_col: str = "ts",
    table: str = "events",
) -> str:
    """DuckDB replica: identical zero-filled grid, identical
    power-of-two lag fold and integer division."""
    den = (1 << k_lags) - 1
    terms = " + ".join(
        f"({1 << (k_lags - j)} * LAG(x, {j}) OVER w)"
        for j in range(1, k_lags + 1)
    )
    return f"""
WITH per AS (
  SELECT {key_col} AS key,
         CAST(FLOOR(epoch({ts_col})) AS BIGINT) // {int(period_sec)} AS p,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY 1, 2
), spans AS (
  SELECT key, MIN(p) AS lo, MAX(p) AS hi FROM per GROUP BY key
), grid AS (
  SELECT key, UNNEST(generate_series(lo, hi)) AS p FROM spans
), filled AS (
  SELECT grid.key, grid.p, COALESCE(per.x, 0) AS x
  FROM grid LEFT JOIN per ON grid.key = per.key AND grid.p = per.p
), scored AS (
  SELECT key, p, x,
         ROW_NUMBER() OVER w AS rn,
         ({terms}) AS num
  FROM filled
  WINDOW w AS (PARTITION BY key ORDER BY p)
)
SELECT key, p * {int(period_sec)} AS period_epoch, x AS n_events,
       CASE WHEN rn > {int(k_lags)}
            THEN (1000 * num) // {den} END AS ewma_milli,
       (rn > {int(k_lags)} AND x * 1000 >
          ((1000 * num) // {den}) * {int(band_mult)}) AS anomaly_high,
       (rn > {int(k_lags)} AND x * 1000 * {int(band_mult)} <
          ((1000 * num) // {den})) AS anomaly_low
FROM scored
ORDER BY key, period_epoch
"""


def kaplan_meier_retention(
    events: DataFrame,
    period_sec: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Kaplan-Meier retention survival by tenure (r14 — the censoring-
    aware completion of the retention arc: :func:`retention_cohorts`
    counts who came back, this estimates how long users LIVE when the
    youngest cohorts are still alive and must not be counted as
    churned). Users enter at their first active period; a user whose
    last activity predates the study end (the global max period) dies
    at age last−first+1; users active in the final period are
    right-CENSORED at age T−first — they leave the risk set without
    a death.

    Returns one row per death age: (age, n_risk, n_deaths,
    survival_ppm) ascending, where survival_ppm is the KM product
    Π (n_risk−d)/n_risk in integer ppm with TRUNCATION AT EVERY STEP —
    the recurrence S_i = (S_{i−1}·(n_i−d_i)) div n_i is evaluated by
    the identical struct-array index fold in both engines
    (aggregate() over sequence() in Spark, list_reduce() over range()
    in DuckDB — both sort the (age, n, s) struct array by its first
    field), so there is no float anywhere and no libm to disagree.
    All-censored data (single observed period) yields zero rows in
    both engines.

    Scale shape: one user-keyed (first, last) aggregate, a 1-row
    bounds frame for T, an ages-sized aggregate + ordered window
    (ages are wall-clock-bounded — the time axis does not grow with
    data volume), and the per-row prefix fold over the broadcast
    death-age array (O(k²) on k = death ages, bounded by the axis).
    Risk sets are plain BIGINTs in the struct lanes (review, r14: the
    first cut packed (age, n, s) into one int64, capping n_risk at
    2^21 ≈ 2M users — far under real fleets); the only bound left is
    ppm·n_risk < 2^63, guarded loudly at n_risk ≥ 2^43."""
    if period_sec <= 0:
        raise ValueError(f"period_sec must be positive, got {period_sec}")
    from pyspark.sql import Window

    per_user = (
        events.filter(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("_u"),
            F.expr(
                f"CAST(CAST({ts_col} AS TIMESTAMP) AS LONG) div {int(period_sec)}"
            ).alias("_p"),
        )
        .groupBy("_u")
        .agg(F.min("_p").alias("_f"), F.max("_p").alias("_l"))
    )
    bounds = per_user.agg(F.max("_l").alias("_t"))
    lifes = per_user.crossJoin(F.broadcast(bounds)).select(
        (F.col("_l") < F.col("_t")).alias("_dead"),
        F.when(
            F.col("_l") < F.col("_t"), F.col("_l") - F.col("_f") + 1
        ).otherwise(F.col("_t") - F.col("_f")).alias("_risk_age"),
    )
    # risk ages and deaths per age (ages-sized frames)
    deaths = (
        lifes.filter("_dead")
        .groupBy(F.col("_risk_age").alias("age"))
        .agg(F.count(F.lit(1)).alias("n_deaths"))
    )
    risk_counts = lifes.groupBy(F.col("_risk_age").alias("age")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_rev = (
        Window.orderBy(F.col("age").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = risk_counts.withColumn("n_risk", F.sum("_c").over(w_rev)).select(
        "age", "n_risk"
    )
    rows = deaths.join(at_risk, "age").select("age", "n_risk", "n_deaths")
    guarded_n = (
        f"IF(n_risk < {1 << 43}, n_risk, "
        "raise_error('kaplan_meier_retention: risk set >= 2^43 — "
        "ppm * n_risk would overflow the fold'))"
    )
    structs = rows.select(
        F.expr(
            f"named_struct('age', age, 'n', CAST({guarded_n} AS BIGINT), "
            "'s', CAST(n_risk - n_deaths AS BIGINT))"
        ).alias("_e")
    )
    arr = structs.agg(F.sort_array(F.collect_list("_e")).alias("_arr"))
    w_asc = Window.orderBy("age")
    return (
        rows.withColumn("_idx", F.row_number().over(w_asc))
        .crossJoin(F.broadcast(arr))
        .select(
            "age",
            "n_risk",
            "n_deaths",
            F.expr(
                "aggregate(sequence(1L, CAST(_idx AS LONG)), "
                "CAST(1000000 AS BIGINT), "
                "(acc, i) -> (acc * element_at(_arr, CAST(i AS INT)).s) "
                "div element_at(_arr, CAST(i AS INT)).n)"
            ).alias("survival_ppm"),
        )
        .orderBy("age")
    )


def kaplan_meier_oracle_sql(
    period_sec: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    table: str = "events",
) -> str:
    """DuckDB replica: identical per-user lifetimes, censoring rule,
    reverse-cumulative risk sets, and the SAME struct-array index
    fold (list_reduce over range() with a prepended ppm seed)."""
    return f"""
WITH per_user AS (
  SELECT {user_col} AS u,
         MIN(CAST(FLOOR(epoch({ts_col})) AS BIGINT) // {int(period_sec)}) AS f,
         MAX(CAST(FLOOR(epoch({ts_col})) AS BIGINT) // {int(period_sec)}) AS l
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY 1
), bounds AS (
  SELECT MAX(l) AS t FROM per_user
), lifes AS (
  SELECT l < t AS dead,
         CASE WHEN l < t THEN l - f + 1 ELSE t - f END AS risk_age
  FROM per_user, bounds
), deaths AS (
  SELECT risk_age AS age, CAST(COUNT(*) AS BIGINT) AS n_deaths
  FROM lifes WHERE dead GROUP BY 1
), at_risk AS (
  SELECT age, CAST(SUM(c) OVER (ORDER BY age DESC
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
  FROM (SELECT risk_age AS age, COUNT(*) AS c FROM lifes GROUP BY 1)
), rows_ AS (
  SELECT d.age, r.n_risk, d.n_deaths,
         ROW_NUMBER() OVER (ORDER BY d.age) AS idx
  FROM deaths d JOIN at_risk r USING (age)
), arr AS (
  SELECT list_sort(list(
           {{'age': age,
             'n': CASE WHEN n_risk < {1 << 43} THEN n_risk
                  ELSE CAST(error('kaplan_meier oracle: risk set >= 2^43')
                       AS BIGINT) END,
             's': n_risk - n_deaths}}
         )) AS a
  FROM rows_
)
SELECT age, n_risk, n_deaths,
       list_reduce(
         list_prepend(CAST(1000000 AS BIGINT), range(1, idx + 1)),
         (acc, i) -> (acc * a[i].s) // a[i].n
       ) AS survival_ppm
FROM rows_, arr
ORDER BY age
"""


def interval_union_seconds(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_sec",
    end_col: str = "end_sec",
) -> DataFrame:
    """Exact per-key interval-UNION length (r14 — interval algebra,
    the machinery behind "time actually spent": overlapping sessions,
    incident windows, ad exposures must not double-count). For each
    key, the total length of the union of its [start, end) intervals,
    plus how many merged spans the union collapses to.

    The classic sweep without a sweep: order each key's POSITIVE
    intervals by (start, end) and let runmax = the running MAX of
    previous ends; an interval contributes
    max(0, end − max(start, runmax)) seconds and opens a new span iff
    start > runmax (NULL runmax = first interval opens the first
    span). One key-partitioned window + one key aggregate — both
    shuffles on the key, state bounded per key partition, all integer
    seconds.

    Zero/negative-length intervals (end ≤ start) count in
    n_intervals but are EXCLUDED from the sweep entirely — they add
    no coverage, and letting them into the running max would let a
    degenerate [8,8) "bridge" a real gap or suppress a span-open flag
    (found in review, r14: coverage stayed exact but n_spans
    undercounted). A key with only degenerate intervals reports
    (n, 0, 0). NULL key/start/end rows drop. Returns (key,
    n_intervals, n_spans, covered_sec) ordered by key."""
    from pyspark.sql import Window

    for c in (key_col, start_col, end_col):
        if c not in intervals.columns:
            raise ValueError(f"column {c!r} not in frame")
    base = intervals.filter(
        F.col(key_col).isNotNull()
        & F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
    )
    counts = base.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_intervals")
    )
    pos = base.filter(F.col("_e") > F.col("_s"))
    w = (
        Window.partitionBy("key")
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = pos.withColumn("_rm", F.max("_e").over(w)).select(
        "key",
        (
            F.col("_e") - F.greatest("_s", F.coalesce("_rm", F.col("_s")))
        ).alias("_raw"),
        (F.col("_rm").isNull() | (F.col("_s") > F.col("_rm")))
        .cast("long")
        .alias("_open"),
    ).select(
        "key",
        F.greatest(F.lit(0), F.col("_raw")).alias("_add"),
        "_open",
    )
    swept = marked.groupBy("key").agg(
        F.sum("_open").alias("n_spans"),
        F.sum("_add").alias("covered_sec"),
    )
    return (
        counts.join(swept, "key", "left")
        .select(
            "key",
            "n_intervals",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("covered_sec", F.lit(0)).alias("covered_sec"),
        )
        .orderBy("key")
    )


def interval_union_oracle_sql(
    intervals_sql: str,
) -> str:
    """DuckDB replica of the running-max sweep; ``intervals_sql``
    produces (key, start_sec, end_sec)."""
    return f"""
WITH base AS (
  SELECT key, CAST(start_sec AS BIGINT) AS s, CAST(end_sec AS BIGINT) AS e
  FROM ({intervals_sql})
  WHERE key IS NOT NULL AND start_sec IS NOT NULL AND end_sec IS NOT NULL
), counts AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_intervals
  FROM base GROUP BY key
), marked AS (
  SELECT key,
         GREATEST(0, e - GREATEST(s, COALESCE(rm, s))) AS add_,
         CAST((rm IS NULL OR s > rm) AS BIGINT) AS open_
  FROM (
    SELECT key, s, e,
           MAX(e) OVER (PARTITION BY key ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
    FROM base WHERE e > s
  )
), swept AS (
  SELECT key, CAST(SUM(open_) AS BIGINT) AS n_spans,
         CAST(SUM(add_) AS BIGINT) AS covered_sec
  FROM marked GROUP BY key
)
SELECT c.key, c.n_intervals,
       COALESCE(s.n_spans, 0) AS n_spans,
       COALESCE(s.covered_sec, 0) AS covered_sec
FROM counts c LEFT JOIN swept s ON c.key = s.key
ORDER BY c.key
"""


def holt_forecast(
    events: DataFrame,
    period_sec: int = 21600,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Holt linear-trend smoothing over per-(key, period) counts (r14
    — the forecasting step :func:`ewma_anomaly` stops short of: EWMA
    tracks LEVEL only, so a steady ramp is forever "anomalous"; Holt
    carries an explicit trend term and the one-step-ahead forecast
    level+trend). Fixed α=β=1/2 keeps every update a halving:

        l_t = (1000·x_t + l_{t−1} + t_{t−1}) div 2
        t_t = ((l_t − l_{t−1}) + t_{t−1}) div 2,  l_1 = 1000·x_1, t_1 = 0

    in integer MILLI with truncation at every step — both engines
    evaluate the IDENTICAL packed-integer fold (aggregate() /
    list_reduce(); trends go negative, and Spark ``div`` and DuckDB
    ``//`` both truncate toward zero, so even that agrees). Gaps are
    zero-filled on the dense per-key grid first (a silent period IS
    zero traffic and must pull the trend down).

    Returns (key, period_epoch, n_events, level_milli, trend_milli,
    forecast_next_milli) ordered — forecast_next is the t+1
    prediction made AT t. Counts above 2^30/1000 per period raise
    (packed-lane guard) rather than corrupt.

    Scale shape: the counts aggregate is the only data-sized shuffle;
    the per-key series array is wall-clock-bounded, broadcast back,
    and each row folds its own prefix (O(k²) on k = periods — the
    Kaplan-Meier precedent)."""
    if period_sec <= 0:
        raise ValueError(f"period_sec must be positive, got {period_sec}")
    from pyspark.sql import Window

    OFF = 1 << 30
    LANE = 1 << 31
    per = key_period_counts(events, period_sec, key_col, ts_col)
    grid = (
        per.groupBy("key")
        .agg(F.min("period").alias("_lo"), F.max("period").alias("_hi"))
        .select(
            "key",
            F.col("_lo"),
            F.explode(F.expr("sequence(_lo, _hi)")).alias("_p"),
        )
    )
    filled = grid.join(
        per.withColumnRenamed("period", "_p"), ["key", "_p"], "left"
    ).select(
        "key",
        "_lo",
        "_p",
        F.coalesce("n", F.lit(0)).alias("_x"),
    )
    # packed per-key series: (relative period) in the high lane so
    # sort_array orders by time, the count in the low lane
    packed = filled.select(
        "key",
        "_p",
        "_x",
        F.expr(
            f"IF(_x >= 0 AND _x * 1000 < {OFF} AND _p - _lo < {LANE}, "
            f"(_p - _lo) * {LANE} + _x, "
            "raise_error('holt_forecast: more than 2^30/1000 events in "
            "one period — the packed fold lane would overflow'))"
        ).alias("_e"),
    )
    arr = packed.groupBy("key").agg(
        F.sort_array(F.collect_list("_e")).alias("_arr")
    )
    w = Window.partitionBy("key").orderBy("_p")
    # the fold: acc = (l + OFF)*LANE + (t + OFF); element count = e % LANE
    L = f"(acc div {LANE} - {OFF})"
    T = f"(acc % {LANE} - {OFF})"
    NL = f"(((e % {LANE}) * 1000 + {L} + {T}) div 2)"
    step = (
        f"(acc, e) -> (({NL} + {OFF}) * {LANE} + "
        f"((({NL} - {L}) + {T}) div 2 + {OFF}))"
    )
    init = (
        f"((element_at(_arr, 1) % {LANE}) * 1000 + {OFF}) * {LANE} + {OFF}"
    )
    return (
        packed.withColumn("_idx", F.row_number().over(w))
        .join(arr, "key")
        .select(
            "key",
            (F.col("_p") * period_sec).alias("period_epoch"),
            F.col("_x").alias("n_events"),
            F.expr(
                f"aggregate(slice(_arr, 2, _idx - 1), "
                f"CAST(({init}) AS BIGINT), {step})"
            ).alias("_acc"),
        )
        .select(
            "key",
            "period_epoch",
            "n_events",
            F.expr(f"_acc div {LANE} - {OFF}").alias("level_milli"),
            F.expr(f"_acc % {LANE} - {OFF}").alias("trend_milli"),
            F.expr(
                f"(_acc div {LANE} - {OFF}) + (_acc % {LANE} - {OFF})"
            ).alias("forecast_next_milli"),
        )
        .orderBy("key", "period_epoch")
    )


def holt_forecast_oracle_sql(
    period_sec: int = 21600,
    key_col: str = "event_type",
    ts_col: str = "ts",
    table: str = "events",
) -> str:
    """DuckDB replica: identical zero-filled grid, identical packed
    lanes, identical truncating fold via list_reduce."""
    OFF = 1 << 30
    LANE = 1 << 31
    L = f"(acc // {LANE} - {OFF})"
    T = f"(acc % {LANE} - {OFF})"
    NL = f"(((e % {LANE}) * 1000 + {L} + {T}) // 2)"
    step = (
        f"(acc, e) -> (({NL} + {OFF}) * {LANE} + "
        f"((({NL} - {L}) + {T}) // 2 + {OFF}))"
    )
    return f"""
WITH per AS (
  SELECT {key_col} AS key,
         CAST(FLOOR(epoch({ts_col})) AS BIGINT) // {int(period_sec)} AS p,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY 1, 2
), spans AS (
  SELECT key, MIN(p) AS lo, MAX(p) AS hi FROM per GROUP BY key
), grid AS (
  SELECT key, lo, UNNEST(generate_series(lo, hi)) AS p FROM spans
), filled AS (
  SELECT grid.key, grid.lo, grid.p, COALESCE(per.x, 0) AS x
  FROM grid LEFT JOIN per ON grid.key = per.key AND grid.p = per.p
), packed AS (
  SELECT key, p, x,
         CASE WHEN x >= 0 AND x * 1000 < {OFF} AND p - lo < {LANE}
              THEN (p - lo) * {LANE} + x
              ELSE CAST(error('holt oracle: lane overflow') AS BIGINT)
         END AS e,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY p) AS idx
  FROM filled
), arrs AS (
  SELECT key, list_sort(list(e)) AS arr FROM packed GROUP BY key
), folded AS (
  SELECT p.key, p.p, p.x,
         list_reduce(
           list_prepend(
             CAST(((arr[1] % {LANE}) * 1000 + {OFF}) * {LANE} + {OFF}
                  AS BIGINT),
             arr[2:p.idx]),
           {step}) AS acc
  FROM packed p JOIN arrs a USING (key)
)
SELECT key, p * {int(period_sec)} AS period_epoch, x AS n_events,
       acc // {LANE} - {OFF} AS level_milli,
       acc % {LANE} - {OFF} AS trend_milli,
       (acc // {LANE} - {OFF}) + (acc % {LANE} - {OFF})
         AS forecast_next_milli
FROM folded
ORDER BY key, period_epoch
"""
