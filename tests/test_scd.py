"""SCD-2 history-keeping merge: unrolled-CTE DuckDB oracle equality
over a three-batch evolution, point-in-time reads, replay idempotence,
and the loud contracts (out-of-order, duplicate keys, reserved cols)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pg_parquet_spark.session import table
from pg_parquet_spark.sources import layout, scd

SF = "/root/testdata/sf0.001"

KEY = ["c_custkey"]
ATTRS = ["c_acctbal", "c_mktsegment"]


def _batches_sql():
    b0 = "SELECT c_custkey, c_acctbal, c_mktsegment FROM customer"
    b1 = """
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 3 IN (0, 1)
      UNION ALL
      SELECT c_custkey + 100000, 1.0, 'NEW' FROM customer WHERE c_custkey < 3
    """
    b2 = """
      SELECT c_custkey, c_acctbal, 'MOVED' AS c_mktsegment
      FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 3 <> 0
    """
    return [(b0, "1"), (b1, "2"), (b2, "3")]


def _spark_batches(spark):
    cust = table(spark, SF, "customer").select("c_custkey", "c_acctbal", "c_mktsegment")
    b0 = cust.withColumn("eff", F.lit(1))
    b1 = (
        cust.filter("c_custkey % 3 IN (0, 1)")
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 100).otherwise(
                F.col("c_acctbal")
            ),
        )
        .unionByName(
            cust.filter("c_custkey < 3").select(
                (F.col("c_custkey") + 100000).alias("c_custkey"),
                F.lit(1.0).alias("c_acctbal"),
                F.lit("NEW").alias("c_mktsegment"),
            )
        )
        .withColumn("eff", F.lit(2))
    )
    b2 = (
        cust.filter("c_custkey % 5 = 0 AND c_custkey % 3 <> 0")
        .withColumn("c_mktsegment", F.lit("MOVED"))
        .withColumn("eff", F.lit(3))
    )
    return b0, b1, b2


def test_scd2_three_batch_evolution_matches_oracle(spark, tmp_path):
    root = str(tmp_path / "dim")
    b0, b1, b2 = _spark_batches(spark)
    for b in (b0, b1, b2):
        scd.merge_scd2(spark, root, b, KEY, "eff")
    got = (
        layout.read_versioned(spark, root)
        .orderBy("c_custkey", "_valid_from")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
    )
    want = con.execute(scd.scd2_oracle_sql(_batches_sql(), KEY, ATTRS)).df()
    assert len(got) == len(want) > 0
    for col in ("c_custkey", "c_acctbal", "c_mktsegment", "_valid_from"):
        assert list(got[col]) == list(want[col]), col
    assert [
        -1 if v != v else v for v in got["_valid_to"]
    ] == [-1 if v != v else v for v in want["_valid_to"]]  # NaN-safe

    # point-in-time: asof=1 sees the original values for every original key
    asof1 = scd.read_scd2_asof(spark, root, 1).toPandas()
    orig = table(spark, SF, "customer").count()
    assert len(asof1) == orig
    assert set(asof1["c_mktsegment"]) != {"MOVED"}
    # current view: changed keys show the new state
    cur = layout.read_versioned(spark, root).filter("_valid_to IS NULL").toPandas()
    moved = cur[cur.c_mktsegment == "MOVED"]
    assert len(moved) > 0


def test_scd2_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "dim")
    b0, b1, _ = _spark_batches(spark)
    scd.merge_scd2(spark, root, b0, KEY, "eff")
    scd.merge_scd2(spark, root, b1, KEY, "eff")
    before = (
        layout.read_versioned(spark, root)
        .orderBy("c_custkey", "_valid_from")
        .collect()
    )
    scd.merge_scd2(spark, root, b1, KEY, "eff")  # replay
    after = (
        layout.read_versioned(spark, root)
        .orderBy("c_custkey", "_valid_from")
        .collect()
    )
    assert [tuple(r) for r in before] == [tuple(r) for r in after]


def test_scd2_contracts_raise(spark, tmp_path):
    root = str(tmp_path / "dim")
    b0, b1, _ = _spark_batches(spark)
    scd.merge_scd2(spark, root, b0, KEY, "eff")
    scd.merge_scd2(spark, root, b1, KEY, "eff")
    # out-of-order: a CHANGING update with effective ≤ current valid_from
    stale = b1.withColumn("eff", F.lit(1)).withColumn(
        "c_acctbal", F.col("c_acctbal") + 5
    )
    with pytest.raises(ValueError, match="out-of-order"):
        scd.merge_scd2(spark, root, stale, KEY, "eff")
    dup = b0.unionByName(b0)
    with pytest.raises(ValueError, match="duplicate keys"):
        scd.merge_scd2(spark, root, dup, KEY, "eff")
    reserved = b0.withColumn("_valid_from", F.lit(9))
    with pytest.raises(ValueError, match="reserved column"):
        scd.merge_scd2(spark, root, reserved, KEY, "eff")


def test_scd2_timestamp_effective_col(spark, tmp_path):
    """ADVICE r9: ``_valid_to`` is typed to the effective column's OWN
    type, so the docstring-promised timestamp effective_col works — the
    open-interval NULLs union cleanly against closed rows carrying a
    timestamp ``_close_at`` (the hardcoded long NULL used to raise
    AnalysisException on the union), and as-of reads filter on real
    timestamps."""
    import datetime

    root = str(tmp_path / "dim_ts")
    cust = (
        table(spark, SF, "customer")
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .filter("c_custkey < 60")
    )
    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 2, 1)
    b0 = cust.withColumn("eff", F.lit(t0))
    b1 = (
        cust.filter("c_custkey % 2 = 0")
        .withColumn("c_acctbal", F.col("c_acctbal") + 7)
        .withColumn("eff", F.lit(t1))
    )
    scd.merge_scd2(spark, root, b0, KEY, "eff")
    scd.merge_scd2(spark, root, b1, KEY, "eff")

    out = layout.read_versioned(spark, root)
    assert dict(out.dtypes)["_valid_to"] == "timestamp"
    closed = out.filter("_valid_to IS NOT NULL").toPandas()
    assert len(closed) > 0
    assert set(closed["_valid_to"]) == {t1}
    # point-in-time: mid-January sees only the original state
    asof = scd.read_scd2_asof(spark, root, datetime.datetime(2024, 1, 15))
    assert asof.count() == cust.count()
    assert asof.filter("_valid_from > timestamp'2024-01-01'").count() == 0
    # the oracle mirrors the typed NULL
    sql = scd.scd2_oracle_sql(
        [("SELECT 1 AS k, 2 AS v", "TIMESTAMP '2024-01-01'")],
        ["k"],
        ["v"],
        effective_sql_type="TIMESTAMP",
    )
    assert "CAST(NULL AS TIMESTAMP)" in sql
