"""Partition pruning + shuffle-free bucketed joins — plan-level
assertions (the 100 TB layout story, SCALE.md)."""

from pyspark.sql import functions as F

from pg_parquet_spark.session import table
from pg_parquet_spark.sources.layout import write_bucketed, write_partitioned

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning(spark, tmp_path):
    docs = table(spark, SF, "documents")
    out = str(tmp_path / "docs_partitioned")
    write_partitioned(docs, out, ["lang"])
    back = spark.read.parquet(out)
    pruned = back.filter(F.col("lang") == "en").select("doc_id")
    # partition filter prunes directories at planning time
    plan = pruned._jdf.queryExecution().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan or "lang#" in plan
    got = pruned.count()
    want = docs.filter(F.col("lang") == "en").count()
    assert got == want
    # physical layout: one directory per lang value
    import os

    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert len(langs) >= 2


def test_bucketed_join_is_shuffle_free(spark):
    li = table(spark, SF, "lineitem")
    orders = table(spark, SF, "orders")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], 8, sort_by=["l_orderkey"])
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bucketed",
        ["l_orderkey"],
        8,
        sort_by=["l_orderkey"],
    )
    a = spark.table("li_bucketed")
    b = spark.table("ord_bucketed")
    joined = a.join(b.hint("merge"), "l_orderkey").select("l_orderkey", "l_quantity", "o_totalprice")
    joined.write.format("noop").mode("overwrite").save()
    plan = _plan(joined)
    # co-located buckets: the join runs with ZERO shuffle exchanges
    assert "Exchange" not in plan, plan
    assert joined.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()


def test_bucketed_aggregation_no_exchange_before_agg(spark):
    li = table(spark, SF, "lineitem")
    write_bucketed(li, "li_bucketed_agg", ["l_orderkey"], 8)
    agg = (
        spark.table("li_bucketed_agg")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q"))
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
