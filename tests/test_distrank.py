"""The distributed-rank helpers (distrank.py) and the three operators
the r11 verdict flagged for single-task global windows (setsim vocab
rank, graph node rank, pareto level cummax).

Three proof tiers:

1. equality vs the single-window formulation (the helper IS a global
   row_number / running-max decomposition — bit-identical by design);
2. partition-placement invariance (1 / 4 / 32 input partitions — the
   range sampler moves boundaries, results must not move);
3. plan structure: every window over data-sized frames is partitioned
   by ``_pid`` (never a bare ``Window.orderBy`` single-task funnel),
   and the range exchange is present. The only permissible
   unpartitioned windows order by ``_pid`` itself — the bounded
   #partitions-row offsets frame.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pg_parquet_spark.operators.distrank import (
    distributed_row_number,
    distributed_running_max,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_no_single_task_window(plan: str) -> None:
    """Every windowspecdefinition must lead with a _pid partition key
    (data windows) or order by _pid alone (the bounded offsets fold)."""
    for spec in re.findall(r"windowspecdefinition\(\w+#\d+[, ]", plan):
        first_arg = spec[len("windowspecdefinition(") :]
        assert first_arg.startswith("_pid#"), (spec, plan[:2000])


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_row_number_matches_global_window(spark, docs):
    base = docs.selectExpr(
        "source AS s", "doc_id AS k", "n_chars AS v"
    ).limit(500)
    want = (
        base.withColumn(
            "rk", F.row_number().over(Window.orderBy("v", "k")).cast("long")
        )
        .select("k", "rk")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for n in (1, 4, 32):
        got = (
            distributed_row_number(base.repartition(n), ["v", "k"])
            .select("k", "rk")
            .toPandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got.equals(want), n


def test_running_max_matches_global_window(spark, docs):
    # distinct-keyed levels, like pareto's post-groupBy frame
    lvl = docs.groupBy(F.col("n_chars").alias("_cost")).agg(
        F.max("doc_id").alias("_mx")
    )
    w = Window.orderBy("_cost").rowsBetween(Window.unboundedPreceding, -1)
    want = (
        lvl.withColumn("_best_prev", F.max("_mx").over(w))
        .toPandas()
        .sort_values("_cost")
        .reset_index(drop=True)
    )
    for n in (1, 4, 32):
        got = (
            distributed_running_max(lvl.repartition(n), "_cost", "_mx")
            .toPandas()
            .sort_values("_cost")
            .reset_index(drop=True)
        )
        assert got[["_cost", "_mx", "_best_prev"]].equals(
            want[["_cost", "_mx", "_best_prev"]]
        ), n


def test_running_max_first_row_null_and_ties_absent(spark):
    rows = [(1, 10), (2, 5), (3, 20), (4, 1)]
    df = spark.createDataFrame(rows, ["_cost", "_mx"])
    got = {
        r["_cost"]: r["_best_prev"]
        for r in distributed_running_max(df.repartition(3), "_cost", "_mx")
        .collect()
    }
    assert got == {1: None, 2: 10, 3: 10, 4: 20}


def test_setsim_partition_invariance(spark, docs):
    from pg_parquet_spark.operators import setsim

    sample = docs.limit(200)
    base = setsim.jaccard_join(sample, threshold_ppm=300_000).toPandas()
    for n in (1, 32):
        alt = setsim.jaccard_join(
            sample.repartition(n), threshold_ppm=300_000
        ).toPandas()
        assert alt.equals(base), n


def test_flagged_operators_have_no_single_task_windows(spark, docs):
    """The r11 verdict's weak item: setsim vocab rank, pareto level
    cummax, and the triangle node rank must never compile to an
    unpartitioned data window."""
    from pg_parquet_spark.operators import graph, pareto, setsim

    part = spark.read.parquet(f"{SF}/part.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plans = {
        "jaccard": _plan(setsim.jaccard_join(docs)),
        "containment": _plan(setsim.containment_join(docs)),
        "pareto": _plan(
            pareto.pareto_frontier(
                part, "p_partkey", "p_retailprice", "p_size"
            )
        ),
    }
    # triangle_count localCheckpoints its oriented-edge frame, which
    # hides the rank subtree from the final plan — assert on the rank
    # frame the same code path builds
    und = graph.copurchase_edges(li).selectExpr(
        "least(u, v) AS a", "greatest(u, v) AS b"
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    plans["tri_rank"] = _plan(distributed_row_number(deg, ["deg", "n"], "r"))
    for name, p in plans.items():
        _assert_no_single_task_window(p)
        assert "Exchange rangepartitioning" in p, name
        assert "CartesianProduct" not in p, name


@pytest.mark.parametrize("parts", [1, 4, 32])
def test_distributed_running_sum_partition_invariant(spark, parts):
    """r14: the prefix-sum twin — bit-identical to the single-window
    cumulative sum at any input partitioning; NULL values count 0."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import distrank

    rows = [(i, (i * 37) % 11 if i % 7 else None) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(parts)
    got = (
        distrank.distributed_running_sum(df, ["k"], "v", "cum")
        .orderBy("k")
        .collect()
    )
    want = (
        df.withColumn(
            "cum",
            F.sum(F.coalesce("v", F.lit(0))).over(
                Window.orderBy("k").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .orderBy("k")
        .collect()
    )
    assert [(r.k, r.cum) for r in got] == [(r.k, r.cum) for r in want]


def test_distributed_running_sums_multi_equals_single_passes(spark):
    """Review (r14): N prefix sums ride ONE range exchange; the fused
    form is bit-identical to two single-column passes and the plan
    contains exactly one rangepartitioning exchange."""
    from pg_parquet_spark.operators import distrank

    rows = [(i, i % 5, (i * 3) % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    fused = distrank.distributed_running_sums(
        df, ["k"], {"ca": "a", "cb": "b"}
    ).orderBy("k")
    one = distrank.distributed_running_sum(df, ["k"], "a", "ca")
    two = distrank.distributed_running_sum(one, ["k"], "b", "cb").orderBy("k")
    assert [
        (r.k, r.ca, r.cb) for r in fused.collect()
    ] == [(r.k, r.ca, r.cb) for r in two.collect()]
    # one data range-exchange in the fused form vs two in the chained
    # form — compare the pre-sort frames (AQE's toString repeats
    # initial+final plans, so assert the RATIO, not a raw count)
    fused_plan = _plan(
        distrank.distributed_running_sums(df, ["k"], {"ca": "a", "cb": "b"})
    )
    two_plan = _plan(
        distrank.distributed_running_sum(
            distrank.distributed_running_sum(df, ["k"], "a", "ca"),
            ["k"], "b", "cb",
        )
    )
    assert (
        fused_plan.count("Exchange rangepartitioning")
        < two_plan.count("Exchange rangepartitioning")
    )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="sums"):
        distrank.distributed_running_sums(df, ["k"], {})


def test_new_prefix_sum_operators_have_no_single_task_windows(spark):
    """Review (r14): ks_test, auc_report, and quantile_normalize all
    advertise the no-single-task-window contract — pin it in their
    executed plans like the r11 flagged set."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import drift, sampling

    ev = spark.read.parquet(f"{SF}/events.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plans = {
        "ks": _plan(drift.ks_test(
            ev.filter("event_type = 'view'"),
            ev.filter("event_type = 'purchase'"),
        )),
        "auc": _plan(drift.auc_report(docs, "n_chars", "lang = 'en'")),
        "qnorm": _plan(
            sampling.quantile_normalize(docs, "n_chars", "source", "doc_id")
        ),
    }
    for name, p in plans.items():
        _assert_no_single_task_window(p)
        assert "Exchange rangepartitioning" in p, name
        assert "CartesianProduct" not in p, name
