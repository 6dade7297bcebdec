"""Structural plan-regression net for the 17 headline bench queries
(r8). PLANS.md RECORDS every gate's physical shape; this suite ASSERTS
the load-bearing invariants for the queries the judge times, so a perf
regression that changes plan structure (a dropped broadcast hint, a
sort sneaking under a limit, a new cartesian) fails fast in CI instead
of surfacing as a mysteriously slower BENCH_r{N}.

Invariants asserted per query (from the SCALE.md design intent):

- NO CartesianProduct anywhere, ever;
- BroadcastNestedLoopJoin only where a 1-row broadcast is the designed
  shape (q_sim_cosine_topk's single query vector);
- dimension joins stay broadcast (q5's chain, the explicit-hint joins);
- top-k compiles to TakeOrderedAndProject (per-partition heaps), never
  a global Sort + Limit;
- single-aggregate queries keep exactly one shuffle;
- every parquet scan in filtering queries reports PushedFilters.
"""

from __future__ import annotations

import pytest

from bench import HEADLINE
from pg_parquet_spark.operators.registry import all_queries

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    # include_retired: the frozen headline set outlives gate
    # retirement (bench.py resolves the same way — r12: q_topk,
    # q_union_all left the driver window, not the bench)
    qs = all_queries(include_retired=True)
    return {name: _plan(qs[name](spark, SF)) for name in HEADLINE}


def test_no_cartesian_products(plans):
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name


def test_bnlj_only_for_designed_one_row_broadcasts(plans):
    allowed = {"q_sim_cosine_topk"}  # single query vector broadcast
    for name, plan in plans.items():
        if name in allowed:
            continue
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_dimension_joins_stay_broadcast(plans):
    # q5's join chain and the explicit broadcast-hint queries must not
    # decay to shuffled sort-merge joins on the dimension edges
    for name in ("q5_local_supplier_volume", "q_join_inner_broadcast", "q_join_left"):
        assert "BroadcastHashJoin" in plans[name], name
        assert "SortMergeJoin" not in plans[name], name


def test_topk_uses_partition_heaps_not_global_sort(plans):
    assert "TakeOrderedAndProject" in plans["q_topk"]


def test_single_aggregate_queries_shuffle_once(plans):
    # q1 (r14 scaled-long rewrite): per-row work is LONG sums keyed by
    # (flag, status, scan partition); the exact DECIMAL re-sum of the
    # ≤ groups×tasks partials adds a second — group-cardinality-sized —
    # exchange. Exactly two exchanges: one more means the partial
    # (map-side) long aggregation was lost, one fewer means the
    # overflow-safe decimal re-sum tier was dropped.
    assert plans["q1_pricing_summary"].count("Exchange") == 2, plans[
        "q1_pricing_summary"
    ]
    # the per-row tier must stay integer and per-task (the whole point
    # of the rewrite): the partial keys carry the scan partition id
    assert "SPARK_PARTITION_ID" in plans["q1_pricing_summary"].upper()


def test_filter_queries_push_predicates_to_scan(plans):
    # q1 filters on shipdate; the scan itself must carry the predicate
    plan = plans["q1_pricing_summary"]
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan, plan


def test_minhash_band_join_is_hash_not_nested(plans):
    plan = plans["q_dedup_minhash_lsh"]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the band-bucket self-join rides an equi join (broadcast or
    # shuffled hash at this scale — either is fine; nested-loop is not)
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_r9_operator_plan_invariants(spark):
    """Plan-shape net for the r9 operator family (the r10 gate stock):
    no CartesianProduct anywhere; the bounded sides (DSIR bucket
    distributions, BM25 document frequencies, SemDeDup drop set,
    refresh touched-set) stay broadcast; BM25/DSIR selections compile
    to TakeOrderedAndProject, never global Sort+Limit."""
    from pg_parquet_spark.operators import sampling, similarity, text, timeseries
    from pg_parquet_spark.operators.ivf_fixture import CENTROIDS
    from pg_parquet_spark.session import table

    docs = table(spark, SF, "documents")
    events = table(spark, SF, "events")
    emb = table(spark, SF, "embeddings")
    target = docs.filter("source = 'src13'")

    plans = {
        "semantic_dedup": _plan(similarity.semantic_dedup(emb, CENTROIDS)),
        "dsir_select": _plan(sampling.dsir_select(docs, target, frac=0.2)),
        "bm25": _plan(text.bm25_scores(docs, ["spark", "scan"])),
        "rollup": _plan(timeseries.rollup_time_buckets(events)),
    }
    for name, p in plans.items():
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
    # bounded model/frequency sides broadcast
    for name in ("dsir_select", "bm25"):
        assert "BroadcastHashJoin" in plans[name], name
    # top-k selection is a heap merge, not a global sort
    assert "TakeOrderedAndProject" in plans["dsir_select"]
    # the rollup is one partial+final aggregate — a single DATA shuffle
    # (the second exchange is the presentation orderBy's range partition)
    assert plans["rollup"].count("Exchange hashpartitioning") == 1, plans["rollup"]


def test_new_family_plan_invariants(spark):
    """Plan-shape net for the late-r9 operator family (sketches,
    linkage, basket, pareto, pagerank, tokenizer-prep): never a
    cartesian; the designed broadcasts stay broadcast; top-k cuts
    compile to TakeOrderedAndProject; the one-aggregation sketches
    keep a single data shuffle."""
    from pg_parquet_spark.operators import basket, graph, linkage, pareto, sketch
    from pg_parquet_spark.operators import text as text_ops
    from pg_parquet_spark.session import table

    docs = table(spark, SF, "documents")
    events = table(spark, SF, "events")
    parts = table(spark, SF, "part")
    orders = table(spark, SF, "orders")
    lineitem = table(spark, SF, "lineitem")

    mentions = linkage.mention_table(parts, "p_partkey", "p_name")
    plans = {
        "kmv": _plan(sketch.kmv_distinct(events, "event_type", "user_id", k=8)),
        "cms": _plan(sketch.cms_heavy_hitters(events, "user_id", top_k=10)),
        "fuzzy_pairs": _plan(linkage.fuzzy_name_pairs(mentions)),
        "basket": _plan(basket.association_rules(lineitem, top_k=20)),
        "pareto": _plan(
            pareto.pareto_frontier(parts, "p_partkey", "p_retailprice", "p_size")
        ),
        "pagerank": _plan(
            graph.page_rank(graph.bipartite_order_edges(orders, lineitem))
        ),
        "vocab": _plan(text_ops.vocab_top_terms(docs, top_k=40)),
        "bpe": _plan(text_ops.bpe_pair_counts(docs, top_k=40)),
    }
    for name, p in plans.items():
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
    # item frequencies joined broadcast onto the pair counts
    assert "BroadcastHashJoin" in plans["basket"]
    # top-k cuts are per-partition heaps, not global sorts
    for name in ("cms", "basket", "vocab", "bpe", "pagerank"):
        assert "TakeOrderedAndProject" in plans[name], name
    # sketch builds: one map-side-combinable count = one data shuffle
    # (cms estimate side adds the probe join; count builds alone below)
    build = _plan(sketch.cms_sketch(events, "user_id"))
    assert build.count("Exchange hashpartitioning") == 1, build
    assert "partial_count" in build or "partial" in build.lower(), build


def test_third_batch_plan_invariants(spark, tmp_path):
    """Plan-shape net for the late-r9 third batch (exact set-similarity
    join, PSI drift, SCD-2 point-in-time reads): never a cartesian or
    nested-loop join; setsim's rank/df joins all stay broadcast (the
    vocabulary sides are bounded); the PSI bucket join is broadcast
    (bucket tables are O(buckets)); the SCD-2 as-of read pushes its
    interval predicate into the parquet scan."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import drift, setsim
    from pg_parquet_spark.session import table
    from pg_parquet_spark.sources import scd

    docs = table(spark, SF, "documents")
    plans = {
        "setsim": _plan(setsim.jaccard_join(docs)),
        "psi": _plan(
            drift.psi_table(docs, docs.filter("doc_id % 2 = 0"), F.col("source"))
        ),
    }
    for name, p in plans.items():
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
        # every join in both ops is against a bounded side — all broadcast,
        # never a sort-merge (the corpus-sized side shuffles only for aggs)
        assert "SortMergeJoin" not in p, name
        assert "BroadcastHashJoin" in p, name

    cust = table(spark, SF, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    root = str(tmp_path / "scd_plan")
    scd.merge_scd2(spark, root, cust.withColumn("eff", F.lit(1)), ["c_custkey"], "eff")
    asof = _plan(scd.read_scd2_asof(spark, root, 1))
    import re

    assert re.search(r"PushedFilters: \[[^\]]", asof), asof


def test_session_fourth_batch_plan_invariants(spark):
    """Plan net for the quantile-sketch / robust-outlier / recipe /
    triangle family: no cartesian; the bounded sides (group stats,
    prefix offsets) stay broadcast; the HDR build is ONE
    map-side-combinable data shuffle; prefix-sum ops range-partition
    (never a global single-task window); the triangle pipeline keeps
    the materialize-once shape (single-digit exchanges, not the
    3x-recompute blowup)."""
    from pg_parquet_spark.operators import drift, graph, sampling, sketch
    from pg_parquet_spark.operators import text as text_ops
    from pg_parquet_spark.session import table

    ev = table(spark, SF, "events")
    li = table(spark, SF, "lineitem")
    docs = table(spark, SF, "documents")
    feats = docs.selectExpr(
        "doc_id", "text", "cast(n_chars as double) as quality"
    )
    plans = {
        "hdr": _plan(sketch.hdr_quantile_table(ev, "event_type", "value")),
        "mad": _plan(drift.robust_outlier_stats(ev)),
        "stream": _plan(text_ops.token_stream_layout(docs)),
        "mix": _plan(
            sampling.rebalance_to_mix(
                docs,
                "source",
                "doc_id",
                {"src1": 500_000, "src3": 300_000, "src7": 200_000},
            )
        ),
        "budget": _plan(
            sampling.select_token_budget(
                feats, score_col="quality", budget_tokens=20_000
            )
        ),
        "tri": _plan(graph.triangle_count(graph.copurchase_edges(li))),
    }
    for name, p in plans.items():
        assert "CartesianProduct" not in p, name
        if name != "tri":  # tri's 1-row count crossJoins are designed BNLJ
            assert "BroadcastNestedLoopJoin" not in p, name
    # group-stats / offsets sides stay broadcast
    for name in ("mad", "stream", "budget"):
        assert "BroadcastHashJoin" in plans[name], name
    # prefix-sum ops range-partition instead of a global window
    for name in ("stream", "budget"):
        assert "Exchange rangepartitioning" in plans[name], name
    # HDR sketch build: one data shuffle, map-side combine
    build = _plan(sketch.hdr_sketch(ev, "event_type", "value"))
    assert build.count("Exchange hashpartitioning") == 1, build
    assert "partial_count" in build, build
    # triangle: materialized-once edges — no recompute blowup
    assert plans["tri"].count("Exchange hashpartitioning") <= 8, plans["tri"]


def test_r10_family_plan_invariants(spark):
    """Plan net for the r10 family: no cartesian anywhere; the
    classifier apply is JOIN-FREE (weights are plan literals — model
    serving without a shuffle); bigram-LM scoring keeps its corpus-
    sized gram tables in hash joins (NOT broadcast — they grow with
    the corpus); PMI's top-k is a heap, not a global sort; the
    leakage split reads the corpus for fingerprints and split in one
    shuffle-bounded shape; interpolate_gaps shuffles events once into
    the daily aggregate."""
    from pg_parquet_spark.operators import sampling, timeseries
    from pg_parquet_spark.operators import text as text_ops
    from pg_parquet_spark.session import table

    docs = table(spark, SF, "documents")
    ev = table(spark, SF, "events")
    model = {"w_micro": {3: 250_000, 77: -90_000}, "bias_micro": 1000,
             "n_buckets": 256}
    plans = {
        "bigram": _plan(text_ops.bigram_logprob(docs)),
        "pmi": _plan(text_ops.pmi_collocations(docs)),
        "clf": _plan(sampling.apply_quality_classifier(docs, model)),
        "split": _plan(sampling.leakage_safe_split(docs)),
        "interp": _plan(timeseries.interpolate_gaps(ev)),
    }
    for name, p in plans.items():
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
    # frozen-model apply: literal map lookup, zero joins of any kind
    assert "Join" not in plans["clf"], plans["clf"][:2000]
    # bigram joins are plain EQUI joins on the gram key (broadcast at
    # this SF because the tables are tiny — a size decision Catalyst
    # flips to hash joins at scale; the invariant is that no non-equi
    # join shape can ever appear)
    assert "CartesianProduct" not in plans["bigram"]
    # PMI top-k via partition heaps
    assert "TakeOrderedAndProject" in plans["pmi"]
    # the raw text is read once per source branch, never re-shuffled:
    # every exchange in the split plan carries only narrow derived cols
    assert plans["split"].count("Exchange") <= 4, plans["split"][:2000]


def test_r13_continuation_batch_plan_invariants(spark):
    """Plan-shape net for the late-r13 continuation batch: no
    cartesian joins anywhere; the line-dedup verdict join is hash-
    keyed (never a nested loop); batch-Hamming's only nested-loop is
    the documented broadcast query frame; rank_normalize's data
    windows all lead with distrank's _pid (never a global or
    per-source data-sized window); oov_rate's scoring pass is a pure
    projection (no join at all)."""
    import re

    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import dedup, sampling, similarity, text
    from pg_parquet_spark.session import table

    docs = table(spark, SF, "documents")
    emb = table(spark, SF, "embeddings")
    q = emb.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    p_lines = _plan(dedup.strip_boilerplate_lines(docs, delim=" line "))
    assert "CartesianProduct" not in p_lines
    assert "BroadcastNestedLoopJoin" not in p_lines

    p_ham = _plan(similarity.hamming_topk_batch(emb, q, k=10))
    assert "CartesianProduct" not in p_ham
    # the ONE nested-loop is the bounded broadcast query frame (the
    # documented <=1024-row batch contract); no data-sized window
    assert p_ham.count("BroadcastNestedLoopJoin") == 1
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", p_ham):
        raise AssertionError(f"unexpected window in batch hamming: {spec}")

    p_rank = _plan(
        sampling.rank_normalize_scores(
            docs.withColumn("score", F.col("n_chars"))
        )
    )
    assert "CartesianProduct" not in p_rank
    data_windows = [
        s
        for s in re.findall(r"windowspecdefinition\([^)]*\)", p_rank)
        if "_pid" not in s
    ]
    assert not data_windows, data_windows

    p_oov = _plan(text.oov_rate(docs, vocab_size=20))
    for bad in ("Join", "CartesianProduct", "Window"):
        assert bad not in p_oov, bad


def test_r14_product_analytics_batch_plan_invariants(spark):
    """Plan net for the r14 continuation batch (retention, attribution,
    RFM, changepoints, active users, WOE/IV, SQ8, funnel latency): no
    cartesian anywhere; the only nested-loop joins are the documented
    1-row bounds/quartile/query frames (broadcast crossJoins); the
    counts-sized sides (cohort sizes, deltas, quartiles) stay
    broadcast; the corpus-sized frames shuffle only for keyed
    aggregates/windows."""
    from pg_parquet_spark.operators import drift, similarity, timeseries
    from pg_parquet_spark.session import table

    ev = table(spark, SF, "events")
    emb = table(spark, SF, "embeddings")
    plans = {
        "retention": _plan(timeseries.retention_cohorts(ev)),
        "attribution": _plan(timeseries.attribution_report(ev)),
        "rfm": _plan(timeseries.rfm_segments(ev)),
        "changepoints": _plan(timeseries.mean_shift_changepoints(ev)),
        "active_users": _plan(timeseries.active_users(ev)),
        "woe_iv": _plan(
            drift.woe_iv(
                ev.selectExpr(
                    "value", "CAST(event_type = 'purchase' AS INT) AS label"
                )
            )
        ),
        "sq8": _plan(similarity.sq8_topk(emb, query_id=0, k=10)),
        "funnel_latency": _plan(
            timeseries.funnel_latency(ev, ["view", "click", "purchase"])
        ),
    }
    plans.update(
        {
            "ab_test": _plan(drift.ab_test_report(ev)),
            "srm": _plan(drift.srm_check(ev)),
            "trend": _plan(timeseries.trend_slopes(ev)),
            "entry_paths": _plan(timeseries.entry_paths(ev)),
            "gini": _plan(timeseries.engagement_gini(ev)),
        }
    )
    timeseries.release_cached()
    # ops whose crossJoins are 1-row bounds/quartile/query frames — the
    # house-benign BroadcastNestedLoopJoin shape
    one_row_cross = {"rfm", "woe_iv", "sq8", "active_users"}
    for name, p in plans.items():
        assert "CartesianProduct" not in p, name
        if name not in one_row_cross:
            assert "BroadcastNestedLoopJoin" not in p, (name, p)
    # retention's cohort-size join and attribution's nothing-to-join
    # report sides stay broadcast, never sort-merge on the tiny side
    assert "BroadcastHashJoin" in plans["retention"]
    # changepoints/active_users join the zero-fill spine broadcast- or
    # shuffle-hash keyed — but never via nested loops (asserted above);
    # the SQ8 scan folds the score in codegen (no python udf)
    assert "pythonUDF" not in plans["sq8"].lower()
    # funnel_latency's chain joins are user-keyed equi-joins
    assert "BroadcastNestedLoopJoin" not in plans["funnel_latency"]


def test_r14_third_wave_batch_plan_invariants(spark):
    """Plan net for the r14 third-wave batch (spatial grid join, EWMA
    band, k-anonymity, k-core, quantile normalization, Kaplan-Meier):
    no cartesian anywhere; nested-loop joins only as the documented
    1-row bounds frames; the spatial join is a cell-keyed hash join;
    everything stays JVM-side (no python UDFs)."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import (
        drift,
        graph,
        sampling,
        spatial,
        text,
        timeseries,
    )
    from pg_parquet_spark.session import table

    ev = table(spark, SF, "events")
    docs = table(spark, SF, "documents")
    pts = spatial.hash_points(table(spark, SF, "customer"), "c_custkey")
    rcs = spatial.hash_rects(table(spark, SF, "supplier"), "s_suppkey")
    kanon = table(spark, SF, "orders").selectExpr(
        "o_orderpriority AS priority",
        "o_orderstatus AS status",
        "CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 2592000 AS period",
        "o_custkey",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src int, dst int"
    )
    plans = {
        "spatial": _plan(spatial.grid_containment_join(pts, rcs)),
        "spatial_nn": _plan(
            spatial.nearest_neighbor_join(pts, pts, d_max=16384)
        ),
        "ewma": _plan(timeseries.ewma_anomaly(ev, period_sec=21600)),
        "k_anonymity": _plan(
            drift.k_anonymity_report(
                kanon, ["priority", "status", "period"], "o_custkey",
                k=10, l_diversity=5,
            )
        ),
        "kcore": _plan(graph.kcore(edges, k=2, rounds=2)),
        "quantile_norm": _plan(
            sampling.quantile_normalize(docs, "n_chars", "source", "doc_id")
        ),
        "kaplan_meier": _plan(
            timeseries.kaplan_meier_retention(ev, period_sec=21600)
        ),
        "interval_union": _plan(
            timeseries.interval_union_seconds(
                ev.selectExpr(
                    "user_id AS key",
                    "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS start_sec",
                    "CAST(CAST(ts AS TIMESTAMP) AS LONG) + 900 AS end_sec",
                ),
                "key", "start_sec", "end_sec",
            )
        ),
        "holt": _plan(timeseries.holt_forecast(ev, period_sec=21600)),
        "ks": _plan(
            drift.ks_test(
                ev.filter("event_type = 'view'"),
                ev.filter("event_type = 'purchase'"),
            )
        ),
        "auc": _plan(drift.auc_report(docs, "n_chars", "lang = 'en'")),
        "readability": _plan(text.readability_scores(docs)),
        "mi": _plan(
            drift.mutual_information(
                ev, F.col("event_type"), F.dayofweek("ts")
            )
        ),
        "shard_manifest": _plan(sampling.shard_manifest(docs, n_shards=16)),
    }
    # 1-row bounds/array frames ride broadcast crossJoins by design
    one_row_cross = {"kaplan_meier", "quantile_norm", "ks", "auc",
                     "mi", "shard_manifest"}
    for name, p in plans.items():
        assert "CartesianProduct" not in p, name
        assert "pythonUDF" not in p.lower(), name
        if name not in one_row_cross:
            assert "BroadcastNestedLoopJoin" not in p, (name, p)
    # the spatial joins must be cell equi-joins, never pure
    # containment/distance nested loops
    assert "HashJoin" in plans["spatial"]
    assert "HashJoin" in plans["spatial_nn"]
    # ewma's grid join keeps the counts-sized spine out of sort-merge
    assert "CartesianProduct" not in plans["ewma"]
