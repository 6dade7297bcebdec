"""Third certification tier (VERDICT r11 "What's missing" #1): the
NON-registry oracle-backed operator families as (spark, sf_dir) query
functions with their DuckDB oracles.

The driver registry is saturated at 150 gates (50-slot window ×
3-round freshness), so operator families beyond it used to carry their
DuckDB-oracle equality only inside pytest — provable, but absent from
every CORRECTNESS artifact. This module gives each such family the
same (query, oracle) contract the registry uses, and
``tools/extended_gate_sweep.py`` runs them all through the
driver-identical compare at both SFs each round, emitting
``CORRECTNESS_EXTENDED_r{N}.json``.

Names are ``x_``-prefixed so the tier can never be confused with the
driver surface (``q_``). Parameters mirror the pytest invocations
one-for-one — the sweep certifies exactly what the tests assert,
as a machine-readable artifact instead of prose.

Families PROMOTED to the driver registry keep their ``x_`` entry here
(r13: x_setsim_jaccard, x_vocab_zipf, x_kfold, x_curriculum_order,
x_curriculum_perplexity, x_strip_spans, x_strip_incremental,
x_soft_dedup gained q_* gates): the driver window covers a gate at
most once per 3-round cycle, while this tier re-certifies at BOTH SFs
every round — dropping the entry on promotion would weaken coverage,
not move it.

Streaming drains are NOT here: a drain's contract is crash/replay
convergence, proven by the per-drain crash drills in
tests/test_stream_*.py, not a one-shot SQL equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_parquet_spark.session import table

_MIX_TGT = {"src1": 500_000, "src3": 300_000, "src7": 200_000}


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


# --- sketches ---------------------------------------------------------------

def x_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import sketch

    return sketch.kmv_distinct(
        table(spark, sf_dir, "events"), "event_type", "user_id", k=8
    )


def x_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import sketch

    return sketch.cms_heavy_hitters(
        table(spark, sf_dir, "events"), "user_id", top_k=10
    )


def x_sketch_hdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import sketch

    return sketch.hdr_quantile_table(
        table(spark, sf_dir, "events"), "event_type", "value"
    )


def x_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import sketch

    return sketch.assign_quantile_bins(
        table(spark, sf_dir, "events"), "event_type", "value"
    )


def x_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import sketch

    ev = table(spark, sf_dir, "events")
    return sketch.kmv_overlap(
        ev.filter("value < 250"),
        ev.filter("value >= 100"),
        "event_type",
        "user_id",
        k=32,
    )


# --- exact set similarity ---------------------------------------------------

def x_setsim_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import setsim

    return setsim.jaccard_join(
        _docs(spark, sf_dir).select("doc_id", "text"), threshold_ppm=500_000
    )


# --- graph ------------------------------------------------------------------

def x_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import graph

    edges = graph.bipartite_order_edges(
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    )
    return graph.page_rank(edges, iterations=3, top_k=20)


def x_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import graph

    edges = graph.copurchase_edges(
        table(spark, sf_dir, "lineitem"), max_order_items=20
    )
    return graph.triangle_count(edges)


def x_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import graph

    part = table(spark, sf_dir, "part")
    edges = part.filter("p_partkey > 0").selectExpr(
        "p_partkey AS node", "p_partkey DIV 10 AS parent"
    )
    values = part.selectExpr("p_partkey AS node", "p_retailprice AS value")
    return graph.subtree_rollup(edges, values)


# --- linkage / basket / skyline ----------------------------------------------

def x_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import linkage

    return linkage.resolve_entities(
        table(spark, sf_dir, "part"), "p_partkey", "p_name", max_dist=2
    )


def x_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import basket

    return basket.association_rules(
        table(spark, sf_dir, "lineitem"), min_cooccur=2, top_k=20
    )


def x_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import pareto

    return pareto.pareto_frontier(
        table(spark, sf_dir, "part"), "p_partkey", "p_retailprice", "p_size"
    )


# --- drift ------------------------------------------------------------------

def x_psi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import drift

    docs = _docs(spark, sf_dir)
    return drift.psi_table(
        docs, docs.filter("n_chars % 3 != 0"), F.col("source")
    )


def x_text_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import drift

    docs = _docs(spark, sf_dir)
    return drift.text_psi(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
    )


def x_embedding_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import drift
    from pg_parquet_spark.operators.ivf_fixture import CENTROIDS

    emb = table(spark, sf_dir, "embeddings")
    return drift.embedding_psi(
        emb.filter("vec_id % 2 = 0"), emb.filter("vec_id % 2 = 1"), CENTROIDS
    )


def x_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import drift

    ev = table(spark, sf_dir, "events")
    return drift.chi2_stat(ev, F.col("event_type"), F.dayofweek("ts"))


def x_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import drift

    return drift.robust_outlier_stats(table(spark, sf_dir, "events"))


# --- time series -------------------------------------------------------------

def x_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import timeseries

    return timeseries.seasonal_outliers(table(spark, sf_dir, "events"))


def x_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import timeseries

    return timeseries.interpolate_gaps(
        table(spark, sf_dir, "events").filter("event_id % 37 = 0")
    )


# --- text -------------------------------------------------------------------

def x_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import text

    return text.pmi_collocations(_docs(spark, sf_dir), min_count=3, k=40)


def x_charclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import text

    return text.charclass_features(
        _docs(spark, sf_dir).select("doc_id", "text")
    )


def x_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import text

    docs = _docs(spark, sf_dir)
    return text.ngram_novelty(
        docs.filter("doc_id % 3 != 0"), docs.filter("doc_id % 3 = 0")
    )


def x_token_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import text

    return text.token_stream_layout(_docs(spark, sf_dir), context_len=512)


def x_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import text

    return text.vocab_top_terms(_docs(spark, sf_dir), top_k=40)


def x_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import text

    return text.bpe_pair_counts(_docs(spark, sf_dir), top_k=40)


def x_vocab_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import text

    return text.vocab_zipf(_docs(spark, sf_dir))


# --- dedup audit -------------------------------------------------------------

def x_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import dedup

    return dedup.duplicated_spans(_docs(spark, sf_dir), span_tokens=12)


def x_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import dedup

    return dedup.strip_duplicated_spans(_docs(spark, sf_dir), span_tokens=12)


def x_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import dedup

    return dedup.soft_dedup_weights(
        _docs(spark, sf_dir).select("doc_id", "text")
    )


def x_strip_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pg_parquet_spark.operators import dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    idx = os.path.join(tempfile.gettempdir(), "pgpq_span_x_index")
    shutil.rmtree(idx, ignore_errors=True)
    dedup.build_span_index(
        docs.filter("doc_id % 2 = 0"), idx, span_tokens=12
    )
    return dedup.strip_incremental(
        spark, docs.filter("doc_id % 2 = 1"), idx, span_tokens=12
    )


def x_line_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pg_parquet_spark.operators import dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    idx = os.path.join(tempfile.gettempdir(), "pgpq_line_x_index")
    shutil.rmtree(idx, ignore_errors=True)
    dedup.build_line_index(
        docs.filter("doc_id % 2 = 0"), idx, delim=" line "
    )
    return dedup.strip_boilerplate_incremental(
        spark, docs.filter("doc_id % 2 = 1"), idx, delim=" line "
    )


def x_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import dedup

    return dedup.source_overlap_matrix(
        _docs(spark, sf_dir).select("doc_id", "text", "source")
    )


# --- sampling / mixing -------------------------------------------------------

def x_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import sampling

    feats = _docs(spark, sf_dir).selectExpr(
        "doc_id", "text", "cast(n_chars as double) as quality"
    )
    return sampling.select_token_budget(
        feats, score_col="quality", budget_tokens=20_000
    )


def x_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import sampling

    return sampling.weighted_sample(
        _docs(spark, sf_dir), "doc_id", "n_chars", k=50
    )


def x_rebalance_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the semantic contract is the selected ID SET (the pytest
    # assertion); engine and oracle carry different audit columns, so
    # both sides project to the ids for the digest compare
    from pg_parquet_spark.operators import sampling

    return (
        sampling.rebalance_to_mix(
            _docs(spark, sf_dir), "source", "doc_id", _MIX_TGT
        )
        .select("doc_id")
        .orderBy("doc_id")
    )


def x_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import sampling

    return (
        sampling.kfold_by_group(
            _docs(spark, sf_dir).select("doc_id", "source"), "source", k=5
        )
        .select("doc_id", "fold")
        .orderBy("doc_id")
    )


def x_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import sampling

    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id", "n_chars div 500 AS diff_bin"
    )
    return sampling.curriculum_order(docs, "doc_id", "diff_bin")


# --- recipes ----------------------------------------------------------------

def x_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import recipe

    return recipe.corpus_datacard(_docs(spark, sf_dir))


def x_curriculum_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import recipe

    return recipe.curriculum_from_perplexity(_docs(spark, sf_dir))


# --- r13 families -------------------------------------------------------------

def x_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import recipe

    emb = table(spark, sf_dir, "embeddings")
    return recipe.hybrid_search(
        _docs(spark, sf_dir),
        emb,
        ["spark", "vector", "scan"],
        emb.filter(F.col("vec_id") == 0),
    )


def x_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    return similarity.matryoshka_topk(
        emb, emb.filter(F.col("vec_id") == 0), d_coarse=16, shortlist=50, k=10
    )


def x_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import sampling

    return sampling.temperature_mix(
        _docs(spark, sf_dir), "source", "doc_id", total=120
    )


def x_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import text

    return text.vocab_growth(_docs(spark, sf_dir))


def x_corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed chain: eight certified health components folded into
    one (metric, value) dashboard — ONE chained oracle."""
    from pg_parquet_spark.operators import recipe

    return recipe.corpus_health(_docs(spark, sf_dir), line_delim=" line ")


def x_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    return similarity.label_agreement(emb, emb.filter("vec_id < 4"))


def x_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import timeseries

    return timeseries.funnel_steps(
        table(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def x_chunk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed chain: chunk windows → packed chunk key → chunk-corpus
    BM25 → per-doc argmax — ONE chained oracle."""
    from pg_parquet_spark.operators import recipe

    return recipe.chunked_search(
        _docs(spark, sf_dir), ["spark", "vector", "scan"]
    )


def x_score_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import sampling

    docs = _docs(spark, sf_dir).withColumn("score", F.col("n_chars"))
    return sampling.rank_normalize_scores(docs)


def x_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import text

    return text.oov_rate(_docs(spark, sf_dir), vocab_size=20)


def x_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import text

    return text.encoding_quality(_docs(spark, sf_dir))


def x_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed chain: batch BQ retrieval scored by the IR-metrics
    tier — qrels are label-match pairs, ONE oracle certifies run +
    metrics together."""
    from pg_parquet_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    run = similarity.hamming_topk_batch(emb, q, k=10, exclude_self=True)
    qrels = (
        emb.filter("vec_id < 4")
        .alias("a")
        .join(emb.alias("b"), F.col("a.label") == F.col("b.label"))
        .filter("a.vec_id != b.vec_id")
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("vec_id"),
        )
    )
    return similarity.evaluate_retrieval(run, qrels, k=10, doc_col="vec_id")


def x_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import drift

    return drift.embedding_health(table(spark, sf_dir, "embeddings"))


def x_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed chain: BQ shortlist → exact-cosine relevance → MMR
    diversification — one unrolled-CTE oracle certifies the greedy
    selection end-to-end.

    r14 (VERDICT r13 "What's wrong" #3): the shortlist's embeddings
    now ride ``hamming_topk_batch(payload_cols=...)`` out of the SAME
    corpus pass that scores the Hamming shortlist, so the chain reads
    the embeddings table once — the old shape re-joined the corpus a
    second time just to refetch candidate vectors. Relevance then
    computes on the k·queries-row shortlist against the broadcast
    query vectors."""
    from pg_parquet_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    run = similarity.hamming_topk_batch(
        emb, q, k=20, payload_cols=("embedding",)
    )
    qv = q.select("query_id", F.col("embedding").alias("_qv"))
    cand = run.join(F.broadcast(qv), "query_id")
    rel = similarity._dot(F.col("embedding"), F.col("_qv")) / (
        F.sqrt(similarity._norm_sq(F.col("embedding")))
        * F.sqrt(similarity._norm_sq(F.col("_qv")))
    )
    cand = cand.select(
        "query_id", "vec_id", "embedding", rel.alias("rel")
    )
    return similarity.mmr_rerank(cand, k=5)


def _mmr_candidates_sql() -> str:
    def fold(a, b):
        return (
            f"list_reduce(list_transform(range(1, len({a}) + 1), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
            "(x, y) -> x + y)"
        )

    from pg_parquet_spark.operators import similarity

    return f"""SELECT r.query_id, r.vec_id, e.embedding AS embedding,
  {fold('e.embedding', 'qe.embedding')}
    / (sqrt({fold('e.embedding', 'e.embedding')})
       * sqrt({fold('qe.embedding', 'qe.embedding')})) AS rel
FROM ({similarity.hamming_batch_oracle_sql("vec_id < 2", k=20)}) r
JOIN embeddings e ON e.vec_id = r.vec_id
JOIN embeddings qe ON qe.vec_id = r.query_id"""


def x_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import dedup

    return dedup.strip_boilerplate_lines(
        _docs(spark, sf_dir), delim=" line ", mode="keep_first"
    )


def x_ivf_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 (VERDICT r13 #7): IVF quantizer staleness → re-index
    trigger — PSI over the persisted index's OWN cell histogram vs the
    frozen-quantizer assignment of an incoming batch (index built from
    even ids, odd ids as the batch; tmp-index gate pattern)."""
    import os
    import shutil
    import tempfile

    from pg_parquet_spark.operators import similarity
    from pg_parquet_spark.operators.ivf_fixture import CENTROIDS

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = os.path.join(tempfile.gettempdir(), "pgpq_ivf_stale_x_index")
    shutil.rmtree(idx, ignore_errors=True)
    similarity.build_ivf_index(emb.filter("vec_id % 2 = 0"), idx, CENTROIDS)
    return similarity.ivf_index_staleness(
        spark, idx, emb.filter("vec_id % 2 = 1"), CENTROIDS
    )


_CE_QUERIES = [(0, "spark vector scan"), (1, "data parquet")]


def x_crossencoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 (VERDICT r13 #7): cross-encoder-shaped rerank — joint
    (query, doc) interaction scoring over a bounded shortlist; the
    default deterministic lexical scorer is a pure codegen projection
    certified against the DuckDB fold."""
    from pg_parquet_spark.operators import similarity

    docs = _docs(spark, sf_dir)
    queries = spark.createDataFrame(
        _CE_QUERIES, "query_id long, query_text string"
    )
    run = queries.select("query_id").crossJoin(
        docs.filter("doc_id < 40").select("doc_id")
    )
    return similarity.crossencoder_rerank(run, docs, queries, k=10)


def x_rerank_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14: the two-tier RAG pipeline — hybrid retrieve (BM25 ⊕ dense
    RRF) feeding the cross-encoder rerank, BOTH tiers under ONE
    chained oracle (the corpus-health composition convention)."""
    from pg_parquet_spark.operators import recipe

    emb = table(spark, sf_dir, "embeddings")
    return recipe.rerank_pipeline(
        _docs(spark, sf_dir),
        emb,
        ["spark", "vector", "scan"],
        emb.filter(F.col("vec_id") == 0),
    )


def x_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14: dedup survivorship funnel — raw → exact → near-canonical →
    soft-effective mass, each tier's certified SQL chained under ONE
    oracle; the monotone 4-row report a curation review reads."""
    from pg_parquet_spark.operators import recipe

    return recipe.dedup_funnel(_docs(spark, sf_dir))


def x_listwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 (ROADMAP queue #3): listwise rerank — within-list
    IDF-discounted coverage; a doc's score depends on the whole
    per-query candidate list (the LLM-reranker shape)."""
    from pg_parquet_spark.operators import similarity

    docs = _docs(spark, sf_dir)
    queries = spark.createDataFrame(
        _CE_QUERIES, "query_id long, query_text string"
    )
    run = queries.select("query_id").crossJoin(
        docs.filter("doc_id < 40").select("doc_id")
    )
    return similarity.listwise_rerank(run, docs, queries, k=10)


def x_bm25_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 (ROADMAP queue #3): BM25 index staleness — df-distribution
    PSI over the persisted index's frozen top-K vocabulary + <oov>
    bucket vs an incoming batch (index from even ids, odd ids as the
    batch; the tmp-index gate pattern)."""
    import os
    import shutil
    import tempfile

    from pg_parquet_spark.operators import text

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    idx = os.path.join(tempfile.gettempdir(), "pgpq_bm25_stale_x_index")
    shutil.rmtree(idx, ignore_errors=True)
    text.build_bm25_index(docs.filter("doc_id % 2 = 0"), idx)
    return text.bm25_index_staleness(
        spark, idx, docs.filter("doc_id % 2 = 1")
    )


def x_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_parquet_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    return similarity.hamming_topk(emb, emb.filter(F.col("vec_id") == 0))


def x_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pg_parquet_spark.operators import text

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    idx = os.path.join(tempfile.gettempdir(), "pgpq_bm25_x_index")
    shutil.rmtree(idx, ignore_errors=True)
    text.build_bm25_index(docs.filter("doc_id % 2 = 0"), idx)
    text.bm25_index_upsert(spark, docs.filter("doc_id % 2 = 1"), idx)
    return text.bm25_index_topk(spark, idx, ["spark", "vector", "scan"])


def x_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events stream (r14)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.retention_cohorts(table(spark, sf_dir, "events"))


def x_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution over the events stream
    (r14); the first-touch mode is parity-tested in
    tests/test_analytics_ops.py."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.attribution_report(table(spark, sf_dir, "events"))


def x_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation over the events stream (r14)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.rfm_segments(table(spark, sf_dir, "events"))


def x_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided moving-sum level-shift scan per event type (r14)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.mean_shift_changepoints(table(spark, sf_dir, "events"))


def x_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WOE/IV feature screening: does the event value separate the
    purchase label (r14)?"""
    from pg_parquet_spark.operators import drift

    return drift.woe_iv(
        table(spark, sf_dir, "events").selectExpr(
            "value", "CAST(event_type = 'purchase' AS INT) AS label"
        )
    )


def x_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized integer-dot top-k — the 4x tier between
    BQ hamming and raw float (r14)."""
    from pg_parquet_spark.operators import similarity

    return similarity.sq8_topk(
        table(spark, sf_dir, "embeddings"), query_id=0, k=10
    )


def x_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users via the interval-delta decomposition;
    the oracle is the brute-force day-range COUNT(DISTINCT) (r14)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.active_users(
        table(spark, sf_dir, "events"), window_days=7
    )


#: schema_drift is a footer-level op — pinned to the sf0.001 fixtures on
#: BOTH sides (query and oracle) because the extended sweep renders each
#: oracle string once but runs it at every SF; the table schemas are
#: sf-invariant so the pin loses nothing, and query≡oracle stays strict.
_SCHEMA_DRIFT_SF = "/root/testdata/sf0.001"


def x_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median step / total latency per funnel stage (r14 — the timing
    companion to x_funnel)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.funnel_latency(
        table(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def x_product_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call product-health dashboard: seven certified
    product-analytics components under ONE chained oracle (r14 — the
    corpus_health composition pattern on the events surface)."""
    from pg_parquet_spark.operators import recipe

    return recipe.product_health(table(spark, sf_dir, "events"))


def x_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch z A/B readout over exact decimal moments (r14)."""
    from pg_parquet_spark.operators import drift

    return drift.ab_test_report(table(spark, sf_dir, "events"))


def x_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key daily OLS trend slopes from exact regression moments
    (r14)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.trend_slopes(table(spark, sf_dir, "events"))


def x_entry_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 first-3-event onboarding paths (r14)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.entry_paths(table(spark, sf_dir, "events"))


def x_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-concentration Gini over per-user event counts —
    pure-BIGINT rank identity (r14)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.engagement_gini(table(spark, sf_dir, "events"))


def x_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard over distinct assignment units
    (r14 — the integrity gate in front of x_ab_test)."""
    from pg_parquet_spark.operators import drift

    return drift.srm_check(table(spark, sf_dir, "events"))


def x_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves — the revenue dimension of x_retention
    (r14)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.cohort_ltv(table(spark, sf_dir, "events"))


#: CUPED cutover: mid-January of the fixture's event month
_CUPED_CUT = "2024-01-15 00:00:00"


def x_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (r14 — the
    pre-period-covariate adjustment next to x_ab_test/x_srm)."""
    from pg_parquet_spark.operators import drift

    return drift.cuped_report(table(spark, sf_dir, "events"), _CUPED_CUT)


#: connected-components gate: a bipartite order—part graph (every 7th
#: order) — components = co-purchase groups
_CC_EDGES_SQL = (
    "SELECT l_orderkey AS src, 1000000 + l_partkey AS dst "
    "FROM lineitem WHERE l_orderkey % 7 = 0"
)


def x_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label-propagation connected components over the bipartite
    order—part graph (r14)."""
    from pg_parquet_spark.operators import graph

    li = table(spark, sf_dir, "lineitem").filter("l_orderkey % 7 = 0")
    e = li.selectExpr("l_orderkey AS src", "1000000 + l_partkey AS dst")
    return graph.connected_components(e, iterations=8)


#: scan-planning gate: the fixture tables land in ONE row group, so the
#: gate writes its own multi-row-group file (row-exact batching via the
#: A9 single-file pyarrow path) to a deterministic path the oracle also
#: reads; run_one executes the Spark side first, so the file exists
#: when the oracle runs.
def _scanplan_path() -> str:
    import os
    import tempfile

    return os.path.join(tempfile.gettempdir(), "pgpq_scanplan_x.parquet")


def x_scan_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-group pruning explain over a 300-row-group copy of events:
    which groups would an event_id range predicate scan (r14)?"""
    from pg_parquet_spark.functions import metadata
    from pg_parquet_spark.sources import write_parquet

    ev = table(spark, sf_dir, "events").orderBy("event_id").coalesce(1)
    write_parquet(ev, _scanplan_path(), row_group_size=300)
    return metadata.scan_planning_report(
        spark, _scanplan_path(), "event_id", 100, 500
    )


def _scan_planning_oracle() -> str:
    from pg_parquet_spark.functions import metadata

    return metadata.scan_planning_oracle_sql(
        _scanplan_path(), "event_id", 100, 500
    )


def _schema_drift_oracle() -> str:
    from pg_parquet_spark.functions import metadata

    return metadata.schema_drift_oracle_sql(
        f"{_SCHEMA_DRIFT_SF}/events.parquet",
        f"{_SCHEMA_DRIFT_SF}/embeddings.parquet",
    )


def x_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema-drift report (events vs embeddings footprints):
    the data-ops composition of the parquet.schema surface (r14).
    r15 (VERDICT r14 minor): the QUERY threads ``sf_dir`` like every
    other gate — table schemas are sf-invariant, so the report equals
    the oracle's sf0.001-pinned rendering at any SF (the pin remains
    only in the once-rendered oracle string, see _SCHEMA_DRIFT_SF)."""
    from pg_parquet_spark.functions import metadata

    return metadata.schema_drift(
        spark,
        f"{sf_dir.rstrip('/')}/events.parquet",
        f"{sf_dir.rstrip('/')}/embeddings.parquet",
    )


def x_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control band over 6-hour event-count buckets (r14 — the
    exact-integer smoothing/alerting primitive; α=1/2 truncated at 8
    lags makes the forecast pure BIGINT)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.ewma_anomaly(
        table(spark, sf_dir, "events"), period_sec=21600
    )


#: k-anonymity gate: 30-day order periods × priority × status as the
#: quasi-identifier, the customer key as the sensitive attribute
_KANON_PERIOD = 2_592_000
_KANON_QI_SQL = [
    ("o_orderpriority", "priority"),
    ("o_orderstatus", "status"),
    (
        f"CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // {_KANON_PERIOD}",
        "period",
    ),
]


_IV_SQL = (
    "SELECT user_id AS key, CAST(FLOOR(epoch(ts)) AS BIGINT) AS start_sec, "
    "CAST(FLOOR(epoch(ts)) AS BIGINT) + 900 AS end_sec FROM events"
)


def x_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user interval-union coverage of 15-minute attention windows
    (r14 — interval algebra: overlapping windows must not
    double-count)."""
    from pg_parquet_spark.operators import timeseries

    iv = table(spark, sf_dir, "events").selectExpr(
        "user_id AS key",
        "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS start_sec",
        "CAST(CAST(ts AS TIMESTAMP) AS LONG) + 900 AS end_sec",
    )
    return timeseries.interval_union_seconds(iv, "key", "start_sec", "end_sec")


def x_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast over 6-hour buckets (r14 — the
    level+trend companion of x_ewma; truncation-exact packed fold)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.holt_forecast(
        table(spark, sf_dir, "events"), period_sec=21600
    )


def x_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic between view and purchase value
    distributions (r14 — the binning-free drift test; CDFs via
    distributed running sums)."""
    from pg_parquet_spark.operators import drift

    ev = table(spark, sf_dir, "events")
    return drift.ks_test(
        ev.filter("event_type = 'view'"),
        ev.filter("event_type = 'purchase'"),
    )


def x_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of doc length predicting English (r14 — the
    Mann-Whitney rank identity over the same prefix-sum CDF as
    x_ks)."""
    from pg_parquet_spark.operators import drift

    return drift.auc_report(_docs(spark, sf_dir), "n_chars", "lang = 'en'")


def x_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade + reading ease per document (r14 —
    integer-exact, termwise-truncated; three regex counts in one
    codegen projection)."""
    from pg_parquet_spark.operators import text

    return text.readability_scores(_docs(spark, sf_dir))


def x_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information / NMI between event type and weekday (r14 —
    the effect-size companion of x_chi2 on the same pair; MI is
    invariant to category relabeling, so the engines' differing
    weekday numberings cancel exactly like chi2's)."""
    from pg_parquet_spark.operators import drift

    ev = table(spark, sf_dir, "events")
    return drift.mutual_information(ev, F.col("event_type"), F.dayofweek("ts"))


def x_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-way deterministic shard assignment + balance audit (r14 —
    the manifest a training run consumes; empty shards surface via
    the literal spine)."""
    from pg_parquet_spark.operators import sampling

    return sampling.shard_manifest(_docs(spark, sf_dir), n_shards=16)


def x_spatial_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-radius nearest supplier per customer point (r14 — the
    3x3 cell-block NN join; the all-pairs oracle proves completeness
    AND the (dist2, id) tie rule)."""
    from pg_parquet_spark.operators import spatial

    pa = spatial.hash_points(table(spark, sf_dir, "customer"), "c_custkey")
    pb = spatial.hash_points(table(spark, sf_dir, "supplier"), "s_suppkey")
    return spatial.nearest_neighbor_join(pa, pb, d_max=16384)


def x_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention survival over 6-hour periods (r14 — the
    censoring-aware lifetime curve; truncation-exact packed-integer
    fold in both engines)."""
    from pg_parquet_spark.operators import timeseries

    return timeseries.kaplan_meier_retention(
        table(spark, sf_dir, "events"), period_sec=21600
    )


def x_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of document lengths (r14 —
    the feature-alignment op; two distrank passes, no single-task
    window)."""
    from pg_parquet_spark.operators import sampling

    return sampling.quantile_normalize(
        _docs(spark, sf_dir), "n_chars", "source", "doc_id"
    )


#: k-core gate: the co-purchase graph (x_triangles' edges), k=3,
#: 6 peel rounds — kcore_converged(True) is pinned in tests at both SFs
_KCORE_EDGES_SQL = """SELECT a.part AS src, b.part AS dst FROM
 (SELECT DISTINCT l_orderkey okey, l_partkey part FROM lineitem) a
 JOIN (SELECT DISTINCT l_orderkey okey, l_partkey part FROM lineitem) b
 USING (okey)
 WHERE a.part < b.part"""


def x_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the co-purchase graph by fixed-round peeling (r14 —
    the density filter next to connected components)."""
    from pg_parquet_spark.operators import graph

    e = graph.copurchase_edges(
        table(spark, sf_dir, "lineitem"), max_order_items=20
    ).selectExpr("u AS src", "v AS dst")
    return graph.kcore(e, k=3, rounds=6)


def x_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity risky-class listing over order
    metadata (r14 — the privacy-governance report next to
    pii_scrub)."""
    from pg_parquet_spark.operators import drift

    o = table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority AS priority",
        "o_orderstatus AS status",
        f"CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div {_KANON_PERIOD}"
        " AS period",
        "o_custkey",
    )
    return drift.k_anonymity_report(
        o, ["priority", "status", "period"], "o_custkey", k=10, l_diversity=5
    )


def x_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked point-in-rectangle containment join (r14 — the
    spatial blocking pattern): hash-derived customer points vs
    supplier rectangles through the cell equi-join; the oracle is the
    brute-force all-pairs cross join, so equality IS the completeness
    proof that the blocking loses no pair."""
    from pg_parquet_spark.operators import spatial

    pts = spatial.hash_points(table(spark, sf_dir, "customer"), "c_custkey")
    rcs = spatial.hash_rects(table(spark, sf_dir, "supplier"), "s_suppkey")
    return spatial.grid_containment_join(pts, rcs).orderBy(
        "rect_id", "point_id"
    )


EXTENDED_QUERIES = {
    "x_sketch_kmv": x_sketch_kmv,
    "x_sketch_cms": x_sketch_cms,
    "x_sketch_hdr": x_sketch_hdr,
    "x_quantile_bins": x_quantile_bins,
    "x_kmv_overlap": x_kmv_overlap,
    "x_setsim_jaccard": x_setsim_jaccard,
    "x_pagerank": x_pagerank,
    "x_triangles": x_triangles,
    "x_subtree_rollup": x_subtree_rollup,
    "x_linkage": x_linkage,
    "x_basket": x_basket,
    "x_pareto": x_pareto,
    "x_psi_table": x_psi_table,
    "x_text_psi": x_text_psi,
    "x_embedding_psi": x_embedding_psi,
    "x_chi2": x_chi2,
    "x_robust_outliers": x_robust_outliers,
    "x_seasonal_outliers": x_seasonal_outliers,
    "x_interpolate_gaps": x_interpolate_gaps,
    "x_pmi": x_pmi,
    "x_charclass": x_charclass,
    "x_ngram_novelty": x_ngram_novelty,
    "x_token_stream": x_token_stream,
    "x_vocab": x_vocab,
    "x_bpe_pairs": x_bpe_pairs,
    "x_vocab_zipf": x_vocab_zipf,
    "x_duplicated_spans": x_duplicated_spans,
    "x_strip_spans": x_strip_spans,
    "x_strip_incremental": x_strip_incremental,
    "x_soft_dedup": x_soft_dedup,
    "x_source_overlap": x_source_overlap,
    "x_token_budget": x_token_budget,
    "x_weighted_sample": x_weighted_sample,
    "x_rebalance_mix": x_rebalance_mix,
    "x_kfold": x_kfold,
    "x_curriculum_order": x_curriculum_order,
    "x_curriculum_perplexity": x_curriculum_perplexity,
    "x_datacard": x_datacard,
    "x_hybrid_search": x_hybrid_search,
    "x_matryoshka": x_matryoshka,
    "x_temperature_mix": x_temperature_mix,
    "x_hamming_topk": x_hamming_topk,
    "x_bm25_index": x_bm25_index,
    "x_vocab_growth": x_vocab_growth,
    "x_encoding_quality": x_encoding_quality,
    "x_line_dedup": x_line_dedup,
    "x_retrieval_eval": x_retrieval_eval,
    "x_mmr": x_mmr,
    "x_embedding_health": x_embedding_health,
    "x_line_dedup_incremental": x_line_dedup_incremental,
    "x_oov_rate": x_oov_rate,
    "x_score_calibrate": x_score_calibrate,
    "x_chunk_search": x_chunk_search,
    "x_funnel": x_funnel,
    "x_label_agreement": x_label_agreement,
    "x_corpus_health": x_corpus_health,
    "x_ivf_staleness": x_ivf_staleness,
    "x_crossencoder": x_crossencoder,
    "x_listwise": x_listwise,
    "x_bm25_staleness": x_bm25_staleness,
    "x_rerank_stack": x_rerank_stack,
    "x_dedup_funnel": x_dedup_funnel,
    "x_retention": x_retention,
    "x_attribution": x_attribution,
    "x_rfm": x_rfm,
    "x_changepoints": x_changepoints,
    "x_woe_iv": x_woe_iv,
    "x_sq8": x_sq8,
    "x_active_users": x_active_users,
    "x_schema_drift": x_schema_drift,
    "x_funnel_latency": x_funnel_latency,
    "x_product_health": x_product_health,
    "x_ab_test": x_ab_test,
    "x_trend_slopes": x_trend_slopes,
    "x_entry_paths": x_entry_paths,
    "x_gini": x_gini,
    "x_srm": x_srm,
    "x_cohort_ltv": x_cohort_ltv,
    "x_scan_planning": x_scan_planning,
    "x_connected_components": x_connected_components,
    "x_cuped": x_cuped,
    "x_spatial_join": x_spatial_join,
    "x_ewma": x_ewma,
    "x_k_anonymity": x_k_anonymity,
    "x_kcore": x_kcore,
    "x_quantile_norm": x_quantile_norm,
    "x_kaplan_meier": x_kaplan_meier,
    "x_interval_union": x_interval_union,
    "x_holt": x_holt,
    "x_ks": x_ks,
    "x_auc": x_auc,
    "x_readability": x_readability,
    "x_mi": x_mi,
    "x_shard_manifest": x_shard_manifest,
    "x_spatial_nn": x_spatial_nn,
}


def extended_oracles() -> dict[str, str]:
    """Oracle SQL per family — built lazily (some render frozen-model
    literals)."""
    from pg_parquet_spark.operators import (
        basket,
        dedup,
        drift,
        graph,
        linkage,
        pareto,
        recipe,
        sampling,
        setsim,
        similarity,
        sketch,
        spatial,
        text,
        timeseries,
    )
    from pg_parquet_spark.operators.ivf_fixture import CENTROIDS

    return {
        "x_sketch_kmv": sketch.kmv_oracle_sql("event_type", "user_id", k=8),
        "x_sketch_cms": sketch.cms_oracle_sql("user_id", top_k=10),
        "x_sketch_hdr": sketch.hdr_oracle_sql("event_type", "value"),
        "x_quantile_bins": sketch.binning_oracle_sql("event_type", "value"),
        "x_kmv_overlap": sketch.kmv_overlap_oracle_sql(
            "SELECT * FROM events WHERE value < 250",
            "SELECT * FROM events WHERE value >= 100",
            "event_type",
            "user_id",
            k=32,
        ),
        "x_setsim_jaccard": setsim.jaccard_join_oracle_sql(500_000),
        "x_pagerank": graph.page_rank_oracle_sql(
            graph.bipartite_order_edges_sql(), iterations=3, top_k=20
        ),
        "x_triangles": graph.triangle_oracle_sql(),
        "x_subtree_rollup": graph.subtree_rollup_oracle_sql(
            "SELECT p_partkey AS node, p_partkey // 10 AS parent "
            "FROM part WHERE p_partkey > 0",
            "SELECT p_partkey AS node, p_retailprice AS value FROM part",
        ),
        "x_linkage": linkage.resolve_entities_oracle_sql(
            "p_partkey", "p_name", max_dist=2
        ),
        "x_basket": basket.association_rules_oracle_sql(
            min_cooccur=2, top_k=20
        ),
        "x_pareto": pareto.pareto_frontier_oracle_sql(),
        "x_psi_table": drift.psi_oracle_sql(
            "SELECT * FROM documents",
            "SELECT * FROM documents WHERE n_chars % 3 != 0",
            "source",
        ),
        "x_text_psi": drift.text_psi_oracle_sql(
            "doc_id % 2 = 0", "doc_id % 2 = 1"
        ),
        "x_embedding_psi": drift.embedding_psi_oracle_sql(
            "vec_id % 2 = 0", "vec_id % 2 = 1", CENTROIDS
        ),
        "x_chi2": drift.chi2_oracle_sql("event_type", "dayofweek(ts)"),
        "x_robust_outliers": drift.robust_outlier_oracle_sql(),
        "x_seasonal_outliers": timeseries.seasonal_outliers_oracle_sql(),
        "x_interpolate_gaps": timeseries.interpolate_oracle_sql(
            where="event_id % 37 = 0"
        ),
        "x_pmi": text.pmi_oracle_sql(min_count=3, k=40),
        "x_charclass": text.charclass_oracle_sql(),
        "x_ngram_novelty": text.novelty_oracle_sql(
            "doc_id % 3 = 0", "doc_id % 3 != 0"
        ),
        "x_token_stream": text.token_stream_oracle_sql(context_len=512),
        "x_vocab": text.vocab_oracle_sql(top_k=40),
        "x_bpe_pairs": text.bpe_pair_oracle_sql(top_k=40),
        "x_vocab_zipf": text.vocab_zipf_oracle_sql(),
        "x_duplicated_spans": dedup.duplicated_spans_oracle_sql(
            span_tokens=12
        ),
        "x_strip_spans": dedup.strip_spans_oracle_sql(span_tokens=12),
        "x_strip_incremental": dedup.strip_incremental_oracle_sql(
            "doc_id % 2 = 0", "doc_id % 2 = 1", span_tokens=12
        ),
        "x_soft_dedup": dedup.soft_dedup_oracle_sql(),
        "x_source_overlap": dedup.source_overlap_oracle_sql(),
        "x_token_budget": sampling.token_budget_oracle_sql(
            score_expr="CAST(n_chars AS DOUBLE)", budget_tokens=20_000
        ),
        "x_weighted_sample": sampling.weighted_sample_oracle_sql(
            "doc_id", "n_chars", 50
        ),
        "x_rebalance_mix": (
            "SELECT doc_id FROM ("
            + sampling.rebalance_oracle_sql("source", "doc_id", _MIX_TGT)
            + ") ORDER BY doc_id"
        ),
        "x_kfold": sampling.kfold_oracle_sql("source", k=5),
        "x_curriculum_order": sampling.curriculum_order_oracle_sql(
            "n_chars // 500"
        ),
        "x_datacard": recipe.datacard_oracle_sql(),
        "x_curriculum_perplexity": recipe.curriculum_perplexity_oracle_sql(),
        "x_hybrid_search": recipe.hybrid_search_oracle_sql(
            ["spark", "vector", "scan"], query_id=0
        ),
        "x_matryoshka": similarity.matryoshka_oracle_sql(
            query_id=0, d_coarse=16, shortlist=50, k=10
        ),
        "x_temperature_mix": sampling.temperature_mix_oracle_sql(
            "source", "doc_id", total=120
        ),
        "x_hamming_topk": similarity.hamming_topk_oracle_sql(query_id=0),
        "x_vocab_growth": text.vocab_growth_oracle_sql(),
        "x_encoding_quality": text.encoding_quality_oracle_sql(),
        "x_line_dedup": dedup.strip_boilerplate_oracle_sql(
            delim=" line ", mode="keep_first"
        ),
        "x_retrieval_eval": similarity.evaluate_retrieval_oracle_sql(
            similarity.hamming_batch_oracle_sql(
                "vec_id < 4", k=10, exclude_self=True
            ),
            "SELECT a.vec_id AS query_id, b.vec_id AS vec_id "
            "FROM embeddings a JOIN embeddings b "
            "ON a.label = b.label AND a.vec_id != b.vec_id "
            "WHERE a.vec_id < 4",
            k=10,
            doc_col="vec_id",
        ),
        "x_mmr": similarity.mmr_oracle_sql(_mmr_candidates_sql(), k=5),
        "x_embedding_health": drift.embedding_health_oracle_sql(),
        "x_line_dedup_incremental": (
            dedup.strip_boilerplate_incremental_oracle_sql(
                "doc_id % 2 = 0", "doc_id % 2 = 1", delim=" line "
            )
        ),
        "x_oov_rate": text.oov_rate_oracle_sql(vocab_size=20),
        "x_score_calibrate": sampling.rank_normalize_oracle_sql(
            score_expr="n_chars"
        ),
        "x_chunk_search": recipe.chunked_search_oracle_sql(
            ["spark", "vector", "scan"]
        ),
        "x_funnel": timeseries.funnel_oracle_sql(
            ["view", "click", "purchase"]
        ),
        "x_label_agreement": similarity.label_agreement_oracle_sql(
            "vec_id < 4"
        ),
        "x_corpus_health": recipe.corpus_health_oracle_sql(
            line_delim=" line "
        ),
        "x_ivf_staleness": similarity.ivf_index_staleness_oracle_sql(
            "vec_id % 2 = 0", "vec_id % 2 = 1", CENTROIDS
        ),
        "x_crossencoder": similarity.crossencoder_oracle_sql(
            "SELECT q.query_id, d.doc_id FROM (VALUES (0), (1)) "
            "q(query_id), (SELECT doc_id FROM documents "
            "WHERE doc_id < 40) d",
            "SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in _CE_QUERIES)
            + ") t(query_id, query_text)",
            k=10,
        ),
        "x_listwise": similarity.listwise_oracle_sql(
            "SELECT q.query_id, d.doc_id FROM (VALUES (0), (1)) "
            "q(query_id), (SELECT doc_id FROM documents "
            "WHERE doc_id < 40) d",
            "SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in _CE_QUERIES)
            + ") t(query_id, query_text)",
            k=10,
        ),
        "x_bm25_staleness": text.bm25_index_staleness_oracle_sql(
            "doc_id % 2 = 0", "doc_id % 2 = 1"
        ),
        "x_rerank_stack": recipe.rerank_pipeline_oracle_sql(
            ["spark", "vector", "scan"], query_id=0
        ),
        "x_dedup_funnel": recipe.dedup_funnel_oracle_sql(),
        # the incremental-index oracle pattern: build evens + upsert
        # odds must equal direct BM25 over the FULL corpus
        "x_bm25_index": text.bm25_oracle_sql(["spark", "vector", "scan"]),
        "x_retention": timeseries.retention_oracle_sql(),
        "x_attribution": timeseries.attribution_oracle_sql(),
        "x_rfm": timeseries.rfm_oracle_sql(),
        "x_changepoints": timeseries.changepoint_oracle_sql(),
        "x_woe_iv": drift.woe_iv_oracle_sql(
            label_expr="CAST(event_type = 'purchase' AS INT)"
        ),
        "x_sq8": similarity.sq8_topk_oracle_sql(query_id=0, k=10),
        "x_active_users": timeseries.active_users_oracle_sql(window_days=7),
        "x_schema_drift": _schema_drift_oracle(),
        "x_funnel_latency": timeseries.funnel_latency_oracle_sql(
            ["view", "click", "purchase"]
        ),
        "x_product_health": recipe.product_health_oracle_sql(),
        "x_ab_test": drift.ab_test_oracle_sql(),
        "x_trend_slopes": timeseries.trend_slopes_oracle_sql(),
        "x_entry_paths": timeseries.entry_paths_oracle_sql(),
        "x_gini": timeseries.engagement_gini_oracle_sql(),
        "x_srm": drift.srm_oracle_sql(),
        "x_cohort_ltv": timeseries.cohort_ltv_oracle_sql(),
        "x_scan_planning": _scan_planning_oracle(),
        "x_connected_components": graph.connected_components_oracle_sql(
            _CC_EDGES_SQL, 8
        ),
        "x_cuped": drift.cuped_oracle_sql(_CUPED_CUT),
        "x_spatial_join": spatial.spatial_join_oracle_sql(),
        "x_ewma": timeseries.ewma_anomaly_oracle_sql(period_sec=21600),
        "x_k_anonymity": drift.k_anonymity_oracle_sql(
            _KANON_QI_SQL, "o_custkey", k=10, l_diversity=5
        ),
        "x_kcore": graph.kcore_oracle_sql(_KCORE_EDGES_SQL, k=3, rounds=6),
        "x_quantile_norm": sampling.quantile_normalize_oracle_sql(
            "n_chars", "source", "doc_id"
        ),
        "x_kaplan_meier": timeseries.kaplan_meier_oracle_sql(period_sec=21600),
        "x_interval_union": timeseries.interval_union_oracle_sql(_IV_SQL),
        "x_holt": timeseries.holt_forecast_oracle_sql(period_sec=21600),
        "x_ks": drift.ks_test_oracle_sql(
            "SELECT value FROM events WHERE event_type = 'view'",
            "SELECT value FROM events WHERE event_type = 'purchase'",
        ),
        "x_auc": drift.auc_oracle_sql(
            "SELECT * FROM documents", "n_chars", "lang = 'en'"
        ),
        "x_readability": text.readability_oracle_sql(),
        "x_mi": drift.mutual_information_oracle_sql(
            "event_type", "dayofweek(ts)"
        ),
        "x_shard_manifest": sampling.shard_manifest_oracle_sql(n_shards=16),
        "x_spatial_nn": spatial.nn_join_oracle_sql(d_max=16384),
    }
