"""Semantics the round-7 analytics/pipeline oracles can't see:
plan shapes (range join must not be a BNLJ), stratified rates, and
unigram scoring actually ranking rare-word documents higher."""

from pyspark.sql import functions as F

from pg_parquet_spark.operators import analytics_queries as aq

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_join_uses_equi_key_not_bnlj(spark):
    df = aq.q_range_join(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_stratified_rates_land_near_targets(spark):
    # at sf0.01 each stratum has ~100 docs; the hash threshold keeps
    # ~rate of them (binomial noise bounded loosely)
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    totals = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    kept = {r["lang"]: r["n_kept"] for r in aq.q_sample_stratified(spark, "/root/testdata/sf0.01").collect()}
    for lang, total in totals.items():
        rate = aq.STRATA_RATES.get(lang, aq.STRATA_DEFAULT)
        frac = kept.get(lang, 0) / total
        assert abs(frac - rate) < 0.15, (lang, frac, rate)
    # and it is deterministic: same inputs, same selection
    again = {r["lang"]: r["n_kept"] for r in aq.q_sample_stratified(spark, "/root/testdata/sf0.01").collect()}
    assert again == kept


def test_unigram_scores_rank_rare_words_higher(spark):
    # a document of corpus-common words must score lower NLL than one
    # with a word that appears nowhere else
    common = "the table row value fast"
    rare = "the table row value zzzyzx"
    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text", "lang", "source", "n_chars")
    extra = spark.createDataFrame(
        [(900001, common, "en", "t", len(common)), (900002, rare, "en", "t", len(rare))],
        base.columns,
    )
    import os
    import tempfile

    d = os.path.join(tempfile.mkdtemp(), "docs_aug")
    base.unionByName(extra).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc_id"]: r["mean_nll_micro"]
        for r in aq.q_text_unigram_logprob(spark, d).filter(F.col("doc_id") > 900000).collect()
    }
    assert out[900002] > out[900001]


def test_segment_dedup_flags_injected_boilerplate(spark):
    # two synthetic docs sharing an identical 16-word block must both
    # report a duplicated segment; a unique doc reports zero
    words = " ".join(f"w{i}" for i in range(16))
    uniq = " ".join(f"u{i}" for i in range(16))
    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text", "lang", "source", "n_chars")
    extra = spark.createDataFrame(
        [
            (910001, words, "en", "t", len(words)),
            (910002, words + " tail", "en", "t", len(words) + 5),
            (910003, uniq, "en", "t", len(uniq)),
        ],
        base.columns,
    )
    import os
    import tempfile

    d = os.path.join(tempfile.mkdtemp(), "docs_seg")
    base.unionByName(extra).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in aq.q_dedup_segments(spark, d).filter(F.col("doc_id") > 910000).collect()}
    assert out[910001]["n_dup"] >= 1
    assert out[910002]["n_dup"] >= 1
    assert out[910003]["n_dup"] == 0
