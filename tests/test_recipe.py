"""Composed corpus-curation recipe: oracle equality of the full chain
(extract -> bound -> group -> split) at both SFs, plus the end-to-end
properties on a planted fixture."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pg_parquet_spark.operators import recipe
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf", SFS)
def test_curate_corpus_matches_oracle(spark, sf):
    """The COMPOSITION is oracle-certified: the full curation table
    over the html-wrapped corpus replicates bit-exactly through one
    chained DuckDB query."""
    docs = table(spark, sf, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
        ).alias("text"),
    )
    got = recipe.curate_corpus(wrapped, min_tokens=5, max_tokens=5000).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, "
        "'<html><body><p>' || text || '</p></body></html>' AS text "
        f"FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        recipe.curate_oracle_sql(min_tokens=5, max_tokens=5000)
    ).df()
    assert len(got) == len(want) > 0
    for c in ("doc_id", "n_tokens", "group_id", "is_canonical", "split"):
        assert list(got[c]) == list(want[c]), c
    assert set(got["split"]) == {"train", "valid"}


def test_curate_corpus_end_to_end_properties(spark):
    """Planted fixture: markup is stripped before anything else (a doc
    that is a near-dup only AFTER stripping groups correctly), length
    bounds drop short/huge docs, groups never straddle the split, and
    exactly one canonical per group."""
    rows = [
        (1, "<p>alpha beta gamma delta epsilon</p>"),
        (2, "<div>epsilon delta gamma beta alpha</div>"),  # shuffled dup of 1
        (3, "<b>tiny</b>"),                                 # under min_tokens
        (4, "one two three four five six seven"),
        (5, "<script>alpha beta gamma delta epsilon</script>unrelated words here now ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = recipe.curate_corpus(df, min_tokens=5, max_tokens=50).toPandas()
    assert 3 not in set(out.doc_id)          # bounded out
    g = out.set_index("doc_id")
    assert g.loc[1, "group_id"] == g.loc[2, "group_id"] == 1  # post-strip dup
    assert bool(g.loc[1, "is_canonical"]) and not bool(g.loc[2, "is_canonical"])
    assert g.loc[1, "split"] == g.loc[2, "split"]  # group moves together
    # script payload removed BEFORE fingerprinting: doc 5 is its own group
    assert g.loc[5, "group_id"] == 5
    assert (out.groupby("group_id")["is_canonical"].sum() == 1).all()


@pytest.mark.parametrize("sf", SFS)
def test_corpus_datacard_matches_oracle(spark, sf):
    """The data card replicates bit-exactly (all integer derivations)."""
    docs = table(spark, sf, "documents")
    got = recipe.corpus_datacard(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(recipe.datacard_oracle_sql()).df()
    assert got.values.tolist() == want.values.tolist()
    row = got.iloc[0]
    assert row.n_docs > 0 and row.total_tokens > row.n_docs
    assert row.min_tokens <= row.mean_tokens <= row.max_tokens


def test_corpus_datacard_counts_planted_dups(spark):
    rows = [
        (1, "a b c", "s1"),
        (2, "c b a", "s1"),   # normalized dup of 1
        (3, "x y z", "s2"),
        (4, "p q r s", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    card = recipe.corpus_datacard(df).collect()[0]
    assert card.n_docs == 4 and card.n_unique_normalized == 3
    assert card.dup_ratio_ppm == 250_000
    assert card.n_sources == 2 and card.total_tokens == 13


@pytest.mark.parametrize("sf", SFS)
def test_classifier_canonical_matches_oracle(spark, sf):
    """r11: quality-aware canonical selection — near-dup clusters keep
    the highest-classifier-logit member; the full (id, cluster_id,
    keep) table replicates the chained DuckDB oracle (cluster closure
    + VALUES-join logits + representative rank) bit-exactly."""
    from pg_parquet_spark.operators.classifier_fixture import MODEL

    docs = table(spark, sf, "documents").select("doc_id", "text")
    got = recipe.classifier_canonical(docs, MODEL).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        recipe.classifier_canonical_oracle_sql(MODEL)
    ).df()
    assert len(got) == len(want) == docs.count()
    for c in ("doc_id", "cluster_id", "keep"):
        assert list(got[c]) == list(want[c]), c
    assert (~got["keep"]).sum() > 0  # some near-dups actually dropped


def test_classifier_canonical_keeps_best_not_smallest(spark):
    """The rule's reason to exist: in a planted near-dup family the
    CLEANEST member wins even when a lower id exists (min-id canonical
    would keep the mangled copy)."""
    from pg_parquet_spark.operators import sampling

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base + " zz qq xx vv kk"),       # mangled copy, smaller id
        (2, base),                           # clean rendition
        (3, "wholly different content about parquet engines one two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # train a tiny model where the mangled junk tokens are negatives
    model = sampling.train_quality_classifier(
        spark.createDataFrame([(10, base)], "doc_id long, text string"),
        spark.createDataFrame(
            [(11, "zz qq xx vv kk")], "doc_id long, text string"
        ),
        n_buckets=64,
    )
    out = {r.doc_id: (r.cluster_id, r.keep) for r in
           recipe.classifier_canonical(df, model).collect()}
    assert out[1][0] == out[2][0] == 1     # one cluster, min-id label
    assert out[2][1] is True               # the CLEAN doc is kept
    assert out[1][1] is False              # not the smallest id
    assert out[3][1] is True               # unclustered stays


@pytest.mark.parametrize("sf", SFS)
def test_contamination_report_matches_oracle(spark, sf):
    """r11 composition: the per-source two-tier contamination
    datasheet (exact n-gram + MinHash near) replicates the chained
    oracle bit-exactly over a corpus/benchmark split."""
    docs = table(spark, sf, "documents").select("doc_id", "text", "source")
    corpus = docs.filter("doc_id % 20 <> 0")
    bench = docs.filter("doc_id % 20 = 0")
    got = recipe.contamination_report(corpus, bench, min_matches=6).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        recipe.contamination_report_oracle_sql(
            "doc_id % 20 <> 0", "doc_id % 20 = 0", min_matches=6
        )
    ).df()
    assert len(got) == len(want) > 1
    for c in ("source", "n_docs", "n_exact", "n_near", "exact_ppm", "near_ppm"):
        assert list(got[c]) == list(want[c]), c
    assert int(got["n_docs"].sum()) == corpus.count()


@pytest.mark.parametrize("sf", SFS)
def test_curriculum_from_perplexity_matches_oracle(spark, sf):
    """r12 composition: bigram difficulty → equi-depth bins →
    deterministic curriculum order, certified by ONE chained oracle
    (the curate_corpus pattern)."""
    docs = table(spark, sf, "documents")
    got = recipe.curriculum_from_perplexity(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(recipe.curriculum_perplexity_oracle_sql()).df()
    assert len(got) == len(want) > 0
    for c in ("doc_id", "bin", "mean_nll_micro", "global_pos"):
        assert list(got[c]) == list(want[c]), c
    # the curriculum property: difficulty blocks ascend with position
    ordered = got.sort_values("global_pos")
    assert list(ordered.bin) == sorted(ordered.bin)


def test_curriculum_from_perplexity_salt_reshuffles_epochs(spark):
    docs = table(spark, SFS[0], "documents")
    e1 = recipe.curriculum_from_perplexity(docs, salt="e1").toPandas()
    e2 = recipe.curriculum_from_perplexity(docs, salt="e2").toPandas()
    a = e1.sort_values("global_pos")
    b = e2.sort_values("global_pos")
    assert not a.doc_id.equals(b.doc_id)          # epochs reshuffle
    assert list(a.bin) == list(b.bin)             # curriculum invariant
    import pytest as _pt

    with _pt.raises(ValueError, match="power of two"):
        recipe.curriculum_from_perplexity(docs, n_bins=6)


def test_hybrid_search_matches_chained_oracle(spark):
    """r13: the composed RAG retrieval stack — BM25 shortlist + dense
    cosine shortlist fused by integer RRF — certified by ONE chained
    DuckDB oracle at both SFs (the curate_corpus pattern)."""
    import duckdb

    from pyspark.sql import functions as F

    from tools.check_oracle import frame_digest

    terms = ["spark", "vector", "scan"]
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = table(spark, sf, "documents")
        emb = table(spark, sf, "embeddings")
        got = recipe.hybrid_search(
            docs, emb, terms, emb.filter(F.col("vec_id") == 0)
        ).toPandas()
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        want = con.execute(recipe.hybrid_search_oracle_sql(terms)).df()
        assert len(got) == len(want) > 0, sf
        assert frame_digest(got)[:3] == frame_digest(want)[:3], sf
        # fusion semantics: every fused doc sits in >=1 list; docs in
        # both lists carry n_lists == 2
        assert set(got.n_lists) <= {1, 2}


def test_chunked_search_matches_chained_oracle(spark):
    """r13: chunk-granular BM25 with doc-level max-pooling — one
    chained oracle certifies chunking (integer ceil windows, clamped
    tail), the packed chunk key, chunk-corpus BM25, and the per-doc
    argmax, bit-for-bit at both SFs."""
    import duckdb

    from pg_parquet_spark.session import table as _table

    q = ["spark", "vector", "scan"]
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = _table(spark, sf, "documents")
        got = recipe.chunked_search(docs, q).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        want = con.execute(recipe.chunked_search_oracle_sql(q)).df()
        assert len(got) == len(want) == 20, sf
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (sf, c)


def test_chunked_search_semantics(spark):
    """A document whose query terms concentrate in one window outranks
    a same-length document with the terms spread out (the max-pool
    property); non-integral ids raise."""
    from pyspark.sql import functions as SF

    filler = " ".join(f"w{i}" for i in range(28))
    dense = "alpha beta alpha beta " + filler          # terms in window 1
    spread = ("alpha " + filler[: len(filler) // 2] + " beta "
              + filler[len(filler) // 2:] + " alpha beta").replace("  ", " ")
    df = spark.createDataFrame(
        [(1, dense), (2, spread)], "doc_id long, text string"
    )
    out = recipe.chunked_search(
        df, ["alpha", "beta"], chunk_tokens=8, overlap=2, top_k=5
    ).toPandas()
    assert list(out.doc_id)[0] == 1  # dense window wins
    import pytest as _pytest

    with _pytest.raises(TypeError, match="integral"):
        recipe.chunked_search(
            df.withColumn("doc_id", SF.col("doc_id").cast("string")),
            ["alpha"],
        )


def test_corpus_health_matches_chained_oracle(spark):
    """r13: the one-call corpus-health dashboard — eight certified
    components folded into one (metric, value) report — replicates the
    chained oracle bit-for-bit at both SFs."""
    import duckdb

    from pg_parquet_spark.session import table as _table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = _table(spark, sf, "documents")
        got = recipe.corpus_health(docs, line_delim=" line ").toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        want = con.execute(
            recipe.corpus_health_oracle_sql(line_delim=" line ")
        ).df()
        assert len(got) == len(want) == 8, sf
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (sf, c)
    vals = dict(zip(got.metric, got.value))
    # the templated synthetic corpus: tiny flat-tail vocabulary, clean
    # encoding, genuine boilerplate and OOV pressure at the 20-term cut
    assert vals["n_docs"] == 500
    assert vals["late_vocab_ppm"] == 0
    assert vals["mojibake_ppm"] == 0
    assert vals["boilerplate_ppm"] > 0
    assert vals["oov_ppm"] > 0


def test_rerank_pipeline_boundary_and_demotion(spark):
    """r14 planted fixture for the two-tier stack: tier 2 sees ONLY
    tier 1's candidate list (a perfect-CE doc cut by `candidates`
    never surfaces), and within the list the joint scorer overrules
    the retrieval order (the tier-1 winner is demoted when its query
    token sits later); both tiers' verdicts ride the output row."""
    docs = spark.createDataFrame(
        [
            # CE 1_000_000 (spark@1) but tier-1 runner-up (dl 3, dim emb)
            (1, "spark zzz qqq"),
            # tier-1 winner (shortest dl, perfect cosine) but CE 500_000
            (2, "data spark"),
            # would be CE 1_000_000 — but ranked 3rd by BOTH rankers, so
            # the candidates=2 cut excludes it from tier 2 entirely
            (3, "spark aaa bbb ccc ddd eee fff ggg"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = recipe.rerank_pipeline(
        docs, emb, ["spark"], q, candidates=2
    ).toPandas()
    assert list(out.doc_id) == [1, 2]       # CE order, not retrieval order
    assert 3 not in set(out.doc_id)          # the tier boundary
    assert list(out.ce_score_micro) == [1_000_000, 500_000]
    assert list(out.ce_rank) == [1, 2]
    rrf = dict(zip(out.doc_id, out.rrf_nano))
    assert rrf[2] > rrf[1]                   # tier-1 preferred doc 2 ...
    # ... and tier 2 demoted it — the carried verdicts disagree, which
    # is exactly the signal a calibration layer reads


def test_rerank_pipeline_oracle_sql_honors_doc_id_col():
    """r14 review fix: the CE run subquery must alias the fused id to
    doc_id_col (it hardcoded AS doc_id, breaking any non-default id
    column in the oracle)."""
    sql = recipe.rerank_pipeline_oracle_sql(["spark"], doc_id_col="item_id")
    assert "AS item_id" in sql
    assert "AS doc_id" not in sql


def test_dedup_funnel_semantics(spark):
    """r14 planted fixture: three exact copies collapse to one
    fingerprint (and co-cluster, so near subsumes exact); three
    mutually-alien docs survive every tier; the soft tier reports the
    cluster's one-doc-worth of mass minus the integer-floor deficit
    (3 x (1e6 div 3) = 999_999 -> the cluster contributes 0 whole
    effective docs); attrition is vs the PREVIOUS stage; empty corpus
    raises."""
    docs = spark.createDataFrame(
        [
            (1, "aaa bbb", 7),
            (2, "aaa bbb", 7),
            (3, "aaa bbb", 7),
            (4, "ccc ddd eee", 11),
            (5, "fff ggg hhh", 11),
            (6, "iii jjj kkk", 11),
        ],
        "doc_id long, text string, n_chars long",
    )
    out = recipe.dedup_funnel(docs).toPandas()
    assert list(out.stage) == ["raw", "exact", "near_canonical", "soft_effective"]
    assert list(out.docs) == [6, 4, 4, 3]
    assert list(out.attrition_ppm) == [0, 333_333, 0, 250_000]
    with pytest.raises(ValueError, match="empty corpus"):
        recipe.dedup_funnel(docs.filter("doc_id < 0"))


def test_dedup_funnel_negative_attrition_truncates_like_duckdb(spark):
    """r14 review fix: an exact-duplicate class LARGER than the LSH
    band cap has its hot buckets dropped and never co-clusters, so the
    near tier keeps MORE than the exact tier — attrition goes
    NEGATIVE, and the quantization must TRUNCATE toward zero (DuckDB's
    BIGINT //), not floor (Python's //): 51 copies + 2 distinct docs
    gives exact=3, near=53, (3-53)*1e6 per 3 = -16_666_666 (trunc),
    where floor would say -16_666_667."""
    from pg_parquet_spark.operators import dedup as dedup_ops

    assert dedup_ops.MAX_DOCS_PER_BAND < 51
    docs = spark.createDataFrame(
        [(i, "ppp qqq rrr", 11) for i in range(51)]
        + [(100, "sss ttt uuu", 11), (101, "vvv www xxx", 11)],
        "doc_id long, text string, n_chars long",
    )
    out = recipe.dedup_funnel(docs).toPandas()
    assert list(out.docs) == [53, 3, 53, 53]
    assert out.attrition_ppm.tolist()[2] == -16_666_666  # trunc, not floor


def test_product_health_matches_chained_oracle(spark):
    """r14: the product-health dashboard (seven certified components
    folded to an 8-row (metric, value) report) replicates the chained
    oracle bit-for-bit at both SFs."""
    from pg_parquet_spark.operators import timeseries

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        got = recipe.product_health(ev).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        want = con.execute(recipe.product_health_oracle_sql()).df()
        assert len(got) == len(want) == 8, sf
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (sf, c)
    timeseries.release_cached()


def test_product_health_semantics(spark):
    """Planted fixture: the composed metrics agree with hand-computed
    values — two users, one converting funnel, a known WAU peak and a
    50% age-1 retention; a no-converter corpus reports zeroed funnel
    latency instead of NULL."""
    import datetime as dt

    from pg_parquet_spark.operators import timeseries

    t0 = dt.datetime(2026, 1, 5)
    wk = dt.timedelta(days=7)

    def r(i, u, t, off_min, base=t0):
        return (i, u, t, base + dt.timedelta(minutes=off_min))

    rows = [
        # user 1: full funnel in week 0, returns week 1 (age-1 retained)
        r(1, 1, "view", 0), r(2, 1, "click", 10), r(3, 1, "purchase", 30),
        r(4, 1, "view", 0, t0 + wk),
        # user 2: views week 0 only
        r(5, 2, "view", 5),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r.metric: r.value for r in recipe.product_health(ev).collect()}
    timeseries.release_cached()
    assert out["n_events"] == 5 and out["n_users"] == 2
    assert out["funnel_conversion_ppm"] == 500_000        # 1 of 2 viewers
    assert out["median_total_latency_sec2"] == 2 * 1800   # 30 min x2
    assert out["retention_age1_ppm"] == 500_000           # 1 of 2 returned
    assert out["top_channel_share_ppm"] == 1_000_000      # all via click
    assert out["wau_peak"] == 2
    # no-converter corpus: funnel latency degrades to 0, not NULL
    ev2 = ev.filter("event_type != 'purchase'")
    out2 = {r.metric: r.value for r in recipe.product_health(ev2).collect()}
    timeseries.release_cached()
    assert out2["funnel_conversion_ppm"] == 0
    assert out2["median_total_latency_sec2"] == 0
    assert out2["top_channel_share_ppm"] == 0


def test_product_health_empty_basis_parity(spark):
    """Late-r14 review closure: a corpus whose rows ALL have NULL
    user/ts yields an all-zero dashboard on BOTH engines — the oracle's
    wau_last scalar subquery now COALESCEs to 0 like every other
    component (it was the one missed)."""
    import pandas as pd

    from pg_parquet_spark.operators import timeseries

    rows = [(None, None, "view", 1.0, i) for i in range(5)]
    ev = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_type string, value double, "
        "event_id long",
    )
    got = recipe.product_health(ev).toPandas()
    timeseries.release_cached()
    con = duckdb.connect()
    pdf = pd.DataFrame(
        rows,
        columns=["user_id", "ts", "event_type", "value", "event_id"],
    ).astype({"ts": "datetime64[us]"})
    con.register("events", pdf)
    want = con.execute(recipe.product_health_oracle_sql()).df()
    assert len(got) == len(want) == 8
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c
    byname = dict(zip(got.metric, got.value))
    assert byname["n_users"] == 0 and byname["wau_last"] == 0
