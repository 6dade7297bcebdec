"""Semantics the round-7 analytics/pipeline oracles can't see:
plan shapes (range join must not be a BNLJ), stratified rates, and
unigram scoring actually ranking rare-word documents higher."""

import pytest
from pyspark.sql import functions as F

from pg_parquet_spark.operators import analytics_queries as aq
from pg_parquet_spark.session import table

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


def test_gapfill_single_shuffle_and_correct_carry(spark):
    """r8: the whole gap-fill (daily agg, spine join, LOCF window) rides
    ONE exchange on the series key; gap days carry the previous day's
    total and are flagged."""
    df = aq.q_timeseries_gapfill(spark, SF)
    plan = _plan(df)
    # the raw events shuffle exactly once (into the daily aggregate);
    # every other exchange moves only aggregated rows bounded by
    # keys × days: the spine's min/max agg, the daily-side broadcast
    # into the spine join, and the final sort's range exchange
    assert plan.count("Exchange") <= 4, plan
    assert "BroadcastExchange" in plan  # daily totals broadcast, not SMJ
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert any(r.is_gap for r in rows), "fixture sample produced no gaps"
    by_key = {}
    for r in rows:
        if r.is_gap:
            # LOCF: a gap day equals the last non-gap value before it
            assert r.filled_total == by_key[r.event_type], r
        else:
            by_key[r.event_type] = r.filled_total
    # spine is dense: consecutive days per type
    from itertools import groupby

    for et, grp in groupby(rows, key=lambda r: r.event_type):
        days = [r.day for r in grp]
        assert all(
            (b - a).days == 1 for a, b in zip(days, days[1:])
        ), f"{et} spine has holes"


def test_outlier_zscore_moments_match_numpy(spark):
    """The exact-decimal moment fold reproduces the textbook sample
    z-score (numpy cross-check) to float tolerance."""
    import numpy as np

    ev = (
        spark.read.parquet(SF + "/events.parquet")
        .select("event_id", "event_type", "value")
        .toPandas()
    )
    got = {r.event_id: r.zscore for r in aq.q_outlier_zscore(spark, SF).collect()}
    for et, grp in ev.groupby("event_type"):
        v = grp["value"].to_numpy()
        z = (v - v.mean()) / v.std(ddof=1)
        flagged = grp["event_id"].to_numpy()[np.abs(np.round(z, 6)) > 3]
        assert set(flagged) == {
            i for i in got if i in set(grp["event_id"])
        }, et
        for eid, zi in zip(grp["event_id"].to_numpy(), z):
            if eid in got:
                assert abs(got[eid] - zi) < 1e-6


def test_event_transitions_probabilities_normalize(spark):
    """Each from-state's outgoing probabilities sum to ~1 and counts
    reproduce a pandas groupby of the lead sequence."""
    df = aq.q_event_transitions(spark, SF)
    rows = df.collect()
    from collections import defaultdict

    sums = defaultdict(float)
    for r in rows:
        sums[r.event_type] += r.prob
    assert all(abs(s - 1.0) < 1e-4 for s in sums.values()), dict(sums)

    ev = (
        spark.read.parquet(SF + "/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["next_type"] = ev.groupby("user_id")["event_type"].shift(-1)
    expect = (
        ev.dropna(subset=["next_type"])
        .groupby(["event_type", "next_type"])
        .size()
        .to_dict()
    )
    got = {(r.event_type, r.next_type): r.cnt for r in rows}
    assert got == expect


def test_bm25_matches_duckdb_oracle(spark):
    """BM25 (r9): the full ranking (ids, matched-term counts,
    micro-quantized scores) replicates bit-exactly in DuckDB; matching
    is complete (every doc containing a query term appears)."""
    import duckdb

    from pg_parquet_spark.operators import text as text_ops
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents")
    q = ["spark", "vector", "scan"]
    got = text_ops.bm25_scores(docs, q).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(text_ops.bm25_oracle_sql(q)).df()
    assert len(got) == len(want) > 0
    for col in ("doc_id", "n_matched_terms", "score_micro"):
        assert list(got[col]) == list(want[col]), col

    # completeness: every doc containing any query term is scored
    n_match = docs.filter(
        "array_contains(split(lower(text), ' '), 'spark') OR "
        "array_contains(split(lower(text), ' '), 'vector') OR "
        "array_contains(split(lower(text), ' '), 'scan')"
    ).count()
    assert len(got) == n_match
    assert got["score_micro"].is_monotonic_decreasing


def test_rollup_time_buckets_matches_duckdb_oracle(spark):
    """Hypertable-style continuous aggregate (r9): per-(key, bucket)
    OHLC replicates bit-exactly in DuckDB — integer bucket arithmetic,
    DECIMAL sums, arg_min/arg_max open/close on the composite order
    key. Checked at two bucket widths."""
    import duckdb

    from pg_parquet_spark.operators import timeseries
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.001"
    events = table(spark, sf, "events")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    for width in (3600, 86400):
        got = timeseries.rollup_time_buckets(events, width_sec=width).toPandas()
        want = con.execute(timeseries.rollup_oracle_sql(width_sec=width)).df()
        assert len(got) == len(want) > 0, width
        for col in got.columns:
            assert list(got[col]) == list(want[col]), (width, col)
    # OHLC sanity on the daily rollup
    assert (got["v_min"] <= got["v_open"]).all()
    assert (got["v_min"] <= got["v_close"]).all()
    assert (got["v_max"] >= got["v_open"]).all()
    assert (got["n_events"] > 0).all()


def test_rollup_incremental_refresh_equals_full_recompute(spark, tmp_path):
    """r9: the continuous-aggregate refresh recomputes ONLY the touched
    (key, bucket) groups yet lands exactly the full-recompute state,
    through the versioned MERGE (atomic publish, time travel to the
    pre-refresh rollup)."""
    from pg_parquet_spark.operators import timeseries
    from pg_parquet_spark.session import table
    from pg_parquet_spark.sources import layout, read_parquet, write_parquet

    sf = "/root/testdata/sf0.001"
    events = table(spark, sf, "events")
    base = events.filter("event_id % 5 != 0")
    batch = events.filter("event_id % 5 = 0")
    root = str(tmp_path / "rollup")

    write_parquet(timeseries.rollup_time_buckets(base, 86400), root)
    n = timeseries.refresh_rollup_buckets(
        spark, root, events, batch, width_sec=86400
    )
    assert n > 0

    got = read_parquet(spark, root).orderBy("event_type", "bucket_epoch").toPandas()
    want = (
        timeseries.rollup_time_buckets(events, 86400)
        .orderBy("event_type", "bucket_epoch")
        .toPandas()
    )
    assert len(got) == len(want)
    for col in want.columns:
        assert list(got[col]) == list(want[col]), col
    # the refresh went through the versioned publish (the FIRST
    # versioned merge migrates the legacy rollup, so version 1 is the
    # refreshed snapshot; later refreshes retain travel history)
    man = layout.read_manifest(root)
    assert man is not None and man["version"] == 1
    n2 = timeseries.refresh_rollup_buckets(
        spark, root, events, batch.limit(20), width_sec=86400
    )
    assert n2 > 0
    prev = layout.read_versioned(spark, root, version=1)
    assert prev.count() == len(want)  # travel to the pre-2nd-refresh state
    assert read_parquet(spark, root).count() == len(want)  # refresh idempotent


def test_bm25_index_path_equals_direct_and_pushes_terms(spark, tmp_path):
    """r9: the materialized-term-index BM25 path returns exactly the
    direct path's ranking, and a persisted index scan pushes the term
    filter into parquet (the per-query scale story)."""
    from pg_parquet_spark.operators import text as text_ops
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents")
    q = ["spark", "vector", "scan"]
    direct = text_ops.bm25_scores(docs, q).toPandas()

    index, n_docs, avgdl = text_ops.build_term_index(docs)
    path = str(tmp_path / "term_index")
    index.write.parquet(path)
    persisted = spark.read.parquet(path)
    indexed = text_ops.bm25_scores_from_index(
        persisted, q, n_docs, avgdl
    ).toPandas()
    assert len(direct) == len(indexed)
    for col in direct.columns:
        assert list(direct[col]) == list(indexed[col]), col

    # the term filter reaches the scan
    plan = (
        text_ops.bm25_scores_from_index(persisted, q, n_docs, avgdl)
        ._jdf.queryExecution()
        .toString()
    )
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters")[1][:200]


def test_subtree_rollup_matches_recursive_cte_oracle(spark):
    """r9: the path-doubling closure + subtree rollup equals DuckDB's
    WITH RECURSIVE on a synthetic part hierarchy (parent = key // 10 —
    a 10-ary tree ~3 levels deep over 200 parts); a cyclic edge table
    raises instead of silently truncating reachability."""
    import duckdb
    import pytest as _pytest

    from pg_parquet_spark.operators import graph
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.001"
    part = table(spark, sf, "part")
    edges = part.filter("p_partkey > 0").selectExpr(
        "p_partkey AS node", "p_partkey DIV 10 AS parent"
    )
    values = part.selectExpr("p_partkey AS node", "p_retailprice AS value")
    got = graph.subtree_rollup(edges, values).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{sf}/part.parquet')"
    )
    want = con.execute(
        graph.subtree_rollup_oracle_sql(
            "SELECT p_partkey AS node, p_partkey // 10 AS parent "
            "FROM part WHERE p_partkey > 0",
            "SELECT p_partkey AS node, p_retailprice AS value FROM part",
        )
    ).df()
    assert len(got) == len(want) > 0
    for col in ("node", "n_nodes", "total"):
        assert list(got[col]) == list(want[col]), col
    # the root's subtree is the whole forest under 0, self included
    root = got[got.node == 0].iloc[0]
    assert root.n_nodes == len(want)  # every part reaches 0

    # a CYCLE converges (finite closure) and surfaces loudly as nodes
    # that are their own ancestors — the DAG-contract violation signal
    cyc = spark.createDataFrame([(1, 2), (2, 1)], "node long, parent long")
    pairs = {
        (r.node, r.ancestor)
        for r in graph.transitive_ancestors(cyc).collect()
    }
    assert pairs == {(1, 2), (2, 1), (1, 1), (2, 2)}

    # the depth bound raises instead of silently truncating: a chain of
    # depth 20 cannot close within 2 doubling rounds (distance 4)
    chain = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 21)], "node long, parent long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        graph.transitive_ancestors(chain, max_rounds=2)


def test_seasonal_outliers_match_oracle_both_sfs(spark):
    """Seasonal robust fences (same-hour median/MAD): flagged-row table
    replicates bit-for-bit — the composite group:hour key and the
    integer fence arithmetic are engine-identical."""
    import duckdb

    from pg_parquet_spark.operators import timeseries as ts_ops

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        got = ts_ops.seasonal_outliers(ev).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        want = con.execute(ts_ops.seasonal_outliers_oracle_sql()).df()
        assert len(got) == len(want) > 0
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (sf, c)


def test_seasonal_outliers_use_seasonal_not_global_fence(spark):
    """A value normal for its season but extreme globally is NOT
    flagged; the same value in a quiet season IS — the defining
    property vs the global fence."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import timeseries as ts_ops

    rows = []
    # hour 2: quiet baseline around 10; hour 14: busy baseline around 1000
    for i in range(40):
        rows.append((i, "g", f"2024-01-{(i % 20) + 1:02d} 02:00:00", 10.0 + (i % 3)))
        rows.append((100 + i, "g", f"2024-01-{(i % 20) + 1:02d} 14:00:00", 1000.0 + (i % 3)))
    rows.append((900, "g", "2024-01-21 14:00:00", 1003.0))  # busy-normal
    rows.append((901, "g", "2024-01-21 02:00:00", 1000.0))  # quiet-EXTREME
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    flagged = {r.id for r in ts_ops.seasonal_outliers(df).collect()}
    assert 901 in flagged and 900 not in flagged

    with pytest.raises(ValueError, match="season must be one of"):
        ts_ops.seasonal_outliers(df, season="minute")


def test_rollup_time_buckets_okey_guard_fails_fast(spark):
    """ADVICE r9: an id >= _OKEY_BASE (or NULL) would bleed into the
    seconds field of the packed open/close order key and silently
    reorder open/close — undetectable by the oracle, which packs the
    same key. The contract is now enforced in the SAME aggregation
    pass (a when/raise_error branch on the key expression — no extra
    validation scan), so oversized and NULL ids fail loudly."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import timeseries as ts_ops
    from pg_parquet_spark.session import table

    events = table(spark, "/root/testdata/sf0.001", "events")
    big = events.withColumn(
        "event_id", F.col("event_id") + F.lit(ts_ops._OKEY_BASE)
    )
    with pytest.raises(Exception, match="rollup_time_buckets"):
        ts_ops.rollup_time_buckets(big).collect()
    nulled = events.withColumn(
        "event_id",
        F.when(F.col("event_id") % 97 == 0, F.lit(None)).otherwise(
            F.col("event_id")
        ),
    )
    with pytest.raises(Exception, match="rollup_time_buckets"):
        ts_ops.rollup_time_buckets(nulled).collect()
    # in-range ids still aggregate (the guard is free on the good path)
    assert ts_ops.rollup_time_buckets(events, 86400).count() > 0


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_bigram_logprob_matches_duckdb_oracle(spark, sf):
    """Bigram LM scoring (r10): summed and mean negative log
    probabilities replicate bit-exactly (per-gram micro-nat
    quantization before the per-doc fold, SQL-derived V)."""
    import duckdb

    from pg_parquet_spark.operators import text as text_ops
    from pg_parquet_spark.session import table

    docs = table(spark, sf, "documents")
    got = text_ops.bigram_logprob(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(text_ops.bigram_oracle_sql()).df()
    assert len(got) == len(want) > 0
    for col in ("doc_id", "n_bigrams", "nll_micro", "mean_nll_micro"):
        assert list(got[col]) == list(want[col]), col
    assert (got["nll_micro"] >= 0).all()  # p <= 1 by construction


def test_bigram_logprob_flags_shuffled_sequences(spark):
    """The design claim vs the unigram tier: a document whose WORDS are
    all common but whose SEQUENCES never occur in the corpus scores
    worse (higher mean NLL) than a natural document built from the
    corpus's actual phrases."""
    from pg_parquet_spark.operators import text as text_ops

    base = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows = base + [
        (100, "the quick brown fox jumps over the lazy dog"),  # natural
        (101, "dog the over quick lazy jumps fox brown the"),  # shuffled
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.mean_nll_micro
        for r in text_ops.bigram_logprob(df).collect()
    }
    assert got[101] > got[100]
    # single-token docs have no bigrams and drop out
    one = spark.createDataFrame(
        [(1, "hello"), (2, "a b")], "doc_id long, text string"
    )
    assert [r.doc_id for r in text_ops.bigram_logprob(one).collect()] == [2]


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_interpolate_gaps_matches_oracle(spark, sf):
    """Linear-interpolation gap fill (r10): the full spine (known days,
    interpolated gaps, boundary carries) replicates bit-exactly —
    integer milli totals, positive-weight integer interpolation."""
    import duckdb

    from pg_parquet_spark.operators import timeseries as ts_ops
    from pg_parquet_spark.session import table

    ev = table(spark, sf, "events").filter("event_id % 37 = 0")
    got = ts_ops.interpolate_gaps(ev).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(
        ts_ops.interpolate_oracle_sql(where="event_id % 37 = 0")
    ).df()
    assert len(got) == len(want) > 0
    for c in ("event_type", "filled_milli", "is_gap"):
        assert list(got[c]) == list(want[c]), c
    assert list(got["day"]) == [d.date() if hasattr(d, "date") else d for d in want["day"]]
    assert got["is_gap"].any()  # the sparse filter produced real gaps


def test_interpolate_gaps_straight_line_and_contracts(spark):
    """A two-point series (10 on day 0, 40 on day 3) interpolates to
    exactly 20, 30 on the gap days; negative totals fail fast."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import timeseries as ts_ops

    df = spark.createDataFrame(
        [
            (1, "g", "2024-01-01 00:00:00", 10.0),
            (2, "g", "2024-01-04 00:00:00", 40.0),
        ],
        "event_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ts_ops.interpolate_gaps(df).toPandas()
    assert list(out["filled_milli"]) == [10000, 20000, 30000, 40000]
    assert list(out["is_gap"]) == [False, True, True, False]

    neg = df.withColumn("value", F.col("value") - 100)
    with pytest.raises(Exception, match="interpolate_gaps"):
        ts_ops.interpolate_gaps(neg).collect()


def test_strip_html_known_cases(spark):
    """HTML extraction (r10): script/style payloads dropped entirely,
    comments and tags become word boundaries, entities decode once
    (&amp;lt; stays a literal '&lt;'), whitespace collapses."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import text as text_ops

    cases = [
        (1, "<html><body><p>Hello <b>world</b></p></body></html>", "Hello world"),
        (2, "<script>var x = '<p>evil</p>';</script>keep", "keep"),
        (3, "<style>p { color: red }</style>text", "text"),
        (4, "<!-- note -->a<!-- more\n lines -->b", "a b"),
        (5, "fish &amp; chips &lt;tag&gt; &quot;q&quot; &#39;s&#39;", "fish & chips <tag> \"q\" 's'"),
        (6, "a&amp;lt;b", "a&lt;b"),
        (7, "  spaced   <br/>   out  ", "spaced out"),
        (8, "no markup at all", "no markup at all"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in cases], "id long, html string"
    )
    got = {
        r.id: r.clean
        for r in df.select(
            "id", text_ops.strip_html(F.col("html")).alias("clean")
        ).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i])


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_strip_html_matches_duckdb_rendering(spark, sf):
    """The Spark and DuckDB renderings of the shared pattern chain
    produce IDENTICAL text over the whole corpus wrapped in markup —
    regex dialects stay inside the common subset."""
    import duckdb

    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import text as text_ops
    from pg_parquet_spark.session import table

    docs = table(spark, sf, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><style>x{}</style></head><body><p>"),
            F.col("text"),
            F.lit("</p><!-- c --></body></html>"),
        ).alias("html"),
    )
    got = (
        wrapped.select(
            "doc_id", text_ops.strip_html(F.col("html")).alias("clean")
        )
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    inner = (
        "'<html><head><style>x{}</style></head><body><p>' || text || "
        "'</p><!-- c --></body></html>'"
    )
    want = con.execute(
        f"SELECT doc_id, {text_ops.strip_html_sql(inner)} AS clean "
        "FROM documents ORDER BY doc_id"
    ).df()
    assert list(got["clean"]) == list(want["clean"])


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_ngram_novelty_matches_oracle(spark, sf):
    """Bigram novelty vs a reference corpus (r10): exact ppm table
    replicates bit-exactly (distinct-gram semantics both sides)."""
    import duckdb

    from pg_parquet_spark.operators import text as text_ops
    from pg_parquet_spark.session import table

    docs = table(spark, sf, "documents")
    got = text_ops.ngram_novelty(
        docs.filter("doc_id % 3 != 0"), docs.filter("doc_id % 3 = 0")
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        text_ops.novelty_oracle_sql("doc_id % 3 = 0", "doc_id % 3 != 0")
    ).df()
    assert len(got) == len(want) > 0
    for c in ("doc_id", "n_grams", "n_novel", "novelty_ppm"):
        assert list(got[c]) == list(want[c]), c


def test_ngram_novelty_extremes(spark):
    """A verbatim copy of reference text scores 0 ppm; alien vocabulary
    scores 1e6; a half-stitched doc lands in between."""
    from pg_parquet_spark.operators import text as text_ops

    ref = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # verbatim
            (2, "qq ww ee rr tt yy"),                     # alien
            (3, "alpha beta gamma qq ww ee"),             # stitched
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.novelty_ppm for r in text_ops.ngram_novelty(docs, ref).collect()}
    assert got[1] == 0
    assert got[2] == 1_000_000
    assert 0 < got[3] < 1_000_000


def test_strip_html_property_plain_text_fixed_point(spark):
    """Hypothesis property: for markup-free text (no <, >, &), strip_html
    is exactly whitespace normalization — content is never altered."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import text as text_ops

    alphabet = st.sampled_from(list("abcdefghij XYZ.,!?'\"0123456789\t\n"))

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.text(alphabet, min_size=0, max_size=40), min_size=1, max_size=5))
    def check(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "id long, t string")
        got = {
            r.id: r.c
            for r in df.select(
                "id", text_ops.strip_html(F.col("t")).alias("c")
            ).collect()
        }
        for i, t in rows:
            assert got[i] == " ".join(t.split()), repr(t)

    check()


def test_interpolate_gaps_all_null_day_is_gap(spark):
    """ADVICE r10: a day whose values are ALL NULL must flow as a GAP
    (the oracle's semantics) instead of tripping the negative-total
    guard via NULL >= 0; genuinely negative day totals still fail
    fast with the parity message."""
    import pytest as _pytest

    from pg_parquet_spark.operators import timeseries as ts_ops

    ev = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:00", 1.0),
            ("k", "2024-01-02 00:00:00", None),
            ("k", "2024-01-03 00:00:00", 3.0),
        ],
        "event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.day.isoformat(): r for r in ts_ops.interpolate_gaps(ev).collect()}
    assert out["2024-01-02"].is_gap is True
    assert out["2024-01-02"].filled_milli == 2000  # (1000+3000) div 2
    assert out["2024-01-01"].filled_milli == 1000

    neg = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", -1.0)],
        "event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    with _pytest.raises(Exception, match="negative day totals"):
        ts_ops.interpolate_gaps(neg).collect()


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_perplexity_datamap_matches_oracle(spark, sf):
    """r11: the equi-depth bigram-difficulty datamap replicates the
    chained oracle bit-exactly (binary-fraction percentile edges), the
    bins partition the corpus, and depths are near-equal."""
    import duckdb
    import pytest as _pytest

    from pg_parquet_spark.operators import text as text_ops
    from pg_parquet_spark.session import table as _table

    docs = _table(spark, sf, "documents").select("doc_id", "text")
    got = text_ops.perplexity_datamap(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(text_ops.perplexity_datamap_oracle_sql()).df()
    assert len(got) == len(want) == 8
    for c in ("bin", "n_docs", "min_nll_micro", "max_nll_micro", "total_bigrams"):
        assert list(got[c]) == list(want[c]), c
    n = int(got["n_docs"].sum())
    assert n == docs.count()  # a partition of the corpus
    assert got["n_docs"].max() - got["n_docs"].min() <= n // 4  # equi-ish

    with _pytest.raises(ValueError, match="power of two"):
        text_ops.perplexity_datamap(docs, n_bins=10)


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_charclass_features_match_oracle(spark, sf):
    """r11: the character-class profile replicates bit-exactly —
    translate/length arithmetic and integer division only."""
    import duckdb

    from pg_parquet_spark.operators import text as text_ops
    from pg_parquet_spark.session import table as _table

    docs = _table(spark, sf, "documents").select("doc_id", "text")
    got = text_ops.charclass_features(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(text_ops.charclass_oracle_sql()).df()
    assert len(got) == len(want) == docs.count()
    for c in ("doc_id", "n_chars", "symbol_ppm", "digit_ppm", "upper_ppm", "code_like"):
        assert list(got[c]) == list(want[c]), c


def test_charclass_separates_code_from_prose(spark):
    """The detector's design property: a code snippet crosses the
    code_like threshold, prose and empty docs do not."""
    from pg_parquet_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "def f(x): return {'k': [x << 2 for x in range(10)]};"),
            (2, "the quiet afternoon settled over the valley in amber light"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text_ops.charclass_features(df).collect()}
    assert out[1].code_like is True
    assert out[2].code_like is False
    assert out[3].code_like is False and out[3].symbol_ppm == 0


def test_bm25_persisted_index_lifecycle(spark, tmp_path):
    """r13: the persisted BM25 index family — build from half the
    corpus, MERGE the other half in, and the search equals the direct
    bm25_scores over the FULL corpus bit-for-bit (the incremental-index
    oracle pattern); replayed upserts are idempotent; the stats sidecar
    self-heals across its crash window; the term filter PRUNES bucket
    partitions at listing time."""
    import os

    import duckdb

    from pg_parquet_spark.operators import text

    terms = ["spark", "vector", "scan"]
    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents").select("doc_id", "text")
    root = str(tmp_path / "bm25_index")
    text.build_bm25_index(docs.filter("doc_id % 2 = 0"), root)
    text.bm25_index_upsert(spark, docs.filter("doc_id % 2 = 1"), root)

    got = text.bm25_index_topk(spark, root, terms).toPandas()
    direct = text.bm25_scores(docs, terms).toPandas()
    assert got.values.tolist() == direct.values.tolist()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(text.bm25_oracle_sql(terms)).df()
    assert len(got) == len(want) > 0
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score_micro) == list(want.score_micro)

    # replayed upsert: identical rows re-land, result unchanged
    text.bm25_index_upsert(spark, docs.filter("doc_id % 2 = 1"), root)
    again = text.bm25_index_topk(spark, root, terms).toPandas()
    assert again.values.tolist() == got.values.tolist()

    # stats crash window: drop the sidecar — the read path recomputes
    os.remove(os.path.join(root, "_bm25_stats.json"))
    healed = text.bm25_index_topk(spark, root, terms).toPandas()
    assert healed.values.tolist() == got.values.tolist()
    assert os.path.exists(os.path.join(root, "_bm25_stats.json"))

    # pruning evidence: the versioned resolver re-attaches the bucket
    # as a typed literal per partition branch, so the bucket filter
    # constant-folds non-matching branches out of the LOGICAL plan —
    # inputFiles() therefore lists only the query's buckets (this is
    # resolver-level branch removal, not Catalyst hive pruning, so
    # inputFiles IS authoritative here, unlike the plain-hive caveat)
    import re as _re

    q = text.bm25_index_topk(spark, root, terms)
    scanned = {
        int(_re.search(r"bucket=(\d+)", f).group(1))
        for f in q.inputFiles()
        if "bucket=" in f
    }
    want_buckets = {text._term_bucket_py(t) for t in terms}
    assert len(want_buckets) < text.BM25_INDEX_BUCKETS  # real pruning
    assert scanned and scanned <= want_buckets, (scanned, want_buckets)

    # empty query contract
    with pytest.raises(ValueError, match="query term"):
        text.bm25_index_topk(spark, root, [])

    # bucket-count contract (r15, ADVICE r14): an index whose persisted
    # bucket count disagrees with BM25_INDEX_BUCKETS must refuse the
    # upsert — the skipped stability check is only sound per constant
    import json as _json

    sp = os.path.join(root, "_bm25_stats.json")
    st = _json.loads(open(sp).read())
    st["buckets"] = text.BM25_INDEX_BUCKETS + 1
    open(sp, "w").write(_json.dumps(st))
    with pytest.raises(ValueError, match="term buckets"):
        text.bm25_index_upsert(spark, docs.filter("doc_id % 2 = 1"), root)
    st["buckets"] = text.BM25_INDEX_BUCKETS
    open(sp, "w").write(_json.dumps(st))


def test_funnel_steps_matches_oracle(spark):
    """r13: the strict ordered funnel (per-step min-completion chain)
    replicates the unrolled-CTE oracle bit-for-bit at both SFs."""
    import duckdb

    from pg_parquet_spark.operators import timeseries

    steps = ["view", "click", "purchase"]
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        got = timeseries.funnel_steps(ev, steps).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        want = con.execute(timeseries.funnel_oracle_sql(steps)).df()
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (sf, c)
        assert got.users.is_monotonic_decreasing
        assert got.conversion_ppm.iloc[0] == 1_000_000


def test_funnel_steps_semantics(spark):
    """Planted fixture: order matters — a user who purchases BEFORE
    ever viewing does not convert; one who follows the order does;
    same-timestamp progression counts (>= contract); bad steps
    raise."""
    import datetime as dt

    import pytest as _pytest

    from pg_parquet_spark.operators import timeseries

    t0 = dt.datetime(2026, 1, 1)

    def r(u, t, off):
        return (u, t, t0 + dt.timedelta(minutes=off))

    rows = [
        r(1, "view", 0), r(1, "click", 5), r(1, "purchase", 9),  # full
        r(2, "purchase", 0), r(2, "view", 5),                    # wrong order
        r(3, "view", 0), r(3, "click", 0),                       # same-ts ok
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {
        r.step: r
        for r in timeseries.funnel_steps(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    assert out[1].users == 3            # users 1, 2, 3 all viewed
    assert out[2].users == 2            # users 1 and 3 clicked after view
    assert out[3].users == 1            # only user 1 purchased in order
    assert out[3].conversion_ppm == 1_000_000 // 3
    with _pytest.raises(ValueError, match="2 steps"):
        timeseries.funnel_steps(ev, ["view"])
    with _pytest.raises(ValueError, match="duplicate"):
        timeseries.funnel_steps(ev, ["view", "view"])


def test_bm25_index_staleness_semantics(spark, tmp_path):
    """r14 planted fixture: df-distribution PSI over the persisted
    BM25 index's frozen top-K vocabulary + <oov> bucket. A
    same-distribution small batch is NOT stale; an all-new-vocabulary
    batch fires the PSI cut with <oov> as the worst term; an
    identically-distributed batch as large as the index fires the
    growth trigger with psi == 0; empty index and bad top_k raise."""
    import pytest as _pytest

    from pg_parquet_spark.operators import text

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha gamma"),
            (3, "alpha beta"),
            (4, "alpha delta"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25_stale_idx")
    text.build_bm25_index(docs, idx)  # df: alpha 4, beta 2, gamma/delta 1

    # same-shaped small batch: psi under the 0.25 cut, growth 2e6/8 < 0.5
    same = spark.createDataFrame([(9, "alpha beta")], "doc_id long, text string")
    rep = text.bm25_index_staleness(spark, idx, same, top_k=2).collect()[0]
    assert rep.n_index == 8 and rep.n_new == 2
    assert rep.growth_ppm == 250_000
    assert rep.psi_pico < 250_000_000_000 and rep.stale is False

    # drifted batch: every token lands in <oov> -> PSI fires even with
    # the growth trigger disabled; the worst category is <oov>
    drift = spark.createDataFrame(
        [(9, "zeta eta"), (10, "zeta eta"), (11, "zeta eta")],
        "doc_id long, text string",
    )
    rep2 = text.bm25_index_staleness(
        spark, idx, drift, top_k=2, growth_ppm_threshold=10_000_000
    ).collect()[0]
    assert rep2.psi_pico > 250_000_000_000 and rep2.stale is True
    assert rep2.worst_term == "<oov>"
    assert rep2.psi_pico > rep.psi_pico

    # growth-only trigger: an identically-distributed batch the size
    # of the index has psi == 0 but growth_ppm == 1e6 > the 0.5 cut
    rep3 = text.bm25_index_staleness(spark, idx, docs, top_k=2).collect()[0]
    assert rep3.psi_pico == 0 and rep3.growth_ppm == 1_000_000
    assert rep3.stale is True

    with _pytest.raises(ValueError, match="top_k must be"):
        text.bm25_index_staleness(spark, idx, same, top_k=0)
    # an empty BUILD already fails loudly (the stats derivation reads
    # zero postings) — there is no silent empty index to go stale on
    empty_idx = str(tmp_path / "bm25_empty_idx")
    with _pytest.raises(Exception):
        text.build_bm25_index(docs.filter("doc_id < 0"), empty_idx)


def test_bm25_managed_generations_lifecycle(spark, tmp_path, monkeypatch):
    """r14 managed-index drill (the lexical reindex_on_drift): fresh
    batch → versioned (doc, term) upsert, same generation; drifted
    batch → TEXT-FREE rebuild under gen_{n+1} (postings are complete
    state) + atomic pointer flip — and the rebuild REPLACES changed
    docs whole, repairing the upsert path's documented SCD-1
    limitation; a crash between generation build and pointer flip
    serves the old generation consistently and the replay converges."""
    import pytest as _pytest

    from pg_parquet_spark.operators import text

    base = spark.createDataFrame(
        [
            (i, "alpha beta " + ("gamma" if i % 2 else "delta"))
            for i in range(10)
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "managed_bm25")
    assert text.init_bm25_index(spark, root, base) == 1
    with _pytest.raises(ValueError, match="already exists"):
        text.init_bm25_index(spark, root, base)

    # fresh in-vocabulary batch -> upsert, generation unchanged, and
    # the managed search equals the direct scorer over the full corpus
    fresh = spark.createDataFrame(
        [(100, "alpha beta"), (101, "beta gamma")],
        "doc_id long, text string",
    )
    rep = text.bm25_reindex_on_drift(spark, root, fresh).collect()[0]
    assert rep.action == "upsert" and not rep.stale
    assert rep.generation_before == 1 and rep.generation_after == 1
    q = ["alpha", "gamma"]
    got = text.bm25_managed_topk(spark, root, q).toPandas()
    want = text.bm25_scores(base.unionByName(fresh), q).toPandas()
    assert len(got) == len(want)
    for col in want.columns:
        assert list(got[col]) == list(want[col]), col

    # drifted batch (all-new vocabulary fires the PSI cut) that ALSO
    # rewrites doc 0 ("alpha beta delta" -> "zeta eta theta")
    drift = spark.createDataFrame(
        [(0, "zeta eta theta")] + [(200 + i, "zeta eta") for i in range(4)],
        "doc_id long, text string",
    )
    rep2 = text.bm25_reindex_on_drift(spark, root, drift).collect()[0]
    assert rep2.action == "rebuild" and rep2.stale
    assert rep2.psi_pico > 250_000_000_000
    assert rep2.generation_after == 2
    m = text.resolve_bm25_index(root)
    assert m["generation"] == 2 and m["path"] == "gen_2"
    # doc 0's OLD postings are GONE (the thing upsert cannot do):
    hits = text.bm25_managed_topk(spark, root, ["alpha"]).toPandas()
    assert 0 not in set(hits.doc_id)
    # and the whole generation equals the direct scorer over the
    # corpus WITH doc 0 replaced
    replaced = (
        base.filter("doc_id != 0").unionByName(fresh).unionByName(drift)
    )
    q2 = ["alpha", "gamma", "zeta"]
    got2 = text.bm25_managed_topk(spark, root, q2).toPandas()
    want2 = text.bm25_scores(replaced, q2).toPandas()
    assert len(got2) == len(want2)
    for col in want2.columns:
        assert list(got2[col]) == list(want2[col]), col

    # crash drill: die between generation build and pointer flip
    real_publish = text._bm25_manifest_publish

    def _crash(*a, **k):
        raise RuntimeError("simulated crash before pointer flip")

    monkeypatch.setattr(text, "_bm25_manifest_publish", _crash)
    more_drift = spark.createDataFrame(
        [(300 + i, "omega psi") for i in range(4)],
        "doc_id long, text string",
    )
    with _pytest.raises(RuntimeError, match="simulated crash"):
        text.bm25_reindex_on_drift(spark, root, more_drift)
    # pointer still serves generation 2, consistently
    assert text.resolve_bm25_index(root)["generation"] == 2
    # replay converges: the same call completes the flip to gen 3
    monkeypatch.setattr(text, "_bm25_manifest_publish", real_publish)
    rep3 = text.bm25_reindex_on_drift(spark, root, more_drift).collect()[0]
    assert rep3.action == "rebuild" and rep3.generation_after == 3
    assert text.resolve_bm25_index(root)["generation"] == 3
    with _pytest.raises(ValueError, match="no managed BM25 index"):
        text.resolve_bm25_index(str(tmp_path / "nope"))


def test_product_analytics_trio_matches_oracle(spark):
    """r14 continuation: cohort retention and touch attribution
    (both modes) replicate their DuckDB oracles
    bit-for-bit at both SFs."""
    import duckdb

    from pg_parquet_spark.operators import timeseries

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        cases = [
            (timeseries.retention_cohorts(ev), timeseries.retention_oracle_sql()),
            (
                timeseries.retention_cohorts(ev, period_sec=86400),
                timeseries.retention_oracle_sql(period_sec=86400),
            ),
            (timeseries.attribution_report(ev), timeseries.attribution_oracle_sql()),
            (
                timeseries.attribution_report(ev, mode="first"),
                timeseries.attribution_oracle_sql(mode="first"),
            ),
        ]
        for i, (q, sql) in enumerate(cases):
            got = q.toPandas()
            want = con.execute(sql).df()
            assert len(got) == len(want) > 0, (sf, i)
            for c in got.columns:
                assert list(got[c]) == list(want[c]), (sf, i, c)


def test_retention_cohorts_semantics(spark):
    """Planted fixture: cohorting is by FIRST event; age-0 retention is
    exactly 1e6; a user active in a later period lands in their own
    cohort's age cell, not the later cohort; NULL users drop."""
    import datetime as dt

    from pg_parquet_spark.operators import timeseries

    t0 = dt.datetime(2026, 1, 5)  # period math is epoch-based
    week = dt.timedelta(days=7)
    rows = [
        (1, t0), (1, t0 + week), (1, t0 + 2 * week),  # cohort w0, ages 0-2
        (2, t0), (2, t0 + 2 * week),                   # cohort w0, skips w1
        (3, t0 + week),                                # cohort w1 only
        (None, t0),                                    # dropped
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_epoch, r.age): r
        for r in timeseries.retention_cohorts(ev).collect()
    }
    es0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    c0 = es0 - es0 % (7 * 86400)
    c1 = c0 + 7 * 86400
    assert out[(c0, 0)].users == 2
    assert out[(c0, 0)].retention_ppm == 1_000_000
    assert out[(c0, 1)].users == 1          # only user 1 active in w1
    assert out[(c0, 1)].retention_ppm == 500_000
    assert out[(c0, 2)].users == 2          # users 1 and 2
    assert out[(c1, 0)].users == 1          # user 3's own cohort
    assert (c1, 1) not in out
    with pytest.raises(ValueError, match="positive"):
        timeseries.retention_cohorts(ev, period_sec=0)


def test_attribution_report_semantics(spark):
    """Planted fixture: last-touch credits the most recent touch
    strictly before the conversion, first-touch the earliest; a
    conversion with no prior touch is 'direct'; a touch AFTER the
    conversion never counts; bad configs raise."""
    import datetime as dt

    from pg_parquet_spark.operators import timeseries

    t0 = dt.datetime(2026, 1, 1)

    def r(i, u, t, off):
        return (i, u, t, t0 + dt.timedelta(minutes=off))

    rows = [
        # user 1: view -> click -> purchase  (last=click, first=view)
        r(1, 1, "view", 0), r(2, 1, "click", 5), r(3, 1, "purchase", 9),
        # user 2: purchase first (direct), view afterwards is ignored
        r(4, 2, "purchase", 0), r(5, 2, "view", 5),
        # user 3: click then purchase at the SAME ts: id order => before
        r(6, 3, "click", 0), r(7, 3, "purchase", 0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    last = {
        x.channel: x for x in timeseries.attribution_report(ev).collect()
    }
    assert last["click"].conversions == 2      # users 1 and 3
    assert last["direct"].conversions == 1     # user 2
    assert "view" not in last
    assert last["click"].share_ppm == 2 * 1_000_000 // 3
    first = {
        x.channel: x
        for x in timeseries.attribution_report(ev, mode="first").collect()
    }
    assert first["view"].conversions == 1      # user 1's first touch
    assert first["click"].conversions == 1     # user 3
    assert first["direct"].conversions == 1
    with pytest.raises(ValueError, match="non-empty"):
        timeseries.attribution_report(ev, touch_types=[])
    with pytest.raises(ValueError, match="cannot also"):
        timeseries.attribution_report(
            ev, conversion_type="view", touch_types=["view"]
        )
    with pytest.raises(ValueError, match="first"):
        timeseries.attribution_report(ev, mode="bogus")


def test_rfm_and_changepoints_match_oracle(spark):
    """r14 continuation: RFM quartile segmentation and the two-sided
    moving-sum changepoint scan replicate their DuckDB oracles
    bit-for-bit at both SFs (changepoints at two window widths)."""
    import duckdb

    from pg_parquet_spark.operators import timeseries

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        cases = [
            (timeseries.rfm_segments(ev), timeseries.rfm_oracle_sql()),
            (
                timeseries.mean_shift_changepoints(ev),
                timeseries.changepoint_oracle_sql(),
            ),
            (
                timeseries.mean_shift_changepoints(ev, window_days=7, top_k=3),
                timeseries.changepoint_oracle_sql(window_days=7, top_k=3),
            ),
        ]
        for i, (q, sql) in enumerate(cases):
            got = q.toPandas()
            want = con.execute(sql).df()
            assert len(got) == len(want) > 0, (sf, i)
            for c in got.columns:
                g, w = list(got[c]), list(want[c])
                if c == "day":
                    g = [str(x)[:10] for x in g]
                    w = [str(x)[:10] for x in w]
                assert g == w, (sf, i, c)


def test_rfm_segments_semantics(spark):
    """Planted fixture: quartile scoring is exact — with users at
    metric values 1..4 each dimension splits into four bands; recency
    is inverted (the most RECENT user earns r_score 4); monetary is
    NULL-safe; the segment table aggregates users."""
    import datetime as dt

    from pg_parquet_spark.operators import timeseries

    t0 = dt.datetime(2026, 1, 10)
    rows = []
    # user u has u events, each value u; last event u-1 days before t0
    for u in (1, 2, 3, 4):
        for i in range(u):
            rows.append((u, t0 - dt.timedelta(days=u - 1, minutes=i + 1), float(u)))
    # user 5: NULL values only -> monetary 0
    rows.append((5, t0 - dt.timedelta(days=10), None))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    segs = timeseries.rfm_segments(ev).collect()
    by_seg = {(r.r_score, r.f_score, r.m_score): r for r in segs}
    assert sum(r.users for r in segs) == 5
    # user 4: most events, highest spend, 3 days stale; user 1: 1 event,
    # most recent. Quartiles over {0,1,2,3,10} recency and {1,2,3,4,0}
    # frequency/monetary place the extremes in opposite bands.
    top_m = max(r.m_score for r in segs)
    low_m = min(r.m_score for r in segs)
    assert top_m == 4 and low_m == 1
    # monetary: user 4 contributed 4 events x 4.0 = 16_000 millis
    assert any(r.monetary_milli == 16_000 for r in segs)
    # the NULL-value user lands with monetary 0, not NULL
    assert all(r.monetary_milli is not None for r in segs)
    assert by_seg  # table non-degenerate


def test_mean_shift_changepoints_semantics(spark):
    """Planted fixture: a step series (w days at level a, then level b)
    peaks exactly at the step day with delta = w*(b-a) millis; edge
    days without a full two-sided window are never scored; zero-filled
    missing days count as genuine zeros; bad params raise."""
    import datetime as dt

    from pg_parquet_spark.operators import timeseries

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # key "s": 6 days at 1.0, then 6 days at 5.0 (one event per day)
    for i in range(12):
        v = 1.0 if i < 6 else 5.0
        rows.append((i, "s", t0 + dt.timedelta(days=i), v))
    # key "z": day 0 and day 8 only -> days 1-7 are zero-filled
    rows.append((100, "z", t0, 9.0))
    rows.append((101, "z", t0 + dt.timedelta(days=8), 9.0))
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    out = timeseries.mean_shift_changepoints(
        ev, window_days=3, top_k=2
    ).collect()
    s_rows = [r for r in out if r.event_type == "s"]
    # peak at the first high day (2026-01-07): next = 3*5000, prev = 3*1000
    assert s_rows[0].rank == 1
    assert str(s_rows[0].day) == "2026-01-07"
    assert s_rows[0].delta_milli == 3 * 5000 - 3 * 1000
    # all scored days have full windows: days 0-2 and 10-11 excluded
    days = {str(r.day) for r in out if r.event_type == "s"}
    assert "2026-01-01" not in days and "2026-01-12" not in days
    # zero-filled key: the boundary spikes score against true zeros —
    # day 3 sees 9000 leaving the prev window (delta −9000); without
    # zero-fill the key would have no full windows at all
    z_rows = [r for r in out if r.event_type == "z"]
    assert z_rows and abs(z_rows[0].delta_milli) == 9000
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window_days"):
        timeseries.mean_shift_changepoints(ev, window_days=0)
    with _pytest.raises(ValueError, match="top_k"):
        timeseries.mean_shift_changepoints(ev, top_k=0)


def test_active_users_matches_bruteforce_oracle(spark):
    """r14: the interval-delta rolling-active-users decomposition
    equals the quadratic day-range COUNT(DISTINCT) oracle at both SFs
    and three window widths — the completeness proof for the
    counted-exactly-once claim."""
    import duckdb

    from pg_parquet_spark.operators import timeseries

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        for w in (1, 7, 28):
            got = timeseries.active_users(ev, window_days=w).toPandas()
            want = con.execute(
                timeseries.active_users_oracle_sql(window_days=w)
            ).df()
            assert len(got) == len(want) > 0, (sf, w)
            assert [str(d)[:10] for d in got.day] == [
                str(d)[:10] for d in want.day
            ], (sf, w)
            assert list(got.active_users) == list(want.active_users), (sf, w)


def test_active_users_semantics(spark):
    """Planted fixture: a user active on days 0 and 10 with w=7 counts
    on days 0-6 and 10 only (the gap closes the interval); two events
    on the SAME day count once; zero-activity days report 0; DAU (w=1)
    equals the per-day distinct count."""
    import datetime as dt

    from pg_parquet_spark.operators import timeseries

    t0 = dt.datetime(2026, 1, 1, 12)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(hours=3)),      # same day, once
        (1, t0 + dt.timedelta(days=10)),
        (2, t0 + dt.timedelta(days=2)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        str(r.day)[:10]: r.active_users
        for r in timeseries.active_users(ev, window_days=7).collect()
    }
    assert len(out) == 11                      # full spine, days 0..10
    assert out["2026-01-01"] == 1              # user 1
    assert out["2026-01-03"] == 2              # users 1 and 2
    assert out["2026-01-07"] == 2              # user 1 day-0 still in [1..7]
    assert out["2026-01-08"] == 1              # user 1 aged out; user 2 in
    assert out["2026-01-09"] == 1              # user 2's Jan 3 still in [3..9]
    assert out["2026-01-10"] == 0              # gap: nobody active in window
    assert out["2026-01-11"] == 1              # user 1 returns
    dau = {
        str(r.day)[:10]: r.active_users
        for r in timeseries.active_users(ev, window_days=1).collect()
    }
    assert dau["2026-01-01"] == 1 and dau["2026-01-02"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window_days"):
        timeseries.active_users(ev, window_days=0)


def test_funnel_latency_matches_oracle(spark):
    """r14: the funnel step-latency report (median seconds from the
    previous step and from entry, med x2 integers) replicates the
    unrolled-CTE oracle bit-for-bit at both SFs."""
    import duckdb

    from pg_parquet_spark.operators import timeseries

    steps = ["view", "click", "purchase"]
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        got = timeseries.funnel_latency(ev, steps).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        want = con.execute(timeseries.funnel_latency_oracle_sql(steps)).df()
        assert len(got) == len(want) == 2, sf
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (sf, c)
    timeseries.release_cached()


def test_funnel_latency_semantics(spark):
    """Planted fixture: known step gaps produce exact medians (x2
    integers, odd/even user counts both exercised); a step nobody
    reaches reports (0, NULL, NULL); validation raises."""
    import datetime as dt

    from pg_parquet_spark.operators import timeseries

    t0 = dt.datetime(2026, 1, 1)

    def r(u, t, off_min):
        return (u, t, t0 + dt.timedelta(minutes=off_min))

    rows = [
        # user 1: view@0 -> click@10 -> purchase@30  (step 600s, total 1800s)
        r(1, "view", 0), r(1, "click", 10), r(1, "purchase", 30),
        # user 2: view@0 -> click@20              (step 1200s)
        r(2, "view", 0), r(2, "click", 20),
        # user 3: view@0 only
        r(3, "view", 0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {
        r.step: r
        for r in timeseries.funnel_latency(
            ev, ["view", "click", "purchase", "signup"]
        ).collect()
    }
    assert out[2].users == 2
    # median of {600, 1200} = 900 -> x2 = 1800
    assert out[2].med_step_sec2 == 1800
    assert out[2].med_total_sec2 == 1800
    assert out[3].users == 1
    assert out[3].med_step_sec2 == 2 * 1200   # 30m - 10m
    assert out[3].med_total_sec2 == 2 * 1800  # 30m - 0
    assert out[4].users == 0
    assert out[4].med_step_sec2 is None and out[4].med_total_sec2 is None
    timeseries.release_cached()
    with pytest.raises(ValueError, match="2 steps"):
        timeseries.funnel_latency(ev, ["view"])
    with pytest.raises(ValueError, match="duplicate"):
        timeseries.funnel_latency(ev, ["view", "view"])


def test_trend_slopes_matches_oracle(spark):
    """r14: per-key OLS trend slopes replicate the DuckDB oracle
    bit-for-bit at both SFs."""
    import duckdb

    from pg_parquet_spark.operators import timeseries

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        got = timeseries.trend_slopes(ev).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        want = con.execute(timeseries.trend_slopes_oracle_sql()).df()
        assert len(got) == len(want) > 0, sf
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (sf, c)


def test_trend_slopes_semantics(spark):
    """Planted fixture: a perfectly linear daily series recovers its
    exact slope; a flat series reports 0; a single-day key reports
    NULL; multiple same-day events fold into one daily total."""
    import datetime as dt

    from pg_parquet_spark.operators import timeseries

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # key "up": daily total = 2.0 * day_index  (slope 2000 milli/day)
    for i in range(5):
        rows.append(("up", t0 + dt.timedelta(days=i), 2.0 * i))
    # key "flat": constant 3.0/day, two events of 1.5 each
    for i in range(4):
        rows.append(("flat", t0 + dt.timedelta(days=i), 1.5))
        rows.append(("flat", t0 + dt.timedelta(days=i, hours=2), 1.5))
    rows.append(("one", t0, 9.0))
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r.event_type: r for r in timeseries.trend_slopes(ev).collect()}
    assert out["up"].n_days == 5
    assert out["up"].slope_milli_per_day_micro == 2000 * 1_000_000
    assert out["flat"].slope_milli_per_day_micro == 0
    assert out["one"].n_days == 1
    assert out["one"].slope_milli_per_day_micro is None


def test_entry_paths_and_gini_match_oracle(spark):
    """r14: onboarding entry paths (two depths) and the engagement
    Gini replicate their DuckDB oracles bit-for-bit at both SFs."""
    import duckdb

    from pg_parquet_spark.operators import timeseries

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        cases = [
            (timeseries.entry_paths(ev), timeseries.entry_paths_oracle_sql()),
            (
                timeseries.entry_paths(ev, depth=2, top_k=5),
                timeseries.entry_paths_oracle_sql(depth=2, top_k=5),
            ),
            (
                timeseries.engagement_gini(ev),
                timeseries.engagement_gini_oracle_sql(),
            ),
        ]
        for i, (q, sql) in enumerate(cases):
            got = q.toPandas()
            want = con.execute(sql).df()
            assert len(got) == len(want) > 0, (sf, i)
            for c in got.columns:
                assert list(got[c]) == list(want[c]), (sf, i, c)


def test_entry_paths_semantics(spark):
    """Planted fixture: paths follow the composite (ts, id) order,
    short histories contribute their prefix, ties rank alphabetically,
    share is against all path-holders."""
    import datetime as dt

    from pg_parquet_spark.operators import timeseries

    t0 = dt.datetime(2026, 1, 1)

    def r(i, u, t, off):
        return (i, u, t, t0 + dt.timedelta(minutes=off))

    rows = [
        r(1, 1, "view", 0), r(2, 1, "click", 1), r(3, 1, "purchase", 2),
        r(4, 1, "error", 3),                       # 4th event ignored
        r(5, 2, "view", 0), r(6, 2, "click", 1), r(7, 2, "purchase", 2),
        r(8, 3, "view", 0),                        # bounce: prefix path
        # user 4: same ts, id order decides view>click
        r(9, 4, "view", 0), r(10, 4, "click", 0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = timeseries.entry_paths(ev, depth=3, top_k=10).collect()
    by_path = {r.path: r for r in out}
    assert by_path["view>click>purchase"].users == 2
    assert by_path["view"].users == 1
    assert by_path["view>click"].users == 1
    assert out[0].path == "view>click>purchase"   # highest count first
    assert by_path["view>click>purchase"].share_ppm == 500_000
    import pytest as _pytest

    with _pytest.raises(ValueError, match="depth"):
        timeseries.entry_paths(ev, depth=0)


def test_engagement_gini_semantics(spark):
    """Planted fixture: perfectly equal activity gives Gini 0; extreme
    concentration approaches (n-1)/n; the stat is pure-integer (a
    known small case hand-computes exactly)."""
    from pg_parquet_spark.operators import timeseries

    equal = spark.createDataFrame(
        [(u, i) for u in range(1, 5) for i in range(3)],
        "user_id long, event_id long",
    )
    g = timeseries.engagement_gini(equal).collect()[0]
    assert g.n_users == 4 and g.n_events == 12 and g.gini_ppm == 0
    # counts {1, 1, 1, 9}: G = 2*(1*1+2*1+3*1+4*9)/(4*12) - 5/4 = 1/2
    skew_rows = [(1, 0)] + [(2, 1)] + [(3, 2)] + [(4, 10 + i) for i in range(9)]
    skew = spark.createDataFrame(skew_rows, "user_id long, event_id long")
    g2 = timeseries.engagement_gini(skew).collect()[0]
    assert g2.gini_ppm == 500_000


def test_cohort_ltv_matches_oracle(spark):
    """r14: cohort LTV curves (period / cumulative / per-user milli)
    replicate the DuckDB oracle bit-for-bit at both SFs and two
    period widths."""
    import duckdb

    from pg_parquet_spark.operators import timeseries

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        for period in (7 * 86400, 86400):
            got = timeseries.cohort_ltv(ev, period_sec=period).toPandas()
            want = con.execute(
                timeseries.cohort_ltv_oracle_sql(period_sec=period)
            ).df()
            assert len(got) == len(want) > 0, (sf, period)
            for c in got.columns:
                assert list(got[c]) == list(want[c]), (sf, period, c)


def test_cohort_ltv_semantics(spark):
    """Planted fixture: known per-period spends produce exact
    period/cumulative values; the per-user division uses the FULL
    cohort size even after users lapse; NULL values count as 0
    revenue (activity without spend)."""
    import datetime as dt

    from pg_parquet_spark.operators import timeseries

    t0 = dt.datetime(2026, 1, 5)
    wk = dt.timedelta(days=7)
    rows = [
        # cohort w0: users 1, 2 spend 10 and 20 in week 0
        (1, t0, 10.0), (2, t0, 20.0),
        # week 1: only user 1 returns, spends 5
        (1, t0 + wk, 5.0),
        # week 2: user 2 returns with a NULL-value event (no spend)
        (2, t0 + 2 * wk, None),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.age: r for r in timeseries.cohort_ltv(ev).collect()}
    assert out[0].period_milli == 30_000
    assert out[1].period_milli == 5_000
    assert out[2].period_milli == 0            # activity, no revenue
    assert out[2].cum_milli == 35_000
    # per-user divides by cohort size 2 at EVERY age (lapsed users dilute)
    assert out[1].cum_per_user_milli == 17_500
    assert out[2].cum_per_user_milli == 17_500


def test_ewma_anomaly_hand_computed_band(spark):
    """EWMA control band (r14): K=2/α=1/2 hand case — warmup NULLs,
    the exact integer forecast, a spike flags high, a zero-traffic
    period flags low (the zero-filled grid is what catches it)."""
    from pg_parquet_spark.operators import timeseries

    rows = []
    # period 4 is an INTERIOR gap — zero-filled by the dense grid
    # (the grid spans observed min..max, so a trailing silence is
    # out of frame by construction: there is no "after the data")
    counts = {0: 3, 1: 3, 2: 3, 3: 30, 5: 3}  # period -> events
    eid = 0
    for p, n in counts.items():
        for _ in range(n):
            rows.append((eid, p * 100 + 1, "a"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, sec long, event_type string").selectExpr(
        "event_id", "CAST(sec AS TIMESTAMP) AS ts", "event_type"
    )
    got = timeseries.ewma_anomaly(
        df, period_sec=100, k_lags=2, band_mult=3
    ).toPandas()
    # period 4 exists ONLY via the dense grid (zero events)
    assert list(got["n_events"]) == [3, 3, 3, 30, 0, 3]
    assert list(got["ewma_milli"].isna()) == [
        True, True, False, False, False, False,
    ]
    # (2*3+3)*1000//3 = 3000 ; (2*30+3)*1000//3 = 21000 ;
    # (2*0+30)*1000//3 = 10000 — the zero period drags the forecast
    assert list(got["ewma_milli"].dropna()) == [3000, 3000, 21000, 10000]
    assert list(got["anomaly_high"]) == [
        False, False, False, True, False, False,
    ]
    # p4: 0 under the 21000 band; p5: 3 events still under 1/3 of the
    # zero-dragged 10000 forecast — recovery takes a window
    assert list(got["anomaly_low"]) == [
        False, False, False, False, True, True,
    ]


def test_ewma_anomaly_matches_oracle_and_validates(spark):
    import duckdb

    from pg_parquet_spark.operators import timeseries
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.001"
    got = timeseries.ewma_anomaly(
        table(spark, sf, "events"), period_sec=21600
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(
        timeseries.ewma_anomaly_oracle_sql(period_sec=21600)
    ).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col].fillna(-1)) == list(want[col].fillna(-1)), col
    # the band actually fires somewhere at this sparsity
    assert got["anomaly_high"].any() or got["anomaly_low"].any()

    import pytest as _pytest

    df = table(spark, sf, "events")
    with _pytest.raises(ValueError, match="period_sec"):
        timeseries.ewma_anomaly(df, period_sec=0)
    with _pytest.raises(ValueError, match="k_lags"):
        timeseries.ewma_anomaly(df, k_lags=0)
    with _pytest.raises(ValueError, match="band_mult"):
        timeseries.ewma_anomaly(df, band_mult=1)


def test_kaplan_meier_hand_computed_curve(spark):
    """KM retention (r14): five planted users with known lifetimes —
    censoring keeps final-period users out of the death counts but in
    the risk sets, and the ppm product truncates at every step."""
    from pg_parquet_spark.operators import timeseries

    # period = 10s; study ends at p9
    activity = {
        1: [5, 95],    # censored (active in final period), risk age 9
        2: [0, 45],    # dead at age 5
        3: [25, 49],   # dead at age 3
        4: [3],        # dead at age 1
        5: [55, 99],   # censored, risk age 4
    }
    rows = [(u, s) for u, secs in activity.items() for s in secs]
    df = spark.createDataFrame(rows, "user_id long, sec long").selectExpr(
        "user_id", "CAST(sec AS TIMESTAMP) AS ts"
    )
    got = timeseries.kaplan_meier_retention(df, period_sec=10).collect()
    assert [(r.age, r.n_risk, r.n_deaths, r.survival_ppm) for r in got] == [
        (1, 5, 1, 800_000),   # 1e6 * 4 div 5
        (3, 4, 1, 600_000),   # 800000 * 3 div 4
        (5, 2, 1, 300_000),   # 600000 * 1 div 2
    ]

    # single observed period: everyone censored, empty curve
    one = spark.createDataFrame([(1, 1), (2, 2)], "user_id long, sec long"
                                ).selectExpr("user_id",
                                             "CAST(sec AS TIMESTAMP) AS ts")
    assert timeseries.kaplan_meier_retention(one, period_sec=10).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="period_sec"):
        timeseries.kaplan_meier_retention(df, period_sec=0)


def test_kaplan_meier_matches_oracle(spark):
    """Gate replica at sf0.001: the packed-integer fold replicates
    bit-for-bit (aggregate() vs list_reduce()) and survival is
    monotone nonincreasing."""
    import duckdb

    from pg_parquet_spark.operators import timeseries
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.001"
    got = timeseries.kaplan_meier_retention(
        table(spark, sf, "events"), period_sec=21600
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(
        timeseries.kaplan_meier_oracle_sql(period_sec=21600)
    ).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col]) == list(want[col]), col
    assert got["survival_ppm"].is_monotonic_decreasing
    assert (got["n_deaths"] > 0).all()
    assert (got["n_risk"] >= got["n_deaths"]).all()


def test_interval_union_planted_overlaps(spark):
    """Interval union (r14): overlap merging, containment, adjacency,
    zero/negative-length and NULL handling — all hand-checked."""
    from pg_parquet_spark.operators import timeseries

    rows = [
        # key 1: [0,10)+[5,15) merge -> 15; [20,25) separate -> +5
        (1, 0, 10), (1, 5, 15), (1, 20, 25),
        # key 2: containment -> one 100s span
        (2, 0, 100), (2, 10, 20),
        # key 3: adjacency [0,10)+[10,20) merges into ONE span (end is
        # exclusive; touching intervals have no gap)
        (3, 0, 10), (3, 10, 20),
        # key 4: zero- and negative-length contribute nothing
        (4, 30, 30), (4, 50, 40), (4, 60, 61),
        # key 6: a zero-length interval at the same start must NOT
        # suppress the real interval's span-open (review, r14)
        (6, 0, 0), (6, 0, 5),
        # key 7: a degenerate [8,8) must NOT bridge the [0,5)..[8,9)
        # gap (review, r14) — two spans, not one
        (7, 0, 5), (7, 8, 8), (7, 8, 9),
        # key 8: only degenerate intervals -> counted, zero coverage
        (8, 1, 1),
        # NULLs drop
        (None, 0, 5), (5, None, 5), (5, 0, None),
    ]
    df = spark.createDataFrame(rows, "u long, s long, e long")
    got = {
        r.key: (r.n_intervals, r.n_spans, r.covered_sec)
        for r in timeseries.interval_union_seconds(df, "u", "s", "e").collect()
    }
    assert got == {
        1: (3, 2, 20),
        2: (2, 1, 100),
        3: (2, 1, 20),
        4: (3, 1, 1),
        6: (2, 1, 5),
        7: (3, 2, 6),
        8: (1, 0, 0),
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in frame"):
        timeseries.interval_union_seconds(df, "u", "s", "missing")


def test_interval_union_matches_oracle(spark):
    import duckdb

    from pg_parquet_spark.operators import timeseries
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.001"
    iv = table(spark, sf, "events").selectExpr(
        "user_id AS key",
        "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS start_sec",
        "CAST(CAST(ts AS TIMESTAMP) AS LONG) + 900 AS end_sec",
    )
    got = timeseries.interval_union_seconds(
        iv, "key", "start_sec", "end_sec"
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(timeseries.interval_union_oracle_sql(
        "SELECT user_id AS key, CAST(FLOOR(epoch(ts)) AS BIGINT) AS start_sec, "
        "CAST(FLOOR(epoch(ts)) AS BIGINT) + 900 AS end_sec FROM events"
    )).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col]) == list(want[col]), col
    # unions never exceed the naive sum and spans never exceed intervals
    assert (got["covered_sec"] <= got["n_intervals"] * 900).all()
    assert (got["n_spans"] <= got["n_intervals"]).all()


def test_holt_forecast_hand_computed_and_ramp(spark):
    """Holt (r14): hand-checked level/trend halvings on a tiny series,
    a perfect linear ramp converges to its slope (forecast tracks,
    EWMA would lag forever), and a zero-filled interior gap pulls the
    trend negative."""
    from pg_parquet_spark.operators import timeseries

    # series 1, 1, 2, 2 at periods 0..3 of 10s
    rows = []
    eid = 0
    for p, n in [(0, 1), (1, 1), (2, 2), (3, 2)]:
        for _ in range(n):
            rows.append((eid, p * 10 + 1, "a")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, sec long, event_type string"
    ).selectExpr("event_id", "CAST(sec AS TIMESTAMP) AS ts", "event_type")
    got = timeseries.holt_forecast(df, period_sec=10).collect()
    assert [(r.level_milli, r.trend_milli, r.forecast_next_milli)
            for r in got] == [
        (1000, 0, 1000),
        (1000, 0, 1000),        # (2000+1000+0)/2? no: x=1 -> stays
        (1500, 250, 1750),
        (1875, 312, 2187),
    ]

    # linear ramp 1..12: trend approaches 1000 milli/period and the
    # forecast error shrinks to < one event
    ramp = []
    eid = 0
    for p in range(12):
        for _ in range(p + 1):
            ramp.append((eid, p * 10 + 1, "a")); eid += 1
    rdf = spark.createDataFrame(
        ramp, "event_id long, sec long, event_type string"
    ).selectExpr("event_id", "CAST(sec AS TIMESTAMP) AS ts", "event_type")
    rows2 = timeseries.holt_forecast(rdf, period_sec=10).collect()
    last = rows2[-1]
    assert abs(last.trend_milli - 1000) <= 120
    assert abs(last.forecast_next_milli - 13000) <= 250

    # interior silence drags trend negative
    gap = [(0, 1, "a"), (1, 2, "a"), (2, 11, "a"), (3, 31, "a")]
    gdf = spark.createDataFrame(
        gap, "event_id long, sec long, event_type string"
    ).selectExpr("event_id", "CAST(sec AS TIMESTAMP) AS ts", "event_type")
    rows3 = timeseries.holt_forecast(gdf, period_sec=10).collect()
    assert rows3[2].n_events == 0 and rows3[2].trend_milli < 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="period_sec"):
        timeseries.holt_forecast(df, period_sec=0)


def test_holt_forecast_matches_oracle(spark):
    import duckdb

    from pg_parquet_spark.operators import timeseries
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.001"
    got = timeseries.holt_forecast(
        table(spark, sf, "events"), period_sec=21600
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(
        timeseries.holt_forecast_oracle_sql(period_sec=21600)
    ).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col]) == list(want[col]), col
