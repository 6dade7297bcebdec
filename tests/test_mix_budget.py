"""Corpus-recipe selection: exact-share domain rebalancing and
best-first token-budget selection — DuckDB-oracle equality at both SFs,
exact mix shares, loud contracts, partition invariance."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pg_parquet_spark.operators import sampling
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

TGT = {"src1": 500_000, "src3": 300_000, "src7": 200_000}


def _con(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("sf", SFS)
def test_rebalance_matches_duckdb_oracle(spark, sf):
    """Selected id set replicates exactly — the caps the Spark side
    collects as plan literals equal the caps the oracle derives in SQL
    from the same integer arithmetic."""
    docs = table(spark, sf, "documents")
    got = sampling.rebalance_to_mix(docs, "source", "doc_id", TGT).toPandas()
    want = _con(sf).execute(
        sampling.rebalance_oracle_sql("source", "doc_id", TGT)
    ).df()
    assert sorted(got.doc_id) == sorted(want.doc_id)
    assert len(got) > 0


def test_rebalance_shares_are_exact_and_maximal(spark):
    """m_c = floor(t_c·k/1e6) exactly, k maximal: the binding domain is
    kept in full (its cap equals floor of its availability share)."""
    docs = table(spark, SFS[1], "documents")
    got = sampling.rebalance_to_mix(docs, "source", "doc_id", TGT).toPandas()
    mix = got.groupby("source").size().to_dict()
    k = min(
        docs.filter(f"source = '{c}'").count() * 1_000_000 // t
        for c, t in TGT.items()
    )
    for c, t in TGT.items():
        assert mix[c] == t * k // 1_000_000, c
    # untargeted domains are dropped
    assert set(mix) == set(TGT)


def test_rebalance_partition_invariant(spark):
    docs = table(spark, SFS[0], "documents")
    base = sorted(
        r.doc_id
        for r in sampling.rebalance_to_mix(docs, "source", "doc_id", TGT)
        .select("doc_id")
        .collect()
    )
    for n in (1, 32):
        alt = sorted(
            r.doc_id
            for r in sampling.rebalance_to_mix(
                docs.repartition(n), "source", "doc_id", TGT
            )
            .select("doc_id")
            .collect()
        )
        assert alt == base, n


def test_rebalance_loud_contracts(spark):
    docs = table(spark, SFS[0], "documents")
    with pytest.raises(ValueError, match="absent"):
        sampling.rebalance_to_mix(docs, "source", "doc_id", {"nope": 1_000_000})
    with pytest.raises(ValueError, match="ppm"):
        sampling.rebalance_to_mix(
            docs, "source", "doc_id", {"src1": 900_000, "src3": 200_000}
        )


@pytest.mark.parametrize("sf", SFS)
def test_token_budget_matches_duckdb_oracle(spark, sf):
    """The distributed prefix over (score desc, id) reproduces the
    single-window DuckDB prefix column-for-column."""
    docs = table(spark, sf, "documents")
    feats = docs.selectExpr("doc_id", "text", "cast(n_chars as double) as quality")
    got = sampling.select_token_budget(
        feats, score_col="quality", budget_tokens=20_000
    ).toPandas()
    want = _con(sf).execute(
        sampling.token_budget_oracle_sql(
            score_expr="CAST(n_chars AS DOUBLE)", budget_tokens=20_000
        )
    ).df()
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c


def test_token_budget_is_a_prefix_and_respects_budget(spark):
    docs = table(spark, SFS[1], "documents")
    feats = docs.selectExpr("doc_id", "text", "cast(n_chars as double) as quality")
    got = sampling.select_token_budget(
        feats, score_col="quality", budget_tokens=20_000
    ).toPandas()
    assert got.cum_tokens.max() <= 20_000
    # prefix in score order: the worst kept score ≥ the best dropped score
    kept = set(got.doc_id)
    alldf = feats.selectExpr("doc_id", "quality").toPandas()
    dropped = alldf[~alldf.doc_id.isin(kept)]
    if len(dropped) and len(got):
        assert got.score.min() >= dropped.quality.max() or (
            # ties on the boundary are broken by id
            got.score.min() == dropped.quality.max()
        )


@pytest.mark.parametrize("sf", SFS)
def test_weighted_sample_matches_oracle(spark, sf):
    """Efraimidis–Spirakis via content-hash Gumbel: the selected set AND
    the integer selection keys replicate exactly."""
    docs = table(spark, sf, "documents")
    got = sampling.weighted_sample(docs, "doc_id", "n_chars", k=50).toPandas()
    want = _con(sf).execute(
        sampling.weighted_sample_oracle_sql("doc_id", "n_chars", 50)
    ).df()
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.sel_key_micro) == list(want.sel_key_micro)


def test_weighted_sample_follows_weights_and_contracts(spark):
    """Heavier rows are selected more often (sanity over many disjoint
    draws via grouping), and non-positive weights raise."""
    docs = table(spark, SFS[1], "documents")
    got = sampling.weighted_sample(docs, "doc_id", "n_chars", k=100).toPandas()
    pop_mean = docs.agg({"n_chars": "avg"}).collect()[0][0]
    assert got.n_chars.mean() > pop_mean  # weight-proportional pull

    # r10 (VERDICT r9 #1): the positive-weight contract is enforced IN
    # the selection pass (when/raise_error on the key expression), so
    # violations raise at action time — and the valid path is ONE scan,
    # not validate-then-select
    z = spark.createDataFrame([(1, 0.0)], "id long, w double")
    with pytest.raises(Exception, match="strictly positive"):
        sampling.weighted_sample(z, "id", "w", 1).collect()
    zn = spark.createDataFrame([(1, None)], "id long, w double")
    with pytest.raises(Exception, match="strictly positive"):
        sampling.weighted_sample(zn, "id", "w", 1).collect()


def test_weighted_sample_is_single_scan(spark):
    """The validation fold (r10) removed the up-front probe scan: the
    plan reads the source exactly once and sorts via the top-k heap
    (TakeOrderedAndProject), with no exchange before it."""
    docs = table(spark, SFS[0], "documents")
    plan = (
        sampling.weighted_sample(docs, "doc_id", "n_chars", k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize("sf", SFS)
def test_leakage_safe_split_matches_oracle(spark, sf):
    """r10: group-level split — (id, group_id, split) replicates
    bit-exactly (normalized-fingerprint groups, md5-prefix ppm
    bucket)."""
    docs = table(spark, sf, "documents")
    got = sampling.leakage_safe_split(docs, valid_ppm=150_000).toPandas()
    want = _con(sf).execute(
        sampling.leakage_split_oracle_sql(valid_ppm=150_000)
    ).df()
    assert len(got) == len(want) == docs.count()
    for c in ("doc_id", "group_id", "split"):
        assert list(got[c]) == list(want[c]), c
    # both classes are populated at this SF
    assert set(got["split"]) == {"train", "valid"}


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """The contamination property: token-shuffled near-duplicates are
    one group and can NEVER straddle the split; distinct docs split
    independently; valid fraction tracks valid_ppm at group level."""
    rows = []
    for i in range(200):
        rows.append((2 * i, f"alpha beta gamma delta doc{i}"))
        # shuffled duplicate of the same token set
        rows.append((2 * i + 1, f"doc{i} delta gamma beta alpha"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.leakage_safe_split(df, valid_ppm=300_000).toPandas()
    assert len(out) == 400
    by_group = out.groupby("group_id")["split"].nunique()
    assert (by_group == 1).all()  # a group never straddles
    assert out.groupby("group_id").size().eq(2).all()  # pairs grouped
    frac = (out["split"] == "valid").mean()
    assert 0.15 < frac < 0.45  # ~0.30 at group granularity

    with pytest.raises(ValueError, match="valid_ppm"):
        sampling.split_by_group(df, "doc_id", valid_ppm=2_000_000)


@pytest.mark.parametrize("sf", SFS)
def test_quality_classifier_matches_oracle(spark, sf):
    """Frozen NB log-odds classifier (r10): train on src13-vs-rest,
    apply with the weights as plan literals — the full (id, n_feats,
    logit, keep) table replicates bit-exactly via the VALUES-join
    oracle rendering of the same frozen model."""
    docs = table(spark, sf, "documents")
    model = sampling.train_quality_classifier(
        docs.filter("source = 'src13'"),
        docs.filter("source <> 'src13'"),
        n_buckets=256,
    )
    assert model["w_micro"], "training produced no discriminative buckets"
    got = sampling.apply_quality_classifier(docs, model).toPandas()
    want = _con(sf).execute(sampling.classifier_oracle_sql(model)).df()
    assert len(got) == len(want) == docs.count()
    for c in ("doc_id", "n_feats", "logit_micro", "keep"):
        assert list(got[c]) == list(want[c]), c


def test_quality_classifier_separates_planted_domains(spark):
    """The design property: trained on a vocabulary-distinct positive
    domain, the classifier scores held-out positive-domain docs above
    negative-domain docs (and the threshold keeps them)."""
    pos_rows = [(i, "quantum tensor lattice spin boson") for i in range(40)]
    neg_rows = [(100 + i, "pizza burger soda fries shake") for i in range(40)]
    train_pos = spark.createDataFrame(pos_rows[:30], "doc_id long, text string")
    train_neg = spark.createDataFrame(neg_rows[:30], "doc_id long, text string")
    model = sampling.train_quality_classifier(train_pos, train_neg, n_buckets=128)
    held = spark.createDataFrame(
        pos_rows[30:] + neg_rows[30:], "doc_id long, text string"
    )
    got = sampling.apply_quality_classifier(held, model).toPandas()
    pos_scores = got[got.doc_id < 100].logit_micro
    neg_scores = got[got.doc_id >= 100].logit_micro
    assert pos_scores.min() > neg_scores.max()
    assert got[got.doc_id < 100].keep.all()
    assert not got[got.doc_id >= 100].keep.any()


@pytest.mark.parametrize("sf", SFS)
def test_curriculum_order_matches_oracle(spark, sf):
    """r12: the deterministic global training order — curriculum bins
    ascending, md5-shuffled within bin — replicates the single-window
    DuckDB formulation row-for-row (the distributed two-pass rank
    composition proof)."""
    docs = table(spark, sf, "documents").selectExpr(
        "doc_id", "n_chars div 500 AS diff_bin"
    )
    got = sampling.curriculum_order(docs, "doc_id", "diff_bin").toPandas()
    want = _con(sf).execute(
        sampling.curriculum_order_oracle_sql("n_chars // 500")
    ).df()
    assert len(got) == len(want) > 0
    for c in ("doc_id", "bin", "global_pos"):
        assert list(got[c]) == list(want[c]), c


def test_curriculum_order_properties(spark):
    """Positions are a permutation of [1, n]; bins are consumed in
    ascending blocks; the within-bin order is salt-dependent (epoch
    reshuffle) but bin boundaries are salt-invariant; the result is
    partition-placement-independent."""
    docs = table(spark, SFS[0], "documents").selectExpr(
        "doc_id", "n_chars div 500 AS b"
    )
    out = sampling.curriculum_order(docs, "doc_id", "b").toPandas()
    n = len(out)
    assert sorted(out.global_pos) == list(range(1, n + 1))
    # ascending bin blocks: positions sorted by bin are already sorted
    assert list(out.sort_values("global_pos").bin) == sorted(out.bin)
    # salt changes the within-bin order, not the bin blocks
    alt = sampling.curriculum_order(docs, "doc_id", "b", salt="epoch2").toPandas()
    assert not out.sort_values("global_pos").doc_id.equals(
        alt.sort_values("global_pos").doc_id
    )
    bins_a = out.sort_values("global_pos").bin.tolist()
    assert bins_a == alt.sort_values("global_pos").bin.tolist()
    # partition invariance
    for k in (1, 32):
        rep = sampling.curriculum_order(
            docs.repartition(k), "doc_id", "b"
        ).toPandas()
        assert rep.equals(out), k
    # plan: range exchange, no single-task data window
    import re

    plan = (
        sampling.curriculum_order(docs, "doc_id", "b")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange rangepartitioning" in plan
    for spec in re.findall(r"windowspecdefinition\(\w+#\d+[, ]", plan):
        assert spec[len("windowspecdefinition(") :].startswith("_pid#"), spec


@pytest.mark.parametrize("sf", SFS)
def test_kfold_by_group_matches_oracle(spark, sf):
    """r12: group-granular k-fold assignment replicates the md5-prefix
    range division bit-for-bit."""
    docs = table(spark, sf, "documents")
    got = (
        sampling.kfold_by_group(docs.select("doc_id", "source"), "source", k=5)
        .select("doc_id", "fold")
        .orderBy("doc_id")
        .toPandas()
    )
    want = _con(sf).execute(
        sampling.kfold_oracle_sql("source", k=5)
    ).df()
    assert len(got) == len(want) > 0
    for c in ("doc_id", "fold"):
        assert list(got[c]) == list(want[c]), c


def test_kfold_group_granularity_and_balance(spark):
    """Every group sits wholly inside one fold; folds are within a
    loose balance band; k is validated."""
    docs = table(spark, SFS[1], "documents").select("doc_id", "source")
    out = sampling.kfold_by_group(docs, "source", k=4).toPandas()
    per_group = out.groupby("source").fold.nunique()
    assert (per_group == 1).all()
    assert set(out.fold) <= set(range(4))
    sizes = out.groupby("fold").size()
    assert len(sizes) >= 2  # synthetic corpus has ~20 sources
    import pytest as _pt

    with _pt.raises(ValueError, match="k must be"):
        sampling.kfold_by_group(docs, "source", k=1)


def test_kfold_by_group_null_group_raises(spark):
    """ADVICE r12: md5(NULL) is NULL in both engines, so a NULL group
    used to map silently to a NULL fold — rows belonging to NO fold,
    vanishing from every train/held-out union downstream. The guard is
    in-pass (when/raise_error, the weighted_sample pattern)."""
    df = spark.createDataFrame(
        [(1, "src1"), (2, None), (3, "src2")], "doc_id long, source string"
    )
    with pytest.raises(Exception, match="NULL in group column"):
        sampling.kfold_by_group(df, "source", k=4).collect()
    # non-NULL rows still fold normally once NULLs are coalesced
    out = sampling.kfold_by_group(
        df.fillna({"source": "__null__"}), "source", k=4
    ).toPandas()
    assert out.fold.notna().all() and set(out.fold) <= set(range(4))


@pytest.mark.parametrize("sf", SFS)
def test_temperature_mix_matches_oracle(spark, sf):
    """r13: α=0.5 temperature mixing replicates bit-for-bit — integer
    micro-unit sqrt weights (sqrt is IEEE correctly-rounded on both
    engines), largest-remainder apportionment, availability caps,
    md5-hash-first selection."""
    docs = table(spark, sf, "documents")
    got = sampling.temperature_mix(docs, "source", "doc_id", total=120).toPandas()
    want = _con(sf).execute(
        sampling.temperature_mix_oracle_sql("source", "doc_id", total=120)
    ).df()
    assert len(got) == len(want) == 120
    for c in ("doc_id", "source"):
        assert list(got[c]) == list(want[c]), c


def test_temperature_mix_flattens_and_validates(spark):
    """α<1 up-weights small sources relative to proportional sampling;
    quotas never exceed availability; loud contracts."""
    from pyspark.sql import functions as F

    docs = table(spark, SFS[1], "documents")
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    got = sampling.temperature_mix(docs, "source", "doc_id", total=100).toPandas()
    taken = got.groupby("source").size().to_dict()
    # flattening: the selected share of every small source exceeds its
    # corpus share; no source exceeds its availability
    tot_n = sum(counts.values())
    for src, t in taken.items():
        assert t <= counts[src]
    small = min(counts, key=counts.get)
    big = max(counts, key=counts.get)
    if counts[small] < counts[big]:  # guard degenerate corpora
        assert taken.get(small, 0) / 100 >= counts[small] / tot_n
        assert taken.get(big, 0) / 100 <= counts[big] / tot_n * 1.01

    with pytest.raises(ValueError, match="total"):
        sampling.temperature_mix(docs, "source", "doc_id", total=0)
    with pytest.raises(ValueError, match="alpha"):
        sampling.temperature_mix(docs, "source", "doc_id", total=10, alpha=1.5)
    null_df = spark.createDataFrame(
        [(1, "a"), (2, None)], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="NULL in group column"):
        sampling.temperature_mix(null_df, "source", "doc_id", total=1)


def test_rank_normalize_scores_matches_oracle(spark):
    """r13: per-source rank calibration — the distrank composition
    (range exchange + per-partition windows + broadcast offsets)
    equals the per-group single-window oracle bit-for-bit at both SFs
    and at any partitioning."""
    import duckdb

    from pg_parquet_spark.operators import sampling

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = table(spark, sf, "documents").withColumn(
            "score", F.col("n_chars")
        )
        got = sampling.rank_normalize_scores(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        want = con.execute(
            sampling.rank_normalize_oracle_sql(score_expr="n_chars")
        ).df()
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (sf, c)
    for n in (1, 4, 32):
        alt = sampling.rank_normalize_scores(docs.repartition(n)).toPandas()
        assert alt.equals(got), n


def test_rank_normalize_scores_semantics(spark):
    """Equal-sized groups calibrate to identical distributions
    regardless of raw scale; the top of every group lands at 1e6 ppm;
    NULL scores raise loudly."""
    import pytest as _pytest

    from pg_parquet_spark.operators import sampling

    rows = [("a", i, float(i)) for i in range(1, 5)]
    rows += [("b", 10 + i, 1000.0 * i) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "source string, doc_id long, score double")
    out = sampling.rank_normalize_scores(df).toPandas()
    a = out[out.source == "a"].calib_ppm.tolist()
    b = out[out.source == "b"].calib_ppm.tolist()
    assert a == b == [250_000, 500_000, 750_000, 1_000_000]

    bad = df.withColumn(
        "score", F.when(F.col("doc_id") == 2, None).otherwise(F.col("score"))
    )
    with _pytest.raises(Exception, match="NULL score"):
        sampling.rank_normalize_scores(bad).collect()


def test_quantile_normalize_aligns_two_scales(spark):
    """Quantile normalization (r14): two sources on different scales
    map onto the SAME pooled positions — rank structure is all that
    survives; a single-group pool is the identity map; NULLs drop;
    missing columns fail fast."""
    from pg_parquet_spark.operators import sampling

    rows = [(i, "a", v) for i, v in enumerate([1, 2, 3, 4])] + [
        (10 + i, "b", v) for i, v in enumerate([101, 102, 103, 104])
    ] + [(99, None, 5), (98, "a", None)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    got = sampling.quantile_normalize(df, "n", "source", "doc_id").toPandas()
    assert len(got) == 8  # NULL group / NULL value dropped
    by = dict(zip(got["doc_id"], got["norm_value"]))
    # midpoint mapping with N=8, n_g=4: ranks 1..4 -> pos 2,4,6,8 ->
    # pooled values 2,4,102,104 — identical for BOTH sources
    assert [by[i] for i in (0, 1, 2, 3)] == [2, 4, 102, 104]
    assert [by[i] for i in (10, 11, 12, 13)] == [2, 4, 102, 104]

    one = spark.createDataFrame(
        [(i, "only", v) for i, v in enumerate([7, 3, 9, 1])],
        "doc_id long, source string, n long",
    )
    ident = sampling.quantile_normalize(one, "n", "source", "doc_id").toPandas()
    assert list(ident["norm_value"]) == list(ident["n"])  # identity

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in frame"):
        sampling.quantile_normalize(df, "missing", "source", "doc_id")


def test_quantile_normalize_matches_oracle(spark):
    import duckdb

    from pg_parquet_spark.operators import sampling
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.01"
    got = sampling.quantile_normalize(
        table(spark, sf, "documents"), "n_chars", "source", "doc_id"
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        sampling.quantile_normalize_oracle_sql("n_chars", "source", "doc_id")
    ).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col]) == list(want[col]), col


def test_shard_manifest_balance_identities(spark):
    """Shard manifest (r14): deterministic reassignment, empty shards
    surfaced by the spine, NULL weights count zero, share/skew
    identities hold, zero-weight corpus reports NULL shares."""
    from pg_parquet_spark.operators import sampling

    rows = [(i, 10) for i in range(40)] + [(100, None)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = sampling.shard_manifest(df, n_shards=8).toPandas()
    assert list(got["shard"]) == list(range(8))
    assert got["n_docs"].sum() == 41
    assert got["total_weight"].sum() == 400
    # identities: share sums to ~1e6 (truncation deficit < n_shards),
    # skew = share*n - 1e6
    assert 1_000_000 - 8 <= got["share_ppm"].sum() <= 1_000_000
    assert (got["skew_ppm"] == got["share_ppm"] * 8 - 1_000_000).all()
    # deterministic
    again = sampling.shard_manifest(df, n_shards=8).toPandas()
    assert got.values.tolist() == again.values.tolist()

    zero = sampling.shard_manifest(
        spark.createDataFrame([(1, 0)], "doc_id long, n_chars long"),
        n_shards=4,
    ).toPandas()
    assert zero["share_ppm"].isna().all()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        sampling.shard_manifest(df, n_shards=0)


def test_shard_manifest_matches_oracle(spark):
    import duckdb

    from pg_parquet_spark.operators import sampling
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.01"
    got = sampling.shard_manifest(
        table(spark, sf, "documents"), n_shards=16
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        sampling.shard_manifest_oracle_sql(n_shards=16)
    ).df()
    assert got.values.tolist() == want.values.tolist()
