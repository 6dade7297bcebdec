"""PSI drift monitoring: oracle equality (categorical + bucketized
numeric) at both SFs, exact-zero self-drift, and direction sanity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pg_parquet_spark.operators import drift
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

COLS = ["category", "c_ref", "c_new", "q_ppm", "p_ppm", "lr_micro", "term"]


def _con(sf):
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("sf", SFS)
def test_categorical_psi_matches_oracle(spark, sf):
    docs = table(spark, sf, "documents")
    ref = docs
    new = docs.filter("n_chars % 3 != 0")  # shifts the source mix
    got = drift.psi_table(ref, new, F.col("source")).toPandas()
    want = _con(sf).execute(
        drift.psi_oracle_sql(
            "SELECT * FROM documents",
            "SELECT * FROM documents WHERE n_chars % 3 != 0",
            "source",
        )
    ).df()
    assert len(got) == len(want) > 0
    for col in COLS:
        assert list(got[col]) == list(want[col]), col


@pytest.mark.parametrize("sf", SFS)
def test_numeric_psi_matches_oracle(spark, sf):
    docs = table(spark, sf, "documents")
    ref = docs
    new = docs.filter("doc_id % 2 = 0")
    edges = [200.0, 400.0, 600.0, 800.0]
    got = drift.psi_table(
        ref, new, drift.bucketize(F.col("n_chars").cast("double"), edges)
    ).toPandas()
    want = _con(sf).execute(
        drift.psi_oracle_sql(
            "SELECT * FROM documents",
            "SELECT * FROM documents WHERE doc_id % 2 = 0",
            drift.bucketize_sql("CAST(n_chars AS DOUBLE)", edges),
        )
    ).df()
    assert len(got) == len(want) > 0
    for col in COLS:
        assert list(got[col]) == list(want[col]), col


@pytest.mark.parametrize("sf", SFS)
def test_null_category_psi_matches_oracle(spark, sf):
    """ADVICE r9: NULL is a real category — the spine joins null-safely
    on both engines, so NULL-bearing categorical columns get their own
    (correctly counted) row instead of zeros that silently skew every
    other category's smoothed probabilities."""
    docs = table(spark, sf, "documents")
    nullable = F.nullif(F.col("source"), F.lit("src3"))
    ref = docs
    new = docs.filter("n_chars % 3 != 0")
    got = (
        drift.psi_table(ref, new, nullable)
        .toPandas()
        .sort_values("category", na_position="first")
        .reset_index(drop=True)
    )
    want = (
        _con(sf)
        .execute(
            drift.psi_oracle_sql(
                "SELECT * FROM documents",
                "SELECT * FROM documents WHERE n_chars % 3 != 0",
                "NULLIF(source, 'src3')",
            )
        )
        .df()
        .sort_values("category", na_position="first")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    null_rows = got[got["category"].isna()]
    assert len(null_rows) == 1  # the NULL category is present...
    assert int(null_rows["c_ref"].iloc[0]) > 0  # ...and actually counted
    for col in COLS[1:]:
        assert list(got[col]) == list(want[col]), col
    assert [x for x in got["category"] if x == x] == [
        x for x in want["category"] if x == x
    ]


def test_self_drift_is_exactly_zero_and_shift_is_loud(spark):
    docs = table(spark, SFS[1], "documents")
    same = drift.psi_table(docs, docs, F.col("source"))
    assert drift.psi_total(same) == 0  # identical args → identical terms
    # a hard shift (drop half the sources) must cross the 0.25 alarm
    shifted = docs.filter("source >= 'src10'")
    t = drift.psi_table(docs, shifted, F.col("source"))
    assert drift.psi_total(t) / 1e12 > 0.25


# --------------------------------------------------------------------------
# Robust (median/MAD) outliers
# --------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_robust_outlier_stats_match_oracle(spark, sf):
    """Full integer stats table (med×2, MAD×4, flag counts) replicates
    bit-for-bit — percentile/quantile_cont on integer inputs land on
    exact binary fractions (the winsorize-proven pairing)."""
    ev = table(spark, sf, "events")
    got = drift.robust_outlier_stats(ev).toPandas()
    want = _con(sf).execute(drift.robust_outlier_oracle_sql()).df()
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c


def test_robust_outlier_rows_tie_out_with_stats(spark):
    ev = table(spark, SFS[1], "events")
    stats = drift.robust_outlier_stats(ev).toPandas()
    rows = drift.robust_outliers(ev)
    assert rows.count() == stats.n_outliers.sum()
    # every flagged row violates its group fence by construction
    assert rows.columns == ["id", "grp", "v_milli", "dev_milli_x2"]


def test_robust_fence_survives_contamination_where_zscore_breaks(spark):
    """The design claim: one extreme value explodes a mean/std fence
    (nothing else gets flagged) but leaves the MAD fence usable."""
    vals = [(i, "g", float(10 + (i % 3))) for i in range(30)]
    vals.append((99, "g", 1e6))
    df = spark.createDataFrame(
        vals, "event_id long, event_type string, value double"
    )
    st = drift.robust_outlier_stats(df).collect()[0]
    assert st.n_outliers == 1  # only the planted extreme
    flagged = drift.robust_outliers(df).collect()
    assert [r.id for r in flagged] == [99]


def test_robust_degenerate_constant_group(spark):
    """MAD 0: every deviating row is an outlier, no engine divergence
    (integer compare, no division)."""
    fix = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 5.0), (3, "g", 5.0), (4, "g", 9.0)],
        "event_id long, event_type string, value double",
    )
    st = drift.robust_outlier_stats(fix).collect()[0]
    assert st.mad_milli_x4 == 0 and st.n_outliers == 1


# --------------------------------------------------------------------------
# Chi-square association screening
# --------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_chi2_matches_duckdb_oracle(spark, sf):
    """Summary row replicates exactly. (Engines label weekdays
    differently — Spark 1=Sun..7, DuckDB 0=Sun..6 — but χ² is invariant
    under bijective relabeling, which is also why the STAT, not the
    labeled cell table, is the cross-engine artifact.)"""
    ev = table(spark, sf, "events")
    got = drift.chi2_stat(ev, F.col("event_type"), F.dayofweek("ts")).toPandas()
    want = _con(sf).execute(
        drift.chi2_oracle_sql("event_type", "dayofweek(ts)")
    ).df()
    assert got.values.tolist() == want.values.tolist()


def test_chi2_association_extremes(spark):
    """Perfect association: χ² = n (φ²=1, dof 1); exact independence:
    χ² = 0 — both exact in micro-units."""
    dep = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", "p" if i % 2 == 0 else "q") for i in range(100)],
        "i long, x string, y string",
    )
    st = drift.chi2_stat(dep, F.col("x"), F.col("y")).collect()[0]
    assert st.chi2_micro == 100 * 1_000_000 and st.dof == 1

    ind = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", "p" if (i // 2) % 2 == 0 else "q") for i in range(100)],
        "i long, x string, y string",
    )
    st2 = drift.chi2_stat(ind, F.col("x"), F.col("y")).collect()[0]
    assert st2.chi2_micro == 0


def test_chi2_cells_tie_out_with_stat(spark):
    ev = table(spark, SFS[0], "events")
    cells = drift.chi2_cells(ev, F.col("event_type"), F.col("user_id") % 3).toPandas()
    st = drift.chi2_stat(ev, F.col("event_type"), F.col("user_id") % 3).collect()[0]
    n = cells.o.sum()
    assert st.n == n
    assert st.chi2_micro == n * cells.term_micro.sum() - n * 1_000_000


def test_robust_and_hdr_ignore_null_values(spark):
    """NULL values are ignored (SQL-aggregate convention) — explicit,
    because a NULL bucket/row would hit the engines' opposite window
    null-ordering defaults."""
    from pg_parquet_spark.operators import sketch

    fix = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", None), (3, "g", 7.0), (4, "g", 9.0)],
        "event_id long, event_type string, value double",
    )
    st = drift.robust_outlier_stats(fix).collect()[0]
    assert st.n == 3  # the NULL row is not part of the population
    q = sketch.hdr_quantile_table(fix, "event_type", "value", qs_ppm=(500_000,))
    rows = {r.grp: r.est_milli for r in q.collect()}
    assert rows["g"] == 6912  # median 7000 -> its HDR bucket lower bound (54<<7)


@pytest.mark.parametrize("sf", SFS)
def test_text_psi_matches_oracle(spark, sf):
    """Corpus-level text drift (r10): PSI over hashed-unigram buckets
    replicates bit-exactly through the categorical PSI machinery."""
    docs = table(spark, sf, "documents")
    got = drift.text_psi(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
    ).toPandas()
    want = _con(sf).execute(
        drift.text_psi_oracle_sql("doc_id % 2 = 0", "doc_id % 2 = 1")
    ).df()
    assert len(got) == len(want) > 0
    for col in ("category", "c_ref", "c_new", "q_ppm", "p_ppm", "lr_micro", "term"):
        assert list(got[col]) == list(want[col]), col


def test_text_psi_detects_vocabulary_shift(spark):
    """An even split of one corpus is stable (PSI ≈ 0); swapping in a
    vocabulary-distinct corpus crosses the 0.25 alarm."""
    docs = table(spark, SFS[1], "documents")
    stable = drift.text_psi(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
    )
    assert abs(drift.psi_total(stable)) / 1e12 < 0.05
    alien = spark.createDataFrame(
        [(i, "zyx wvu tsr qpo nml kji") for i in range(500)],
        "doc_id long, text string",
    )
    shifted = drift.text_psi(docs, alien)
    assert drift.psi_total(shifted) / 1e12 > 0.25


def test_embedding_psi_matches_oracle(spark):
    """Embedding drift (r10): PSI over frozen-quantizer cells
    replicates bit-exactly (literal-matrix assignment both sides)."""
    from pg_parquet_spark.operators.ivf_fixture import CENTROIDS

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    got = drift.embedding_psi(
        emb.filter("vec_id % 2 = 0"), emb.filter("vec_id % 2 = 1"), CENTROIDS
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    want = con.execute(
        drift.embedding_psi_oracle_sql(
            "vec_id % 2 = 0", "vec_id % 2 = 1", CENTROIDS
        )
    ).df()
    assert len(got) == len(want) > 0
    for col in COLS:
        assert list(got[col]) == list(want[col]), col


def test_embedding_psi_detects_encoder_shift(spark):
    """An even split of one corpus is stable; a constant offset on
    every vector (the changed-encoder failure) crosses the alarm."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators.ivf_fixture import CENTROIDS

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).select("vec_id", "embedding")
    stable = drift.embedding_psi(
        emb.filter("vec_id % 2 = 0"), emb.filter("vec_id % 2 = 1"), CENTROIDS
    )
    assert abs(drift.psi_total(stable)) / 1e12 < 0.1
    shifted = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(0.5))
    )
    moved = drift.embedding_psi(emb, shifted, CENTROIDS)
    assert drift.psi_total(moved) / 1e12 > 0.25


def test_psi_single_pass_over_upstream(spark):
    """VERDICT r10 #2: psi_from_counts persists its two count frames
    before the scalar actions, so a composed monitor's corpus-sized
    upstream evaluates exactly ONCE per side — counted here with an
    accumulator ticking per row through mapInPandas on the raw text
    feed (previously 3 full passes: one per driver action)."""
    docs = (
        table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .localCheckpoint()  # freeze upstream so only OUR wrapper ticks
    )
    n = docs.count()
    acc = spark.sparkContext.accumulator(0)

    def ticking(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    counted = docs.mapInPandas(ticking, "doc_id long, text string")
    out = drift.text_psi(
        counted.filter("doc_id % 2 = 0"), counted.filter("doc_id % 2 = 1")
    )
    assert out.count() > 0  # reads the persisted counts, not the feed
    # each PSI side scans the shared feed once (the doc_id filter can't
    # push through the opaque mapInPandas) → exactly 2n ticks; the
    # pre-fix triple-action behavior measured 6n here
    assert acc.value == 2 * n, (
        f"upstream evaluated {acc.value / n:.1f}x (expected exactly 2x: "
        "once per side)"
    )


def test_psi_composed_monitors_keep_caches(spark):
    """ADVICE r11: composing a SECOND monitor before collecting the
    first must not evict the first's persisted count frames — the
    registry trims FIFO past _CACHE_KEEP instead of releasing at
    entry. Both monitors collect AFTER both are built; each side of
    each feed still evaluates exactly once (entry-release measured an
    extra full pass per evicted monitor here)."""
    from pg_parquet_spark.operators.drift import release_cached

    release_cached()
    docs = (
        table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .localCheckpoint()
    )
    n = docs.count()
    acc = spark.sparkContext.accumulator(0)

    def ticking(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    counted = docs.mapInPandas(ticking, "doc_id long, text string")
    m_a = drift.text_psi(
        counted.filter("doc_id % 2 = 0"), counted.filter("doc_id % 2 = 1")
    )
    m_b = drift.text_psi(
        counted.filter("doc_id % 3 = 0"), counted.filter("doc_id % 3 <> 0")
    )
    # collect in build order AFTER both exist — the old entry-release
    # had monitor B's construction evict A's caches, so this first
    # collect re-ran A's two feed scans (+2n ticks)
    assert m_a.count() > 0 and m_b.count() > 0
    assert acc.value == 4 * n, (
        f"feeds evaluated {acc.value / n:.1f}x (expected exactly 4x: "
        "two monitors x two sides, no post-eviction re-runs)"
    )
    release_cached()


def test_embedding_health_matches_oracle(spark):
    """r13: the embedding-space health report replicates bit-for-bit
    at both SFs — micro-unit quantization makes every cross-row
    reduction an exact integer sum."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = table(spark, sf, "embeddings")
        got = drift.embedding_health(emb).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
        )
        want = con.execute(drift.embedding_health_oracle_sql()).df()
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (sf, c)
        assert got.resultant_ratio_ppm.iloc[0] < 1_000_000


def test_embedding_health_semantics(spark):
    """Planted fixtures: an anisotropy-collapsed corpus (all vectors
    identical) scores ratio ~1e6; two opposite vectors cancel to ~0;
    zero-norm rows are counted; budget violations and empty input
    raise; partitioning-invariant."""
    same = spark.createDataFrame(
        [([1.0, 0.0],), ([1.0, 0.0],), ([1.0, 0.0],)],
        "embedding array<float>",
    )
    r = drift.embedding_health(same).collect()[0]
    assert r.n_vectors == 3 and r.zero_norm_count == 0
    assert r.min_dims == r.max_dims == 2
    assert abs(r.resultant_ratio_ppm - 1_000_000) <= 1
    assert r.avg_norm_micro == 1_000_000

    opposed = spark.createDataFrame(
        [([1.0, 0.0],), ([-1.0, 0.0],), ([0.0, 0.0],)],
        "embedding array<float>",
    )
    r2 = drift.embedding_health(opposed).collect()[0]
    assert r2.zero_norm_count == 1
    assert r2.resultant_ratio_ppm == 0  # resultant cancels exactly

    base = drift.embedding_health(same).toPandas()
    alt = drift.embedding_health(same.repartition(3)).toPandas()
    assert alt.equals(base)

    big = spark.createDataFrame([([100.0],)], "embedding array<float>")
    with pytest.raises(Exception, match="budget"):
        drift.embedding_health(big).collect()
    with pytest.raises(ValueError, match="empty"):
        drift.embedding_health(same.filter("size(embedding) = 99"))


def test_woe_iv_matches_oracle(spark):
    """r14: WOE/IV feature screening replicates the DuckDB oracle
    bit-for-bit at both SFs and at two bin widths."""
    import duckdb

    from pg_parquet_spark.session import table

    lab = "CAST(event_type = 'purchase' AS INT)"
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events").selectExpr(
            "value", f"{lab} AS label"
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        for bins in (5, 10):
            got = drift.woe_iv(ev, n_bins=bins).toPandas()
            want = con.execute(
                drift.woe_iv_oracle_sql(label_expr=lab, n_bins=bins)
            ).df()
            assert len(got) == len(want) > 0, (sf, bins)
            for c in got.columns:
                assert list(got[c]) == list(want[c]), (sf, bins, c)


def test_woe_iv_semantics(spark):
    """Planted fixture: a perfectly separating feature yields strongly
    positive WOE in the all-good bin and negative in the all-bad bin
    (IV terms positive for both); a useless constant-rate feature
    yields zero WOE everywhere; non-binary labels fail fast; NULLs
    drop."""
    import pytest as _pytest

    # 40 rows: feature < 0 -> label 0, feature >= 0 -> label 1
    rows = [(float(i - 20), 1 if i >= 20 else 0) for i in range(40)]
    rows.append((None, 1))
    rows.append((5.0, None))
    df = spark.createDataFrame(rows, "value double, label int")
    out = drift.woe_iv(df, n_bins=2).collect()
    assert len(out) == 2
    lo, hi = out[0], out[1]
    assert lo.n_good == 0 and lo.n_bad == 20
    assert hi.n_good == 20 and hi.n_bad == 0
    assert lo.woe_micro < 0 < hi.woe_micro
    assert lo.iv_term > 0 and hi.iv_term > 0
    # useless feature: labels split 50/50 inside every bin
    flat = spark.createDataFrame(
        [(float((i // 2) % 4), i % 2) for i in range(40)],
        "value double, label int",
    )
    for r in drift.woe_iv(flat, n_bins=4).collect():
        assert r.woe_micro == 0 and r.iv_term == 0
    bad = spark.createDataFrame([(1.0, 2)], "value double, label int")
    with _pytest.raises(Exception, match="binary 0/1"):
        drift.woe_iv(bad).collect()
    with _pytest.raises(ValueError, match="n_bins"):
        drift.woe_iv(flat, n_bins=1)


def test_ab_test_report_matches_oracle(spark):
    """r14: the Welch-z A/B readout replicates the DuckDB oracle
    bit-for-bit at both SFs and under two assignment expressions."""
    import duckdb

    from pg_parquet_spark.session import table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        for expr in ("user_id % 2 = 0", "event_id % 3 = 0"):
            got = drift.ab_test_report(ev, expr).toPandas()
            want = con.execute(drift.ab_test_oracle_sql(expr)).df()
            assert len(got) == len(want) == 1, (sf, expr)
            for c in got.columns:
                g = got[c].iloc[0]
                w = want[c].iloc[0]
                assert (g == w) or (g != g and w != w), (sf, expr, c)


def test_ab_test_report_semantics(spark):
    """Planted fixture: a known lift produces the hand-computed z;
    a single-row arm degrades to NULL z; NULL flags/values drop."""
    # treatment {10,12,14}, control {1,3,5}: means 12 and 3,
    # var 4 each, se = sqrt(4/3+4/3), z = 9/sqrt(8/3)
    rows = [(1, 10.0), (1, 12.0), (1, 14.0), (0, 1.0), (0, 3.0), (0, 5.0),
            (None, 99.0), (1, None)]
    df = spark.createDataFrame(rows, "grp int, value double")
    out = drift.ab_test_report(df, "grp = 1").collect()[0]
    assert (out.n_treat, out.n_ctrl) == (3, 3)
    assert out.mean_treat_micro == 12_000_000
    assert out.mean_ctrl_micro == 3_000_000
    assert out.diff_micro == 9_000_000
    import math

    z = 9.0 / math.sqrt(4 / 3 + 4 / 3)
    assert out.z_micro == math.floor(z * 1_000_000 + 0.5)
    # one-row arm: z degrades to NULL, counts stay honest
    small = spark.createDataFrame(
        [(1, 10.0), (0, 1.0), (0, 2.0)], "grp int, value double"
    )
    out2 = drift.ab_test_report(small, "grp = 1").collect()[0]
    assert out2.n_treat == 1 and out2.z_micro is None


def test_srm_check_matches_oracle(spark):
    """r14: the SRM guard replicates the DuckDB oracle bit-for-bit at
    both SFs under three (assignment, expected-share) configs."""
    import duckdb

    from pg_parquet_spark.session import table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        for expr, ppm in (
            ("user_id % 2 = 0", 500_000),
            ("user_id % 10 = 0", 100_000),
            ("user_id % 10 = 0", 500_000),   # wrong config -> must fire
        ):
            got = drift.srm_check(ev, expr, ppm).toPandas()
            want = con.execute(drift.srm_oracle_sql(expr, ppm)).df()
            assert len(got) == len(want) == 1, (sf, expr, ppm)
            for c in got.columns:
                assert got[c].iloc[0] == want[c].iloc[0], (sf, expr, ppm, c)


def test_srm_check_semantics(spark):
    """Planted fixture: a perfect 50/50 unit split reports chi2 0 and
    no mismatch even when EVENTS are lopsided (units, not rows, are
    the assignment); a genuinely broken split fires; row-level mode
    counts rows; config validation raises."""
    rows = []
    # users 0..9: even users get 10 events each, odd users 1 each
    for u in range(10):
        for i in range(10 if u % 2 == 0 else 1):
            rows.append((u, u * 100 + i))
    df = spark.createDataFrame(rows, "user_id long, event_id long")
    ok = drift.srm_check(df, "user_id % 2 = 0", 500_000).collect()[0]
    assert (ok.n_treat, ok.n_ctrl) == (5, 5)
    assert ok.chi2_micro == 0 and not ok.mismatch
    # same data judged row-level: 50 vs 5 rows -> massive mismatch
    rowlvl = drift.srm_check(
        df, "user_id % 2 = 0", 500_000, unit_col=None
    ).collect()[0]
    assert (rowlvl.n_treat, rowlvl.n_ctrl) == (50, 5)
    assert rowlvl.mismatch
    # broken assignment: 9 of 10 users treated against a 50% config
    broken = drift.srm_check(df, "user_id != 9", 500_000).collect()[0]
    assert broken.n_treat == 9 and broken.mismatch
    import pytest as _pytest

    with _pytest.raises(ValueError, match="expected_treat_ppm"):
        drift.srm_check(df, "user_id % 2 = 0", 0)


def test_cuped_report_matches_oracle(spark):
    """r14: the CUPED readout (theta, variance reduction, plain vs
    adjusted Welch z) replicates the DuckDB oracle bit-for-bit at both
    SFs."""
    import duckdb

    from pg_parquet_spark.session import table

    cut = "2024-01-15 00:00:00"
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = table(spark, sf, "events")
        got = drift.cuped_report(ev, cut).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        want = con.execute(drift.cuped_oracle_sql(cut)).df()
        assert len(got) == len(want) == 1, sf
        for c in got.columns:
            g, w = got[c].iloc[0], want[c].iloc[0]
            assert (g == w) or (g != g and w != w), (sf, c)


def test_cuped_variance_reduction_semantics(spark):
    """Planted fixture: outcomes built as y = x + lift(treat) + tiny
    noise give a theta near 1, a LARGE variance reduction, and a
    CUPED z that detects a lift the plain z cannot (the technique's
    selling point, reproduced exactly); uncorrelated covariates give
    ~zero reduction; degenerate var(x)=0 yields NULL theta."""
    import datetime as dt

    pre = dt.datetime(2024, 1, 10)
    post = dt.datetime(2024, 1, 20)
    rows = []
    # 40 users: heavy baseline spread (x in 10..400), lift = +2.0 for
    # treated users, noise deterministic and tiny
    for u in range(40):
        x = 10.0 * (u + 1)
        lift = 2.0 if u % 2 == 0 else 0.0
        noise = 0.1 * (u % 3)
        rows.append((u, pre, x))
        rows.append((u, post, x + lift + noise))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = drift.cuped_report(ev, "2024-01-15 00:00:00").collect()[0]
    assert out.n_treat == 20 and out.n_ctrl == 20
    assert abs(out.theta_micro - 1_000_000) < 2_000      # theta ~ 1
    assert out.var_reduction_ppm > 990_000               # ~all variance
    assert abs(out.z_plain_micro) < 1_960_000            # lift invisible
    assert out.z_cuped_micro > 1_960_000                 # lift detected
    # degenerate covariate: everyone has x = 0 (no pre-period rows)
    post_only = ev.filter("ts >= TIMESTAMP '2024-01-15 00:00:00'")
    d = drift.cuped_report(post_only, "2024-01-15 00:00:00").collect()[0]
    assert d.theta_micro is None and d.var_reduction_ppm is None
    assert d.z_plain_micro is not None                   # plain z still runs


def test_k_anonymity_flags_k_and_l_independently(spark):
    """Planted classes (r14): a large-but-homogeneous class is
    l_risky only, a small-but-diverse class k_risky only, a safe
    class absent; NULL is a QI value and a NULL sensitive value adds
    no diversity."""
    from pg_parquet_spark.operators import drift

    rows = (
        # qi=('a',1): 6 rows, 1 distinct sensitive -> l_risky only
        [("a", 1, 100)] * 6
        # qi=('b',2): 2 rows, 2 sensitive -> k_risky only
        + [("b", 2, 201), ("b", 2, 202)]
        # qi=('c',3): 5 rows, 3 sensitive -> safe (k=3, l=2)
        + [("c", 3, 301), ("c", 3, 302), ("c", 3, 303),
           ("c", 3, 301), ("c", 3, 302)]
        # qi=(NULL,4): 1 row, sensitive NULL -> both flags
        + [(None, 4, None)]
    )
    df = spark.createDataFrame(rows, "seg string, grp int, cust int")
    got = drift.k_anonymity_report(
        df, ["seg", "grp"], "cust", k=3, l_diversity=2
    ).toPandas()
    by = {(r["seg"], r["grp"]): r for _, r in got.iterrows()}
    assert set(by) == {("a", 1), ("b", 2), (None, 4)}
    assert (by[("a", 1)]["k_risky"], by[("a", 1)]["l_risky"]) == (False, True)
    assert (by[("b", 2)]["k_risky"], by[("b", 2)]["l_risky"]) == (True, False)
    assert (by[(None, 4)]["k_risky"], by[(None, 4)]["l_risky"]) == (True, True)
    assert by[(None, 4)]["n_sensitive"] == 0  # NULL adds no diversity

    summ = drift.k_anonymity_summary(
        df, ["seg", "grp"], "cust", k=3, l_diversity=2
    ).collect()[0]
    assert summ.n_rows == 14 and summ.n_groups == 4
    assert summ.n_risky_groups == 3 and summ.n_risky_rows == 9
    assert summ.suppression_ppm == 9 * 1_000_000 // 14

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        drift.k_anonymity_report(df, ["seg"], "cust", k=1)
    with _pytest.raises(ValueError, match="l_diversity"):
        drift.k_anonymity_report(df, ["seg"], "cust", l_diversity=0)
    with _pytest.raises(ValueError, match="qi_cols"):
        drift.k_anonymity_report(df, [], "cust")
    with _pytest.raises(ValueError, match="not in frame"):
        drift.k_anonymity_report(df, ["seg", "missing"], "cust")


def test_k_anonymity_matches_oracle(spark):
    import duckdb

    from pg_parquet_spark.operators import drift
    from pg_parquet_spark.session import table

    P = 2_592_000
    qi_sql = [
        ("o_orderpriority", "priority"),
        ("o_orderstatus", "status"),
        (f"CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // {P}", "period"),
    ]
    sf = "/root/testdata/sf0.01"
    o = table(spark, sf, "orders").selectExpr(
        "o_orderpriority AS priority",
        "o_orderstatus AS status",
        f"CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div {P} AS period",
        "o_custkey",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    got = drift.k_anonymity_report(
        o, ["priority", "status", "period"], "o_custkey", k=10, l_diversity=5
    ).toPandas()
    want = con.execute(
        drift.k_anonymity_oracle_sql(qi_sql, "o_custkey", k=10, l_diversity=5)
    ).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col]) == list(want[col]), col
    # the gate distinguishes: some groups are safe at sf0.01
    gs = drift.k_anonymity_summary(
        o, ["priority", "status", "period"], "o_custkey", k=10, l_diversity=5
    ).collect()[0]
    ws = con.execute(
        drift.k_anonymity_summary_oracle_sql(
            qi_sql, "o_custkey", k=10, l_diversity=5
        )
    ).df().iloc[0]
    assert (gs.n_rows, gs.n_groups, gs.n_risky_groups, gs.n_risky_rows,
            gs.suppression_ppm) == tuple(ws)
    assert 0 < gs.suppression_ppm < 1_000_000


def test_ks_test_planted_and_ties(spark):
    """KS (r14): hand-computed D on a 3v3 fixture, the smallest-value
    tie rule, identical-sample zero, and the empty-input NULL row."""
    from pg_parquet_spark.operators import drift

    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "value double")
    b = spark.createDataFrame([(3.0,), (4.0,), (5.0,)], "value double")
    r = drift.ks_test(a, b, unit=1).collect()[0]
    # D = 2/3 attained at v=2 and v=3; the rule picks the smallest
    assert tuple(r) == (3, 3, 666666, 2)

    same = drift.ks_test(a, a, unit=1).collect()[0]
    assert same.d_ppm == 0

    empty = a.filter("value > 100")
    nul = drift.ks_test(empty, b, unit=1).collect()[0]
    assert nul.d_ppm is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unit"):
        drift.ks_test(a, b, unit=0)


def test_ks_test_matches_oracle(spark):
    import duckdb

    from pg_parquet_spark.operators import drift
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.01"
    ev = table(spark, sf, "events")
    got = drift.ks_test(
        ev.filter("event_type = 'view'"),
        ev.filter("event_type = 'purchase'"),
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(drift.ks_test_oracle_sql(
        "SELECT value FROM events WHERE event_type = 'view'",
        "SELECT value FROM events WHERE event_type = 'purchase'",
    )).df()
    assert got.values.tolist() == want.values.tolist()
    assert 0 < got["d_ppm"][0] < 1_000_000


def test_auc_hand_computed_with_ties(spark):
    """AUC (r14): the 2v2 fixture with one tied pair gives
    U = 3.5 -> 875000 ppm; perfect separation 1e6; reversed 0;
    degenerate labels NULL."""
    from pg_parquet_spark.operators import drift

    df = spark.createDataFrame(
        [(2.0, True), (3.0, True), (1.0, False), (2.0, False)],
        "s double, y boolean",
    )
    assert tuple(drift.auc_report(df, "s", "y", unit=1).collect()[0]) == (
        2, 2, 875_000,
    )
    perfect = spark.createDataFrame(
        [(5.0, True), (6.0, True), (1.0, False)], "s double, y boolean"
    )
    assert drift.auc_report(perfect, "s", "y").collect()[0].auc_ppm == 1_000_000
    reverse = spark.createDataFrame(
        [(0.0, True), (9.0, False)], "s double, y boolean"
    )
    assert drift.auc_report(reverse, "s", "y").collect()[0].auc_ppm == 0
    onesided = spark.createDataFrame(
        [(1.0, True), (2.0, True)], "s double, y boolean"
    )
    assert drift.auc_report(onesided, "s", "y").collect()[0].auc_ppm is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unit"):
        drift.auc_report(df, "s", "y", unit=0)


def test_auc_matches_oracle(spark):
    import duckdb

    from pg_parquet_spark.operators import drift
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.01"
    got = drift.auc_report(
        table(spark, sf, "documents"), "n_chars", "lang = 'en'"
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        drift.auc_oracle_sql("SELECT * FROM documents", "n_chars",
                             "lang = 'en'")
    ).df()
    assert got.values.tolist() == want.values.tolist()


def test_mutual_information_planted_and_invariance(spark):
    """MI (r14): independent planted pair gives ~0 nats; a determined
    pair gives MI = H(X) = H(Y) and NMI = 1e6; relabeling categories
    changes nothing (the invariance the cross-engine weekday
    numbering relies on); constant-vs-constant reports NULL NMI."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import drift

    # perfectly dependent: y = x, two equiprobable categories
    dep = spark.createDataFrame(
        [("a", "p")] * 4 + [("b", "q")] * 4, "x string, y string"
    )
    r = drift.mutual_information(dep, F.col("x"), F.col("y")).collect()[0]
    # per-cell quantization: 2 cells of floor(0.5*ln2*1e6 + 0.5) =
    # 2 * 346574 = 693148 micro-nats (vs ln2 = 693147.18 — the
    # documented round-before-fold contract)
    assert r.mi_micro == 693148
    assert r.h_x_micro == r.h_y_micro
    assert abs(r.nmi_ppm - 1_000_000) <= 3

    # independent uniform pair -> MI exactly 0 after quantization
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "pq" for _ in range(3)],
        "x string, y string",
    )
    r0 = drift.mutual_information(ind, F.col("x"), F.col("y")).collect()[0]
    assert r0.mi_micro == 0

    # relabel invariance
    relab = dep.select(
        F.concat(F.lit("zz_"), F.col("x")).alias("x"), "y"
    )
    r2 = drift.mutual_information(relab, F.col("x"), F.col("y")).collect()[0]
    assert (r2.mi_micro, r2.nmi_ppm) == (r.mi_micro, r.nmi_ppm)

    const = spark.createDataFrame([("k", "k")] * 5, "x string, y string")
    rc = drift.mutual_information(const, F.col("x"), F.col("y")).collect()[0]
    assert rc.nmi_ppm is None and rc.mi_micro == 0


def test_mutual_information_matches_oracle(spark):
    import duckdb
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import drift
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.01"
    got = drift.mutual_information(
        table(spark, sf, "events"), F.col("event_type"), F.dayofweek("ts")
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(
        drift.mutual_information_oracle_sql("event_type", "dayofweek(ts)")
    ).df()
    assert got.values.tolist() == want.values.tolist()


def test_mutual_information_null_is_a_category(spark):
    """Review (r14): NULL-category cells must ride the MI sum like any
    other cell (null-safe margin joins in BOTH engines) — a perfectly
    dependent pair where one category IS NULL reports full NMI, and
    relabeling NULL to 'missing' changes nothing."""
    import duckdb
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import drift

    dep = spark.createDataFrame(
        [("a", "p")] * 4 + [(None, None)] * 4, "x string, y string"
    )
    r = drift.mutual_information(dep, F.col("x"), F.col("y")).collect()[0]
    assert r.mi_micro == 693148           # 2 cells of 0.5*ln2
    assert r.nmi_ppm == 1_000_000
    relab = dep.select(F.coalesce("x", F.lit("missing")).alias("x"),
                       F.coalesce("y", F.lit("missing")).alias("y"))
    r2 = drift.mutual_information(relab, F.col("x"), F.col("y")).collect()[0]
    assert (r2.mi_micro, r2.nmi_ppm) == (r.mi_micro, r.nmi_ppm)

    # and the oracle agrees on the NULL-bearing table
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT * FROM (VALUES ('a', 'p'), ('a', 'p'), "
        "('a', 'p'), ('a', 'p'), (NULL, NULL), (NULL, NULL), "
        "(NULL, NULL), (NULL, NULL)) v(x, y)"
    )
    want = con.execute(
        drift.mutual_information_oracle_sql("x", "y", table="t")
    ).df()
    assert (want["mi_micro"][0], want["nmi_ppm"][0]) == (693148, 1_000_000)


def test_k_anonymity_null_qi_orders_identically(spark):
    """Review (r14): Spark sorts NULLS FIRST, DuckDB defaults last —
    the oracle pins NULLS FIRST so a NULL QI class lands in the same
    row position on both engines."""
    import duckdb

    from pg_parquet_spark.operators import drift

    rows = [(None, 1, 1), ("a", 1, 2), ("z", 1, 3)]
    df = spark.createDataFrame(rows, "seg string, grp int, cust int")
    got = drift.k_anonymity_report(
        df, ["seg", "grp"], "cust", k=2, l_diversity=2
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT * FROM (VALUES (NULL, 1, 1), ('a', 1, 2), "
        "('z', 1, 3)) v(seg, grp, cust)"
    )
    want = con.execute(
        drift.k_anonymity_oracle_sql(
            [("seg", "seg"), ("grp", "grp")], "cust",
            k=2, l_diversity=2, table="t",
        )
    ).df()
    assert list(got["seg"].fillna("~")) == list(want["seg"].fillna("~"))
    assert got["seg"].isna().iloc[0]  # NULL class first on BOTH engines

    import pytest as _pytest

    with _pytest.raises(ValueError, match="qi_cols"):
        drift.k_anonymity_summary(df, [], "cust")
    with _pytest.raises(ValueError, match="not in frame"):
        drift.k_anonymity_summary(df, ["missing"], "cust")
