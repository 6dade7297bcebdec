"""Mergeable sketches (KMV distinct-count, count-min frequency):
DuckDB-oracle equality at both local SFs, the merge/closure properties,
and the count-min never-undercounts guarantee."""

import duckdb
import pytest

from pg_parquet_spark.operators import sketch
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _con(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    return con


@pytest.mark.parametrize("sf", SFS)
def test_kmv_matches_duckdb_oracle(spark, sf):
    """k=8 < per-group distinct counts, so the ESTIMATION branch (not
    the exact small-group path) is what the oracle verifies."""
    events = table(spark, sf, "events")
    got = sketch.kmv_distinct(events, "event_type", "user_id", k=8).toPandas()
    want = _con(sf).execute(
        sketch.kmv_oracle_sql("event_type", "user_id", k=8)
    ).df()
    assert len(got) == len(want) > 0
    for col in ("grp", "n_kept", "kth_min", "est_milli"):
        assert list(got[col]) == list(want[col]), col


def test_kmv_exact_below_k_and_estimate_sane(spark):
    """Groups with < k distinct values report exactly; the __ALL__
    estimate lands within KMV's expected error band of the true count."""
    sf = SFS[1]
    events = table(spark, sf, "events")
    big_k = sketch.kmv_distinct(events, "event_type", "user_id", k=512).toPandas()
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg({"user_id": "count"})
        .withColumnRenamed("count(user_id)", "n")
        .collect()
    }
    truth = (
        events.select("event_type", "user_id").distinct().groupBy("event_type").count()
    )
    truth = {r["event_type"]: r["count"] for r in truth.collect()}
    for _, row in big_k.iterrows():
        if row.grp == "__ALL__":
            continue
        assert row.est_milli == truth[row.grp] * 1000  # exact path

    est = sketch.kmv_distinct(events, "event_type", "user_id", k=32).toPandas()
    all_row = est[est.grp == "__ALL__"].iloc[0]
    true_all = events.select("user_id").distinct().count()
    assert 0.6 * true_all <= all_row.est_milli / 1000.0 <= 1.4 * true_all


def test_kmv_merge_closure(spark):
    """sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)) — the roll-up
    property that makes per-day / per-partition sketches composable."""
    sf = SFS[0]
    events = table(spark, sf, "events")
    a = events.filter("event_id % 2 = 0")
    b = events.filter("event_id % 2 = 1")
    direct = (
        sketch.kmv_sketch(events, "event_type", "user_id", k=8)
        .orderBy("grp", "h")
        .collect()
    )
    merged = (
        sketch.kmv_merge(
            sketch.kmv_sketch(a, "event_type", "user_id", k=8),
            sketch.kmv_sketch(b, "event_type", "user_id", k=8),
            k=8,
        )
        .orderBy("grp", "h")
        .collect()
    )
    assert [tuple(r) for r in direct] == [tuple(r) for r in merged]


@pytest.mark.parametrize("sf", SFS)
def test_cms_matches_duckdb_oracle(spark, sf):
    events = table(spark, sf, "events")
    got = sketch.cms_heavy_hitters(events, "user_id", top_k=10).toPandas()
    want = _con(sf).execute(sketch.cms_oracle_sql("user_id", top_k=10)).df()
    assert len(got) == len(want) > 0
    assert list(got["key"]) == list(want["key"])
    assert list(got["est"]) == list(want["est"])


def test_cms_never_undercounts_and_merges(spark):
    sf = SFS[0]
    events = table(spark, sf, "events")
    est = sketch.cms_estimate(
        sketch.cms_sketch(events, "user_id"), events, "user_id"
    ).toPandas()
    exact = {
        str(r["user_id"]): r["count"]
        for r in events.groupBy("user_id").count().collect()
    }
    assert len(est) == len(exact)
    for _, row in est.iterrows():
        assert row.est >= exact[row.key], row.key

    a = events.filter("event_id % 2 = 0")
    b = events.filter("event_id % 2 = 1")
    merged = (
        sketch.cms_merge(
            sketch.cms_sketch(a, "user_id"), sketch.cms_sketch(b, "user_id")
        )
        .orderBy("d", "bucket")
        .collect()
    )
    direct = sketch.cms_sketch(events, "user_id").orderBy("d", "bucket").collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in merged]


# --------------------------------------------------------------------------
# HDR quantile sketch
# --------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_hdr_quantiles_match_duckdb_oracle(spark, sf):
    """Full (grp, q_ppm, est_milli) table — including the merged
    __ALL__ rows — replicates bit-for-bit in DuckDB: the bucket map,
    the integer rank selection, and the lower-bound inverse are all
    pure-integer arithmetic."""
    events = table(spark, sf, "events")
    got = sketch.hdr_quantile_table(events, "event_type", "value").toPandas()
    want = _con(sf).execute(sketch.hdr_oracle_sql("event_type", "value")).df()
    assert len(got) == len(want) > 0
    for col in ("grp", "q_ppm", "est_milli"):
        assert list(got[col]) == list(want[col]), col


def test_hdr_error_bound_vs_exact_quantile(spark):
    """est is the bucket lower bound, so est ≤ true ≤ est·(1+2⁻ˢ) (+1
    milli for the unit rounding) — the documented guarantee, checked
    against DuckDB's exact discrete quantiles at every requested q."""
    sf = SFS[1]
    events = table(spark, sf, "events")
    got = sketch.hdr_quantile_table(events, "event_type", "value").toPandas()
    exact = (
        _con(sf)
        .execute(
            """
            SELECT CAST(event_type AS VARCHAR) AS grp, q_ppm,
                   CAST(floor(q * 1000 + 0.5) AS BIGINT) AS true_milli
            FROM (
              SELECT event_type, 500000 AS q_ppm,
                     quantile_disc(value, 0.5) AS q FROM events GROUP BY 1
              UNION ALL
              SELECT event_type, 900000, quantile_disc(value, 0.9)
              FROM events GROUP BY 1
              UNION ALL
              SELECT event_type, 990000, quantile_disc(value, 0.99)
              FROM events GROUP BY 1
            )
            """
        )
        .df()
    )
    merged = got.merge(exact, on=["grp", "q_ppm"])
    assert len(merged) == len(got) - 3  # __ALL__ rows have no exact twin here
    for _, r in merged.iterrows():
        assert r.est_milli <= r.true_milli <= r.est_milli * (1 + 2**-5) + 1, (
            r.grp,
            r.q_ppm,
        )


def test_hdr_merge_closure_and_small_value_exactness(spark):
    """merge(sketch(A), sketch(B)) ≡ sketch(A∪B) exactly; values below
    2^(s+1) land in per-value buckets, so their quantiles are EXACT."""
    sf = SFS[0]
    events = table(spark, sf, "events")
    a = events.filter("event_id % 2 = 0")
    b = events.filter("event_id % 2 = 1")
    m = sketch.hdr_merge(
        sketch.hdr_sketch(a, "event_type", "value"),
        sketch.hdr_sketch(b, "event_type", "value"),
    )
    full = sketch.hdr_sketch(events, "event_type", "value")
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, full.collect()))

    # small-value exactness: integers 0..20 in unit=1 → bucket == value
    small = spark.range(0, 21).selectExpr("'g' AS g", "id AS v")
    q = sketch.hdr_quantile_table(
        small, "g", "v", qs_ppm=(500_000,), unit=1
    ).toPandas()
    assert q[q.grp == "g"].est_milli.iloc[0] == 10  # exact median


def test_hdr_rejects_negative_values(spark):
    neg = spark.range(0, 5).selectExpr("'g' AS g", "cast(id - 3 as double) AS v")
    with pytest.raises(Exception, match="non-negative"):
        sketch.hdr_quantile_table(neg, "g", "v").collect()


@pytest.mark.parametrize("sf", SFS)
def test_equi_depth_binning_matches_oracle_and_balances(spark, sf):
    """Full per-row bin assignment replicates in DuckDB (same sketch,
    same interior-quantile edges, same strictly-below count); bins are
    equi-depth within the sketch's 2⁻ˢ error (≤1.6× imbalance here)."""
    ev = table(spark, sf, "events")
    got = sketch.assign_quantile_bins(ev, "event_type", "value").toPandas()
    want = _con(sf).execute(
        sketch.binning_oracle_sql("event_type", "value")
    ).df()
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c
    sizes = got.groupby(["grp", "bin"]).size()
    assert got.bin.nunique() == 4
    imbalance = sizes.groupby(level=0).apply(lambda s: s.max() / s.min())
    assert float(imbalance.max()) < 1.6


@pytest.mark.parametrize("sf", SFS)
def test_kmv_overlap_matches_oracle_and_error_band(spark, sf):
    """Join-cardinality estimation from two sketches: the full estimate
    table replicates bit-for-bit (hashes + positive-integer division),
    and the intersection estimate lands in KMV's error band of the
    exact |A∩B| per group."""
    ev = table(spark, sf, "events")
    a, b = ev.filter("value < 250"), ev.filter("value >= 100")
    got = sketch.kmv_overlap(a, b, "event_type", "user_id", k=32).toPandas()
    con = _con(sf)
    want = con.execute(
        sketch.kmv_overlap_oracle_sql(
            "SELECT * FROM events WHERE value < 250",
            "SELECT * FROM events WHERE value >= 100",
            "event_type",
            "user_id",
            k=32,
        )
    ).df()
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c
    exact = (
        con.execute(
            """
            SELECT CAST(event_type AS VARCHAR) grp, COUNT(DISTINCT user_id) n
            FROM (
              SELECT event_type, user_id FROM events WHERE value < 250
              INTERSECT
              SELECT event_type, user_id FROM events WHERE value >= 100
            ) GROUP BY 1
            """
        )
        .df()
        .set_index("grp")
        .n
    )
    for _, r in got.iterrows():
        true = exact.get(r.grp, 0)
        est = r.inter_est_milli / 1000
        assert 0.4 * true <= est <= 1.8 * true or abs(est - true) < 20, (
            r.grp,
            est,
            true,
        )


def test_kmv_overlap_disjoint_sets(spark):
    """Disjoint inputs: matches 0, Jaccard 0, intersection 0 exactly."""
    ev = table(spark, SFS[0], "events")
    a = ev.filter("user_id % 2 = 0")
    b = ev.filter("user_id % 2 = 1")
    got = sketch.kmv_overlap(a, b, "event_type", "user_id", k=16).toPandas()
    assert (got.matches == 0).all()
    assert (got.inter_est_milli == 0).all()
