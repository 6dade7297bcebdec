"""Prefix-filtered exact set-similarity join: oracle equality (which IS
the completeness proof — the oracle is the all-pairs join) at both SFs
and at two thresholds, plus a hand-built recall edge case."""

import duckdb
import pytest

from pg_parquet_spark.operators import setsim
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _con(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("sf", SFS)
@pytest.mark.parametrize("theta", [500_000, 300_000])
def test_jaccard_join_matches_all_pairs_oracle(spark, sf, theta):
    docs = table(spark, sf, "documents")
    got = setsim.jaccard_join(docs, threshold_ppm=theta).toPandas()
    want = _con(sf).execute(
        setsim.jaccard_join_oracle_sql(threshold_ppm=theta)
    ).df()
    assert len(got) == len(want) > 0
    for col in ("id_a", "id_b", "inter_n", "union_n", "jacc_ppm"):
        assert list(got[col]) == list(want[col]), (col, theta)


def test_prefix_boundary_pair_not_missed(spark):
    """A pair exactly AT the threshold whose shared tokens are the
    COMMONEST (so they sit at the very end of the frequency order —
    the worst case for prefix filtering) must still be found."""
    # x and y: 4 tokens each, 3 shared → J = 3/5 = 0.6
    # shared tokens appear in every doc (maximally frequent)
    rows = [
        (1, "common1 common2 common3 onlyx"),
        (2, "common1 common2 common3 onlyy"),
        (3, "common1 common2 common3 zfill1"),
        (4, "common1 common2 common3 zfill2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = setsim.jaccard_join(df, threshold_ppm=600_000).toPandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    # every doc pair shares 3 of 5 distinct → all 6 pairs qualify at 0.6
    assert pairs == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    assert set(got["jacc_ppm"]) == {600_000}


@pytest.mark.parametrize("sf", SFS)
def test_containment_join_matches_allpairs_oracle(spark, sf):
    """r11: the prefix-probed containment join equals the quadratic
    all-pairs oracle exactly — the completeness proof."""
    docs = table(spark, sf, "documents").select("doc_id", "text")
    got = setsim.containment_join(docs, threshold_ppm=800_000).toPandas()
    want = _con(sf).execute(
        setsim.containment_join_oracle_sql(threshold_ppm=800_000)
    ).df()
    assert len(got) == len(want)
    for c in ("id_a", "id_b", "inter_n", "min_n", "containment_ppm"):
        assert list(got[c]) == list(want[c]), c


def test_containment_catches_quote_jaccard_misses(spark):
    """The tier's reason to exist: a short doc quoted verbatim inside
    a long one has containment 1.0 but Jaccard far below any near-dup
    threshold."""
    quote = "the quarterly revenue rose nine percent beating forecasts"
    filler = " ".join(f"word{i}" for i in range(200))
    df = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote),
            (3, "wholly unrelated content about gardening"),
        ],
        "doc_id long, text string",
    )
    cont = setsim.containment_join(df, threshold_ppm=900_000).collect()
    assert [(r.id_a, r.id_b, r.containment_ppm) for r in cont] == [
        (1, 2, 1_000_000)
    ]
    jac = setsim.jaccard_join(df, threshold_ppm=500_000).collect()
    assert jac == []  # jaccard ~ 8/208, blind to the quote


@pytest.mark.parametrize("join_fn,theta", [
    (setsim.jaccard_join, 500_000),
    (setsim.containment_join, 800_000),
])
def test_mask_verify_equals_array_verify(spark, monkeypatch, join_fn, theta):
    """r14 optimization: a ≤64-token vocabulary swaps the verify stage
    to 64-bit membership masks (bit_count over AND). The mask and
    array representations must produce IDENTICAL pair sets and ppm
    values — forced by running the same small-vocab corpus through
    both paths (the array path forced via _MASK_VOCAB_MAX=0)."""
    docs = table(spark, SFS[0], "documents").select("doc_id", "text")
    got_mask = sorted(map(tuple, join_fn(docs, threshold_ppm=theta).collect()))
    monkeypatch.setattr(setsim, "_MASK_VOCAB_MAX", 0)
    got_arr = sorted(map(tuple, join_fn(docs, threshold_ppm=theta).collect()))
    assert got_mask == got_arr and len(got_mask) > 0


def test_composed_joins_keep_caches_single_pass(spark):
    """ADVICE r12: building a SECOND setsim join before collecting the
    first must not unpersist the first's still-lazy ranked/arrs frames
    (the entry-time release-all did exactly that — results stayed
    correct, the single-pass contract silently broke and the first
    join's explode+rank pipeline re-ran at collect time). The registry
    now trims FIFO past _CACHE_KEEP, the drift.py convention. The
    assertion: corpus-feed ticks for build-A,collect-A,build-B,
    collect-B (sequential baseline) equal ticks for build-A,build-B,
    collect-A,collect-B (composed)."""
    from pg_parquet_spark.session import table as _table

    setsim.release_cached()
    docs = (
        _table(spark, SFS[0], "documents")
        .select("doc_id", "text")
        .localCheckpoint()  # freeze upstream so only OUR wrapper ticks
    )

    def run(composed: bool) -> int:
        acc = spark.sparkContext.accumulator(0)

        def ticking(it):
            for pdf in it:
                acc.add(len(pdf))
                yield pdf

        feed = docs.mapInPandas(ticking, "doc_id long, text string")
        a = setsim.jaccard_join(feed.filter("doc_id % 2 = 0"))
        if composed:
            b = setsim.jaccard_join(feed.filter("doc_id % 2 = 1"))
            assert a.count() >= 0 and b.count() >= 0
        else:
            assert a.count() >= 0
            b = setsim.jaccard_join(feed.filter("doc_id % 2 = 1"))
            assert b.count() >= 0
        setsim.release_cached()
        return acc.value

    sequential = run(composed=False)
    composed = run(composed=True)
    assert composed == sequential, (
        f"composed build re-evaluated the corpus feed: {composed} ticks "
        f"vs sequential {sequential}"
    )
