"""Property-based checks for the r6 layout/curation tier (hypothesis
where a pure-Python reference exists, repartition-sweeps where the
property is cluster-shape invariance)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pg_parquet_spark.session import table
from pg_parquet_spark.sources.layout import _spread_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# pure-Python properties (no Spark session needed)

@given(st.integers(min_value=0, max_value=255), st.integers(min_value=0, max_value=255))
def test_spread_table_interleave_is_bijective_and_ordered(x, y):
    """Morton code built from the spread table is a bijection on the
    bucket grid, and fixing one dimension makes it monotone in the
    other (the property that lets contiguous z-ranges map to bounded
    rectangles — the data-skipping guarantee)."""
    s = _spread_table(8, 2)
    z = s[x] + (s[y] << 1)
    # reconstruct both coordinates from z — bijectivity
    rx = sum(((z >> (2 * b)) & 1) << b for b in range(8))
    ry = sum(((z >> (2 * b + 1)) & 1) << b for b in range(8))
    assert (rx, ry) == (x, y)
    # monotone in x when y fixed
    if x < 255:
        assert s[x + 1] + (s[y] << 1) > z


@given(st.integers(min_value=1, max_value=6), st.integers(min_value=2, max_value=4))
def test_spread_table_bits_disjoint_across_dims(bits, d):
    """Each dimension's spread occupies disjoint bit positions, so
    summing shifted spreads never carries between dimensions."""
    s = _spread_table(bits, d)
    masks = [(s[(1 << bits) - 1] << i) for i in range(d)]
    for i in range(d):
        for j in range(i + 1, d):
            assert masks[i] & masks[j] == 0


# ---------------------------------------------------------------------------
# Spark-side invariance properties

def test_cap_per_group_partition_invariant_and_bounded(spark):
    """The kept set is identical regardless of input partitioning, and
    no group exceeds the cap."""
    from pg_parquet_spark.operators.sampling import cap_per_group

    docs = table(spark, SF, "documents")
    baseline = sorted(
        r.doc_id
        for r in cap_per_group(docs, "source", "doc_id", 7).select("doc_id").collect()
    )
    for n in (1, 5, 17):
        got = sorted(
            r.doc_id
            for r in cap_per_group(docs.repartition(n), "source", "doc_id", 7)
            .select("doc_id")
            .collect()
        )
        assert got == baseline, f"kept set changed at repartition({n})"
    sizes = (
        cap_per_group(docs, "source", "doc_id", 7)
        .groupBy("source")
        .count()
        .collect()
    )
    assert all(r["count"] <= 7 for r in sizes)


def test_c4_clean_is_idempotent(spark):
    """Cleaning already-cleaned text changes nothing: every surviving
    line still ends in terminal punctuation with ≥5 words."""
    from pg_parquet_spark.operators.text import c4_clean

    docs = table(spark, SF, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(".\nThis trailer sentence is long enough to keep."),
            F.lit("\nshort junk"),
            F.lit("\nAnother proper trailer sentence with enough words."),
        ).alias("text"),
    )
    once = c4_clean(docs).select("doc_id", F.col("clean_text").alias("text"))
    twice = c4_clean(once)
    diff = (
        twice.filter(F.col("clean_text") != F.col("text")).count()
    )
    assert diff == 0


def test_tfidf_partition_invariant(spark):
    """Top-k term selection is identical under arbitrary repartitioning
    (the rounded-score + term tie-break guarantee)."""
    from pg_parquet_spark.operators.text import tfidf_top_terms

    docs = table(spark, SF, "documents")
    base = sorted(
        (r.doc_id, r.rank, r.term)
        for r in tfidf_top_terms(docs, k=3).collect()
    )
    shuffled = sorted(
        (r.doc_id, r.rank, r.term)
        for r in tfidf_top_terms(docs.repartition(13), k=3).collect()
    )
    assert base == shuffled


def test_merge_upsert_matches_reference_semantics(spark, tmp_path):
    """merge_upsert ≡ (base minus updated keys) ∪ updates, computed by
    an independent pandas reference on the same inputs."""
    from pg_parquet_spark.sources.layout import merge_upsert

    docs = table(spark, SF, "documents").select("doc_id", "text", "lang")
    base = str(tmp_path / "base")
    docs.write.parquet(base)
    updates = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .withColumn("text", F.concat(F.lit("v2 "), F.col("text")))
    )
    base_pdf = docs.toPandas().set_index("doc_id")
    upd_pdf = updates.toPandas().set_index("doc_id")
    expected = upd_pdf.combine_first(base_pdf)  # updates win on key clash

    merge_upsert(spark, base, updates, ["doc_id"])
    got = spark.read.parquet(base).toPandas().set_index("doc_id").sort_index()
    expected = expected.sort_index()
    assert list(got.index) == list(expected.index)
    assert (got["text"] == expected["text"]).all()


def test_pack_and_chunk_counts_consistent(spark):
    """Cross-operator invariant: total chunk tokens ≈ doc tokens (the
    overlap grid accounts exactly for the duplicated spans)."""
    from pg_parquet_spark.operators.text import chunk_documents

    docs = table(spark, SF, "documents").limit(50)
    chunk_tokens, overlap = 64, 16
    step = chunk_tokens - overlap
    chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens, overlap)
    per_doc = {
        r.doc_id: (r.n_chunks, r.total)
        for r in chunks.groupBy("doc_id")
        .agg(F.count("*").alias("n_chunks"), F.sum("n_tokens").alias("total"))
        .collect()
    }
    for r in docs.select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n")
    ).collect():
        n_chunks, total = per_doc[r.doc_id]
        expect_chunks = max(math.ceil((r.n - overlap) / step), 1)
        assert n_chunks == expect_chunks
        # every token counted once, plus `overlap` extra per chunk seam
        assert total == r.n + (n_chunks - 1) * overlap


# ---------------------------------------------------------------------------
# r7: replay/convergence properties of the maintenance tier


@given(
    replay_seq=st.lists(
        st.integers(min_value=0, max_value=3), min_size=1, max_size=8
    )
)
@settings(max_examples=8, deadline=None)
def test_sink_converges_under_any_replay_sequence(replay_seq, spark, tmp_path_factory):
    """Effectively-once property: for ANY sequence of batch (re)plays —
    including repeats, out-of-order replays, and partial-then-full
    replays — the landed dataset equals exactly one copy of each
    batch's final rows. Hypothesis drives the replay order."""
    from pg_parquet_spark.streaming.stream import partitioned_batch_writer

    events = table(spark, SF, "events").select("event_id", "event_type", "value")
    batches = {
        i: events.filter(F.col("event_id") % 4 == i) for i in range(4)
    }
    sink = str(tmp_path_factory.mktemp("replay") / "sink")
    write = partitioned_batch_writer(sink, ["event_type"])
    played = set()
    for b in replay_seq:
        write(batches[b], b)
        played.add(b)
    import functools

    want = functools.reduce(
        lambda a, c: a.unionByName(c), (batches[b] for b in played)
    )
    back = spark.read.parquet(sink).select(*events.columns)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_merge_upsert_is_idempotent(spark, tmp_path):
    """Re-running the SAME merge converges: the second application
    changes nothing (the property that makes the crash-recovery story
    'just re-run the job')."""
    from pg_parquet_spark.sources.layout import merge_upsert

    docs = table(spark, SF, "documents").select("doc_id", "text", "lang")
    base = str(tmp_path / "idem")
    docs.write.partitionBy("lang").parquet(base)
    updates = (
        docs.filter(F.col("lang") == "en")
        .limit(4)
        .withColumn("text", F.lit("v2"))
    )
    merge_upsert(spark, base, updates, ["doc_id"], partition_col="lang")
    first = sorted(map(tuple, spark.read.parquet(base).collect()))
    merge_upsert(spark, base, updates, ["doc_id"], partition_col="lang")
    second = sorted(map(tuple, spark.read.parquet(base).collect()))
    assert first == second


# ---------------------------------------------------------------------------
# r11 properties


@given(
    st.integers(min_value=0, max_value=1_000_000),
    st.integers(min_value=0, max_value=16_777_215),
)
def test_split_bucket_range_division_share_is_tight(valid_ppm, prefix):
    """The range-division ppm bucket (ADVICE r10 fix): membership of a
    2^24 prefix in the valid slice is exactly `prefix < ceil(ppm·2^24 /
    1e6)`, so the realized share |{p : (p·1e6)>>24 < ppm}| / 2^24 is
    within 2^-24·1e6 < 0.06 ppm-units of the request — the modulo
    version was off by up to ~13,000 ppm-units (1.3%)."""
    bucket = (prefix * 1_000_000) >> 24
    cutoff = -((-valid_ppm * 16_777_216) // 1_000_000)  # ceil
    assert (bucket < valid_ppm) == (prefix < cutoff)
    share_ppm = cutoff * 1_000_000 / 16_777_216
    assert abs(share_ppm - valid_ppm) < 1.0


@settings(deadline=None, max_examples=8)
@given(rng=st.randoms(use_true_random=False))
def test_containment_join_is_token_order_invariant(spark, rng):
    """containment_join works on DISTINCT token sets, so shuffling the
    words inside every document changes nothing — the property that
    separates the set tier from the sequence (shingle) tiers."""
    from pg_parquet_spark.operators import setsim

    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(12):
        k = rng.randint(3, 12)
        toks = rng.sample(vocab, k)
        rows.append((i, " ".join(toks), toks))
    df1 = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    shuffled = []
    for i, _t, toks in rows:
        t2 = toks[:]
        rng.shuffle(t2)
        shuffled.append((i, " ".join(t2)))
    df2 = spark.createDataFrame(shuffled, "doc_id long, text string")
    a = [tuple(r) for r in setsim.containment_join(df1, threshold_ppm=600_000).collect()]
    b = [tuple(r) for r in setsim.containment_join(df2, threshold_ppm=600_000).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# r13 retrieval-metric properties (pure-Python references)

def test_evaluate_retrieval_matches_python_reference(spark):
    """Seeded-random runs and qrels: the engine's integer metric
    algebra (recall/MRR/DCG/nDCG over the shared literal discount
    table) equals a direct pure-Python computation."""
    import random

    from pg_parquet_spark.operators import similarity

    k = 10
    disc = similarity._dcg_discounts_micro(k)
    prefix = [sum(disc[: i + 1]) for i in range(k)]
    rng = random.Random(13)
    for trial in range(5):
        runs, qrels, expected = [], [], {}
        for q in range(4):
            docs = rng.sample(range(40), rng.randint(1, 12))
            rels = set(rng.sample(range(40), rng.randint(1, 15)))
            runs += [(q, d, r) for r, d in enumerate(docs, start=1)]
            qrels += [(q, d) for d in sorted(rels)]
            hits = [r for r, d in enumerate(docs[:k], start=1) if d in rels]
            n_rel = len(rels)
            dcg = sum(disc[r - 1] for r in hits)
            idcg = prefix[min(n_rel, k) - 1]
            expected[q] = (
                n_rel,
                len(hits),
                len(hits) * 1_000_000 // n_rel,
                0 if not hits else 1_000_000 // hits[0],
                dcg,
                idcg,
                dcg * 1_000_000 // idcg,
            )
        run_df = spark.createDataFrame(
            runs, "query_id long, doc_id long, rank long"
        )
        qrel_df = spark.createDataFrame(qrels, "query_id long, doc_id long")
        got = {
            r.query_id: (
                r.n_rel, r.hits, r.recall_ppm, r.mrr_micro,
                r.dcg_micro, r.idcg_micro, r.ndcg_ppm,
            )
            for r in similarity.evaluate_retrieval(
                run_df, qrel_df, k=k
            ).collect()
        }
        assert got == expected, trial


@given(
    st.lists(
        st.floats(
            min_value=-4.0, max_value=4.0, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=70,
    )
)
@settings(max_examples=50, deadline=None)
def test_binary_quantize_word_pack_python_reference(vec):
    """The 32-bit Horner word packing (sign bits, reversed-slice fold)
    agrees with a direct bit-shift reference for any float vector —
    the cross-engine contract both the Spark fold and the DuckDB
    list_reduce implement."""
    words_ref = []
    for w in range(0, len(vec), 32):
        chunk = vec[w : w + 32]
        word = 0
        for i, x in enumerate(chunk):
            if x > 0:
                word |= 1 << i
        words_ref.append(word)
    # Horner over the REVERSED slice (the engine/oracle form)
    words_horner = []
    for w in range(0, len(vec), 32):
        chunk = vec[w : w + 32]
        acc = 0
        for x in reversed(chunk):
            acc = acc * 2 + (1 if x > 0 else 0)
        words_horner.append(acc)
    assert words_ref == words_horner
