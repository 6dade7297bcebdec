"""Tokenizer-prep operators (vocab induction, BPE pair statistics):
oracle equality at both SFs and hand-checkable toy semantics."""

import duckdb
import pytest

from pg_parquet_spark.operators import text
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _con(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("sf", SFS)
def test_vocab_matches_duckdb_oracle(spark, sf):
    docs = table(spark, sf, "documents")
    got = text.vocab_top_terms(docs, top_k=40).toPandas()
    want = _con(sf).execute(text.vocab_oracle_sql(top_k=40)).df()
    assert len(got) == len(want) > 0
    assert list(got["term"]) == list(want["term"])
    assert list(got["n"]) == list(want["n"])


@pytest.mark.parametrize("sf", SFS)
def test_bpe_pairs_match_duckdb_oracle(spark, sf):
    docs = table(spark, sf, "documents")
    got = text.bpe_pair_counts(docs, top_k=40).toPandas()
    want = _con(sf).execute(text.bpe_pair_oracle_sql(top_k=40)).df()
    assert len(got) == len(want) > 0
    assert list(got["pair"]) == list(want["pair"])
    assert list(got["n"]) == list(want["n"])


def test_toy_semantics(spark):
    df = spark.createDataFrame(
        [("a b a b c",), ("a b x",), ("z",)], "text string"
    )
    vocab = text.vocab_top_terms(df, top_k=10).toPandas()
    assert list(vocab["term"])[:2] == ["a", "b"]  # 3 each, tie → alpha
    assert list(vocab["n"])[:2] == [3, 3]
    pairs = text.bpe_pair_counts(df, top_k=10).toPandas()
    assert pairs.iloc[0]["pair"] == "a b" and pairs.iloc[0]["n"] == 3
    # single-token row contributes no pair
    assert "z" not in " ".join(pairs["pair"])


# --------------------------------------------------------------------------
# Sequence packing
# --------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_token_stream_matches_duckdb_oracle(spark, sf):
    """The distributed two-pass prefix sum reproduces the single-window
    DuckDB formulation column-for-column."""
    docs = table(spark, sf, "documents")
    got = text.token_stream_layout(docs, context_len=512).toPandas()
    want = _con(sf).execute(text.token_stream_oracle_sql(context_len=512)).df()
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c


def test_token_stream_partition_independent(spark):
    """token_start must not depend on where range partition boundaries
    fall — the property that makes the two-pass scan safe under
    repartitioning and AQE coalescing."""
    docs = table(spark, SFS[1], "documents")
    base = text.token_stream_layout(docs, context_len=512).toPandas()
    for n in (1, 4, 32):
        alt = text.token_stream_layout(docs.repartition(n), context_len=512).toPandas()
        assert base.equals(alt), n


def test_token_stream_semantics_on_fixture(spark):
    """Hand-checkable: 3+4+2 tokens at C=5 — doc b starts at 3, crosses
    the first window edge; doc c starts bin 1 flush at pos 2."""
    rows = [(1, "a b c"), (2, "d e f g"), (3, "h i")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.asDict()
        for r in text.token_stream_layout(df, context_len=5).collect()
    }
    assert got[1]["token_start"] == 0 and not got[1]["spans_boundary"]
    assert got[2]["bin_id"] == 0 and got[2]["bin_pos"] == 3
    assert got[2]["spans_boundary"]
    assert got[3]["bin_id"] == 1 and got[3]["bin_pos"] == 2
    assert not got[3]["spans_boundary"]

    s = text.stream_bins_summary(text.token_stream_layout(df, context_len=5)).toPandas()
    assert s.tokens_started.sum() == 9
    assert s.n_crossers.sum() == 1


@pytest.mark.parametrize("sf", SFS)
def test_pmi_collocations_match_oracle(spark, sf):
    """PMI phrase mining (r10): the top-k pair table (counts + micro-nat
    PMI) replicates bit-exactly; N is collected Spark-side and
    SQL-derived oracle-side — identical exact integers."""
    import duckdb

    from pg_parquet_spark.operators import text as text_ops
    from pg_parquet_spark.session import table as t_

    docs = t_(spark, sf, "documents")
    got = text_ops.pmi_collocations(docs, min_count=3, k=40).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(text_ops.pmi_oracle_sql(min_count=3, k=40)).df()
    assert len(got) == len(want) > 0
    for c in ("w1", "w2", "c", "pmi_micro"):
        assert list(got[c]) == list(want[c]), c


def test_pmi_prefers_exclusive_pairs_over_frequent_ones(spark):
    """The design claim: a pair whose members occur ONLY together
    outranks a more frequent pair built from promiscuous words."""
    rows = []
    for i in range(30):
        # "is" and "the" are promiscuous (several distinct neighbors);
        # only san→francisco is a fully exclusive pair
        rows.append((i, "san francisco is of the is of the"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        __import__("pg_parquet_spark.operators.text", fromlist=["x"])
        .pmi_collocations(df, min_count=3, k=5)
        .toPandas()
    )
    top = (got.w1.iloc[0], got.w2.iloc[0])
    assert top == ("san", "francisco")
    ofthe = got[(got.w1 == "of") & (got.w2 == "the")]
    assert len(ofthe) == 1 and ofthe.pmi_micro.iloc[0] < got.pmi_micro.iloc[0]


@pytest.mark.parametrize("sf", SFS)
def test_vocab_zipf_matches_oracle(spark, sf):
    """r12: the Zipf corpus-health diagnostic replicates bit-for-bit —
    distributed vocab rank, micro-nat quantization before the exact
    DECIMAL moment sums, one fixed IEEE least-squares sequence on
    both engines."""
    docs = table(spark, sf, "documents")
    got = text.vocab_zipf(docs).toPandas()
    want = _con(sf).execute(text.vocab_zipf_oracle_sql()).df()
    assert got.values.tolist() == want.values.tolist()
    # the templated synthetic corpus is far from Zipfian (slope ~ -0.18,
    # natural text ~ -1): exactly the signal the diagnostic exists for
    assert -1_000_000 < int(got.slope_micro.iloc[0]) < 0


def test_vocab_zipf_partition_invariant_and_zipfian_flags(spark):
    docs = table(spark, SFS[0], "documents")
    base = text.vocab_zipf(docs).toPandas()
    for n in (1, 32):
        alt = text.vocab_zipf(docs.repartition(n)).toPandas()
        assert alt.equals(base), n
    # a hand-built corpus with freq ~ 1/rank lands near slope -1
    rows = []
    did = 0
    for r in range(1, 33):
        for _ in range(max(1, 64 // r)):
            rows.append((did, f"w{r:02d}"))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    z = text.vocab_zipf(df).toPandas()
    assert -1_300_000 < int(z.slope_micro.iloc[0]) < -700_000
    import pytest as _pt

    with _pt.raises(Exception, match="empty"):
        text.vocab_zipf(df.filter("doc_id < 0"))


def test_vocab_zipf_degenerate_corpus_oracle_parity(spark):
    """ADVICE r12: a one-distinct-term corpus makes the least-squares
    denominator exactly 0 — the Python path pins slope = 0; the oracle
    must mirror the guard instead of evaluating 0/0 (NaN → failed/NULL
    CAST). Engine and oracle must agree row-for-row here too."""
    df = spark.createDataFrame(
        [(1, "hello"), (2, "hello hello"), (3, "hello hello hello")],
        "doc_id long, text string",
    )
    got = text.vocab_zipf(df).toPandas()
    assert int(got.n_terms.iloc[0]) == 1
    assert int(got.slope_micro.iloc[0]) == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'hello'), (2, 'hello hello'), (3, 'hello hello hello')"
        ") AS t(doc_id, text)"
    )
    want = con.execute(text.vocab_zipf_oracle_sql()).df()
    assert got.values.tolist() == want.values.tolist()


@pytest.mark.parametrize("sf", SFS)
def test_vocab_growth_matches_oracle(spark, sf):
    """r13: the Heaps'-law growth curve replicates bit-for-bit —
    first-seen-bucket accounting (no quadratic re-scan), integer
    bucket widths, bounded cumulative window."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.check_oracle import frame_digest

    docs = table(spark, sf, "documents")
    got = text.vocab_growth(docs).toPandas()
    want = _con(sf).execute(text.vocab_growth_oracle_sql()).df()
    assert frame_digest(got)[:3] == frame_digest(want)[:3]
    # curve invariants: cumulative columns are monotone; the templated
    # synthetic corpus discovers its whole tiny vocabulary early (the
    # duplication signal this diagnostic exists for)
    assert got.cum_tokens.is_monotonic_increasing
    assert got.cum_terms.is_monotonic_increasing
    mid = got.cum_terms.iloc[len(got) // 2]
    assert mid == got.cum_terms.iloc[-1]  # flat tail = template corpus


def test_vocab_growth_discovers_fresh_vocab(spark):
    """A corpus that keeps introducing new terms shows a rising tail;
    empty corpus and bad n_buckets raise."""
    rows = [(i, f"common w{i:03d}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = text.vocab_growth(df, n_buckets=10).toPandas()
    assert got.cum_terms.iloc[-1] == 101  # 'common' + 100 fresh terms
    assert (got.cum_terms.diff().dropna() > 0).all()  # rising everywhere
    import pytest as _pt

    with _pt.raises(ValueError, match="empty"):
        text.vocab_growth(df.filter("doc_id < 0"))
    with _pt.raises(ValueError, match="n_buckets"):
        text.vocab_growth(df, n_buckets=0)


@pytest.mark.parametrize("sf", SFS)
def test_encoding_quality_matches_oracle(spark, sf):
    """r13: mojibake detection replicates bit-for-bit (replace/length
    marker counts, integer ppm); the synthetic corpus is clean."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.check_oracle import frame_digest

    docs = table(spark, sf, "documents")
    got = text.encoding_quality(docs).toPandas()
    want = _con(sf).execute(text.encoding_quality_oracle_sql()).df()
    assert frame_digest(got)[:3] == frame_digest(want)[:3]
    assert got.clean.all() and got.mojibake_hits.sum() == 0


def test_encoding_quality_flags_planted_mojibake(spark):
    """Double-decoded UTF-8 and U+FFFD both raise the marker count
    and trip the clean flag; a clean doc stays clean."""
    damaged = "caf\u00c3\u00a9 bad \u00e2\u20ac\u0153quote\u00e2\u20ac"
    lossy = "lossy \ufffd\ufffd decode"
    df = spark.createDataFrame(
        [(1, "clean text here"), (2, damaged), (3, lossy)],
        "doc_id long, text string",
    )
    got = text.encoding_quality(df).toPandas()
    assert got.clean.tolist() == [True, False, False]
    assert got.mojibake_hits.tolist() == [0, 3, 2]
    # the ppm gate is integer-exact: hits*1e6 div n_chars
    assert (
        got.mojibake_ppm
        == (got.mojibake_hits * 1_000_000) // got.n_chars
    ).all()


@pytest.mark.parametrize("sf", SFS)
def test_oov_rate_matches_oracle(spark, sf):
    """r13: per-doc OOV rate against the frozen top-K vocabulary
    replicates bit-for-bit — same (count desc, term asc) cut, integer
    ppm; the vocab-20 cut leaves the synthetic corpus's tail terms
    genuinely out-of-vocabulary."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.check_oracle import frame_digest

    docs = table(spark, sf, "documents")
    got = text.oov_rate(docs, vocab_size=20).toPandas()
    want = _con(sf).execute(text.oov_rate_oracle_sql(vocab_size=20)).df()
    assert frame_digest(got)[:3] == frame_digest(want)[:3]
    assert int(got.oov_ppm.mean()) > 0


def test_oov_rate_semantics(spark):
    """Planted fixture: a doc made of vocabulary terms scores 0 ppm, a
    wholly-novel doc scores 1e6 ppm and flags; vocab_size bounds
    raise."""
    rows = [(i, "common words here") for i in range(10)]
    rows.append((99, "zzz qqq xxx"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.oov_rate(df, vocab_size=3).collect()}
    assert out[0].oov_ppm == 0 and out[0].in_vocab
    assert out[99].oov_ppm == 1_000_000 and not out[99].in_vocab
    assert out[99].oov_tokens == 3
    with pytest.raises(ValueError, match="vocab_size"):
        text.oov_rate(df, vocab_size=0)
    with pytest.raises(ValueError, match="vocab_size"):
        text.oov_rate(df, vocab_size=10_001)


def test_advice_r13_oov_ppm_integer_div(spark):
    """ADVICE r13: oov_ppm is integer `div` end-to-end (the docstring
    contract), not double-divide + cast truncation — the analyzed plan
    carries the div expression and the known-answer ppm is exact."""
    df = spark.createDataFrame(
        [(1, "common common rare"), (2, "common common common")],
        "doc_id long, text string",
    )
    out = text.oov_rate(df, vocab_size=1)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert " div " in plan and "1000000" in plan
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].oov_ppm == 1_000_000 // 3  # 333333 exactly, floor div
    assert rows[2].oov_ppm == 0


def test_readability_hand_counts_and_edges(spark):
    """Readability (r14): hand-counted words/sentences/vowel-groups on
    planted texts, the one-sentence floor, the zero-word NULL rule,
    and NULL-text drops."""
    from pg_parquet_spark.operators import text as T

    rows = [
        (1, "Hello world! Two sents... ok?"),
        (2, "no punctuation here"),
        (3, "12345 !!!"),          # zero words -> NULL scores
        (4, None),                  # drops
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.readability_scores(df).collect()}
    assert set(got) == {1, 2, 3}
    r1 = got[1]
    # vowel groups: he-llo(2) world(1) two(1) sents(1) ok(1) = 6
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (5, 3, 6)
    # termwise: (390*5)//3 + (11800*6)//5 - 15590 = 650+14160-15590
    assert r1.fk_grade_milli == -780
    assert r1.flesch_ease_milli == 206835 - (1015 * 5) // 3 - (84600 * 6) // 5
    r2 = got[2]
    assert r2.n_sentences == 0  # floor applies inside the formula
    assert r2.fk_grade_milli == (390 * 3) // 1 + (11800 * 6) // 3 - 15590
    assert got[3].fk_grade_milli is None
    assert got[3].flesch_ease_milli is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in frame"):
        T.readability_scores(df, text_col="missing")


def test_readability_matches_oracle(spark):
    import duckdb

    from pg_parquet_spark.operators import text as T
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.01"
    got = T.readability_scores(table(spark, sf, "documents")).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(T.readability_oracle_sql()).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col].fillna(-9)) == list(want[col].fillna(-9)), col
