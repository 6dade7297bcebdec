"""Streaming KMV-sketch maintenance (drain_with_sketch_refresh) and
the publish_snapshot full-replace primitive it rides on."""

import pytest

from pg_parquet_spark.session import table

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("grp", "h").collect()]


def test_streaming_sketch_refresh(spark, tmp_path):
    """Two tranches drain; after each, the maintained sketch is
    BIT-IDENTICAL to a from-scratch sketch of the whole corpus (the
    closure property, end-to-end through the versioned sink); a replay
    merge changes nothing (the crash-convergence argument)."""
    from pg_parquet_spark.operators.sketch import kmv_merge, kmv_sketch
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_sketch_refresh

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "events_corpus")
    sk_root = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")

    events = table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "user_id", "value"
    )
    t1 = events.filter("event_id % 2 = 0")
    t2 = events.filter("event_id % 2 = 1")

    def check_consistent():
        got = layout.read_versioned(spark, sk_root)
        want = kmv_sketch(
            read_parquet(spark, corpus), "event_type", "user_id", k=8
        )
        assert _sorted_rows(got) == _sorted_rows(want)

    t1.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema(events.schema).parquet(src)
    drain_with_sketch_refresh(
        sdf, corpus, sk_root, k=8, checkpoint=ckpt
    )
    check_consistent()

    t2.coalesce(1).write.mode("append").parquet(src)
    sdf2 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_sketch_refresh(
        sdf2, corpus, sk_root, k=8, checkpoint=ckpt
    )
    check_consistent()
    assert read_parquet(spark, corpus).count() == events.count()

    # replay convergence: re-merging an already-folded batch is a
    # set-union no-op — the state a crashed-then-replayed refresh lands on
    current = layout.read_versioned(spark, sk_root)
    replayed = kmv_merge(current, kmv_sketch(t2, "event_type", "user_id", 8), 8)
    assert _sorted_rows(replayed) == _sorted_rows(current)

    # an idle re-drain (same checkpoint, no new files) flips no pointers
    vc = layout.read_manifest(corpus)["version"]
    vs = layout.read_manifest(sk_root)["version"]
    sdf3 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_sketch_refresh(sdf3, corpus, sk_root, k=8, checkpoint=ckpt)
    assert layout.read_manifest(corpus)["version"] == vc
    assert layout.read_manifest(sk_root)["version"] == vs


def test_publish_snapshot_replace_and_time_travel(spark, tmp_path):
    from pg_parquet_spark.sources import layout

    root = str(tmp_path / "ds")
    a = spark.range(5).withColumnRenamed("id", "k")
    b = spark.range(3).withColumnRenamed("id", "k")
    v1 = layout.publish_snapshot(spark, root, a, keep_history=3)
    v2 = layout.publish_snapshot(spark, root, b, keep_history=3)
    assert (v1, v2) == (1, 2)
    assert layout.read_versioned(spark, root).count() == 3
    assert layout.read_versioned(spark, root, version=1).count() == 5


def test_publish_snapshot_refuses_legacy_root(spark, tmp_path):
    from pg_parquet_spark.sources import layout

    root = str(tmp_path / "legacy")
    spark.range(4).write.parquet(root)
    with pytest.raises(ValueError, match="unversioned non-empty root"):
        layout.publish_snapshot(spark, root, spark.range(1))


def test_streaming_hdr_refresh_non_idempotent_gating(spark, tmp_path):
    """The HDR instance of the generic mergeable refresh: after each
    tranche the maintained quantile sketch is BIT-IDENTICAL to a
    from-scratch sketch of the whole corpus — which can only hold if
    no batch was ever double-folded (HDR's merge is a count SUM, so a
    single double-fold doubles counts and breaks equality). The
    manifest carries the folded_batch_id replay stamp, and an idle
    re-drain flips no pointers."""
    from pg_parquet_spark.operators.sketch import hdr_sketch
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_hdr_refresh

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    sk_root = str(tmp_path / "hdr")
    ckpt = str(tmp_path / "ckpt")

    events = table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "user_id", "value"
    )
    t1 = events.filter("event_id % 2 = 0")
    t2 = events.filter("event_id % 2 = 1")

    def check_consistent():
        got = sorted(
            map(tuple, layout.read_versioned(spark, sk_root).collect())
        )
        want = sorted(
            map(
                tuple,
                hdr_sketch(
                    read_parquet(spark, corpus), "event_type", "value"
                ).collect(),
            )
        )
        assert got == want

    t1.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema(events.schema).parquet(src)
    drain_with_hdr_refresh(sdf, corpus, sk_root, checkpoint=ckpt)
    check_consistent()
    assert layout.read_manifest(sk_root)["folded_batch_id"] == 0

    t2.coalesce(1).write.mode("append").parquet(src)
    sdf2 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_hdr_refresh(sdf2, corpus, sk_root, checkpoint=ckpt)
    check_consistent()
    assert layout.read_manifest(sk_root)["folded_batch_id"] == 1

    # idle re-drain: no new files → no batch → no pointer movement
    vc = layout.read_manifest(corpus)["version"]
    vs = layout.read_manifest(sk_root)["version"]
    sdf3 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_hdr_refresh(sdf3, corpus, sk_root, checkpoint=ckpt)
    assert layout.read_manifest(corpus)["version"] == vc
    assert layout.read_manifest(sk_root)["version"] == vs


def test_versioned_batch_writer_signals_publish_vs_replay(spark, tmp_path):
    """The bool contract the non-idempotent refresh gates on: True on
    first publish, False on a manifest-detected replay and on an empty
    batch."""
    from pg_parquet_spark.streaming.stream import versioned_batch_writer

    root = str(tmp_path / "sink")
    events = table(spark, SF, "events").limit(10)
    sink = versioned_batch_writer(root)
    assert sink(events, 0) is True
    assert sink(events, 0) is False  # replay
    assert sink(events.limit(0), 1) is False  # empty batch skip
    assert sink(events, 1) is True


def test_streaming_cms_refresh_consistent(spark, tmp_path):
    """CMS instance of the generic refresh (second non-idempotent
    merge): after two tranches the maintained counters equal a
    from-scratch sketch of the corpus — no batch double-folded."""
    from pg_parquet_spark.operators.sketch import cms_sketch
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_cms_refresh

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    sk_root = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")

    events = table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "user_id", "value"
    )
    for i, tranche in enumerate(
        (events.filter("event_id % 2 = 0"), events.filter("event_id % 2 = 1"))
    ):
        tranche.coalesce(1).write.mode("append").parquet(src)
        sdf = spark.readStream.schema(events.schema).parquet(src)
        drain_with_cms_refresh(sdf, corpus, sk_root, checkpoint=ckpt)
        got = sorted(
            map(tuple, layout.read_versioned(spark, sk_root).collect())
        )
        want = sorted(
            map(
                tuple,
                cms_sketch(read_parquet(spark, corpus), "user_id").collect(),
            )
        )
        assert got == want, f"tranche {i}"
        assert layout.read_manifest(sk_root)["folded_batch_id"] == i


def test_folded_stamp_survives_full_replace(spark, tmp_path):
    """publish_snapshot carries the folded_batch_id stamp, so a
    full-replace of a refresh-maintained summary doesn't silently
    reset the replay gate."""
    from pg_parquet_spark.sources import layout

    root = str(tmp_path / "sum")
    df = table(spark, SF, "events").limit(5).select("event_type", "value")
    layout.publish_snapshot(spark, root, df, extra={"folded_batch_id": 7})
    assert layout.read_manifest(root)["folded_batch_id"] == 7
    layout.publish_snapshot(spark, root, df)  # plain re-publish
    assert layout.read_manifest(root)["folded_batch_id"] == 7
    layout.publish_snapshot(spark, root, df, extra={"folded_batch_id": 9})
    assert layout.read_manifest(root)["folded_batch_id"] == 9


def test_streaming_drift_counts_and_psi(spark, tmp_path):
    """The drift-state instance: maintained counts equal a from-scratch
    count of the corpus after every tranche, and PSI computed from the
    maintained state vs a frozen reference equals PSI computed from the
    raw frames (bit-for-bit, including the folded index)."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import drift
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_count_refresh

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    counts = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")

    events = table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "user_id", "value"
    )
    ref = events.filter("event_id % 3 = 0")
    for tranche in (
        events.filter("event_id % 3 = 1"),
        events.filter("event_id % 3 = 2"),
    ):
        tranche.coalesce(1).write.mode("append").parquet(src)
        sdf = spark.readStream.schema(events.schema).parquet(src)
        drain_with_count_refresh(sdf, corpus, counts, checkpoint=ckpt)
        got = sorted(
            map(tuple, layout.read_versioned(spark, counts).collect())
        )
        want = sorted(
            map(
                tuple,
                drift.category_counts(
                    read_parquet(spark, corpus), F.col("event_type")
                ).collect(),
            )
        )
        assert got == want

    live = drift.psi_from_counts(
        drift.category_counts(ref, F.col("event_type")),
        layout.read_versioned(spark, counts),
    ).toPandas()
    raw = drift.psi_table(
        ref, read_parquet(spark, corpus), F.col("event_type")
    ).toPandas()
    assert live.values.tolist() == raw.values.tolist()


def test_streaming_drift_crash_replay_bitexact_psi(spark, tmp_path, monkeypatch):
    """VERDICT r9 #5: the drift monitor's two-tranche partial-commit
    crash drill. Tranche 2's corpus publish lands but the counts
    publish crashes (the window between the two pointers); the replayed
    drain must fold the missed batch EXACTLY once (corpus sink skips
    the replay, the stale folded_batch_id admits the merge), landing
    counts — and therefore PSI vs a frozen reference — bit-identical to
    a from-scratch computation. A second (idle) replay flips no
    pointers. Counts merge by SUM, so any double-fold breaks equality
    loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import drift
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_count_refresh

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    counts = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")

    events = table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "user_id", "value"
    )
    ref = events.filter("event_id % 3 = 0")
    t1 = events.filter("event_id % 3 = 1")
    t2 = events.filter("event_id % 3 = 2")

    t1.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema(events.schema).parquet(src)
    drain_with_count_refresh(sdf, corpus, counts, checkpoint=ckpt)
    assert layout.read_manifest(counts)["folded_batch_id"] == 0

    # arm the crash: tranche 2's COUNTS publish dies AFTER the corpus
    # publish succeeded — the exact two-pointer window the stamp heals
    real_publish = layout.publish_snapshot

    def crashing_publish(spark_, root, df, **kw):
        if root.rstrip("/") == counts:
            raise RuntimeError("simulated crash before counts publish")
        return real_publish(spark_, root, df, **kw)

    monkeypatch.setattr(layout, "publish_snapshot", crashing_publish)
    t2.coalesce(1).write.mode("append").parquet(src)
    sdf2 = spark.readStream.schema(events.schema).parquet(src)
    with _pytest.raises(Exception, match="simulated crash"):
        drain_with_count_refresh(sdf2, corpus, counts, checkpoint=ckpt)
    monkeypatch.setattr(layout, "publish_snapshot", real_publish)

    # the crash window is real: corpus has tranche 2, counts do not
    assert read_parquet(spark, corpus).count() == t1.count() + t2.count()
    assert layout.read_manifest(counts)["folded_batch_id"] == 0

    # replay heals: the corpus sink detects the replayed batch, the
    # stale stamp admits exactly the missed merge
    sdf3 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_count_refresh(sdf3, corpus, counts, checkpoint=ckpt)
    assert layout.read_manifest(counts)["folded_batch_id"] == 1
    assert read_parquet(spark, corpus).count() == t1.count() + t2.count()

    got = sorted(map(tuple, layout.read_versioned(spark, counts).collect()))
    want = sorted(
        map(
            tuple,
            drift.category_counts(
                read_parquet(spark, corpus), F.col("event_type")
            ).collect(),
        )
    )
    assert got == want  # SUM-merge: a double-fold would double counts

    live = drift.psi_from_counts(
        drift.category_counts(ref, F.col("event_type")),
        layout.read_versioned(spark, counts),
    ).toPandas()
    raw = drift.psi_table(
        ref, read_parquet(spark, corpus), F.col("event_type")
    ).toPandas()
    assert live.values.tolist() == raw.values.tolist()

    # second replay is idle: no new files, no pointer movement
    vc = layout.read_manifest(corpus)["version"]
    vs = layout.read_manifest(counts)["version"]
    sdf4 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_count_refresh(sdf4, corpus, counts, checkpoint=ckpt)
    assert layout.read_manifest(corpus)["version"] == vc
    assert layout.read_manifest(counts)["version"] == vs


def test_streaming_quality_filter_ingest(spark, tmp_path):
    """r10: inline classifier filtering at ingest — the landed corpus
    holds exactly the batch-mode keep set across two tranches, and a
    replayed drain changes nothing (stateless filter + manifest replay
    gate)."""
    from pg_parquet_spark.operators import sampling
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_quality_filter

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    docs = table(spark, SF, "documents").select("doc_id", "text", "source")
    model = sampling.train_quality_classifier(
        docs.filter("source = 'src13'"),
        docs.filter("source <> 'src13'"),
        n_buckets=256,
    )
    scored = sampling.apply_quality_classifier(docs, model).toPandas()
    thr = int(scored.logit_micro.quantile(0.9))  # keep the top decile
    want_keep = set(scored[scored.logit_micro > thr].doc_id)
    assert 0 < len(want_keep) < docs.count()

    for tranche in ("doc_id % 2 = 0", "doc_id % 2 = 1"):
        docs.filter(tranche).coalesce(1).write.mode("append").parquet(src)
        sdf = spark.readStream.schema(docs.schema).parquet(src)
        drain_with_quality_filter(
            sdf, corpus, model, threshold_micro=thr, checkpoint=ckpt
        )

    landed = set(r.doc_id for r in read_parquet(spark, corpus).collect())
    assert landed == want_keep
    # replay: same checkpoint, no new files → no pointer movement
    v = layout.read_manifest(corpus)["version"]
    sdf2 = spark.readStream.schema(docs.schema).parquet(src)
    drain_with_quality_filter(
        sdf2, corpus, model, threshold_micro=thr, checkpoint=ckpt
    )
    assert layout.read_manifest(corpus)["version"] == v


def test_streaming_near_dedup_ingest(spark, tmp_path):
    """r10: the near-dup ingest drain — tranche 2's near-copies of
    tranche 1 survivors never land; the index self-bootstraps; a
    replayed drain changes neither corpus nor index."""
    from pg_parquet_spark.operators import dedup
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_near_dedup

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    base = "the quick brown fox jumps over the lazy dog again and again today"
    t1 = spark.createDataFrame(
        [
            (1, base),
            (2, "totally different text about spark engines at scale"),
            (3, base + " extra"),  # within-tranche near-dup of 1
        ],
        "doc_id long, text string",
    )
    t2 = spark.createDataFrame(
        [
            (10, base + " word"),  # near-dup of survivor 1
            (11, "genuinely novel content nine eight seven six five four"),
        ],
        "doc_id long, text string",
    )
    t1.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema(t1.schema).parquet(src)
    drain_with_near_dedup(sdf, corpus, index, min_matches=10, checkpoint=ckpt)
    assert {r.doc_id for r in read_parquet(spark, corpus).collect()} == {1, 2}
    assert layout.read_versioned(spark, index).count() == 2

    t2.coalesce(1).write.mode("append").parquet(src)
    sdf2 = spark.readStream.schema(t1.schema).parquet(src)
    drain_with_near_dedup(sdf2, corpus, index, min_matches=10, checkpoint=ckpt)
    assert {r.doc_id for r in read_parquet(spark, corpus).collect()} == {1, 2, 11}
    assert layout.read_versioned(spark, index).count() == 3

    # idle replay: nothing moves
    vc = layout.read_manifest(corpus)["version"]
    vi = layout.read_manifest(index)["version"]
    sdf3 = spark.readStream.schema(t1.schema).parquet(src)
    drain_with_near_dedup(sdf3, corpus, index, min_matches=10, checkpoint=ckpt)
    assert layout.read_manifest(corpus)["version"] == vc
    assert layout.read_manifest(index)["version"] == vi


def test_streaming_curation_drain(spark, tmp_path):
    """r10: the full ingest-curation drain — landed text is the
    STRIPPED extraction, under-length docs never land, near-dups are
    suppressed within and across tranches, and replays move nothing."""
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_curation

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    base = "the quick brown fox jumps over the lazy dog again and again today"
    t1 = spark.createDataFrame(
        [
            (1, f"<html><p>{base}</p></html>"),
            (2, "<b>too short</b>"),  # bounded out after stripping
            (3, f"<div>{base} extra</div>"),  # near-dup of 1 post-strip
            (4, "<p>wholly different content about engines one two three</p>"),
        ],
        "doc_id long, text string",
    )
    t2 = spark.createDataFrame(
        [(10, f"<span>{base} word</span>")],  # near-dup of survivor 1
        "doc_id long, text string",
    )
    t1.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema(t1.schema).parquet(src)
    drain_with_curation(
        sdf, corpus, index, min_tokens=5, min_matches=10, checkpoint=ckpt
    )
    landed = {r.doc_id: r.text for r in read_parquet(spark, corpus).collect()}
    assert set(landed) == {1, 4}
    assert landed[1] == base  # stripped, not the raw html
    assert "<" not in landed[4]

    t2.coalesce(1).write.mode("append").parquet(src)
    sdf2 = spark.readStream.schema(t1.schema).parquet(src)
    drain_with_curation(
        sdf2, corpus, index, min_tokens=5, min_matches=10, checkpoint=ckpt
    )
    assert {r.doc_id for r in read_parquet(spark, corpus).collect()} == {1, 4}

    vc = layout.read_manifest(corpus)["version"]
    sdf3 = spark.readStream.schema(t1.schema).parquet(src)
    drain_with_curation(
        sdf3, corpus, index, min_tokens=5, min_matches=10, checkpoint=ckpt
    )
    assert layout.read_manifest(corpus)["version"] == vc


def test_streaming_curation_crash_between_corpus_and_signatures(
    spark, tmp_path, monkeypatch
):
    """VERDICT r10 #7: the curation drain's partial-commit drill.
    Tranche 2's corpus publish lands but the signature MERGE crashes
    (the window between the two pointers); the replay must re-flag
    against the pre-crash index, skip the already-published corpus
    batch (manifest gate), and land exactly the missing signatures —
    after which the index equals the signatures of the corpus it
    indexes bit-for-bit and a near-dup of the healed doc is caught."""
    import pytest as _pytest

    from pg_parquet_spark.operators import dedup
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_curation

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "wholly different content about parquet engines one two three"
    schema = "doc_id long, text string"
    t1 = spark.createDataFrame([(1, f"<p>{base}</p>")], schema)
    t2 = spark.createDataFrame([(2, f"<p>{other}</p>")], schema)

    t1.coalesce(1).write.mode("append").parquet(src)
    drain_with_curation(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, min_tokens=5, min_matches=10, checkpoint=ckpt,
    )
    assert layout.read_versioned(spark, index).count() == 1

    # arm the crash: the signature MERGE dies AFTER the corpus publish
    real_merge = layout.merge_upsert

    def crashing_merge(spark_, root, *a, **kw):
        if root.rstrip("/") == index:
            raise RuntimeError("simulated crash before signature commit")
        return real_merge(spark_, root, *a, **kw)

    monkeypatch.setattr(layout, "merge_upsert", crashing_merge)
    t2.coalesce(1).write.mode("append").parquet(src)
    with _pytest.raises(Exception, match="simulated crash"):
        drain_with_curation(
            spark.readStream.schema(t1.schema).parquet(src),
            corpus, index, min_tokens=5, min_matches=10, checkpoint=ckpt,
        )
    monkeypatch.setattr(layout, "merge_upsert", real_merge)

    # the crash window is real: corpus has doc 2, the index does not
    assert {r.doc_id for r in read_parquet(spark, corpus).collect()} == {1, 2}
    assert layout.read_versioned(spark, index).count() == 1

    # replay heals: corpus batch skipped by manifest, signature lands
    cv = layout.read_manifest(corpus)["version"]
    drain_with_curation(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, min_tokens=5, min_matches=10, checkpoint=ckpt,
    )
    assert layout.read_manifest(corpus)["version"] == cv  # no re-publish
    assert layout.read_versioned(spark, index).count() == 2

    # the healed index equals the signatures of the corpus bit-for-bit
    got_idx = sorted(
        map(tuple, layout.read_versioned(spark, index).collect())
    )
    want_idx = sorted(
        map(
            tuple,
            dedup._sig_band_frame(
                read_parquet(spark, corpus), "doc_id", "text"
            )
            .withColumnRenamed("_id", "owner_id")
            .collect(),
        )
    )
    assert got_idx == want_idx

    # and it WORKS: a near-dup of the healed doc 2 publishes nothing
    t3 = spark.createDataFrame([(3, f"<p>{other} extra</p>")], schema)
    t3.coalesce(1).write.mode("append").parquet(src)
    drain_with_curation(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, min_tokens=5, min_matches=10, checkpoint=ckpt,
    )
    assert {r.doc_id for r in read_parquet(spark, corpus).collect()} == {1, 2}


def test_streaming_quality_filter_crash_mid_publish(
    spark, tmp_path, monkeypatch
):
    """VERDICT r10 #7, quality-filter drain: crash INSIDE the corpus
    publish (batch dir staged, pointer never flips). The reader must
    never see the half-landed batch; the replay re-stages and flips,
    and the final corpus equals a from-scratch no-crash drain —
    rejects stay out, keeps land exactly once."""
    import pytest as _pytest

    from pg_parquet_spark.operators.classifier_fixture import MODEL
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_quality_filter

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    docs = table(spark, SF, "documents").select("doc_id", "text")
    t1 = docs.filter("doc_id % 2 = 0")
    t2 = docs.filter("doc_id % 2 = 1")

    # the frozen model scores this synthetic corpus uniformly negative
    # (bias ln(N_pos/N_neg) dominates); a mid-distribution threshold
    # makes BOTH filter outcomes populated, which is what the drill
    # needs (rejects must stay out across the crash)
    thr = -10_700_000
    t1.coalesce(1).write.mode("append").parquet(src)
    drain_with_quality_filter(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, MODEL, threshold_micro=thr, checkpoint=ckpt,
    )
    n1 = read_parquet(spark, corpus).count()
    assert 0 < n1 < t1.count()

    real_pub = layout._publish_manifest

    def crashing_pub(root, manifest, **kw):
        if root.rstrip("/") == corpus and manifest["version"] > 1:
            raise RuntimeError("simulated crash mid publish")
        return real_pub(root, manifest, **kw)

    monkeypatch.setattr(layout, "_publish_manifest", crashing_pub)
    t2.coalesce(1).write.mode("append").parquet(src)
    with _pytest.raises(Exception, match="simulated crash"):
        drain_with_quality_filter(
            spark.readStream.schema(t1.schema).parquet(src),
            corpus, MODEL, threshold_micro=thr, checkpoint=ckpt,
        )
    monkeypatch.setattr(layout, "_publish_manifest", real_pub)

    # pointer never flipped: readers still see exactly tranche 1
    assert read_parquet(spark, corpus).count() == n1

    # replay re-stages the dir and flips; equals a no-crash drain
    drain_with_quality_filter(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, MODEL, threshold_micro=thr, checkpoint=ckpt,
    )
    ref_corpus = str(tmp_path / "ref_corpus")
    drain_with_quality_filter(
        spark.readStream.schema(t1.schema).parquet(src),
        ref_corpus, MODEL, threshold_micro=thr, checkpoint=str(tmp_path / "ref_ckpt"),
    )
    got = sorted(
        map(tuple, read_parquet(spark, corpus).select("doc_id", "text").collect())
    )
    want = sorted(
        map(tuple, read_parquet(spark, ref_corpus).select("doc_id", "text").collect())
    )
    assert got == want and len(got) > n1


def test_streaming_quality_split_quarantine_and_crash(spark, tmp_path, monkeypatch):
    """r11: the quarantine drain — keeps and rejects PARTITION each
    tranche exactly (nothing vanishes); a crash between the corpus and
    quarantine publishes heals on replay to a state bit-identical to a
    no-crash drain; an idle replay moves neither pointer."""
    import pytest as _pytest

    from pg_parquet_spark.operators.classifier_fixture import MODEL
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_quality_split

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    quar = str(tmp_path / "quar")
    ckpt = str(tmp_path / "ckpt")
    docs = table(spark, SF, "documents").select("doc_id", "text")
    thr = -10_700_000  # mid-distribution: both outcomes populated
    t1 = docs.filter("doc_id % 2 = 0")
    t2 = docs.filter("doc_id % 2 = 1")

    t1.coalesce(1).write.mode("append").parquet(src)
    drain_with_quality_split(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, quar, MODEL, threshold_micro=thr, checkpoint=ckpt,
    )
    k1 = read_parquet(spark, corpus).count()
    r1 = read_parquet(spark, quar).count()
    assert k1 > 0 and r1 > 0 and k1 + r1 == t1.count()

    # crash between the two publishes on tranche 2
    real_pub = layout._publish_manifest

    def crashing(root_, manifest, **kw):
        if root_.rstrip("/") == quar and manifest["version"] > 1:
            raise RuntimeError("simulated crash before quarantine publish")
        return real_pub(root_, manifest, **kw)

    monkeypatch.setattr(layout, "_publish_manifest", crashing)
    t2.coalesce(1).write.mode("append").parquet(src)
    with _pytest.raises(Exception, match="simulated crash"):
        drain_with_quality_split(
            spark.readStream.schema(t1.schema).parquet(src),
            corpus, quar, MODEL, threshold_micro=thr, checkpoint=ckpt,
        )
    monkeypatch.setattr(layout, "_publish_manifest", real_pub)

    # the window is real: corpus advanced, quarantine did not
    assert read_parquet(spark, corpus).count() > k1
    assert read_parquet(spark, quar).count() == r1

    # replay heals both sides; equals a from-scratch no-crash drain
    drain_with_quality_split(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, quar, MODEL, threshold_micro=thr, checkpoint=ckpt,
    )
    ref_c, ref_q = str(tmp_path / "rc"), str(tmp_path / "rq")
    drain_with_quality_split(
        spark.readStream.schema(t1.schema).parquet(src),
        ref_c, ref_q, MODEL, threshold_micro=thr,
        checkpoint=str(tmp_path / "rck"),
    )
    for lhs, rhs in ((corpus, ref_c), (quar, ref_q)):
        got = sorted(r.doc_id for r in read_parquet(spark, lhs).collect())
        want = sorted(r.doc_id for r in read_parquet(spark, rhs).collect())
        assert got == want
    # keeps ∪ rejects == everything, disjoint
    all_ids = sorted(
        [r.doc_id for r in read_parquet(spark, corpus).collect()]
        + [r.doc_id for r in read_parquet(spark, quar).collect()]
    )
    assert all_ids == sorted(r.doc_id for r in docs.collect())

    # idle replay: neither pointer moves
    vc = layout.read_manifest(corpus)["version"]
    vq = layout.read_manifest(quar)["version"]
    drain_with_quality_split(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, quar, MODEL, threshold_micro=thr, checkpoint=ckpt,
    )
    assert layout.read_manifest(corpus)["version"] == vc
    assert layout.read_manifest(quar)["version"] == vq


def test_streaming_decontamination_drain(spark, tmp_path):
    """r11: the ingest decontamination drain — an exact benchmark copy
    AND a paraphrased near-copy (zero shared 5-grams) both never land;
    clean docs do; replays move nothing."""
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_decontamination

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    words = [f"tok{i}" for i in range(40)]
    bench_text = " ".join(words)
    para = " ".join(
        (f"sub{i}" if i % 5 == 0 else w) for i, w in enumerate(words)
    )
    bench = spark.createDataFrame(
        [(1000, bench_text)], "doc_id long, text string"
    )
    t1 = spark.createDataFrame(
        [
            (1, bench_text),                       # exact copy
            (2, para),                              # paraphrase (near tier)
            (3, "wholly unrelated content about parquet engines one two"),
        ],
        "doc_id long, text string",
    )
    t1.coalesce(1).write.mode("append").parquet(src)
    drain_with_decontamination(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, bench, min_shared=1, min_matches=5, bands=8,
        checkpoint=ckpt,
    )
    landed = {r.doc_id for r in read_parquet(spark, corpus).collect()}
    assert landed == {3}  # exact copy AND paraphrase both blocked

    v = layout.read_manifest(corpus)["version"]
    drain_with_decontamination(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, bench, min_shared=1, min_matches=5, bands=8,
        checkpoint=ckpt,
    )
    assert layout.read_manifest(corpus)["version"] == v  # idle replay


def test_streaming_decontamination_crash_mid_publish(
    spark, tmp_path, monkeypatch
):
    """VERDICT r11 #7: the decontamination drain's crash/replay
    argument was carried by prose ("stateless → the quality-filter
    argument carries verbatim") — this is the mechanical proof. Crash
    INSIDE the second tranche's corpus publish (batch dir staged,
    pointer never flips): readers keep seeing exactly tranche 1, the
    replay re-stages and flips, and the final corpus equals a
    from-scratch no-crash drain — contaminated rows stay out across
    the crash, clean rows land exactly once."""
    import pytest as _pytest

    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_decontamination

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    docs = table(spark, SF, "documents").select("doc_id", "text")
    bench = docs.filter("doc_id % 20 = 0")
    t1 = docs.filter("doc_id % 20 <> 0 AND doc_id % 2 = 0")
    t2 = docs.filter("doc_id % 20 <> 0 AND doc_id % 2 = 1")

    kw = dict(min_shared=3, min_matches=6, bands=8)
    t1.coalesce(1).write.mode("append").parquet(src)
    drain_with_decontamination(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, bench, checkpoint=ckpt, **kw,
    )
    n1 = read_parquet(spark, corpus).count()
    assert 0 < n1 <= t1.count()

    real_pub = layout._publish_manifest

    def crashing_pub(root, manifest, **pkw):
        if root.rstrip("/") == corpus and manifest["version"] > 1:
            raise RuntimeError("simulated crash mid publish")
        return real_pub(root, manifest, **pkw)

    monkeypatch.setattr(layout, "_publish_manifest", crashing_pub)
    t2.coalesce(1).write.mode("append").parquet(src)
    with _pytest.raises(Exception, match="simulated crash"):
        drain_with_decontamination(
            spark.readStream.schema(t1.schema).parquet(src),
            corpus, bench, checkpoint=ckpt, **kw,
        )
    monkeypatch.setattr(layout, "_publish_manifest", real_pub)

    # pointer never flipped: readers still see exactly tranche 1
    assert read_parquet(spark, corpus).count() == n1

    # replay re-stages and flips; equals a no-crash drain from scratch
    drain_with_decontamination(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, bench, checkpoint=ckpt, **kw,
    )
    ref_corpus = str(tmp_path / "ref_corpus")
    drain_with_decontamination(
        spark.readStream.schema(t1.schema).parquet(src),
        ref_corpus, bench, checkpoint=str(tmp_path / "ref_ckpt"), **kw,
    )
    got = sorted(
        map(tuple, read_parquet(spark, corpus).select("doc_id").collect())
    )
    want = sorted(
        map(tuple, read_parquet(spark, ref_corpus).select("doc_id").collect())
    )
    assert got == want and len(got) > n1


def test_streaming_span_dedup_drain(spark, tmp_path):
    """r12: the exact-substring ingest drain — a later batch's verbatim
    copy of published text strips to nothing and never lands; partial
    overlaps land REWRITTEN (covered tokens excised); the index
    self-bootstraps; replays move nothing."""
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_span_dedup

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "span_index")
    ckpt = str(tmp_path / "ckpt")

    span = " ".join(f"tok{i}" for i in range(8))
    t1 = spark.createDataFrame(
        [(1, span + " original tail content"),
         (2, "independent first tranche document body")],
        "doc_id long, text string",
    )
    t1.coalesce(1).write.mode("append").parquet(src)
    drain_with_span_dedup(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, span_tokens=8, checkpoint=ckpt,
    )
    landed = {r.doc_id: r.text for r in read_parquet(spark, corpus).collect()}
    assert set(landed) == {1, 2}
    assert landed[1] == span + " original tail content"

    t2 = spark.createDataFrame(
        [(10, span),                                   # verbatim span -> ''
         (11, span + " but with a brand new suffix"),  # rewritten
         (12, "another wholly unrelated document text")],
        "doc_id long, text string",
    )
    t2.coalesce(1).write.mode("append").parquet(src)
    drain_with_span_dedup(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, span_tokens=8, checkpoint=ckpt,
    )
    landed = {r.doc_id: r.text for r in read_parquet(spark, corpus).collect()}
    assert 10 not in landed            # fully excised, never published
    assert landed[11] == "but with a brand new suffix"
    assert landed[12] == "another wholly unrelated document text"

    # idle replay: neither corpus nor index version moves
    vc = layout.read_manifest(corpus)["version"]
    vi = layout.read_manifest(index)["version"]
    drain_with_span_dedup(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, span_tokens=8, checkpoint=ckpt,
    )
    assert layout.read_manifest(corpus)["version"] == vc
    assert layout.read_manifest(index)["version"] == vi


def test_streaming_span_dedup_crash_mid_publish(spark, tmp_path, monkeypatch):
    """The span drain's mechanical crash drill (the family pattern):
    crash inside the second tranche's corpus publish — readers keep
    seeing tranche 1, the replay re-stages and flips, and the final
    corpus equals a from-scratch no-crash drain."""
    import pytest as _pytest

    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_span_dedup

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "span_index")
    ckpt = str(tmp_path / "ckpt")

    docs = table(spark, SF, "documents").select("doc_id", "text")
    t1 = docs.filter("doc_id % 2 = 0")
    t2 = docs.filter("doc_id % 2 = 1")
    kw = dict(span_tokens=12, checkpoint=ckpt)

    t1.coalesce(1).write.mode("append").parquet(src)
    drain_with_span_dedup(
        spark.readStream.schema(t1.schema).parquet(src), corpus, index, **kw
    )
    n1 = read_parquet(spark, corpus).count()
    assert n1 > 0

    real_pub = layout._publish_manifest

    def crashing_pub(root, manifest, **pkw):
        if root.rstrip("/") == corpus and manifest["version"] > 1:
            raise RuntimeError("simulated crash mid publish")
        return real_pub(root, manifest, **pkw)

    monkeypatch.setattr(layout, "_publish_manifest", crashing_pub)
    t2.coalesce(1).write.mode("append").parquet(src)
    with _pytest.raises(Exception, match="simulated crash"):
        drain_with_span_dedup(
            spark.readStream.schema(t1.schema).parquet(src),
            corpus, index, **kw,
        )
    monkeypatch.setattr(layout, "_publish_manifest", real_pub)
    assert read_parquet(spark, corpus).count() == n1  # pointer never flipped

    drain_with_span_dedup(
        spark.readStream.schema(t1.schema).parquet(src), corpus, index, **kw
    )
    # reference = the SAME two-tranche batch sequence without a crash
    # (span stripping cascades: excising tranche-1's internal dups
    # reshapes the grams it commits, so a one-mega-batch framing is a
    # DIFFERENT — equally valid — dedup, not this drain's replay)
    ref_src = str(tmp_path / "ref_src")
    ref_corpus = str(tmp_path / "ref_corpus")
    ref_index = str(tmp_path / "ref_index")
    ref_ckpt = str(tmp_path / "ref_ckpt")
    t1.coalesce(1).write.mode("append").parquet(ref_src)
    drain_with_span_dedup(
        spark.readStream.schema(t1.schema).parquet(ref_src),
        ref_corpus, ref_index, span_tokens=12, checkpoint=ref_ckpt,
    )
    t2.coalesce(1).write.mode("append").parquet(ref_src)
    drain_with_span_dedup(
        spark.readStream.schema(t1.schema).parquet(ref_src),
        ref_corpus, ref_index, span_tokens=12, checkpoint=ref_ckpt,
    )
    got = sorted(
        map(tuple, read_parquet(spark, corpus).select("doc_id", "text").collect())
    )
    want = sorted(
        map(tuple, read_parquet(spark, ref_corpus).select("doc_id", "text").collect())
    )
    assert got == want and len(got) > 0


def test_streaming_span_dedup_framing_mismatch_raises(spark, tmp_path):
    """VERDICT r12 #4: the replay-the-same-tranche-sequence contract is
    now MECHANICAL. Cross-checkpoint replays were already rejected by
    the sink's writer-epoch gate (asserted below); the persisted
    per-tranche fingerprint (count + id range + id checksum) closes
    the remaining hole — a batch id the INDEX has already seen
    committed under different rows (mutated source files on replay, or
    a second pipeline sharing the index) raises loudly through the
    real drain path BEFORE anything strips or publishes."""
    import os

    import pytest as _pytest

    from pg_parquet_spark.operators import dedup as dedup_ops
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_span_dedup

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "span_index")
    ckpt = str(tmp_path / "ckpt")

    docs = table(spark, SF, "documents").select("doc_id", "text")
    t1 = docs.filter("doc_id % 2 = 0")
    t2 = docs.filter("doc_id % 2 = 1")
    kw = dict(span_tokens=12, checkpoint=ckpt)

    t1.coalesce(1).write.mode("append").parquet(src)
    drain_with_span_dedup(
        spark.readStream.schema(t1.schema).parquet(src), corpus, index, **kw
    )
    v_corpus = layout.read_manifest(corpus)["version"]
    v_index = layout.read_manifest(index)["version"]

    # batch 0's fingerprint persisted; identical rows match, a
    # different tranche raises (the unit-level contract)
    fp1 = dedup_ops.span_framing_fingerprint(t1)
    dedup_ops.check_span_framing(index, 0, fp1)  # no raise
    with _pytest.raises(ValueError, match="framing mismatch"):
        dedup_ops.check_span_framing(
            index, 0, dedup_ops.span_framing_fingerprint(t2)
        )

    # cross-checkpoint replay: rejected by the sink's epoch gate (the
    # pre-existing protection the fingerprint complements)
    with _pytest.raises(Exception, match="epoch mismatch"):
        drain_with_span_dedup(
            spark.readStream.schema(t1.schema).parquet(src),
            corpus, index, span_tokens=12,
            checkpoint=str(tmp_path / "other_ckpt"),
        )

    # the drain-path drill: the index has already seen a batch-1
    # commit under DIFFERENT framing (divergent replay / second
    # pipeline); when tranche 2 arrives as batch 1, the drain must
    # raise before stripping or publishing anything
    dedup_ops.record_span_framing(
        index, 1, {"n_rows": 1, "id_min": 0, "id_max": 0, "id_crc": 0}
    )
    t2.coalesce(1).write.mode("append").parquet(src)
    with _pytest.raises(Exception, match="framing mismatch"):
        drain_with_span_dedup(
            spark.readStream.schema(t1.schema).parquet(src),
            corpus, index, **kw,
        )
    assert layout.read_manifest(corpus)["version"] == v_corpus
    assert layout.read_manifest(index)["version"] == v_index

    # clear the divergent fingerprint: the checkpoint replays batch 1
    # (it never committed), tranche 2 lands, its true framing persists
    os.remove(os.path.join(index, "_framing", "batch_1.json"))
    drain_with_span_dedup(
        spark.readStream.schema(t1.schema).parquet(src), corpus, index, **kw
    )
    assert layout.read_manifest(corpus)["version"] > v_corpus
    assert read_parquet(spark, corpus).count() > t1.count() > 0
    dedup_ops.check_span_framing(
        index, 1, dedup_ops.span_framing_fingerprint(t2)
    )  # recorded and matching: no raise


def test_streaming_term_index_drain_and_crash_drill(spark, tmp_path, monkeypatch):
    """r13: the BM25 term-index ingest drain — every tranche publishes
    to the corpus then merges its postings; searches equal direct BM25
    over the published corpus. Mechanical crash drill (the family
    rule): crash between corpus publish and index upsert — the replay
    re-runs the upsert, and the final (corpus, index, search result)
    equals the no-crash reference."""
    import pytest as _pytest

    from pg_parquet_spark.operators import text
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_term_index

    terms = ["spark", "vector", "scan"]
    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents").select("doc_id", "text")
    t1 = docs.filter("doc_id % 2 = 0")
    t2 = docs.filter("doc_id % 2 = 1")

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "bm25_index")
    ckpt = str(tmp_path / "ckpt")

    t1.coalesce(1).write.mode("append").parquet(src)
    drain_with_term_index(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, checkpoint=ckpt,
    )
    got1 = text.bm25_index_topk(spark, index, terms).toPandas()
    want1 = text.bm25_scores(
        read_parquet(spark, corpus).select("doc_id", "text"), terms
    ).toPandas()
    assert got1.values.tolist() == want1.values.tolist() and len(got1) > 0

    # crash between corpus publish and index upsert on tranche 2
    real_upsert = text.bm25_index_upsert
    calls = {"n": 0}

    def crashing_upsert(*args, **kwargs):
        calls["n"] += 1
        raise RuntimeError("simulated crash before index upsert")

    monkeypatch.setattr(text, "bm25_index_upsert", crashing_upsert)
    t2.coalesce(1).write.mode("append").parquet(src)
    with _pytest.raises(Exception, match="simulated crash"):
        drain_with_term_index(
            spark.readStream.schema(t1.schema).parquet(src),
            corpus, index, checkpoint=ckpt,
        )
    assert calls["n"] == 1
    # the corpus moved but the index is one batch behind — searches
    # still serve the OLD consistent state (stats stamp still matches
    # the index's own manifest)
    monkeypatch.setattr(text, "bm25_index_upsert", real_upsert)

    drain_with_term_index(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, checkpoint=ckpt,
    )
    got = text.bm25_index_topk(spark, index, terms).toPandas()
    want = text.bm25_scores(docs, terms).toPandas()  # full corpus
    assert got.values.tolist() == want.values.tolist()
    # replayed drain with nothing new: index result unchanged
    drain_with_term_index(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, checkpoint=ckpt,
    )
    again = text.bm25_index_topk(spark, index, terms).toPandas()
    assert again.values.tolist() == got.values.tolist()


def test_streaming_line_dedup_drain(spark, tmp_path):
    """r13: the boilerplate-line ingest drain — a later batch's copy of
    a published line never lands, batch-internal boilerplate keeps its
    first copy, fully-emptied docs are dropped, the index
    self-bootstraps, and idle replays move nothing."""
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_line_dedup

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "line_index")
    ckpt = str(tmp_path / "ckpt")

    footer = "subscribe banner"
    t1 = spark.createDataFrame(
        [(1, "real body one\n" + footer),
         (2, footer + "\nreal body two")],
        "doc_id long, text string",
    )
    t1.coalesce(1).write.mode("append").parquet(src)
    drain_with_line_dedup(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, checkpoint=ckpt,
    )
    landed = {r.doc_id: r.text for r in read_parquet(spark, corpus).collect()}
    # batch-internal boilerplate: doc 1 (lowest id) keeps the footer
    assert landed[1] == "real body one\n" + footer
    assert landed[2] == "real body two"

    t2 = spark.createDataFrame(
        [(10, footer),                      # corpus-known only -> dropped
         (11, footer + "\nfresh content")],  # rewritten
        "doc_id long, text string",
    )
    t2.coalesce(1).write.mode("append").parquet(src)
    drain_with_line_dedup(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, checkpoint=ckpt,
    )
    landed = {r.doc_id: r.text for r in read_parquet(spark, corpus).collect()}
    assert 10 not in landed
    assert landed[11] == "fresh content"

    vc = layout.read_manifest(corpus)["version"]
    vi = layout.read_manifest(index)["version"]
    drain_with_line_dedup(
        spark.readStream.schema(t1.schema).parquet(src),
        corpus, index, checkpoint=ckpt,
    )
    assert layout.read_manifest(corpus)["version"] == vc
    assert layout.read_manifest(index)["version"] == vi


def test_streaming_line_dedup_crash_mid_publish(spark, tmp_path, monkeypatch):
    """The line drain's mechanical crash drill (the family pattern):
    crash inside the second tranche's corpus publish — readers keep
    seeing tranche 1, the replay re-stages and flips, and the final
    corpus equals the same two-tranche sequence without a crash."""
    import pytest as _pytest

    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_line_dedup

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "line_index")
    ckpt = str(tmp_path / "ckpt")

    docs = table(spark, SF, "documents").select("doc_id", "text")
    t1 = docs.filter("doc_id % 2 = 0")
    t2 = docs.filter("doc_id % 2 = 1")
    kw = dict(delim=" line ", checkpoint=ckpt)

    t1.coalesce(1).write.mode("append").parquet(src)
    drain_with_line_dedup(
        spark.readStream.schema(t1.schema).parquet(src), corpus, index, **kw
    )
    n1 = read_parquet(spark, corpus).count()
    assert n1 > 0

    real_pub = layout._publish_manifest

    def crashing_pub(root, manifest, **pkw):
        if root.rstrip("/") == corpus and manifest["version"] > 1:
            raise RuntimeError("simulated crash mid publish")
        return real_pub(root, manifest, **pkw)

    monkeypatch.setattr(layout, "_publish_manifest", crashing_pub)
    t2.coalesce(1).write.mode("append").parquet(src)
    with _pytest.raises(Exception, match="simulated crash"):
        drain_with_line_dedup(
            spark.readStream.schema(t1.schema).parquet(src),
            corpus, index, **kw,
        )
    monkeypatch.setattr(layout, "_publish_manifest", real_pub)
    assert read_parquet(spark, corpus).count() == n1

    drain_with_line_dedup(
        spark.readStream.schema(t1.schema).parquet(src), corpus, index, **kw
    )
    ref_src = str(tmp_path / "ref_src")
    ref_corpus = str(tmp_path / "ref_corpus")
    ref_index = str(tmp_path / "ref_index")
    for t in (t1, t2):
        t.coalesce(1).write.mode("append").parquet(ref_src)
        drain_with_line_dedup(
            spark.readStream.schema(t1.schema).parquet(ref_src),
            ref_corpus, ref_index, delim=" line ",
            checkpoint=str(tmp_path / "ref_ckpt"),
        )
    got = sorted(
        map(tuple, read_parquet(spark, corpus).select("doc_id", "text").collect())
    )
    want = sorted(
        map(tuple, read_parquet(spark, ref_corpus).select("doc_id", "text").collect())
    )
    assert got == want and len(got) > 0


def test_streaming_managed_bm25_drain_drift_and_crash(spark, tmp_path, monkeypatch):
    """r14: the drift-aware lexical ingest drain — tranche 1 bootstraps
    generation 1, an in-vocabulary tranche MERGEs (generation
    unchanged), a drifted tranche triggers the text-free generation
    rebuild + pointer flip mid-stream, and the managed search equals
    direct BM25 over the published corpus throughout. Crash drill:
    die inside the managed ingest after the corpus publish — the index
    serves the old consistent state, the replay converges."""
    import pytest as _pytest

    from pg_parquet_spark.operators import text
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_managed_bm25

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "managed_bm25")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def drain():
        drain_with_managed_bm25(
            spark.readStream.schema(t1.schema).parquet(src),
            corpus, index, checkpoint=ckpt,
        )

    # tranche 1 bootstraps generation 1
    t1 = spark.createDataFrame(
        [(i, "alpha beta " + ("gamma" if i % 2 else "delta"))
         for i in range(8)],
        schema,
    )
    t1.coalesce(1).write.mode("append").parquet(src)
    drain()
    assert text.resolve_bm25_index(index)["generation"] == 1
    q1 = ["alpha", "gamma"]
    got1 = text.bm25_managed_topk(spark, index, q1).toPandas()
    want1 = text.bm25_scores(
        read_parquet(spark, corpus).select("doc_id", "text"), q1
    ).toPandas()
    assert got1.values.tolist() == want1.values.tolist() and len(got1) > 0

    # in-vocabulary tranche: merge, generation unchanged
    t2 = spark.createDataFrame(
        [(100, "alpha beta"), (101, "beta gamma")], schema
    )
    t2.coalesce(1).write.mode("append").parquet(src)
    drain()
    assert text.resolve_bm25_index(index)["generation"] == 1

    # drifted tranche (all-new vocabulary): rebuild + flip mid-stream
    t3 = spark.createDataFrame(
        [(200 + i, "zeta eta") for i in range(4)], schema
    )
    t3.coalesce(1).write.mode("append").parquet(src)
    drain()
    assert text.resolve_bm25_index(index)["generation"] == 2
    q2 = ["alpha", "gamma", "zeta"]
    got2 = text.bm25_managed_topk(spark, index, q2).toPandas()
    want2 = text.bm25_scores(
        read_parquet(spark, corpus).select("doc_id", "text"), q2
    ).toPandas()
    assert got2.values.tolist() == want2.values.tolist()

    # crash drill: die inside the managed ingest after corpus publish
    real = text.bm25_reindex_on_drift

    def crashing(*a, **k):
        raise RuntimeError("simulated crash inside managed ingest")

    monkeypatch.setattr(text, "bm25_reindex_on_drift", crashing)
    t4 = spark.createDataFrame(
        [(300 + i, "omega psi") for i in range(4)], schema
    )
    t4.coalesce(1).write.mode("append").parquet(src)
    with _pytest.raises(Exception, match="simulated crash"):
        drain()
    # index still serves generation 2, consistently
    assert text.resolve_bm25_index(index)["generation"] == 2
    monkeypatch.setattr(text, "bm25_reindex_on_drift", real)
    drain()  # replay converges (t4 is all-new vocab -> generation 3)
    assert text.resolve_bm25_index(index)["generation"] == 3
    q3 = ["alpha", "zeta", "omega"]
    got3 = text.bm25_managed_topk(spark, index, q3).toPandas()
    want3 = text.bm25_scores(
        read_parquet(spark, corpus).select("doc_id", "text"), q3
    ).toPandas()
    assert got3.values.tolist() == want3.values.tolist()
    # idle replay moves nothing
    drain()
    assert text.resolve_bm25_index(index)["generation"] == 3


def test_streaming_managed_ivf_drain_drift_and_crash(spark, tmp_path, monkeypatch):
    """r14: the drift-aware dense ingest drain (the vector twin of the
    managed-bm25 drill) — tranche 1 bootstraps generation 1 by
    TRAINING the quantizer on itself (deterministic, replay-safe), an
    in-distribution tranche MERGEs (generation unchanged), a far-away
    cluster triggers re-train + rebuild + flip mid-stream, and the
    crash drill converges on replay."""
    import pytest as _pytest

    from pg_parquet_spark.operators import similarity
    from pg_parquet_spark.streaming.stream import drain_with_managed_ivf

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "managed_ivf")
    ckpt = str(tmp_path / "ckpt")
    schema = "vec_id long, embedding array<float>"

    def vec(i):
        return [
            float(i % 3 == 1) * 10.0 + 0.1,
            float(i % 3 == 2) * 10.0 + 0.1,
        ]

    def drain():
        drain_with_managed_ivf(
            spark.readStream.schema(t1.schema).parquet(src),
            corpus, index, n_cells=3, dims=2, checkpoint=ckpt,
        )

    # tranche 1 bootstraps generation 1 (quantizer trained on itself)
    t1 = spark.createDataFrame([(i, vec(i)) for i in range(60)], schema)
    t1.coalesce(1).write.mode("append").parquet(src)
    drain()
    m = similarity.resolve_ivf_index(index)
    assert m["generation"] == 1 and len(m["centroids"]) == 3

    # in-distribution tranche: cell merge, generation unchanged
    t2 = spark.createDataFrame(
        [(100 + i, vec(i)) for i in range(6)], schema
    )
    t2.coalesce(1).write.mode("append").parquet(src)
    drain()
    assert similarity.resolve_ivf_index(index)["generation"] == 1
    q = spark.createDataFrame([(0, [10.1, 0.1])], schema).withColumnRenamed(
        "vec_id", "query_id"
    )
    hits = similarity.ivf_managed_topk(
        spark, index, q, k=40, nprobe=3
    ).toPandas()
    assert {101, 104} <= set(hits.vec_id)  # merged rows searchable

    # drifted tranche (new far-away cluster): re-train + flip
    t3 = spark.createDataFrame(
        [(200 + i, [20.0, 20.0]) for i in range(40)], schema
    )
    t3.coalesce(1).write.mode("append").parquet(src)
    drain()
    m2 = similarity.resolve_ivf_index(index)
    assert m2["generation"] == 2
    assert m2["centroids"] != m["centroids"]  # the quantizer moved
    q2 = spark.createDataFrame([(0, [20.0, 20.0])], schema).withColumnRenamed(
        "vec_id", "query_id"
    )
    hits2 = similarity.ivf_managed_topk(
        spark, index, q2, k=5, nprobe=3
    ).toPandas()
    assert set(hits2.vec_id) <= set(range(200, 240))

    # crash drill: die inside the managed ingest after corpus publish
    real = similarity.reindex_on_drift

    def crashing(*a, **k):
        raise RuntimeError("simulated crash inside managed ingest")

    monkeypatch.setattr(similarity, "reindex_on_drift", crashing)
    t4 = spark.createDataFrame(
        [(300 + i, [-20.0, -20.0]) for i in range(40)], schema
    )
    t4.coalesce(1).write.mode("append").parquet(src)
    with _pytest.raises(Exception, match="simulated crash"):
        drain()
    assert similarity.resolve_ivf_index(index)["generation"] == 2
    monkeypatch.setattr(similarity, "reindex_on_drift", real)
    drain()  # replay converges: far cluster -> generation 3
    assert similarity.resolve_ivf_index(index)["generation"] == 3
    # idle replay moves nothing
    drain()
    assert similarity.resolve_ivf_index(index)["generation"] == 3


def test_streaming_active_users_drain(spark, tmp_path):
    """r14: the active-users drain maintains the (user, day) distinct
    index from the stream; after each tranche the dashboard read
    (active_users_from_index) is BIT-IDENTICAL to batch active_users
    over the full drained corpus; a replayed merge is a set-union
    no-op; an idle re-drain flips no pointers."""
    from pg_parquet_spark.operators import timeseries
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_active_users

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "events_corpus")
    idx = str(tmp_path / "au_index")
    ckpt = str(tmp_path / "ckpt")

    events = table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "user_id", "value"
    )
    t1 = events.filter("event_id % 2 = 0")
    t2 = events.filter("event_id % 2 = 1")

    def check_consistent():
        got = timeseries.active_users_from_index(
            layout.read_versioned(spark, idx), window_days=7
        ).collect()
        want = timeseries.active_users(
            read_parquet(spark, corpus), window_days=7
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert len(got) > 0

    t1.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema(events.schema).parquet(src)
    drain_with_active_users(sdf, corpus, idx, checkpoint=ckpt)
    check_consistent()

    t2.coalesce(1).write.mode("append").parquet(src)
    sdf2 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_active_users(sdf2, corpus, idx, checkpoint=ckpt)
    check_consistent()
    assert read_parquet(spark, corpus).count() == events.count()

    # replay convergence: re-merging tranche 2's pairs changes nothing
    current = layout.read_versioned(spark, idx)
    replayed = current.unionByName(
        timeseries.user_day_index(t2)
    ).distinct()
    assert replayed.count() == current.count()

    # idle re-drain: no new files -> no pointer movement on either root
    vc = layout.read_manifest(corpus)["version"]
    vs = layout.read_manifest(idx)["version"]
    sdf3 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_active_users(sdf3, corpus, idx, checkpoint=ckpt)
    assert layout.read_manifest(corpus)["version"] == vc
    assert layout.read_manifest(idx)["version"] == vs


def test_streaming_ewma_alerts_drain(spark, tmp_path):
    """r14: the EWMA drain maintains the (key, period, n) count index
    from the stream; after each tranche the live control band
    (ewma_from_counts over the index) is BIT-IDENTICAL to batch
    ewma_anomaly over the full drained corpus; a replayed SUM-merge
    would double counts, so the folded_batch_id gate carries
    convergence; an idle re-drain flips no pointers."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import timeseries
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_ewma_alerts

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "events_corpus")
    idx = str(tmp_path / "ewma_counts")
    ckpt = str(tmp_path / "ckpt")
    period = 21600

    events = table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "user_id", "value"
    )
    t1 = events.filter("event_id % 2 = 0")
    t2 = events.filter("event_id % 2 = 1")

    def check_consistent():
        got = timeseries.ewma_from_counts(
            layout.read_versioned(spark, idx), period
        ).collect()
        want = timeseries.ewma_anomaly(
            read_parquet(spark, corpus), period_sec=period
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert len(got) > 0

    t1.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema(events.schema).parquet(src)
    drain_with_ewma_alerts(sdf, corpus, idx, period_sec=period,
                           checkpoint=ckpt)
    check_consistent()

    t2.coalesce(1).write.mode("append").parquet(src)
    sdf2 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_ewma_alerts(sdf2, corpus, idx, period_sec=period,
                           checkpoint=ckpt)
    check_consistent()
    assert read_parquet(spark, corpus).count() == events.count()
    # the maintained index equals a from-scratch count of the corpus
    got_counts = sorted(
        map(tuple, layout.read_versioned(spark, idx).collect())
    )
    want_counts = sorted(
        map(
            tuple,
            timeseries.key_period_counts(
                read_parquet(spark, corpus), period
            ).collect(),
        )
    )
    assert got_counts == want_counts
    # a naive re-merge of tranche 2 WOULD drift (SUM is non-idempotent)
    # — which is exactly why the replay gate exists
    doubled = (
        layout.read_versioned(spark, idx)
        .unionByName(timeseries.key_period_counts(t2, period))
        .groupBy("key", "period")
        .agg(F.sum("n").alias("n"))
    )
    assert sorted(map(tuple, doubled.collect())) != got_counts

    # idle re-drain: no new files -> no pointer movement on either root
    vc = layout.read_manifest(corpus)["version"]
    vs = layout.read_manifest(idx)["version"]
    sdf3 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_ewma_alerts(sdf3, corpus, idx, period_sec=period,
                           checkpoint=ckpt)
    assert layout.read_manifest(corpus)["version"] == vc
    assert layout.read_manifest(idx)["version"] == vs
