"""Pipeline-operator behavior tests (dedup, similarity, multimodal,
as-of, streaming) on sf0.001 + constructed fixtures."""

import pytest
from pyspark.sql import functions as F

from pg_parquet_spark.operators import dedup, multimodal, similarity
from pg_parquet_spark.session import table

SF = "/root/testdata/sf0.001"


def test_dedup_exact_drops_planted_dupes(spark):
    docs = table(spark, SF, "documents").limit(50)
    doubled = docs.unionAll(docs.withColumn("doc_id", F.col("doc_id") + 1000))
    out = dedup.dedup_exact(doubled, "doc_id")
    rows = out.collect()
    assert len(rows) == 50
    assert all(r.dup_count == 2 for r in rows)
    assert all(r.doc_id < 1000 for r in rows)  # keeps the min id


def test_minhash_finds_planted_near_dup(spark):
    docs = table(spark, SF, "documents")
    # plant a near-duplicate: doc 0's text with one word changed
    base = docs.filter(F.col("doc_id") == 0)
    nd = base.select(
        (F.col("doc_id") + 9000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    corpus = docs.unionByName(nd)
    pairs = dedup.minhash_lsh_pairs(corpus, "doc_id", threshold=0.5).collect()
    assert any(p.id_a == 0 and p.id_b == 9000 for p in pairs)
    assert all(p.jaccard >= 0.5 for p in pairs)


def test_minhash_hot_bucket_capped(spark):
    """VERDICT r10 #2: a planted 200-doc duplicate class (one band
    bucket per band, 19,900 all-pairs without the cap) is routed OUT of
    the LSH tier by max_docs_per_band — zero pairs enumerated for the
    hot class, while an ordinary planted near-dup pair in the same
    corpus is still found."""
    docs = table(spark, SF, "documents").limit(50)
    boiler = spark.range(20000, 20200).select(
        F.col("id").alias("doc_id"),
        F.lit("cookie policy accept all cookies to continue reading this site").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.lit(64).alias("n_chars"),
    )
    base = docs.filter(F.col("doc_id") == 0)
    nd = base.select(
        (F.col("doc_id") + 9000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(nd).unionByName(boiler)
    pairs = dedup.minhash_lsh_pairs(corpus, "doc_id", threshold=0.5).collect()
    hot = [p for p in pairs if p.id_a >= 20000 and p.id_b >= 20000]
    assert hot == [], f"hot-class pairs leaked through the cap: {len(hot)}"
    assert any(p.id_a == 0 and p.id_b == 9000 for p in pairs)
    # the hot class IS caught by the linear exact tier (the routing)
    kept = dedup.dedup_exact(corpus, "doc_id").filter(
        F.col("doc_id") >= 20000
    ).collect()
    assert len(kept) == 1 and kept[0].dup_count == 200


def test_simhash_near_pairs_on_planted_dup(spark):
    docs = table(spark, SF, "documents").limit(100)
    clone = docs.filter(F.col("doc_id") == 5).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    corpus = docs.unionByName(clone)
    pairs = dedup.simhash_near_pairs(corpus, "doc_id", max_hamming=3).collect()
    assert any(p.id_a == 5 and p.id_b == 9005 for p in pairs)
    exact = [p for p in pairs if p.id_a == 5 and p.id_b == 9005]
    assert exact[0].hamming == 0  # identical text → identical simhash


def test_cosine_topk_self_similarity(spark):
    emb = table(spark, SF, "embeddings")
    query = emb.filter(F.col("vec_id") == 7)
    out = similarity.cosine_topk(emb, query, k=5).collect()
    assert out[0].vec_id == 7
    assert out[0].cosine_sim == pytest.approx(1.0, abs=1e-9)
    sims = [r.cosine_sim for r in out]
    assert sims == sorted(sims, reverse=True)


def test_ann_lsh_bucket_contains_query(spark):
    emb = table(spark, SF, "embeddings")
    query = emb.filter(F.col("vec_id") == 3)
    out = similarity.ann_lsh_topk(emb, query, k=5, bits=4).collect()
    # the query's own bucket always contains the query itself
    assert out[0].vec_id == 3
    assert out[0].cosine_sim == pytest.approx(1.0, abs=1e-9)


def test_multimodal_decode_plumbing(spark):
    docs = table(spark, SF, "documents").limit(20)
    media = multimodal.documents_as_media(docs)
    feats = multimodal.decode_media(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(16 <= r.width <= 255 for r in rows)
    assert all(0.0 <= r.mean_intensity <= 1.0 for r in rows)
    # deterministic: same blob → same features
    again = multimodal.decode_media(media, fake=True).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_multimodal_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="PIL/opencv"):
        multimodal.decode_image(b"bytes", fake=False)


def test_frame_sample_deterministic(spark):
    docs = table(spark, SF, "documents")
    media = multimodal.documents_as_media(docs)
    s1 = {r.media_id for r in multimodal.frame_sample(media, 10).collect()}
    s2 = {r.media_id for r in multimodal.frame_sample(media, 10).collect()}
    assert s1 == s2
    assert 0 < len(s1) < 500


def test_streaming_session_matches_batch_sessionize(spark):
    from pg_parquet_spark.operators.advanced_queries import q_sessionize_batch
    from pg_parquet_spark.operators.advanced_queries import q_stream_session

    batch = q_sessionize_batch(spark, SF)
    stream = q_stream_session(spark, SF)
    assert stream.count() == batch.count()


def test_asof_join_semantics(spark):
    from pg_parquet_spark.operators.advanced_queries import q_asof_join

    out = q_asof_join(spark, SF)
    ev = table(spark, SF, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    assert out.count() == purchases.count()
    # every matched click precedes (or ties) its purchase
    joined = out.join(
        ev.select(F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")),
        "purchase_id",
    ).join(
        ev.select(F.col("event_id").alias("last_click_id"), F.col("ts").alias("c_ts")),
        "last_click_id",
    )
    assert joined.filter(F.col("c_ts") > F.col("p_ts")).count() == 0


def test_stream_stream_join_matches_batch_interval_join(spark):
    """The watermarked stream-stream interval join drains to exactly the
    batch interval join on a finite source (same pairs, same deltas)."""
    from pg_parquet_spark.operators.advanced_queries import q_stream_stream_join

    streamed = q_stream_stream_join(spark, SF).collect()
    # session tz is UTC, so NTZ→LTZ cast preserves wall-clock values and
    # unix_micros (which requires TIMESTAMP) matches the stream path
    ev = table(spark, SF, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
    )
    batch = (
        c.join(
            p,
            (F.col("user_id") == F.col("p_uid"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias(
                "micros_to_purchase"
            ),
        )
        .orderBy("click_id", "purchase_id")
        .collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
    assert all(0 <= r.micros_to_purchase <= 3_600_000_000 for r in streamed)


def test_stream_multi_batch_window_agg_matches_batch(spark, tmp_path):
    """The windowed aggregate is exact even when the drain spans MANY
    micro-batches (maxFilesPerTrigger=1 over a 4-file source, files
    split by time so late-window state must carry across batches) —
    the property single-file AvailableNow drains don't exercise."""
    import os

    from pg_parquet_spark.streaming.stream import (
        run_available_now,
        windowed_event_counts,
    )

    ev = table(spark, SF, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "ev_files")
    # time-ordered 4-way split: each file covers a distinct time span
    ev.withColumn(
        "part", F.ntile(4).over(__import__("pyspark").sql.Window.orderBy("ts"))
    ).write.partitionBy("part").mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).drop("part").schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    streamed = run_available_now(windowed_event_counts(stream))
    batch = (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "event_count",
            "total_value",
        )
    )
    got = sorted(tuple(r) for r in streamed.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want
    # the drain genuinely ran multiple micro-batches
    n_files = sum(
        1 for root, _d, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    assert n_files >= 4


def test_stream_stream_join_state_carries_across_batches(spark, tmp_path):
    """Stream-stream join correctness when the two sides arrive over
    MANY micro-batches: a click from an early batch must still match a
    purchase arriving several batches later (join state retention up to
    the watermark). Exercises the join state store, which the
    single-file drain never does."""
    import os

    from pyspark.sql import Window

    from pg_parquet_spark.streaming.stream import (
        click_purchase_pairs,
        run_available_now,
    )

    ev = table(spark, SF, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "ev_files")
    ev.withColumn("part", F.ntile(4).over(Window.orderBy("ts"))).write.partitionBy(
        "part"
    ).mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).drop("part").schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    streamed = sorted(
        tuple(r)
        for r in run_available_now(
            click_purchase_pairs(stream(), stream()), output_mode="append"
        ).collect()
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
    )
    batch = sorted(
        tuple(r)
        for r in c.join(
            p,
            (F.col("user_id") == F.col("p_uid"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias(
                "micros_to_purchase"
            ),
        )
        .collect()
    )
    assert streamed == batch and len(streamed) > 0
    n_files = sum(
        1 for _r, _d, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    assert n_files >= 4


def test_contamination_flags_benchmark_members_and_broadcasts(spark):
    """Every benchmark member self-overlaps (contaminated), a disjoint
    synthetic doc stays clean, and the overlap join broadcasts the
    benchmark gram set (the corpus side must never shuffle)."""
    docs = table(spark, SF, "documents").select("doc_id", "text")
    clean = spark.createDataFrame(
        [(900_001, "zyx wvu tsr qpo nml kji hgf edc ba")], ["doc_id", "text"]
    )
    corpus = docs.unionByName(clean)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    out = dedup.contamination_flags(corpus, bench, ngram=5, min_shared=3)
    rows = {r.doc_id: r for r in out.collect()}
    bench_ids = [r.doc_id for r in bench.select("doc_id").collect()]
    assert bench_ids and all(rows[i].contaminated for i in bench_ids)
    assert not rows[900_001].contaminated
    assert rows[900_001].n_shared_grams == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_gopher_rules_fire_on_constructed_docs(spark):
    """Each Gopher rule individually rejects the document constructed to
    violate it, and a healthy document passes all rules."""
    from pg_parquet_spark.operators.text import with_gopher_flags

    good = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to be free of that noisy farm with plenty of room " * 5
    ).strip()
    docs = [
        (0, good),
        (1, "too short to have fifty words"),  # ok_word_count fails
        (2, " ".join(["a"] * 60)),  # mean word len < 3 (+ stopwords fail)
        (3, good + " " + "# " * 20),  # symbol ratio > 0.1
        (4, "\n".join(["- " + good[:40]] * 20)),  # all lines bullets
        (5, "\n".join([good[:40] + " ..."] * 20)),  # all lines ellipsis
        (6, good + " " + " ".join(["123"] * 60)),  # alpha fraction < 0.8
        (7, " ".join(["zebra giraffe lion"] * 30)),  # stopword hits < 2
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in with_gopher_flags(df).collect()}
    assert out[0].keep
    assert not out[1].ok_word_count and not out[1].keep
    assert not out[2].ok_mean_word_len and not out[2].keep
    assert not out[3].ok_symbol_ratio and not out[3].keep
    assert not out[4].ok_bullets and not out[4].keep
    assert not out[5].ok_ellipsis and not out[5].keep
    assert not out[6].ok_alpha_words and not out[6].keep
    assert not out[7].ok_stopwords and not out[7].keep


def test_stream_sink_crash_recovery_two_tranches(spark, tmp_path):
    """Crash-recovery story for the partitioned streaming sink
    (VERDICT r6 #6): a bounded source drained in two tranches against
    ONE checkpoint — with a simulated partial write of the second
    tranche's batch before the restart — must converge to exactly the
    batch-equivalent dataset, no duplicates, no losses."""
    from pg_parquet_spark.streaming.stream import (
        drain_to_partitioned_parquet,
        partitioned_batch_writer,
    )

    ev = table(spark, SF, "events").select("event_id", "event_type", "value")
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    t1 = ev.filter(F.col("event_id") % 2 == 0)
    t2 = ev.filter(F.col("event_id") % 2 == 1)
    t1.write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "64")
            .parquet(src)
        )

    # tranche 1: normal drain, checkpoint committed
    drain_to_partitioned_parquet(stream(), sink, ["event_type"], checkpoint=ckpt)
    assert spark.read.parquet(sink).count() == t1.count()

    # tranche 2 arrives; simulate a CRASH after batch 1 landed part of
    # its files but before the checkpoint commit: hand-write a partial
    # batch-1 publish, then restart the drain from the same checkpoint
    t2.write.mode("append").parquet(src)
    partitioned_batch_writer(sink, ["event_type"])(t2.limit(7), 1)
    assert spark.read.parquet(sink).count() == t1.count() + 7  # partial state

    drain_to_partitioned_parquet(stream(), sink, ["event_type"], checkpoint=ckpt)
    back = spark.read.parquet(sink)
    assert back.count() == ev.count()  # replay superseded the partial batch
    # value-level equality with the batch equivalent, not just counts
    # (select in source order — the hive layout moves the partition
    # column to the end)
    got = sorted(tuple(r) for r in back.select(*ev.columns).collect())
    want = sorted(tuple(r) for r in ev.collect())
    assert got == want

    # a third restart with nothing new is a no-op
    drain_to_partitioned_parquet(stream(), sink, ["event_type"], checkpoint=ckpt)
    assert spark.read.parquet(sink).count() == ev.count()


def _encode_bmp(pixels) -> bytes:
    """Minimal uncompressed 24-bpp bottom-up BMP encoder (test fixture;
    pixels: HxWx3 uint8 ndarray in BGR byte order, as BMP stores)."""
    import struct

    import numpy as np

    h, w, _ = pixels.shape
    row_bytes = ((24 * w + 31) // 32) * 4
    pad = row_bytes - w * 3
    body = b"".join(
        pixels[r].astype(np.uint8).tobytes() + b"\x00" * pad
        for r in range(h)
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def _encode_wav(samples, rate: int = 8000) -> bytes:
    """16-bit mono PCM WAV encoder (stdlib wave; test fixture)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def test_bmp_decode_real_roundtrip():
    """r9: uncompressed BMP decodes FOR REAL (stdlib+numpy) — known
    pixels round-trip to exact width/height/channels/mean, row padding
    excluded from the mean."""
    import numpy as np

    from pg_parquet_spark.operators.multimodal import decode_bmp, decode_image

    solid = np.full((5, 3, 3), 128, dtype=np.uint8)  # odd width => padded rows
    meta = decode_bmp(_encode_bmp(solid))
    assert (meta["width"], meta["height"], meta["n_channels"]) == (3, 5, 3)
    assert abs(meta["mean_intensity"] - 128 / 255) < 1e-12

    grad = np.zeros((2, 2, 3), dtype=np.uint8)
    grad[0, 0] = 255  # one white pixel of four => mean 255/4
    meta2 = decode_bmp(_encode_bmp(grad))
    assert abs(meta2["mean_intensity"] - (255 / 4) / 255) < 1e-12
    assert meta2["feature"] != meta["feature"]
    # dispatch: BM magic routes to the real decoder without fake=
    assert decode_image(_encode_bmp(solid)) == meta
    # compressed formats still refuse loudly
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="PNG/JPEG"):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx")


def test_wav_decode_real_roundtrip():
    """r9: PCM WAV decodes for real — a full-scale square wave has RMS
    ~1.0, a sine ~amp/sqrt(2); rate/duration exact."""
    import math

    import numpy as np

    from pg_parquet_spark.operators.multimodal import decode_wav

    n, rate = 8000, 8000
    square = np.where(np.arange(n) % 2 == 0, 32767, -32767)
    meta = decode_wav(_encode_wav(square, rate))
    assert meta["sample_rate"] == rate and meta["n_channels"] == 1
    assert abs(meta["duration_sec"] - 1.0) < 1e-12
    assert abs(meta["rms"] - 1.0) < 1e-3

    sine = (0.5 * 32768 * np.sin(2 * math.pi * 440 * np.arange(n) / rate)).astype(int)
    meta2 = decode_wav(_encode_wav(sine, rate))
    assert abs(meta2["rms"] - 0.5 / math.sqrt(2)) < 1e-3


def test_real_decode_distributed(spark):
    """The REAL decoders run through the same mapInPandas plumbing as
    the stub: BMP features and WAV features come back per media_id."""
    import numpy as np

    from pg_parquet_spark.operators.multimodal import (
        decode_audio_media,
        decode_media,
    )

    bmps = [
        (i, _encode_bmp(np.full((4, 4, 3), 10 * i, dtype=np.uint8)))
        for i in range(1, 6)
    ]
    df = spark.createDataFrame(bmps, "media_id long, blob binary")
    got = {r.media_id: r for r in decode_media(df, fake=False).collect()}
    assert len(got) == 5
    for i in range(1, 6):
        assert (got[i].width, got[i].height, got[i].n_channels) == (4, 4, 3)
        assert abs(got[i].mean_intensity - (10 * i) / 255) < 1e-9

    wavs = [
        (i, _encode_wav(np.full(4000, 1000 * i, dtype=np.int16), 8000))
        for i in range(1, 4)
    ]
    adf = spark.createDataFrame(wavs, "media_id long, blob binary")
    agot = {r.media_id: r for r in decode_audio_media(adf).collect()}
    assert len(agot) == 3
    for i in range(1, 4):
        assert agot[i].sample_rate == 8000
        assert abs(agot[i].duration_sec - 0.5) < 1e-12
        assert abs(agot[i].rms - (1000 * i) / 32768) < 1e-9


def test_bmp_codec_property_roundtrip():
    """Property test (hypothesis): ANY uint8 pixel grid round-trips
    through the hand encoder + real decoder with exact dims and mean —
    incl. odd widths (row padding) and single-pixel images."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pg_parquet_spark.operators.multimodal import decode_bmp

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        meta = decode_bmp(_encode_bmp(px))
        assert (meta["width"], meta["height"], meta["n_channels"]) == (w, h, 3)
        # decoder reads rows bottom-up; the SET of bytes is identical,
        # so the mean matches to float tolerance
        assert abs(meta["mean_intensity"] - float(px.mean()) / 255.0) < 1e-9

    check()


def _encode_ppm(px) -> bytes:
    """Binary netpbm encoder (P5 gray / P6 RGB; test fixture) with a
    header comment to exercise the comment-skipping parse."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    magic = b"P6" if ch == 3 else b"P5"
    header = magic + b"\n# fixture\n" + f"{w} {h}\n255\n".encode()
    return header + px.tobytes()


def test_ppm_decode_real_roundtrip():
    """r10: binary netpbm decodes for real — P6 RGB and P5 gray round
    trip with exact dims/mean; comments skipped; 16-bit refused; the
    sniffing dispatcher routes P5/P6 without fake=."""
    import numpy as np
    import pytest as _pytest

    from pg_parquet_spark.operators.multimodal import decode_image, decode_ppm

    rgb = np.full((4, 6, 3), 100, dtype=np.uint8)
    meta = decode_ppm(_encode_ppm(rgb))
    assert (meta["width"], meta["height"], meta["n_channels"]) == (6, 4, 3)
    assert abs(meta["mean_intensity"] - 100 / 255) < 1e-12

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    meta2 = decode_ppm(_encode_ppm(gray))
    assert (meta2["width"], meta2["height"], meta2["n_channels"]) == (4, 3, 1)
    assert abs(meta2["mean_intensity"] - gray.mean() / 255) < 1e-12
    assert decode_image(_encode_ppm(rgb)) == meta

    with _pytest.raises(NotImplementedError, match="16-bit"):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\0" * 24)
    with _pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\n\0\0\0")


def test_resize_media_nearest_neighbor(spark):
    """r10: the real resize stage — a 64x64 gradient downscales to
    16x16 by pure index striding (exact expected pixels), images within
    budget pass through, and the pipeline runs distributed through
    mapInPandas for BMP and PPM alike."""
    import hashlib as _hashlib

    import numpy as np

    from pg_parquet_spark.operators.multimodal import resize_media

    grad = np.zeros((64, 64, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(64, dtype=np.uint8)[None, :] * 4
    small = np.full((8, 8, 3), 7, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, _encode_ppm(grad)), (2, _encode_ppm(small))],
        "media_id long, blob binary",
    )
    got = {r.media_id: r for r in resize_media(df, max_side=16).collect()}
    assert (got[1].width, got[1].height) == (16, 16)
    rows = (np.arange(16) * 64) // 16
    expect = grad[rows][:, rows]
    assert got[1].feature == _hashlib.sha256(expect.tobytes()).hexdigest()[:16]
    assert abs(got[1].mean_intensity - float(expect.mean()) / 255.0) < 1e-12
    # within budget: untouched dims, original pixels hashed
    assert (got[2].width, got[2].height) == (8, 8)
    assert got[2].feature == _hashlib.sha256(small.tobytes()).hexdigest()[:16]


def test_audio_features_distributed(spark):
    """r10: zcr/peak/frame-RMS features — a full-scale square wave has
    zcr ~1 and peak 1; a burst-then-silence file shows max_frame_rms far
    above global rms; a constant (DC) signal has zcr 0."""
    import numpy as np

    from pg_parquet_spark.operators.multimodal import audio_features

    n, rate = 8000, 8000
    square = np.where(np.arange(n) % 2 == 0, 32767, -32767)
    dc = np.full(n, 8000, dtype=np.int16)
    burst = np.zeros(n, dtype=np.int16)
    burst[:200] = 32000  # 25ms of loud, then silence
    df = spark.createDataFrame(
        [
            (1, _encode_wav(square, rate)),
            (2, _encode_wav(dc, rate)),
            (3, _encode_wav(burst, rate)),
        ],
        "media_id long, blob binary",
    )
    got = {r.media_id: r for r in audio_features(df, frame_ms=25).collect()}
    assert got[1].zcr > 0.99 and abs(got[1].peak - 1.0) < 1e-3
    assert got[2].zcr == 0.0
    assert got[3].max_frame_rms > 5 * got[3].rms
    assert got[3].n_frames == 40  # 1s / 25ms


def test_lsh_hot_bucket_audit_surfaces_drops(spark):
    """ADVICE r11: the band cap's dropped side is now observable —
    lsh_hot_bucket_audit reports every over-cap (band_idx, key)
    bucket with its member count and min/max representative ids, and
    is empty exactly when minhash_lsh_pairs ran cap-free."""
    from pg_parquet_spark.operators import dedup

    hot = "subscribe to our newsletter for updates delivered every morning"
    docs = spark.createDataFrame(
        [(i, hot) for i in range(60)]
        + [(100, "the quick brown fox jumps over the lazy dog once more")],
        "doc_id long, text string",
    )
    audit = dedup.lsh_hot_bucket_audit(docs, "doc_id").collect()
    assert audit, "60 identical docs must trip the 50-doc band cap"
    # every band of the identical class is one 60-member bucket
    assert {r.n_members for r in audit} == {60}
    assert all(r.min_id == 0 and r.max_id == 59 for r in audit)
    assert audit == sorted(
        audit, key=lambda r: (-r.n_members, r.band_idx, r.key)
    )
    # a corpus with no over-cap class audits empty (no recall loss)
    varied = spark.createDataFrame(
        [(i, f"document number {i} discusses topic {i % 7} in detail")
         for i in range(80)],
        "doc_id long, text string",
    )
    assert dedup.lsh_hot_bucket_audit(varied, "doc_id").count() == 0


def test_cents_cast_equivalence(spark):
    """q1's r14 scaled-long rewrite rests on round(x*100) equalling the
    decimal(12,2)-cast route for 2-dp monetary doubles (a 2-dp decimal
    times 100 is an integer, so half-way rounding can never fire).
    Assert it row-by-row over every monetary column of every SF fixture
    present — the guard the q1_pricing_summary docstring cites."""
    import os

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        if not os.path.exists(os.path.join(sf, "lineitem.parquet")):
            continue
        li = table(spark, sf, "lineitem")
        bad = li.selectExpr(
            "sum(case when "
            + " or ".join(
                f"cast(round({c}*100) as long) != cast(cast({c} as decimal(12,2))*100 as long)"
                for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
            )
            + " then 1 else 0 end) as bad"
        ).collect()[0]["bad"]
        assert bad == 0, f"{sf}: {bad} rows diverge between round() and decimal cast"


def test_char_entropy_rle_equivalence(spark):
    """The r14 run-length char_entropy must be BIT-identical to the old
    filter-per-distinct-char formulation (same p values summed in the
    same sorted-char order), including the degenerate inputs: empty
    string, single char, single repeated char, NULL text."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import text as text_mod

    def entropy_reference(chars, sorted_distinct):
        n = F.size(chars).cast("double")
        terms = F.transform(
            sorted_distinct,
            lambda d: (
                F.size(F.filter(chars, lambda c: c == d)).cast("double") / n
            ),
        )
        raw = -F.aggregate(
            terms, F.lit(0.0), lambda acc, p: acc + p * F.log(p)
        ) / F.log(F.lit(2.0))
        return F.when(n > 0, raw + F.lit(0.0)).otherwise(F.lit(0.0))

    rows = [
        (1, "abcabc banana!"),
        (2, ""),
        (3, "x"),
        (4, "aaaaaaa"),
        (5, None),
        (6, "the quick brown fox jumps over the lazy dog 0123456789"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    staged = df.withColumn("_cs", F.split(F.col("text"), "")).withColumn(
        "_ss", F.array_sort(F.col("_cs"))
    )
    out = staged.withColumn(
        "_st", text_mod.char_run_starts(F.col("_cs"), F.col("_ss"))
    ).select(
        "doc_id",
        text_mod.char_entropy(F.col("_cs"), F.col("_st")).alias("new"),
        entropy_reference(
            F.col("_cs"), F.array_sort(F.array_distinct(F.col("_cs")))
        ).alias("old"),
    )
    for r in out.collect():
        # bit-identical, not approx: the sum runs the same float ops
        assert r["new"] == r["old"], (r["doc_id"], r["new"], r["old"])
