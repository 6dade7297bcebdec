"""10× scale soak for the dedup/ANN tier (the "plans you'd want at
100×" evidence the sf0.1 bench can't give).

Generates a deterministic synthetic corpus ~10× the sf0.1 fixtures
(50k documents with a planted near-duplicate fraction, 20k 64-dim
embeddings with cluster structure), then runs the heavy operators
end-to-end at local[32]:

- MinHash-LSH near-dup pairs (dedup.py:154)
- winnowing substring-dup pairs (dedup.py:527)
- near-dup connected components over the LSH pairs (dedup.py:615)
- PQ ANN top-k incl. codebook training (similarity.py:591-715)

For each stage it records wall time and asserts the physical-plan
shape that makes the operator scale (hash join where hinted, no
sort-merge paid on the capped fingerprint join, no cartesian products,
broadcast on the 1-row query side). Output: one JSON line + a
SCALE.md-ready summary block.

Usage: python tools/scale_soak.py [--docs 50000] [--embeddings 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = (
    "spark line column order small sort fast value scan batch part the a "
    "vector query agg table hash slow filter customer stream big merge "
    "group key join row page split codec shard probe build plan stage task"
).split()

SOAK_DIR = "/tmp/pgpq_scale10x"


def gen_documents(n_docs: int, dup_frac: float = 0.2, seed: int = 42) -> str:
    """Word-salad docs in the fixture's shape; the last ``dup_frac`` are
    near-duplicates of earlier docs (10% token mutation) so the dedup
    tiers have real recall work."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    n_base = int(n_docs * (1 - dup_frac))
    texts: list[str] = []
    for _ in range(n_base):
        n_tok = rng.randint(20, 90)
        texts.append(" ".join(rng.choice(VOCAB) for _ in range(n_tok)))
    for _ in range(n_docs - n_base):
        base = texts[rng.randrange(n_base)].split()
        out = [
            rng.choice(VOCAB) if rng.random() < 0.10 else t for t in base
        ]
        texts.append(" ".join(out))
    langs = ["en", "fr", "de", "zh", "es"]
    path = os.path.join(SOAK_DIR, "documents.parquet")
    os.makedirs(SOAK_DIR, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array([langs[i % len(langs)] for i in range(n_docs)]),
                "source": pa.array([f"src{i % 37}" for i in range(n_docs)]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        path,
        row_group_size=8192,
    )
    return path


def gen_embeddings(n: int, dims: int = 64, clusters: int = 10, seed: int = 7) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1, 1) for _ in range(dims)] for _ in range(clusters)
    ]
    vecs, labels = [], []
    for i in range(n):
        c = i % clusters
        labels.append(c)
        vecs.append(
            [centers[c][d] + rng.gauss(0, 0.15) for d in range(dims)]
        )
    path = os.path.join(SOAK_DIR, "embeddings.parquet")
    os.makedirs(SOAK_DIR, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        path,
        row_group_size=4096,
    )
    return path


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_in(plan: str, needle: str, stage: str, errors: list[str]) -> None:
    if needle not in plan:
        errors.append(f"{stage}: expected {needle} in plan")


def _assert_not_in(plan: str, needle: str, stage: str, errors: list[str]) -> None:
    if needle in plan:
        errors.append(f"{stage}: unexpected {needle} in plan")


def run(docs: int = 50_000, embeddings: int = 20_000) -> dict:
    """Run the soak and return the artifact dict (tools/soak_artifact.py
    folds it into the driver-visible SOAK_r{N}.json — VERDICT r7 #6)."""
    import types

    args = types.SimpleNamespace(docs=docs, embeddings=embeddings)

    print(f"generating {args.docs} docs / {args.embeddings} embeddings ...")
    t0 = time.time()
    doc_path = gen_documents(args.docs)
    emb_path = gen_embeddings(args.embeddings)
    gen_s = round(time.time() - t0, 1)

    from pyspark.sql import functions as F  # noqa: F401

    from pg_parquet_spark.operators import dedup, similarity
    from pg_parquet_spark.session import get_spark

    spark = get_spark("scale_soak")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(doc_path)
    emb = spark.read.parquet(emb_path)

    results: dict[str, float] = {"generate": gen_s}
    errors: list[str] = []

    # --- minhash LSH pairs -------------------------------------------------
    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id")
    n_pairs = pairs.count()
    results["minhash_lsh"] = round(time.time() - t0, 1)
    plan = _plan(pairs)
    _assert_not_in(plan, "CartesianProduct", "minhash", errors)
    _assert_not_in(plan, "BroadcastNestedLoopJoin", "minhash", errors)
    print(f"minhash: {n_pairs} pairs in {results['minhash_lsh']}s")

    # --- connected components over those pairs ----------------------------
    t0 = time.time()
    clusters = dedup.near_dup_clusters(docs, "doc_id", pairs=pairs)
    n_clustered = clusters.count()
    results["clusters"] = round(time.time() - t0, 1)
    print(f"clusters: {n_clustered} labeled docs in {results['clusters']}s")

    # --- winnowing substring pairs -----------------------------------------
    t0 = time.time()
    wpairs = dedup.winnow_shared_pairs(docs, "doc_id", min_shared=2)
    n_wpairs = wpairs.count()
    results["winnow"] = round(time.time() - t0, 1)
    plan = _plan(wpairs)
    _assert_in(plan, "ShuffledHashJoin", "winnow", errors)
    # the hinted fp-join must not fall back to a sort; SMJ appearing
    # anywhere in this plan means the hint was dropped
    _assert_not_in(plan, "SortMergeJoin", "winnow", errors)
    print(f"winnow: {n_wpairs} pairs in {results['winnow']}s")

    # --- PQ ANN (train + search) -------------------------------------------
    t0 = time.time()
    q = emb.filter(F.col("vec_id") == 0).select("embedding")
    top = similarity.pq_topk(emb, q, k=10)
    rows = top.collect()
    results["pq_ann"] = round(time.time() - t0, 1)
    plan = _plan(top)
    # r8: query + ADC tables are plan literals — no query-side join at
    # all (the r7 shape broadcast the 1-row query against every corpus
    # row); only the winning-cell hash join and the top-k remain
    _assert_not_in(plan, "BroadcastNestedLoopJoin", "pq", errors)
    _assert_in(plan, "BroadcastHashJoin", "pq (cell shortlist join)", errors)
    _assert_in(plan, "TakeOrderedAndProject", "pq", errors)
    print(f"pq_ann: top-{len(rows)} in {results['pq_ann']}s")

    # --- text-curation tier (r6): gopher + c4 + tfidf + decontaminate ------
    from pg_parquet_spark.operators import text as text_ops

    t0 = time.time()
    flags = text_ops.with_gopher_flags(docs)
    n_keep = flags.filter(F.col("keep")).count()
    results["gopher"] = round(time.time() - t0, 1)
    plan = _plan(flags)
    _assert_not_in(plan, "Exchange", "gopher (pure map stage)", errors)
    print(f"gopher: {n_keep}/{args.docs} kept in {results['gopher']}s")

    t0 = time.time()
    cleaned = text_ops.c4_clean(docs)
    n_c4 = cleaned.filter(F.col("keep_doc")).count()
    results["c4"] = round(time.time() - t0, 1)
    plan = _plan(cleaned)
    _assert_not_in(plan, "Exchange", "c4 (pure map stage)", errors)
    print(f"c4: {n_c4}/{args.docs} kept in {results['c4']}s")

    t0 = time.time()
    top_terms = text_ops.tfidf_top_terms(docs, k=3)
    n_terms = top_terms.count()
    results["tfidf"] = round(time.time() - t0, 1)
    plan = _plan(top_terms)
    _assert_in(plan, "BroadcastHashJoin", "tfidf (df table broadcast)", errors)
    _assert_not_in(plan, "CartesianProduct", "tfidf", errors)
    print(f"tfidf: {n_terms} term rows in {results['tfidf']}s")

    t0 = time.time()
    bench_set = docs.filter(F.col("doc_id") % 100 == 0)
    contaminated = dedup.contamination_flags(docs, bench_set)
    n_cont = contaminated.filter(F.col("contaminated")).count()
    results["decontaminate"] = round(time.time() - t0, 1)
    plan = _plan(contaminated)
    _assert_in(plan, "BroadcastHashJoin", "decontaminate (bench grams broadcast)", errors)
    print(f"decontaminate: {n_cont} flagged in {results['decontaminate']}s")

    # --- r7 additions: unigram LM scoring + segment dedup ------------------
    from pg_parquet_spark.operators import analytics_queries as aq

    t0 = time.time()
    scored = aq.q_text_unigram_logprob(spark, SOAK_DIR)
    n_scored = scored.count()
    results["unigram_lm"] = round(time.time() - t0, 1)
    plan = _plan(scored)
    _assert_not_in(plan, "CartesianProduct", "unigram", errors)
    _assert_not_in(plan, "SortMergeJoin", "unigram (tiny vocab broadcasts)", errors)
    print(f"unigram_lm: {n_scored} docs scored in {results['unigram_lm']}s")

    t0 = time.time()
    segs = aq.q_dedup_segments(spark, SOAK_DIR)
    n_seg_docs = segs.filter(F.col("n_dup") > 0).count()
    results["segment_dedup"] = round(time.time() - t0, 1)
    plan = _plan(segs)
    _assert_not_in(plan, "CartesianProduct", "segments", errors)
    _assert_not_in(plan, "BroadcastNestedLoopJoin", "segments", errors)
    print(
        f"segment_dedup: {n_seg_docs}/{args.docs} docs with dup segments "
        f"in {results['segment_dedup']}s"
    )

    results["total"] = round(sum(results.values()), 1)
    ok = not errors
    return {
        "soak": "scale10x",
        "docs": args.docs,
        "embeddings": args.embeddings,
        "pairs_minhash": n_pairs,
        "docs_clustered": n_clustered,
        "pairs_winnow": n_wpairs,
        "seconds": results,
        "plan_ok": ok,
        "plan_errors": errors,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--embeddings", type=int, default=20_000)
    args = ap.parse_args()
    out = run(args.docs, args.embeddings)
    print(json.dumps(out))
    return 0 if out["plan_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
