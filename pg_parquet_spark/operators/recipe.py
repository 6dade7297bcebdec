"""Composed corpus-curation recipe (r10): the end-to-end pass a
training-data team actually runs, assembled from this package's proven
pieces — extraction → length bounds → near-dup grouping → leakage-safe
split — with ONE DuckDB oracle chaining the same stages, so the
COMPOSITION is oracle-certified, not just the parts.

Scale shape is the sum of its parts, all previously measured: the
extraction and token count are codegen projections over one scan; the
fingerprint groupBy shuffles 16-byte keys; the split is a projection.
Raw text is read once and never shuffles. At 100 TB each stage's
evidence is in SCALE.md under its own operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_parquet_spark.operators.text import strip_html, strip_html_sql


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    valid_ppm: int = 100_000,
) -> DataFrame:
    """Curate a raw (possibly HTML) corpus into a training table:

    1. **extract** — :func:`text.strip_html` (markup → clean text);
    2. **bound** — drop documents outside [min_tokens, max_tokens]
       (the cheap C4/Gopher length gate);
    3. **group** — normalized-fingerprint near-dup groups with the
       smallest id as canonical (the dedup_normalized equivalence);
    4. **split** — group-granular train/valid assignment (the
       leakage_safe_split hash), so near-dups never straddle.

    Returns (id, n_tokens, group_id, is_canonical, split), ordered by
    id — one row per surviving document. Downstream: train set =
    ``is_canonical AND split = 'train'``; the non-canonical rows are
    retained so the drop decisions stay auditable (the SemDeDup
    keep-column convention).

    NEAR-DUP residual (ADVICE r11): step 3 collapses NORMALIZED
    equivalence only. If a fuzzier tier (``dedup.minhash_lsh_pairs``
    / ``dedup.dedup_incremental_near``) is composed around this
    recipe, its band cap (``dedup.MAX_DOCS_PER_BAND``) can drop a
    near-VARIANT of an over-cap boilerplate class whose only shared
    buckets are hot — run :func:`dedup.lsh_hot_bucket_audit` to see
    exactly which buckets the cap silenced, then raise the cap or
    rely on this recipe's normalized grouping having already
    collapsed the verbatim class."""
    from pg_parquet_spark.operators.sampling import split_by_group
    from pg_parquet_spark.operators.text import normalized_fingerprint

    # r14 second pass (guide §2.2): the strip_html + fingerprint
    # projection is regex-dense per row — spread it when the scan is
    # narrower than the cluster (many-file 100 TB inputs skip this)
    from pg_parquet_spark.operators.common import spread_if_narrow

    src = spread_if_narrow(df.select(id_col, text_col), id_col)
    clean = src.select(
        F.col(id_col), strip_html(F.col(text_col)).alias("_ctext")
    )
    tok = clean.select(
        id_col,
        "_ctext",
        F.size(F.split(F.lower(F.col("_ctext")), " ")).cast("long").alias(
            "n_tokens"
        ),
    ).filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)
    )
    fp = tok.select(
        id_col,
        "n_tokens",
        normalized_fingerprint(F.col("_ctext")).alias("_fp"),
    )
    # r14 second pass (guide §2.4): window-min over the fingerprint
    # replaces the groupBy + join-back — ONE exchange on _fp instead of
    # an aggregate exchange plus a join that re-planned the whole
    # strip_html+fingerprint pipeline for its second consumer.
    # Interleaved A/B at sf0.1: 1.870 → 0.638 s min (−66%) with the
    # spread; digest-identical.
    from pyspark.sql.window import Window

    joined = fp.withColumn(
        "group_id", F.min(id_col).over(Window.partitionBy("_fp"))
    ).select(
        id_col,
        "n_tokens",
        "group_id",
        (F.col(id_col) == F.col("group_id")).alias("is_canonical"),
    )
    return (
        split_by_group(joined, "group_id", valid_ppm)
        .select(id_col, "n_tokens", "group_id", "is_canonical", "split")
        .orderBy(id_col)
    )


def curate_oracle_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    valid_ppm: int = 100_000,
    table: str = "documents",
) -> str:
    """DuckDB replica chaining the same four stages: the shared
    strip_html pattern chain, the same token bound, the
    q_dedup_normalized fingerprint, the md5-prefix group split."""
    clean = strip_html_sql(text_col)
    fp = (
        "md5(array_to_string(list_sort(list_distinct("
        "string_split(lower(_ctext), ' '))), ' '))"
    )
    return f"""
WITH clean AS (
  SELECT {id_col}, {clean} AS _ctext FROM {table}
), tok AS (
  SELECT {id_col}, _ctext,
         CAST(len(string_split(lower(_ctext), ' ')) AS BIGINT) AS n_tokens
  FROM clean
  WHERE len(string_split(lower(_ctext), ' ')) BETWEEN {min_tokens} AND {max_tokens}
), fp AS (
  SELECT {id_col}, n_tokens, {fp} AS _fp FROM tok
), canon AS (
  SELECT _fp, MIN({id_col}) AS group_id FROM fp GROUP BY 1
)
SELECT fp.{id_col}, fp.n_tokens, canon.group_id,
       fp.{id_col} = canon.group_id AS is_canonical,
       CASE WHEN (CAST(CONCAT('0x', substr(md5(CAST(canon.group_id AS VARCHAR)), 1, 6))
                 AS BIGINT) * 1000000) >> 24 < {valid_ppm}
            THEN 'valid' ELSE 'train' END AS split
FROM fp JOIN canon USING (_fp)
ORDER BY fp.{id_col}
"""


def classifier_canonical(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-aware canonical selection (r11 composition): near-dup
    clusters keep their HIGHEST-classifier-logit member instead of an
    arbitrary one — when a boilerplate family has one clean rendition
    and four mangled ones, the clean one survives. Composes three
    proven pieces into one plan: MinHash-LSH clusters
    (``dedup.near_dup_clusters``), the frozen literal-weight classifier
    (``sampling.apply_quality_classifier``), and the representative
    rule (``dedup.canonical_per_cluster`` with the logit as quality,
    ties to the smallest id). Returns (id, cluster_id, keep), ordered.

    Scale shape = the parts': signatures and scoring are projections
    (weights in the plan, zero joins for scoring); clusters touch only
    paired docs; the final decision join moves ids + one long.

    r14 optimization (guide §1.2 "don't compute things twice"): the
    pre-r14 plan joined the classifier scores onto (id, text) and fed
    that JOINED frame to the minhash pipeline and to BOTH joins inside
    ``canonical_per_cluster`` — the word-explode + md5-bucket + per-doc
    aggregate scoring pipeline executed three times, once inside every
    consumer's lineage. Now the scores frame (id + one long, ~16 B/row)
    is computed once and persisted (dedup module's self-cleaning
    registry), the cluster machinery reads the raw (id, text) frame,
    and ``canonical_per_cluster`` takes the persisted scores AS its
    corpus frame. Row-set equivalence: scores has exactly one row per
    document the old inner join kept (the per-doc groupBy after the
    token explode), and the verified-pair set is unchanged because the
    minhash verify filter drops any pair whose shingle arrays the old
    join would have excluded — oracle hash-identical at both SFs."""
    from pg_parquet_spark.operators import dedup
    from pg_parquet_spark.operators.sampling import apply_quality_classifier

    base = df.select(id_col, text_col)
    pairs = dedup.minhash_lsh_pairs(base, id_col, text_col)
    scores = (
        apply_quality_classifier(df, model, id_col=id_col, text_col=text_col)
        .select(id_col, "logit_micro")
        .persist()
    )
    # appended AFTER minhash_lsh_pairs: that call release_cached()s the
    # previous minhash invocation's frames at entry, which would drop
    # this handle too if it were registered first.
    dedup._CACHED_FRAMES.append(scores)
    clusters = dedup.near_dup_clusters(base, id_col, pairs=pairs)
    return dedup.canonical_per_cluster(
        scores, id_col, quality_col="logit_micro", clusters=clusters
    )


def classifier_canonical_oracle_sql(
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB replica chaining the cluster closure, the VALUES-join
    classifier logit, and the (logit DESC, id ASC) representative
    rank."""
    from pg_parquet_spark.operators.dedup import near_dup_clusters_oracle_sql

    n_buckets = model["n_buckets"]
    w = model["w_micro"]
    if w:
        values = ", ".join(f"({int(b)}, {int(m)})" for b, m in sorted(w.items()))
        wjoin = f"LEFT JOIN (VALUES {values}) AS wt(f, wm) USING (f)"
    else:
        wjoin = (
            "LEFT JOIN (SELECT NULL::BIGINT AS f, NULL::BIGINT AS wm "
            "WHERE false) wt USING (f)"
        )
    return f"""
WITH labeled AS (
  SELECT * FROM ({near_dup_clusters_oracle_sql()}) t
), ex AS (
  SELECT {id_col},
         CAST(CONCAT('0x', substr(md5(w), 1, 6)) AS BIGINT) % {n_buckets} AS f
  FROM (SELECT {id_col}, unnest(string_split(lower({text_col}), ' ')) AS w
        FROM {table})
), logits AS (
  SELECT {id_col},
         CAST(SUM(COALESCE(wm, 0)) + {int(model["bias_micro"])} AS BIGINT)
           AS logit_micro
  FROM ex {wjoin}
  GROUP BY {id_col}
), ranked AS (
  SELECT l.{id_col}, l.cluster_id,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY s.logit_micro DESC, l.{id_col} ASC)
           AS rk
  FROM labeled l JOIN logits s USING ({id_col})
)
SELECT d.{id_col},
       COALESCE(r.cluster_id, d.{id_col}) AS cluster_id,
       (r.rk IS NULL OR r.rk = 1) AS keep
FROM {table} d LEFT JOIN ranked r USING ({id_col})
ORDER BY d.{id_col}
"""


def contamination_report(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    ngram: int = 5,
    min_shared: int = 3,
    min_matches: int = 12,
) -> DataFrame:
    """Per-SOURCE benchmark-contamination datasheet (r11 composition):
    both decontamination tiers — exact n-gram overlap
    (``dedup.contamination_flags``) and MinHash near-duplication
    (``dedup.near_contamination_flags``) — folded into one release
    table: (source, n_docs, n_exact, n_near, exact_ppm, near_ppm),
    ordered. Integer ppm via positive integer division, so the report
    replicates bit-for-bit in the chained oracle. This is the
    "which supplier leaked the benchmark" table a data release ships
    next to the corpus_datacard.

    r14 (guide §2.4 "remove shuffles outright"): both tiers feed their
    HITS frames (exact: (id, gram-hit count); near: distinct flagged
    ids) straight into TWO left joins on (id, source) — the pre-r14
    shape routed each tier through its public full-corpus flags frame
    (a left back-join per tier, plus the near tier's ORDER BY) and then
    inner-joined both onto the corpus AGAIN: four id-keyed exchanges of
    the full corpus id set + one sort, where two joins suffice. Flag
    semantics are computed inline from the coalesced hit columns —
    identical by construction (both tiers' flags frames are total maps
    over the corpus ids: left-joining the underlying hits and applying
    the same coalesce/threshold yields the same flag per id, and the
    pre-r14 inner joins kept every corpus row because the maps are
    total)."""
    from pg_parquet_spark.operators import dedup

    # near first: _near_contaminated_ids release_cached()s at entry
    # (it persists both signature frames), which must not drop frames
    # a later helper registers.
    near = dedup._near_contaminated_ids(
        df, benchmark, id_col, text_col, min_matches
    )
    exact = dedup._contamination_hits(df, benchmark, id_col, text_col, ngram)
    return (
        df.select(id_col, source_col)
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                (F.coalesce(F.col("_dc_n"), F.lit(0)) >= min_shared).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("n_exact"),
            F.sum(F.coalesce(F.col("_nc"), F.lit(False)).cast("long"))
            .cast("long")
            .alias("n_near"),
        )
        .select(
            source_col,
            "n_docs",
            "n_exact",
            "n_near",
            F.expr("n_exact * 1000000 div n_docs").cast("long").alias("exact_ppm"),
            F.expr("n_near * 1000000 div n_docs").cast("long").alias("near_ppm"),
        )
        .orderBy(source_col)
    )


def contamination_report_oracle_sql(
    corpus_pred: str,
    bench_pred: str,
    source_col: str = "source",
    ngram: int = 5,
    min_shared: int = 3,
    min_matches: int = 12,
    table: str = "documents",
) -> str:
    """DuckDB replica chaining both tiers' oracles into the per-source
    fold (corpus and benchmark as disjoint predicate splits)."""
    from pg_parquet_spark.operators.dedup import (
        contamination_oracle_sql,
        near_contamination_oracle_sql,
    )

    exact = contamination_oracle_sql(
        ngram=ngram,
        min_shared=min_shared,
        bench_pred=bench_pred,
        table=table,
        corpus_pred=corpus_pred,
    )
    near = near_contamination_oracle_sql(
        corpus_pred, bench_pred, table=table, min_matches=min_matches
    )
    return f"""
WITH exact_t AS ({exact}), near_t AS ({near})
SELECT d.{source_col},
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN e.contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN n.near_contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
       CAST(SUM(CASE WHEN e.contaminated THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS exact_ppm,
       CAST(SUM(CASE WHEN n.near_contaminated THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS near_ppm
FROM {table} d
JOIN exact_t e ON e.doc_id = d.doc_id
JOIN near_t n ON n.doc_id = d.doc_id
GROUP BY d.{source_col} ORDER BY d.{source_col}
"""


def corpus_datacard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """One-row corpus DATA CARD — the summary table a dataset release
    ships (Gebru et al. 2021 datasheets): document and exact token
    counts, source diversity, and the normalized near-duplicate rate,
    in one pass plus one 16-byte-key aggregate. All cross-row math is
    exact integers (counts and integer token sums), so the card
    replicates bit-for-bit in the oracle and is stable across
    partitionings — an auditable artifact, not a sample estimate.

    dup_ratio_ppm = 10⁶ · (n_docs − n_normalized_groups) / n_docs,
    integer division — the fraction of documents that are a normalized
    near-duplicate of an earlier one."""
    from pg_parquet_spark.operators.text import (
        normalized_fingerprint,
        token_count,
    )

    base = df.select(
        F.col(id_col),
        F.col(source_col),
        token_count(F.col(text_col)).alias("_nt"),
        normalized_fingerprint(F.col(text_col)).alias("_fp"),
    )
    return base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("total_tokens"),
        F.min("_nt").cast("long").alias("min_tokens"),
        F.max("_nt").cast("long").alias("max_tokens"),
        F.countDistinct(source_col).cast("long").alias("n_sources"),
        F.countDistinct("_fp").cast("long").alias("n_unique_normalized"),
    ).select(
        "n_docs",
        "total_tokens",
        F.expr("total_tokens div n_docs").cast("long").alias("mean_tokens"),
        "min_tokens",
        "max_tokens",
        "n_sources",
        "n_unique_normalized",
        F.expr("(n_docs - n_unique_normalized) * 1000000 div n_docs")
        .cast("long")
        .alias("dup_ratio_ppm"),
    )


def datacard_oracle_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    table: str = "documents",
) -> str:
    """DuckDB replica: identical token/fingerprint staging, identical
    integer derivations."""
    fp = (
        f"md5(array_to_string(list_sort(list_distinct("
        f"string_split(lower({text_col}), ' '))), ' '))"
    )
    return f"""
WITH base AS (
  SELECT {id_col}, {source_col},
         CAST(len(string_split(lower({text_col}), ' ')) AS BIGINT) AS _nt,
         {fp} AS _fp
  FROM {table}
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(_nt) AS BIGINT) AS total_tokens,
         CAST(MIN(_nt) AS BIGINT) AS min_tokens,
         CAST(MAX(_nt) AS BIGINT) AS max_tokens,
         CAST(COUNT(DISTINCT {source_col}) AS BIGINT) AS n_sources,
         CAST(COUNT(DISTINCT _fp) AS BIGINT) AS n_unique_normalized
  FROM base
)
SELECT n_docs, total_tokens,
       CAST(total_tokens // n_docs AS BIGINT) AS mean_tokens,
       min_tokens, max_tokens, n_sources, n_unique_normalized,
       CAST((n_docs - n_unique_normalized) * 1000000 // n_docs AS BIGINT)
         AS dup_ratio_ppm
FROM agg
"""


def curriculum_from_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bins: int = 8,
    salt: str = "",
) -> DataFrame:
    """Composed curriculum recipe (r12 — the curate_corpus pattern:
    proven pieces in ONE plan, certified by ONE chained oracle):
    bigram-LM difficulty → equi-depth bin assignment at power-of-two
    binary-fraction percentile edges (the perplexity_datamap binning,
    engine-exact) → deterministic global training order within the
    easy→hard curriculum (``sampling.curriculum_order``: md5(salt∥id)
    within-bin shuffle, position via the distributed two-pass rank —
    no global sort). The output IS the dataloader's epoch: read
    ``ORDER BY global_pos`` (or range-filter per worker) and the
    identical curriculum replays on any cluster or engine; ``salt``
    reshuffles epochs without moving the difficulty blocks.

    Returns (id, bin, mean_nll_micro, global_pos), ordered by
    global_pos. Documents with no bigram (single-token) drop out of
    the scored set — the bigram_logprob contract, mirrored by the
    oracle."""
    from pg_parquet_spark.operators import text as text_mod
    from pg_parquet_spark.operators.sampling import curriculum_order

    if n_bins < 2 or (n_bins & (n_bins - 1)) != 0:
        raise ValueError(
            f"n_bins must be a power of two ≥ 2, got {n_bins}"
        )
    # persist the doc-level scored table (r14): this plan references
    # scored twice (edges + binning) and binned twice (the curriculum
    # rank + the final payload join) — unpersisted, the expensive
    # bigram pipeline re-ran up to 4× in one plan (37 exchanges; the
    # worst gate plan in PLANS.md). Registered in text's self-cleaning
    # cache (the dedup.py convention, one registry per family).
    text_mod.release_cached()
    scored = text_mod._bigram_scored(df, id_col, text_col).persist()
    text_mod._CACHED_FRAMES.append(scored)
    fr = [i / n_bins for i in range(1, n_bins)]
    edges = scored.agg(
        F.expr(
            f"percentile(mean_nll_micro, array({', '.join(map(repr, fr))}))"
        ).alias("_edges")
    )
    binned = (
        scored.crossJoin(F.broadcast(edges))
        .withColumn(
            "bin",
            F.size(
                F.filter(
                    F.col("_edges"),
                    lambda e: F.col("mean_nll_micro").cast("double") > e,
                )
            ).cast("long"),
        )
        .select(id_col, "bin", "mean_nll_micro")
        .persist()
    )
    text_mod._CACHED_FRAMES.append(binned)
    # r14 optimization: mean_nll_micro rides THROUGH the curriculum
    # rank (curriculum_order keep_cols) instead of being re-attached
    # by an id-keyed join-back — one shuffle fewer, same rows/order.
    ordered = curriculum_order(
        binned, id_col, "bin", salt=salt, keep_cols=("mean_nll_micro",)
    )
    return ordered.select(
        id_col, "bin", "mean_nll_micro", "global_pos"
    ).orderBy("global_pos")


def curriculum_perplexity_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bins: int = 8,
    salt: str = "",
) -> str:
    """DuckDB replica chaining the bigram oracle, quantile_cont edges
    at the same binary fractions, the same strict-greater bin count,
    and the single-window curriculum rank."""
    from pg_parquet_spark.operators.text import bigram_oracle_sql

    fr = [i / n_bins for i in range(1, n_bins)]
    return f"""
WITH scored AS ({bigram_oracle_sql(table, id_col, text_col)}),
edges AS (
  SELECT quantile_cont(CAST(mean_nll_micro AS DOUBLE),
                       [{', '.join(map(repr, fr))}]) AS e
  FROM scored
),
binned AS (
  SELECT s.{id_col},
         CAST(len(list_filter(e, x -> CAST(s.mean_nll_micro AS DOUBLE) > x))
              AS BIGINT) AS bin,
         s.mean_nll_micro
  FROM scored s CROSS JOIN edges
),
keyed AS (
  SELECT {id_col}, bin, mean_nll_micro,
         md5({salt!r} || CAST({id_col} AS VARCHAR)) AS shuf
  FROM binned
)
SELECT {id_col}, bin, mean_nll_micro,
       CAST(row_number() OVER (ORDER BY bin, shuf, {id_col}) AS BIGINT)
         AS global_pos
FROM keyed
ORDER BY global_pos
"""


def hybrid_search(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_df: DataFrame,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    k0: int = 60,
    shortlist: int = 50,
    top_k: int = 20,
) -> DataFrame:
    """Hybrid lexical+dense retrieval (r13 — the composed-recipe
    pattern): BM25 over the corpus text and exact cosine over the
    embedding column each produce a bounded shortlist; Reciprocal Rank
    Fusion combines them without score calibration
    (``similarity.reciprocal_rank_fusion`` — integer nano-unit
    contributions, engine-exact). Returns (id, n_lists, rrf_nano)
    best-first — the standard RAG retrieval stack as ONE Spark plan.

    ID-NAMESPACE REQUIREMENT (the hard_negatives convention): document
    ids and vector ids must share a namespace, or fusion degenerates
    to interleaving two unrelated lists.

    Scale shape: each ranker ends in TakeOrderedAndProject (bounded
    top-``shortlist``), so the rank windows and the fusion union run
    over ≤2·shortlist rows — bounded frames, the benign single-task
    exception (the MAX_INDEX_QUERIES convention), never a data-sized
    global window. The corpus text and the vectors are each read
    once and never shuffle."""
    from pyspark.sql import Window

    from pg_parquet_spark.operators import similarity, text

    lex = text.bm25_scores(docs, query_terms, id_col=doc_id_col).limit(
        shortlist
    )
    wl = Window.orderBy(F.col("score_micro").desc(), F.col(doc_id_col))
    lex_r = lex.select(
        F.col(doc_id_col), F.row_number().over(wl).alias("rank")
    )
    dense = similarity.cosine_topk(
        emb, query_df, k=shortlist, id_col=vec_id_col
    )
    wd = Window.orderBy(F.col("cosine_sim").desc(), F.col(vec_id_col))
    dense_r = dense.select(
        F.col(vec_id_col).alias(doc_id_col),
        F.row_number().over(wd).alias("rank"),
    )
    return similarity.reciprocal_rank_fusion(
        [lex_r, dense_r], id_col=doc_id_col, k0=k0, top_k=top_k
    )


def hybrid_search_oracle_sql(
    query_terms: list[str],
    query_id: int = 0,
    k0: int = 60,
    shortlist: int = 50,
    top_k: int = 20,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> str:
    """ONE chained DuckDB replica of the whole hybrid stack: the BM25
    oracle and the cosine oracle as CTEs, identical shortlists and
    tie-breaks, the same integer ``1e9 // (k0 + rank)`` fusion."""
    from pg_parquet_spark.operators import similarity, text

    bm25 = text.bm25_oracle_sql(query_terms, id_col=doc_id_col)
    cosine = similarity.cosine_topk_oracle_sql(
        query_id=query_id, k=shortlist, id_col=vec_id_col
    )
    return f"""
WITH lex_scores AS ({bm25}),
lex AS (
  SELECT {doc_id_col} AS id,
         row_number() OVER (ORDER BY score_micro DESC, {doc_id_col})
           AS rank
  FROM (SELECT * FROM lex_scores
        ORDER BY score_micro DESC, {doc_id_col} LIMIT {shortlist})
),
dense_scores AS ({cosine}),
dense AS (
  SELECT {vec_id_col} AS id,
         row_number() OVER (ORDER BY cosine_sim DESC, {vec_id_col})
           AS rank
  FROM dense_scores
),
u AS (SELECT * FROM lex UNION ALL SELECT * FROM dense),
fused AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_lists,
         CAST(SUM(CAST({10**9} // ({k0} + rank) AS BIGINT)) AS BIGINT)
           AS rrf_nano
  FROM u GROUP BY id
)
SELECT id AS {doc_id_col}, n_lists, rrf_nano FROM fused
ORDER BY rrf_nano DESC, {doc_id_col} LIMIT {top_k}
"""


def chunked_search(
    docs: DataFrame,
    query_terms: list[str],
    chunk_tokens: int = 32,
    overlap: int = 8,
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chunk-granular lexical retrieval with doc-level max-pooling
    (r13 — the RAG evidence-locating composition: rank fixed-size
    token windows, return each document at the score of its BEST
    window, so a long document with one dense passage beats a long
    document with diffuse mentions). Composes
    :func:`text.chunk_documents` → :func:`text.bm25_scores` over the
    chunk table (its own N/avgdl — chunk-corpus statistics) → per-doc
    argmax. Returns (id, best_chunk_id, n_chunks_matched,
    score_micro) best-first, ties toward the lower id.

    Chunk identity packs ``doc_id·2²⁰ + chunk_id`` into one long (the
    duplicated_spans budget: integral ids < 2⁴³, < 2²⁰ chunks per doc
    — both enforced in-pass), so the BM25 stage needs no composite
    key.

    Scale shape: chunking is a per-row codegen explode (no shuffle);
    BM25's shuffles are (chunk, term)-keyed counts; the max-pool is
    one doc-keyed aggregate over MATCHED chunks only; the final
    top-k is TakeOrderedAndProject. Text shuffles once (the chunk
    explode feeding the BM25 count) — the price every lexical scorer
    pays."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    from pg_parquet_spark.operators import text as text_ops

    if not isinstance(
        docs.schema[id_col].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    ):
        raise TypeError(
            f"chunked_search: {id_col} must be an integral column (got "
            f"{docs.schema[id_col].dataType.simpleString()}) — the chunk "
            "key packs id*2^20 + chunk_id into one long"
        )
    chunks = text_ops.chunk_documents(
        docs, id_col, text_col, chunk_tokens, overlap
    )
    lid = F.col(id_col).cast("long")  # widen BEFORE the multiply — an
    # IntegerType id >= 2048 would overflow int32 under the int literal
    packed = F.when(
        (lid >= 0)
        & (lid < F.lit(1 << 43))
        & (F.col("chunk_id") < F.lit(1 << 20)),
        lid * F.lit(1 << 20) + F.col("chunk_id"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "chunked_search: id/chunk outside the packed-key "
                "budget (id < 2^43, chunks < 2^20)"
            )
        )
    )
    scored = text_ops.bm25_scores(
        chunks.select(packed.alias("_ck"), "chunk_text"),
        query_terms,
        id_col="_ck",
        text_col="chunk_text",
    )
    parts = scored.select(
        F.expr(f"_ck div {1 << 20}").cast("long").alias(id_col),
        (F.col("_ck") % F.lit(1 << 20)).cast("long").alias("chunk_id"),
        "score_micro",
    )
    return (
        parts.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks_matched"),
            F.max("score_micro").alias("score_micro"),
            F.min(
                F.struct(
                    (-F.col("score_micro")).alias("ns"),
                    F.col("chunk_id").alias("c"),
                )
            ).alias("_b"),
        )
        .select(
            id_col,
            F.col("_b.c").alias("best_chunk_id"),
            "n_chunks_matched",
            "score_micro",
        )
        .orderBy(F.col("score_micro").desc(), F.col(id_col))
        .limit(top_k)
    )


def chunked_search_oracle_sql(
    query_terms: list[str],
    chunk_tokens: int = 32,
    overlap: int = 8,
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB replica: identical chunk windows (integer ceil, clamped
    tail slice), the packed chunk key, the bm25_scores expression over
    the chunk table, and the per-doc argmax."""
    from pg_parquet_spark.operators import text as text_ops

    step = chunk_tokens - overlap
    bm25 = text_ops.bm25_oracle_sql(
        query_terms, table="chunks", id_col="_ck", text_col="chunk_text"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS _id, string_split(lower({text_col}), ' ') AS toks
  FROM {table}
), spans AS (
  SELECT _id, toks,
         unnest(range(0, GREATEST(
           (len(toks) - {overlap} + {step - 1}) // {step}, 1))) AS i
  FROM base
), chunks AS (
  SELECT CAST(_id * {1 << 20} + i AS BIGINT) AS _ck,
         array_to_string(
           toks[CAST(i * {step} + 1 AS BIGINT)
                : CAST(i * {step} + {chunk_tokens} AS BIGINT)], ' ')
           AS chunk_text
  FROM spans
), scored AS (
  {bm25}
), parts AS (
  SELECT CAST(_ck // {1 << 20} AS BIGINT) AS _id,
         CAST(_ck % {1 << 20} AS BIGINT) AS chunk_id,
         score_micro
  FROM scored
), pooled AS (
  SELECT _id, chunk_id, score_micro,
         CAST(COUNT(*) OVER (PARTITION BY _id) AS BIGINT)
           AS n_chunks_matched,
         ROW_NUMBER() OVER (PARTITION BY _id
           ORDER BY score_micro DESC, chunk_id) AS rn
  FROM parts
)
SELECT _id AS {id_col},
       CAST(chunk_id AS BIGINT) AS best_chunk_id,
       n_chunks_matched, score_micro
FROM pooled WHERE rn = 1
ORDER BY score_micro DESC, {id_col} LIMIT {top_k}
"""


def corpus_health(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_delim: str = "\n",
    vocab_size: int = 20,
) -> DataFrame:
    """One-call corpus-health dashboard (r13 — the diagnostics the
    r12/r13 health family produces, folded into a single (metric,
    value) report a datacard or a drift monitor can diff round over
    round): size, vocabulary shape (Zipf slope + late-discovery
    share), encoding damage, OOV pressure, and boilerplate share.
    Every value is an exact integer (micro/ppm units), every
    component is the already-certified operator — this recipe is the
    COMPOSITION, certified by one chained oracle.

    Rows (ordered by metric): boilerplate_ppm, distinct_terms,
    late_vocab_ppm, mojibake_ppm, n_docs, oov_ppm, total_tokens,
    zipf_slope_micro.

    Scale shape: each component's own shape (see their docstrings);
    the fold is eight scalar aggregates collected driver-side (1-row
    frames, the bounded exemption) into an 8-row literal frame. The
    independent component jobs run OVERLAPPED from a small driver
    thread pool (r14, guide §2.6: Spark schedules concurrent jobs
    FIFO so each job's tail back-fills the next one's tasks — the
    dashboard wall drops from the SUM of ~10 sequential small jobs
    toward the max); every component computes exactly what it did
    sequentially, and the report assembly is deterministic."""
    from concurrent.futures import ThreadPoolExecutor

    from pg_parquet_spark.operators import dedup, text as text_ops

    spark = docs.sparkSession

    def _counts():
        r = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(text_ops.tokens(F.col(text_col)))).alias("t"),
        ).collect()[0]
        return int(r["n"]), int(r["t"] or 0)

    def _distinct():
        return int(
            docs.select(
                F.explode(text_ops.tokens(F.col(text_col))).alias("x")
            )
            .agg(F.countDistinct("x"))
            .collect()[0][0]
        )

    def _zipf():
        return int(
            text_ops.vocab_zipf(docs, text_col).collect()[0]["slope_micro"]
        )

    def _late():
        growth = text_ops.vocab_growth(docs, id_col, text_col, 10).collect()
        last = int(growth[-1]["cum_terms"])
        mid = int(growth[len(growth) // 2]["cum_terms"])
        return 0 if last == 0 else (last - mid) * 1_000_000 // last

    def _moj():
        enc = (
            text_ops.encoding_quality(docs, id_col, text_col)
            .agg(
                F.sum("mojibake_hits").alias("h"),
                F.sum("n_chars").alias("c"),
            )
            .collect()[0]
        )
        if int(enc["c"] or 0) == 0:
            return 0
        return int(enc["h"]) * 1_000_000 // int(enc["c"])

    def _oov():
        oov = (
            text_ops.oov_rate(docs, vocab_size, id_col, text_col)
            .agg(
                F.sum("oov_tokens").alias("o"),
                F.sum("n_tokens").alias("n"),
            )
            .collect()[0]
        )
        if int(oov["n"] or 0) == 0:
            return 0
        return int(oov["o"]) * 1_000_000 // int(oov["n"])

    def _boiler():
        # boilerplate share from the hash-keyed verdict join alone —
        # the per-doc text rebuild strip_boilerplate_lines pays is pure
        # waste when only the two counts are kept (code-review finding)
        lines, base = dedup._line_frames(docs, id_col, text_col, line_delim)
        boiler = (
            lines.groupBy("_h")
            .agg(
                F.countDistinct("_id").alias("_nd"),
                F.min("_id").alias("_keeper"),
            )
            .filter(F.col("_nd") >= 2)
            .select("_h", "_keeper")
        )
        n_dropped = (
            lines.join(boiler, "_h")
            .filter(F.col("_id") != F.col("_keeper"))
            .count()
        )
        n_total = int(
            base.agg(F.sum("n_lines").alias("n")).collect()[0]["n"] or 0
        )
        return 0 if n_total == 0 else n_dropped * 1_000_000 // n_total

    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = {
            name: pool.submit(fn)
            for name, fn in [
                ("counts", _counts),
                ("distinct", _distinct),
                ("zipf", _zipf),
                ("late", _late),
                ("moj", _moj),
                ("oov", _oov),
                ("boiler", _boiler),
            ]
        }
        n_docs, total_tokens = futs["counts"].result()
        distinct_terms = futs["distinct"].result()
        zipf_micro = futs["zipf"].result()
        late_ppm = futs["late"].result()
        moj_ppm = futs["moj"].result()
        oov_ppm = futs["oov"].result()
        boiler_ppm = futs["boiler"].result()
    rows = sorted(
        [
            ("boilerplate_ppm", boiler_ppm),
            ("distinct_terms", int(distinct_terms)),
            ("late_vocab_ppm", late_ppm),
            ("mojibake_ppm", moj_ppm),
            ("n_docs", int(n_docs)),
            ("oov_ppm", oov_ppm),
            ("total_tokens", total_tokens),
            ("zipf_slope_micro", zipf_micro),
        ]
    )
    return spark.createDataFrame(rows, "metric string, value long")


def corpus_health_oracle_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    line_delim: str = "\n",
    vocab_size: int = 20,
    table: str = "documents",
) -> str:
    """DuckDB replica: each component's certified oracle embedded as a
    subquery, folded to the same (metric, value) rows."""
    from pg_parquet_spark.operators import dedup, text as text_ops

    zipf = text_ops.vocab_zipf_oracle_sql(table=table, text_col=text_col)
    growth = text_ops.vocab_growth_oracle_sql(
        10, table=table, id_col=id_col, text_col=text_col
    )
    enc = text_ops.encoding_quality_oracle_sql(
        table=table, id_col=id_col, text_col=text_col
    )
    oov = text_ops.oov_rate_oracle_sql(
        vocab_size, id_col=id_col, text_col=text_col, table=table
    )
    lines = dedup.strip_boilerplate_oracle_sql(
        id_col=id_col,
        text_col=text_col,
        delim=line_delim,
        table=table,
    )
    return f"""
SELECT metric, value FROM (
  SELECT 'n_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS value
  FROM {table}
  UNION ALL
  SELECT 'total_tokens',
         CAST(SUM(len(string_split(lower({text_col}), ' '))) AS BIGINT)
  FROM {table}
  UNION ALL
  SELECT 'distinct_terms', CAST(COUNT(DISTINCT x) AS BIGINT)
  FROM (SELECT unnest(string_split(lower({text_col}), ' ')) AS x
        FROM {table})
  UNION ALL
  SELECT 'zipf_slope_micro', CAST(slope_micro AS BIGINT)
  FROM ({zipf})
  UNION ALL
  SELECT 'late_vocab_ppm',
         CAST(CASE WHEN MAX(cum_terms) = 0 THEN 0
              ELSE (MAX(cum_terms)
                    - MAX(CASE WHEN is_mid THEN cum_terms END))
                   * 1000000 // MAX(cum_terms) END AS BIGINT)
  FROM (SELECT cum_terms,
               ROW_NUMBER() OVER (ORDER BY bucket) - 1
                 = (COUNT(*) OVER ()) // 2 AS is_mid
        FROM ({growth}))
  UNION ALL
  SELECT 'mojibake_ppm',
         CAST(CASE WHEN SUM(n_chars) = 0 THEN 0
              ELSE SUM(mojibake_hits) * 1000000 // SUM(n_chars) END
              AS BIGINT)
  FROM ({enc})
  UNION ALL
  SELECT 'oov_ppm',
         CAST(CASE WHEN SUM(n_tokens) = 0 THEN 0
              ELSE SUM(oov_tokens) * 1000000 // SUM(n_tokens) END
              AS BIGINT)
  FROM ({oov})
  UNION ALL
  SELECT 'boilerplate_ppm',
         CAST(CASE WHEN SUM(n_lines) = 0 THEN 0
              ELSE SUM(n_lines_dropped) * 1000000 // SUM(n_lines) END
              AS BIGINT)
  FROM ({lines})
) ORDER BY metric
"""


def rerank_pipeline(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_df: DataFrame,
    k: int = 10,
    k0: int = 60,
    shortlist: int = 50,
    candidates: int = 20,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
) -> DataFrame:
    """The canonical two-tier RAG retrieval pipeline as ONE Spark plan
    (r14 — the composed-recipe pattern on the whole retrieval stack):
    tier 1 = :func:`hybrid_search` (BM25 ⊕ exact cosine fused by
    integer RRF) produces the ``candidates``-deep fused candidate
    list; tier 2 = ``similarity.crossencoder_rerank`` re-scores
    exactly that list with the joint (query, doc) interaction scorer
    and cuts to ``k``. Returns (doc_id, rrf_nano, ce_rank,
    ce_score_micro) best-first — each row carries BOTH tiers' verdicts
    so a calibration layer can compare them.

    The pipeline property the composition certifies (and the planted
    test pins): tier 2 sees ONLY tier 1's list — a perfectly matching
    document that tier 1 missed can never surface, and a fused
    candidate with poor query-token positions is demoted regardless of
    its retrieval rank. That boundary is what makes the stack scale:
    the expensive joint scorer touches ``candidates`` rows per query,
    never the corpus.

    Scale shape (100 TB): tier 1 is hybrid_search's shape (both
    rankers end in bounded top-``shortlist``, fusion over ≤2·shortlist
    rows) and executes ONCE, eagerly — its ≤``candidates``-row result
    becomes a driver-side literal (the bounded model-literal pattern),
    so the hybrid subplan can never re-evaluate under tier 2's two
    references; tier 2 broadcasts that literal run into ONE corpus
    scan (the crossencoder plan). The corpus text is read exactly
    twice end-to-end (once per tier), the vectors once, and nothing
    data-sized ever shuffles."""
    from pg_parquet_spark.operators import similarity

    spark = docs.sparkSession
    # tier 1 executes ONCE here and its ≤candidates-row result becomes
    # a driver-side literal (the bounded model-literal pattern) —
    # referencing the lazy fused frame from both tier-2 branches would
    # re-evaluate the whole hybrid subplan (BM25 scan + cosine top-k)
    fused_rows = hybrid_search(
        docs,
        emb,
        query_terms,
        query_df,
        doc_id_col=doc_id_col,
        vec_id_col=vec_id_col,
        k0=k0,
        shortlist=shortlist,
        top_k=candidates,
    ).collect()
    queries = spark.createDataFrame(
        [(0, " ".join(query_terms))], "query_id long, query_text string"
    )
    run = spark.createDataFrame(
        [(0, int(r[doc_id_col])) for r in fused_rows],
        f"query_id long, {doc_id_col} long",
    )
    reranked = similarity.crossencoder_rerank(
        run,
        docs,
        queries,
        k=k,
        id_col=doc_id_col,
        text_col=text_col,
    )
    rrf = spark.createDataFrame(
        [(int(r[doc_id_col]), int(r["rrf_nano"])) for r in fused_rows],
        f"{doc_id_col} long, rrf_nano long",
    )
    return (
        reranked.join(F.broadcast(rrf), doc_id_col)
        .select(doc_id_col, "rrf_nano", "ce_rank", "ce_score_micro")
        .orderBy("ce_rank")
    )


def rerank_pipeline_oracle_sql(
    query_terms: list[str],
    query_id: int = 0,
    k: int = 10,
    k0: int = 60,
    shortlist: int = 50,
    candidates: int = 20,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> str:
    """ONE chained DuckDB replica of the whole two-tier stack: the
    certified hybrid-search SQL feeds the certified cross-encoder SQL
    as its run, and the final join carries both tiers' scores — the
    corpus-health composition convention applied to retrieval."""
    from pg_parquet_spark.operators import similarity

    hybrid = hybrid_search_oracle_sql(
        query_terms,
        query_id=query_id,
        k0=k0,
        shortlist=shortlist,
        top_k=candidates,
        doc_id_col=doc_id_col,
        vec_id_col=vec_id_col,
    )
    qtext = " ".join(query_terms).replace("'", "''")
    ce = similarity.crossencoder_oracle_sql(
        f"SELECT 0 AS query_id, {doc_id_col} AS {doc_id_col} "
        f"FROM ({hybrid})",
        f"SELECT 0 AS query_id, '{qtext}' AS query_text",
        k=k,
        id_col=doc_id_col,
    )
    return f"""
SELECT c.{doc_id_col}, h.rrf_nano, c.ce_rank, c.ce_score_micro
FROM ({ce}) c
JOIN ({hybrid}) h ON h.{doc_id_col} = c.{doc_id_col}
ORDER BY c.ce_rank
"""


def dedup_funnel(
    docs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Dedup SURVIVORSHIP funnel (r14 — the composed-recipe pattern on
    the dedup tiers): how much corpus survives each deduplication
    posture, as one 4-row report a curation review reads top-down —

    - ``raw``            — document count as ingested
    - ``exact``          — distinct content fingerprints
      (``dedup.dedup_exact``: one survivor per md5 of lowered text)
    - ``near_canonical`` — keep-one-per-near-dup-cluster survivors
      (``dedup.canonical_per_cluster`` over the MinHash clusters)
    - ``soft_effective`` — the EFFECTIVE document mass under soft
      dedup (``dedup.soft_dedup_weights``: Σ weight_ppm div 10⁶ — each
      cluster carries one document's worth of gradient mass, so this
      row ≈ near_canonical minus integer-floor deficit; reading the
      two together shows drop-vs-reweight would train on the same
      effective mass)

    The text column is ``text`` — the near tier's MinHash machinery is
    column-fixed (the near_dup_clusters contract), so this recipe does
    not pretend otherwise.

    Returns (stage_idx, stage, docs, attrition_ppm) ordered, where
    attrition_ppm is the change vs the PREVIOUS stage. attrition can
    go NEGATIVE: an exact-duplicate class larger than the LSH band cap
    (``dedup.MAX_DOCS_PER_BAND``) has its hot buckets dropped and
    never co-clusters, so the near tier can keep MORE than the exact
    tier — exactly the situation ``dedup.lsh_hot_bucket_audit`` is for
    (a negative row says: run the audit, raise the cap). Negative
    division is quantized by TRUNCATION toward zero in BOTH engines
    (Python ``//`` floors, DuckDB ``//`` truncates — sign × floored
    magnitude keeps them identical). The composition is certified by
    ONE chained oracle embedding each tier's certified SQL (the
    corpus_health convention); the empty-corpus raise below is a
    Spark-side contract the oracle does not model (the
    ivf_index_staleness precedent).

    Scale shape (100 TB): the MinHash clustering — the only expensive
    tier — is derived ONCE and shared by the near and soft stages
    (clusters persist for the four bounded count folds, then release);
    every stage folds to one driver-side integer (counts only — no
    text, no rows leave the executors), and the report itself is a
    4-row literal."""
    from pg_parquet_spark.operators import dedup

    spark = docs.sparkSession
    d = docs.select(F.col(id_col), F.col("text"))
    clusters = dedup.near_dup_clusters(d, id_col).persist()
    try:
        n_raw = d.count()
        if n_raw == 0:
            raise ValueError("dedup_funnel on an empty corpus")
        n_exact = dedup.dedup_exact(d, id_col, "text").count()
        n_near = (
            dedup.canonical_per_cluster(
                docs, id_col, quality_col=quality_col, clusters=clusters
            )
            .filter("keep")
            .count()
        )
        mass = (
            dedup.soft_dedup_weights(d, id_col, "text", clusters=clusters)
            .agg(F.sum("weight_ppm"))
            .first()[0]
        )
    finally:
        clusters.unpersist()
    stages = [
        ("raw", int(n_raw)),
        ("exact", int(n_exact)),
        ("near_canonical", int(n_near)),
        ("soft_effective", int(mass) // 1_000_000),
    ]

    def trunc_div_ppm(delta: int, denom: int) -> int:
        # truncation toward zero = DuckDB's BIGINT // on negatives
        q = abs(delta) * 1_000_000 // denom
        return q if delta >= 0 else -q

    rows, prev = [], None
    for i, (name, n) in enumerate(stages):
        att = 0 if prev is None else trunc_div_ppm(prev - n, prev)
        rows.append((i, name, n, att))
        prev = n
    return spark.createDataFrame(
        rows, "stage_idx long, stage string, docs long, attrition_ppm long"
    )


def dedup_funnel_oracle_sql(quality_col: str = "n_chars") -> str:
    """ONE chained DuckDB replica: the exact tier as the fingerprint
    GROUP-count (a NULL text is a real group, matching Spark's
    groupBy — COUNT(DISTINCT ...) would skip it), the near tier as
    the certified canonical_per_cluster SQL, the soft tier as the
    certified soft_dedup SQL, folded through the same LAG attrition
    (DuckDB ``//`` truncates toward zero on negatives — the Spark side
    quantizes identically). Table and text column are fixed to
    ``documents.text`` because the embedded cluster machinery is
    (see dedup_funnel's contract note)."""
    from pg_parquet_spark.operators import dedup

    canonical = dedup.canonical_per_cluster_oracle_sql(
        quality_col=quality_col
    )
    soft = dedup.soft_dedup_oracle_sql()
    return f"""
WITH s0 AS (
  SELECT 0 AS stage_idx, 'raw' AS stage,
         CAST(COUNT(*) AS BIGINT) AS docs FROM documents
), s1 AS (
  SELECT 1, 'exact', CAST(COUNT(*) AS BIGINT)
  FROM (SELECT 1 FROM documents GROUP BY md5(lower(text)))
), s2 AS (
  SELECT 2, 'near_canonical', CAST(COUNT(*) AS BIGINT)
  FROM ({canonical}) WHERE keep
), s3 AS (
  SELECT 3, 'soft_effective',
         CAST(CAST(SUM(weight_ppm) AS BIGINT) // 1000000 AS BIGINT)
  FROM ({soft})
), u AS (
  SELECT * FROM s0 UNION ALL SELECT * FROM s1
  UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
), l AS (
  SELECT stage_idx, stage, docs,
         LAG(docs) OVER (ORDER BY stage_idx) AS prev
  FROM u
)
SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage, docs,
       CAST(COALESCE((prev - docs) * 1000000 // prev, 0) AS BIGINT)
         AS attrition_ppm
FROM l ORDER BY stage_idx
"""


def product_health(
    events: DataFrame,
    steps: list[str] | None = None,
    window_days: int = 7,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """One-call product-health dashboard (r14 — the product-analytics
    twin of :func:`corpus_health`): volume, audience, rolling
    engagement, cohort stickiness, funnel efficiency and channel
    concentration folded into a single (metric, value) report. Every
    value is an exact integer (counts / ppm / sec×2), every component
    is the already-certified operator — the recipe is the COMPOSITION,
    certified by one chained oracle that embeds each component's SQL.

    Rows (ordered by metric):
    - funnel_conversion_ppm — last-step conversion (funnel_steps)
    - median_total_latency_sec2 — entry→last-step median seconds ×2
      (funnel_latency; 0 when nobody converts)
    - n_events / n_users — rows and distinct users with non-NULL
      (user, ts) — the same basis every component filters to
    - retention_age1_ppm — Σ age-1 users ·1e6 // Σ age-0 users across
      ALL cohorts (the youngest cohort can't have an age-1 row yet —
      the ratio is the honest blended number, mirrored in the oracle)
    - top_channel_share_ppm — MAX last-touch share (attribution_report)
    - wau_last / wau_peak — trailing-window active users on the final
      spine day, and the all-time peak (active_users)

    Scale shape: each component's own shape (see their docstrings);
    the fold is six bounded driver-side collects (1-row or
    counts-sized frames — the bounded exemption) into an 8-row
    literal frame."""
    from pg_parquet_spark.operators import timeseries

    fsteps = steps if steps is not None else ["view", "click", "purchase"]
    spark = events.sparkSession
    base = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    vol = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(user_col).alias("u"),
    ).collect()[0]
    au = timeseries.active_users(
        events, window_days=window_days, user_col=user_col, ts_col=ts_col
    ).collect()
    wau_last = int(au[-1]["active_users"]) if au else 0
    wau_peak = max((int(r["active_users"]) for r in au), default=0)
    ret = timeseries.retention_cohorts(
        events, user_col=user_col, ts_col=ts_col
    ).collect()
    a0 = sum(int(r["users"]) for r in ret if r["age"] == 0)
    a1 = sum(int(r["users"]) for r in ret if r["age"] == 1)
    ret1_ppm = 0 if a0 == 0 else a1 * 1_000_000 // a0
    fun = timeseries.funnel_steps(
        events, fsteps, user_col=user_col, type_col=type_col, ts_col=ts_col
    ).collect()
    conv_ppm = int(fun[-1]["conversion_ppm"])
    lat = timeseries.funnel_latency(
        events, fsteps, user_col=user_col, type_col=type_col, ts_col=ts_col
    ).collect()
    med_total = lat[-1]["med_total_sec2"]
    med_total = 0 if med_total is None else int(med_total)
    timeseries.release_cached()
    att = timeseries.attribution_report(
        events,
        conversion_type=fsteps[-1],
        touch_types=fsteps[:-1],
        user_col=user_col,
        type_col=type_col,
        ts_col=ts_col,
        id_col=id_col,
    ).collect()
    top_share = max((int(r["share_ppm"]) for r in att), default=0)
    rows = sorted(
        [
            ("funnel_conversion_ppm", conv_ppm),
            ("median_total_latency_sec2", med_total),
            ("n_events", int(vol["n"])),
            ("n_users", int(vol["u"])),
            ("retention_age1_ppm", ret1_ppm),
            ("top_channel_share_ppm", top_share),
            ("wau_last", wau_last),
            ("wau_peak", wau_peak),
        ]
    )
    return spark.createDataFrame(rows, "metric string, value long")


def product_health_oracle_sql(
    steps: list[str] | None = None,
    window_days: int = 7,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    table: str = "events",
) -> str:
    """DuckDB replica: each component's certified oracle embedded as a
    subquery, folded to the same (metric, value) rows."""
    from pg_parquet_spark.operators import timeseries

    fsteps = steps if steps is not None else ["view", "click", "purchase"]
    last = len(fsteps)
    au = timeseries.active_users_oracle_sql(
        window_days=window_days, user_col=user_col, ts_col=ts_col, table=table
    )
    ret = timeseries.retention_oracle_sql(
        user_col=user_col, ts_col=ts_col, table=table
    )
    fun = timeseries.funnel_oracle_sql(
        fsteps, user_col=user_col, type_col=type_col, ts_col=ts_col,
        table=table,
    )
    lat = timeseries.funnel_latency_oracle_sql(
        fsteps, user_col=user_col, type_col=type_col, ts_col=ts_col,
        table=table,
    )
    att = timeseries.attribution_oracle_sql(
        conversion_type=fsteps[-1],
        touch_types=fsteps[:-1],
        user_col=user_col,
        type_col=type_col,
        ts_col=ts_col,
        id_col=id_col,
        table=table,
    )
    return f"""
SELECT metric, value FROM (
  SELECT 'n_events' AS metric, CAST(COUNT(*) AS BIGINT) AS value
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
  UNION ALL
  SELECT 'n_users', CAST(COUNT(DISTINCT {user_col}) AS BIGINT)
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
  UNION ALL
  SELECT 'wau_last',
         COALESCE((SELECT active_users FROM ({au})
                   ORDER BY day DESC LIMIT 1), 0)
  UNION ALL
  SELECT 'wau_peak',
         (SELECT CAST(COALESCE(MAX(active_users), 0) AS BIGINT) FROM ({au}))
  UNION ALL
  SELECT 'retention_age1_ppm',
         (SELECT CAST(CASE WHEN SUM(CASE WHEN age = 0 THEN users END) IS NULL
                           THEN 0
                      ELSE COALESCE(SUM(CASE WHEN age = 1 THEN users END), 0)
                           * 1000000
                           // SUM(CASE WHEN age = 0 THEN users END)
                      END AS BIGINT)
          FROM ({ret}))
  UNION ALL
  SELECT 'funnel_conversion_ppm',
         (SELECT conversion_ppm FROM ({fun}) WHERE step = {last})
  UNION ALL
  SELECT 'median_total_latency_sec2',
         (SELECT CAST(COALESCE(med_total_sec2, 0) AS BIGINT) FROM ({lat})
          WHERE step = {last})
  UNION ALL
  SELECT 'top_channel_share_ppm',
         (SELECT CAST(COALESCE(MAX(share_ppm), 0) AS BIGINT) FROM ({att}))
) ORDER BY metric
"""
