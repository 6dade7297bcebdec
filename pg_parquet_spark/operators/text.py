"""Text-analysis operators for LLM-data pipelines (beyond-reference
surface, SURVEY.md §7 Phase 4).

All operators are pure built-in column expressions (JVM-side,
whole-stage-codegen) — no Python UDFs in the hot path — so they scale
linearly with executors and never shuffle on their own.

Cross-engine determinism: tokenization is a plain single-space split and
hashes are md5 (identical in Spark and DuckDB), so every operator here is
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: tiny per-language stopword lists for the n-gram/stopword heuristic
#: language id (public-knowledge technique: stopword hit-rate scoring)
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "es": ["el", "la", "de", "los", "y", "es", "en"],
    "fr": ["le", "la", "les", "et", "est", "un", "en"],
}


#: Doc-level bigram-scored frames persisted by the perplexity
#: compositions (perplexity_datamap here, recipe.curriculum_from_
#: perplexity). The scored table is tiny (id + 3 longs per doc) but
#: its producing pipeline — tokenize, bigram explode, three gram-keyed
#: aggregates, scoring join — is the most expensive text stage, and
#: each composition references the frame 2–4× in one plan; without a
#: persist Spark re-plans (and re-runs) the whole pipeline per
#: reference (r14, guide §1.2 "don't compute things twice").
#: Self-cleaning (the dedup.py convention): each composition releases
#: the previous call's frames at entry, so at most one composition's
#: cache is ever resident.
_CACHED_FRAMES: list[DataFrame] = []


def release_cached() -> None:
    """Unpersist frames cached by the perplexity compositions."""
    while _CACHED_FRAMES:
        df = _CACHED_FRAMES.pop()
        try:
            df.unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass


def tokens(col: Column) -> Column:
    """Whitespace tokens, lowercased. Single-space split keeps the
    expression identical across engines."""
    return F.split(F.lower(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def char_count(col: Column) -> Column:
    return F.length(col).cast("bigint")


def avg_token_len(col: Column, toks: Column | None = None) -> Column:
    """Mean token length in characters (double division — deterministic
    IEEE op, identical cross-engine)."""
    n = F.size(tokens(col) if toks is None else toks).cast("double")
    total = (F.length(col).cast("double") - (n - F.lit(1.0)))
    return total / n


def stopword_hits(
    col: Column, words: list[str], toks: Column | None = None
) -> Column:
    """``toks`` (r14): pass an already-projected tokens column so a
    multi-feature projection tokenizes once (see with_text_features) —
    physical-plan subexpression elimination does NOT collapse the
    repeated split/filter trees (measured −30% on q_text_features)."""
    toks = tokens(col) if toks is None else toks
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("bigint")


def stopword_ratio(
    col: Column, words: list[str] | None = None, toks: Column | None = None
) -> Column:
    words = words or LANG_STOPWORDS["en"]
    toks = tokens(col) if toks is None else toks
    return stopword_hits(col, words, toks).cast("double") / F.size(toks).cast(
        "double"
    )


def quality_score(col: Column, toks: Column | None = None) -> Column:
    """Heuristic quality score in [0,1]: length saturation + stopword
    presence + token-length sanity. Deterministic double arithmetic."""
    toks = tokens(col) if toks is None else toks
    n_tok = F.size(toks).cast("double")
    len_component = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_component = F.least(
        stopword_ratio(col, toks=toks) * F.lit(5.0), F.lit(1.0)
    )
    atl = avg_token_len(col, toks=toks)
    shape_component = F.when((atl >= 3.0) & (atl <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return (
        len_component * F.lit(0.4)
        + stop_component * F.lit(0.3)
        + shape_component * F.lit(0.3)
    )


def lang_id(col: Column, toks: Column | None = None) -> Column:
    """Stopword-hit language id over LANG_STOPWORDS with a fixed
    tie-break order (en > de > es > fr)."""
    toks = tokens(col) if toks is None else toks
    cnt = {
        lang: stopword_hits(col, words, toks)
        for lang, words in LANG_STOPWORDS.items()
    }
    return (
        F.when(
            (cnt["en"] >= cnt["de"]) & (cnt["en"] >= cnt["es"]) & (cnt["en"] >= cnt["fr"]),
            F.lit("en"),
        )
        .when((cnt["de"] >= cnt["es"]) & (cnt["de"] >= cnt["fr"]), F.lit("de"))
        .when(cnt["es"] >= cnt["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the lowercased text. At 100 TB this
    is the key for exact dedup — a hash-groupBy that shuffles 16-byte
    keys instead of document bodies."""
    return F.md5(F.lower(col))


def normalized_fingerprint(col: Column) -> Column:
    """Order/duplicate-insensitive fingerprint: md5 over the sorted
    distinct token set (catches shuffled/near-identical docs)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the full feature set as columns (single projection — one
    pass over the data, no shuffle).

    r14 (guide §1.2 per-task work): the tokens array is projected ONCE
    and every feature reads the materialized column. The previous shape
    inlined ``split(lower(text))`` ~12× across the feature expressions;
    whole-stage-codegen subexpression elimination does not collapse the
    repeated split/filter subtrees (interleaved A/B on the
    q_text_features projection: 0.597 → 0.417 s min, −30%). Output
    columns, values and ordering are unchanged."""
    c = F.col(text_col)
    t = F.col("_toks_feat")
    staged = df.withColumn("_toks_feat", tokens(c))
    return staged.select(
        *[F.col(x) for x in df.columns],
        F.size(t).cast("bigint").alias("n_tokens"),
        char_count(c).alias("n_chars_computed"),
        avg_token_len(c, toks=t).alias("avg_token_len"),
        stopword_ratio(c, toks=t).alias("stopword_ratio"),
        quality_score(c, toks=t).alias("quality_score"),
        lang_id(c, toks=t).alias("pred_lang"),
        fingerprint(c).alias("fingerprint"),
    )


#: rolling-hash parameters: Mersenne prime keeps h*B + t inside int64
#: (h < 2^31, B = 131 → product < 2^39; token hashes reduced mod P)
ROLLING_PRIME = (1 << 31) - 1
ROLLING_BASE = 131


def rolling_fingerprint(toks: Column) -> Column:
    """Polynomial rolling-hash fingerprint over an ALREADY-PROJECTED
    tokens column (the brief's "document fingerprinting (rolling hash)"):
    h = fold(h*B + md5_61(tok) mod P). Unlike the md5-of-whole-text
    fingerprint this is incrementally updatable (streaming append: one
    multiply-add per new token) and ORDER-SENSITIVE, so shuffled token
    orders produce different fingerprints while `normalized_fingerprint`
    intentionally collapses them. Pure codegen fold; identical
    list_reduce rendering in DuckDB.

    ``toks`` must be a column reference, not an inline split() — HOF
    lambdas re-evaluate nested expressions per element.
    """
    hashed = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long")
        % F.lit(ROLLING_PRIME),
    )
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(ROLLING_BASE) + h) % F.lit(ROLLING_PRIME),
    )


def rolling_fingerprint_oracle_expr(text_expr: str) -> str:
    """DuckDB rendering of rolling_fingerprint over split-lowered text."""
    p, b = ROLLING_PRIME, ROLLING_BASE
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        f"string_split(lower({text_expr}), ' '), "
        f"t -> CAST(CONCAT('0x', substr(md5(t), 1, 7)) AS BIGINT) % {p})), "
        f"(acc, h) -> (acc * {b} + h) % {p})"
    )


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """Word n-grams over an already-projected tokens column, as
    space-joined strings. Pure JVM higher-order functions (transform +
    get) — no Python in the hot path; at 100 TB this is per-row codegen
    with zero shuffle."""
    idx = F.sequence(F.lit(0), F.size(toks) - F.lit(n))
    return F.when(
        F.size(toks) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.get(toks, i + F.lit(k)) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_ratio(toks: Column, n: int = 3) -> Column:
    """Repeated n-gram ratio (1 − distinct/total) — the standard
    boilerplate/spam signal in LLM corpus curation (high ratio = looping
    or templated text). 0.0 for documents shorter than n tokens."""
    g = word_ngrams(toks, n)
    total = F.size(g).cast("double")
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / total,
    ).otherwise(F.lit(0.0))


def char_run_starts(chars: Column, sorted_chars: Column) -> Column:
    """1-based positions in ``sorted_chars`` where a new character run
    begins — the run-length decomposition of the sorted char array.
    Both inputs must be staged column references (see
    shingles_from_tokens). Empty/NULL input yields an empty/NULL
    array; positions ascend, so the runs enumerate the DISTINCT chars
    in sorted order (exactly ``array_sort(array_distinct(chars))``)."""
    n = F.size(chars)
    return F.when(
        n > 0,
        F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == F.lit(1))
            | (
                F.element_at(sorted_chars, i)
                != F.element_at(sorted_chars, i - F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))


def char_entropy(chars: Column, run_starts: Column) -> Column:
    """Shannon entropy (bits/char) of the character distribution — a
    perplexity-proxy quality signal (near-zero = degenerate/repeated
    text, natural prose sits ~4-4.5 bits). ``run_starts`` is the staged
    :func:`char_run_starts` column over the staged sorted chars;
    adjacent-start differences ARE the per-distinct-char counts, in
    sorted-char order — so the float summation order is engine-
    identical to the old filter-per-distinct formulation while the
    per-row cost drops from O(|distinct|·n) array scans to one
    O(n log n) sort + one linear pass (r14 optimization, guide §1.2
    per-task work; measured 6.1 s → see OPTIMIZATION_r14.md). The
    formulation stays -(Σ p·ln p)/ln 2: JVM and DuckDB log2() disagree
    by 1-2 ULP on ~17% of arguments, ln() on ~3% — callers that need a
    cross-engine-stable hash should round the result (the gate query
    rounds to 6 decimals; a 1-ULP residue at entropy≈4 is ~1e-15)."""
    n = F.size(chars).cast("double")
    nxt = F.concat(
        F.slice(
            run_starts,
            F.lit(2),
            F.greatest(F.size(run_starts) - F.lit(1), F.lit(0)),
        ),
        F.array(F.size(chars) + F.lit(1)),
    )
    terms = F.zip_with(
        run_starts, nxt, lambda a, b: (b - a).cast("double") / n
    )
    raw = -F.aggregate(
        terms,
        F.lit(0.0),
        lambda acc, p: acc + p * F.log(p),
    ) / F.log(F.lit(2.0))
    # n > 0 guard + '+ 0.0' (-0.0 → +0.0 for a single-symbol alphabet):
    # an engine whose split('') yields [] would otherwise divide by zero
    # here while the other returns 0.0 — a latent cross-engine hash
    # divergence (ADVICE r5). Oracles must mirror the CASE and the + 0.0.
    return F.when(n > 0, raw + F.lit(0.0)).otherwise(F.lit(0.0))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window token chunking — the standard pre-training /
    RAG-ingestion step (fixed-size token windows with overlap so no
    span is lost at a boundary). Chunk count per doc is
    max(ceil((n - overlap) / step), 1) with step = chunk_tokens -
    overlap; the final window may be short.

    One staged tokens column + a single-level HOF (the slice lambda
    reads one staged reference; see shingles_from_tokens for why deeper
    nesting is forbidden), then explode — per-row codegen, no shuffle.
    Returns (id, chunk_id, n_tokens, chunk_text).
    """
    step = chunk_tokens - overlap
    n = F.size(F.col("_ctoks"))
    # integer ceil((n - overlap) / step), floored at 1
    n_chunks = F.greatest(
        F.floor(((n - F.lit(overlap)) + F.lit(step - 1)) / F.lit(step)),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.size(F.slice(F.col("_ctoks"), i * step + 1, chunk_tokens)).alias(
                "n_tokens"
            ),
            F.concat_ws(
                " ", F.slice(F.col("_ctoks"), i * step + 1, chunk_tokens)
            ).alias("chunk_text"),
        ),
    )
    return (
        df.withColumn("_ctoks", tokens(F.col(text_col)))
        .select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.n_tokens").alias("n_tokens"),
            F.col("_c.chunk_text").alias("chunk_text"),
        )
    )


#: PII scrub patterns — kept to syntax with identical semantics in Java
#: regex (Spark) and RE2 (DuckDB): character classes, bounded repeats,
#: ASCII \b. Order matters (emails contain dots; scrub them first).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
]


def scrub_pii(col: Column) -> Column:
    """Redact common PII shapes (emails, IPv4, SSN-style ids) — the
    standard pre-release curation pass. Chained JVM regexp_replace, no
    Python, no shuffle."""
    out = col
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii_oracle_expr(text_expr: str) -> str:
    """DuckDB rendering: same patterns, same order, global flag."""
    out = text_expr
    for pat, repl in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{repl}', 'g')"
    return out


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021 "Scaling Language
# Models: ... Gopher", Appendix A1.1 — the standard public rule set for
# pre-training corpus filtering). Thresholds follow the paper; the bullet
# and ellipsis rules are line-based, everything else token-based.

#: the paper's "must contain ≥2 of" stop list
GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

#: (min_words, max_words, min_mwl, max_mwl, max_symbol_ratio,
#:  max_bullet_frac, max_ellipsis_frac, min_alpha_frac, min_stop_hits)
GOPHER_THRESHOLDS = (50, 100_000, 3.0, 10.0, 0.1, 0.9, 0.3, 0.8, 2)


def with_gopher_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the Gopher quality signals + per-rule pass flags + overall
    ``keep``. Single projection of JVM higher-order functions over two
    staged arrays (tokens, lines) — per-row codegen, zero shuffle, so at
    100 TB this is a pure map stage that scales with executors.

    Signals: word count, mean word length, symbol-to-word ratio
    ('#'/'...'), fraction of bullet-point lines, fraction of
    ellipsis-ending lines, fraction of words with an alphabetic char,
    and required-stopword hits. All ratios are single IEEE divisions of
    integer-derived operands, so they hash identically in the DuckDB
    oracle without rounding.
    """
    (min_w, max_w, min_mwl, max_mwl, max_sym,
     max_bullet, max_ellipsis, min_alpha, min_stop) = GOPHER_THRESHOLDS
    toks, lines = F.col("_gq_toks"), F.col("_gq_lines")
    n_words = F.size(toks).cast("double")
    mean_wl = (
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).cast("double")
        / n_words
    )
    sym_ratio = (
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\."), 0)
        ).cast("double")
        / n_words
    )
    n_lines = F.size(lines).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike("^[-*•]"))).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$"))).cast("double")
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double")
        / n_words
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS]),
        )
    ).cast("bigint")
    flags = {
        "n_words": F.size(toks).cast("bigint"),
        "mean_word_len": mean_wl,
        "symbol_ratio": sym_ratio,
        "bullet_frac": bullet_frac,
        "ellipsis_frac": ellipsis_frac,
        "alpha_frac": alpha_frac,
        "stop_hits": stop_hits,
        "ok_word_count": (n_words >= min_w) & (n_words <= max_w),
        "ok_mean_word_len": (mean_wl >= min_mwl) & (mean_wl <= max_mwl),
        "ok_symbol_ratio": sym_ratio <= max_sym,
        "ok_bullets": bullet_frac <= max_bullet,
        "ok_ellipsis": ellipsis_frac <= max_ellipsis,
        "ok_alpha_words": alpha_frac >= min_alpha,
        "ok_stopwords": stop_hits >= min_stop,
    }
    keep = (
        flags["ok_word_count"]
        & flags["ok_mean_word_len"]
        & flags["ok_symbol_ratio"]
        & flags["ok_bullets"]
        & flags["ok_ellipsis"]
        & flags["ok_alpha_words"]
        & flags["ok_stopwords"]
    )
    staged = df.withColumn("_gq_toks", tokens(F.col(text_col))).withColumn(
        "_gq_lines", F.split(F.col(text_col), "\n")
    )
    return staged.select(
        *df.columns,
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


def gopher_oracle_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB replica of with_gopher_flags (identical staging, identical
    single-division ratios)."""
    (min_w, max_w, min_mwl, max_mwl, max_sym,
     max_bullet, max_ellipsis, min_alpha, min_stop) = GOPHER_THRESHOLDS
    stops = "','".join(GOPHER_REQUIRED_STOPWORDS)
    return f"""
WITH staged AS (
  SELECT {id_col},
    string_split(lower(text), ' ') AS toks,
    string_split(text, chr(10)) AS lines,
    text
  FROM {table}
), sig AS (
  SELECT {id_col},
    CAST(len(toks) AS BIGINT) AS n_words,
    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(toks, t -> CAST(length(t) AS BIGINT))),
         (a, x) -> a + x) AS DOUBLE)
      / CAST(len(toks) AS DOUBLE) AS mean_word_len,
    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
      / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
    CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE)
      / CAST(len(lines) AS DOUBLE) AS bullet_frac,
    CAST(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.$'))) AS DOUBLE)
      / CAST(len(lines) AS DOUBLE) AS ellipsis_frac,
    CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
      / CAST(len(toks) AS DOUBLE) AS alpha_frac,
    CAST(len(list_intersect(list_distinct(toks), ['{stops}'])) AS BIGINT)
      AS stop_hits
  FROM staged
)
SELECT {id_col}, n_words, mean_word_len, symbol_ratio, bullet_frac,
  ellipsis_frac, alpha_frac, stop_hits,
  (n_words >= {min_w} AND n_words <= {max_w}) AS ok_word_count,
  (mean_word_len >= {min_mwl} AND mean_word_len <= {max_mwl}) AS ok_mean_word_len,
  (symbol_ratio <= {max_sym}) AS ok_symbol_ratio,
  (bullet_frac <= {max_bullet}) AS ok_bullets,
  (ellipsis_frac <= {max_ellipsis}) AS ok_ellipsis,
  (alpha_frac >= {min_alpha}) AS ok_alpha_words,
  (stop_hits >= {min_stop}) AS ok_stopwords,
  ((n_words >= {min_w} AND n_words <= {max_w})
   AND (mean_word_len >= {min_mwl} AND mean_word_len <= {max_mwl})
   AND symbol_ratio <= {max_sym} AND bullet_frac <= {max_bullet}
   AND ellipsis_frac <= {max_ellipsis} AND alpha_frac >= {min_alpha}
   AND stop_hits >= {min_stop}) AS keep
FROM sig ORDER BY {id_col}
"""


# ---------------------------------------------------------------------------
# C4-style line-level cleaning (Raffel et al. 2020 §2.2 — the public
# rule set behind the C4 corpus). Complements the Gopher rules above:
# Gopher keeps/drops whole documents, C4 cleans WITHIN a document by
# line, then drops documents whose residue is too small or code/boilerplate.

#: (min_words_per_line, min_kept_lines)
C4_THRESHOLDS = (5, 3)


def c4_clean(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply the C4 line rules: keep only lines that end in terminal
    punctuation ('.', '!', '?', '"') and have ≥5 words; drop the whole
    document if it contains '{' (code), the phrase "lorem ipsum"
    (placeholder boilerplate), or fewer than 3 surviving lines.

    Appends ``n_lines``, ``n_kept_lines``, ``keep_doc`` and
    ``clean_text`` (surviving lines re-joined). One staged line array +
    one JVM-HOF filter per row — zero shuffle, scales as a pure map
    stage."""
    min_words, min_lines = C4_THRESHOLDS
    lines = F.col("_c4_lines")
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"]$')
        & (F.size(F.split(l, " ")) >= min_words),
    )
    has_brace = F.instr(F.col(text_col), "{") > 0
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    staged = df.withColumn("_c4_lines", F.split(F.col(text_col), "\n")).withColumn(
        "_c4_kept", kept
    )
    return staged.select(
        *df.columns,
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(F.col("_c4_kept")).cast("bigint").alias("n_kept_lines"),
        (
            ~has_brace
            & ~has_lorem
            & (F.size(F.col("_c4_kept")) >= min_lines)
        ).alias("keep_doc"),
        F.concat_ws("\n", F.col("_c4_kept")).alias("clean_text"),
    )


def c4_oracle_sql(text_expr: str, table: str = "documents",
                  id_col: str = "doc_id") -> str:
    """DuckDB replica of c4_clean over an arbitrary text expression."""
    min_words, min_lines = C4_THRESHOLDS
    return f"""
WITH staged AS (
  SELECT {id_col}, {text_expr} AS t FROM {table}
), l AS (
  SELECT {id_col}, t, string_split(t, chr(10)) AS lines,
    list_filter(string_split(t, chr(10)),
      x -> regexp_matches(x, '[.!?"]$')
           AND len(string_split(x, ' ')) >= {min_words}) AS kept
  FROM staged
)
SELECT {id_col},
  CAST(len(lines) AS BIGINT) AS n_lines,
  CAST(len(kept) AS BIGINT) AS n_kept_lines,
  (strpos(t, '{{') = 0 AND lower(t) NOT LIKE '%lorem ipsum%'
   AND len(kept) >= {min_lines}) AS keep_doc,
  array_to_string(kept, chr(10)) AS clean_text
FROM l ORDER BY {id_col}
"""


# ---------------------------------------------------------------------------
# corpus-level keyword extraction (TF-IDF) — unlike the per-row operators
# above, this one aggregates across the corpus (document frequency), so it
# shuffles: once on (doc_id, term) for term counts, once on term for the
# document frequency. Both keys are words — document bodies never move.

def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF
    (tf = term count / doc length, idf = ln(N/df)) — the classic
    corpus-analytics / keyword-extraction pass.

    Determinism: the score is rounded to 6 decimals BEFORE ranking
    (ln() differs from other engines by 1-2 ULP on ~3% of arguments —
    see char_entropy), and rank ties break on the term string, so the
    selected top-k set is engine- and partition-invariant.

    Scale shape: the document-frequency table is vocabulary-sized
    (MBs even for web-scale corpora) and is BROADCAST back onto the
    term counts — the only all-corpus shuffles are word-keyed
    aggregations with map-side combine. ``n_docs`` (the N in idf) is
    passed or counted once (a scalar job, not a data collect)."""
    from pyspark.sql import Window

    ex = (
        df.withColumn("_tf_toks", tokens(F.col(text_col)))
        .select(
            F.col(id_col),
            F.size(F.col("_tf_toks")).alias("_n_toks"),
            F.explode(F.col("_tf_toks")).alias("term"),
        )
    )
    tfc = ex.groupBy(id_col, "term", "_n_toks").agg(
        F.count(F.lit(1)).alias("_c")
    )
    dfreq = tfc.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    scored = tfc.join(F.broadcast(dfreq), "term")
    if n_docs is None:
        # r15 (guide §5): N rides the plan as a broadcast 1-row frame
        # instead of a synchronous .count() at construction time; same
        # exact long → identical idf double.
        scored = scored.crossJoin(
            F.broadcast(df.agg(F.count(F.lit(1)).alias("_tfidf_n")))
        )
        nd = F.col("_tfidf_n").cast("double")
    else:
        nd = F.lit(float(n_docs))
    scored = scored.select(
        F.col(id_col),
        "term",
        F.round(
            (F.col("_c").cast("double") / F.col("_n_toks").cast("double"))
            * F.log(nd / F.col("_df").cast("double")),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "score")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Distributed BM25 (Robertson/Okapi) — the lexical-retrieval
    ranking TF-IDF approximates: per matching document,
    ``Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` with the
    standard ``idf = ln(1 + (N−df+0.5)/(df+0.5))``. Returns
    (id, n_matched_terms, score_micro) for documents containing at
    least one query term, best-first.

    Determinism (the unigram-LM contract): every per-(doc, term)
    contribution quantizes to integer micro-units BEFORE the per-doc
    fold — cross-row float addition never happens; N and Σdl are exact
    integers collected once, so the avgdl double is the same on any
    engine; ranking ties break on id.

    Scale shape: doc lengths come from the SAME single explode that
    produces the term counts; term counts are filtered to the query's
    terms immediately (the per-doc table is |q|-bounded); the
    document-frequency side is ≤|q| rows and broadcast. The corpus
    text is read once and never shuffles — the shuffles are
    (id, term)-keyed counts."""
    qset = sorted({t.lower() for t in query_terms})
    if not qset:
        raise ValueError("BM25 needs at least one query term")
    ex = df.withColumn("_toks", tokens(F.col(text_col))).select(
        F.col(id_col),
        F.size("_toks").alias("_dl"),
        F.explode("_toks").alias("term"),
    )
    tfc = (
        ex.filter(F.col("term").isin(qset))
        .groupBy(id_col, "term", "_dl")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfreq = tfc.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    # exact-integer corpus constants as a broadcast 1-row frame (r15,
    # guide §5 driver work: the r14 form ran TWO synchronous full-scan
    # jobs — a count and a tokenize+sum — on the driver's clock at
    # construction time, once per call; in-plan they fold into the one
    # real job. Same exact longs → ``avgdl`` is the identical double
    # (cast-long division ≡ Python float(sum_dl)/float(n_docs)).
    consts = df.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum(token_count(F.col(text_col))).alias("_sum_dl"),
    )
    n_docs_d = F.col("_n_docs").cast("double")
    avgdl = F.col("_sum_dl").cast("double") / n_docs_d
    idf = F.log(
        F.lit(1.0)
        + (n_docs_d - F.col("_df").cast("double") + F.lit(0.5))
        / (F.col("_df").cast("double") + F.lit(0.5))
    )
    tf = F.col("_tf").cast("double")
    dl = F.col("_dl").cast("double")
    contrib = idf * (
        tf
        * F.lit(k1 + 1.0)
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl))
    )
    return (
        tfc.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts))
        .select(
            F.col(id_col),
            F.floor(contrib * 1e6 + F.lit(0.5)).cast("long").alias("_cm"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matched_terms"),
            F.sum("_cm").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), F.col(id_col))
    )


def build_term_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, int, float]:
    """Materialize the BM25 term index — the train-once/search-many
    shape at 100 TB: one explode of the corpus into
    ``(id, term, tf, dl)`` plus the two corpus constants
    ``(n_docs, avgdl)``. Persist the frame with
    ``layout.write_zordered(index, uri, ["term"])`` (or hive-partition
    on a term hash) and every query's term filter becomes row-group
    skipping / partition pruning — the corpus text is never touched
    again at query time."""
    ex = df.withColumn("_toks", tokens(F.col(text_col))).select(
        F.col(id_col),
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("term"),
    )
    index = ex.groupBy(id_col, "term", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # one scalar job for both corpus constants (r15 — was two full
    # scans: a count and a tokenize+sum); the API still returns Python
    # scalars (they are persisted next to the index).
    n_docs, sum_dl = df.agg(
        F.count(F.lit(1)), F.sum(token_count(F.col(text_col)))
    ).first()
    return index, n_docs, float(sum_dl) / float(n_docs)


def bm25_scores_from_index(
    index: DataFrame,
    query_terms: list[str],
    n_docs: int,
    avgdl: float,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 over a materialized term index (``build_term_index``):
    identical math and quantization to ``bm25_scores`` — the two paths
    are asserted equal in tests — but the per-query cost is a
    term-filtered index scan (pushed predicate) instead of a corpus
    explode."""
    qset = sorted({t.lower() for t in query_terms})
    if not qset:
        raise ValueError("BM25 needs at least one query term")
    tfc = index.filter(F.col("term").isin(qset))
    dfreq = tfc.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("_df").cast("double") + F.lit(0.5))
        / (F.col("_df").cast("double") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    contrib = idf * (
        tf
        * F.lit(k1 + 1.0)
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl)))
    )
    return (
        tfc.join(F.broadcast(dfreq), "term")
        .select(
            F.col(id_col),
            F.floor(contrib * 1e6 + F.lit(0.5)).cast("long").alias("_cm"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matched_terms"),
            F.sum("_cm").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), F.col(id_col))
    )


def bm25_oracle_sql(
    query_terms: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB replica of bm25_scores: identical expression shape and
    parenthesization (same IEEE sequence), the same exact-integer
    N / Σdl → avgdl double, micro-quantization before the fold, id
    tie-break."""
    qset = sorted({t.lower() for t in query_terms})
    qlist = ", ".join("'" + t.replace("'", "''") + "'" for t in qset)
    return f"""
WITH t AS (
  SELECT {id_col}, string_split(lower({text_col}), ' ') AS toks FROM {table}
), consts AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
         CAST(SUM(len(toks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM t
), ex AS (
  SELECT {id_col}, len(toks) AS dl, unnest(toks) AS term FROM t
), tfc AS (
  SELECT {id_col}, term, dl, COUNT(*) AS tf FROM ex
  WHERE term IN ({qlist}) GROUP BY 1, 2, 3
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1
), contrib AS (
  SELECT tfc.{id_col},
    CAST(FLOOR(
      ln(1.0 + (nd - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
      * (CAST(tf AS DOUBLE) * {k1 + 1.0}
         / (CAST(tf AS DOUBLE)
            + {k1} * ({1.0 - b} + {b} * CAST(dl AS DOUBLE) / avgdl)))
      * 1e6 + 0.5) AS BIGINT) AS cm
  FROM tfc JOIN dfreq USING (term) CROSS JOIN consts
)
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_matched_terms,
       CAST(SUM(cm) AS BIGINT) AS score_micro
FROM contrib GROUP BY {id_col}
ORDER BY score_micro DESC, {id_col}
"""


def tfidf_oracle_sql(k: int = 3, table: str = "documents",
                     id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB replica: identical staging, rounding-before-rank, and
    term tie-break."""
    return f"""
WITH t AS (
  SELECT {id_col}, string_split(lower({text_col}), ' ') AS toks FROM {table}
), ex AS (
  SELECT {id_col}, len(toks) AS n_toks, unnest(toks) AS term FROM t
), tfc AS (
  SELECT {id_col}, term, n_toks, COUNT(*) AS c FROM ex GROUP BY 1, 2, 3
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1
), n AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM {table}
), scored AS (
  SELECT tfc.{id_col}, tfc.term,
    ROUND((CAST(c AS DOUBLE) / CAST(n_toks AS DOUBLE))
          * ln(nd / CAST(df AS DOUBLE)), 6) AS score
  FROM tfc JOIN dfreq USING (term) CROSS JOIN n
), ranked AS (
  SELECT {id_col}, term, score,
    ROW_NUMBER() OVER (PARTITION BY {id_col}
                       ORDER BY score DESC, term) AS rank
  FROM scored
)
SELECT {id_col}, CAST(rank AS INT) AS rank, term, score
FROM ranked WHERE rank <= {k} ORDER BY {id_col}, rank
"""


# --------------------------------------------------------------------------
# Tokenizer-prep: corpus vocabulary and BPE pair statistics
# --------------------------------------------------------------------------


def vocab_top_terms(
    df: DataFrame, text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """Corpus vocabulary by frequency — the first pass of tokenizer
    training (vocab induction) and of frequency-based filtering.
    One explode + one word-keyed count with map-side combine; ties
    break on the term string so the cut is engine-invariant."""
    ex = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
    return (
        ex.groupBy("term")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(top_k)
    )


def vocab_oracle_sql(
    top_k: int = 50, table: str = "documents", text_col: str = "text"
) -> str:
    return f"""
SELECT term, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(lower({text_col}), ' ')) AS term FROM {table})
GROUP BY term ORDER BY n DESC, term LIMIT {top_k}
"""


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """Adjacent-token pair frequencies — the statistic BPE/WordPiece
    training maximizes at every merge step (the top pair IS the next
    merge). Pairs are built inside the array with zip_with over two
    slices (no self-join, no positional explode+rejoin): each row
    contributes its n−1 adjacent pairs map-side, then one pair-keyed
    count with partial aggregation. Single-token rows contribute
    nothing (slice of length 0)."""
    # tokens projected once (r14): the pair expression reads t four
    # times (two slices + two sizes) — inline, that is four splits/row
    t = F.col("_bpe_toks")
    pairs = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    ex = df.withColumn("_bpe_toks", tokens(F.col(text_col))).select(
        F.explode(pairs).alias("pair")
    )
    return (
        ex.groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(top_k)
    )


def bpe_pair_oracle_sql(
    top_k: int = 50, table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB replica — the DSIR bigram idiom (list_transform over
    range) stands in for zip_with."""
    return f"""
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT unnest(list_transform(range(1, len(_tk)),
                               i -> _tk[i] || ' ' || _tk[i + 1])) AS pair
  FROM (SELECT string_split(lower({text_col}), ' ') AS _tk FROM {table})
)
GROUP BY pair ORDER BY n DESC, pair LIMIT {top_k}
"""


# --------------------------------------------------------------------------
# Sequence packing (concat-and-split training batches)
# --------------------------------------------------------------------------


def token_stream_layout(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    context_len: int = 512,
) -> DataFrame:
    """Concat-and-split token-stream layout — the EXACT global
    pre-training batch geometry: documents are concatenated in
    ``id_col`` order into ONE token stream and cut into
    ``context_len`` windows. (Contrast ``sampling.pack_sequences``,
    the hash-BUCKETED packer: that one trades the single global
    stream for embarrassingly-parallel per-bucket packing; this one
    keeps the exact stream order and yields the boundary metadata.) Per doc:
    (id, n_tokens, token_start, bin_id, bin_pos, spans_boundary) with
    bin_id = token_start div C — where the doc STARTS — and
    spans_boundary marking docs cut by a window edge (the rows an
    attention-mask reset or a document-boundary loss mask cares about).

    The global running total is a DISTRIBUTED two-pass prefix sum, not
    a global window: range-partition by id, cumsum per partition, then
    add each partition's broadcast offset (#partitions rows through the
    driver — the classic scan pattern). A naive
    ``Window.orderBy(id)`` funnels 100 TB through ONE task; this stays
    parallel at any scale and the result is boundary-placement-
    independent, so range-sampling nondeterminism cannot leak into the
    output (asserted in tests at 1 / 4 / 32 partitions)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    parts = toks.repartitionByRange(F.col("id")).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy("id")
    local = parts.withColumn("_cum", F.sum("n_tokens").over(w))
    offsets = (
        local.groupBy("_pid")
        .agg(F.max("_cum").alias("_ptotal"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_ptotal").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("_pid", "_offset")
    )
    c = F.lit(int(context_len))
    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "token_start", (F.col("_offset") + F.col("_cum") - F.col("n_tokens")).cast("long")
        )
        .withColumn("bin_id", F.expr("token_start div " + str(int(context_len))))
        .withColumn("bin_pos", (F.col("token_start") % c).cast("long"))
        .withColumn(
            "spans_boundary",
            F.expr(
                f"(token_start + n_tokens - 1) div {int(context_len)}"
            )
            > F.col("bin_id"),
        )
    )
    return out.select(
        F.col("id").alias(id_col),
        "n_tokens",
        "token_start",
        "bin_id",
        "bin_pos",
        "spans_boundary",
    ).orderBy(id_col)


def stream_bins_summary(packed: DataFrame) -> DataFrame:
    """Per training-window stats over a packed table: docs starting in
    the bin, tokens contributed by those docs, boundary crossers —
    the fill/fragmentation dashboard. Sketch-sized aggregation."""
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count("*").cast("long").alias("n_docs_starting"),
            F.sum("n_tokens").cast("long").alias("tokens_started"),
            F.sum(F.col("spans_boundary").cast("long"))
            .cast("long")
            .alias("n_crossers"),
        )
        .orderBy("bin_id")
    )


def token_stream_oracle_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    context_len: int = 512,
    table: str = "documents",
) -> str:
    """DuckDB replica of token_stream_layout: the single-window formulation
    (exact on one node) — equality against it IS the proof that the
    distributed two-pass prefix sum composes correctly."""
    c = int(context_len)
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         CAST(len(string_split(lower({text_col}), ' ')) AS BIGINT) AS n_tokens
  FROM {table}
), cum AS (
  SELECT id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY id) - n_tokens AS BIGINT)
           AS token_start
  FROM toks
)
SELECT id AS {id_col}, n_tokens, token_start,
       CAST(token_start // {c} AS BIGINT) AS bin_id,
       CAST(token_start % {c} AS BIGINT) AS bin_pos,
       (token_start + n_tokens - 1) // {c} > token_start // {c}
         AS spans_boundary
FROM cum
ORDER BY {id_col}
"""


# --------------------------------------------------------------------------
# Bigram language-model scoring (the perplexity-filter tier above the
# unigram LM)


def _bigram_scored(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram language-model scoring, UNORDERED — the composition-
    facing core of :func:`bigram_logprob` (r14): the perplexity
    compositions aggregate or re-rank the scored set, so the public
    gate's per-doc ORDER BY would be planned and immediately
    destroyed; they persist THIS frame (see ``_CACHED_FRAMES``) and
    the sort stays exclusive to the ordered wrapper. The next rung of
    the KenLM-style
    perplexity-filter ladder above ``q_text_unigram_logprob``: fit
    corpus conditional probabilities P(w_i | w_{i-1}) with add-one
    smoothing over the unigram vocabulary, score every document by its
    summed and mean negative log probability. High mean = improbable
    word SEQUENCES — catches shuffled/boilerplate/glued text that
    unigram frequency alone cannot (every word common, no bigram ever
    seen).

    p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), V = |unigram vocab| —
    cbg ≤ c1 and V ≥ 1 guarantee p ≤ 1, so the NLL is non-negative and
    the integer mean is division-safe.

    Determinism (the unigram-LM contract): each DISTINCT bigram's -ln p
    is computed once on the corpus gram table and quantized to integer
    micro-nats BEFORE the per-document fold; V is an exact integer
    (collected literal here, SQL-derived in the oracle — identical);
    the per-doc mean is positive integer division. Single-token
    documents have no bigrams and drop out (mirrored by the oracle,
    the DSIR ngram=2 rule).

    Scale shape: the corpus explodes ONCE into per-doc bigram counts
    (id, gram, c); the corpus bigram table and its prefix margin derive
    from that same compact table, and the scoring join is gram-keyed
    over counts — the raw text is read a single time and never
    shuffles. No broadcast of the bigram vocabulary (it is corpus-
    sized); the joins are plain hash-partitioned equi-joins on the gram
    key, which is exactly what scales."""
    # tokens projected once (r14): grams reads the array four times
    toks = F.col("_bg_toks")
    sz = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, 1, sz - 1),
        F.slice(toks, 2, sz - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # r14 second pass (guide §2.2): spread the tokenize+gram explode
    # when the scan is narrower than the cluster (the V-count pass
    # below rides the same spread frame); a many-file 100 TB input
    # skips the exchange.
    from pyspark.sql.window import Window

    from pg_parquet_spark.operators.common import spread_if_narrow

    src = spread_if_narrow(df.select(id_col, text_col), id_col)
    par = df.sparkSession.sparkContext.defaultParallelism
    doc_bg = (
        src.withColumn("_bg_toks", tokens(F.col(text_col)))
        .select(F.col(id_col), F.explode(grams).alias("g"))
        # r15 (guide §2.4 "two operations keyed the same way share one
        # exchange"): ONE explicit gram-key exchange, threaded through
        # everything downstream — hashpartitioning(g) satisfies the
        # (id, g) clustering of the per-doc count (subset rule), the
        # corpus bg_cnt aggregate, AND the scoring join's g-side, so
        # the r14 plan's three full gram-table exchanges collapse to
        # this ONE (plan: 21 → 14 exchanges on q_perplexity_datamap).
        .repartition(par, "g")
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        # materialized ONCE (lazy checkpoint — the racing-consumers
        # persist lesson): the corpus gram-count table feeds bg_cnt
        # AND the scoring join; unmaterialized, the tokenize+explode+
        # count pipeline planned twice. The checkpoint preserves the
        # g-partitioning (LogicalRDD captures outputPartitioning —
        # pinned in tests/test_headline_plans.py).
        .localCheckpoint(eager=False)
    )
    bg_cnt = doc_bg.groupBy("g").agg(F.sum("c").alias("cbg"))
    # r15: prefix margin as a window sum over w1 instead of the r14
    # groupBy+join-back (same integer c1 per w1 — one w1 exchange and
    # no join, where the join planned two).
    w1 = F.split_part(F.col("g"), F.lit(" "), F.lit(1))
    # r15: V rides the plan as a broadcast 1-row frame (the oracle's
    # own CROSS JOIN v shape) instead of a SYNCHRONOUS .count() at
    # construction time — the r14 form ran a full tokenize+explode+
    # distinct job on the driver's clock before the real job even
    # started, once per call (= once per bench trial). Same exact
    # integer → identical q micro-nats.
    v_frame = src.select(F.explode(tokens(F.col(text_col))).alias("w")).agg(
        F.count_distinct("w").alias("_nv")
    )
    q_table = (
        bg_cnt.withColumn("w1", w1)
        .withColumn("c1", F.sum("cbg").over(Window.partitionBy("w1")))
        .crossJoin(F.broadcast(v_frame))
        .select(
            "g",
            F.floor(
                -F.log(
                    (F.col("cbg") + F.lit(1)).cast("double")
                    / (F.col("c1") + F.col("_nv")).cast("double")
                )
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("q"),
        )
    )
    return (
        doc_bg.join(q_table, "g")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("q")).cast("long").alias("nll_micro"),
        )
        .withColumn(
            "mean_nll_micro",
            F.expr("nll_micro div n_bigrams").cast("long"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram-LM scores ordered by id — the public gate
    surface over :func:`_bigram_scored` (full contract there)."""
    return _bigram_scored(df, id_col, text_col).orderBy(id_col)


def bigram_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replica of bigram_logprob: identical gram construction
    (the DSIR ngram=2 rendering), identical smoothing expression shape,
    SQL-derived exact-integer V, micro-nat quantization before the
    per-doc fold, positive integer division for the mean."""
    grams = "list_transform(range(1, len(_tk)), i -> _tk[i] || ' ' || _tk[i + 1])"
    return f"""
WITH t AS (
  SELECT {id_col} AS id, string_split(lower({text_col}), ' ') AS _tk
  FROM {table}
), doc_bg AS (
  SELECT id, unnest({grams}) AS g FROM t
), doc_bg_c AS (
  SELECT id, g, COUNT(*) AS c FROM doc_bg GROUP BY 1, 2
), bg_cnt AS (
  SELECT g, SUM(c) AS cbg FROM doc_bg_c GROUP BY 1
), pre_cnt AS (
  SELECT split_part(g, ' ', 1) AS w1, SUM(cbg) AS c1 FROM bg_cnt GROUP BY 1
), v AS (
  SELECT COUNT(DISTINCT w) AS nv FROM
    (SELECT unnest(string_split(lower({text_col}), ' ')) AS w FROM {table})
), q_table AS (
  SELECT g,
         CAST(FLOOR(-ln(CAST(cbg + 1 AS DOUBLE)
                        / CAST(c1 + nv AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS q
  FROM bg_cnt JOIN pre_cnt ON split_part(g, ' ', 1) = w1
  CROSS JOIN v
)
SELECT id AS {id_col},
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(SUM(c * q) AS BIGINT) AS nll_micro,
       CAST(SUM(c * q) // SUM(c) AS BIGINT) AS mean_nll_micro
FROM doc_bg_c JOIN q_table USING (g)
GROUP BY id ORDER BY id
"""


def perplexity_datamap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bins: int = 8,
) -> DataFrame:
    """Perplexity DATAMAP (r11): equi-depth buckets over the corpus's
    bigram-LM difficulty — the "datamap" view (easy → hard deciles)
    curriculum and filtering decisions read. Composes
    :func:`bigram_logprob` with an exact in-plan equi-depth binning:
    (bin, n_docs, min_nll_micro, max_nll_micro, total_bigrams),
    ordered by bin.

    Determinism: ``n_bins`` must be a POWER OF TWO — the bin edges are
    interpolated percentiles at binary fractions i/n over integer
    micro-nats, where both engines' interpolation formulas
    ((1−g)·a + g·b vs a + (b−a)·g) are exact integer-scaled binary
    arithmetic and therefore bit-equal; any other n would leave the
    edge value to non-associative float luck. Edge values ride the
    plan as a broadcast 1-row bounds frame (the established crossJoin
    pattern), so binning is a pure projection.

    Scale shape: the bigram scoring reads text once (its contract);
    the percentile aggregate reduces doc-level longs; the final
    aggregate is n_bins rows. No global sort, no single-partition
    window."""
    if n_bins < 2 or (n_bins & (n_bins - 1)) != 0:
        raise ValueError(
            f"n_bins must be a power of two ≥ 2 (binary-fraction "
            f"percentile positions are the engine-exactness contract), "
            f"got {n_bins}"
        )
    # persist the doc-level scored table (r14): this plan references
    # it twice (percentile edges + the binning pass) and the producing
    # bigram pipeline is the expensive part — without the persist both
    # references re-run it end to end. Self-cleaning registry above.
    release_cached()
    scored = _bigram_scored(df, id_col, text_col).persist()
    _CACHED_FRAMES.append(scored)
    fr = [i / n_bins for i in range(1, n_bins)]
    edges = scored.agg(
        F.expr(
            f"percentile(mean_nll_micro, array({', '.join(map(repr, fr))}))"
        ).alias("_edges")
    )
    return (
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
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("mean_nll_micro").cast("long").alias("min_nll_micro"),
            F.max("mean_nll_micro").cast("long").alias("max_nll_micro"),
            F.sum("n_bigrams").cast("long").alias("total_bigrams"),
        )
        .orderBy("bin")
    )


def perplexity_datamap_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bins: int = 8,
) -> str:
    """DuckDB replica: the bigram oracle as a CTE, quantile_cont at the
    same binary fractions, the same strict-greater edge count."""
    fr = [i / n_bins for i in range(1, n_bins)]
    scored = bigram_oracle_sql(table, id_col, text_col)
    return f"""
WITH scored AS ({scored}),
edges AS (
  SELECT quantile_cont(CAST(mean_nll_micro AS DOUBLE),
                       [{', '.join(map(repr, fr))}]) AS e
  FROM scored
),
binned AS (
  SELECT s.*,
         len(list_filter(e, x -> CAST(s.mean_nll_micro AS DOUBLE) > x))
           AS bin
  FROM scored s CROSS JOIN edges
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(mean_nll_micro) AS BIGINT) AS min_nll_micro,
       CAST(MAX(mean_nll_micro) AS BIGINT) AS max_nll_micro,
       CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams
FROM binned GROUP BY bin ORDER BY bin
"""


# --------------------------------------------------------------------------
# PMI collocation mining (pointwise mutual information over adjacent
# token pairs)


def pmi_collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over adjacent
    token pairs — the tokenizer-prep signal BPE pair frequency misses
    (frequency finds 'of the'; PMI finds 'san francisco': pairs that
    co-occur far above what their member frequencies predict). The
    standard phrase-mining pass before vocabulary induction (Mikolov
    2013's phrase detection is thresholded PMI).

    pmi(w1, w2) = ln( N·c(w1 w2) / (c(w1·)·c(·w2)) ) with N = total
    bigram count, c(w1·)/c(·w2) the prefix/suffix margins of the SAME
    bigram table (self-consistent — every count refers to the same
    event space). ``min_count`` suppresses the low-count PMI explosion
    (a hapax pair has near-maximal PMI by construction — the standard
    failure mode).

    Determinism: all counts are exact integers; the single ln runs once
    per DISTINCT surviving pair and quantizes to micro-nats; ranking
    ties break on the pair text. Scale shape: one corpus explode into
    bigram counts; margins are two narrow re-aggregations of that same
    table; the margin joins are key-equi over counts; top-k is a heap
    (TakeOrderedAndProject), never a full sort."""
    # tokens projected once (r14): grams reads the array four times
    toks = F.col("_pmi_toks")
    sz = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, 1, sz - 1),
        F.slice(toks, 2, sz - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = (
        df.withColumn("_pmi_toks", tokens(F.col(text_col)))
        .select(F.explode(grams).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg = bg.select(
        F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"),
        "c",
    )
    # r15 (guide §5): n_total as a broadcast 1-row frame instead of a
    # synchronous collect — the r14 form ran the WHOLE bigram pipeline
    # once for the scalar and again in the real job (bg is not
    # persisted; the in-plan branch shares the groupBy exchange via
    # ReusedExchange instead). Same exact long → identical PMI micro.
    totals = bg.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("_nt"))
    pre = bg.groupBy("w1").agg(F.sum("c").alias("c1"))
    suf = bg.groupBy("w2").agg(F.sum("c").alias("c2"))
    pmi = F.floor(
        F.log(
            (F.col("c") * F.col("_nt").cast("double"))
            / (F.col("c1") * F.col("c2")).cast("double")
        )
        * 1e6
        + F.lit(0.5)
    ).cast("long")
    return (
        bg.filter(F.col("c") >= min_count)
        .join(pre, "w1")
        .join(suf, "w2")
        .crossJoin(F.broadcast(totals))
        .select("w1", "w2", F.col("c").cast("long").alias("c"), pmi.alias("pmi_micro"))
        .orderBy(F.col("pmi_micro").desc(), "w1", "w2")
        .limit(k)
    )


def pmi_oracle_sql(
    min_count: int = 5,
    k: int = 50,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replica: identical gram build, identical margin joins,
    identical c·N / (c1·c2) expression shape (N SQL-derived — the same
    exact integer the Spark side collects), micro-nat quantization,
    (pmi desc, w1, w2) ordering."""
    grams = "list_transform(range(1, len(_tk)), i -> _tk[i] || ' ' || _tk[i + 1])"
    return f"""
WITH t AS (
  SELECT string_split(lower({text_col}), ' ') AS _tk FROM {table}
), bg0 AS (
  SELECT unnest({grams}) AS g FROM t
), bg AS (
  SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
         COUNT(*) AS c
  FROM bg0 GROUP BY 1, 2
), n AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS nt FROM bg
), pre AS (
  SELECT w1, SUM(c) AS c1 FROM bg GROUP BY 1
), suf AS (
  SELECT w2, SUM(c) AS c2 FROM bg GROUP BY 1
)
SELECT bg.w1, bg.w2, CAST(bg.c AS BIGINT) AS c,
       CAST(FLOOR(ln((bg.c * nt) / CAST(c1 * c2 AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS pmi_micro
FROM bg JOIN pre USING (w1) JOIN suf USING (w2) CROSS JOIN n
WHERE bg.c >= {min_count}
ORDER BY pmi_micro DESC, bg.w1, bg.w2
LIMIT {k}
"""


# --------------------------------------------------------------------------
# HTML stripping (the C4-style extraction front door)


#: (pattern, replacement) chain shared by the Spark and DuckDB
#: renderings. Patterns stay inside the Java-regex ∩ RE2 common subset
#: ((?is) flags, non-greedy, character classes — no backrefs/lookahead).
_HTML_PATTERNS = [
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
]

#: entity → character chain (plain string replace — identical engines).
#: &amp; goes LAST so "&amp;lt;" decodes to the literal "&lt;" (one
#: decode pass, the lossless order).
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html(col: Column) -> Column:
    """Strip HTML to whitespace-normalized text — the extraction step
    every web-corpus pipeline (C4, RefinedWeb, FineWeb) runs before any
    quality filter: drop script/style payloads ENTIRELY (their content
    is not text), drop comments, replace remaining tags with spaces
    (so ``<p>a</p><p>b</p>`` keeps a word boundary), decode the
    six ubiquitous entities, collapse whitespace runs, trim. A pure
    codegen projection (regexp_replace chain) — zero shuffle, zero
    Python; the pattern chain is shared verbatim with the DuckDB
    rendering (``strip_html_sql``)."""
    out = col
    for pat, rep in _HTML_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def strip_html_sql(expr: str) -> str:
    """DuckDB rendering of strip_html — the same pattern chain with the
    'g' flag (DuckDB replaces first-match by default; Spark replaces
    all)."""
    out = expr
    for pat, rep in _HTML_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'gs')"
    for ent, ch in _HTML_ENTITIES:
        e = ent.replace("'", "''")
        c = ch.replace("'", "''")
        out = f"replace({out}, '{e}', '{c}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


def ngram_novelty(
    df: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus: the
    fraction of a document's bigrams never seen in the reference, in
    exact ppm integers — the memorization/derivativeness signal dual to
    ``decontaminate_against`` (that flags overlap with BENCHMARKS; this
    scores originality against the EXISTING corpus: novelty ≈ 0 means
    the "new" document is stitched from text the corpus already has,
    even when no single span is long enough for the substring tiers).

    Determinism: set-of-bigrams semantics (distinct per doc, mirrored
    by the oracle), integer counts, ppm by positive integer division.
    Scale shape: both corpora explode once into DISTINCT bigram rows;
    the novelty check is one gram-keyed left join of the document grams
    against the reference vocabulary (narrow md5-able keys, no text);
    per-doc fold is a count aggregate."""
    # tokens projected once per frame (r14): grams reads the array
    # four times — inline, that is four splits per row on both corpora
    toks = F.col("_nv_toks")
    sz = F.size(toks)
    grams = F.array_distinct(
        F.zip_with(
            F.slice(toks, 1, sz - 1),
            F.slice(toks, 2, sz - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    doc_g = df.withColumn("_nv_toks", tokens(F.col(text_col))).select(
        F.col(id_col), F.explode(grams).alias("g")
    )
    ref_g = (
        reference.withColumn("_nv_toks", tokens(F.col(text_col)))
        .select(F.explode(grams).alias("g"))
        .distinct()
        .withColumn("_seen", F.lit(True))
    )
    return (
        doc_g.join(ref_g, "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("_seen").isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("n_novel * 1000000 div n_grams").cast("long"),
        )
        .orderBy(id_col)
    )


def novelty_oracle_sql(
    ref_where: str,
    doc_where: str | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replica: identical distinct-bigram staging, left join
    against the reference vocabulary, ppm integer division."""
    grams = (
        "list_distinct(list_transform(range(1, len(_tk)), "
        "i -> _tk[i] || ' ' || _tk[i + 1]))"
    )
    dw = f"WHERE {doc_where}" if doc_where else ""
    return f"""
WITH doc_g AS (
  SELECT {id_col}, unnest({grams}) AS g FROM
    (SELECT {id_col}, string_split(lower({text_col}), ' ') AS _tk
     FROM {table} {dw})
), ref_g AS (
  SELECT DISTINCT unnest({grams}) AS g FROM
    (SELECT string_split(lower({text_col}), ' ') AS _tk
     FROM {table} WHERE {ref_where})
), flagged AS (
  SELECT d.{id_col}, r.g IS NOT NULL AS seen
  FROM doc_g d LEFT JOIN ref_g r USING (g)
)
SELECT {id_col},
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN seen THEN 0 ELSE 1 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN seen THEN 0 ELSE 1 END) * 1000000 // COUNT(*)
            AS BIGINT) AS novelty_ppm
FROM flagged GROUP BY {id_col} ORDER BY {id_col}
"""


# --------------------------------------------------------------------------
# Character-class profile / code detection (r11)

_CODE_SYMBOLS = "{}[]();=<>&|#"
_DIGITS = "0123456789"
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def charclass_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    code_threshold_ppm: int = 40_000,
) -> DataFrame:
    """Character-class PROFILE per document (r11) — the cheap signals a
    mixture designer reads before weighting code vs prose slices, and a
    quality filter reads before dropping symbol soup: exact integer ppm
    of code symbols ({}[]();=<>&|#), digits, and uppercase letters,
    plus ``code_like`` (symbol density over the threshold — a few
    percent symbol mass separates code from prose robustly).

    Determinism contract: every ratio is length arithmetic —
    ``len(text) − len(translate(text, class, ''))`` — so the whole
    profile is exact integers through positive integer division
    (Spark ``div`` ≡ DuckDB ``//``); TRANSLATE and LENGTH agree
    between engines by definition — no regex engine in the path,
    unlike pattern-based detectors. One codegen projection, zero
    shuffles, zero Python."""
    c = F.col(text_col)
    n = F.length(c).cast("long")

    def class_count(chars: str) -> Column:
        return (F.length(c) - F.length(F.translate(c, chars, ""))).cast("long")

    return (
        df.select(
            F.col(id_col),
            n.alias("n_chars"),
            class_count(_CODE_SYMBOLS).alias("_s"),
            class_count(_DIGITS).alias("_d"),
            class_count(_UPPER).alias("_u"),
        )
        .select(
            id_col,
            "n_chars",
            F.expr("(_s * 1000000) div greatest(n_chars, 1)")
            .cast("long")
            .alias("symbol_ppm"),
            F.expr("(_d * 1000000) div greatest(n_chars, 1)")
            .cast("long")
            .alias("digit_ppm"),
            F.expr("(_u * 1000000) div greatest(n_chars, 1)")
            .cast("long")
            .alias("upper_ppm"),
        )
        .withColumn(
            "code_like", F.col("symbol_ppm") > F.lit(int(code_threshold_ppm))
        )
        .orderBy(id_col)
    )


def charclass_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    code_threshold_ppm: int = 40_000,
) -> str:
    """DuckDB replica: identical translate/length arithmetic and
    integer division."""

    def cc(chars: str) -> str:
        esc = chars.replace("'", "''")
        return f"(LENGTH({text_col}) - LENGTH(translate({text_col}, '{esc}', '')))"

    return f"""
SELECT {id_col},
       CAST(LENGTH({text_col}) AS BIGINT) AS n_chars,
       CAST(({cc(_CODE_SYMBOLS)} * 1000000)
            // GREATEST(LENGTH({text_col}), 1) AS BIGINT) AS symbol_ppm,
       CAST(({cc(_DIGITS)} * 1000000)
            // GREATEST(LENGTH({text_col}), 1) AS BIGINT) AS digit_ppm,
       CAST(({cc(_UPPER)} * 1000000)
            // GREATEST(LENGTH({text_col}), 1) AS BIGINT) AS upper_ppm,
       ({cc(_CODE_SYMBOLS)} * 1000000)
            // GREATEST(LENGTH({text_col}), 1) > {code_threshold_ppm}
         AS code_like
FROM {table}
ORDER BY {id_col}
"""


def vocab_zipf(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-health Zipf diagnostic (r12): least-squares slope of
    ln(frequency) on ln(rank) over the WHOLE vocabulary — natural
    corpora run slope ≈ −1 (Zipf's law); a much flatter slope says
    template/synthetic text, a much steeper one says tiny effective
    vocabulary. One number a datacard ships next to the token counts.

    Returns one row (n_terms, slope_micro, intercept_micro).

    Determinism contract (the DSIR/PCA pattern composed):
    ranks come from :func:`distrank.distributed_row_number` over
    (freq DESC, term) — a web-scale vocabulary ranks in parallel,
    never through one task; per-term ln(rank)/ln(freq) quantize to
    integer micro-nats BEFORE any cross-row fold; the four regression
    moments are exact DECIMAL(38,0) integer sums (partitioning-
    invariant); the closing least-squares arithmetic runs driver-side
    in plain Python floats from those exact integers — one fixed IEEE
    sequence the oracle's SQL replicates operation for operation."""
    import math

    from pg_parquet_spark.operators.distrank import distributed_row_number

    freq = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("n"))
    )
    ranked = distributed_row_number(
        freq, [F.col("n").desc(), F.col("term")], out_col="rank"
    )
    q = lambda c: F.floor(F.log(c.cast("double")) * 1e6 + F.lit(0.5)).cast(  # noqa: E731
        "long"
    )
    pts = ranked.select(q(F.col("rank")).alias("x"), q(F.col("n")).alias("y"))
    row = pts.agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(
            (F.col("x").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        ).alias("sxy"),
        F.sum(
            (F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        ).alias("sxx"),
    ).first()
    if row["cnt"] == 0:
        raise ValueError("vocab_zipf on an empty corpus — no terms to rank")
    cnt = float(row["cnt"])
    sx, sy = float(row["sx"]), float(row["sy"])
    sxy, sxx = float(row["sxy"]), float(row["sxx"])
    denom = cnt * sxx - sx * sx
    slope = (cnt * sxy - sx * sy) / denom if denom != 0.0 else 0.0
    intercept = (sy - slope * sx) / cnt
    # x/y carry 1e6 scaling: slope is scale-free; intercept is in
    # micro-nats already. Quantize the slope to micro-units the same
    # floor(x*1e6+0.5) way both engines do.
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                int(row["cnt"]),
                int(math.floor(slope * 1e6 + 0.5)),
                int(math.floor(intercept + 0.5)),
            )
        ],
        "n_terms long, slope_micro long, intercept_micro long",
    )


def vocab_zipf_oracle_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB replica: the same micro-nat quantization, the same exact
    HUGEINT moment sums, the same least-squares float sequence
    (left-to-right products and subtractions mirror the Python
    driver-side arithmetic term for term)."""
    return f"""
WITH freq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split(lower({text_col}), ' ')) AS term
        FROM {table})
  GROUP BY term
), ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rank FROM freq
), pts AS (
  SELECT CAST(FLOOR(ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
  FROM ranked
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM pts
), fit AS (
  -- degenerate corpus (one distinct term): denom = 0 and the Python
  -- path pins slope = 0.0 (ADVICE r12) — mirror the guard here so the
  -- oracle never evaluates 0/0
  SELECT cnt, sx, sy,
         CASE WHEN CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0
              THEN 0.0
              ELSE (CAST(cnt AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         END AS slope
  FROM mom
)
SELECT cnt AS n_terms,
       CAST(FLOOR(slope * 1e6 + 0.5) AS BIGINT) AS slope_micro,
       CAST(FLOOR(
         ((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
          / CAST(cnt AS DOUBLE)) + 0.5
       ) AS BIGINT) AS intercept_micro
FROM fit
"""


# ---------------------------------------------------------------------------
# persisted BM25 term index (r13): build / search / upsert, the
# ivf-index family pattern applied to lexical retrieval

BM25_INDEX_BUCKETS = 16


def _term_bucket_py(term: str, buckets: int = BM25_INDEX_BUCKETS) -> int:
    import zlib

    return zlib.crc32(term.encode("utf-8")) % buckets


def _bm25_stats_uri(uri: str) -> str:
    return uri.rstrip("/") + "/_bm25_stats.json"


def _bm25_write_stats(spark, uri: str) -> dict:
    """(Re)derive the corpus constants FROM the merged postings and
    persist them in an underscore sidecar stamped with the manifest
    version — derived state, so a crash before this write self-heals:
    the read path recomputes on a stamp mismatch."""
    import json

    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources import layout
    from pg_parquet_spark.sources.reader import read_parquet

    idx = read_parquet(spark, uri.rstrip("/"))
    row = (
        idx.groupBy("doc_id_key")
        .agg(F.max("dl").alias("_dl"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_dl").alias("s"),
        )
        .collect()[0]
    )
    manifest = layout.read_manifest(uri.rstrip("/"))
    stats = {
        "stamp": manifest["version"] if manifest else 0,
        "n_docs": int(row["n"]),
        "sum_dl": int(row["s"]),
        # r15 (ADVICE r14): the bucket count is part of the index's
        # on-disk layout contract — persisted so an upsert under a
        # CHANGED BM25_INDEX_BUCKETS constant fails loudly instead of
        # silently stranding moved keys in their old partitions (the
        # skipped stability check is licensed by bucket = crc32(term)
        # % buckets being immutable per index).
        "buckets": BM25_INDEX_BUCKETS,
    }
    pgfs.write_bytes_atomic(
        _bm25_stats_uri(uri), json.dumps(stats, sort_keys=True).encode()
    )
    return stats


def _bm25_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The shared postings derivation (build / upsert / managed
    rebuild all route through it): one row per (doc, term) —
    (doc_id_key, term, dl, tf, bucket)."""
    ex = df.withColumn("_toks", tokens(F.col(text_col))).select(
        F.col(id_col).alias("doc_id_key"),
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("term"),
    )
    return (
        ex.groupBy("doc_id_key", "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "bucket",
            F.crc32(F.encode(F.col("term"), "utf-8"))
            % F.lit(BM25_INDEX_BUCKETS),
        )
    )


def build_bm25_index(
    df: DataFrame,
    uri: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the persisted BM25 postings index (r13 — the
    build/search/upsert family pattern the IVF/MinHash/span indexes
    follow, applied to lexical retrieval): one row per (doc, term) —
    (doc_id_key, term, dl, tf, bucket) — hive-partitioned on a 16-way
    crc32 term bucket, so a query's term filter prunes partitions at
    LISTING time before the pushed ``term IN`` predicate prunes row
    groups. Corpus constants (n_docs, Σdl) persist in a sidecar
    derived from the postings (see ``_bm25_write_stats``). The corpus
    text is never stored and never read again at query time."""
    from pg_parquet_spark.sources.layout import write_partitioned

    write_partitioned(
        _bm25_postings(df, id_col, text_col), uri.rstrip("/"), ["bucket"]
    )
    _bm25_write_stats(df.sparkSession, uri)


def bm25_index_upsert(
    spark,
    new_docs: DataFrame,
    uri: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental maintenance: MERGE the new documents' postings into
    the index ((doc, term)-keyed — replays re-land identical rows),
    touching ONLY the term-bucket partitions the batch writes (the
    merge_upsert copy-on-write granularity), then re-derive the corpus
    constants from the merged index. Re-ingesting a changed document
    REPLACES its matching (doc, term) rows but cannot delete postings
    for terms the new text dropped — delete the doc's rows first if
    documents mutate (the SCD-1 limitation, documented not hidden —
    or rebuild through :func:`bm25_reindex_on_drift`, whose rebuild
    path replaces changed docs completely)."""
    import json

    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources.layout import merge_upsert

    # r15 (ADVICE r14): the skipped partition-stability check below is
    # only sound while the index's bucket count equals the current
    # constant — verify against the persisted stats sidecar (one tiny
    # read; a pre-r15 sidecar without the field passes as legacy).
    if pgfs.exists(_bm25_stats_uri(uri)):
        _st = json.loads(pgfs.read_bytes(_bm25_stats_uri(uri)))
        if _st.get("buckets", BM25_INDEX_BUCKETS) != BM25_INDEX_BUCKETS:
            raise ValueError(
                f"BM25 index at {uri} was built with "
                f"{_st['buckets']} term buckets but BM25_INDEX_BUCKETS "
                f"is now {BM25_INDEX_BUCKETS}: upserting would move "
                f"keys across partitions with the stability check "
                f"disabled — rebuild the index instead"
            )
    postings = _bm25_postings(new_docs, id_col, text_col)
    merge_upsert(
        spark,
        uri.rstrip("/"),
        postings,
        ["doc_id_key", "term"],
        partition_col="bucket",
        # r14 (guide §1.2): the partition is DERIVED from the merge key
        # (bucket = crc32(term) % BM25_INDEX_BUCKETS, and term is a key
        # column), so a key can never move partitions — exactly the
        # "skip when structurally guaranteed" case merge_upsert's
        # stability contract names. The check was one broadcast
        # semi-join over the untouched-partition complement per upsert
        # (~0.25 s at sf0.1; a base-sized scan at 100 TB) that could
        # never fire.
        check_partition_stability=False,
        versioned=True,
    )
    _bm25_write_stats(spark, uri)


def bm25_index_topk(
    spark,
    uri: str,
    query_terms: list[str],
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Search the persisted BM25 index: the query's term buckets are
    computed DRIVER-SIDE (the probe-cell pattern), so the scan prunes
    to ≤|q| of the 16 bucket partitions at listing time and the pushed
    ``term IN`` filter prunes row groups inside them; scoring is
    ``bm25_scores_from_index`` — identical math and quantization to
    the direct path, asserted equal in tests. Stats come from the
    sidecar; a stamp/manifest mismatch (the crash window between merge
    and stats write) triggers an automatic recompute."""
    import json

    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources import layout
    from pg_parquet_spark.sources.reader import read_parquet

    qset = sorted({t.lower() for t in query_terms})
    if not qset:
        raise ValueError("BM25 needs at least one query term")
    uri = uri.rstrip("/")
    manifest = layout.read_manifest(uri)
    want_stamp = manifest["version"] if manifest else 0
    stats = None
    if pgfs.exists(_bm25_stats_uri(uri)):
        stats = json.loads(pgfs.read_bytes(_bm25_stats_uri(uri)))
        if stats.get("stamp") != want_stamp:
            stats = None
    if stats is None:  # crash window between merge and stats write
        stats = _bm25_write_stats(spark, uri)
    buckets = sorted({_term_bucket_py(t) for t in qset})
    terms_sql = ", ".join("'" + t.replace("'", "''") + "'" for t in qset)
    idx = read_parquet(
        spark,
        uri,
        where=(
            f"bucket IN ({', '.join(str(x) for x in buckets)}) "
            f"AND term IN ({terms_sql})"
        ),
    )
    return bm25_scores_from_index(
        idx.withColumnRenamed("doc_id_key", id_col),
        qset,
        stats["n_docs"],
        float(stats["sum_dl"]) / float(stats["n_docs"]),
        id_col=id_col,
        k1=k1,
        b=b,
    )


def bm25_index_staleness(
    spark,
    uri: str,
    new_docs: DataFrame,
    top_k: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    psi_pico_threshold: int = 250_000_000_000,
    growth_ppm_threshold: int = 500_000,
) -> DataFrame:
    """Staleness report for a persisted BM25 index
    (:func:`build_bm25_index` layouts) — the lexical twin of
    ``similarity.ivf_index_staleness`` (r14): PSI between the index's
    OWN document-frequency distribution and the incoming batch's,
    over the index's frozen top-``top_k`` vocabulary plus a single
    ``<oov>`` bucket, plus the batch growth ratio. One row:
    (n_index, n_new, growth_ppm, psi_pico, worst_term,
    worst_term_pico, stale).

    Why this works: the postings ARE the df distribution (one row per
    (doc, term)), so the index side needs no text at all — one scan of
    the ``term`` column, counted once; the top-K head of that count
    frame is the frozen vocabulary (df DESC, term ASC — the bounded
    model-literal pattern, ≤ top_k strings driver-side), and the
    histogram re-aggregates the SAME vocabulary-sized count frame (the
    postings are never scanned twice). A drifted corpus (new domain,
    changed tokenizer, language mix shift) moves mass between the head
    terms and ``<oov>`` even when per-doc quality signals look normal.
    ``psi_pico`` uses the classic 0.25-PSI cut; ``growth_ppm`` fires
    when the un-merged batch's postings grow past half the index
    (upsert cost and stats drift start to dominate).

    Re-index path (documented contract): when ``stale`` fires, rebuild
    with :func:`build_bm25_index` under a NEW root and flip readers
    atomically via the versioned-layout publish — never rewrite
    bucket partitions in place (the IVF generation pattern).

    Exactness: the per-category table is ``drift.psi_from_counts``'s
    integer-quantized output; this fold collects that ≤ (top_k+1)-row
    frame driver-side and reduces it with Python int arithmetic
    mirrored 1:1 by the oracle's BIGINT SQL (the oracle re-derives the
    index's postings from the gate's build rows — the tmp-index oracle
    pattern). Worst term ties break (term DESC, category ASC).

    Scale shape (100 TB): index side = one term-column count job
    (postings-sized scan, vocabulary-sized shuffle — no text, no doc
    ids move); new side = tokenize + distinct-(doc, term) count, one
    term-keyed exchange; the PSI join is ≤ 2·(top_k+1) rows. Nothing
    corpus-sized shuffles, nothing quadratic anywhere."""
    from pg_parquet_spark.operators.drift import psi_from_counts
    from pg_parquet_spark.sources.reader import read_parquet

    if top_k < 1:
        raise ValueError(
            f"bm25_index_staleness: top_k must be >= 1, got {top_k}"
        )
    OOV = "<oov>"
    term_counts = (
        read_parquet(spark, uri.rstrip("/"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .persist()
    )
    try:
        head = (
            term_counts.orderBy(F.desc("n"), "term").limit(top_k).collect()
        )
        if not head:
            raise ValueError(
                f"bm25_index_staleness: index at {uri!r} is empty"
            )
        vocab = [r["term"] for r in head]
        cat = lambda c: (  # noqa: E731 — shared by both sides
            F.when(c.isin(vocab), c).otherwise(F.lit(OOV)).alias("category")
        )
        idx_counts = (
            term_counts.select(cat(F.col("term")), "n")
            .groupBy("category")
            .agg(F.sum("n").cast("long").alias("n"))
        )
        new_counts = (
            new_docs.withColumn("_toks", tokens(F.col(text_col)))
            .select(
                F.col(id_col),
                F.explode(F.array_distinct(F.col("_toks"))).alias("term"),
            )
            .groupBy(cat(F.col("term")))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        rows = psi_from_counts(idx_counts, new_counts, "category").collect()
    finally:  # error paths must not leak the cached count frame
        term_counts.unpersist()
    n_index = sum(int(r["c_ref"]) for r in rows)
    n_new = sum(int(r["c_new"]) for r in rows)
    growth_ppm = n_new * 1_000_000 // n_index
    psi_pico = sum(int(r["term"]) for r in rows)
    worst = sorted(rows, key=lambda r: (-int(r["term"]), r["category"]))[0]
    stale = (
        psi_pico > psi_pico_threshold or growth_ppm > growth_ppm_threshold
    )
    return spark.createDataFrame(
        [
            (
                n_index,
                n_new,
                growth_ppm,
                psi_pico,
                worst["category"],
                int(worst["term"]),
                bool(stale),
            )
        ],
        "n_index long, n_new long, growth_ppm long, psi_pico long, "
        "worst_term string, worst_term_pico long, stale boolean",
    )


def bm25_index_staleness_oracle_sql(
    ref_where: str,
    new_where: str,
    top_k: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    psi_pico_threshold: int = 250_000_000_000,
    growth_ppm_threshold: int = 500_000,
) -> str:
    """DuckDB replica: the gate builds its index from ``ref_where``
    rows of the SAME documents table (the tmp-index oracle pattern),
    so the oracle re-derives the postings' df distribution by
    replaying the identical tokenize → distinct-(doc, term) derivation
    on those rows, freezes the same (df DESC, term ASC) top-K
    vocabulary, and folds the same BIGINT report."""
    from pg_parquet_spark.operators.drift import psi_oracle_sql

    def post(where: str) -> str:
        return (
            f"SELECT {id_col}, unnest(list_distinct("
            f"string_split(lower({text_col}), ' '))) AS term "
            f"FROM {table} WHERE {where}"
        )

    vocab = (
        f"SELECT term FROM (SELECT term, COUNT(*) AS df "
        f"FROM ({post(ref_where)}) GROUP BY term "
        f"ORDER BY df DESC, term LIMIT {top_k})"
    )
    cat = f"CASE WHEN term IN ({vocab}) THEN term ELSE '<oov>' END"
    psi = psi_oracle_sql(
        f"SELECT {cat} AS category FROM ({post(ref_where)})",
        f"SELECT {cat} AS category FROM ({post(new_where)})",
        "category",
    )
    return f"""
WITH t AS MATERIALIZED ({psi}),
agg AS (
  SELECT CAST(SUM(c_ref) AS BIGINT) AS n_index,
         CAST(SUM(c_new) AS BIGINT) AS n_new,
         CAST(SUM(term) AS BIGINT) AS psi_pico
  FROM t
),
w AS (
  SELECT category AS worst_term,
         CAST(term AS BIGINT) AS worst_term_pico
  FROM t ORDER BY term DESC, category LIMIT 1
)
SELECT a.n_index, a.n_new,
       a.n_new * 1000000 // a.n_index AS growth_ppm,
       a.psi_pico, w.worst_term, w.worst_term_pico,
       (a.psi_pico > {psi_pico_threshold}
        OR a.n_new * 1000000 // a.n_index > {growth_ppm_threshold}) AS stale
FROM agg a, w
"""


# ---------------------------------------------------------------------------
# managed BM25 index generations (r14 — the managed-IVF generation
# pattern applied to the lexical index: staleness verdict → upsert or
# text-free rebuild under gen_{n+1} → atomic pointer flip)

_BM25_CURRENT = "_BM25_CURRENT"


def _bm25_manifest_publish(root_uri: str, manifest: dict) -> None:
    """History file first, pointer flip second — the shared
    managed-generation publish (sources/layout.py), so generation time
    travel can never observe a generation the pointer knows about but
    the history lacks."""
    from pg_parquet_spark.sources.layout import managed_manifest_publish

    managed_manifest_publish(
        root_uri, _BM25_CURRENT, "_bm25_manifest", manifest
    )


def bm25_index_exists(root_uri: str) -> bool:
    """True when a managed BM25 index's generation pointer exists —
    the bootstrap probe (an explicit existence check; a corrupt
    pointer still surfaces loudly from :func:`resolve_bm25_index`)."""
    from pg_parquet_spark.sources.layout import managed_manifest_exists

    return managed_manifest_exists(root_uri, _BM25_CURRENT)


def resolve_bm25_index(root_uri: str) -> dict:
    """Resolve the managed lexical index's current generation:
    {generation, path, id_col}. The manifest travels WITH the data
    (the managed-IVF convention), so readers never need out-of-band
    configuration."""
    from pg_parquet_spark.sources.layout import managed_manifest_resolve

    return managed_manifest_resolve(
        root_uri,
        _BM25_CURRENT,
        f"no managed BM25 index at {root_uri!r} — create one with "
        "init_bm25_index",
    )


def init_bm25_index(
    spark,
    root_uri: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Create generation 1 of a managed BM25 index: one
    :func:`build_bm25_index` layout under ``gen_1/`` plus the atomic
    generation pointer. Returns the generation number (1)."""
    root_uri = root_uri.rstrip("/")
    if bm25_index_exists(root_uri):
        raise ValueError(
            f"managed BM25 index already exists at {root_uri!r} — "
            "ingest through bm25_reindex_on_drift / bm25_index_upsert"
        )
    build_bm25_index(docs, f"{root_uri}/gen_1", id_col, text_col)
    _bm25_manifest_publish(
        root_uri, {"generation": 1, "path": "gen_1", "id_col": id_col}
    )
    return 1


def bm25_managed_topk(
    spark,
    root_uri: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Search the managed index's CURRENT generation — resolves the
    generation path from the manifest and delegates to
    :func:`bm25_index_topk` (same bucket-pruned scan, same scoring
    quantization)."""
    m = resolve_bm25_index(root_uri)
    return bm25_index_topk(
        spark,
        f"{root_uri.rstrip('/')}/{m['path']}",
        query_terms,
        id_col=m["id_col"],
        k1=k1,
        b=b,
    )


def bm25_reindex_on_drift(
    spark,
    root_uri: str,
    batch_docs: DataFrame,
    text_col: str = "text",
    top_k: int = 32,
    psi_pico_threshold: int = 250_000_000_000,
    growth_ppm_threshold: int = 500_000,
) -> DataFrame:
    """Drift-triggered ingest for the managed BM25 index
    (:func:`init_bm25_index` roots) — the lexical
    ``similarity.reindex_on_drift``: run :func:`bm25_index_staleness`
    against the CURRENT generation, then

    - **fresh** → :func:`bm25_index_upsert` the batch into the current
      generation (crash-atomic versioned (doc, term) merge — fast, but
      it cannot delete postings for terms a changed doc dropped), or
    - **stale** → REBUILD WITHOUT THE CORPUS TEXT: the postings ARE
      the index's complete state (doc_id_key, term, dl, tf), so the
      new generation = batch postings ∪ (current postings anti-joined
      on the batch's doc ids) — changed documents are REPLACED whole,
      which repairs exactly the upsert path's documented SCD-1
      limitation — written under ``gen_{n+1}`` beside the live one,
      then the pointer flips ATOMICALLY. Readers resolve the old
      generation or the new one, never a mix; the superseded
      generation stays on disk for rollback until explicitly removed.

    Crash contract (drilled in tests): a crash after ``gen_{n+1}`` is
    written but BEFORE the pointer flip leaves the index serving the
    old generation — consistent, just stale; replaying the same call
    recomputes the same verdict against the old generation, overwrites
    ``gen_{n+1}`` and completes the flip. The manifest history file
    lands before the pointer, so generation time travel never dangles.

    Returns a 1-row action report: (generation_before,
    generation_after, action, stale, psi_pico, growth_ppm, n_index,
    n_new) — the managed-IVF report schema.

    Scale shape (100 TB): the fresh path touches only the batch's
    term-bucket partitions (the merge contract); the stale path pays
    ONE full postings read + one doc-keyed anti-join — postings-sized,
    never text-sized, and only when the monitor fires. The corpus text
    itself is never stored and never re-read."""
    from pg_parquet_spark.sources.layout import write_partitioned
    from pg_parquet_spark.sources.reader import read_parquet

    m = resolve_bm25_index(root_uri)
    root = root_uri.rstrip("/")
    gen_path = f"{root}/{m['path']}"
    id_col = m["id_col"]
    rep = bm25_index_staleness(
        spark,
        gen_path,
        batch_docs,
        top_k=top_k,
        id_col=id_col,
        text_col=text_col,
        psi_pico_threshold=psi_pico_threshold,
        growth_ppm_threshold=growth_ppm_threshold,
    ).collect()[0]
    if not rep.stale:
        bm25_index_upsert(spark, batch_docs, gen_path, id_col, text_col)
        gen_after, action = m["generation"], "upsert"
    else:
        batch_post = _bm25_postings(batch_docs, id_col, text_col)
        kept = read_parquet(spark, gen_path).join(
            batch_post.select("doc_id_key").distinct(),
            "doc_id_key",
            "left_anti",
        )
        # recompute the partition key on the union: the hive read
        # infers bucket as int while the derivation emits long
        merged = (
            kept.select("doc_id_key", "term", "dl", "tf")
            .unionByName(
                batch_post.select("doc_id_key", "term", "dl", "tf")
            )
            .withColumn(
                "bucket",
                F.crc32(F.encode(F.col("term"), "utf-8"))
                % F.lit(BM25_INDEX_BUCKETS),
            )
        )
        gen_after = m["generation"] + 1
        new_path = f"gen_{gen_after}"
        write_partitioned(merged, f"{root}/{new_path}", ["bucket"])
        _bm25_write_stats(spark, f"{root}/{new_path}")
        _bm25_manifest_publish(
            root,
            {"generation": gen_after, "path": new_path, "id_col": id_col},
        )
        action = "rebuild"
    return spark.createDataFrame(
        [
            (
                m["generation"],
                gen_after,
                action,
                bool(rep.stale),
                int(rep.psi_pico),
                int(rep.growth_ppm),
                int(rep.n_index),
                int(rep.n_new),
            )
        ],
        "generation_before long, generation_after long, action string, "
        "stale boolean, psi_pico long, growth_ppm long, n_index long, "
        "n_new long",
    )


def vocab_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 20,
) -> DataFrame:
    """Vocabulary growth curve (r13 — the Heaps'-law diagnostic that
    pairs with :func:`vocab_zipf` on a corpus datacard): cumulative
    distinct terms vs cumulative tokens over ingestion order (id
    order), at ``n_buckets`` equal-width id buckets. A healthy diverse
    corpus keeps discovering vocabulary (V ∝ N^β, β ≈ 0.5—0.7);
    a template/duplicated corpus flattens early — the dedup-
    effectiveness signal read together with the Zipf slope.

    Exactness: a term's contribution lands in the bucket of its FIRST
    document (min id) — so the cumulative distinct count needs no
    quadratic re-scan: one min-aggregate per term, one count per
    bucket, one cumulative window over ≤ ``n_buckets`` rows (bounded —
    the benign single-task exception). All integer arithmetic; the
    oracle replicates bit-for-bit.

    Returns (bucket, docs, cum_tokens, cum_terms) ordered by bucket."""
    from pyspark.sql import Window

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    bounds = df.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        raise ValueError("vocab_growth on an empty corpus")
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, (hi - lo + n_buckets) // n_buckets)
    bucket = ((F.col(id_col) - F.lit(lo)) / F.lit(width)).cast("long")

    ex = df.withColumn("_toks", tokens(F.col(text_col))).select(
        F.col(id_col),
        bucket.alias("_b"),
        F.size("_toks").alias("_dl"),
        F.explode("_toks").alias("term"),
    )
    per_bucket_tokens = (
        ex.groupBy(id_col, "_b")
        .agg(F.first("_dl").alias("_dl"))
        .groupBy("_b")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("_dl").alias("_tok"),
        )
    )
    first_seen = (
        ex.groupBy("term")
        .agg(F.min("_b").alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_new"))
    )
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket_tokens.join(first_seen, "_b", "left")
        .select(
            F.col("_b").alias("bucket"),
            "docs",
            F.sum("_tok").over(w).cast("long").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("_new"), F.lit(0)))
            .over(w)
            .cast("long")
            .alias("cum_terms"),
        )
        .orderBy("bucket")
    )


def vocab_growth_oracle_sql(
    n_buckets: int = 20,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replica: identical integer bucket width, first-seen
    bucket per term, cumulative windows."""
    return f"""
WITH bounds AS (
  SELECT MIN({id_col}) AS lo, MAX({id_col}) AS hi FROM {table}
), width AS (
  SELECT lo, GREATEST(1, (hi - lo + {n_buckets}) // {n_buckets}) AS w
  FROM bounds
), t AS (
  SELECT {id_col},
         CAST(({id_col} - lo) // w AS BIGINT) AS b,
         string_split(lower({text_col}), ' ') AS toks
  FROM {table} CROSS JOIN width
), per_bucket AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS docs,
         CAST(SUM(len(toks)) AS BIGINT) AS tok
  FROM t GROUP BY b
), ex AS (
  SELECT b, unnest(toks) AS term FROM t
), first_seen AS (
  SELECT term, MIN(b) AS b FROM ex GROUP BY term
), news AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS new FROM first_seen GROUP BY b
)
SELECT p.b AS bucket, p.docs,
       CAST(SUM(p.tok) OVER (ORDER BY p.b
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens,
       CAST(SUM(COALESCE(n.new, 0)) OVER (ORDER BY p.b
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_terms
FROM per_bucket p LEFT JOIN news n ON p.b = n.b
ORDER BY bucket
"""


#: Mojibake marker sequences: UTF-8 bytes re-decoded as Latin-1/CP1252
#: leave these fingerprints (U+00C3 'A-tilde' from double-decoded
#: accents, U+00E2+U+20AC from curly punctuation, stray U+00C2 before
#: NBSP), and a lossy decode leaves U+FFFD itself. Escaped codepoints
#: keep this source ASCII-safe.
MOJIBAKE_MARKERS = ["\ufffd", "\u00c3", "\u00e2\u20ac", "\u00c2"]


def encoding_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_ppm: int = 1_000,
) -> DataFrame:
    """Encoding-damage detection (r13 -- the CCNet-lineage cleaning
    signal): count mojibake marker sequences (double-decoded UTF-8
    fingerprints + U+FFFD) per document via pure replace/length
    arithmetic -- no regex engine in the path -- and flag documents
    whose marker density exceeds ``max_ppm``. Returns
    (id, n_chars, mojibake_hits, mojibake_ppm, clean), ordered.

    Scale shape: one codegen projection, zero shuffle before the
    ORDER BY; exact integer ppm, oracle bit-for-bit."""
    n_chars = F.length(F.col(text_col))
    hits = None
    for m in MOJIBAKE_MARKERS:
        h = (
            (n_chars - F.length(F.replace(F.col(text_col), F.lit(m))))
            / F.lit(len(m))
        ).cast("long")
        hits = h if hits is None else hits + h
    ppm = F.when(n_chars > 0, (hits * F.lit(1_000_000)) / n_chars).otherwise(
        F.lit(0)
    ).cast("long")
    return (
        df.select(
            F.col(id_col),
            n_chars.cast("long").alias("n_chars"),
            hits.alias("mojibake_hits"),
            ppm.alias("mojibake_ppm"),
            (ppm <= F.lit(max_ppm)).alias("clean"),
        )
        .orderBy(id_col)
    )


def encoding_quality_oracle_sql(
    max_ppm: int = 1_000,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replica: identical replace/length marker counts and
    integer ppm. Marker literals render via chr() codepoints so the
    SQL stays ASCII-safe."""
    terms = []
    for m in MOJIBAKE_MARKERS:
        lit = " || ".join(f"chr({ord(c)})" for c in m)
        terms.append(
            f"(length({text_col}) - length(replace({text_col}, {lit}, '')))"
            f" // {len(m)}"
        )
    hits = " + ".join(terms)
    return f"""
WITH scored AS (
  SELECT {id_col}, CAST(length({text_col}) AS BIGINT) AS n_chars,
         CAST({hits} AS BIGINT) AS mojibake_hits
  FROM {table}
)
SELECT {id_col}, n_chars, mojibake_hits,
       CAST(CASE WHEN n_chars > 0
                 THEN (mojibake_hits * 1000000) // n_chars
                 ELSE 0 END AS BIGINT) AS mojibake_ppm,
       (CASE WHEN n_chars > 0
             THEN (mojibake_hits * 1000000) // n_chars
             ELSE 0 END) <= {max_ppm} AS clean
FROM scored ORDER BY {id_col}
"""


def oov_rate(
    df: DataFrame,
    vocab_size: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_ppm: int = 200_000,
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    frozen top-``vocab_size`` vocabulary (r13 — the tokenizer-fit
    signal: a document whose tokens mostly fall outside the vocabulary
    the tokenizer was fit on fragments into long byte-level sequences
    and wastes context budget; high-OOV docs are routed to re-training
    or dropped). Returns
    (id, n_tokens, oov_tokens, oov_ppm, in_vocab), ordered by id.

    Determinism: the vocabulary is :func:`vocab_top_terms`'s cut
    (count desc, term asc — engine-invariant) collected ONCE
    driver-side and baked into the plan as an array literal (the
    frozen-model pattern), so the per-doc pass is a single codegen
    projection — zero shuffle, no join. Integer-exact ppm.

    Scale shape: one vocab aggregate (word-keyed count, map-side
    combine) + one projection over the corpus. ``vocab_size`` is
    bounded at 10k literals — beyond that, switch the membership test
    to a broadcast join."""
    if not 1 <= vocab_size <= 10_000:
        raise ValueError(
            f"oov_rate: vocab_size must be in [1, 10000], got {vocab_size}"
        )
    vocab = [
        r.term for r in vocab_top_terms(df, text_col, vocab_size).collect()
    ]
    vocab_arr = F.array(*[F.lit(t) for t in sorted(vocab)])
    # tokens projected once (r14): size + OOV filter share the array
    toks = F.col("_oov_toks")
    n_tok = F.size(toks).cast("long")
    oov = F.size(
        F.filter(toks, lambda t: ~F.array_contains(vocab_arr, t))
    ).cast("long")
    # ADVICE r13: integer `div`, not double-divide + truncate — the
    # docstring promises integer-exact ppm and the oracle uses `//`.
    # Two-step projection so `div` can name its operands; Catalyst
    # collapses both selects into one codegen stage.
    ppm = (
        F.when(
            F.col("n_tokens") > 0,
            F.expr("oov_tokens * 1000000L div n_tokens"),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return (
        df.withColumn("_oov_toks", tokens(F.col(text_col)))
        .select(
            F.col(id_col),
            n_tok.alias("n_tokens"),
            oov.alias("oov_tokens"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.col("oov_tokens"),
            ppm.alias("oov_ppm"),
            (ppm <= F.lit(max_ppm)).alias("in_vocab"),
        )
        .orderBy(id_col)
    )


def oov_rate_oracle_sql(
    vocab_size: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_ppm: int = 200_000,
    table: str = "documents",
) -> str:
    """DuckDB replica: the same (count desc, term asc) vocabulary cut,
    unnest + anti-membership count, integer ppm."""
    return f"""
WITH vocab AS (
  SELECT term FROM (
    SELECT term, COUNT(*) AS n
    FROM (SELECT unnest(string_split(lower({text_col}), ' ')) AS term
          FROM {table})
    GROUP BY term ORDER BY n DESC, term LIMIT {vocab_size}
  )
), toks AS (
  SELECT {id_col}, string_split(lower({text_col}), ' ') AS ts
  FROM {table}
), ex AS (
  SELECT {id_col}, unnest(ts) AS t FROM toks
), oov AS (
  SELECT e.{id_col},
         CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS oov_tokens
  FROM ex e LEFT JOIN vocab v ON e.t = v.term
  GROUP BY e.{id_col}
)
SELECT t.{id_col}, CAST(len(t.ts) AS BIGINT) AS n_tokens,
       COALESCE(o.oov_tokens, 0) AS oov_tokens,
       CAST(CASE WHEN len(t.ts) > 0
            THEN (COALESCE(o.oov_tokens, 0) * 1000000) // len(t.ts)
            ELSE 0 END AS BIGINT) AS oov_ppm,
       (CASE WHEN len(t.ts) > 0
            THEN (COALESCE(o.oov_tokens, 0) * 1000000) // len(t.ts)
            ELSE 0 END) <= {max_ppm} AS in_vocab
FROM toks t LEFT JOIN oov o USING ({id_col})
ORDER BY t.{id_col}
"""


def readability_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Integer-exact readability metrics (r14 — the classic
    quality-signal pair the Gopher/C4 filters don't carry): per
    document, Flesch-Kincaid grade and Flesch reading-ease from three
    regex counts — words = ``[A-Za-z]+`` matches, sentence marks =
    ``[.!?]+`` runs, syllables ≈ vowel groups ``[aeiouy]+`` of the
    lowered text (the standard cheap estimator; both engines count
    non-overlapping matches of these patterns identically — probed,
    not assumed).

    Milli-scaled with TERMWISE integer truncation (the exactness
    contract — each coefficient term divides separately, so the
    result is engine-identical):

        fk_grade_milli    = (390·W) div max(S,1) + (11800·Y) div W − 15590
        flesch_ease_milli = 206835 − (1015·W) div max(S,1) − (84600·Y) div W

    Documents with zero words report NULL scores (counts still
    emitted); a document with words but no terminal punctuation
    counts as ONE sentence. NULL text/ids drop. Returns
    (id, n_words, n_sentences, n_syllables, fk_grade_milli,
    flesch_ease_milli) ordered by id.

    Scale shape: one pushed scan, three regexp_extract_all counts in
    a single codegen projection, zero shuffles before the final
    order."""
    for c in (id_col, text_col):
        if c not in docs.columns:
            raise ValueError(f"column {c!r} not in frame")
    base = docs.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col),
        F.size(
            F.expr(f"regexp_extract_all({text_col}, '[A-Za-z]+', 0)")
        ).cast("long").alias("n_words"),
        F.size(
            F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")
        ).cast("long").alias("n_sentences"),
        F.size(
            F.expr(f"regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)")
        ).cast("long").alias("n_syllables"),
    )
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(
            F.col("n_words") > 0,
            F.expr("(390 * n_words) div greatest(n_sentences, 1L)")
            + F.expr("(11800 * n_syllables) div n_words")
            - 15590,
        ).alias("fk_grade_milli"),
        F.when(
            F.col("n_words") > 0,
            F.lit(206835)
            - F.expr("(1015 * n_words) div greatest(n_sentences, 1L)")
            - F.expr("(84600 * n_syllables) div n_words"),
        ).alias("flesch_ease_milli"),
    ).orderBy(id_col)


def readability_oracle_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB replica: identical regex counts and termwise integer
    truncation."""
    return f"""
WITH base AS (
  SELECT {id_col},
         CAST(len(regexp_extract_all({text_col}, '[A-Za-z]+')) AS BIGINT)
           AS n_words,
         CAST(len(regexp_extract_all({text_col}, '[.!?]+')) AS BIGINT)
           AS n_sentences,
         CAST(len(regexp_extract_all(lower({text_col}), '[aeiouy]+'))
              AS BIGINT) AS n_syllables
  FROM {table}
  WHERE {id_col} IS NOT NULL AND {text_col} IS NOT NULL
)
SELECT {id_col}, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 THEN
         (390 * n_words) // GREATEST(n_sentences, 1)
         + (11800 * n_syllables) // n_words - 15590
       END AS fk_grade_milli,
       CASE WHEN n_words > 0 THEN
         206835 - (1015 * n_words) // GREATEST(n_sentences, 1)
         - (84600 * n_syllables) // n_words
       END AS flesch_ease_milli
FROM base
ORDER BY {id_col}
"""
