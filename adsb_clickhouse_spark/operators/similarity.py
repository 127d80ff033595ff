"""Similarity search over embedding columns (`array<float>`).

Two paths, mirroring what a 100 TB training-data pipeline needs:

- **brute-force cosine top-k** — exact baseline. The query side is small
  (a handful of probe vectors) and broadcast; the corpus side streams
  through a single scan with the dot product evaluated JVM-side via
  higher-order functions (zip_with + aggregate fold — no Python UDF, no
  per-row Arrow transfer). Cost is O(|corpus|·|queries|·dim) FLOPs at
  scan speed; top-k per query is a tiny windowed shuffle.
- **LSH-bucketed ANN** — random-hyperplane signatures (deterministic ±1
  planes derived from md5 so the DuckDB oracle reproduces them bit-for-
  bit). Corpus is hashed once into 2^p buckets; a query probes only its
  own bucket → per-query cost drops by the bucket fan-out. At scale the
  bucket id becomes the table's partition key so a probe is one
  partition-pruned scan.

Everything is double-precision with a left-fold summation order, which
both Spark's `aggregate` and DuckDB's list functions use — results agree
to the last bit, so oracles compare rounded values safely.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(col: Column) -> Column:
    return col.cast("array<double>")


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, cos_sim). Ties broken by
    neighbor id (deterministic). The queries side is broadcast — the big
    corpus never shuffles until the final per-query top-k.
    """
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 4).alias("cos_sim"))
    )


def hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 random hyperplanes: sign from md5(f"{p}_{d}").
    Pure-python md5 → identical constants can be inlined into both the
    Spark plan and the oracle SQL."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()
            row.append(1 if int(h[:2], 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Bucket id: bit p = (dot(vec, plane_p) >= 0).

    Planes are ±1, so each dot is a plain signed sum of elements — an
    explicit add chain that whole-stage codegen compiles, an order of
    magnitude faster than a higher-order-function fold (and the exact
    expression the DuckDB oracle uses, same left-to-right order)."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        dot = None
        for d, w in enumerate(plane):
            term = F.element_at(vec, d + 1)
            term = term if w > 0 else -term
            dot = term if dot is None else dot + term
        bucket = bucket + F.when(dot >= 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 3,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    Returns (query_id, neighbor_id, rank, cos_sim) within-bucket. Recall
    is tunable via n_planes (fewer planes → bigger buckets → higher
    recall, more compute); multi-probe is a natural extension.
    """
    from pyspark.sql import Window

    planes = hyperplanes(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", lsh_bucket(F.col("cv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", lsh_bucket(F.col("qv"), planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 4).alias("cos_sim"))
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    *,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a<b) with cosine ≥ threshold — embedding near-dup.

    Exact O(n²) form; at scale, pre-bucket with `lsh_bucket` and join on
    bucket (same refinement as dedup LSH)."""
    a = vectors.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def cosine_near_dup_pairs_lsh(
    vectors: DataFrame,
    *,
    threshold: float = 0.45,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs with LSH pre-bucketing — the scale path
    for :func:`cosine_near_dup_pairs`.

    Candidates must share a hyperplane bucket: with p planes the pairwise
    work drops ~2^p-fold while high-cosine pairs (small angle) rarely
    straddle a plane. Recall is tunable by p (fewer planes → higher
    recall). Returns (id_a, id_b, cos_sim) within-bucket, cos ≥ threshold.
    """
    planes = hyperplanes(n_planes, dim)
    h = vectors.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    a = h.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = h.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
