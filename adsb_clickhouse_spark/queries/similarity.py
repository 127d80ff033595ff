"""Similarity-search queries over the `embeddings` table with DuckDB
oracles.

Float-parity note: both sides compute dot products as a left fold over
doubles (Spark `aggregate`, DuckDB `list_dot_product` on DOUBLE[]), so
the values agree exactly and rounding to 4 decimals is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from . import load_table, register

_DUCK_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "sim_knn_bruteforce",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_DUCK_COS.format(a='q.v', b='c.v')} AS cs
      FROM q JOIN e c ON c.vec_id != q.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    doc=(
        "Exact cosine top-5 for 5 probe vectors: broadcast queries, "
        "single corpus scan, JVM-side fold dot product (no UDF)."
    ),
)
def sim_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return S.knn_bruteforce(e, q, k=5).orderBy("query_id", "rank")


def _duck_ann_sql(n_planes: int = 8, dim: int = 64) -> str:
    planes = S.hyperplanes(n_planes, dim)
    # dot(v, plane) with ±1 entries = signed sum of elements (1-based idx)
    def plane_dot(vexpr: str, plane: list[int]) -> str:
        terms = [
            f"{'+' if w > 0 else '-'} {vexpr}[{d + 1}]" for d, w in enumerate(plane)
        ]
        return "(" + " ".join(terms).lstrip("+ ") + ")"

    bucket = " + ".join(
        f"(CASE WHEN {plane_dot('v', p)} >= 0 THEN {2 ** i}::BIGINT ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    hashed AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
    q AS (SELECT vec_id, v, bucket FROM hashed WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_DUCK_COS.format(a='q.v', b='c.v')} AS cs
      FROM q JOIN hashed c ON c.bucket = q.bucket AND c.vec_id != q.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
    FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank
    """


@register(
    "sim_ann_lsh",
    _duck_ann_sql(),
    doc=(
        "LSH-bucketed ANN: 8 deterministic ±1 hyperplanes (md5-derived, "
        "inlined into both engines) partition the corpus into 256 buckets; "
        "a query probes only its bucket."
    ),
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return S.ann_lsh(e, q, k=3).orderBy("query_id", "rank")


def _duck_lsh_near_dup_sql(n_planes: int = 4, dim: int = 64, t: float = 0.45) -> str:
    planes = S.hyperplanes(n_planes, dim)

    def plane_dot(vexpr: str, plane: list[int]) -> str:
        terms = [f"{'+' if w > 0 else '-'} {vexpr}[{d + 1}]" for d, w in enumerate(plane)]
        return "(" + " ".join(terms).lstrip("+ ") + ")"

    bucket = " + ".join(
        f"(CASE WHEN {plane_dot('v', p)} >= 0 THEN {2 ** i}::BIGINT ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    hashed AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_DUCK_COS.format(a='a.v', b='b.v')}, 4) AS cos_sim
      FROM hashed a JOIN hashed b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos_sim FROM pairs
    WHERE cos_sim >= {t}
    """


@register(
    "sim_cosine_near_dup",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_DUCK_COS.format(a='a.v', b='b.v')}, 4) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT 'exact' AS method, id_a, id_b, cos_sim FROM pairs
    WHERE cos_sim >= 0.45
    UNION ALL
    SELECT 'lsh' AS method, id_a, id_b, cos_sim FROM ({_duck_lsh_near_dup_sql()})
    ORDER BY method, id_a, id_b
    """,
    doc=(
        "Embedding-cosine near-dup pairs (≥ 0.45), both paths in one "
        "tagged union: 'exact' = O(n²) nested-loop baseline; 'lsh' = the "
        "scale path with 4 deterministic ±1 hyperplanes → 16 buckets "
        "(pairwise work drops ~2^p-fold; high-cosine pairs rarely straddle "
        "a plane). Both sides oracle-verified in one driver row."
    ),
)
def sim_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    exact = S.cosine_near_dup_pairs(e, threshold=0.45).select(
        F.lit("exact").alias("method"), "id_a", "id_b", "cos_sim"
    )
    lsh = S.cosine_near_dup_pairs_lsh(e, threshold=0.45, n_planes=4).select(
        F.lit("lsh").alias("method"), "id_a", "id_b", "cos_sim"
    )
    return exact.unionByName(lsh).orderBy("method", "id_a", "id_b")
