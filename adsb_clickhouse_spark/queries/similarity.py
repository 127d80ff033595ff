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
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
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


def _sql_plane_dot(vexpr: str, plane: list[int]) -> str:
    """dot(v, plane) with ±1 entries = signed sum of elements (1-based)."""
    terms = [f"{'+' if w > 0 else '-'} {vexpr}[{d + 1}]" for d, w in enumerate(plane)]
    return "(" + " ".join(terms).lstrip("+ ") + ")"


def _sql_d2(a: str, b: str, dim: int) -> str:
    """Squared L2 distance as an explicit left-to-right add chain — the
    association operators/similarity._d2_fold reproduces, so assignment
    and probe argmins agree with Spark bit-for-bit."""
    terms = [
        f"(({a}[{i}]-{b}[{i}])*({a}[{i}]-{b}[{i}]))" for i in range(1, dim + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def _sql_d2_range(a: str, b: str, lo: int, hi: int) -> str:
    """Squared L2 over 1-based index range [lo, hi] as the same explicit
    left-to-right add chain as :func:`_sql_d2` — the per-subspace
    distance for PQ code assignment."""
    terms = [f"(({a}[{i}]-{b}[{i}])*({a}[{i}]-{b}[{i}]))" for i in range(lo, hi + 1)]
    return "(" + " + ".join(terms) + ")"


def _duck_pq_ctes(m: int, ksub: int, dim: int) -> str:
    """PQ CTE block: md5-seeded per-subspace codebooks (seed vectors
    sliced), argmin code assignment per subspace, ADC lookup tables per
    query, and fixed-order score assembly. Every double is a sequential
    fold or an explicit left-assoc add chain, matching the numpy/driver
    computation in operators/similarity.pq_build/pq_search
    bit-for-bit."""
    dsub = dim // m
    ctes = [
        f"""pq_seeds AS (
      SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
               AS code
      FROM (SELECT vec_id, v FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {ksub}))"""
    ]
    for j in range(m):
        lo, hi = j * dsub + 1, (j + 1) * dsub
        ctes.append(
            f"""pq_c{j} AS (
      SELECT vec_id, code FROM (
        SELECT e.vec_id, s.code,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_sql_d2_range('e.v', 's.v', lo, hi)},
                                           s.code) AS rn
        FROM e CROSS JOIN pq_seeds s) WHERE rn = 1)"""
        )
        ctes.append(
            f"""pq_lk{j} AS (
      SELECT q.vec_id AS query_id, s.code,
             list_dot_product(q.v[{lo}:{hi}], s.v[{lo}:{hi}]) AS pd,
             list_dot_product(s.v[{lo}:{hi}], s.v[{lo}:{hi}]) AS cn2
      FROM lq q CROSS JOIN pq_seeds s)"""
        )
    joins = " ".join(
        f"JOIN pq_c{j} c{j} USING (vec_id)" for j in range(1, m)
    )
    ctes.append(
        f"""pq_codes AS (
      SELECT c0.vec_id, {', '.join(f'c{j}.code AS code_{j}' for j in range(m))}
      FROM pq_c0 c0 {joins})"""
    )
    ctes.append(
        "pq_qn AS (SELECT vec_id AS query_id, sqrt(list_dot_product(v, v)) AS qn FROM lq)"
    )
    sp = "l0.pd"
    sn = "l0.cn2"
    for j in range(1, m):
        sp = f"({sp} + l{j}.pd)"
        sn = f"({sn} + l{j}.cn2)"
    lk_joins = " ".join(
        f"JOIN pq_lk{j} l{j} ON l{j}.query_id = l0.query_id AND l{j}.code = cp.code_{j}"
        for j in range(1, m)
    )
    ctes.append(
        f"""pq_scored AS (
      SELECT l0.query_id, cp.vec_id AS neighbor_id,
             {sp} / (qn.qn * sqrt({sn})) AS cs
      FROM pq_codes cp
      JOIN pq_lk0 l0 ON l0.code = cp.code_0
      {lk_joins}
      JOIN pq_qn qn ON qn.query_id = l0.query_id
      WHERE cp.vec_id != l0.query_id AND {sn} > 0)"""
    )
    ctes.append(
        """pq_ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id) AS rank
      FROM pq_scored)"""
    )
    return ",\n    ".join(ctes)


def _duck_ivfpq_ctes(m: int) -> str:
    """IVF-ADC branch: the composed index — candidates pruned to each
    query's probed inverted lists (the `probes`/`assigned` CTEs the
    'ivf' branch already defines), scored from PQ codes via the ADC
    lookup CTEs the 'pq' branch already defines. Pure composition: no
    new learned state, so the iters=0 determinism story carries over
    unchanged (operators/similarity.ivfpq_build)."""
    sp = "l0.pd"
    sn = "l0.cn2"
    for j in range(1, m):
        sp = f"({sp} + l{j}.pd)"
        sn = f"({sn} + l{j}.cn2)"
    lk_joins = " ".join(
        f"JOIN pq_lk{j} l{j} ON l{j}.query_id = p.query_id AND l{j}.code = cp.code_{j}"
        for j in range(1, m)
    )
    return f"""ivfpq_scored AS (
      SELECT p.query_id, cp.vec_id AS neighbor_id,
             {sp} / (qn.qn * sqrt({sn})) AS cs
      FROM probes p
      JOIN assigned a ON a.list_id = p.list_id
      JOIN pq_codes cp ON cp.vec_id = a.vec_id
      JOIN pq_lk0 l0 ON l0.query_id = p.query_id AND l0.code = cp.code_0
      {lk_joins}
      JOIN pq_qn qn ON qn.query_id = p.query_id
      WHERE cp.vec_id != p.query_id AND {sn} > 0),
    ivfpq_ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id) AS rank
      FROM ivfpq_scored)"""


def _duck_ann_union_sql(
    n_planes: int = 8, dim: int = 64, n_lists: int = 16, nprobe: int = 4, k: int = 3
) -> str:
    planes = S.hyperplanes(n_planes, dim)
    bucket = " + ".join(
        f"(CASE WHEN {_sql_plane_dot('v', p)} >= 0 THEN {2 ** i}::BIGINT ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
    hashed AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
    lq AS (SELECT vec_id, v, bucket FROM hashed WHERE vec_id < 5),
    lsh_scored AS (
      SELECT lq.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_DUCK_COS.format(a='lq.v', b='c.v')} AS cs
      FROM lq JOIN hashed c ON c.bucket = lq.bucket AND c.vec_id != lq.vec_id),
    lsh_ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id) AS rank
      FROM lsh_scored),
    cents AS (
      SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
               AS list_id
      FROM (SELECT vec_id, v FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {n_lists})),
    assigned AS (
      SELECT vec_id, v, list_id FROM (
        SELECT e.vec_id, e.v, c.list_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_sql_d2('e.v', 'c.v', dim)}, c.list_id)
                 AS rn
        FROM e CROSS JOIN cents c) WHERE rn = 1),
    probes AS (
      SELECT query_id, qv, list_id FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, c.list_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_sql_d2('q.v', 'c.v', dim)}, c.list_id)
                 AS rn
        FROM e q CROSS JOIN cents c WHERE q.vec_id < 5) WHERE rn <= {nprobe}),
    ivf_scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {_DUCK_COS.format(a='p.qv', b='a.v')} AS cs
      FROM probes p JOIN assigned a
        ON a.list_id = p.list_id AND a.vec_id != p.query_id),
    ivf_ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id) AS rank
      FROM ivf_scored),
    mq AS (
      SELECT lq.vec_id, lq.v, t.pb AS bucket
      FROM lq, unnest([lq.bucket,
                       {', '.join(f'xor(lq.bucket, {1 << i}::BIGINT)' for i in range(n_planes))}])
             AS t(pb)),
    mp_scored AS (
      SELECT mq.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_DUCK_COS.format(a='mq.v', b='c.v')} AS cs
      FROM mq JOIN hashed c ON c.bucket = mq.bucket AND c.vec_id != mq.vec_id),
    mp_ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id) AS rank
      FROM mp_scored),
    {_duck_pq_ctes(4, 8, dim)},
    {_duck_ivfpq_ctes(4)}
    SELECT 'ivf' AS method, query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
    FROM ivf_ranked WHERE rank <= {k}
    UNION ALL
    SELECT 'ivfpq' AS method, query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
    FROM ivfpq_ranked WHERE rank <= {k}
    UNION ALL
    SELECT 'lsh' AS method, query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
    FROM lsh_ranked WHERE rank <= {k}
    UNION ALL
    SELECT 'mp' AS method, query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
    FROM mp_ranked WHERE rank <= {k}
    UNION ALL
    SELECT 'pq' AS method, query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
    FROM pq_ranked WHERE rank <= {k}
    ORDER BY method, query_id, rank
    """


@register(
    "sim_ann_lsh",
    _duck_ann_union_sql(),
    doc=(
        "All five ANN scale paths in one tagged-union driver row. 'lsh': "
        "8 deterministic ±1 hyperplanes (md5-derived, inlined into both "
        "engines) partition the corpus into 256 buckets and a query probes "
        "only its bucket. 'mp': the same index probed multi-probe (all "
        "Hamming-1 neighbor buckets) — recall recovers without growing "
        "corpus buckets; a probe reads 9 partitions instead of 1. 'ivf': "
        "inverted-file probe over md5-seeded coarse centroids (iters=0 "
        "pins the seeding/assignment/probe/rank machinery to the oracle; "
        "the Lloyd refinement is covered by pytest recall tests — "
        "cross-row float summation order makes iterated centroids "
        "untwinable in SQL). 'pq': product quantization with ADC scoring "
        "— 4 subspaces × 8 md5-seeded centroids; each corpus vector is "
        "scored from its 4 codes against per-query broadcast lookup "
        "tables (fixed-order add chains, fold dots — bit-exact vs the "
        "oracle), the memory-bounded path where the rescoring scan reads "
        "codes instead of raw vectors. 'ivfpq': the composed IVF-ADC "
        "index — candidates pruned to each query's nprobe inverted "
        "lists AND scored from PQ codes via the same broadcast ADC "
        "tables; pure composition of the two oracled halves, so the "
        "iters=0 determinism carries over. At 100 TB the corpus is "
        "written partitioned by bucket / list_id, so a probe is a "
        "partition-pruned scan in every branch, and ivfpq is THE "
        "stored layout: write_ann_layout(codes ⋈ assignments, "
        "key_col='list_id') makes a probe read nprobe/n_lists "
        "directories of m-int codes (operators/similarity."
        "ivfpq_probe_stored)."
    ),
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    # r15: the 5 probe vectors are collected ONCE and shared by the
    # ivf/pq/ivfpq probes (was one bounded collect job per probe); the
    # assignment mapInPandas pass feeds the ivf branch AND the composed
    # ivfpq index — materialized once via lazy localCheckpoint (was
    # re-evaluated, Python workers included, per consumer). An eager
    # thread-pooled build variant was A/B-measured SLOWER (concurrent
    # mapInPandas passes storm Python worker startup; min 9.35 s vs
    # 7.19 s lazy at sf0.1), so the checkpoints stay lazy.
    qrows = S.collect_query_rows(q)
    # vector width comes free from the collected probe rows — passing it
    # down saves the one-row _infer_dim job each of hash_corpus and the
    # two ann_lsh probes would otherwise run at plan-build (r15)
    dim = len(qrows[0]["qv"]) if qrows else None
    # one stored index, probed two ways — hash the corpus once (the
    # bucketized corpus IS the stored table at scale; see hash_corpus)
    ch = S.hash_corpus(e, dim=dim).localCheckpoint(eager=False)
    # r15b: ONE fused iters=0 build (one seeds job, one Arrow pass)
    # yields the stored-index table directly; the ivf and pq branches
    # read their columns out of it — was two seed collects, two corpus
    # Python passes, and a codes ⋈ assignments join (bit-identical by
    # the shared md5 seeding law; see ivfpq_build / parity test)
    indexed, cents, pq_cents = S.ivfpq_build(e, n_lists=16, m=4, ksub=8, iters=0)
    indexed = indexed.localCheckpoint(eager=False)
    assignments = indexed.select("id", "list_id")
    codes = indexed.select("id", *[f"code_{j}" for j in range(4)])
    lsh = S.ann_lsh(e, q, k=3, dim=dim, hashed_corpus=ch, qrows=qrows).select(
        F.lit("lsh").alias("method"), "query_id", "neighbor_id", "rank", "cos_sim"
    )
    mp = S.ann_lsh(
        e, q, k=3, n_probes=9, dim=dim, hashed_corpus=ch, qrows=qrows
    ).select(
        F.lit("mp").alias("method"), "query_id", "neighbor_id", "rank", "cos_sim"
    )
    ivf = S.ivf_search(e, assignments, cents, q, k=3, nprobe=4, qrows=qrows).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id", "rank", "cos_sim"
    )
    # the one fused build pass feeds the flat-PQ branch (its code
    # columns) and the composed IVF-ADC branch (the whole indexed
    # table — codes + list assignments, the stored-index layout)
    pq = S.pq_search(codes, pq_cents, q, k=3, qrows=qrows).select(
        F.lit("pq").alias("method"), "query_id", "neighbor_id", "rank", "cos_sim"
    )
    ivfpq = S.ivfpq_search(
        indexed, cents, pq_cents, q, k=3, nprobe=4, qrows=qrows
    ).select(
        F.lit("ivfpq").alias("method"), "query_id", "neighbor_id", "rank", "cos_sim"
    )
    return (
        ivf.unionByName(ivfpq)
        .unionByName(lsh)
        .unionByName(mp)
        .unionByName(pq)
        .orderBy("method", "query_id", "rank")
    )


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
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
    hashed AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_DUCK_COS.format(a='a.v', b='b.v')}, 4) AS cos_sim
      FROM hashed a JOIN hashed b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos_sim FROM pairs
    WHERE cos_sim >= {t}
    """


def _duck_hembed_ctes(dim: int = 32) -> str:
    """Hashed-projection text-embedder CTEs (operators/similarity.py::
    hashed_text_embeddings): feature-hashed unigram components as `dim`
    conditional sums — exact integers, so the downstream cosine chain
    is bit-identical across engines."""
    from ..functions.texttools import duck_md5_long, duck_tokens

    csum = ", ".join(
        f"SUM(CASE WHEN j={i} THEN s ELSE 0 END)" for i in range(dim)
    )
    return f"""
    htok AS (SELECT doc_id, unnest({duck_tokens('text')}) AS g FROM documents),
    hcontrib AS (SELECT doc_id,
        {duck_md5_long("'he|' || g")} % {dim} AS j,
        CASE WHEN {duck_md5_long("'hs|' || g")} % 2 = 0 THEN 1 ELSE -1 END AS s
      FROM htok),
    hemb AS (SELECT doc_id, [{csum}]::DOUBLE[] AS v
             FROM hcontrib GROUP BY doc_id),
    hnz AS (SELECT * FROM hemb WHERE list_dot_product(v, v) > 0),
    hpairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round({_DUCK_COS.format(a='a.v', b='b.v')}, 4) AS cos_sim
      FROM hnz a JOIN hnz b ON a.doc_id < b.doc_id)
    """


@register(
    "sim_cosine_near_dup",
    f"""
    WITH RECURSIVE {_duck_hembed_ctes()},
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_DUCK_COS.format(a='a.v', b='b.v')}, 4) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id),
    lp AS (SELECT id_a, id_b, cos_sim FROM ({_duck_lsh_near_dup_sql()})),
    edges AS (SELECT id_a AS u, id_b AS v FROM lp
              UNION SELECT id_b, id_a FROM lp),
    reach(id, lab) AS (
        SELECT u, u FROM edges
        UNION
        SELECT eg.v, r.lab FROM reach r JOIN edges eg ON eg.u = r.id
        WHERE r.lab < eg.v),
    cc AS (SELECT id, min(lab) AS comp FROM reach GROUP BY id),
    sd_cents AS (
      SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
               AS list_id
      FROM (SELECT vec_id, v FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16)),
    sd_assigned AS (
      SELECT vec_id, v, list_id FROM (
        SELECT e.vec_id, e.v, c.list_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_sql_d2('e.v', 'c.v', 64)}, c.list_id)
                 AS rn
        FROM e CROSS JOIN sd_cents c) WHERE rn = 1),
    sd_pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_DUCK_COS.format(a='a.v', b='b.v')}, 4) AS cos_sim
      FROM sd_assigned a JOIN sd_assigned b
        ON a.list_id = b.list_id AND a.vec_id < b.vec_id),
    sd AS (
      SELECT id_b AS did, id_a AS wit, cos_sim,
             row_number() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
      FROM sd_pairs WHERE cos_sim >= 0.45)
    SELECT 'exact' AS method, id_a, id_b, cos_sim FROM pairs
    WHERE cos_sim >= 0.45
    UNION ALL
    SELECT 'lsh' AS method, id_a, id_b, cos_sim FROM lp
    UNION ALL
    SELECT 'cc' AS method, id AS id_a, comp AS id_b,
           CAST(NULL AS DOUBLE) AS cos_sim
    FROM cc
    UNION ALL
    SELECT 'semdedup' AS method, did AS id_a, wit AS id_b, cos_sim
    FROM sd WHERE rn = 1
    UNION ALL
    SELECT 'hembed' AS method, id_a, id_b, cos_sim FROM hpairs
    WHERE cos_sim >= 0.9
    ORDER BY method, id_a, id_b
    """,
    doc=(
        "Embedding-cosine near-dup, four branches in one tagged union: "
        "'exact' = O(n²) baseline, tile-blocked so no driver collect or "
        "broadcast matrix (B(B+1)/2 bounded-memory tasks, "
        "operators/similarity.py::cosine_near_dup_pairs_blocked); 'lsh' "
        "= the scale path with 4 deterministic ±1 hyperplanes → 16 "
        "buckets (pairwise work drops ~2^p-fold; high-cosine pairs "
        "rarely straddle a plane); 'cc' = dup CLUSTERS over the lsh "
        "pairs (id_b = component = min reachable vec id) via the same "
        "hash-to-min + pointer-doubling connected components the text "
        "dedup family uses — pairs are evidence, clusters are what a "
        "keep-one-per-group retention policy consumes; 'semdedup' = "
        "SemDeDup (Abbas et al. 2023): k-means-cluster-then-prune — the "
        "corpus is clustered with the SAME md5-seeded iters=0 k-means "
        "the IVF index oracles, and within each cluster every doc with "
        "a lower-id neighbor at cosine ≥ 0.45 is dropped (id_a = "
        "dropped doc, id_b = the smallest-id witness). One shuffle + a "
        "per-cluster numpy tile — O(n²) becomes O(Σ c_i²), the paper's "
        "whole point; at 100 TB n_lists grows ∝ n so clusters stay "
        "bounded (operators/similarity.py::semdedup); 'hembed' (r11) = "
        "the WHOLE text→vector→near-dup loop on a text-only corpus: "
        "documents are embedded by the deterministic hashed-projection "
        "embedder (feature-hashed unigrams + md5 sign trick, dim 32 — "
        "one explode + one doc-keyed shuffle, exact integer components) "
        "and exact-cosine paired at ≥0.9, so the semantic family no "
        "longer depends on an external embeddings table. All five "
        "oracle-verified in one driver row ('cc' via recursive CTE)."
    ),
)
def sim_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    e = load_table(spark, sf_dir, "embeddings")
    exact = S.cosine_near_dup_pairs_blocked(e, threshold=0.45).select(
        F.lit("exact").alias("method"), "id_a", "id_b", "cos_sim"
    )
    # the lsh pair set feeds its own branch AND the CC iteration —
    # materialize once (small: only pairs >= threshold survive)
    lsh_pairs = S.cosine_near_dup_pairs_lsh(
        e, threshold=0.45, n_planes=4
    ).localCheckpoint(eager=False)
    lsh = lsh_pairs.select(
        F.lit("lsh").alias("method"), "id_a", "id_b", "cos_sim"
    )
    cc = connected_components(lsh_pairs).select(
        F.lit("cc").alias("method"),
        F.col("id").alias("id_a"),
        F.col("comp").alias("id_b"),
        F.lit(None).cast("double").alias("cos_sim"),
    )
    sd = S.semdedup(e, threshold=0.45, n_lists=16, iters=0).select(
        F.lit("semdedup").alias("method"),
        F.col("id").alias("id_a"),
        F.col("witness").alias("id_b"),
        "cos_sim",
    )
    # lazy checkpoint (r16): the blocked tile derivation references its
    # input TWICE (row side ∪ column side), which re-ran the whole
    # gram-md5 embedding aggregation — for a derived corpus the
    # materialize-vs-rescan trade goes the other way than for the cheap
    # columnar re-scans (adsb A/B, r15). Same-box interleaved A/B on
    # the full row: −6% median, stacking with the embedder's fan-out.
    hemb = (
        S.hashed_text_embeddings(
            load_table(spark, sf_dir, "documents"), dim=32
        )
        .filter(F.exists("embedding", lambda x: x != 0))
        .localCheckpoint(eager=False)
    )
    hp = S.cosine_near_dup_pairs_blocked(
        hemb, threshold=0.9, id_col="doc_id"
    ).select(F.lit("hembed").alias("method"), "id_a", "id_b", "cos_sim")
    return (
        exact.unionByName(lsh)
        .unionByName(cc)
        .unionByName(sd)
        .unionByName(hp)
        .orderBy("method", "id_a", "id_b")
    )
