"""Multimodal-plumbing queries: documents' text bytes stand in for media
payloads. Tagged union (registry packing, see COVERAGE.md):

- branch='decode': the mapInPandas decode stage (Arrow binary batches)
  verified end-to-end against byte arithmetic the oracle reproduces in
  SQL.
- branch='phash': the banded-Hamming near-dup join
  (operators/multimodal.py phash_near_dup) over synthetic 64-bit hashes
  derived SQL-side IDENTICALLY in both engines (md5 → 60-bit int, planted
  near-dups via XOR of small shift masks, plus sign-bit-set NEGATIVE
  hashes), verified against a DuckDB BRUTE-FORCE bit_count(xor) twin
  that uses no band slicing at all — so the pigeonhole candidate
  generation, the band shifts (shiftrightunsigned over signed longs),
  and the XOR/popcount verify are falsifiable by the gate (round-8
  verdict #1: this was the only first-class operator whose join logic
  the gate could not falsify).
- branch='phash_valve': the hot-band skew valve — a planted
  constant-hash mega-cluster is priced away at max_band_freq while
  planted near-dup survivors outside it are kept; the oracle mirrors the
  valve semantics in SQL (band explode → hot-key anti-join → candidate
  join → exact verify) over positive-only hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texttools import duck_md5_long, md5_long
from ..operators.multimodal import FakeBackend, decode_media, phash_near_dup
from . import load_table, register

# twin ids sit far above any doc_id (documents tops out ~5e3 at sf0.1)
_OFF1 = 10_000_000
_OFF2 = 20_000_000
_MIN_LONG = -9223372036854775808
# arbitrary positive < 2^60: the planted mega-cluster's constant hash
_CLUSTER_H = 406552035003370666
_VALVE_CAP = 25

# per-class XOR masks, derived from doc_id identically in both engines:
#   %10==0 → 1 bit   (must match at max_hamming=3)
#   %10==1 → ≤3 bits (must match; shift collisions only reduce the count)
#   %10==2 → 5 bits  (must NOT match)
#   %10==6 → 2 bits on a sign-bit-set NEGATIVE base hash (must match)
_MASK_1 = "shiftleft(CAST(1 AS BIGINT), CAST(did % 60 AS INT))"
_MASK_3 = (
    "shiftleft(CAST(1 AS BIGINT), CAST(did % 60 AS INT)) | "
    "shiftleft(CAST(1 AS BIGINT), CAST((did * 7 + 13) % 60 AS INT)) | "
    "shiftleft(CAST(1 AS BIGINT), CAST((did * 31 + 5) % 60 AS INT))"
)
_MASK_5 = "shiftleft(CAST(31 AS BIGINT), CAST(did % 55 AS INT))"
_MASK_2 = "shiftleft(CAST(3 AS BIGINT), CAST(did % 59 AS INT))"

# DuckDB spellings of the same masks (integer ops — exact in both)
_D_MASK_1 = "(CAST(1 AS BIGINT) << (did % 60))"
_D_MASK_3 = (
    "(CAST(1 AS BIGINT) << (did % 60)) | "
    "(CAST(1 AS BIGINT) << ((did * 7 + 13) % 60)) | "
    "(CAST(1 AS BIGINT) << ((did * 31 + 5) % 60))"
)
_D_MASK_5 = "(CAST(31 AS BIGINT) << (did % 55))"
_D_MASK_2 = "(CAST(3 AS BIGINT) << (did % 59))"


def _phash_corpora(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Synthetic (id, h) corpora from the documents table — the hashing
    step of a real phash pipeline replaced by SQL-derivable values so the
    JOIN (the part with correctness risk) is oracle-checkable. Returns
    (brute-force corpus, valve corpus)."""
    did = F.col("doc_id")
    h_md5 = md5_long(F.col("text"))
    h = F.when(did % 10 == 6, h_md5.bitwiseOR(F.lit(_MIN_LONG))).otherwise(h_md5)
    b = d.select(did.alias("did"), did.alias("id"), h.alias("h"))
    mask = (
        F.when(F.col("did") % 10 == 0, F.expr(_MASK_1))
        .when(F.col("did") % 10 == 1, F.expr(_MASK_3))
        .when(F.col("did") % 10 == 2, F.expr(_MASK_5))
        .otherwise(F.expr(_MASK_2))
    )
    twins = b.filter((F.col("did") % 10).isin(0, 1, 2, 6)).select(
        (F.col("id") + _OFF1).alias("id"),
        F.col("h").bitwiseXOR(mask).alias("h"),
    )
    c1 = b.filter(F.col("did") % 10 != 3).select("id", "h").unionByName(twins)

    surv = b.filter(F.col("did") % 10 == 4)
    c2 = (
        b.filter(F.col("did") % 10 == 3)
        .select("id", F.lit(_CLUSTER_H).alias("h"))
        .unionByName(surv.select("id", "h"))
        .unionByName(
            surv.select(
                (F.col("id") + _OFF2).alias("id"),
                F.col("h").bitwiseXOR(F.expr(_MASK_1)).alias("h"),
            )
        )
    )
    return c1, c2


@register(
    "mm_decode_metadata",
    f"""
    WITH dec AS (
      SELECT doc_id AS media_id,
             octet_length(encode(text)) AS n_bytes,
             (ascii(substr(text, 1, 1)) * 7) % 512 AS width,
             (octet_length(encode(text)) * 13) % 512 AS height
      FROM documents
    ),
    b AS (
      SELECT doc_id AS did, doc_id AS id,
             CASE WHEN doc_id % 10 = 6
                  THEN {duck_md5_long('text')} | CAST(-9223372036854775808 AS BIGINT)
                  ELSE {duck_md5_long('text')} END AS h
      FROM documents
    ),
    c1 AS (
      SELECT id, h FROM b WHERE did % 10 <> 3
      UNION ALL
      SELECT id + {_OFF1},
             xor(h, CASE did % 10
                      WHEN 0 THEN {_D_MASK_1}
                      WHEN 1 THEN {_D_MASK_3}
                      WHEN 2 THEN {_D_MASK_5}
                      ELSE {_D_MASK_2} END)
      FROM b WHERE did % 10 IN (0, 1, 2, 6)
    ),
    p1 AS (
      -- brute force: no band slicing at all — the independent check of
      -- the Spark side's pigeonhole candidate generation
      SELECT x.id AS id_a, y.id AS id_b,
             CAST(bit_count(xor(x.h, y.h)) AS INTEGER) AS hamming
      FROM c1 x JOIN c1 y ON x.id < y.id
      WHERE bit_count(xor(x.h, y.h)) <= 3
    ),
    c2 AS (
      SELECT id, CAST({_CLUSTER_H} AS BIGINT) AS h FROM b WHERE did % 10 = 3
      UNION ALL
      SELECT id, h FROM b WHERE did % 10 = 4
      UNION ALL
      SELECT id + {_OFF2}, xor(h, {_D_MASK_1}) FROM b WHERE did % 10 = 4
    ),
    banded AS (
      SELECT id, h, t.band, (h >> CAST(t.band * 16 AS INTEGER)) & 65535 AS bv
      FROM c2, range(4) t(band)
    ),
    hot AS (
      SELECT band, bv FROM banded GROUP BY band, bv HAVING count(*) > {_VALVE_CAP}
    ),
    cold AS (SELECT banded.* FROM banded ANTI JOIN hot USING (band, bv)),
    p2 AS (
      SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
      FROM (SELECT DISTINCT x.id AS id_a, y.id AS id_b, x.h AS ha, y.h AS hb
            FROM cold x JOIN cold y
              ON x.band = y.band AND x.bv = y.bv AND x.id < y.id)
      WHERE bit_count(xor(ha, hb)) <= 3
    )
    SELECT 'decode' AS branch, media_id, n_bytes, width, height,
           CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
           CAST(NULL AS INTEGER) AS hamming
    FROM dec
    UNION ALL
    SELECT 'phash', NULL, NULL, NULL, NULL, id_a, id_b, hamming FROM p1
    UNION ALL
    SELECT 'phash_valve', NULL, NULL, NULL, NULL, id_a, id_b, hamming FROM p2
    ORDER BY branch, media_id, id_a, id_b
    """,
    doc=(
        "Multimodal tagged union. branch='decode': binary media column → "
        "mapInPandas decode (Arrow-batched, backend-pluggable; "
        "deterministic FakeBackend here, Pillow on a real cluster image); "
        "oracle reproduces the fake decode in SQL. branch='phash': "
        "phash_near_dup's banded-Hamming join over synthetic md5-derived "
        "64-bit hashes (planted 1/≤3/5-bit XOR twins, plus negative "
        "sign-bit-set hashes) against a BRUTE-FORCE bit_count(xor) oracle "
        "with no banding — candidate generation, signed band slicing and "
        "popcount verify are all falsifiable. branch='phash_valve': the "
        "max_band_freq skew valve prices away a planted constant-hash "
        "mega-cluster while near-dup survivors outside it are kept; "
        "oracle mirrors the valve in SQL over positive-only hashes "
        "(DuckDB >> is arithmetic — the sign-bit regime is covered by "
        "the brute-force branch instead)."
    ),
)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
    )
    dec = decode_media(media, FakeBackend()).select(
        F.lit("decode").alias("branch"),
        "media_id",
        "n_bytes",
        "width",
        "height",
        F.lit(None).cast("long").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.lit(None).cast("int").alias("hamming"),
    )
    c1, c2 = _phash_corpora(d)

    def tag(pairs: DataFrame, t: str) -> DataFrame:
        return pairs.select(
            F.lit(t).alias("branch"),
            F.lit(None).cast("long").alias("media_id"),
            F.lit(None).cast("int").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            "id_a",
            "id_b",
            F.col("hamming").cast("int").alias("hamming"),
        )

    p1 = phash_near_dup(c1, max_hamming=3, bands=4, id_col="id", hash_col="h")
    p2 = phash_near_dup(
        c2,
        max_hamming=3,
        bands=4,
        max_band_freq=_VALVE_CAP,
        id_col="id",
        hash_col="h",
    )
    return (
        dec.unionByName(tag(p1, "phash"))
        .unionByName(tag(p2, "phash_valve"))
        .orderBy("branch", "media_id", "id_a", "id_b")
    )
