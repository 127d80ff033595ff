"""Multimodal (image/audio/video) column plumbing.

Convention for 100 TB media pipelines: media travels as an opaque
``binary`` payload column plus a typed metadata struct; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by
row. The decode step itself is backend-pluggable:

- ``PillowBackend`` — real decoding; raises ``NotImplementedError`` here
  because the image/audio libs are not in this container (import-gated).
- ``FakeBackend`` — deterministic byte-arithmetic "decode" used by tests
  and the oracle-checked query: real Spark plumbing (schema, Arrow batch
  shape, partitioning), fake pixels.

Scale notes: payloads dominate partition size — ``repartition_by_bytes``
sizes partitions by cumulative payload bytes, not row count, so a task
neither OOMs on a few huge videos nor starves on thumbnails.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),   # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|jpeg|wav|mp4...
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


class PillowBackend:
    """Real image decode — requires PIL, absent in this container."""

    def __init__(self):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "image decode needs Pillow; install it on the cluster image"
            ) from exc

    def decode(self, payload: bytes) -> tuple[int, int]:  # pragma: no cover
        import io

        import PIL.Image

        with PIL.Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height

    def pixels(self, payload: bytes):  # pragma: no cover
        import io

        import numpy as np
        import PIL.Image

        with PIL.Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L")).ravel()


class FakeBackend:
    """Deterministic byte-arithmetic stand-in: width/height derived from
    the payload so tests (and the DuckDB oracle) can verify the plumbing
    end-to-end without a codec."""

    def decode(self, payload: bytes) -> tuple[int, int]:
        first = payload[0] if payload else 0
        return (first * 7) % 512, (len(payload) * 13) % 512

    def pixels(self, payload: bytes):
        """Luminance stream for perceptual hashing: the raw payload
        bytes ARE the fake pixels, so a small byte perturbation is a
        small pixel perturbation — exactly the property the blockhash
        needs to make planted near-dups meaningful in tests."""
        import numpy as np

        return np.frombuffer(payload, dtype=np.uint8)


def decode_media(media: DataFrame, backend=None) -> DataFrame:
    """mapInPandas decode: binary column in, dimensions out. Arrow moves
    whole batches of payload bytes; Python touches each payload once."""
    be = backend or FakeBackend()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [be.decode(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


def repartition_by_bytes(media: DataFrame, *, target_bytes: int = 128 << 20) -> DataFrame:
    """Partition so each task sees ~target_bytes of payload: salt by
    cumulative-size bucket rather than row count.

    Contract note: the ``agg(sum)`` below is a deliberate driver-side
    action at plan-build time — one scalar from a map-side-combined scan,
    the same cost class as the sampling job ``repartitionByRange``
    schedules. Callers composing lazy pipelines should invoke this once,
    not inside a per-batch loop."""
    sized = media.withColumn("_sz", F.coalesce(F.octet_length("payload"), F.lit(0)))
    total = sized.agg(F.sum("_sz")).first()[0] or 0
    n = max(1, int(total / target_bytes))
    return sized.repartition(n, F.col("media_id")).drop("_sz")


def sample_frames(media: DataFrame, *, every_n: int = 10, backend=None) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_idx, frame_payload) rows. The splitter is the backend's job;
    the fake backend slices the payload into `every_n` byte chunks."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.IntegerType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = payload or b""
                for i, start in enumerate(range(0, len(p), every_n)):
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(p[start : start + every_n]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_bytes": sizes})

    return media.mapInPandas(batches, out_schema)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
    ]
)


def resize_media(media: DataFrame, *, max_side: int = 256, backend=None) -> DataFrame:
    """Resize plumbing: decode dimensions (backend), compute the
    aspect-preserving target box capped at ``max_side``. The pixel
    transform itself is the backend's job (Pillow `thumbnail` on a real
    cluster image); here only the geometry travels, which is what the
    downstream schema needs. Arrow-batched like decode_media — payload
    bytes cross into Python once per batch, never per row."""
    be = backend or FakeBackend()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, ows, ohs = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h = be.decode(payload if payload is not None else b"")
                side = max(w, h, 1)
                scale = min(1.0, max_side / side)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                ows.append(max(1, int(w * scale)))
                ohs.append(max(1, int(h * scale)))
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs,
                 "out_width": ows, "out_height": ohs}
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def extract_features(media: DataFrame, *, dim: int = 8) -> DataFrame:
    """Feature-extraction plumbing: (media_id, feature array<double>).

    The deterministic stand-in embedding is the byte-value histogram
    folded mod ``dim`` and L1-normalized — a pure function of the
    payload, so tests can pin exact vectors and the output composes
    directly with the similarity operators (knn_bruteforce / ann_lsh /
    cosine_near_dup take any (id, array<double>) DataFrame). On a real
    cluster image the body of ``embed`` is the model call; the Spark
    side — Arrow batching, schema, byte-budget partitioning upstream —
    is identical."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def embed(p: bytes) -> list[float]:
        counts = [0] * dim
        for b in p:
            counts[b % dim] += 1
        total = max(sum(counts), 1)
        return [c / total for c in counts]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [
                        embed(p if p is not None else b"") for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(batches, out_schema)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), True),
    ]
)

PHASH_BITS = 64


def perceptual_hash(media: DataFrame, *, backend=None) -> DataFrame:
    """64-bit blockhash-style perceptual fingerprint per media row
    (Yang et al. 2006 "Block Mean Value Based Image Perceptual Hashing";
    the pHash family). The backend's luminance stream is split into 64
    equal blocks; bit i = (mean(block_i) > median of the 64 block
    means), so by construction half the bits are set and a LOCAL pixel
    perturbation flips only the bits of the blocks it touches — visually
    near-identical media land within a few bits of Hamming distance.

    Arrow-batched ``mapInPandas``: payload bytes cross into Python once
    per batch and the per-row work is O(n_pixels) numpy. Empty/NULL
    payloads hash to 0 (an all-equal block-mean vector has no
    above-median blocks), kept rather than dropped so the caller decides
    their fate. Emits (media_id, phash int64) — the 64-bit word travels
    as a signed long; only XOR/popcount/band-slicing ever touch it, all
    sign-agnostic."""
    import numpy as np

    be = backend or FakeBackend()

    def one(p: bytes) -> int:
        px = be.pixels(p)
        if px.size == 0:
            return 0
        # pad to a multiple of 64 by wrapping, so every block is non-empty
        if px.size < PHASH_BITS:
            px = np.tile(px, -(-PHASH_BITS // px.size))
        means = np.array(
            [b.mean() for b in np.array_split(px.astype(np.float64), PHASH_BITS)]
        )
        bits = means > np.median(means)
        word = np.uint64(0)
        for i, b in enumerate(bits):
            if b:
                word |= np.uint64(1) << np.uint64(i)
        return int(word.view(np.int64))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [one(p if p is not None else b"") for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(batches, PHASH_SCHEMA)


def media_dedup_edges(
    media: DataFrame,
    *,
    backend=None,
    max_hamming: int = 3,
    bands: int = 4,
    max_band_freq: int | None = None,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Duplicate-graph edges (id_a, id_b) for a binary media corpus —
    the media stage of the curation funnel (operators/curation.py
    ``media_col``): exact payload-md5 groups contribute (representative,
    member) star edges, the perceptual-hash banded-Hamming join
    contributes near-dup pair edges. NULL payloads contribute NOTHING —
    md5(NULL) is NULL (never equi-joins) and they are filtered before
    hashing, so docs without media can't be glued into one cluster by a
    shared sentinel hash (empty payloads all hash to phash 0 but are
    byte-identical, so collapsing them is correct).

    Scale shape: the exact pass is one groupBy + semi-join on 16-byte
    md5 keys (star edges, not the freq² clique); the near-dup pass is
    the banded equi-join with its hot-band valve. Payload bytes cross
    into Python once (Arrow) for hashing and never enter a shuffle."""
    m = media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    ).filter(F.col("payload").isNotNull())
    fps = m.select(F.col("media_id").alias("id"), F.md5("payload").alias("__fp"))
    reps = fps.groupBy("__fp").agg(F.min("id").alias("__rep"))
    exact_edges = (
        fps.join(reps, "__fp")
        .filter(F.col("id") != F.col("__rep"))
        .select(F.col("__rep").alias("id_a"), F.col("id").alias("id_b"))
    )
    near_edges = phash_near_dup(
        perceptual_hash(m, backend=backend),
        max_hamming=max_hamming,
        bands=bands,
        max_band_freq=max_band_freq,
    ).select("id_a", "id_b")
    return exact_edges.unionByName(near_edges)


def phash_band_keys(
    hashes: DataFrame,
    *,
    bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """(id, phash, bkey): one row per (hash, band) with the band index
    and 16-bit band value combined into ONE equi-join key
    ``bkey = band · 2^width + band_value`` — the probe/store key of the
    streaming phash band index (streaming/curation.py). A single long
    key (instead of the (band, bv) pair) lets the stored side be
    bucketed on exactly the join key, so per-batch probes co-locate
    without re-shuffling the store — the same physics as the
    fingerprint store's 16-byte key. Same pigeonhole contract as
    :func:`phash_near_dup`: two hashes within ``max_hamming < bands``
    bits must share at least one whole band, i.e. at least one bkey."""
    if not 0 < bands <= PHASH_BITS or PHASH_BITS % bands:
        raise ValueError(f"bands must divide {PHASH_BITS}")
    width = PHASH_BITS // bands
    mask = (1 << width) - 1
    bvals = F.array(
        *[
            F.shiftrightunsigned(F.col("phash"), b * width)
            .bitwiseAND(F.lit(mask))
            .cast("long")
            + F.lit(b * (mask + 1)).cast("long")
            for b in range(bands)
        ]
    )
    return (
        hashes.select(
            F.col(id_col).alias("id"), F.col(hash_col).alias("phash")
        )
        .select("id", "phash", F.explode(bvals).alias("bkey"))
    )


def phash_near_dup(
    hashes: DataFrame,
    *,
    max_hamming: int = 3,
    bands: int = 4,
    max_band_freq: int | None = None,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Near-duplicate media pairs by Hamming distance on perceptual
    hashes, without an O(n²) comparison: the 64-bit hash is sliced into
    ``bands`` equal sub-words and two hashes within ``max_hamming`` bits
    MUST agree on at least one whole band (pigeonhole: ``max_hamming <
    bands`` differing bits cannot touch every band), so an exact
    equi-join on (band_idx, band_val) produces a candidate superset and
    ``bit_count(a XOR b)`` verifies exactly. Returns
    (id_a, id_b, hamming), id_a < id_b.

    Scale shape (100 TB): the band join is the only corpus-sized
    exchange and it is an equi-join keyed on (band, 16-bit value) — the
    same banded-LSH physics as the MinHash text path, with the same
    skew valve: a band value carried by more than ``max_band_freq``
    media rows (flat-color thumbnails, letterboxed frames) is dropped
    from candidate generation before the self-join, bounding fan-out at
    freq² per key; degenerate constant media are each other's exact
    dups and the md5 family catches them instead. Everything past the
    Arrow-batched hashing is JVM-side codegen — XOR, bit_count and the
    band slices are built-in long expressions."""
    if not 0 < bands <= PHASH_BITS or PHASH_BITS % bands:
        raise ValueError(f"bands must divide {PHASH_BITS}")
    if max_hamming >= bands:
        raise ValueError(
            "pigeonhole guarantee needs max_hamming < bands "
            f"(got {max_hamming} >= {bands})"
        )
    width = PHASH_BITS // bands
    mask = (1 << width) - 1
    h = hashes.select(F.col(id_col).alias("id"), F.col(hash_col).alias("h"))
    band_vals = F.array(
        *[
            F.shiftrightunsigned(F.col("h"), b * width).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ]
    )
    banded = h.select("id", "h", F.posexplode(band_vals).alias("band", "bv"))
    if max_band_freq is not None:
        # hot-band valve: drop band keys carried by too many rows before
        # the self-join (freq² fan-out); a ≤max_hamming pair loses its
        # guarantee only if EVERY shared band is hot, i.e. it sits in a
        # mega-cluster the exact-dup family already collapses
        hot = (
            banded.groupBy("band", "bv")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > int(max_band_freq))
            .select("band", "bv")
        )
        banded = banded.join(hot, ["band", "bv"], "left_anti")
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            on=[
                F.col("x.band") == F.col("y.band"),
                F.col("x.bv") == F.col("y.bv"),
                F.col("x.id") < F.col("y.id"),
            ],
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.h").alias("ha"),
            F.col("y.h").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
    ).filter(F.col("hamming") <= int(max_hamming))
