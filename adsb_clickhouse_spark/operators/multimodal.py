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


class FakeBackend:
    """Deterministic byte-arithmetic stand-in: width/height derived from
    the payload so tests (and the DuckDB oracle) can verify the plumbing
    end-to-end without a codec."""

    def decode(self, payload: bytes) -> tuple[int, int]:
        first = payload[0] if payload else 0
        return (first * 7) % 512, (len(payload) * 13) % 512


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
