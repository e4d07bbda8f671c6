"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB: media bytes travel as a ``binary`` column with a
typed ``meta`` struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages so each task streams batches
without materializing a partition in memory. Partitioning: media rows
are fat — ``repartition`` by id before the decode stage to spread bytes,
and keep decode output narrow (features, not pixels) so downstream
shuffles move features only.

The actual codec step is STUBBED (no image/audio libs in this
container): ``decode_stub=True`` derives deterministic fake
width/height/duration from the payload bytes; ``decode_stub=False``
raises NotImplementedError where a real pillow/ffmpeg call would go.
The Spark-side plumbing — schema, batch iteration, UDF signatures — is
real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("source_uri", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("content_hash", StringType(), False),
])


def documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    multimodal plumbing is exercisable on the driver's testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("source_uri"),
    )


def _decode_batch(pdf: "pd.DataFrame", stub: bool) -> "pd.DataFrame":
    import hashlib

    import pandas as pd

    if not stub:
        # Real implementation would dispatch on kind:
        #   image -> PIL.Image.open(io.BytesIO(b)) -> size
        #   audio/video -> ffprobe duration, sample frames
        raise NotImplementedError("media codecs not available in this environment")

    payloads = pdf["payload"]
    n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
    digest = payloads.map(
        lambda b: hashlib.sha256(b if b is not None else b"").hexdigest()
    )
    # deterministic fake dimensions derived from content
    h16 = digest.map(lambda d: int(d[:8], 16))
    width = (h16 % 1920) + 1
    height = (h16 // 1920 % 1080) + 1
    duration = (h16 % 600000)
    is_image = pdf["kind"] == "image"
    return pd.DataFrame({
        "media_id": pdf["media_id"],
        "kind": pdf["kind"],
        "n_bytes": n_bytes.astype("int64"),
        "width": width.where(is_image).astype("Int64"),
        "height": height.where(is_image).astype("Int64"),
        "duration_ms": duration.where(~is_image).astype("Int64"),
        "content_hash": digest,
    })


def extract_media_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode/feature-extract stage as Arrow-batched mapInPandas."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield _decode_batch(pdf, stub=decode_stub)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("payload", BinaryType(), True),
    StructField("width", LongType(), False),
    StructField("height", LongType(), False),
])


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, decode_stub: bool = True
) -> DataFrame:
    """Resize stage (the training-pipeline normalization step) as
    Arrow-batched mapInPandas. Stub mode emits a deterministic payload
    digest sized ``width*height//64`` bytes in place of real pixels (a
    real build calls PIL ``Image.resize`` here); schema/batching/
    partitioning are the real production shape — fat rows in, fat rows
    out, so run it AFTER any repartition that spreads payload bytes."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("image codecs not available in this environment")
            n = max(1, width * height // 64)

            def fake_pixels(b: bytes | None) -> bytes:
                seed = hashlib.sha256(b or b"").digest()
                return (seed * (n // len(seed) + 1))[:n]

            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": pdf["payload"].map(fake_pixels),
                "width": width,
                "height": height,
            })

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("frame_payload", BinaryType(), True),
])


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame —
    mapInPandas here is a flat map (output rows != input rows), which is
    why this is a mapInPandas stage and not a scalar UDF. Stub mode
    derives a deterministic frame count from the payload digest (a real
    build seeks with ffmpeg at ``every_ms`` steps)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("video codecs not available in this environment")
            out: list[dict] = []
            for _, row in pdf.iterrows():
                digest = hashlib.sha256(row["payload"] or b"").digest()
                duration_ms = int.from_bytes(digest[:4], "big") % 600000
                n = min(max_frames, max(1, duration_ms // every_ms))
                for i in range(n):
                    out.append({
                        "media_id": row["media_id"],
                        "frame_idx": i,
                        "ts_ms": i * every_ms,
                        "frame_payload": digest + i.to_bytes(4, "big"),
                    })
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "ts_ms", "frame_payload"])

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
