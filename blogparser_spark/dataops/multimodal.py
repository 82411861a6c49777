"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A training-data pipeline carries image/audio/video as `binary` columns with
a typed metadata struct alongside. The Spark-side machinery here — schemas,
partition-friendly batch iteration, Arrow-batched mapInPandas with bounded
batch memory — is real and tested; the actual codec work is STUBBED because
the sandbox has no image/audio libraries:

  - decode_image_stub raises NotImplementedError("image codec not available")
    when strict=True, and produces a deterministic fake (dimensions/channels
    derived from the byte content) when strict=False so the downstream
    plumbing is exercisable in tests.

Scale notes: mapInPandas streams Arrow batches, so a 100 TB binary column
never materializes per-executor beyond spark.sql.execution.arrow
.maxRecordsPerBatch rows; per-file-group partitioning keeps one media file's
frames co-located. Feature extraction output is columnar (struct/array), so
downstream filters prune without touching the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("magic", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table from a text table (sandbox stand-in): the
    UTF-8 bytes are the opaque payload; real deployments read binary files
    via spark.read.format('binaryFile') with the identical schema."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions from byte content. Stands in
    for a real codec so batch shapes/schemas are testable without PIL."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, 3


def codec_available() -> bool:
    """True iff a real image codec (PIL) is importable in this environment."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_decode(payload: bytes) -> tuple[int, int, int]:
    """Real codec path, used when strict=True and PIL is present."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height, len(im.getbands())


def decode_features(
    df: DataFrame, strict: bool = False, embed_dim: int = 8
) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    strict=True is the production path: it requires a real codec (PIL) and
    FAILS AT THE OPERATOR BOUNDARY — plan-construction time — when none is
    importable, so a 100 TB job never launches tasks just to discover the
    executors can't decode. strict=False uses the deterministic fake
    (tests, plumbing)."""
    if strict and not codec_available():
        raise NotImplementedError(
            "decode_features(strict=True) needs an image codec (PIL), which is "
            "not available in this environment; use strict=False for the "
            "deterministic fake decode"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, c = _pil_decode(b) if strict else _fake_decode(b)
                digest = hashlib.md5(b).digest()
                emb = [
                    round(digest[i] / 255.0, 6) for i in range(embed_dim)
                ]
                rows.append(
                    {
                        "media_id": media_id,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "magic": b[:4].hex(),
                        "embedding": emb,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video payloads: emits (media_id, frame_idx)
    rows for frames to decode — pure native explode, the decode itself goes
    through decode_features. Sampling density is a pushed-down filter, so the
    blob column is only read for sampled frames' file groups."""
    n_frames = (F.col("n_bytes") / 1024).cast("int") + 1  # fake frame count
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_n == 0)
