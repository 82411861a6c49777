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


def documents_as_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic VALID-PNG media table keyed off an id column: payload
    is a synth_png whose dimensions are a pure function of the id, plus a
    declared per-media frame count (the video-ish metadata the sampling
    plan consumes). Because payloads are real PNGs, decode_features returns
    identical values whether the codec is the header-parse fake or PIL —
    the query wiring is codec-invariant by construction."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def _png_udf(ids: pd.Series) -> pd.Series:
        return ids.map(
            lambda i: synth_png(int(i) % 16 + 1, int(i) % 12 + 1, int(i) % 251)
        )

    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        _png_udf(F.col(id_col)).alias("payload"),
        F.lit("image/png").alias("mime"),
        ((F.col(id_col) % 7 + 1) * 4).cast("long").alias("n_frames"),
    ).withColumn("n_bytes", F.octet_length("payload").cast("long"))


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


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → bands


def synth_png(width: int, height: int, seed: int = 0) -> bytes:
    """A VALID minimal 8-bit RGB PNG built from the public spec with stdlib
    zlib/struct only — signature, IHDR, one zlib IDAT of filter-0
    scanlines, IEND, correct CRCs. Pixel bytes are a deterministic function
    of (x, y, seed), so payloads are reproducible without a codec. Any real
    decoder (PIL) reads back exactly (width, height, 3 channels), which is
    what makes the strict and non-strict decode paths agree on this data."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x * 31 + y * 17 + seed) % 256 for x in range(width * 3))
        for y in range(height)
    )
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_header_decode(payload: bytes) -> tuple[int, int, int]:
    """Codec-free PNG header parse: IHDR width/height are the 8 big-endian
    bytes after the chunk header (offsets 16-24), color type at offset 25.
    Returns exactly what a real decoder returns for a well-formed PNG."""
    import struct

    w, h = struct.unpack(">II", payload[16:24])
    return w, h, _PNG_CHANNELS.get(payload[25], 3)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic codec-free decode: a well-formed PNG is read from its
    header (agreeing with a real codec); anything else gets byte-derived
    dimensions so batch shapes/schemas stay testable on arbitrary blobs."""
    if payload[:8] == PNG_SIGNATURE and len(payload) >= 26:
        return _png_header_decode(payload)
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
