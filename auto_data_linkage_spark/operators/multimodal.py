"""Multimodal column plumbing: image / audio / video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The container has no image/audio codecs, so the actual decode step is
stubbed two ways (SURVEY/driver contract):

- :func:`decode_image` raises ``NotImplementedError`` unless a decoder
  (PIL) is importable — the real-library slot.
- :func:`fake_decode_stats` is a deterministic stand-in that derives
  "pixel" statistics from the raw bytes, so the Spark-side plumbing —
  schema, batching, partitioning, UDF signature — is fully real and
  testable.

Design for 100 TB: media bytes never shuffle. Every operator is a
``mapInPandas`` projection (narrow, per-partition); joins/aggregations
happen on the extracted *features*, never the blobs. Batch size is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low (e.g. 64)
for multi-MB blobs to keep Arrow batches in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # the real decoder slot; absent in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synthesize_media_table(
    spark, df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Build a media-shaped table from any source table: payload bytes as
    the opaque blob + plausible typed metadata. Used because the driver
    testdata has no binary tables; the schema is the contract."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(payload_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("image/png").alias("mime"),
            (F.length(payload_col) % 640 + 32).cast("int").alias("width"),
            (F.length(payload_col) % 480 + 32).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def decode_image(df: DataFrame) -> DataFrame:
    """REAL decode slot: decode image bytes → (width, height, mode).
    Raises ``NotImplementedError`` when no codec library is available
    (clearly-marked stub per the build contract)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow, which is not installed in "
            "this container; use fake_decode_stats for the plumbing path"
        )
    # pragma: no cover — exercised only where pillow exists
    import io

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mode", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                img = Image.open(io.BytesIO(blob))
                rows.append((mid, img.width, img.height, img.mode))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "mode"])

    return df.select("media_id", "content").mapInPandas(run, schema)


def fake_decode_stats(df: DataFrame) -> DataFrame:
    """Deterministic decode stand-in: per blob, compute byte-level
    statistics (count, sha256, mean, entropy) plus metadata passthrough.
    Exercises the exact mapInPandas plumbing a real decoder uses —
    Arrow batch in, feature DataFrame out — with reproducible values."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob, w, h in zip(
                pdf["media_id"], pdf["content"], pdf["width"], pdf["height"]
            ):
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                counts = np.bincount(b, minlength=256).astype(np.float64)
                p = counts[counts > 0] / max(len(b), 1)
                entropy = float(-(p * np.log2(p)).sum()) if len(b) else 0.0
                out.append(
                    (
                        int(mid),
                        int(len(b)),
                        hashlib.sha256(bytes(blob)).hexdigest(),
                        float(b.mean()) if len(b) else 0.0,
                        round(entropy, 6),
                        int(w),
                        int(h),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_bytes",
                    "sha256",
                    "mean_byte",
                    "byte_entropy",
                    "width",
                    "height",
                ],
            )

    flat = df.select(
        "media_id", "content", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(run, _STATS_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: expand each media row into the frame
    timestamps a decoder would extract (``sequence`` built-in — no UDF).
    The decode of each frame is the stubbed step; the partition-preserving
    expansion and schema are the real contract."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize slot: decode → resample → re-encode via PIL. Raises
    ``NotImplementedError`` without a codec (clearly-marked stub per the
    build contract); the Arrow plumbing lives in :func:`fake_resize`."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image resize requires PIL/pillow, which is not installed in "
            "this container; use fake_resize for the plumbing path"
        )
    import io  # pragma: no cover — exercised only where pillow exists

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                img = Image.open(io.BytesIO(blob)).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                rows.append((mid, buf.getvalue(), width, height))
            yield pd.DataFrame(
                rows, columns=["media_id", "content", "width", "height"]
            )

    return df.select("media_id", "content").mapInPandas(run, _RESIZE_SCHEMA)


def fake_resize(df: DataFrame, width: int, height: int) -> DataFrame:
    """Deterministic resize stand-in with REAL resampling math: the blob
    is viewed as a grayscale pixel grid of its metadata dimensions
    (truncated/zero-padded), nearest-neighbor resampled to
    (width, height) with the same index arithmetic a real decoder-side
    resize performs, and re-emitted as bytes. Exercises the full
    contract — binary in, binary out, metadata updated, blobs never
    shuffled (narrow mapInPandas projection)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob, w, h in zip(
                pdf["media_id"], pdf["content"], pdf["w"], pdf["h"]
            ):
                w = max(int(w or 1), 1)
                h = max(int(h or 1), 1)
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                grid = np.zeros(w * h, dtype=np.uint8)
                grid[: min(len(b), w * h)] = b[: w * h]
                grid = grid.reshape(h, w)
                yi = (np.arange(height) * h) // height
                xi = (np.arange(width) * w) // width
                resized = grid[yi][:, xi]
                rows.append((int(mid), resized.tobytes(), width, height))
            yield pd.DataFrame(
                rows, columns=["media_id", "content", "width", "height"]
            )

    flat = df.select(
        "media_id",
        "content",
        F.col("meta.width").alias("w"),
        F.col("meta.height").alias("h"),
    )
    return flat.mapInPandas(run, _RESIZE_SCHEMA)


def dedup_media_exact(df: DataFrame) -> DataFrame:
    """Exact media dedup on content hash — same recipe as text exact dedup;
    the blob never shuffles, only (hash, id)."""
    hashed = df.select(
        "media_id", F.sha2(F.col("content"), 256).alias("sha256")
    )
    keep = hashed.groupBy("sha256").agg(F.min("media_id").alias("media_id"))
    return df.join(keep.select("media_id"), "media_id", "left_semi")
