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


# ------------------------------------------- media → vector family wiring
_EMBED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def byte_histogram_embedder(dim: int = 64):
    """The deterministic FAKE embedder (test/oracle slot): embeds a blob
    as its byte-value histogram folded into ``dim`` buckets
    (``count of bytes b with b % dim == i``). Fully reproducible, exactly
    mirrorable in SQL, and similarity-meaningful enough for tests:
    identical blobs → identical vectors (cosine 1), near-identical blobs
    → near-identical histograms."""

    def emb(blobs: list[bytes]) -> np.ndarray:
        rows = []
        for blob in blobs:
            b = np.frombuffer(bytes(blob), dtype=np.uint8)
            rows.append(
                np.bincount(b % dim, minlength=dim).astype(np.float64)
            )
        return np.stack(rows) if rows else np.zeros((0, dim))

    return emb


def embed_media(
    df: DataFrame,
    embedder=None,
    *,
    dim: int = 64,
    id_col: str = "media_id",
    content_col: str = "content",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Pluggable Arrow-batched media-embedding hook — the bridge from
    multimodal blobs into the vector operator family (ANN search via
    ``similarity.ivf_topk``/``ivfpq_topk``, near-dup via
    ``dedup.embedding_dup_pairs``, semantic dedup, decontamination).

    ``embedder`` is the REAL-MODEL slot: any callable
    ``list[bytes] -> np.ndarray[n, dim]`` — e.g. a CLIP image encoder
    (decode via PIL, batch through the model) plugged in unchanged;
    the default is :func:`byte_histogram_embedder`, the deterministic
    fake this container can run and DuckDB can mirror exactly.

    Plan shape: one narrow ``mapInPandas`` projection — blobs never
    shuffle; only ``(id, dim-float vector)`` rows leave the scan, so
    everything downstream shuffles vectors, not media bytes. Batch size
    is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set
    it low for multi-MB blobs). ``passthrough`` columns ride the batch
    through unchanged — a join-free way to keep scan-computed metadata
    (bands, labels) attached to the vectors.
    """
    fn = embedder or byte_histogram_embedder(dim)
    extra = list(passthrough)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf[content_col]]
            mat = fn(blobs)
            out = {
                "media_id": pdf[id_col].astype("int64"),
                "embedding": [list(map(float, row)) for row in mat],
            }
            for c in extra:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    in_cols = [F.col(id_col), F.col(content_col)] + [F.col(c) for c in extra]
    schema = T.StructType(
        list(_EMBED_SCHEMA.fields)
        + [df.schema[c] for c in extra]
    )
    return df.select(*in_cols).mapInPandas(run, schema)


def media_near_dup(
    df: DataFrame,
    embedder=None,
    *,
    dim: int = 64,
    threshold: float = 0.95,
    band: str = "cell",
    n_cells: int = 16,
    kmeans_iter: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Image/media near-duplicate pairs: embed (pluggable hook above),
    band, then cosine-verify within bands — the CLIP-style near-dup
    composition over multimodal columns. Returns
    ``(media_id_l, media_id_r, cosine)`` with ``cosine ≥ threshold``.

    Banding (``band``):

    - ``"cell"`` (default): IVF cells over the EMBEDDING
      (:func:`similarity.kmeans_centroids` + cell assignment) — real
      near-duplicate images almost never share a byte length (any
      re-encode/resize/metadata change shifts it), so similarity-space
      cells are the banding that actually recalls them; pair space is
      Σ cell², the :func:`dedup.embedding_dup_pairs` contract. A pair
      straddling a cell boundary is missed — the standard IVF recall
      trade; raise ``n_cells`` quality via ``kmeans_iter``/``seed`` or
      band on a coarser label. Embeddings are materialized once
      (``localCheckpoint``) so the k-means passes never re-read blobs;
      at 100 TB persist the embedding table explicitly instead.
    - ``"length"``: blob byte length — zero extra passes, exact-dup
      recall only; the cheap fast path (and the SQL-expressible one
      the DuckDB oracle pins).
    - any other string: a column of ``df`` to band on (labels, source
      buckets, a precomputed cell id).
    """
    from auto_data_linkage_spark.operators.dedup import embedding_dup_pairs

    if band == "cell":
        from auto_data_linkage_spark.operators.similarity import (
            assign_cells,
            kmeans_centroids,
        )

        vecs = embed_media(
            df.select("media_id", "content"), embedder, dim=dim
        ).localCheckpoint(eager=True)
        cents = kmeans_centroids(
            vecs,
            k=n_cells,
            max_iter=kmeans_iter,
            vec_col="embedding",
            id_col="media_id",
            seed=seed,
        )
        banded = assign_cells(
            vecs, cents, vec_col="embedding", cell_col="__band"
        )
        bucket = "__band"
    elif band == "length":
        base = df.select(
            "media_id", "content", F.length("content").alias("__band")
        )
        # the band rides THROUGH the embed batch (passthrough) instead
        # of joining back on media_id afterwards — one exchange fewer
        banded = embed_media(base, embedder, dim=dim, passthrough=("__band",))
        bucket = "__band"
    else:
        banded = embed_media(
            df.select("media_id", "content", band), embedder, dim=dim,
            passthrough=(band,),
        )
        bucket = band
    return embedding_dup_pairs(
        banded,
        vec_col="embedding",
        id_col="media_id",
        bucket_col=bucket,
        threshold=threshold,
    ).select(
        F.col("media_id_l"), F.col("media_id_r"), F.col("cosine")
    )
