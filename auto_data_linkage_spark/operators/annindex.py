"""Persisted ANN index: build the IVF-PQ artifacts ONCE, store them as
a directory, and serve top-k from the stored index in any later
session — the amortization a 100 TB corpus demands (encoding 10¹⁰
vectors is a full corpus pass; queries should not pay it again).

Index layout under ``path/``:

- ``coded/`` — the PQ-coded corpus ``(neighbor_id, codes, __cn)``
  written ``partitionBy(cell)``: a probe of ``nprobe`` cells becomes a
  PARQUET PARTITION-PRUNED scan (only the probed ``cell=N/``
  directories are read — the on-disk analog of the in-memory cell
  equi-join, plan-tested);
- ``centroids/`` — the ``(cell, centroid)`` routing table (tiny,
  broadcast at query time);
- ``index.json`` — codebooks + parameters (m, n_codewords, dims,
  column names, row/cell counts).

Serving reuses :func:`similarity._ivfpq_score` — the SAME plan as the
inline :func:`similarity.ivfpq_topk`, so the stored index returns
bit-identical results (tested), and ``rerank_factor`` works whenever
the caller still has the true-vector corpus.

No reference analogue (the reference has no ANN surface) — LLM-brief
scope, Spark-first: every artifact is a parquet table or a JSON
literal; no sidecar services, no custom file formats.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION = 1


@dataclass
class AnnIndex:
    """Handle to a loaded index: lazy DataFrames + literal codebooks."""

    meta: dict
    centroids: DataFrame
    coded: DataFrame


def build_ann_index(
    corpus: DataFrame,
    path: str,
    *,
    m: int = 8,
    n_codewords: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
    dim: int | None = None,
) -> dict:
    """One corpus pass → stored index. Centroids are the per-cell
    means of the existing ``cell_col`` labels (swap in
    :func:`similarity.kmeans_centroids` + ``assign_cells`` upstream
    for learned cells); codebooks are the deterministic md5-rank
    sampled PQ codebooks. Returns the metadata dict (also written to
    ``index.json``)."""
    from auto_data_linkage_spark.operators.similarity import (
        _pq_recon_norm,
        build_centroids,
        pq_codebooks,
        pq_encode,
    )

    local = path[7:] if path.startswith("file://") else path
    os.makedirs(local, exist_ok=True)

    cents = build_centroids(corpus, vec_col=vec_col, cell_col=cell_col, dim=dim)
    cbs = pq_codebooks(
        corpus, m=m, n_codewords=n_codewords, vec_col=vec_col, id_col=id_col
    )
    coded = pq_encode(
        corpus, cbs, vec_col=vec_col, id_col=id_col, keep=(cell_col,)
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("cell"),
        "codes",
        _pq_recon_norm(cbs).alias("__cn"),
    )
    coded.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(local, "coded")
    )
    cents.write.mode("overwrite").parquet(os.path.join(local, "centroids"))

    spark = corpus.sparkSession
    n_rows, n_cells = (
        spark.read.parquet(os.path.join(local, "coded"))
        .agg(F.count("*"), F.count_distinct("cell"))
        .first()
    )
    meta = {
        "version": _VERSION,
        "m": m,
        "n_codewords": n_codewords,
        "vec_col": vec_col,
        "id_col": id_col,
        "cell_col": cell_col,
        "codebooks": cbs,
        "n_rows": int(n_rows),
        "n_cells": int(n_cells),
    }
    with open(os.path.join(local, "index.json"), "w") as f:
        json.dump(meta, f)
    return meta


def append_ann_index(delta: DataFrame, path: str) -> dict:
    """Incremental index growth: encode ONLY the delta with the STORED
    codebooks and append its coded rows to ``coded/`` — new corpus
    batches join the index without re-encoding what's already there
    (the same delta-only contract as ``incremental_dedup_docs`` /
    ``incremental_update``). Cells and codebooks stay fixed: a delta
    that shifts the embedding distribution degrades recall gradually
    (standard IVF practice — monitor and rebuild when cell sizes
    skew); the routing table still covers every cell, so correctness
    of the ADC scores is unaffected. Delta rows must carry the same
    ``vec_col``/``id_col``/``cell_col`` columns the index was built
    with; ids are NOT dedup-checked against the stored rows (dedup
    upstream). Returns the updated metadata."""
    from auto_data_linkage_spark.operators.similarity import (
        _pq_recon_norm,
        pq_encode,
    )

    local = path[7:] if path.startswith("file://") else path
    meta_path = os.path.join(local, "index.json")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("version") != _VERSION:
        raise ValueError(
            f"unsupported ann-index version {meta.get('version')!r}"
        )
    cbs = meta["codebooks"]
    coded = pq_encode(
        delta,
        cbs,
        vec_col=meta["vec_col"],
        id_col=meta["id_col"],
        keep=(meta["cell_col"],),
    ).select(
        F.col(meta["id_col"]).alias("neighbor_id"),
        F.col(meta["cell_col"]).alias("cell"),
        "codes",
        _pq_recon_norm(cbs).alias("__cn"),
    )
    coded.write.mode("append").partitionBy("cell").parquet(
        os.path.join(local, "coded")
    )
    spark = delta.sparkSession
    n_rows, n_cells = (
        spark.read.parquet(os.path.join(local, "coded"))
        .agg(F.count("*"), F.count_distinct("cell"))
        .first()
    )
    meta["n_rows"], meta["n_cells"] = int(n_rows), int(n_cells)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def ann_index_sink(path: str):
    """``foreachBatch`` sink folding each micro-batch of vectors into
    the persisted index via :func:`append_ann_index` — continuous
    embedding ingestion (the streaming analog of
    ``streaming.documents.upsert_sink``). The index must already exist
    (:func:`build_ann_index` on the initial corpus). Replays of a
    micro-batch after a failure append duplicate coded rows — point a
    checkpointLocation at the query and dedup ids upstream, the same
    caveat as every append-mode foreachBatch sink.

    Usage::

        stream.writeStream.foreachBatch(ann_index_sink("/idx"))
              .option("checkpointLocation", ckpt).start()
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_ann_index(batch_df, path)

    return _sink


def load_ann_index(spark: SparkSession, path: str) -> AnnIndex:
    local = path[7:] if path.startswith("file://") else path
    with open(os.path.join(local, "index.json")) as f:
        meta = json.load(f)
    if meta.get("version") != _VERSION:
        raise ValueError(
            f"unsupported ann-index version {meta.get('version')!r}"
        )
    return AnnIndex(
        meta=meta,
        centroids=spark.read.parquet(os.path.join(local, "centroids")),
        coded=spark.read.parquet(os.path.join(local, "coded")),
    )


def ann_index_topk(
    index: AnnIndex,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    rerank_factor: int = 0,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Top-k from the STORED index — identical plan (and results) to
    the inline :func:`similarity.ivfpq_topk`, except the coded side is
    the partition-pruned parquet scan instead of a fresh encode. Pass
    ``corpus`` (true vectors) to enable ``rerank_factor``."""
    from auto_data_linkage_spark.operators.similarity import _ivfpq_score

    return _ivfpq_score(
        index.coded,
        index.centroids,
        index.meta["codebooks"],
        queries,
        k=k,
        nprobe=nprobe,
        vec_col=index.meta["vec_col"],
        id_col=index.meta["id_col"],
        rerank_factor=rerank_factor,
        corpus=corpus,
    )
