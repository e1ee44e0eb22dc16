"""One-call corpus maintenance — the cron job as a function.

A corpus snapshot store accumulates commits; its registered consumer
indexes (:mod:`.sync` records them under ``corpus-sync:<index path>``
in the corpus meta) lag behind; generations fragment; ANN codebooks
drift; manifest logs grow. Each concern has a policy primitive built
in rounds 11–13 — this module composes them into the single
maintenance pass an operator schedules:

1. DISCOVER the consumer indexes from the corpus's own registry
   (:func:`..sources.corpusstore.registered_sync_cursors`) — no
   side-channel inventory to keep in sync;
2. SYNC each index from the commit log (O(Δ); lex or ANN auto-detected
   from the index meta), applying ``compact_over`` fragmentation
   bounds and the ANN ``rebuild_over`` drift-triggered refresh;
3. COMPACT the corpus itself past ``compact_over`` files/partition;
4. CHECKPOINT each manifest log so the audit trail survives file
   reclamation, then VACUUM — the corpus vacuum is consumer-aware by
   default (a consumer this pass somehow missed still blocks it).

Every step is the library primitive, not a reimplementation; a step
that raises aborts the pass loudly (partial maintenance is safe — all
steps are independently idempotent and crash-safe by the underlying
protocol). Returns a report dict per store.

No reference analogue; the composition mirrors what a Delta/Iceberg
shop schedules as OPTIMIZE + VACUUM + MV refresh jobs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..sources import corpusstore as C
from . import annindex as A
from . import lexindex as L
from . import manifestfs as M
from .sync import sync_ann_index, sync_lex_index

__all__ = ["maintain_corpus"]


def _index_kind(path: str) -> str | None:
    """'lex' / 'ann' from the index's stored meta; None when the path
    no longer holds a readable index (a retired consumer whose store
    was deleted without :func:`..sources.corpusstore.
    unregister_corpus_consumer`)."""
    try:
        meta = M.read_manifest(path)["meta"]
    except FileNotFoundError:
        if not os.path.exists(os.path.join(M.local_path(path), "index.json")):
            return None
        import json

        with open(os.path.join(M.local_path(path), "index.json")) as f:
            meta = json.load(f)
    if "text_col" in meta:
        return "lex"
    if "vec_col" in meta:
        return "ann"
    return None


def maintain_corpus(
    spark: SparkSession,
    corpus_path: str,
    *,
    compact_over: int = 8,
    rebuild_over: float | None = None,
    keep_versions: int = 2,
    min_age_seconds: float = 3600.0,
    checkpoint: bool = True,
) -> dict:
    """Run the full maintenance pass over ``corpus_path`` and every
    consumer index its registry names. Parameters map 1:1 onto the
    underlying policies: ``compact_over`` (files per partition/bucket/
    cell before compaction, corpus and indexes alike), ``rebuild_over``
    (ANN drift threshold — None disables the refresh),
    ``keep_versions``/``min_age_seconds`` (the shared vacuum retention;
    the corpus vacuum additionally floors at the registered cursors),
    ``checkpoint`` (write a manifest-log checkpoint before each vacuum
    so history survives the reclamation).

    Returns ``{"synced": {index: sync-result}, "skipped": [paths whose
    store is gone — unregister them], "corpus": {"compacted": ...,
    "vacuum": ...}, "index_vacuum": {index: ...}}``."""
    report: dict = {"synced": {}, "skipped": [], "index_vacuum": {}}
    prefix = "corpus-sync:"
    for key in sorted(C.registered_sync_cursors(corpus_path)):
        idx = key[len(prefix):]
        kind = _index_kind(idx)
        if kind is None:
            # retired consumer with a dead store: report, never guess —
            # deleting its registration is a human decision
            # (unregister_corpus_consumer)
            report["skipped"].append(idx)
            continue
        if kind == "lex":
            out = sync_lex_index(
                spark, corpus_path, idx, compact_over=compact_over
            )
        else:
            out = sync_ann_index(
                spark, corpus_path, idx,
                rebuild_over=rebuild_over, compact_over=compact_over,
            )
        report["synced"][idx] = out
        if M.is_manifest_store(idx):
            if checkpoint:
                M.checkpoint_manifest_log(idx)
            report["index_vacuum"][idx] = M.vacuum(
                idx,
                keep_manifests=keep_versions,
                min_age_seconds=min_age_seconds,
            )
    compacted = C.compact_corpus_snapshot(
        spark, corpus_path, max_files_per_partition=compact_over
    )
    if checkpoint:
        M.checkpoint_manifest_log(corpus_path)
    vac = C.vacuum_corpus_snapshot(
        corpus_path,
        keep_manifests=keep_versions,
        min_age_seconds=min_age_seconds,
    )
    report["corpus"] = {"compacted": compacted, "vacuum": vac}
    return report
