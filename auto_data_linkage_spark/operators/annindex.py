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

Two storage layouts, chosen at build time and auto-detected after
(identical contract to :mod:`.lexindex` — see its docstring):
``layout="manifest"`` (default; immutable ``gen=N`` dirs +
one-JSON-commit manifests, :mod:`.manifestfs`: zero renames →
object-store-safe, atomic deletes and whole-store cutover,
snapshot-pinned readers, explicit :func:`vacuum_ann_index`) or
``layout="rename"`` (opt-in; in-place ``cell=N`` dirs, two-rename
swap + load-time repair, single-writer POSIX fast path).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import manifestfs as M
from .lexindex import _mask_tombstoned
from .storefs import repair_swept_dirs, swap_dir

_VERSION = 1


def repair_ann_index(path: str) -> dict:
    """Crash-repair sweep for torn :func:`compact_ann_index` swaps:
    restore any ``cell=N__old`` whose live dir is missing, drop
    completed-swap leftovers and scratch trees (see
    :mod:`.storefs` for the crash states). One ``listdir`` when the
    index is healthy — ran automatically by :func:`load_ann_index` and
    at the start of every compaction, callable directly after a known
    crash. A manifest-layout store has no torn states (uncommitted
    generations are invisible) — no-op there; reclamation is
    :func:`vacuum_ann_index`. Returns
    ``{"restored": [...], "removed": [...]}``."""
    from .storefs import repair_swapped_dir

    if M.is_manifest_store(path):
        return {"restored": [], "removed": []}
    local = _local(path)
    # whole-index rebuild swap first (restores a parked index whose
    # promotion crashed; does NOT touch a sibling __rebuild tree — an
    # in-progress rebuild may legitimately be writing there)
    out = repair_swapped_dir(local)
    coded = os.path.join(local, "coded")
    swept = repair_swept_dirs(coded, tmp_roots=(coded + "__compact",))
    out["restored"] += swept["restored"]
    out["removed"] += swept["removed"]
    return out


def _local(path: str) -> str:
    return path[7:] if path.startswith("file://") else path


def _write_meta(local: str, meta: dict) -> None:
    """Atomic index.json update: write a temp file and os.replace() it
    (the PosixCommitStore.replace pattern — sources/layout.py). A crash
    mid-write, or a concurrent load_ann_index / ann_index_sink reader,
    therefore always sees either the old or the new complete JSON,
    never a torn/empty file. ``generation`` increments on every edit so
    readers can detect staleness cheaply."""
    meta["generation"] = int(meta.get("generation", 0)) + 1
    target = os.path.join(local, "index.json")
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, target)


@dataclass
class AnnIndex:
    """Handle to a loaded index: lazy DataFrames + literal codebooks.
    ``tombstones`` is the deleted-ids mask (``None`` when nothing was
    ever deleted) — see :func:`delete_from_ann_index`."""

    meta: dict
    centroids: DataFrame
    coded: DataFrame
    tombstones: DataFrame | None = None


def _sq8_coded(
    df: DataFrame, *, vec_col: str, id_col: str, cell_col: str
) -> DataFrame:
    """SQ8 coded rows ``(neighbor_id, cell, codes, __cn)``: cosine is
    scale-invariant (see :func:`similarity.sq8_topk`), so the index
    stores int8 codes and the CODE norm — no scale, no codebooks, and
    the ENCODING never depends on build-time state. The cell ROUTING
    still does (build-time centroids place every row), which is why
    SQ8 indexes carry the routing-drift accounting like every other
    codec — see :func:`ann_drift`."""
    from auto_data_linkage_spark.operators.similarity import (
        norm_expr,
        quantize_int8,
    )

    q, _scale = quantize_int8(F.col(vec_col))
    return df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("cell"),
        q.alias("codes"),
    ).withColumn("__cn", norm_expr(F.col("codes")))


def _pq_recon_err(
    df: DataFrame, cbs, *, vec_col: str, id_col: str
) -> float | None:
    """Mean RELATIVE QUANTIZATION ERROR of ``df`` under the codebooks:
    ``||v − recon(v)||² / ||v||²`` averaged over rows, where recon is
    the PQ reconstruction (nearest codeword per subspace). ~0 is
    lossless; it RISES monotonically as the embedding distribution
    moves outside the hull the codebooks were trained on (the standard
    IVF/PQ staleness signal — note a cosine-based fidelity is NOT
    monotone here: a scaled/sign-flipped delta can cosine-align with
    extreme codewords while its ADC scores are garbage, which is why
    the error form is used). Expanded JVM-side as
    ``(||v||² − 2·v·r + ||r||²) / ||v||²`` — one codegen pass (encode +
    literal-array codeword lookups, no join, no UDF) + one aggregate;
    zero-norm rows are excluded; None on an empty frame. Cost is one
    extra encode of ``df`` — O(corpus) once at build, O(delta) per
    append."""
    from auto_data_linkage_spark.operators.similarity import (
        _pq_adc_dot,
        _pq_recon_norm,
        norm_expr,
        pq_encode,
    )

    coded = pq_encode(df, cbs, vec_col=vec_col, id_col=id_col, keep=(vec_col,))
    vn2 = norm_expr(F.col(vec_col)) ** 2
    rn2 = _pq_recon_norm(cbs) ** 2
    err = (vn2 - 2.0 * _pq_adc_dot(cbs, qvec_col=vec_col) + rn2) / vn2
    row = (
        coded.select(err.alias("__e"))
        .where(F.col("__e").isNotNull())
        .agg(F.avg("__e"))
        .first()
    )
    return None if row[0] is None else float(row[0])


def ann_drift(meta: dict) -> float | None:
    """Distribution drift of the APPENDED generations vs the build —
    the max of two row-weighted signals, each accumulated in the same
    atomic commit as the append's data:

    - **quantization drift** (PQ codec only): ``mean(appended recon
      error) − build recon error`` (``err_sum``/``err_rows`` vs
      ``recon_err``) — rising means ADC scores are degrading;
    - **routing drift** (EVERY codec, SQ8 included): ``mean(appended
      1 − cos(v, centroid(assigned cell))) − the build corpus's same
      measure`` (``route_sum``/``route_rows`` vs ``route_err``) —
      rising means the build-time centroids no longer fit the data, so
      probe recall degrades even when the codes themselves are exact.
      This is why SQ8 indexes need the signal: their int8 codes are
      self-contained (encoding cannot drift), but their IVF cell
      assignment is still pinned to build-time centroids.

    0.0 = appends fit the build distribution; positive = it has moved
    — schedule a rebuild (or let ``sync_ann_index(rebuild_over=...)``
    trigger one). None when unmeasurable: a pre-metric index or no
    appends yet.

    Row-weighting makes the signal STABLE but also means a long history
    of in-distribution appends dilutes fresh drift (400 good rows +
    200 shifted rows read as one third of the shifted rows' own
    drift) — size ``rebuild_over`` for the diluted value, or watch
    ``meta["last_err"]`` / ``meta["last_route_err"]`` (the most recent
    append's errors, persisted alongside) for an undiluted
    early-warning signal."""
    signals = []
    if meta.get("recon_err") is not None and meta.get("err_rows"):
        signals.append(
            float(meta["err_sum"]) / int(meta["err_rows"])
            - float(meta["recon_err"])
        )
    if meta.get("route_err") is not None and meta.get("route_rows"):
        signals.append(
            float(meta["route_sum"]) / int(meta["route_rows"])
            - float(meta["route_err"])
        )
    if not signals:
        return None
    return max(0.0, max(signals))


def _route_err(
    df: DataFrame, cents: DataFrame | None, *, vec_col: str, cell_col: str
) -> float | None:
    """Mean ROUTING ERROR of ``df`` against the cell centroids:
    ``1 − cos(v, centroid(assigned cell))`` averaged over rows — the
    codec-INDEPENDENT staleness signal (cell routing always uses the
    build-time centroids, whatever the codes are). ~0 on tight
    geometry-aligned cells; RISES as the embedding distribution moves
    away from the centroids the index was built with, i.e. exactly
    when probe recall starts to decay. All JVM-side: one broadcast
    join against the (tiny) centroid table + one aggregate, no UDF.
    Zero-norm vectors/centroids are excluded; None on an empty frame
    or a missing routing table. Cost is O(rows) — one extra pass of
    the build corpus at build time, O(delta) per append."""
    from auto_data_linkage_spark.operators.similarity import (
        cosine_from_norms,
        norm_expr,
    )

    if cents is None:
        return None
    c = F.broadcast(
        cents.select(
            F.col("cell").alias("__rcell"),
            F.col("centroid").alias("__cent"),
            norm_expr(F.col("centroid")).alias("__ctn"),
        )
    )
    j = (
        df.select(
            F.col(cell_col).alias("__rcell"),
            F.col(vec_col).alias("__v"),
            norm_expr(F.col(vec_col)).alias("__vn"),
        )
        .join(c, "__rcell")
        .where((F.col("__vn") > 0) & (F.col("__ctn") > 0))
    )
    row = (
        j.select(
            (
                1.0
                - cosine_from_norms(
                    F.col("__v"), F.col("__cent"),
                    F.col("__vn"), F.col("__ctn"),
                )
            ).alias("__e")
        )
        .agg(F.avg("__e"))
        .first()
    )
    return None if row[0] is None else float(row[0])


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
    codec: str = "pq",
    n_cells: int | None = None,
    kmeans_iter: int = 5,
    seed: int = 0,
    layout: str = "manifest",
    _expected_version: int = 0,
) -> dict:
    """One corpus pass → stored index. Centroids are the per-cell
    means of the existing ``cell_col`` labels; codebooks are the
    deterministic md5-rank sampled PQ codebooks. Returns the metadata
    dict (also written to ``index.json``).

    ``n_cells`` LEARNS the routing cells instead of requiring a label
    column: k-means (:func:`similarity.kmeans_centroids`, deterministic
    farthest-first init) clusters the corpus and every row is assigned
    its nearest centroid before encoding — the unlabeled-corpus path,
    so a raw embedding table can build an index in one call.

    ``codec`` picks the compression rung: ``"pq"`` (default, 8-byte
    codes — smallest scan, approximate scores) or ``"sq8"`` (int8
    per-dimension codes — 4× smaller than floats at ~full recall,
    scored scale-invariantly; ``m``/``n_codewords`` are ignored).

    ``layout`` defaults to ``"manifest"`` (immutable generations + a
    manifest log — atomic commits, exactly-once sinks, time travel,
    object-store-safe); ``layout="rename"`` opts into the in-place
    single-writer POSIX layout (:mod:`.lexindex` module docstring for
    the trade). Existing stores auto-detect their layout."""
    if codec not in ("pq", "sq8"):
        raise ValueError(f"codec must be 'pq' or 'sq8', got {codec!r}")
    if layout not in ("rename", "manifest"):
        raise ValueError(f"layout must be 'rename' or 'manifest', got {layout!r}")
    from auto_data_linkage_spark.operators.similarity import (
        _pq_recon_norm,
        assign_cells,
        build_centroids,
        kmeans_centroids,
        pq_codebooks,
        pq_encode,
    )

    local = _local(path)
    os.makedirs(local, exist_ok=True)

    if n_cells is not None:
        learned = kmeans_centroids(
            corpus, k=n_cells, max_iter=kmeans_iter, vec_col=vec_col,
            id_col=id_col, seed=seed,
        )
        cell_col = "__cell"
        corpus = assign_cells(
            corpus, learned, vec_col=vec_col, cell_col=cell_col
        )
    cents = build_centroids(corpus, vec_col=vec_col, cell_col=cell_col, dim=dim)
    # routing-drift baseline (codec-INDEPENDENT): how well the build
    # corpus fits its own routing centroids; appends accumulate
    # route_sum/route_rows against it — see ann_drift. Computed over
    # the corpus ONCE at build (broadcast join + one aggregate).
    route_err = _route_err(corpus, cents, vec_col=vec_col, cell_col=cell_col)
    recon_err = None
    if codec == "sq8":
        # SQ8 codes are self-contained — no drift baseline needed
        cbs = None
        coded = _sq8_coded(
            corpus, vec_col=vec_col, id_col=id_col, cell_col=cell_col
        )
    else:
        cbs = pq_codebooks(
            corpus, m=m, n_codewords=n_codewords, vec_col=vec_col,
            id_col=id_col,
        )
        # drift baseline: how well the build corpus itself encodes
        # under these codebooks (ann_drift compares appends against it)
        recon_err = _pq_recon_err(corpus, cbs, vec_col=vec_col, id_col=id_col)
        coded = pq_encode(
            corpus, cbs, vec_col=vec_col, id_col=id_col, keep=(cell_col,)
        ).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(cell_col).alias("cell"),
            "codes",
            _pq_recon_norm(cbs).alias("__cn"),
        )
    if layout == "manifest":
        gc_ = M.next_gen(path, "coded")
        gn = M.next_gen(path, "centroids")
        coded_dir = os.path.join(local, "coded", gc_)
        cents_dir = os.path.join(local, "centroids", gn)
    else:
        coded_dir = os.path.join(local, "coded")
        cents_dir = os.path.join(local, "centroids")
    coded = coded.withColumn("__seq", F.lit(1))
    coded.write.mode("overwrite").partitionBy("cell").parquet(coded_dir)
    cents.write.mode("overwrite").parquet(cents_dir)

    spark = corpus.sparkSession
    stats_src = spark.read.option(
        "basePath", os.path.dirname(coded_dir) if layout == "manifest" else coded_dir
    ).parquet(coded_dir)
    n_rows, cells = (
        stats_src.agg(F.count("*"), F.collect_set("cell")).first()
    )
    meta = {
        "version": _VERSION,
        "codec": codec,
        "m": m,
        "n_codewords": n_codewords,
        "vec_col": vec_col,
        "id_col": id_col,
        "cell_col": cell_col,
        "codebooks": cbs,
        "n_rows": int(n_rows),
        "n_cells": len(cells),
        # occupied-cell inventory: lets append_ann_index maintain
        # n_rows/n_cells from the DELTA alone instead of rescanning the
        # whole coded/ tree per append (O(delta), not O(index))
        "cells": sorted(cells),
        # id column's Spark type, so delete can cast tombstone ids even
        # when the coded table is empty (built from an empty corpus)
        "id_type": coded.schema["neighbor_id"].dataType.simpleString(),
        # mutation counter: appends stamp rows with seq+1, deletes cut
        # their tombstones at the current value — re-appended ids serve
        # their new rows (lexindex._mask_tombstoned)
        "seq": 1,
        # quantization-drift baseline (PQ only, None for sq8/empty):
        # mean relative quantization error of the build corpus; appends
        # accumulate err_sum/err_rows against it — see ann_drift
        "recon_err": recon_err,
        # routing-drift baseline (every codec, None only on an empty
        # build): mean 1−cos(v, assigned centroid) of the build corpus;
        # appends accumulate route_sum/route_rows against it
        "route_err": route_err,
    }
    if layout == "manifest":
        tables = M.add_gens(
            {}, "coded", M.written_parts(path, "coded", gc_), gc_
        )
        tables = M.add_gens(
            tables, "centroids", M.written_parts(path, "centroids", gn), gn
        )
        M.commit_manifest(
            path, tables=tables, meta=meta,
            expected_version=_expected_version,
        )
        return meta
    _write_meta(local, meta)
    return meta


def append_ann_index(
    delta: DataFrame, path: str, *, txn: tuple | None = None,
    _attempts: int = 3,
) -> dict:
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
    upstream). Delta cell labels ARE validated against the stored
    ``centroids/`` routing table — a row carrying an unknown cell would
    be appended but never probed (silently unreachable in every future
    search), so unknown cells raise. Returns the updated metadata.

    Cost is O(delta): row/cell counts update from one aggregate over
    the delta plus the occupied-cell inventory kept in ``index.json``
    — the full ``coded/`` tree is never rescanned (it used to be, which
    made the streaming sink pay an O(index) scan per micro-batch).

    Runs the torn-compaction sweep first: appending into a store whose
    cell is parked as ``__old`` would recreate the live dir, and the
    NEXT sweep would then mistake the parked original for a
    completed-swap leftover and drop it — repair-before-append closes
    that window."""
    from auto_data_linkage_spark.operators.similarity import (
        _pq_recon_norm,
        pq_encode,
    )

    local = _local(path)
    spark = delta.sparkSession
    manifest = M.is_manifest_store(path)
    if manifest:
        snap = M.read_manifest(path)
        meta = dict(snap["meta"])
        cents_df = M.read_table(spark, path, "centroids", snap)
    else:
        repair_ann_index(path)
        with open(os.path.join(local, "index.json")) as f:
            meta = json.load(f)
        cents_df = spark.read.parquet(os.path.join(local, "centroids"))
    if meta.get("version") != _VERSION:
        raise ValueError(
            f"unsupported ann-index version {meta.get('version')!r}"
        )
    if txn is not None and M.txn_version(meta, txn[0]) >= int(txn[1]):
        return meta  # this batch already committed: a checkpoint replay
    cbs = meta["codebooks"]
    cell_col = meta["cell_col"]

    if cell_col not in delta.columns:
        # learned-cells index (build_ann_index(n_cells=...)) or a delta
        # without labels: route each row to its nearest STORED centroid —
        # the same routing queries use, so appended rows are probed
        # exactly where a search will look for them
        from auto_data_linkage_spark.operators.similarity import (
            assign_cells,
        )

        cent_rows = sorted(
            cents_df.collect() if cents_df is not None else [],
            key=lambda r: r["cell"],
        )
        if not cent_rows:
            raise ValueError("index has no centroids; cannot route delta")
        idx_to_cell = F.array(*[F.lit(r["cell"]) for r in cent_rows])
        delta = (
            assign_cells(
                delta,
                [list(r["centroid"]) for r in cent_rows],
                vec_col=meta["vec_col"],
                cell_col="__cidx",
            )
            .withColumn(
                cell_col, F.element_at(idx_to_cell, F.col("__cidx") + 1)
            )
            .drop("__cidx")
        )
    n_delta, delta_cells = delta.agg(
        F.count("*"), F.collect_set(cell_col)
    ).first()
    if n_delta == 0:
        return meta
    routed = (
        {r["cell"] for r in cents_df.select("cell").collect()}
        if cents_df is not None
        else set()
    )
    unknown = sorted(set(delta_cells) - routed)
    if unknown:
        raise ValueError(
            f"delta carries {len(unknown)} cell label(s) absent from the "
            f"index routing table (first few: {unknown[:5]}); such rows "
            "could never be probed — re-assign cells against the stored "
            "centroids (similarity.assign_cells) or rebuild the index"
        )

    if meta.get("codec", "pq") == "sq8":
        # SQ8 codes are self-contained per vector — no stored state to
        # encode against, so the ENCODING cannot drift (no recon-error
        # accounting). The cell ROUTING still uses build-time
        # centroids, so the routing-drift accounting below applies.
        coded = _sq8_coded(
            delta,
            vec_col=meta["vec_col"],
            id_col=meta["id_col"],
            cell_col=cell_col,
        )
        err = None
    else:
        coded = pq_encode(
            delta,
            cbs,
            vec_col=meta["vec_col"],
            id_col=meta["id_col"],
            keep=(cell_col,),
        ).select(
            F.col(meta["id_col"]).alias("neighbor_id"),
            F.col(cell_col).alias("cell"),
            "codes",
            _pq_recon_norm(cbs).alias("__cn"),
        )
        # drift accounting (O(delta)): this append's mean relative
        # quantization error, row-weighted into the running err_sum/
        # err_rows the same atomic commit carries — ann_drift reads it
        err = (
            _pq_recon_err(
                delta, cbs, vec_col=meta["vec_col"], id_col=meta["id_col"]
            )
            if meta.get("recon_err") is not None
            else None
        )
    # routing-drift accounting (O(delta), every codec): this append's
    # mean 1−cos(v, assigned centroid), row-weighted into the running
    # route_sum/route_rows the same atomic commit carries — ann_drift
    # compares it against the build baseline
    rerr = (
        _route_err(
            delta, cents_df, vec_col=meta["vec_col"], cell_col=cell_col
        )
        if meta.get("route_err") is not None
        else None
    )
    seq_aware = "seq" in meta
    if seq_aware:
        coded = coded.withColumn("__seq", F.lit(int(meta["seq"]) + 1))
    if manifest:
        gc_ = M.next_gen(path, "coded")
        coded.write.partitionBy("cell").parquet(
            os.path.join(local, "coded", gc_)
        )
    else:
        coded.write.mode("append").partitionBy("cell").parquet(
            os.path.join(local, "coded")
        )
    if "cells" not in meta:
        # index written by a pre-inventory build (rename layout only —
        # manifest builds always record the inventory): seed the
        # occupied-cell list with one full scan (once), then stay
        # O(delta) forever
        meta["cells"] = [
            r["cell"]
            for r in spark.read.parquet(os.path.join(local, "coded"))
            .select("cell")
            .distinct()
            .collect()
        ]
        delta_cells = []
    if manifest:
        # merge-retry commit: the coded generation is already written
        # and immutable; losing the version race to a concurrent
        # append/delete/compaction only re-runs this manifest merge.
        # A concurrent rebuild changes the encode state (codebooks /
        # centroids) — our delta was encoded against the OLD state, so
        # that case is guarded and loud.
        cp = M.written_parts(path, "coded", gc_)
        orig = snap["meta"]

        def mutate(fresh: dict):
            fm = fresh["meta"]
            if txn is not None and M.txn_version(fm, txn[0]) >= int(txn[1]):
                # same-token concurrent writer won since the entry
                # check: merging would double-append — abort atomically
                # with the commit (see lexindex.append_lex_index)
                raise M.AlreadyApplied(fresh)
            # route_err is in the guard set because it is recomputed by
            # every rebuild — it catches a concurrent rebuild even on
            # SQ8 indexes, whose codebooks are None before AND after
            for k in ("version", "codec", "m", "n_codewords", "vec_col",
                      "id_col", "cell_col", "codebooks", "route_err"):
                if fm.get(k) != orig.get(k):
                    raise M.ManifestConflictError(
                        f"ann-index parameter {k!r} changed under this "
                        "append (concurrent rebuild?) — re-encode the "
                        "delta against the new index"
                    )
            if seq_aware and int(fm.get("seq", 0)) != int(orig.get("seq", 0)):
                # stale __seq stamp vs a possibly-interleaved delete:
                # restamp if any fresh cut covers our rows (see
                # lexindex.append_lex_index)
                tombs = M.read_table(spark, path, "tombstones", fresh)
                if tombs is not None and "as_of_seq" in tombs.columns:
                    mx = tombs.agg(F.max("as_of_seq")).first()[0]
                    if mx is not None and int(mx) >= int(
                        orig.get("seq", 0)
                    ) + 1:
                        from .lexindex import _RestampRequired

                        raise _RestampRequired()
            m2 = dict(fm)
            c2 = sorted(set(fm["cells"]) | set(delta_cells))
            m2["n_rows"] = int(fm["n_rows"]) + int(n_delta)
            m2["cells"] = c2
            m2["n_cells"] = len(c2)
            if seq_aware:
                m2["seq"] = int(fm.get("seq", 0)) + 1
            if err is not None:
                m2["err_sum"] = float(fm.get("err_sum", 0.0)) + err * int(
                    n_delta
                )
                m2["err_rows"] = int(fm.get("err_rows", 0)) + int(n_delta)
                m2["last_err"] = float(err)
            if rerr is not None:
                m2["route_sum"] = float(
                    fm.get("route_sum", 0.0)
                ) + rerr * int(n_delta)
                m2["route_rows"] = int(fm.get("route_rows", 0)) + int(
                    n_delta
                )
                m2["last_route_err"] = float(rerr)
            m2 = M.with_txn(m2, txn)
            return M.add_gens(fresh["tables"], "coded", cp, gc_), m2

        from .lexindex import _RestampRequired

        try:
            return M.commit_with_retry(path, mutate)["meta"]
        except M.AlreadyApplied as e:
            return dict(e.snapshot["meta"])
        except _RestampRequired:
            if _attempts <= 1:
                raise M.ManifestConflictError(
                    "this append keeps racing concurrent deletes whose "
                    "tombstone cuts cover its row stamps — serialize "
                    "the writers"
                ) from None
            return append_ann_index(
                delta, path, txn=txn, _attempts=_attempts - 1
            )
    cells = sorted(set(meta["cells"]) | set(delta_cells))
    meta["n_rows"] = int(meta["n_rows"]) + int(n_delta)
    meta["cells"] = cells
    meta["n_cells"] = len(cells)
    if seq_aware:
        meta["seq"] = int(meta["seq"]) + 1
    if err is not None:
        meta["err_sum"] = float(meta.get("err_sum", 0.0)) + err * int(n_delta)
        meta["err_rows"] = int(meta.get("err_rows", 0)) + int(n_delta)
        meta["last_err"] = float(err)
    if rerr is not None:
        meta["route_sum"] = float(meta.get("route_sum", 0.0)) + rerr * int(
            n_delta
        )
        meta["route_rows"] = int(meta.get("route_rows", 0)) + int(n_delta)
        meta["last_route_err"] = float(rerr)
    meta = M.with_txn(meta, txn)
    _write_meta(local, meta)
    return meta


def delete_from_ann_index(
    spark: SparkSession, path: str, ids, *, guard_txn: tuple | None = None
) -> dict:
    """Delete vectors from the stored index WITHOUT rewriting it — the
    dense mirror of :func:`lexindex.delete_from_lex_index` (takedowns,
    right-to-be-forgotten): a ``(neighbor_id)`` row appends to
    ``tombstones/`` and probes mask it before scoring, so
    deleted vectors never appear as neighbors and ranks recompute over
    the survivors. ``ids`` is a one-column DataFrame or a Python list.

    ``n_rows`` decrements exactly (one coded scan — ids are not the
    partition key, so batch deletions); the per-cell occupancy
    inventory stays an over-approximation (it only gates append
    accounting — documented there). Physical purge happens when
    compaction rewrites a cell; tombstones are SEQUENCE-AWARE (see
    lexindex._mask_tombstoned): a deleted id re-appended later serves
    its new rows — revisions are first-class; legacy pre-counter
    indexes keep the permanent mask, for which: do
    NOT re-use a deleted id in later appends. On sequence-aware
    stores, ids that are absent or already masked write NO tombstone
    (the early return keeps the mask proportional to rows actually
    deleted) — so a PRE-EMPTIVE delete of a never-appended id does not
    prevent a later append of that id from serving, and a re-appended
    id serves again; permanent takedowns must be enforced upstream
    (filter the ingest) rather than by tombstone. Returns
    ``{"deleted": n, "meta": updated-metadata}``.

    Crash window (stat drift only): a crash AFTER the tombstone append
    but BEFORE the meta write leaves ``n_rows`` overstated — the docs
    are correctly masked, but a retry anti-joins the now-present
    tombstones to empty (``n_del=0``, correctly no-ops the mask) and
    cannot recover the missed decrement. Probe results are unaffected
    (``n_rows`` gates nothing at query time); the drift heals at the
    next :func:`compact_ann_index`, which recounts the live rows
    exactly whenever a tombstone mask exists. Manifest layout: the
    tombstone batch and the decremented metadata land in ONE manifest
    commit — the delete is atomic, no drift is possible.

    Concurrency (manifest layout): a delete that loses the version
    race to another commit re-RUNS fully against the fresh snapshot
    (its counts were computed from the snapshot it read, so a racing
    append may have added rows with the very ids being deleted) — see
    :func:`manifestfs.retry_on_conflict`; the losing attempt's
    tombstone generation is a vacuumable orphan.

    ``guard_txn=(app_id, batch_id)`` — same conditional-delete contract
    as :func:`lexindex.delete_from_lex_index`: no-op when the fresh
    snapshot already carries the token (atomic with the commit via the
    version CAS + full re-run), closing the overlapping-sync
    re-cut-after-re-append race. Manifest layout only."""
    if M.is_manifest_store(path):
        return M.retry_on_conflict(
            lambda: _delete_ann_once(spark, path, ids, guard_txn=guard_txn)
        )
    return _delete_ann_once(spark, path, ids)


def _delete_ann_once(
    spark: SparkSession, path: str, ids, *, guard_txn: tuple | None = None
) -> dict:
    local = _local(path)
    manifest = M.is_manifest_store(path)
    if manifest:
        snap = M.read_manifest(path)
        meta = dict(snap["meta"])
        if guard_txn is not None and M.txn_version(
            meta, guard_txn[0]
        ) >= int(guard_txn[1]):
            # token already committed by another sync pass: cutting now
            # would mask its re-appended rows (see lexindex)
            return {"deleted": 0, "meta": meta, "skipped_txn": True}
        coded = M.read_table(spark, path, "coded", snap)
        tombs = M.read_table(spark, path, "tombstones", snap)
    else:
        repair_ann_index(path)
        with open(os.path.join(local, "index.json")) as f:
            meta = json.load(f)
        if guard_txn is not None and M.txn_version(
            meta, guard_txn[0]
        ) >= int(guard_txn[1]):
            # best-effort only on the rename layout (no atomic commit
            # to ride): syncs keep a single-concurrent-writer contract
            return {"deleted": 0, "meta": meta, "skipped_txn": True}
        coded = spark.read.parquet(os.path.join(local, "coded"))
        tomb_dir = os.path.join(local, "tombstones")
        tombs = (
            spark.read.parquet(tomb_dir)
            if os.path.isdir(tomb_dir)
            else None
        )
    if meta.get("version") != _VERSION:
        raise ValueError(
            f"unsupported ann-index version {meta.get('version')!r}"
        )
    if coded is not None:
        id_type = coded.schema["neighbor_id"].dataType
    else:
        # empty-corpus manifest store: no coded partitions were ever
        # written; the stored schema string still types the tombstone
        # mask so ids deleted now mask rows appended later
        id_type = meta.get("id_type", "string")
    if not isinstance(ids, DataFrame):
        from auto_data_linkage_spark.session import local_rows_df

        ids = local_rows_df(
            spark, [(i,) for i in ids], ["neighbor_id"]
        ).select(F.col("neighbor_id").cast(id_type))
    else:
        ids = ids.select(
            F.col(ids.columns[0]).cast(id_type).alias("neighbor_id")
        )
    ids = ids.distinct()
    seq_aware = "seq" in meta
    if seq_aware:
        # live view excludes earlier-masked rows; given ids are NOT
        # pre-filtered (a re-appended id needs a NEW tombstone at the
        # current counter)
        live = _mask_tombstoned(coded, tombs, id_col="neighbor_id")
    else:
        if tombs is not None:
            ids = ids.join(tombs, "neighbor_id", "left_anti")
        live = coded
    ids = ids.localCheckpoint(eager=True)
    live_hits = (
        live.join(ids, "neighbor_id", "left_semi").localCheckpoint(
            eager=True
        )
        if live is not None
        else None
    )
    n_del = live_hits.count() if live_hits is not None else 0
    if manifest:
        if ids.count() == 0 or (seq_aware and not n_del):
            # absent or already-masked ids need no new cut (a cut
            # masks nothing appended after it) — nothing to commit
            return {"deleted": 0, "meta": meta}
        gb = M.next_gen(path, "tombstones")
        out_ids = (
            live_hits.select("neighbor_id").distinct()
            .withColumn("as_of_seq", F.lit(int(meta["seq"])))
            if seq_aware
            else ids
        )
        out_ids.write.parquet(os.path.join(local, "tombstones", gb))
        tables = M.add_gens(
            snap["tables"], "tombstones",
            M.written_parts(path, "tombstones", gb), gb,
        )
        meta["n_rows"] = int(meta["n_rows"]) - int(n_del)
        M.commit_manifest(
            path, tables=tables, meta=meta, expected_version=snap["version"]
        )
        return {"deleted": int(n_del), "meta": meta}
    if seq_aware and not n_del:
        return {"deleted": 0, "meta": meta}
    out_ids = (
        live_hits.select("neighbor_id").distinct()
        .withColumn("as_of_seq", F.lit(int(meta["seq"])))
        if seq_aware
        else ids
    )
    out_ids.write.mode("append").parquet(tomb_dir)
    meta["n_rows"] = int(meta["n_rows"]) - int(n_del)
    _write_meta(local, meta)
    return {"deleted": int(n_del), "meta": meta}


def _heal_n_rows(spark: SparkSession, local: str, meta: dict) -> bool:
    """Heal ``n_rows`` drift in place: a delete that crashed between its
    tombstone append and its meta write left ``n_rows`` overstated, and
    retries anti-join to 0 so they cannot recover it (see
    :func:`delete_from_ann_index`). Whenever a tombstone mask exists,
    recount the live rows exactly (one neighbor_id-column scan — a
    maintenance-time cost, and only on indexes that ever saw a delete).
    Mutates ``meta`` and returns True when it did."""
    tomb_dir = os.path.join(local, "tombstones")
    if not os.path.isdir(tomb_dir):
        return False
    coded_dir = os.path.join(local, "coded")
    has_data = any(
        e.startswith("cell=") and os.path.isdir(os.path.join(coded_dir, e))
        for e in os.listdir(coded_dir)
    )
    live = 0
    if has_data:
        live = _mask_tombstoned(
            spark.read.parquet(coded_dir),
            spark.read.parquet(tomb_dir),
            id_col="neighbor_id",
        ).count()
    meta["n_rows"] = int(live)
    return True


def _cell_file_counts(local: str) -> dict[str, int]:
    """Parquet data-file count per ``cell=*/`` directory of ``coded/``."""
    coded = os.path.join(local, "coded")
    out: dict[str, int] = {}
    for entry in os.listdir(coded):
        cell_dir = os.path.join(coded, entry)
        if not (entry.startswith("cell=") and os.path.isdir(cell_dir)):
            continue
        out[entry] = sum(
            1 for f in os.listdir(cell_dir) if f.endswith(".parquet")
        )
    return out


def compact_ann_index(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_cell: int = 8,
    target_rows_per_file: int = 5_000_000,
) -> dict:
    """Rewrite over-fragmented cell directories of ``coded/`` into few
    large files — the index-side mirror of
    :func:`..sources.layout.compact_corpus`. Streaming ingestion via
    :func:`ann_index_sink` appends one small parquet file per cell per
    micro-batch, so without maintenance a long-running stream degrades
    every probe-time scan into thousands-of-tiny-files I/O.

    Only cells whose data-file count exceeds ``max_files_per_cell`` are
    rewritten (a cell-targeted parquet read; untouched cells are never
    scanned). Results are written to a sibling temp tree, then each
    rewritten cell directory is swapped in with two renames — atomic at
    cell granularity, the same contract compact_corpus documents. A
    crash between the renames is repaired by :func:`repair_ann_index`,
    which both this function and :func:`load_ann_index` run first.
    SINGLE WRITER + POSIX renames assumed — see :mod:`.storefs` (on
    object stores run compaction from a maintenance window; concurrent
    appends/reads during the swap are not safe). Codebooks and
    centroids are untouched; ``index.json`` is rewritten atomically
    with a bumped ``generation``. Returns a summary dict
    ``{cells_rewritten, files_before, files_after, rows_rewritten}``.
    Manifest layout: rewrites land in a fresh generation and every
    rewritten cell cuts over in one atomic manifest commit (pinned
    readers untouched; superseded generations reclaimed by
    :func:`vacuum_ann_index`).
    """
    import shutil

    if M.is_manifest_store(path):
        return _compact_manifest_ann(
            spark,
            path,
            max_files_per_cell=max_files_per_cell,
            target_rows_per_file=target_rows_per_file,
        )
    local = _local(path)
    with open(os.path.join(local, "index.json")) as f:
        meta = json.load(f)
    if meta.get("version") != _VERSION:
        raise ValueError(
            f"unsupported ann-index version {meta.get('version')!r}"
        )
    repair_ann_index(path)
    counts = _cell_file_counts(local)
    hot = sorted(e for e, n in counts.items() if n > max_files_per_cell)
    if not hot:
        if _heal_n_rows(spark, local, meta):
            _write_meta(local, meta)
        return {
            "cells_rewritten": 0,
            "files_before": sum(counts.values()),
            "files_after": sum(counts.values()),
            "rows_rewritten": 0,
        }
    coded_dir = os.path.join(local, "coded")
    tmp_root = os.path.join(local, "coded__compact")
    shutil.rmtree(tmp_root, ignore_errors=True)

    # read ONLY the hot cell directories (path-targeted scan; the cell
    # partition value comes back via basePath) and rewrite size-targeted
    df = (
        spark.read.option("basePath", coded_dir)
        .parquet(*[os.path.join(coded_dir, e) for e in hot])
    )
    tomb_dir = os.path.join(local, "tombstones")
    if os.path.isdir(tomb_dir):
        # physical purge of deleted rows in the rewritten cells (probe
        # results unchanged — the tombstone anti-join already masked
        # them); the mask stays for the unrewritten cells.
        df = _mask_tombstoned(
            df, spark.read.parquet(tomb_dir), id_col="neighbor_id"
        )
    rows = df.count()
    files = max(1, -(-rows // target_rows_per_file))  # ceil
    (
        df.repartition(files, "cell")
        .sortWithinPartitions("cell", "neighbor_id")
        .write.option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy("cell")
        .parquet(tmp_root)
    )
    from .storefs import remove_dir

    for entry in hot:
        new_dir = os.path.join(tmp_root, entry)
        if os.path.isdir(new_dir):
            swap_dir(os.path.join(coded_dir, entry), new_dir)
        else:
            # the purge emptied this cell — nothing was written for it;
            # park-then-delete (crash-safe, see storefs.remove_dir)
            remove_dir(os.path.join(coded_dir, entry))
    shutil.rmtree(tmp_root, ignore_errors=True)
    _heal_n_rows(spark, local, meta)
    _write_meta(local, meta)
    after = _cell_file_counts(local)
    return {
        "cells_rewritten": len(hot),
        "files_before": sum(counts.values()),
        "files_after": sum(after.values()),
        "rows_rewritten": int(rows),
    }


def _compact_manifest_ann(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_cell: int,
    target_rows_per_file: int,
) -> dict:
    """Manifest-layout ANN compaction: rewrite over-fragmented cells
    (tombstone-purged) into one fresh generation and commit the cutover
    of ALL of them in one manifest. ``n_rows`` drift cannot exist in
    this layout (deletes are atomic), so no heal pass is needed."""
    snap = M.read_manifest(path)
    meta = snap["meta"]
    if meta.get("version") != _VERSION:
        raise ValueError(
            f"unsupported ann-index version {meta.get('version')!r}"
        )
    local = _local(path)
    counts = M.part_file_counts(path, "coded", snap)
    hot = sorted(p for p, c in counts.items() if c > max_files_per_cell)
    if not hot:
        return {
            "cells_rewritten": 0,
            "files_before": sum(counts.values()),
            "files_after": sum(counts.values()),
            "rows_rewritten": 0,
        }
    tdir = os.path.join(local, "coded")
    df = (
        spark.read.option("basePath", tdir)
        .parquet(*M.table_paths(path, "coded", snap, parts=hot))
        .drop("gen")
    )
    tombstones = M.read_table(spark, path, "tombstones", snap)
    if tombstones is not None:
        df = _mask_tombstoned(df, tombstones, id_col="neighbor_id")
    rows = df.count()
    files = max(1, -(-rows // target_rows_per_file))  # ceil
    gen = M.next_gen(path, "coded")
    (
        df.repartition(files, "cell")
        .sortWithinPartitions("cell", "neighbor_id")
        .write.option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy("cell")
        .parquet(os.path.join(tdir, gen))
    )
    tables = M.replace_parts(snap["tables"], "coded", hot, gen, path)
    M.commit_manifest(
        path, tables=tables, meta=meta, expected_version=snap["version"]
    )
    after = M.part_file_counts(path, "coded", {"tables": tables})
    return {
        "cells_rewritten": len(hot),
        "files_before": sum(counts.values()),
        "files_after": sum(after.values()),
        "rows_rewritten": int(rows),
    }


def vacuum_ann_index(
    path: str, *, keep_manifests: int = 2, min_age_seconds: float = 3600.0
) -> dict:
    """Reclaim generations superseded by compaction/rebuild and orphans
    of crashed writers (manifest layout only) — see
    :func:`manifestfs.vacuum` for the reader-pinning grace contract and
    the ``min_age_seconds`` misuse guard."""
    if not M.is_manifest_store(path):
        raise ValueError(
            "vacuum applies to manifest-layout indexes only; rename-"
            "layout stores reclaim inline (two-rename swap + repair)"
        )
    return M.vacuum(
        path, keep_manifests=keep_manifests, min_age_seconds=min_age_seconds
    )


def rebuild_ann_index(corpus: DataFrame, path: str, **build_kwargs) -> dict:
    """Rebuild the index IN PLACE from the current corpus and promote
    it atomically — the documented answer to codebook/centroid drift
    (appends keep build-time cells fixed; when the embedding
    distribution moves, recall degrades gradually and a rebuild
    retrains). The new index is built into a sibling ``__rebuild``
    tree (readers keep serving the old index the whole time), then
    promoted with the same two-rename swap every compaction uses —
    a crash between the renames is healed by the sweep every load
    runs (the OLD index is restored and keeps serving; the finished
    rebuild tree survives for the next attempt). Same single-writer +
    POSIX contract as compaction (:mod:`.storefs`).

    Tombstones do NOT carry over: the rebuild reflects exactly the
    corpus passed in (deletions should already be gone from it), so
    the mask resets — the one moment deleted ids become reusable.
    ``build_kwargs`` forward to :func:`build_ann_index` (m,
    n_codewords, column names...). Returns the new metadata.

    Manifest layout: the rebuild writes fresh generations and promotes
    them in one manifest commit that replaces every table and drops
    the tombstone mask — no rename, pinned readers keep the old index
    until :func:`vacuum_ann_index`."""
    from .storefs import swap_dir

    if M.is_manifest_store(path):
        # a rebuild keeps the store's layout: an explicit layout= in
        # build_kwargs would otherwise collide with the one we set
        want = build_kwargs.pop("layout", "manifest")
        if want != "manifest":
            raise ValueError(
                "rebuild cannot change a store's layout in place "
                f"(store is manifest-layout, got layout={want!r}); "
                "build a new index at a new path instead"
            )
        snap = M.read_manifest(path)
        return build_ann_index(
            corpus,
            path,
            layout="manifest",
            _expected_version=snap["version"],
            **build_kwargs,
        )
    local = _local(path)
    # a rebuild keeps the store's layout: this is a rename store, so
    # the scratch build must be rename too (the flipped manifest
    # default must not leak a manifest log into the swap)
    want = build_kwargs.pop("layout", "rename")
    if want != "rename":
        raise ValueError(
            "rebuild cannot change a store's layout in place (store "
            f"is rename-layout, got layout={want!r}); build a new "
            "index at a new path instead"
        )
    tmp = local + "__rebuild"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    meta = build_ann_index(corpus, tmp, layout="rename", **build_kwargs)
    repair_ann_index(path)  # clear any parked __old before the swap
    swap_dir(local, tmp)
    return meta


def ann_index_sink(
    path: str,
    *,
    compact_over: int | None = None,
    app_id: str | None = None,
):
    """``foreachBatch`` sink folding each micro-batch of vectors into
    the persisted index via :func:`append_ann_index` — continuous
    embedding ingestion (the streaming analog of
    ``streaming.documents.upsert_sink``). The index must already exist
    (:func:`build_ann_index` on the initial corpus). On a MANIFEST-
    layout index with ``app_id`` set, appends are EXACTLY-ONCE across
    replays: the ``(app_id, batch_id)`` idempotence token commits
    atomically with the batch's coded rows, so a batch replayed after
    a crash — before OR after its commit — lands exactly once (see
    :func:`manifestfs.txn_version`). ``app_id`` names the query's
    checkpoint lineage and is OPT-IN (default None = no token): an
    implicit shared default would silently drop the first batches of a
    new query whose fresh checkpoint resets batch ids — a new
    checkpoint dir must come with a new app_id. On the rename layout
    the token is best-effort (recorded after the data): dedup ids
    upstream, the standard append-sink caveat.

    ``compact_over`` enables inline maintenance: after each append, any
    cell directory holding more than that many parquet files is
    rewritten via :func:`compact_ann_index` (each micro-batch appends
    one small file per touched cell, so a long-running stream otherwise
    fragments probe-time scans without bound). Inline compaction
    assumes this sink is the index's ONLY writer AND that no other
    session serves queries during the swap window (a concurrent reader
    that resolved file paths before the swap can miss a cell) — for
    concurrently-served indexes leave ``compact_over`` unset and run
    :func:`compact_ann_index` from an explicit maintenance window
    instead. See :mod:`.storefs` for the POSIX-rename assumption.

    Usage::

        stream.writeStream.foreachBatch(ann_index_sink("/idx"))
              .option("checkpointLocation", ckpt).start()
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_ann_index(
            batch_df,
            path,
            txn=None if app_id is None else (app_id, batch_id),
        )
        if compact_over is not None:
            compact_ann_index(
                batch_df.sparkSession, path, max_files_per_cell=compact_over
            )

    return _sink


def load_ann_index(
    spark: SparkSession, path: str, *, version: int | None = None
) -> AnnIndex:
    """Handle over the stored index. Manifest layout: the manifest
    read PINS the snapshot — the returned DataFrames name immutable
    generation directories, so later appends/compactions/rebuilds
    never change what this handle serves (until vacuum). ``version``
    TIME-TRAVELS to that exact committed snapshot (see
    :func:`lexindex.load_lex_index`)."""
    if version is not None and not M.is_manifest_store(path):
        raise ValueError(
            "version= time travel needs a manifest-layout index "
            '(build_ann_index(layout="manifest"))'
        )
    if M.is_manifest_store(path):
        snap = M.read_manifest(path, version)
        meta = snap["meta"]
        if meta.get("version") != _VERSION:
            raise ValueError(
                f"unsupported ann-index version {meta.get('version')!r}"
            )
        return AnnIndex(
            meta=meta,
            centroids=M.read_table(spark, path, "centroids", snap),
            coded=M.read_table(spark, path, "coded", snap),
            tombstones=M.read_table(spark, path, "tombstones", snap),
        )
    # torn-compaction sweep first (one listdir when healthy) — a crash
    # between compaction's two renames otherwise silently serves top-k
    # MISSING the parked cell's rows (no error — just wrong neighbors).
    repair_ann_index(path)
    local = _local(path)
    with open(os.path.join(local, "index.json")) as f:
        meta = json.load(f)
    if meta.get("version") != _VERSION:
        raise ValueError(
            f"unsupported ann-index version {meta.get('version')!r}"
        )
    tomb_dir = os.path.join(local, "tombstones")
    return AnnIndex(
        meta=meta,
        centroids=spark.read.parquet(os.path.join(local, "centroids")),
        coded=spark.read.parquet(os.path.join(local, "coded")),
        tombstones=(
            spark.read.parquet(tomb_dir)
            if os.path.isdir(tomb_dir)
            else None
        ),
    )


def ann_index_topk(
    index: AnnIndex,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    rerank_factor: int = 0,
    corpus: DataFrame | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k from the STORED index — identical plan (and results) to
    the inline :func:`similarity.ivfpq_topk`, except the coded side is
    the partition-pruned parquet scan instead of a fresh encode. Pass
    ``corpus`` (true vectors) to enable ``rerank_factor``.

    ``exclude_self`` (default True, inline-path parity) drops hits with
    ``query_id == neighbor_id`` — correct when queries ARE corpus rows
    (self-search). Pass ``False`` when serving external queries whose
    id space is unrelated to the corpus ids: both are typically small
    integers, and a coincidental id collision would otherwise silently
    lose that neighbor.

    An SQ8-codec index (``build_ann_index(codec="sq8")``) serves
    through the same probe plan with the scale-invariant int8 dot as
    the score numerator (see :func:`similarity.sq8_topk`)."""
    from auto_data_linkage_spark.operators.similarity import (
        _ivfpq_score,
        dot_expr,
    )

    adc = (
        dot_expr(F.col("codes"), F.col("__qvec"))
        if index.meta.get("codec", "pq") == "sq8"
        else None
    )
    coded = index.coded
    if index.tombstones is not None:
        # deleted-ids mask (delete_from_ann_index): deleted-ids-sized,
        # broadcast; the cell-pruning filter pushes through the
        # anti-join's left side so the partition-pruned scan is kept.
        # Sequence-aware: re-appended ids serve their NEW rows
        # (lexindex._mask_tombstoned).
        coded = _mask_tombstoned(
            coded, index.tombstones, id_col="neighbor_id"
        )
    return _ivfpq_score(
        coded,
        index.centroids,
        index.meta["codebooks"],
        queries,
        k=k,
        nprobe=nprobe,
        vec_col=index.meta["vec_col"],
        id_col=index.meta["id_col"],
        rerank_factor=rerank_factor,
        corpus=corpus,
        exclude_self=exclude_self,
        adc=adc,
    )
