"""Crash-injection tests for torn two-rename compaction swaps across
the three persisted bucket stores (ANN index, lexical index, edge
store) plus unit tests for the shared sweep (operators/storefs.py).

Each store test: fragment the store with appends, snapshot its served
results, inject a crash BETWEEN swap_dir's two renames (an os.rename
wrapper raising on the Nth call — the kill-between-renames state the
round-9 verdict flagged as the one silent-wrong-results hazard),
verify the torn state exists (``__old`` present, live dir missing),
then check that a plain load — which runs the repair sweep — serves
BIT-IDENTICAL results and that a re-run compaction succeeds.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import storefs


# r16 test-tier split: this module is a lifecycle-matrix / property /
# full-catalog sweep — cost is a matrix-sized multiple of a unit test,
# so it runs in the exhaustive tier (pytest -m exhaustive), not the
# default wall-budgeted gate. See pytest.ini + OPTIMIZATION_r16.md.
pytestmark = pytest.mark.exhaustive


@pytest.fixture(autouse=True)
def _rename_layout(monkeypatch):
    """This suite tests the RENAME layout's crash repair exclusively;
    new stores default to layout="manifest", so pin the builds here
    (an explicit layout= at a call site still wins over the partial)."""
    import functools

    from auto_data_linkage_spark.operators import annindex as A
    from auto_data_linkage_spark.operators import lexindex as L

    monkeypatch.setattr(
        L, "build_lex_index",
        functools.partial(L.build_lex_index, layout="rename"),
    )
    monkeypatch.setattr(
        A, "build_ann_index",
        functools.partial(A.build_ann_index, layout="rename"),
    )


class _CrashOnNthRename:
    """os.rename wrapper raising on the Nth invocation — simulates a
    process kill between swap_dir's two renames."""

    def __init__(self, real, crash_on):
        self.real = real
        self.calls = 0
        self.crash_on = crash_on

    def __call__(self, src, dst):
        self.calls += 1
        if self.calls == self.crash_on:
            raise OSError("injected crash between compaction renames")
        return self.real(src, dst)


def _inject_crash(monkeypatch):
    wrapper = _CrashOnNthRename(os.rename, crash_on=2)
    monkeypatch.setattr(storefs.os, "rename", wrapper)
    return wrapper


def _torn_entries(root):
    return sorted(
        e for e in os.listdir(root) if e.endswith(storefs.OLD_SUFFIX)
    )


# ------------------------------------------------------------- unit sweep
def test_repair_restores_missing_live_dir(tmp_path):
    root = tmp_path / "store"
    parked = root / ("bucket=3" + storefs.OLD_SUFFIX)
    parked.mkdir(parents=True)
    (parked / "part-0.parquet").write_bytes(b"x")
    out = storefs.repair_swept_dirs(str(root))
    assert out["restored"] == [str(root / "bucket=3")]
    assert out["removed"] == []
    assert (root / "bucket=3" / "part-0.parquet").exists()
    assert _torn_entries(str(root)) == []


def test_repair_drops_leftover_after_completed_swap(tmp_path):
    root = tmp_path / "store"
    live = root / "bucket=3"
    live.mkdir(parents=True)
    (live / "part-0.parquet").write_bytes(b"new")
    parked = root / ("bucket=3" + storefs.OLD_SUFFIX)
    parked.mkdir()
    (parked / "part-9.parquet").write_bytes(b"orig")
    tmp_root = tmp_path / ("store" + storefs.TMP_SUFFIX)
    tmp_root.mkdir()
    out = storefs.repair_swept_dirs(str(root), tmp_roots=(str(tmp_root),))
    assert out["restored"] == []
    assert str(parked) in out["removed"] and str(tmp_root) in out["removed"]
    # the completed rewrite is kept untouched
    assert (live / "part-0.parquet").read_bytes() == b"new"
    assert _torn_entries(str(root)) == []


def test_repair_is_noop_on_healthy_and_missing_stores(tmp_path):
    root = tmp_path / "store"
    (root / "bucket=0").mkdir(parents=True)
    assert storefs.repair_swept_dirs(str(root)) == {
        "restored": [],
        "removed": [],
    }
    assert storefs.repair_swept_dirs(str(tmp_path / "absent")) == {
        "restored": [],
        "removed": [],
    }


# ------------------------------------------------------------- ann index
def test_ann_index_crash_between_renames_repaired(
    spark, sf_dir, tmp_path, monkeypatch
):
    from auto_data_linkage_spark.operators import annindex as A

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    out = str(tmp_path / "annidx")
    A.build_ann_index(vecs.where(F.col("vec_id") % 4 == 0), out, m=4, n_codewords=8)
    for m in range(1, 4):
        A.append_ann_index(vecs.where(F.col("vec_id") % 4 == m), out)
    queries = vecs.orderBy("vec_id").limit(5)

    def topk_set():
        idx = A.load_ann_index(spark, out)
        return {
            (r.query_id, r.neighbor_id, r.cosine, r.rank)
            for r in A.ann_index_topk(idx, queries, k=5, nprobe=2).collect()
        }

    want = topk_set()

    _inject_crash(monkeypatch)
    with pytest.raises(OSError, match="injected crash"):
        A.compact_ann_index(spark, out, max_files_per_cell=2)
    monkeypatch.undo()

    coded = os.path.join(out, "coded")
    torn = _torn_entries(coded)
    assert torn, "crash injection left no parked cell dir"
    live = torn[0][: -len(storefs.OLD_SUFFIX)]
    assert not os.path.isdir(os.path.join(coded, live))

    # a plain load runs the sweep — results bit-identical, store healthy
    assert topk_set() == want
    assert _torn_entries(coded) == []
    assert not os.path.isdir(coded + storefs.TMP_SUFFIX)
    assert A.repair_ann_index(out) == {"restored": [], "removed": []}

    # compaction re-runs to completion and still serves the same top-k
    report = A.compact_ann_index(spark, out, max_files_per_cell=2)
    assert report["cells_rewritten"] > 0
    assert topk_set() == want


# ------------------------------------------------------------- lex index
def test_lex_index_crash_between_renames_repaired(
    spark, sf_dir, tmp_path, monkeypatch
):
    from auto_data_linkage_spark.operators import lexindex as L
    from auto_data_linkage_spark.operators.retrieval import (
        query_terms_from_docs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    probes = query_terms_from_docs(
        docs.orderBy("doc_id").limit(5), n_terms=6
    ).localCheckpoint(eager=False)
    out = str(tmp_path / "lexidx")
    L.build_lex_index(docs.where(F.col("doc_id") % 4 == 0), out, n_buckets=4)
    for m in range(1, 4):
        L.append_lex_index(docs.where(F.col("doc_id") % 4 == m), out)

    def topk_set():
        idx = L.load_lex_index(spark, out)
        return {
            (r.query_id, r.doc_id, r.bm25, r.rank)
            for r in L.lex_index_topk(idx, probes, k=5).collect()
        }

    want = topk_set()

    _inject_crash(monkeypatch)
    with pytest.raises(OSError, match="injected crash"):
        L.compact_lex_index(spark, out, max_files_per_bucket=2)
    monkeypatch.undo()

    postings = os.path.join(out, "postings")
    torn = _torn_entries(postings)
    assert torn, "crash injection left no parked bucket dir"
    live = torn[0][: -len(storefs.OLD_SUFFIX)]
    assert not os.path.isdir(os.path.join(postings, live))

    assert topk_set() == want
    assert _torn_entries(postings) == []
    assert L.repair_lex_index(out) == {"restored": [], "removed": []}

    summary = L.compact_lex_index(spark, out, max_files_per_bucket=2)
    assert summary["buckets_rewritten"] > 0
    assert topk_set() == want


def test_lex_index_completed_swap_leftover_removed(spark, sf_dir, tmp_path):
    """Crash AFTER the second rename but before the rmtree: live dir is
    the finished rewrite, ``__old`` is a leftover whose presence would
    double-count the bucket via partition discovery and break the next
    compaction's rename."""
    from auto_data_linkage_spark.operators import lexindex as L
    from auto_data_linkage_spark.operators.retrieval import (
        query_terms_from_docs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    probes = query_terms_from_docs(
        docs.orderBy("doc_id").limit(3), n_terms=6
    ).localCheckpoint(eager=False)
    out = str(tmp_path / "lexidx2")
    L.build_lex_index(docs, out, n_buckets=4)

    def topk_set():
        idx = L.load_lex_index(spark, out)
        return {
            (r.query_id, r.doc_id, r.bm25, r.rank)
            for r in L.lex_index_topk(idx, probes, k=5).collect()
        }

    want = topk_set()
    terms = os.path.join(out, "terms")
    bucket = next(e for e in os.listdir(terms) if e.startswith("bucket="))
    shutil.copytree(
        os.path.join(terms, bucket),
        os.path.join(terms, bucket + storefs.OLD_SUFFIX),
    )
    assert topk_set() == want
    assert _torn_entries(terms) == []


# ------------------------------------------------------------- edge store
def _pages(spark, lo, hi):
    rows = [
        (
            f"http://site{i % 7}.com/p{i}",
            f'<a href="http://site{(i + 1) % 7}.com/x">t</a> '
            f'<a href="http://site{(i + 3) % 7}.com/y">u</a>',
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, ["url", "html"])


def test_edge_store_crash_between_renames_repaired(
    spark, tmp_path, monkeypatch
):
    from auto_data_linkage_spark.operators.graph import (
        compact_edge_store,
        edge_store_sink,
        load_edges,
        pagerank,
        repair_edge_store,
    )

    store = str(tmp_path / "edges")
    sink = edge_store_sink(store, n_buckets=2)
    for b in range(4):
        sink(_pages(spark, b * 20, (b + 1) * 20), b)

    def ranks():
        return sorted(
            map(
                tuple,
                pagerank(load_edges(spark, store), iterations=3).collect(),
            )
        )

    want_edges = sorted(map(tuple, load_edges(spark, store).collect()))
    want_ranks = ranks()

    _inject_crash(monkeypatch)
    with pytest.raises(OSError, match="injected crash"):
        compact_edge_store(spark, store, max_files_per_bucket=2)
    monkeypatch.undo()

    torn = _torn_entries(store)
    assert torn, "crash injection left no parked bucket dir"
    live = torn[0][: -len(storefs.OLD_SUFFIX)]
    assert not os.path.isdir(os.path.join(store, live))

    # load_edges runs the sweep: edge set and pagerank bit-identical
    assert sorted(map(tuple, load_edges(spark, store).collect())) == want_edges
    assert _torn_entries(store) == []
    assert repair_edge_store(store) == {"restored": [], "removed": []}
    assert ranks() == want_ranks

    summary = compact_edge_store(spark, store, max_files_per_bucket=2)
    assert summary["buckets_rewritten"] > 0
    assert sorted(map(tuple, load_edges(spark, store).collect())) == want_edges


def test_append_into_torn_store_repairs_first(
    spark, sf_dir, tmp_path, monkeypatch
):
    """An append that lands while a bucket is parked as __old must NOT
    recreate the live dir (the next sweep would then mistake the parked
    original for a completed-swap leftover and drop it). Appends run
    the repair sweep first: crash -> append == restore -> append."""
    from auto_data_linkage_spark.operators import lexindex as L
    from auto_data_linkage_spark.operators.retrieval import (
        query_terms_from_docs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)
    probes = query_terms_from_docs(
        docs.orderBy("doc_id").limit(5), n_terms=6
    ).localCheckpoint(eager=False)

    def topk_set(path):
        idx = L.load_lex_index(spark, path)
        return {
            (r.query_id, r.doc_id, r.bm25, r.rank)
            for r in L.lex_index_topk(idx, probes, k=5).collect()
        }

    # clean reference: build(A) then append(B), no crash anywhere
    ref = str(tmp_path / "lex_ref")
    L.build_lex_index(half_a, ref, n_buckets=4)
    L.append_lex_index(half_b, ref)
    want = topk_set(ref)

    # crashed store: build(A), fragment it, crash mid-compaction, then
    # append(B) BEFORE any load or compaction ran a sweep
    out = str(tmp_path / "lex_crash")
    L.build_lex_index(
        half_a.where(F.col("doc_id") % 4 == 0), out, n_buckets=4
    )
    L.append_lex_index(half_a.where(F.col("doc_id") % 4 == 2), out)
    L.append_lex_index(half_a.where(F.col("doc_id") % 4 == 2).limit(0), out)
    _inject_crash(monkeypatch)
    with pytest.raises(OSError, match="injected crash"):
        L.compact_lex_index(spark, out, max_files_per_bucket=1)
    monkeypatch.undo()
    assert _torn_entries(os.path.join(out, "postings"))

    L.append_lex_index(half_b, out)
    assert topk_set(out) == want


def test_edge_store_domain_takedown(spark, tmp_path):
    """Takedowns are deltas: load_edges drops every edge touching a
    masked domain, the next refresh is BIT-IDENTICAL to PageRank over
    the filtered edge table, takedowns are idempotent, and compaction
    purges the masked edges physically without changing any read."""
    from auto_data_linkage_spark.operators.graph import (
        compact_edge_store,
        delete_domains_from_edge_store,
        edge_store_sink,
        load_edges,
        pagerank,
    )

    store = str(tmp_path / "edges_td")
    sink = edge_store_sink(store, n_buckets=2)
    for b in range(4):
        sink(_pages(spark, b * 20, (b + 1) * 20), b)

    full = load_edges(spark, store).localCheckpoint(eager=True)
    victims = ["site1.com", "site4.com"]
    out = delete_domains_from_edge_store(spark, store, victims)
    again = delete_domains_from_edge_store(spark, store, victims)
    assert out["deleted"] == 2 and again["deleted"] == 0

    masked = load_edges(spark, store)
    got = sorted(map(tuple, masked.collect()))
    want_edges = sorted(
        map(
            tuple,
            full.where(
                ~F.col("src_domain").isin(victims)
                & ~F.col("dst_domain").isin(victims)
            ).collect(),
        )
    )
    assert got == want_edges and got  # non-trivially masked
    # authority refresh == pagerank over the filtered table, bit-exact
    pr_store = sorted(
        map(tuple, pagerank(masked, iterations=3).collect())
    )
    pr_ref = sorted(
        map(
            tuple,
            pagerank(
                full.where(
                    ~F.col("src_domain").isin(victims)
                    & ~F.col("dst_domain").isin(victims)
                ),
                iterations=3,
            ).collect(),
        )
    )
    assert pr_store == pr_ref
    assert not any(
        d in victims for d, _ in pr_store
    )

    # physical purge on compaction; reads unchanged
    summary = compact_edge_store(spark, store, max_files_per_bucket=0)
    assert summary["buckets_rewritten"] > 0
    assert sorted(map(tuple, load_edges(spark, store).collect())) == want_edges
    raw = spark.read.parquet(store)
    assert (
        raw.where(
            F.col("src_domain").isin(victims)
            | F.col("dst_domain").isin(victims)
        ).count()
        == 0
    )
