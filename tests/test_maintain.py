"""One-call corpus maintenance (operators/maintain.py): consumer
discovery from the corpus registry, lex/ANN sync with fragmentation
and drift policies applied, checkpoint + consumer-aware vacuum."""

import random
import shutil

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import annindex as A
from auto_data_linkage_spark.operators import lexindex as L
from auto_data_linkage_spark.operators import manifestfs as M
from auto_data_linkage_spark.operators.maintain import maintain_corpus
from auto_data_linkage_spark.operators.sync import (
    sync_ann_index,
    sync_lex_index,
)
from auto_data_linkage_spark.sources import corpusstore as C

DIM, K = 16, 6


# r16 test-tier split: this module is a lifecycle-matrix / property /
# full-catalog sweep — cost is a matrix-sized multiple of a unit test,
# so it runs in the exhaustive tier (pytest -m exhaustive), not the
# default wall-budgeted gate. See pytest.ini + OPTIMIZATION_r16.md.
pytestmark = pytest.mark.exhaustive


@pytest.fixture(scope="module")
def centers():
    rnd = random.Random(11)
    return [[rnd.uniform(-3, 3) for _ in range(DIM)] for _ in range(K)]


def _rows(spark, sf_dir, centers, lo, hi, shift=0.0, seed=0):
    rnd = random.Random(seed)
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(200).collect()
    }
    texts = list(docs.values())
    data = [
        (
            i,
            texts[i % len(texts)],
            [centers[i % K][d] + rnd.gauss(0, 0.15) + shift
             for d in range(DIM)],
            int(i) % 2,
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        data, "doc_id long, text string, embedding array<double>, part int"
    )


def test_maintain_corpus_full_pass(spark, sf_dir, tmp_path, centers):
    corpus = str(tmp_path / "corpus")
    lex = str(tmp_path / "lex")
    ann = str(tmp_path / "ann")
    C.build_corpus_snapshot(
        _rows(spark, sf_dir, centers, 0, 400, seed=1), corpus,
        key="doc_id", partition_by=["part"],
    )
    L.build_lex_index(
        C.load_corpus_snapshot(spark, corpus).limit(0), lex, n_buckets=4,
    )
    sync_lex_index(spark, corpus, lex)
    A.build_ann_index(
        C.load_corpus_snapshot(spark, corpus).select("doc_id", "embedding"),
        ann, m=4, n_codewords=8, n_cells=K,
        vec_col="embedding", id_col="doc_id",
    )
    sync_ann_index(spark, corpus, ann, since=M.read_manifest(corpus)["version"])

    # the corpus moves on: two in-distribution appends
    C.append_corpus_snapshot(
        corpus, _rows(spark, sf_dir, centers, 400, 600, seed=2)
    )
    C.append_corpus_snapshot(
        corpus, _rows(spark, sf_dir, centers, 600, 800, seed=3)
    )
    rep = maintain_corpus(
        spark, corpus, compact_over=1, rebuild_over=0.1, min_age_seconds=0,
    )
    assert rep["skipped"] == []
    assert set(rep["synced"]) == {
        __import__("os").path.abspath(lex),
        __import__("os").path.abspath(ann),
    }
    for out in rep["synced"].values():
        assert any(a["action"] == "applied" for a in out["applied"])
    ann_out = rep["synced"][__import__("os").path.abspath(ann)]
    assert ann_out["drift"] is not None and ann_out["rebuilt"] is False
    # both indexes serve the full corpus
    assert (
        M.read_manifest(lex)["meta"]["n_docs"]
        == C.load_corpus_snapshot(spark, corpus).count()
        == M.read_manifest(ann)["meta"]["n_rows"]
    )
    # corpus compacted + vacuumed (consumer-aware floor satisfied:
    # both cursors are at head, so old manifests were reclaimable)
    assert rep["corpus"]["vacuum"]["removed_manifests"]
    # history survives the vacuum through the checkpoint
    assert [h["version"] for h in M.history(corpus)][0] == 1
    # idempotent: a second pass syncs nothing and skips nothing
    rep2 = maintain_corpus(spark, corpus, min_age_seconds=0)
    assert all(
        all(a["action"] != "applied" for a in o["applied"])
        for o in rep2["synced"].values()
    )

    # a drifted append trips the rebuild THROUGH the orchestrator
    C.append_corpus_snapshot(
        corpus, _rows(spark, sf_dir, centers, 9000, 9200, shift=4.0, seed=4)
    )
    # 200 shifted rows over 400 good appended rows: the row-weighted
    # cumulative drift is ~1/3 of the shifted rows' own (documented
    # dilution — ann_drift docstring), so the threshold is sized for
    # the diluted value
    rep3 = maintain_corpus(
        spark, corpus, rebuild_over=0.05, min_age_seconds=0
    )
    ann3 = rep3["synced"][__import__("os").path.abspath(ann)]
    assert ann3["drift"] > 0.05 and ann3["rebuilt"]

    # a dead consumer store is reported, never silently unregistered
    shutil.rmtree(lex)
    rep4 = maintain_corpus(spark, corpus, min_age_seconds=0)
    assert rep4["skipped"] == [__import__("os").path.abspath(lex)]
    C.unregister_corpus_consumer(corpus, lex)
    rep5 = maintain_corpus(spark, corpus, min_age_seconds=0)
    assert rep5["skipped"] == []


def test_maintain_corpus_sq8_routing_drift_rebuild(
    spark, sf_dir, tmp_path, centers
):
    """The SQ8 refresh loop THROUGH the orchestrator (VERDICT r13 ask
    #1): a shifted append trips ``rebuild_over`` via the codec-
    independent routing signal inside maintain_corpus, exactly like
    the PQ path in test_maintain_corpus_full_pass."""
    corpus = str(tmp_path / "corpus")
    ann = str(tmp_path / "ann")
    C.build_corpus_snapshot(
        _rows(spark, sf_dir, centers, 0, 400, seed=5), corpus,
        key="doc_id", partition_by=["part"],
    )
    A.build_ann_index(
        C.load_corpus_snapshot(spark, corpus).select("doc_id", "embedding"),
        ann, codec="sq8", n_cells=K, vec_col="embedding", id_col="doc_id",
    )
    sync_ann_index(
        spark, corpus, ann, since=M.read_manifest(corpus)["version"]
    )

    # in-distribution append: the routing signal stays quiet
    C.append_corpus_snapshot(
        corpus, _rows(spark, sf_dir, centers, 400, 600, seed=6)
    )
    rep = maintain_corpus(
        spark, corpus, rebuild_over=0.05, min_age_seconds=0
    )
    out = rep["synced"][__import__("os").path.abspath(ann)]
    assert out["drift"] is not None and out["drift"] <= 0.05
    assert out["rebuilt"] is False

    # shifted append: routing drift trips the rebuild in the same pass
    C.append_corpus_snapshot(
        corpus, _rows(spark, sf_dir, centers, 9000, 9200, shift=4.0, seed=7)
    )
    rep2 = maintain_corpus(
        spark, corpus, rebuild_over=0.05, min_age_seconds=0
    )
    out2 = rep2["synced"][__import__("os").path.abspath(ann)]
    assert out2["drift"] > 0.05 and out2["rebuilt"] is True
    meta = M.read_manifest(ann)["meta"]
    assert meta["codec"] == "sq8" and not meta.get("route_rows")


def test_dead_consumer_pin_cost_and_retire(spark, sf_dir, tmp_path, centers):
    """VERDICT r13 ask #3: a dead consumer's registration is no longer
    silently cheap — maintain_corpus quantifies the manifests/bytes its
    cursor floor pins, and the explicit retire=[path] opt-in drops the
    registration so the SAME pass's vacuum reclaims them."""
    corpus = str(tmp_path / "corpus")
    lex = str(tmp_path / "lex")
    C.build_corpus_snapshot(
        _rows(spark, sf_dir, centers, 0, 200, seed=8), corpus,
        key="doc_id", partition_by=["part"],
    )
    L.build_lex_index(
        C.load_corpus_snapshot(spark, corpus).limit(0), lex, n_buckets=4,
    )
    sync_lex_index(spark, corpus, lex)  # cursor at v1
    # the corpus moves on WITHOUT the index syncing: the cursor lags
    for lo in (200, 400, 600):
        C.append_corpus_snapshot(
            corpus, _rows(spark, sf_dir, centers, lo, lo + 200, seed=lo)
        )
    # an upsert supersedes generations — the lagging cursor now pins
    # real data bytes (append-only history pins only manifest files);
    # two more appends push the default keep-window past the upsert's
    # pre-image, so only the dead cursor still holds those bytes
    C.upsert_corpus_snapshot(
        spark, corpus, _rows(spark, sf_dir, centers, 0, 50, seed=99)
    )
    for lo in (800, 1000):
        C.append_corpus_snapshot(
            corpus, _rows(spark, sf_dir, centers, lo, lo + 100, seed=lo)
        )
    # the index store dies (deleted without unregistering)
    shutil.rmtree(lex)
    lex_abs = __import__("os").path.abspath(lex)

    rep = maintain_corpus(spark, corpus, min_age_seconds=0)
    assert rep["skipped"] == [lex_abs] and rep["retired"] == []
    pin = rep["dead"][lex_abs]
    assert pin["cursor"] == 1 and pin["head"] >= 4
    assert pin["manifests_pinned"] > 0 and pin["bytes_pinned"] > 0
    assert pin["txn_token"].endswith(lex_abs)
    # the pinned history is genuinely retained: the lagging cursor's
    # manifests survived the vacuum this pass ran
    assert M.read_manifest(corpus, version=pin["cursor"]) is not None

    # retire: registration dropped, pin freed, SAME pass reclaims
    rep2 = maintain_corpus(
        spark, corpus, min_age_seconds=0, retire=[lex]
    )
    assert rep2["retired"] == [lex_abs]
    assert C.registered_sync_cursors(corpus) == {}
    assert rep2["corpus"]["vacuum"]["removed_manifests"]
    # pinned version gone; head still serves
    with pytest.raises(FileNotFoundError):
        M.read_manifest(corpus, version=1)
    assert C.load_corpus_snapshot(spark, corpus).count() == 1000
    # idempotent: nothing dead remains
    rep3 = maintain_corpus(spark, corpus, min_age_seconds=0)
    assert rep3["skipped"] == [] and rep3["dead"] == {}


def _tiny_linker(state, layout, n_buckets=64):
    from auto_data_linkage_spark.compare import Comparison
    from auto_data_linkage_spark.model import FellegiSunterModel
    from auto_data_linkage_spark.streaming.linkage import StreamingLinker

    model = FellegiSunterModel(
        comparisons=[Comparison("name", "levenshtein", 2)],
        blocking_rules=[("blk",)],
        prior=1.0 / 50,
    )
    return StreamingLinker(
        model, state, threshold=0.5, layout=layout, n_buckets=n_buckets,
        vacuum_age_seconds=0.0,
    )


def _people(spark, lo, hi):
    rows = [
        (i, f"name{i:03d}", str(i % 7))
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "unique_id long, name string, blk string"
    )


def test_maintain_corpus_covers_linker_state_stores(
    spark, sf_dir, tmp_path, centers
):
    """VERDICT r13 ask #8: a streaming-linker state store — passed via
    extra_stores OR registered as a corpus consumer — gets the
    compaction/checkpoint/vacuum tier in the same maintain pass, for
    both the snapshot (kind=linkage-state) and merge (corpus snapshot)
    layouts; the served state is unchanged by maintenance."""
    corpus = str(tmp_path / "corpus")
    C.build_corpus_snapshot(
        _rows(spark, sf_dir, centers, 0, 100, seed=9), corpus,
        key="doc_id", partition_by=["part"],
    )

    snap_state = str(tmp_path / "snap_state")
    merge_state = str(tmp_path / "merge_state")
    lk1 = _tiny_linker(snap_state, "manifest")
    lk2 = _tiny_linker(merge_state, "merge", n_buckets=8)
    for i, (lo, hi) in enumerate(((0, 30), (30, 60), (60, 90))):
        lk1.process_batch(_people(spark, lo, hi), i)
        lk2.process_batch(_people(spark, lo, hi), i)
    before1 = lk1.current_clusters(spark).count()
    before2 = lk2.current_clusters(spark).count()

    # the merge state is ALSO registrable as a consumer — exercise the
    # registry branch with it, and the extra_stores branch with the
    # snapshot state
    key = "corpus-sync:" + __import__("os").path.abspath(merge_state)

    def mutate(fresh):
        return fresh["tables"], M.with_txn(fresh["meta"], (key, 1))

    M.commit_with_retry(corpus, mutate, op="sync-cursor")

    rep = maintain_corpus(
        spark, corpus, compact_over=1, min_age_seconds=0,
        extra_stores=[snap_state],
    )
    snap_abs = snap_state
    merge_abs = __import__("os").path.abspath(merge_state)
    assert rep["skipped"] == []
    m1 = rep["maintained"][snap_abs]
    assert m1["kind"] == "linkage" and "vacuum" in m1
    m2 = rep["maintained"][merge_abs]
    assert m2["kind"] == "corpus" and "vacuum" in m2
    assert "compacted" in m2  # merge layout is a corpus store: compacted
    # maintenance preserved the served state, history checkpointed
    assert lk1.current_clusters(spark).count() == before1
    assert lk2.current_clusters(spark).count() == before2
    versions = [h["version"] for h in M.history(snap_state)]
    assert versions and versions[-1] == M.read_manifest(snap_state)["version"]


def test_maintain_corpus_covers_edge_stores(spark, sf_dir, tmp_path, centers):
    """A manifest-layout domain edge store passed via extra_stores gets
    the compaction/checkpoint/vacuum tier in the same maintain pass;
    the loaded edge table and its PageRank refresh are bit-identical
    across the maintenance (the fixed-point claim), and vacuum
    reclaims the superseded delta generations compaction left."""
    from auto_data_linkage_spark.operators.graph import (
        edge_store_sink,
        init_edge_store,
        load_edges,
        refresh_pagerank,
    )

    corpus = str(tmp_path / "corpus")
    C.build_corpus_snapshot(
        _rows(spark, sf_dir, centers, 0, 50, seed=21), corpus,
        key="doc_id", partition_by=["part"],
    )

    def _pages(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(
                F.lit("https://site"), (F.col("id") % 5).cast("string"),
                F.lit(".com/p/"), F.col("id").cast("string"),
            ).alias("url"),
            F.concat(
                F.lit('<a href="https://ref'),
                (F.col("id") % 3).cast("string"),
                F.lit('.org/x">l</a>'),
            ).alias("html"),
        )

    edges = str(tmp_path / "edges")
    init_edge_store(edges, n_buckets=2)
    sink = edge_store_sink(edges, app_id="crawl")
    for b in range(4):  # four delta generations -> fragmented buckets
        sink(_pages(b * 20, (b + 1) * 20), b)
    before_edges = sorted(map(tuple, load_edges(spark, edges).collect()))
    before_pr = sorted(
        map(tuple, refresh_pagerank(spark, edges, iterations=3).collect())
    )

    rep = maintain_corpus(
        spark, corpus, compact_over=1, min_age_seconds=0, keep_versions=1,
        extra_stores=[edges],
    )
    m = rep["maintained"][edges]
    assert m["kind"] == "edges"
    assert m["compacted"]["buckets_rewritten"] > 0
    assert "ranks" not in m  # no vector ever committed -> no signal
    # compaction superseded the four delta generations; the vacuum in
    # the same pass reclaimed them (min_age_seconds=0)
    assert len(m["vacuum"]["removed_gens"]) >= 1
    assert rep["skipped"] == []
    # maintenance is invisible to readers: same edges, same fixed point
    assert sorted(map(tuple, load_edges(spark, edges).collect())) \
        == before_edges
    assert sorted(
        map(tuple, refresh_pagerank(spark, edges, iterations=3).collect())
    ) == before_pr
    # history survived the vacuum via the log checkpoint
    versions = [h["version"] for h in M.history(edges)]
    assert versions and versions[-1] == M.read_manifest(edges)["version"]


def test_maintain_reports_rank_staleness(spark, sf_dir, tmp_path, centers):
    """An edge store carrying a persisted rank vector gets an ops
    signal in the maintain report: current=True when the vector still
    describes the served edge state — INCLUDING through maintenance's
    own compaction, which proves logical identity and carries the
    fingerprint forward (round-15 ask #6; previously compaction
    conservatively marked it stale) — and False only after a real edge
    delta (append/takedown), the cue to schedule a warm refresh
    (1-2 updates)."""
    from auto_data_linkage_spark.operators.graph import (
        edge_store_sink,
        init_edge_store,
        refresh_pagerank,
    )

    corpus = str(tmp_path / "corpus")
    C.build_corpus_snapshot(
        _rows(spark, sf_dir, centers, 0, 40, seed=31), corpus,
        key="doc_id", partition_by=["part"],
    )
    edges = str(tmp_path / "edges")
    init_edge_store(edges, n_buckets=2)
    sink = edge_store_sink(edges, app_id="crawl")
    for b in range(3):
        sink(
            spark.range(b * 20, (b + 1) * 20).select(
                F.concat(F.lit("https://s"), (F.col("id") % 4).cast("string"),
                         F.lit(".com/p/"), F.col("id").cast("string"))
                .alias("url"),
                F.concat(F.lit('<a href="https://r'),
                         (F.col("id") % 3).cast("string"),
                         F.lit('.org/x">l</a>')).alias("html"),
            ),
            b,
        )
    refresh_pagerank(spark, edges, warm=True, persist=True, iterations=3)

    # compaction rewrites the scored generations, but the logical
    # edges are identical: the fingerprint is carried forward and the
    # nightly compact does NOT flag a quiet graph's vector stale
    rep = maintain_corpus(
        spark, corpus, compact_over=1, min_age_seconds=0,
        extra_stores=[edges],
    )
    r = rep["maintained"][edges]["ranks"]
    assert r["at_version"] >= 1 and r["current"] is True

    # a REAL edge delta marks it stale in the next pass's report
    sink(
        spark.range(60, 70).select(
            F.concat(F.lit("https://s9.com/p/"),
                     F.col("id").cast("string")).alias("url"),
            F.lit('<a href="https://r9.org/x">l</a>').alias("html"),
        ),
        3,
    )
    rep_stale = maintain_corpus(
        spark, corpus, compact_over=1000, min_age_seconds=0,
        extra_stores=[edges],
    )
    assert rep_stale["maintained"][edges]["ranks"]["current"] is False

    # the warm refresh re-scores; a second maintain pass with nothing
    # to compact reports the vector current again
    refresh_pagerank(spark, edges, warm=True, persist=True, iterations=3)
    rep2 = maintain_corpus(
        spark, corpus, compact_over=1000, min_age_seconds=0,
        extra_stores=[edges],
    )
    assert rep2["maintained"][edges]["ranks"]["current"] is True


def test_retire_dead_sentinel_and_live_refusal(
    spark, sf_dir, tmp_path, centers
):
    """Round-15 ask #8: retire="dead" retires exactly the consumers
    THIS pass proves dead (no re-typing paths from the last report);
    an explicit retire=[live_path] is refused loudly — in the report
    AND as a UserWarning — because un-pinning a live reader is a
    contract violation."""
    corpus = str(tmp_path / "corpus")
    dead1 = str(tmp_path / "lex_dead")
    dead2 = str(tmp_path / "lex_dead2")
    live = str(tmp_path / "lex_live")
    C.build_corpus_snapshot(
        _rows(spark, sf_dir, centers, 0, 200, seed=8), corpus,
        key="doc_id", partition_by=["part"],
    )
    head = C.load_corpus_snapshot(spark, corpus).limit(0)
    for p in (dead1, dead2, live):
        L.build_lex_index(head, p, n_buckets=4)
        sync_lex_index(spark, corpus, p)
    shutil.rmtree(dead1)
    shutil.rmtree(dead2)
    _abs = __import__("os").path.abspath
    live_abs, d1_abs, d2_abs = _abs(live), _abs(dead1), _abs(dead2)

    # explicit retire of a LIVE consumer: refused, loud, not retired
    with pytest.warns(UserWarning, match="refusing to retire"):
        rep = maintain_corpus(
            spark, corpus, min_age_seconds=0, retire=[live]
        )
    assert rep["retire_refused"] == [live_abs]
    assert rep["retired"] == []
    assert sorted(rep["skipped"]) == sorted([d1_abs, d2_abs])

    # retire="dead": both proven-dead consumers dropped in one pass,
    # the live one untouched (still syncing, still registered)
    rep2 = maintain_corpus(
        spark, corpus, min_age_seconds=0, retire="dead"
    )
    assert sorted(rep2["retired"]) == sorted([d1_abs, d2_abs])
    assert rep2["retire_refused"] == []
    assert live_abs in rep2["synced"]
    assert sorted(C.registered_sync_cursors(corpus)) == [
        f"corpus-sync:{live_abs}"
    ]

    # bad sentinel rejected
    with pytest.raises(ValueError, match="retire"):
        maintain_corpus(spark, corpus, retire="all")
