"""Corpus layout sinks: file-count discipline, sort clustering,
compaction, and manifest fidelity."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.sources import layout as L


@pytest.fixture()
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", "text", "lang", "source")


def _parquet_files(root):
    return [
        p
        for p in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
        if os.path.basename(p) != "_SUCCESS"
    ]


def test_write_corpus_bounds_files_per_partition(spark, corpus, tmp_path):
    out = str(tmp_path / "corpus")
    L.write_corpus(
        corpus, out, partition_by=["lang", "source"], sort_by=["doc_id"]
    )
    n_parts = corpus.select("lang", "source").distinct().count()
    files = _parquet_files(out)
    # one task per partition value -> exactly one file per directory
    assert len(files) == n_parts
    back = spark.read.parquet(out)
    assert back.count() == corpus.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in corpus.select("doc_id").collect()
    }


def test_write_corpus_salted_spread(spark, corpus, tmp_path):
    """The salt must spread a hot partition over multiple tasks/files.

    At test scale AQE's partition coalescing re-merges the tiny salted
    partitions (the desirable prod behavior for SMALL partitions — the
    salt only matters once partitions exceed the advisory size), so pin
    the mechanism with coalescing disabled.
    """
    out = str(tmp_path / "salted")
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        L.write_corpus(
            corpus,
            out,
            partition_by=["lang"],
            files_per_partition=3,
        )
    finally:
        spark.conf.set(key, old)
    n_langs = corpus.select("lang").distinct().count()
    files = _parquet_files(out)
    assert n_langs < len(files) <= 3 * n_langs
    assert spark.read.parquet(out).count() == corpus.count()


def test_write_corpus_sorted_within_files(spark, corpus, tmp_path):
    out = str(tmp_path / "sorted")
    L.write_corpus(
        corpus, out, partition_by=["lang"], sort_by=["doc_id"]
    )
    for f in _parquet_files(out):
        ids = [r.doc_id for r in spark.read.parquet(f).collect()]
        assert ids == sorted(ids)


def test_write_corpus_max_records_splits_files(spark, corpus, tmp_path):
    out = str(tmp_path / "capped")
    n = corpus.count()
    L.write_corpus(
        corpus,
        out,
        partition_by=["lang"],
        max_records_per_file=max(1, n // 10),
    )
    # the row cap forces multiple files even with one task per partition
    assert len(_parquet_files(out)) > corpus.select("lang").distinct().count()
    assert spark.read.parquet(out).count() == n


def test_compact_corpus_round_trip(spark, corpus, tmp_path):
    messy = str(tmp_path / "messy")
    # simulate small-files damage: many tasks x partitions
    corpus.repartition(8).write.partitionBy("lang").parquet(messy)
    assert len(_parquet_files(messy)) > corpus.select("lang").distinct().count()
    total = L.compact_corpus(
        spark, messy, partition_by=["lang"], sort_by=["doc_id"]
    )
    assert total == corpus.count()
    compacted = messy + "__compact"
    back = spark.read.parquet(compacted)
    assert back.count() == total
    assert len(_parquet_files(compacted)) >= corpus.select("lang").distinct().count()


def test_corpus_manifest_counts_and_ranges(spark, corpus, tmp_path):
    out = str(tmp_path / "manifest_src")
    L.write_corpus(corpus, out, partition_by=["lang"], sort_by=["doc_id"])
    man = L.corpus_manifest(
        spark, out, partition_by=["lang"], stat_cols=["doc_id"]
    ).collect()
    want = {
        r.lang: r.n
        for r in corpus.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {r.lang: r.n_rows for r in man}
    assert got == want
    for r in man:
        assert r.min_doc_id <= r.max_doc_id


def test_upsert_corpus_merges_and_preserves_untouched(spark, corpus, tmp_path):
    root = str(tmp_path / "upsert")
    L.write_corpus(corpus, root, partition_by=["lang"], sort_by=["doc_id"])
    untouched_before = {
        f: os.path.getmtime(f)
        for f in _parquet_files(root)
        if "lang=en" not in f
    }
    en = [r.doc_id for r in corpus.where("lang = 'en'").limit(2).collect()]
    delta = spark.createDataFrame(
        [
            (en[0], "replaced text", "en", "src_new"),   # update
            (10_000_001, "brand new doc", "en", "src_new"),  # insert
        ],
        "doc_id long, text string, lang string, source string",
    )
    res = L.upsert_corpus(
        spark, root, delta, key="doc_id", partition_by=["lang"]
    )
    assert res["partitions"] == 1
    back = spark.read.parquet(root)
    assert back.count() == corpus.count() + 1
    got = {r.doc_id: r.text for r in back.where("lang = 'en'").collect()}
    assert got[en[0]] == "replaced text"
    assert got[10_000_001] == "brand new doc"
    assert en[1] in got  # survivor kept
    # untouched partitions: same files, untouched on disk
    untouched_after = {
        f: os.path.getmtime(f)
        for f in _parquet_files(root)
        if "lang=en" not in f
    }
    assert untouched_after == untouched_before


def test_upsert_corpus_first_ingest(spark, corpus, tmp_path):
    root = str(tmp_path / "fresh")
    delta = corpus.limit(10)
    res = L.upsert_corpus(
        spark, root, delta, key="doc_id", partition_by=["lang"]
    )
    assert res["rows_written"] == 10
    assert spark.read.parquet(root).count() == 10


def test_upsert_corpus_multi_partition_cols(spark, corpus, tmp_path):
    root = str(tmp_path / "multi")
    L.write_corpus(corpus, root, partition_by=["lang", "source"])
    one = corpus.limit(1).collect()[0]
    delta = spark.createDataFrame(
        [(one.doc_id, "patched", one.lang, one.source)],
        "doc_id long, text string, lang string, source string",
    )
    L.upsert_corpus(
        spark, root, delta, key="doc_id", partition_by=["lang", "source"]
    )
    back = spark.read.parquet(root)
    assert back.count() == corpus.count()
    assert (
        back.where(back.doc_id == one.doc_id).collect()[0].text == "patched"
    )


def test_upsert_corpus_empty_delta_is_noop(spark, corpus, tmp_path):
    root = str(tmp_path / "noop")
    L.write_corpus(corpus, root, partition_by=["lang"])
    before = {f: os.path.getmtime(f) for f in _parquet_files(root)}
    empty = corpus.limit(0)
    res = L.upsert_corpus(spark, root, empty, key="doc_id", partition_by=["lang"])
    assert res == {"partitions": 0, "rows_written": 0}
    assert {f: os.path.getmtime(f) for f in _parquet_files(root)} == before


# ------------------------------------------- optimistic concurrency
def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_upsert_versioned_sequential_versions(spark, tmp_path):
    root = str(tmp_path / "vc")
    r1 = L.upsert_corpus_versioned(
        spark, root, _mk(spark, [(1, "en", "a"), (2, "de", "b")]),
        key="doc_id", partition_by=["lang"],
    )
    assert r1["version"] == 1
    r2 = L.upsert_corpus_versioned(
        spark, root, _mk(spark, [(3, "en", "c")]),
        key="doc_id", partition_by=["lang"],
    )
    assert r2["version"] == 2 and r2["partitions"] == 1
    got = sorted(
        (r.doc_id, r.lang, r.text)
        for r in spark.read.parquet(root).collect()
    )
    assert got == [(1, "en", "a"), (2, "de", "b"), (3, "en", "c")]
    # empty delta commits nothing, version unchanged
    r3 = L.upsert_corpus_versioned(
        spark, root, _mk(spark, []).where(F.lit(False)),
        key="doc_id", partition_by=["lang"],
    )
    assert r3 == {"partitions": 0, "rows_written": 0, "version": 2}


def test_upsert_versioned_interleaved_writers_lose_no_update(
    spark, tmp_path, monkeypatch
):
    """The lost-update interleave: both writers MERGE against the same
    snapshot (forced by a barrier), then race to commit the same
    partition. The loser must detect the conflict (version token taken),
    re-merge against the winner's output, and retry — both deltas
    survive. Plain upsert_corpus would keep only the last writer's."""
    import threading

    root = str(tmp_path / "race")
    L.upsert_corpus_versioned(
        spark, root, _mk(spark, [(1, "en", "base")]),
        key="doc_id", partition_by=["lang"],
    )

    real = L._merge_touched
    barrier = threading.Barrier(2, timeout=30)
    first_round = {"a": True, "b": True}

    def stalled(s, path, delta, key, partition_by):
        out = real(s, path, delta, key, partition_by)
        tag = delta._race_tag
        if first_round[tag]:
            first_round[tag] = False
            barrier.wait()  # both writers hold their stale snapshot
        return out

    monkeypatch.setattr(L, "_merge_touched", stalled)

    results, errors = {}, {}

    def writer(tag, rows):
        try:
            delta = _mk(spark, rows)
            delta._race_tag = tag
            results[tag] = L.upsert_corpus_versioned(
                spark, root, delta, key="doc_id", partition_by=["lang"],
                writer_id=tag, conflict_wait_s=30.0,
            )
        except Exception as e:  # pragma: no cover - surfaced below
            errors[tag] = e

    ta = threading.Thread(target=writer, args=("a", [(2, "en", "from_a")]))
    tb = threading.Thread(target=writer, args=("b", [(3, "en", "from_b")]))
    ta.start(); tb.start(); ta.join(60); tb.join(60)
    assert not errors, errors

    got = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(root).collect()
    )
    # no lost update: base + both writers' rows all present
    assert got == [(1, "base"), (2, "from_a"), (3, "from_b")]
    assert sorted(r["version"] for r in results.values()) == [2, 3]


def test_upsert_versioned_stuck_pending_commit_fails_loudly(spark, tmp_path):
    import json
    import os

    root = str(tmp_path / "stuck")
    L.upsert_corpus_versioned(
        spark, root, _mk(spark, [(1, "en", "a")]),
        key="doc_id", partition_by=["lang"],
    )
    # simulate a writer that died after acquiring v2
    with open(os.path.join(root, "_commits", "v2.json"), "w") as f:
        json.dump({"version": 2, "writer": "dead", "state": "pending",
                   "partitions": [["en"]]}, f)
    with pytest.raises(L.CommitConflictError, match="pending"):
        L.upsert_corpus_versioned(
            spark, root, _mk(spark, [(2, "en", "b")]),
            key="doc_id", partition_by=["lang"], conflict_wait_s=0.5,
        )


def test_upsert_versioned_rejects_object_store_paths(spark):
    with pytest.raises(ValueError, match="Delta/Iceberg"):
        L.upsert_corpus_versioned(
            spark, "s3a://bucket/corpus",
            _mk(spark, [(1, "en", "a")]),
            key="doc_id", partition_by=["lang"],
        )


# ---------------------------------------------------------- CommitStore
# The protocol tests below run against BOTH backends: the POSIX
# O_CREAT|O_EXCL impl and the in-memory conditional-put impl (the
# object-store stand-in) — proving upsert_corpus_versioned needs only
# the CommitStore primitive, not POSIX semantics.


def _s3_store():
    """moto-backed S3CommitStore, or a skip when moto/boto3 is absent
    (optional dependencies). Returns (store, mock); the CALLER must
    stop the mock at teardown — leaving it running turns every later
    ``moto.mock_aws()`` context in the process into a NESTED mock
    whose exit does not reset state, leaking objects across tests
    (observed: test_s3commitstore seeing another test's keys)."""
    moto = pytest.importorskip("moto")
    import boto3

    mock = moto.mock_aws()
    mock.start()
    client = boto3.client("s3", region_name="us-east-1")
    client.create_bucket(Bucket="commit-log-test")
    store = L.S3CommitStore(
        "commit-log-test", "stores/lex/_manifests", client=client
    )
    return store, mock


@pytest.fixture(params=["posix", "memory", "s3"])
def commit_store(request, tmp_path):
    if request.param == "posix":
        yield L.PosixCommitStore(str(tmp_path / "log"))
    elif request.param == "s3":
        store, mock = _s3_store()
        try:
            yield store
        finally:
            mock.stop()
    else:
        yield L.MemoryCommitStore()


def test_commit_store_create_exclusive_once(commit_store):
    assert commit_store.create_exclusive("v1.json", {"version": 1})
    assert not commit_store.create_exclusive("v1.json", {"version": 1})
    assert commit_store.list_records()["v1.json"]["version"] == 1


def test_commit_store_replace_and_remove(commit_store):
    commit_store.create_exclusive("v1.json", {"version": 1, "state": "pending"})
    commit_store.replace("v1.json", {"version": 1, "state": "committed"})
    assert commit_store.list_records()["v1.json"]["state"] == "committed"
    commit_store.remove("v1.json")
    assert "v1.json" not in commit_store.list_records()


def test_upsert_versioned_runs_on_memory_store(spark, tmp_path):
    """Full protocol through the conditional-put backend: the data files
    still land under the corpus path, the versions still linearize."""
    root = str(tmp_path / "memstore")
    store = L.MemoryCommitStore()
    r1 = L.upsert_corpus_versioned(
        spark, root, _mk(spark, [(1, "en", "a"), (2, "de", "b")]),
        key="doc_id", partition_by=["lang"], store=store,
    )
    r2 = L.upsert_corpus_versioned(
        spark, root, _mk(spark, [(1, "en", "A2")]),
        key="doc_id", partition_by=["lang"], store=store,
    )
    assert (r1["version"], r2["version"]) == (1, 2)
    loaded = {
        r.doc_id: r.text
        for r in spark.read.parquet(root).select("doc_id", "text").collect()
    }
    assert loaded == {1: "A2", 2: "b"}
    states = [c["state"] for c in L._read_commits(store)]
    assert states == ["committed", "committed"]
    assert not os.path.isdir(os.path.join(root, "_commits"))


def test_upsert_versioned_failed_overwrite_leaves_failed_token(
    spark, tmp_path, monkeypatch
):
    """A mid-overwrite death must NOT show a clean history: the token
    flips to state=failed keeping the touched-partition list,
    failed_commits() surfaces the torn partitions, later writers are
    not blocked, and a committed upsert covering those partitions
    clears the repair report."""
    root = str(tmp_path / "torn")
    L.upsert_corpus_versioned(
        spark, root, _mk(spark, [(1, "en", "a"), (2, "de", "b")]),
        key="doc_id", partition_by=["lang"],
    )

    real = L._overwrite_touched

    def boom(*a, **k):
        raise RuntimeError("executor lost mid-overwrite")

    monkeypatch.setattr(L, "_overwrite_touched", boom)
    with pytest.raises(RuntimeError, match="mid-overwrite"):
        L.upsert_corpus_versioned(
            spark, root, _mk(spark, [(3, "en", "c")]),
            key="doc_id", partition_by=["lang"],
        )
    failed = L.failed_commits(root)
    assert len(failed) == 1
    assert failed[0]["version"] == 2
    assert failed[0]["unrepaired"] == [("en",)]

    # later writers see the failed token as terminal, not pending —
    # version numbering continues past it
    monkeypatch.setattr(L, "_overwrite_touched", real)
    r3 = L.upsert_corpus_versioned(
        spark, root, _mk(spark, [(3, "en", "c")]),
        key="doc_id", partition_by=["lang"], conflict_wait_s=2.0,
    )
    assert r3["version"] == 3
    # the committed v3 touched the torn partition: repaired
    assert L.failed_commits(root) == []
    loaded = {r.doc_id for r in spark.read.parquet(root).collect()}
    assert loaded == {1, 2, 3}
