"""Corpus ingest: permissive JSONL/CSV reads, quarantine split,
content-derived ids."""

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.sources import ingest as I

SCHEMA = "doc_id long, text string, lang string"


@pytest.fixture()
def jsonl_path(tmp_path):
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en"}',
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
        "{not json at all",
        '{"doc_id": 4, "lang": "en"}',  # parses, but text is missing
        '{"doc_id": 5, "text": "ok", "lang": "en"}',
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_quarantine_split(spark, jsonl_path):
    raw = I.read_jsonl_corpus(spark, jsonl_path, SCHEMA)
    clean, quarantine = I.split_quarantine(raw, required=["text"])
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2, 5]
    assert I.CORRUPT_COL not in clean.columns
    q = quarantine.collect()
    assert len(q) == 2
    # the parse failure keeps the raw line for replay
    raw_lines = [getattr(r, I.CORRUPT_COL) for r in q if getattr(r, I.CORRUPT_COL)]
    assert raw_lines == ["{not json at all"]


def test_ingest_report(spark, jsonl_path):
    raw = I.read_jsonl_corpus(spark, jsonl_path, SCHEMA)
    clean, quarantine = I.split_quarantine(raw, required=["text"])
    r = I.ingest_report(clean, quarantine).collect()[0]
    assert (r.clean_rows, r.quarantine_rows, r.parse_failures, r.missing_required) == (
        3,
        2,
        1,
        1,
    )


def test_csv_quarantine(spark, tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text("doc_id,text,lang\n1,hello,en\nnot_a_long,x,en\n3,ok,fr\n")
    raw = I.read_csv_corpus(spark, str(p), SCHEMA)
    clean, quarantine = I.split_quarantine(raw)
    assert sorted(r.doc_id for r in clean.collect()) == [1, 3]
    assert quarantine.count() == 1


def test_content_id_stable_and_collision_free(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    out = I.with_content_id(df).collect()
    ids = {r.doc_id: r.content_id for r in out}
    assert ids[1] == ids[2]  # byte-identical docs share the id
    assert ids[1] != ids[3]
    # multi-column separator prevents boundary collisions: ("ab","c")
    # must differ from ("a","bc")
    two = spark.createDataFrame(
        [("ab", "c"), ("a", "bc")], "x string, y string"
    )
    got = [r.content_id for r in I.with_content_id(two, ["x", "y"]).collect()]
    assert got[0] != got[1]


def test_roundtrip_documents_through_jsonl(spark, sf_dir, tmp_path):
    """Parquet documents -> jsonl -> permissive ingest == original."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "docs_jsonl")
    docs.write.json(out)
    back, quarantine = I.split_quarantine(
        I.read_jsonl_corpus(spark, out, SCHEMA), required=["doc_id", "text"]
    )
    assert quarantine.count() == 0
    assert back.count() == docs.count()
    assert (
        back.exceptAll(docs).count() == 0 and docs.exceptAll(back).count() == 0
    )


def test_stream_ingest_exactly_once(spark, tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    (src / "b1.jsonl").write_text(
        '{"doc_id": 1, "text": "a", "lang": "en"}\n{broken\n'
    )
    clean_p = str(tmp_path / "clean")
    quar_p = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")

    stream = I.stream_read_jsonl(spark, str(src), SCHEMA)
    assert stream.isStreaming
    q = I.stream_ingest(stream, clean_p, quar_p, ckpt, required=["text"])
    q.awaitTermination(120)
    assert [r.doc_id for r in spark.read.parquet(clean_p).collect()] == [1]
    assert spark.read.parquet(quar_p).count() == 1

    # second batch arrives; restart drains ONLY the new file
    (src / "b2.jsonl").write_text('{"doc_id": 2, "text": "b", "lang": "fr"}\n')
    q2 = I.stream_ingest(
        I.stream_read_jsonl(spark, str(src), SCHEMA),
        clean_p,
        quar_p,
        ckpt,
        required=["text"],
    )
    q2.awaitTermination(120)
    assert sorted(r.doc_id for r in spark.read.parquet(clean_p).collect()) == [1, 2]
    assert spark.read.parquet(quar_p).count() == 1  # not re-ingested


# -------------------------------------------------------------- WET/WARC
WET_SAMPLE = (
    "WARC/1.0\r\n"
    "WARC-Type: warcinfo\r\n"
    "WARC-Date: 2024-01-01T00:00:00Z\r\n"
    "Content-Length: 10\r\n"
    "\r\n"
    "crawl info\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: conversion\r\n"
    "WARC-Target-URI: https://example.com/a\r\n"
    "WARC-Date: 2024-01-02T03:04:05Z\r\n"
    "Content-Length: 21\r\n"
    "\r\n"
    "First page body text.\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: conversion\r\n"
    "WARC-Target-URI: https://example.org/b\r\n"
    "WARC-Date: 2024-01-02T03:04:06Z\r\n"
    "Content-Length: 33\r\n"
    "\r\n"
    "Second page.\nWith a second line.\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: conversion\r\n"
    "WARC-Target-URI: https://example.net/empty\r\n"
    "WARC-Date: 2024-01-02T03:04:07Z\r\n"
    "Content-Length: 0\r\n"
    "\r\n"
    "\r\n"
)


def test_read_wet_corpus(spark, tmp_path):
    from auto_data_linkage_spark.sources.ingest import read_wet_corpus

    p = tmp_path / "sample.wet"
    p.write_text(WET_SAMPLE)
    out = read_wet_corpus(spark, str(p)).orderBy("url").collect()
    # warcinfo preamble and the empty-payload record are dropped
    assert [r["url"] for r in out] == [
        "https://example.com/a",
        "https://example.org/b",
    ]
    assert out[0]["text"] == "First page body text."
    assert out[1]["text"] == "Second page.\nWith a second line."
    assert out[0]["warc_date"] == "2024-01-02T03:04:05Z"
    assert out[0]["content_length"] == 21
    assert all(r["record_type"] == "conversion" for r in out)


def test_read_wet_corpus_feeds_content_id_and_curation(spark, tmp_path):
    """Composition: WET read -> content-hash ids -> the documents shape
    the curation pipeline expects."""
    from auto_data_linkage_spark.sources.ingest import (
        read_wet_corpus,
        with_content_id,
    )

    p = tmp_path / "sample2.wet"
    p.write_text(WET_SAMPLE)
    docs = with_content_id(read_wet_corpus(spark, str(p)), "text")
    rows = docs.collect()
    assert len(rows) == 2
    assert len({r["content_id"] for r in rows}) == 2


def test_read_wet_corpus_zero_shuffle_plan(spark, tmp_path):
    from auto_data_linkage_spark.sources.ingest import read_wet_corpus

    p = tmp_path / "sample3.wet"
    p.write_text(WET_SAMPLE)
    plan = (
        read_wet_corpus(spark, str(p))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_wet_html_curation_composition(spark, tmp_path):
    """The full crawl front door: WET records whose payloads are raw
    HTML -> extract_html -> content ids -> curate_documents. Verifies
    the three new ingestion pieces hand off cleanly."""
    from auto_data_linkage_spark.operators.pipeline import curate_documents
    from auto_data_linkage_spark.operators.text import extract_html
    from auto_data_linkage_spark.sources.ingest import (
        read_wet_corpus,
        with_content_id,
    )

    body = (
        "<html><body><p>the quick brown fox jumps over the lazy dog and "
        "then it runs away into the quiet green woods before dark</p>"
        "<script>nav()</script></body></html>"
    )
    recs = []
    for i in range(4):
        payload = body if i < 3 else "<p>tiny</p>"  # doc 3 fails quality
        recs.append(
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: https://site{i}.com/\r\n"
            "WARC-Date: 2024-01-02T00:00:0{i}Z\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
            f"{payload}\r\n\r\n"
        )
    p = tmp_path / "crawl.wet"
    p.write_text("".join(recs))

    wet = read_wet_corpus(spark, str(p)).withColumnRenamed("text", "html")
    docs = with_content_id(
        extract_html(wet, "html"), "text", id_col="doc_id"
    )
    # content-hash ids: byte-identical docs SHARE an id, so exact dedup
    # is dropDuplicates on the id (see with_content_id docstring)
    docs = docs.dropDuplicates(["doc_id"])
    kept = curate_documents(docs, min_quality=0.3)
    rows = kept.collect()
    # three identical bodies collapse to 1; the tiny doc gated on quality
    assert len(rows) == 1, rows
    # curate returns (id, lang_pred, quality); join back for the text
    survivor = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    text = survivor.collect()[0]["text"]
    assert "quick brown fox" in text and "<" not in text


def test_stream_read_wet_matches_batch(spark, tmp_path):
    """Streaming WET ingestion == the batch parse over the same files,
    exactly-once through a checkpointed availableNow drain."""
    from auto_data_linkage_spark.sources.ingest import (
        read_wet_corpus,
        stream_read_wet,
    )

    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.wet").write_text(WET_SAMPLE)
    (src / "b.wet").write_text(WET_SAMPLE.replace("example", "sample"))

    stream = stream_read_wet(spark, str(src), max_files_per_trigger=1)
    assert stream.isStreaming
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.read.parquet(out_dir).select(
            "url", "warc_date", "text").collect())
    )
    want = sorted(
        map(tuple, read_wet_corpus(spark, str(src)).select(
            "url", "warc_date", "text").collect())
    )
    assert got == want and len(got) == 4
    # restart with no new files: exactly-once, nothing re-ingested
    q2 = (
        stream_read_wet(spark, str(src))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 4
