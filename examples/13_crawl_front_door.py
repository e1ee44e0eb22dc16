"""Raw crawl → training documents — the round-9g ingestion front door:

1. ``read_wet_corpus`` parses Common-Crawl-style WET records (here a
   synthetic two-file crawl, one of them gzipped) into (url, date, text),
2. ``extract_html`` strips the markup the payloads still carry and
   surfaces raw-page quality signals (tag density, link count),
3. ``with_content_id`` + ``dropDuplicates`` assign content-hash ids
   (identical bytes share an id — that IS the exact dedup),
4. ``curate_documents`` runs the quality/language/near-dup gates,
5. ``score_prune`` keeps the top half by quality for the final set.

Run: python examples/13_crawl_front_door.py   (~40 s on local[8])
"""

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.order import score_prune
from auto_data_linkage_spark.operators.pipeline import curate_documents
from auto_data_linkage_spark.operators.text import extract_html
from auto_data_linkage_spark.session import get_spark
from auto_data_linkage_spark.sources.ingest import (
    read_wet_corpus,
    with_content_id,
)

PAGES = [
    ("https://news.example.com/a",
     "<html><body><h1>Local news</h1><p>The town council approved the "
     "new library budget after a long public meeting on Tuesday evening "
     "with many residents speaking in favor of the plan.</p>"
     "<script>ads()</script></body></html>"),
    ("https://blog.example.org/b",
     "<html><body><p>We hiked the northern ridge trail this weekend and "
     "the views over the valley were absolutely worth the early start "
     "and the steep climb through the forest.</p></body></html>"),
    # an exact re-crawl of page b under another URL (content dup)
    ("https://mirror.example.net/b-copy",
     "<html><body><p>We hiked the northern ridge trail this weekend and "
     "the views over the valley were absolutely worth the early start "
     "and the steep climb through the forest.</p></body></html>"),
    # a junk page: mostly chrome, little text
    ("https://spam.example.biz/z",
     "<html><body><script>x()</script><a href='1'>l</a><a href='2'>l</a>"
     "<p>buy</p></body></html>"),
]


def wet_bytes() -> str:
    recs = []
    for i, (url, html) in enumerate(PAGES):
        recs.append(
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2024-01-02T03:04:0{i}Z\r\n"
            f"Content-Length: {len(html)}\r\n"
            "\r\n"
            f"{html}\r\n\r\n"
        )
    return "".join(recs)


def main() -> None:
    spark = get_spark("example13", cpus=8)
    crawl = tempfile.mkdtemp(prefix="example13_")
    open(os.path.join(crawl, "part0.wet"), "w").write(wet_bytes())
    with gzip.open(os.path.join(crawl, "part1.wet.gz"), "wt") as f:
        f.write(wet_bytes().replace("example", "sample"))

    # --- 1-2. WET records -> extracted text + page signals
    wet = read_wet_corpus(spark, crawl).withColumnRenamed("text", "html")
    pages = extract_html(wet, "html")
    print(f"crawl records: {pages.count()} "
          f"(2 files, one gzipped, {len(PAGES)} records each)")

    # --- 3. content ids; identical bytes share an id -> exact dedup
    docs = with_content_id(pages, "text", id_col="doc_id").dropDuplicates(
        ["doc_id"]
    )
    print(f"after content-hash dedup: {docs.count()} "
          f"(the mirrored page collapsed)")

    # --- 4. curation gates
    kept = curate_documents(docs, min_quality=0.4)
    survivors = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    print(f"after quality/lang/near-dup gates: {survivors.count()} "
          f"(the chrome-only page gated out)")

    # --- 5. quality prune: keep the top half by extracted length
    final = score_prune(
        survivors.withColumn("n_chars", F.length("text")), "n_chars", 0.5
    )
    print("final set:")
    for r in final.select("url", "text").collect():
        print(f"  {r['url']}: {r['text'][:60]}...")

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
