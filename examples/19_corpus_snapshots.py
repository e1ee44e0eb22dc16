"""Corpus snapshots: the manifest commit protocol for the corpus
itself — versioned, object-store-safe MERGE/ingest with time travel
and a change feed.

Storyline: a curation team maintains a partitioned document corpus.
Batches of new documents stream in (cheap O(delta) appends, exactly
once even across checkpoint replays); occasionally a revision batch
MERGEs in (replacing rows by key inside the touched partitions only);
a reader pinned mid-upsert keeps serving its snapshot; an incremental
downstream pipeline consumes only what new commits added; compaction
bounds fragmentation; vacuum reclaims superseded generations.

Run: python examples/19_corpus_snapshots.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from auto_data_linkage_spark.session import get_spark
from auto_data_linkage_spark.sources.corpusstore import (
    append_corpus_snapshot,
    build_corpus_snapshot,
    compact_corpus_snapshot,
    corpus_snapshot_changes,
    corpus_snapshot_history,
    load_corpus_snapshot,
    upsert_corpus_snapshot,
    vacuum_corpus_snapshot,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("corpus-snapshots", cpus=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    root = os.path.join(tempfile.mkdtemp(), "corpus")

    # v1: initial snapshot, partitioned by language
    base = docs.where(F.col("doc_id") % 2 == 0)
    build_corpus_snapshot(base, root, key="doc_id", partition_by=["lang"])
    print("v1 rows:", load_corpus_snapshot(spark, root).count())

    # v2: a new batch arrives — INSERT-only, O(delta), no partition read
    batch = docs.where(F.col("doc_id") % 4 == 1)
    print("append:", append_corpus_snapshot(root, batch))

    # a reader pins its snapshot HERE; the upsert below won't move it
    pinned = load_corpus_snapshot(spark, root)

    # v3: revised documents MERGE in (replace-by-key, partition-scoped)
    revised = base.limit(10).withColumn(
        "text", F.concat(F.lit("REVISED "), F.col("text"))
    )
    print("upsert:", upsert_corpus_snapshot(spark, root, revised))
    head = load_corpus_snapshot(spark, root)
    print(
        "revised visible at head:",
        head.where(F.col("text").startswith("REVISED")).count(),
        "| pinned reader still sees:",
        pinned.where(F.col("text").startswith("REVISED")).count(),
    )

    # time travel + audit trail
    print("v1 via time travel:",
          load_corpus_snapshot(spark, root, version=1).count())
    for h in corpus_snapshot_history(root):
        print("  history:", h["version"], h["op"],
              {t: len(v) for t, v in h["added"].items()})

    # incremental consumer: ONLY what v2..v3 added, labeled
    feed = corpus_snapshot_changes(spark, root, since=1)
    feed.groupBy("_commit_version", "_commit_op").count().orderBy(
        "_commit_version"
    ).show()

    # maintenance: merge fragmented partitions, reclaim old generations
    print("compact:", compact_corpus_snapshot(
        spark, root, max_files_per_partition=1
    ))
    print("vacuum:", vacuum_corpus_snapshot(
        root, keep_manifests=1, min_age_seconds=0
    ))
    print("head rows after maintenance:",
          load_corpus_snapshot(spark, root).count())


if __name__ == "__main__":
    main()
