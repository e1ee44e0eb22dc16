"""Corpus snapshot READ-path measurement (VERDICT r12 ask #6) — the
corpusstore twin of tools/manifest_ab.py.

Builds the documents table into a corpus snapshot store
(:mod:`auto_data_linkage_spark.sources.corpusstore`) in three states
and times, over R repetitions (min/median seconds):

- LOAD — open the reading handle (head-manifest point read + the
  multi-path DataFrame plan over live generations);
- SCAN — a full-corpus aggregate (count + total text length), i.e.
  the real data-read cost of the live set;
- FEED — the change feed of the LAST commit
  (``corpus_snapshot_changes``), the incremental consumer's unit read.

States: ``healthy`` = one build commit (1 generation per partition);
``frag`` = built from 1/21 of the corpus + 20 appends (one generation
per append per touched partition — the streaming-sink worst case);
``comp`` = the fragmented store after one compaction.

Usage: python tools/corpus_ab.py [sf_dir] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import manifestfs as M
from auto_data_linkage_spark.session import get_spark
from auto_data_linkage_spark.sources import corpusstore as C


def timed(fn, reps):
    outs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        outs.append(time.perf_counter() - t0)
    return {
        "min": round(min(outs), 4),
        "median": round(statistics.median(outs), 4),
    }


def measure(spark, path, reps):
    head = M.read_manifest(path)["version"]

    def load():
        C.load_corpus_snapshot(spark, path)

    def scan():
        C.load_corpus_snapshot(spark, path).agg(
            F.count("*"), F.sum(F.length("text"))
        ).collect()

    def feed():
        C.corpus_snapshot_changes(
            spark, path, since=head - 1, until=head
        ).agg(F.count("*")).collect()

    files = sum(C.corpus_file_counts(path).values()) if hasattr(
        C, "corpus_file_counts"
    ) else sum(
        M.part_file_counts(path, "data", M.read_manifest(path)).values()
    )
    return {
        "load": timed(load, reps),
        "scan": timed(scan, reps),
        "feed": timed(feed, reps),
        "data_files": files,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(
        "corpus-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang")
        .localCheckpoint(eager=True)
    )
    root = tempfile.mkdtemp(prefix="corpus_ab_")
    out = {"sf_dir": sf_dir, "reps": reps, "n_docs": docs.count()}
    try:
        healthy = os.path.join(root, "healthy")
        C.build_corpus_snapshot(
            docs, healthy, key="doc_id", partition_by=["lang"]
        )
        out["healthy"] = measure(spark, healthy, reps)

        frag = os.path.join(root, "frag")
        C.build_corpus_snapshot(
            docs.where(F.col("doc_id") % 21 == 0), frag,
            key="doc_id", partition_by=["lang"],
        )
        for m in range(1, 21):
            C.append_corpus_snapshot(
                frag, docs.where(F.col("doc_id") % 21 == m)
            )
        out["frag"] = measure(spark, frag, reps)

        C.compact_corpus_snapshot(spark, frag, max_files_per_partition=1)
        out["comp"] = measure(spark, frag, reps)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
