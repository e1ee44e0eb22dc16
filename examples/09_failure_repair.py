"""Durability walkthrough: a writer dies mid-overwrite, the commit log
records the failure, `failed_commits()` names the partitions that may
be torn, and one repairing re-upsert clears the report.

Completes the corpus-lifecycle story of 05_corpus_lifecycle.py: that
example shows the happy path of versioned upserts; this one shows what
the `_commits/` log buys you when a writer does NOT survive — the
scenario plain dynamic-partition-overwrite leaves silently corrupt.

Run: python examples/09_failure_repair.py     (~30 s on local[8])
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auto_data_linkage_spark.session import get_spark
from auto_data_linkage_spark.sources import layout as L


def mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def main() -> None:
    spark = get_spark("example-failure-repair", cpus=8)
    root = os.path.join(tempfile.mkdtemp(prefix="repair_"), "corpus")

    # 1. Seed a versioned corpus: v1 commits cleanly.
    L.upsert_corpus_versioned(
        spark, root,
        mk(spark, [(1, "en", "alpha"), (2, "de", "beta")]),
        key="doc_id", partition_by=["lang"],
    )
    print("v1 committed:", [c["state"] for c in L._read_commits(
        L.PosixCommitStore(L._commit_log_dir(root)))])

    # 2. A writer dies between winning its version token and finishing
    #    the partition overwrite (simulated by failing the overwrite
    #    phase). The token flips to state=failed and KEEPS the list of
    #    partitions it intended to touch.
    real = L._overwrite_touched
    L._overwrite_touched = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("executor lost mid-overwrite")
    )
    try:
        L.upsert_corpus_versioned(
            spark, root, mk(spark, [(3, "en", "gamma")]),
            key="doc_id", partition_by=["lang"],
        )
    except RuntimeError as e:
        print("writer died:", e)
    finally:
        L._overwrite_touched = real

    # 3. The repair report: partitions possibly torn by the dead writer
    #    and not yet covered by a later committed version. The list is a
    #    conservative OVER-approximation (a writer that died before
    #    replacing anything still reports its full intended footprint) —
    #    re-upserting a healthy partition is a harmless rewrite.
    failed = L.failed_commits(root)
    for c in failed:
        print(f"v{c['version']} failed; partitions needing repair:",
              c["unrepaired"])
    assert failed and failed[0]["unrepaired"] == [("en",)]

    # 4. Repair by re-upsert: any committed upsert covering the torn
    #    partitions clears them from the report. Version numbering
    #    continues past the failed token — later writers are not blocked.
    r = L.upsert_corpus_versioned(
        spark, root, mk(spark, [(3, "en", "gamma")]),
        key="doc_id", partition_by=["lang"], conflict_wait_s=2.0,
    )
    print(f"repair committed as v{r['version']};",
          "failed_commits now:", L.failed_commits(root))
    assert L.failed_commits(root) == []

    got = sorted(r.doc_id for r in spark.read.parquet(root).collect())
    print("corpus rows after repair:", got)
    assert got == [1, 2, 3]
    print("OK")


if __name__ == "__main__":
    main()
