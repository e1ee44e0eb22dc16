"""A/B: manifest-layout vs rename-layout READ PATH (VERDICT r11 #2).

Builds the same lexical (BM25) and ANN (IVF-PQ) indexes in both
layouts at the given scale factor, then times LOAD (handle open: one
manifest JSON read + DataFrame plan vs index.json read) and PROBE
(the full top-k query) separately, over R repetitions, reporting the
minimum (quiet-machine estimate) and median. Three manifest states
are measured:

- ``manifest``      — freshly built, 1 generation per partition;
- ``manifest-frag`` — after 20 appends (21 generations per touched
                       partition — the streaming-sink worst case);
- ``manifest-comp`` — the fragmented store after one compaction.

Usage: python tools/manifest_ab.py [sf_dir] [reps]
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

from auto_data_linkage_spark.operators import annindex as A
from auto_data_linkage_spark.operators import lexindex as L
from auto_data_linkage_spark.operators.retrieval import query_terms_from_docs
from auto_data_linkage_spark.session import get_spark


def timed(fn, reps):
    outs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        outs.append(time.perf_counter() - t0)
    return {"min": round(min(outs), 4), "median": round(statistics.median(outs), 4)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(
        "manifest-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").localCheckpoint(
        eager=True
    )
    probes = query_terms_from_docs(
        docs.orderBy("doc_id").limit(50), n_terms=6
    ).localCheckpoint(eager=True)
    qvecs = emb.orderBy("vec_id").limit(50).localCheckpoint(eager=True)

    work = tempfile.mkdtemp(prefix="manifest_ab_")
    out: dict = {"sf_dir": sf_dir, "reps": reps, "lex": {}, "ann": {}}
    try:
        # ------------------------------------------------------- lexical
        head = docs.where(F.col("doc_id") % 21 == 0)
        slices = [docs.where(F.col("doc_id") % 21 == i) for i in range(1, 21)]
        roots = {
            "rename": os.path.join(work, "lex_rename"),
            "manifest": os.path.join(work, "lex_manifest"),
        }
        for layout, root in roots.items():
            L.build_lex_index(docs, root, n_buckets=32, layout=layout)
        frag = os.path.join(work, "lex_frag")
        L.build_lex_index(head, frag, n_buckets=32, layout="manifest")
        for s in slices:
            L.append_lex_index(s, frag)

        def lex_load(root):
            return lambda: L.load_lex_index(spark, root)

        def lex_probe(root):
            def run():
                idx = L.load_lex_index(spark, root)
                L.lex_index_topk(idx, probes, k=10).count()

            return run

        for name, root in list(roots.items()) + [("manifest-frag", frag)]:
            out["lex"][name] = {
                "load": timed(lex_load(root), reps),
                "probe": timed(lex_probe(root), reps),
            }
        L.compact_lex_index(spark, frag, max_files_per_bucket=1)
        out["lex"]["manifest-comp"] = {
            "load": timed(lex_load(frag), reps),
            "probe": timed(lex_probe(frag), reps),
        }

        # ----------------------------------------------------------- ann
        aroots = {
            "rename": os.path.join(work, "ann_rename"),
            "manifest": os.path.join(work, "ann_manifest"),
        }
        for layout, root in aroots.items():
            A.build_ann_index(emb, root, layout=layout)
        ahead = emb.where(F.col("vec_id") % 21 == 0)
        afrag = os.path.join(work, "ann_frag")
        A.build_ann_index(ahead, afrag, layout="manifest")
        for i in range(1, 21):
            A.append_ann_index(emb.where(F.col("vec_id") % 21 == i), afrag)

        def ann_load(root):
            return lambda: A.load_ann_index(spark, root)

        def ann_probe(root):
            def run():
                idx = A.load_ann_index(spark, root)
                A.ann_index_topk(idx, qvecs, k=10, nprobe=2).count()

            return run

        for name, root in list(aroots.items()) + [("manifest-frag", afrag)]:
            out["ann"][name] = {
                "load": timed(ann_load(root), reps),
                "probe": timed(ann_probe(root), reps),
            }
        A.compact_ann_index(spark, afrag, max_files_per_cell=1)
        out["ann"]["manifest-comp"] = {
            "load": timed(ann_load(afrag), reps),
            "probe": timed(ann_probe(afrag), reps),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
