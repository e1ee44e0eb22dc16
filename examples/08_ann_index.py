"""Persisted ANN index lifecycle: encode the corpus ONCE into an
on-disk IVF-PQ index, then serve top-k from the stored artifacts —
the pattern that amortizes the expensive corpus pass across sessions
(and, at real scale, across teams querying one shared index).

    build_ann_index(corpus, path)   # one corpus pass -> path/
    idx = load_ann_index(spark, path)
    ann_index_topk(idx, queries, k=10, nprobe=2)

The coded corpus is written partitionBy(cell): each query's nprobe
cells prune the parquet scan to the matching cell=N/ directories.

Run: python examples/08_ann_index.py   (~30 s on local[8])
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auto_data_linkage_spark.operators.annindex import (
    ann_index_topk,
    build_ann_index,
    load_ann_index,
)
from auto_data_linkage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("example08", cpus=8)
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    path = tempfile.mkdtemp(prefix="annidx_")

    meta = build_ann_index(vecs, path, m=8, n_codewords=16)
    print(f"indexed {meta['n_rows']} vectors into {meta['n_cells']} cells")
    print("artifacts:", sorted(os.listdir(path)))

    idx = load_ann_index(spark, path)
    queries = vecs.limit(5)
    print("-- PQ top-k from the stored index --")
    ann_index_topk(idx, queries, k=3, nprobe=2).show()
    print("-- exact-reranked (needs the true-vector corpus) --")
    ann_index_topk(
        idx, queries, k=3, nprobe=2, rerank_factor=4, corpus=vecs
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
