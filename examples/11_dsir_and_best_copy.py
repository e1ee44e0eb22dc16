"""Target-steered data selection + quality-aware dedup — the round-9d
additions in one flow:

1. ``dsir_resample`` selects raw documents toward a target distribution
   by hashed-n-gram importance resampling (Xie et al. 2023) — here the
   corpus's German slice plays the "high-quality target" and the rest
   is the raw crawl,
2. ``keep_best_in_cluster`` then deduplicates the selection keeping the
   LONGEST copy of each near-dup cluster (the FineWeb-style refinement
   over min-id survivors).

Run: python examples/11_dsir_and_best_copy.py   (~40 s on local[8])
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from auto_data_linkage_spark.cluster import connected_components
from auto_data_linkage_spark.operators.dedup import (
    keep_best_in_cluster,
    minhash_dedup_pairs,
)
from auto_data_linkage_spark.operators.dsir import (
    dsir_logweights,
    dsir_resample,
)
from auto_data_linkage_spark.operators.text import token_count
from auto_data_linkage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("example11", cpus=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # --- 1. importance weights: raw crawl scored against the target
    target = docs.where(F.col("lang") == "de")
    raw = docs.where(F.col("lang") != "de")
    lw = dsir_logweights(raw, target)
    stats = lw.agg(
        F.min("log_w").alias("lo"),
        F.expr("percentile_approx(log_w, 0.5)").alias("med"),
        F.max("log_w").alias("hi"),
    ).collect()[0]
    print(
        f"log importance weights over {lw.count()} raw docs: "
        f"min {stats.lo:.1f}  median {stats.med:.1f}  max {stats.hi:.1f}"
    )

    # --- 2. resample 200 docs toward the target (deterministic)
    selected = dsir_resample(raw, target, 200)
    sel_docs = docs.join(selected.select("doc_id"), "doc_id")
    mix = sel_docs.groupBy("lang").count().orderBy("lang").collect()
    print("selected language mix:", {r.lang: r["count"] for r in mix})

    # --- 3. dedup the selection, keeping the longest copy per cluster
    pairs = minhash_dedup_pairs(sel_docs, jaccard_threshold=0.5)
    comp = connected_components(
        pairs.select(
            F.col("doc_id_l").alias("src"), F.col("doc_id_r").alias("dst")
        )
    )
    scored = sel_docs.withColumn("n_tokens", token_count("text"))
    kept = keep_best_in_cluster(scored, comp, "n_tokens")
    print(
        f"near-dedup: {sel_docs.count()} selected -> {kept.count()} kept "
        f"(longest copy survives each cluster)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
