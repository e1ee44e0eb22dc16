"""Pre-training corpus assembly end-to-end: the full pipeline a
training-data team runs between "raw crawl" and "token shards", using
only this engine's declarative operators:

    curate (quality + lang filter -> exact dedup -> verified near dedup)
      -> chunk-level exact substring dedup
      -> benchmark decontamination (n-gram overlap, broadcast anti-join)
      -> LM quality scores (corpus unigram + bigram surprise)
      -> temperature-weighted domain mixing (count^alpha)
      -> context-window sequence packing

Every stage is a DataFrame program (no UDFs); the same stages are
individually value-checked against DuckDB oracles in the query catalog.

Run: python examples/04_pretraining_corpus.py   (~1 min on local[8])
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.dedup import chunk_dedup, decontaminate
from auto_data_linkage_spark.operators.lm import bigram_logprob, unigram_logprob
from auto_data_linkage_spark.operators.pack import mixture_sample, pack_stats
from auto_data_linkage_spark.operators.pipeline import curate_documents
from auto_data_linkage_spark.operators.text import token_count
from auto_data_linkage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("example-corpus", cpus=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_raw = docs.count()

    # 1. curation: quality/lang gate, exact dedup, verified near dedup
    survivors = curate_documents(docs)
    curated = docs.join(survivors.select("doc_id"), "doc_id", "semi")
    n_curated = curated.count()

    # 2. chunk-level exact substring dedup (reassembled text)
    chunked = chunk_dedup(curated, chunk_words=8)
    deduped = (
        chunked.where(F.col("n_kept") > 0)
        .select("doc_id", F.col("dedup_text").alias("text"))
        .join(curated.select("doc_id", "lang", "source"), "doc_id")
    )
    n_chunk = deduped.count()

    # 3. decontamination against a holdout slice (stand-in benchmark)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    verdicts = decontaminate(deduped, bench, shingle_k=5)
    clean = deduped.join(
        verdicts.where(F.col("keep")).select("doc_id"), "doc_id", "semi"
    )
    n_clean = clean.count()

    # 4. LM quality scores (join both; useful as downstream filters)
    uni = unigram_logprob(clean)
    bi = bigram_logprob(clean)
    scored = clean.join(uni.select("doc_id", "avg_neg_logp"), "doc_id").join(
        bi.select("doc_id", "avg_neg_logp2"), "doc_id", "left"
    )

    # 5. temperature-weighted domain mixing over sources
    mixed = mixture_sample(
        scored, "source", alpha=0.5, target_fraction=0.6
    )
    n_mixed = mixed.count()

    # 6. pack into 512-token context windows; report utilization
    with_tokens = mixed.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    bins = pack_stats(with_tokens, capacity=512, num_buckets=8)
    util = bins.agg(
        F.count("*").alias("n_bins"),
        F.round(F.avg(F.col("tokens") / 512.0), 4).alias("avg_fill"),
    ).collect()[0]

    print("FUNNEL raw:", n_raw, "curated:", n_curated, "chunk-deduped:",
          n_chunk, "decontaminated:", n_clean, "mixed:", n_mixed)
    print("PACKING bins:", util["n_bins"], "avg_fill:", util["avg_fill"])
    assert n_raw >= n_curated >= n_chunk >= n_clean >= n_mixed > 0
    assert util["n_bins"] > 0 and 0 < util["avg_fill"] <= 1.1
    print("OK corpus assembly pipeline complete")


if __name__ == "__main__":
    main()
