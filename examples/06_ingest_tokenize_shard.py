"""Ingest → tokenize → shard: the dataset-EXPORT half of the pipeline
(example 04 covers curation/mixing), using the round-6 surfaces:

    permissive JSONL ingest with corrupt-record quarantine
      -> content-hash ids (stable across re-ingest)
      -> real BPE: train merges on the corpus, encode to token ids
      -> deterministic hash-shuffled shard=N/ export
      -> one-row dataset card + mergeable sketch stats

Run: python examples/06_ingest_tokenize_shard.py   (~1 min on local[8])
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import bpe as B
from auto_data_linkage_spark.operators import sketch as SK
from auto_data_linkage_spark.operators.pack import write_shards
from auto_data_linkage_spark.operators.report import corpus_report
from auto_data_linkage_spark.session import get_spark
from auto_data_linkage_spark.sources import ingest as I

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
SCHEMA = "doc_id long, text string, lang string"


def main() -> None:
    spark = get_spark("example-export", cpus=8)
    work = tempfile.mkdtemp(prefix="corpus_export_")

    # 0. simulate a crawl landing dir: parquet -> jsonl (+ bad lines)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    landing = f"{work}/landing"
    docs.write.json(landing)
    with open(f"{landing}/bad.jsonl", "w") as fh:
        fh.write('{oops\n{"doc_id": null, "text": null, "lang": "en"}\n')

    # 1. permissive ingest: one scan classifies every line
    raw = I.read_jsonl_corpus(spark, landing, SCHEMA)
    clean, quarantine = I.split_quarantine(raw, required=["doc_id", "text"])
    print("ingest:", I.ingest_report(clean, quarantine).collect()[0])

    # 2. content-hash ids: the stable dedup/upsert key
    clean = I.with_content_id(clean)

    # 3. real BPE: merges from the corpus word-frequency table, then
    #    model-ready token ids (array<int>)
    merges = B.train_bpe(clean, num_merges=80)
    vocab = B.bpe_vocab(clean, merges)
    encoded = B.bpe_encode_ids(clean, merges, vocab)
    print(f"bpe: {len(merges)} merges, vocab {len(vocab)}")

    # 4. deterministic sharding: hash-derived global shuffle, one
    #    exchange, shard=N/ directories each sorted by one reducer
    shards = f"{work}/shards"
    write_shards(
        encoded.select("doc_id", "content_id", "token_ids", "lang"),
        shards,
        n_shards=4,
    )
    sizes = (
        spark.read.parquet(shards)
        .groupBy("shard")
        .agg(F.count("*").alias("docs"), F.sum(F.size("token_ids")).alias("tokens"))
        .orderBy("shard")
    )
    print("shards:")
    sizes.show()

    # 5. release stats: exact dataset card + mergeable sketches the next
    #    ingest batch can union into
    print("card:", corpus_report(clean).collect()[0])
    hll = SK.hll_build(clean.select(F.md5("text").alias("fp")), "fp")
    print("distinct sketch:", SK.hll_estimate(hll).collect()[0].distinct_est)

    spark.stop()


if __name__ == "__main__":
    main()
