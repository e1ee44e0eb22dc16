"""Final-mile corpus assembly + vector curation — the round-9e
additions in one flow:

1. ``embedding_outliers`` drops embedding-space outliers (far from
   their own cell centroid — the D4/SemDeDup outlier-removal step),
2. ``curriculum_stages`` + ``training_order`` declare an easy→hard,
   hash-shuffled-within training order over the surviving documents,
3. ``write_shards(order_cols=...)`` realizes that order physically in
   shard directories — the one exchange the writer pays anyway,
4. ``sq8_encode`` / ``sq8_topk`` persist a 4×-smaller scalar-quantized
   vector index and serve exact-reranked top-k from it.

Run: python examples/12_training_order_and_vector_curation.py  (~40 s)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import order as O
from auto_data_linkage_spark.operators import similarity as S
from auto_data_linkage_spark.operators.pack import write_shards
from auto_data_linkage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("example12", cpus=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    workdir = tempfile.mkdtemp(prefix="example12_")

    # --- 1. embedding-space outlier curation
    flags = S.embedding_outliers(emb, quantile=0.1)
    n_out = flags.where("is_outlier").count()
    print(f"outliers flagged: {n_out} of {emb.count()} "
          f"(bottom decile of cosine-to-own-centroid, per cell)")
    kept_vec_ids = flags.where(~F.col("is_outlier")).select("vec_id")
    # demo corpora: vec_id keys the embedding of doc_id at sf parity
    kept = docs.join(
        kept_vec_ids.withColumnRenamed("vec_id", "doc_id"),
        "doc_id",
        "left_semi",
    )

    # --- 2. curriculum: quartile stages over doc length, independent
    #        within-shard shuffle key, 8 shards
    staged = O.curriculum_stages(
        O.training_order(kept, n_shards=8, seed=42),
        "n_chars",
        n_stages=4,
        seed=42,
    )
    masses = staged.groupBy("stage").count().orderBy("stage").collect()
    print("curriculum stage masses:", {r["stage"]: r["count"] for r in masses})

    # --- 3. realize the order physically: one exchange, sorted shards
    shard_path = os.path.join(workdir, "shards")
    write_shards(staged, shard_path, 8, order_cols=["stage", "order_key"])
    back = spark.read.parquet(shard_path)
    one = back.where(F.col("shard") == 0).select("stage", "order_key").collect()
    keys = [(r["stage"], r["order_key"]) for r in one]
    assert keys == sorted(keys), "shard 0 must be in curriculum order"
    print(f"wrote {back.count()} rows into 8 curriculum-ordered shards "
          f"at {shard_path}")

    # --- 4. SQ8 vector index: persist int8 codes, serve reranked top-k
    codes_path = os.path.join(workdir, "sq8_codes")
    S.sq8_encode(emb).write.parquet(codes_path)
    codes = spark.read.parquet(codes_path)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    hits = S.sq8_topk(emb, queries, k=3, codes=codes, rerank_factor=4)
    print("SQ8-served top-3 (exact-reranked), first rows:")
    for r in hits.orderBy("query_id", "rank").limit(6).collect():
        print(f"  query {r['query_id']} -> {r['neighbor_id']} "
              f"(cosine {r['cosine']:.4f}, rank {r['rank']})")

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
