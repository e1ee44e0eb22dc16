"""Mixture planning + contamination audit + hybrid search — the three
round-9 additions in one flow:

1. ``decontaminate_attribution`` names WHICH benchmark doc each flagged
   training doc overlaps (the data-card audit trail, not just a bool),
2. ``epoch_mixture`` up-samples the clean survivors to a token budget
   at target domain weights (repeat factors, Llama-style epochs),
3. ``hybrid_topk`` serves BM25+dense retrieval over the corpus, fused
   by reciprocal-rank fusion (rank-only, score scales never compared).

Run: python examples/10_mixture_and_hybrid_search.py   (~40 s on local[8])
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import retrieval as R
from auto_data_linkage_spark.operators import text as X
from auto_data_linkage_spark.operators.dedup import (
    decontaminate_attribution,
)
from auto_data_linkage_spark.operators.pack import epoch_mixture
from auto_data_linkage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("example10", cpus=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # --- 1. contamination audit: train vs held-out benchmark slice
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    attribution = decontaminate_attribution(train, bench, shingle_k=5)
    worst = attribution.orderBy(F.desc("n_shared")).limit(5).collect()
    print(f"contaminated (train, bench) pairs: {attribution.count()}")
    for r in worst:
        print(
            f"  train doc {r.doc_id} shares {r.n_shared} 5-grams "
            f"with benchmark doc {r.bench_id}"
        )
    contaminated = {r.doc_id for r in attribution.select("doc_id").collect()}
    clean = train.where(~F.col("doc_id").isin(list(contaminated) or [-1]))

    # --- 2. plan the training mixture at fixed domain weights. Keep
    # the budget inside what max_repeat can realize (a domain can't
    # exceed its token count x the epoch cap) or shares drift toward
    # the uncapped domains.
    weights = {"en": 0.5, "de": 0.3, "fr": 0.2}
    budget = 150_000
    wt = clean.select(
        "doc_id", "lang", X.token_count(F.col("text")).alias("n_tokens")
    )
    mixed = epoch_mixture(wt, "lang", weights, token_budget=budget)
    stats = (
        mixed.groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("tokens"),
            F.max("epoch").alias("max_epoch"),
        )
        .collect()
    )
    total = sum(r.tokens for r in stats)
    print(f"\nmixture: {total} tokens against a {budget} budget")
    for r in sorted(stats, key=lambda r: r.lang):
        print(
            f"  {r.lang}: {r.tokens} tokens "
            f"({r.tokens / total:.2%} vs target {weights[r.lang]:.0%}), "
            f"up to {r.max_epoch} epochs"
        )

    # --- 3. hybrid search: BM25 + cosine, RRF-fused
    probe_docs = docs.where(F.col("doc_id") % 100 == 0)
    probes = R.query_terms_from_docs(probe_docs, n_terms=8)
    qv = emb.where(F.col("vec_id") % 100 == 0)
    fused = R.hybrid_topk(docs, emb, probes, qv, k=3, fetch_k=12)
    print("\nhybrid top-3 per query (RRF of BM25 + cosine):")
    for r in fused.orderBy("query_id", "rank").collect()[:9]:
        print(
            f"  q={r.query_id} #{r.rank}: doc {r.doc_id} (rrf {r.rrf:.4f})"
        )


if __name__ == "__main__":
    main()
