"""Headline-dedup scale probe (VERDICT r14 ask #4): the banded-join
scaling law, evidenced past the bench SF.

Correctness for the exact → MinHash-LSH → keep-best chain is certified
at sf0.01 (oracle) and perf at sf0.1 (bench); this runs the SAME three
catalog queries on a documents table scaled ~10–1200× past sf0.1 —
where skew and memory effects first appear — and records the numbers
the Σ bucket² law predicts should stay tame:

- wall per stage (catalog entries verbatim, noop-sink materialized),
- Σ bucket² and the max bucket of the band table (the pair-generation
  cost law: the self-join emits at most Σ bucket² pairs),
- total + peak-stage shuffle write bytes (Spark UI REST — the probe
  session enables the UI).

Corpus construction (deterministic): each sf0.1 document is replicated
``reps`` times at distinct ids; replicas r∈{1,2} keep the text verbatim
(planted near/exact-dup clusters of size 3, ~0.25%% pair mass at the
default), every other replica appends a unique salt token so its
shingle set is distinct — realistic dup density, no artificial
mega-buckets (the max_bucket cap still engages on the template docs the
real corpus carries).

Usage: python tools/dedup_scale.py [reps] [out_dir]
       (default reps=1200 -> ~6M docs ≈ sf1.0-equivalent text volume)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from auto_data_linkage_spark.session import get_spark


def _ui_stage_metrics(port: int = 4040) -> dict:
    """Total + peak per-stage shuffle write bytes from the UI REST API."""
    try:
        apps = json.load(
            urllib.request.urlopen(f"http://localhost:{port}/api/v1/applications")
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"http://localhost:{port}/api/v1/applications/{app_id}/stages"
            )
        )
    except Exception as e:  # UI off / port taken: report, don't fail the probe
        return {"error": str(e)}
    writes = [s.get("shuffleWriteBytes", 0) for s in stages]
    return {
        "shuffle_write_bytes_total": int(sum(writes)),
        "shuffle_write_bytes_peak_stage": int(max(writes, default=0)),
        "n_stages": len(stages),
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/dedup_scale_{reps}x"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark(
        "dedup-scale", cpus=cpus, extra_conf={"spark.ui.enabled": "true"}
    )

    src = "/root/testdata/sf0.1/documents.parquet"
    docs_path = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(docs_path):
        base = spark.read.parquet(src)
        r = spark.range(reps).select(F.col("id").cast("int").alias("rep"))
        scaled = (
            base.crossJoin(F.broadcast(r))
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(100_000_000)).alias(
                    "doc_id"
                ),
                F.when(F.col("rep") <= 2, F.col("text"))
                .otherwise(
                    F.concat(
                        F.col("text"),
                        F.lit(" uniq"),
                        F.col("rep").cast("string"),
                        F.lit("_"),
                        F.col("doc_id").cast("string"),
                    )
                )
                .alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        scaled.write.mode("overwrite").parquet(docs_path)
    n_docs = spark.read.parquet(docs_path).count()

    from auto_data_linkage_spark import queries as catalog

    qs = catalog.queries()
    timings: dict[str, float] = {}
    for name in ("exact_dedup", "minhash_lsh_pairs", "near_dedup_keep_best"):
        t0 = time.perf_counter()
        qs[name](spark, out_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 1)

    # the cost law the caps enforce: Σ bucket² of the band table at the
    # catalog entry's knobs (4 hashes, 4 bands of 1 row, k=3 shingles)
    from auto_data_linkage_spark.operators.dedup import banded_table
    from auto_data_linkage_spark.queries_llm import _MH_HASHES, _SHINGLE_K

    buckets = (
        banded_table(
            spark.read.parquet(docs_path),
            num_hashes=_MH_HASHES,
            num_bands=_MH_HASHES,
            shingle_k=_SHINGLE_K,
        )
        .groupBy("band", "band_hash")
        .count()
    )
    law = buckets.agg(
        F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
        F.max("count").alias("max_bucket"),
        F.count("*").alias("n_buckets"),
    ).collect()[0]

    out = {
        "metric": "dedup_scale",
        "rows": int(n_docs),
        "reps": reps,
        "sec": timings,
        "total_sec": round(sum(timings.values()), 1),
        "sum_bucket_sq": int(law["sum_sq"]),
        "max_bucket": int(law["max_bucket"]),
        "n_buckets": int(law["n_buckets"]),
        "cpus": cpus,
    }
    out.update(_ui_stage_metrics())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
