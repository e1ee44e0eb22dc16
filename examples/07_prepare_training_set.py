"""One-call training-set preparation: the capstone composition —

    URL front door (normalize, blocklist, url dedup, per-domain quota)
      -> curate (quality/lang gate, exact + verified near dedup)
      -> FULL Gopher gate (document rules AND repetition rules)
      -> offset-robust span dedup (sliding grams, hash-keyed exchange)
      -> BPE trained on the SURVIVING corpus, tokenizer.json exported
         with the EOS special token
      -> context-window packing (EOS marks every doc boundary)
      -> whole-packed-sequence shard=N/ export a training loader streams

Every heavy stage checkpoints under out/_stages/ — rerun the script
with the same OUT dir and it resumes instead of recomputing.

Run: python examples/07_prepare_training_set.py   (~1 min on local[8])
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auto_data_linkage_spark.operators.pipeline import prepare_training_set
from auto_data_linkage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("example07", cpus=8)
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id",
        "text",
        # the synthetic table has no URL column; derive one from the
        # source so the URL front door has something to curate
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    out = tempfile.mkdtemp(prefix="trainset_")
    report = prepare_training_set(
        docs,
        out,
        min_quality=0.3,
        gopher_min_words=5,
        # the synthetic corpus is keyword soup — swap the paper's
        # English required-stopword inventory for one that fits it
        gopher_required_stopwords=("the", "a", "key", "value", "table"),
        span_words=5,
        num_merges=80,
        capacity=1024,
        n_shards=8,
        url_col="url",
        blocked_domains=["src19.example.com"],
        max_per_domain=200,
        eos_token="<|endoftext|>",
    )
    print(json.dumps(report, indent=2))
    loaded = spark.read.parquet(report["shards_path"])
    print("shards rows:", loaded.count(), "| columns:", loaded.columns)
    print("tokenizer:", report["tokenizer_path"])
    spark.stop()


if __name__ == "__main__":
    main()
