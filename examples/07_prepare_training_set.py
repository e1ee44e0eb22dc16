"""One-call training-set preparation: the capstone composition over the
round-7 surfaces —

    curate (quality/lang gate, exact + verified near dedup)
      -> Gopher hard document rules (integer-exact gates)
      -> offset-robust span dedup (sliding grams, hash-keyed exchange)
      -> BPE trained on the SURVIVING corpus, tokenizer.json exported
      -> context-window packing
      -> deterministic shard=N/ export a training loader streams

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
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
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
    )
    print(json.dumps(report, indent=2))
    loaded = spark.read.parquet(report["shards_path"])
    print("shards rows:", loaded.count(), "| columns:", loaded.columns)
    print("tokenizer:", report["tokenizer_path"])
    spark.stop()


if __name__ == "__main__":
    main()
