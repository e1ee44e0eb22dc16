"""Incremental + streaming entity resolution (green-field extension; the
reference always re-clusters from scratch, autolinker.py:1063-1066):

1. Cluster a base table once with a trained Fellegi–Sunter model.
2. Fold an arriving batch in with delta-sized work
   (``incremental_assign`` — existing clusters contract to super-nodes,
   connected components runs on the delta graph only).
3. Show the result equals a full re-clustering, labels included.
4. Run the same maintenance continuously with ``StreamingLinker``
   (Structured Streaming foreachBatch, replay-idempotent snapshots).

Run: python examples/03_incremental.py   (finishes in ~2 min on local[8])
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

from febrl_fixture import SCHEMA, make_people
from pyspark.sql import functions as F

from auto_data_linkage_spark import (
    Comparison,
    FellegiSunterModel,
    apply_increment,
    cluster_at_threshold,
    incremental_assign,
)
from auto_data_linkage_spark.session import get_spark
from auto_data_linkage_spark.streaming.linkage import StreamingLinker

THRESHOLD = 0.9


def build_model() -> FellegiSunterModel:
    return FellegiSunterModel(
        comparisons=[
            Comparison("given_name", "levenshtein", 2),
            Comparison("surname", "levenshtein", 2),
            Comparison("suburb", "levenshtein", 2),
            Comparison("postcode", "levenshtein", 1),
        ],
        blocking_rules=[("surname",), ("postcode",)],
        prior=1.0 / 1000,  # FIXED prior: scoring must not depend on batch size
    )


def main() -> None:
    spark = get_spark("example-incremental", cpus=8)
    rows = make_people(n_entities=300, dup_fraction=0.5, seed=31)
    df = spark.createDataFrame(rows, SCHEMA)
    base = df.where(F.col("unique_id").cast("long") % 4 != 0)
    batch = df.where(F.col("unique_id").cast("long") % 4 == 0)
    model = build_model()

    # 1. one-time base clustering (the expensive asset)
    base_clusters = cluster_at_threshold(
        base, model.predict(base), THRESHOLD
    ).localCheckpoint(eager=True)

    # 2. delta-sized fold of the arriving batch
    inc = incremental_assign(model, base_clusters, batch, threshold=THRESHOLD)
    print("batch assignments:", inc.assignments.count(), "rows")
    print("cluster merges caused by the batch:")
    inc.merges.show(5, truncate=False)
    merged = apply_increment(base_clusters, batch, inc)

    # 3. parity with full re-clustering (labels included)
    full = cluster_at_threshold(df, model.predict(df), THRESHOLD)
    to_map = lambda d: {  # noqa: E731
        r[0]: r[1]
        for r in d.select(
            F.col("unique_id").cast("string"), F.col("cluster_id").cast("string")
        ).collect()
    }
    assert to_map(merged) == to_map(full)
    print("incremental result == full re-clustering on", full.count(), "records")

    # 4. the same loop as a continuously-maintained streaming state
    with tempfile.TemporaryDirectory() as root:
        in_dir, state, ckpt = (
            f"{root}/in", f"{root}/state", f"{root}/ckpt"
        )
        linker = StreamingLinker(build_model(), state, threshold=THRESHOLD)
        for part in (base, batch):
            part.write.mode("append").parquet(in_dir)
            stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
            linker.attach(stream, ckpt).awaitTermination()
        final = linker.current_clusters(spark)
        assert to_map(final) == to_map(full)
        print("streaming-maintained state matches too:", final.count(), "records")


if __name__ == "__main__":
    main()
