"""Deduplication end-to-end (the reference's
example-notebooks/01_Run_Example_Deduplication.py scenario, script form):
a dirty people table with typo'd duplicates → AutoLinker search → best
model → clusters + pairwise scores → supervised P/R/F1 against the known
entity ids.

Run: python examples/01_dedup.py        (finishes in ~2 min on local[8])
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from febrl_fixture import SCHEMA, make_people  # deterministic FEBRL fixture

from auto_data_linkage_spark import AutoLinker
from auto_data_linkage_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-dedup", cpus=8)
    rows = make_people(n_entities=300, dup_fraction=0.4, seed=7)
    df = spark.createDataFrame(rows, SCHEMA)

    linker = AutoLinker(
        max_evals=3,            # reference default is 5; >=100 for real runs
        comparison_size_limit=50_000,
        true_label="recid",     # supervised metrics per trial (optional)
        random_seed=7,
    )
    best = linker.auto_link(df)

    print("\nbest rule:", best.rule.to_sql())
    print("best comparisons:",
          [(c.column, c.method, c.threshold) for c in best.comparisons])
    print("unsupervised information-gain score:", round(best.score, 4))
    print("pairwise P/R/F1:",
          {k: round(v, 3) for k, v in best.metrics.items()
           if k in ("precision", "recall", "f1")})

    clusters = linker.best_clusters_at_threshold(0.8)
    sizes = clusters.groupBy("cluster_id").count()
    multi = sizes.where("count > 1").count()
    print("clusters with >1 record:", multi)
    clusters.select("cluster_id", "unique_id", "given_name", "surname").show(
        10, truncate=False
    )

    scores = linker.get_scores_df()
    scores.orderBy("match_probability", ascending=False).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
