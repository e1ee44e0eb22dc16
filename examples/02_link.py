"""Linking two tables with MISMATCHED schemas (the reference's
integration-tests/linking_test.py scenario, script form): table B renames
its columns and drops date_of_birth; the engine infers the column
correspondence by value overlap (reference ``estimate_linking_columns``,
autolinker.py:961-1020), aligns both tables to a synthetic common schema,
then runs the AutoLinker in link mode.

Run: python examples/02_link.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from febrl_fixture import SCHEMA, make_people

from auto_data_linkage_spark import AutoLinker
from auto_data_linkage_spark.linking import column_correspondence
from auto_data_linkage_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-link", cpus=8)
    rows = make_people(n_entities=250, dup_fraction=1.0, seed=11)
    df = spark.createDataFrame(rows, SCHEMA)

    # originals → table A; duplicates → table B with a mangled schema
    # (renamed columns, date_of_birth dropped — the reference's induced
    # schema mismatch)
    originals = df.dropDuplicates(["recid"])
    dupes = df.join(originals, ["unique_id"], "left_anti")
    table_b = dupes.selectExpr(
        "unique_id",
        "given_name AS first_name",
        "surname AS family_name",
        "suburb AS town",
        "postcode AS zip",
        "state AS region",
        "recid",
    )

    pairs = column_correspondence(
        originals, table_b, exclude=("unique_id", "recid")
    )
    print("inferred column correspondence:")
    for a, b, overlap in pairs:
        print(f"  {a:14s} <-> {b:12s} (overlap {overlap})")

    linker = AutoLinker(
        max_evals=3,
        comparison_size_limit=50_000,
        true_label="recid",
        random_seed=11,
    )
    best = linker.auto_link([originals, table_b])
    print("\nbest rule:", best.rule.to_sql())
    print("pairwise P/R/F1:",
          {k: round(v, 3) for k, v in best.metrics.items()
           if k in ("precision", "recall", "f1")})

    scores = linker.get_scores_df()
    print("top cross-table matches:")
    scores.orderBy("match_probability", ascending=False).select(
        "unique_id_l", "unique_id_r", "match_probability"
    ).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
