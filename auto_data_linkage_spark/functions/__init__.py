"""Reference-surface facade: same-named equivalents of the reference's
``arc.sql.functions`` py4j bindings (functions.py:25-104), implemented as
pure DataFrame programs instead of JVM Catalyst expressions.

The reference's functions return Columns backed by custom
TypedImperativeAggregates; a faithful Column facade would reintroduce
row-at-a-time aggregation. These take the DataFrame and return the
aggregate RESULT in the same shape (maps / rule DataFrame), which is how
every reference call site consumes them (collected immediately:
ARC.scala:107-110, autolinker.py:142).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from auto_data_linkage_spark.blocking import generate_blocking_rules
from auto_data_linkage_spark.profile import (
    column_combinations,
    column_entropies,
    combo_value_counts,
)

__all__ = [
    "arc_combinatorial_count_agg",
    "arc_entropy_agg",
    "arc_generate_blocking_rules",
    "arc_merge_count_map_agg",
]


def arc_entropy_agg(
    df: DataFrame, base: int | float | str, *attributes: str
) -> dict[str, float]:
    """Reference ``arc_entropy_agg(base, *cols)`` (functions.py:61-78 →
    ARC_EntropyAggExpression): per-column Shannon entropy map. ``base=0``
    means auto (each column's distinct count), matching the reference's
    base-0 mode."""
    b = "distinct" if base in (0, "0", "auto") else float(base)
    return column_entropies(df, list(attributes), base=b)


def arc_combinatorial_count_agg(
    df: DataFrame, nc: int, t: int, *attributes: str
) -> DataFrame:
    """Reference ``arc_combinatorial_count_agg(nc, t, *cols)``
    (functions.py:25-40 → ARC_CombinatorialCountAgg): counts of identical
    value-tuples for every ≤nc-column combination, pruned at threshold
    ``t``. Returns (combo, vals, cnt) rows — the exploded form of the
    reference's ``"cols;vals" → count`` map."""
    combos = column_combinations(list(attributes), nc)
    return combo_value_counts(df, combos, min_count=max(t, 1))


def arc_merge_count_map_agg(counts: DataFrame) -> DataFrame:
    """Reference ``arc_merge_count_map_agg`` (functions.py:43-58 →
    ARC_MergeCountMapAgg): key-wise sum of per-partition count maps. The
    exploded representation makes this a plain groupBy-sum; provided for
    drop-in shape parity when re-merging split count tables."""
    from pyspark.sql import functions as F

    return counts.groupBy("combo", "vals").agg(F.sum("cnt").alias("cnt"))


def arc_generate_blocking_rules(
    df: DataFrame, n: int, k: int, *attributes: str
) -> DataFrame:
    """Reference ``arc_generate_blocking_rules(df, n, k, *cols)``
    (functions.py:81-104 → ARC.scala:103-113): candidate OR-of-AND
    blocking rules with estimated squared counts, as a
    (splink_rule, rule_squared_count) DataFrame."""
    rules = generate_blocking_rules(
        df,
        list(attributes),
        max_columns_per_and_rule=n,
        max_rules_per_or_rule=k,
        comparison_size_limit=2**63 - 1,  # reference filters later
    )
    spark = df.sparkSession
    from auto_data_linkage_spark.session import local_rows_df

    return local_rows_df(
        spark,
        [(r.to_sql(), int(r.estimated_pairs)) for r in rules],
        "splink_rule string, rule_squared_count long",
    )
