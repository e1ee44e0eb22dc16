"""Link-mode schema handling (reference parity: SURVEY §1.2 / §2.3 J2 —
``estimate_linking_columns``, autolinker.py:961-1020).

When linking two tables whose schemas differ, the reference infers the
column correspondence by joining EVERY column of table A against EVERY
column of table B (after cleaning) and keeping the pairing with the
highest inner-join match count — |A|·|B| separate joins.

Spark-first redesign: melt both tables to (column, value) long form and
join ONCE on value; the per-(col_a, col_b) match counts fall out of a
single groupBy. One shuffle instead of |A|·|B| join jobs, same counts.
To bound the value join at scale, values are distinct-ed per column first
(overlap counts of distinct values — a slight semantic refinement over the
reference's row-level counts; both rank the true correspondence first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auto_data_linkage_spark.cleaning import clean_columns, string_columns
from auto_data_linkage_spark.profile import melt


def column_correspondence(
    left: DataFrame,
    right: DataFrame,
    *,
    exclude: tuple[str, ...] = (),
    sample_rows: int | None = 10_000,
    seed: int = 42,
    distinct_values: bool = True,
) -> list[tuple[str, str, int]]:
    """Infer which column of ``right`` corresponds to each column of
    ``left`` by value overlap. Returns greedy best pairings
    ``(left_col, right_col, overlap)`` sorted by overlap descending.

    ``distinct_values=True`` (default) counts overlapping DISTINCT values —
    scale-safe (the value join cannot blow up on repeated values).
    ``False`` reproduces the reference's row-level inner-join match counts
    (autolinker.py:994-1003) exactly, including their multiplicity
    blow-up on hot values; both rank the true correspondence first.
    """
    lcols = [c for c in string_columns(left) if c not in exclude]
    rcols = [c for c in string_columns(right) if c not in exclude]
    if not lcols or not rcols:
        return []

    def prep(df: DataFrame, cols: list[str]) -> DataFrame:
        n = df.count()
        if sample_rows is not None and n > sample_rows:
            df = df.sample(fraction=sample_rows / n, seed=seed)
        cleaned = clean_columns(df.select(*cols), cols)
        melted = melt(cleaned, cols).where(
            F.col("val").isNotNull() & (F.col("val") != "")
        )
        return melted.distinct() if distinct_values else melted

    lm = prep(left, lcols).withColumnRenamed("col", "col_a")
    rm = prep(right, rcols).withColumnRenamed("col", "col_b")
    counts = (
        lm.join(rm, "val")
        .groupBy("col_a", "col_b")
        .agg(F.count("*").alias("overlap"))
        .collect()
    )
    ranked = sorted(counts, key=lambda r: (-r["overlap"], r["col_a"], r["col_b"]))
    used_a: set[str] = set()
    used_b: set[str] = set()
    pairs: list[tuple[str, str, int]] = []
    for r in ranked:
        if r["col_a"] in used_a or r["col_b"] in used_b:
            continue
        pairs.append((r["col_a"], r["col_b"], int(r["overlap"])))
        used_a.add(r["col_a"])
        used_b.add(r["col_b"])
    return pairs


def align_for_linking(
    left: DataFrame,
    right: DataFrame,
    *,
    exclude: tuple[str, ...] = (),
    min_overlap: int = 1,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Rename both tables to the reference's synthetic common schema
    ``{colA}_{colB}`` for each inferred pairing (autolinker.py:901-907,
    :1016-1019) and drop unpaired attribute columns. Returns
    (left_aligned, right_aligned, common_attribute_columns)."""
    pairs = [
        p
        for p in column_correspondence(left, right, exclude=exclude)
        if p[2] >= min_overlap
    ]
    if not pairs:
        raise ValueError(
            "no column correspondence found between the two tables"
        )
    common = [f"{a}_{b}" for a, b, _ in pairs]
    keep_extra = [c for c in exclude if c in left.columns and c in right.columns]
    l_out = left.select(
        *[F.col(a).alias(f"{a}_{b}") for a, b, _ in pairs], *keep_extra
    )
    r_out = right.select(
        *[F.col(b).alias(f"{a}_{b}") for a, b, _ in pairs], *keep_extra
    )
    return l_out, r_out, common
