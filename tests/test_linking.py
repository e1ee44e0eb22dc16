import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.autolink import AutoLinker
from auto_data_linkage_spark.linking import align_for_linking, column_correspondence


def test_column_correspondence_infers_renames(spark, people):
    left = people.select("given_name", "surname", "postcode")
    right = (
        people.withColumnRenamed("given_name", "first_name")
        .withColumnRenamed("surname", "last_name")
        .withColumnRenamed("postcode", "zip")
        .select("first_name", "last_name", "zip")
    )
    pairs = column_correspondence(left, right, sample_rows=None)
    got = {(a, b) for a, b, _ in pairs}
    assert ("given_name", "first_name") in got
    assert ("surname", "last_name") in got
    assert ("postcode", "zip") in got


def test_align_for_linking_synthetic_schema(spark, people):
    left = people.select("given_name", "surname")
    right = people.withColumnRenamed("surname", "family_name").select(
        "given_name", "family_name"
    )
    l2, r2, common = align_for_linking(left, right)
    assert set(l2.columns) == set(r2.columns) == set(common)
    assert "surname_family_name" in common
    assert "given_name_given_name" in common


def test_align_raises_on_disjoint_values(spark):
    left = spark.createDataFrame([("aaa",), ("bbb",)], "x string")
    right = spark.createDataFrame([("zzz",), ("yyy",)], "y string")
    with pytest.raises(ValueError, match="correspondence"):
        align_for_linking(left, right)


@pytest.mark.slow
@pytest.mark.exhaustive
def test_auto_link_link_mode_cross_table_only(spark, people):
    """Link mode must pair across tables only, inferring the schema match
    when the second table's columns are renamed (reference
    linking_test.py scenario)."""
    left = people.where(F.col("unique_id").cast("int") <= 12).drop("unique_id")
    right = (
        people.where(F.col("unique_id").cast("int") > 12)
        .drop("unique_id")
        .withColumnRenamed("given_name", "first_name")
        .withColumnRenamed("surname", "last_name")
    )
    linker = AutoLinker(
        comparison_size_limit=5_000, max_evals=2, random_seed=5,
        true_label="recid",
    )
    linker.auto_link([left, right])
    scores = linker.get_scores_df()
    sides = scores.select(
        F.substring("unique_id_l", 1, 1).alias("sl"),
        F.substring("unique_id_r", 1, 1).alias("sr"),
    ).distinct().collect()
    assert all((r["sl"], r["sr"]) == ("l", "r") for r in sides)
    # the 5 planted duplicates live across the split; at least some must
    # surface as high-probability cross-table links
    top = scores.where(F.col("match_probability") > 0.5).count()
    assert top >= 1


def test_column_correspondence_row_level_mode(spark):
    # reference-exact mode: multiplicity-weighted counts still rank the
    # true correspondence first
    from auto_data_linkage_spark.linking import column_correspondence

    left = spark.createDataFrame(
        [("smith", "nsw"), ("smith", "vic"), ("jones", "nsw")],
        "surname string, state string",
    )
    right = spark.createDataFrame(
        [("smith", "x"), ("smith", "y"), ("brown", "z")],
        "family string, junk string",
    )
    pairs = column_correspondence(
        left, right, distinct_values=False, sample_rows=None
    )
    assert pairs[0][:2] == ("surname", "family")
    # 2 smith rows left x 2 smith rows right = 4 row-level matches
    assert pairs[0][2] == 4
