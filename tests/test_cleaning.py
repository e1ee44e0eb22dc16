from pyspark.sql import functions as F

from auto_data_linkage_spark.cleaning import (
    clean_columns,
    ensure_unique_id,
    null_sentinel,
    string_columns,
)


def test_clean_columns_lower_and_strip(spark):
    df = spark.createDataFrame(
        [("John-O'Brien", 1), ("  MARY  ", 2)], "name string, n int"
    )
    out = clean_columns(df).collect()
    assert out[0]["name"] == "johnobrien"
    assert out[1]["name"] == "  mary  ".lower()
    assert out[0]["n"] == 1  # non-string untouched


def test_clean_columns_keeps_spaces_and_digits(spark):
    df = spark.createDataFrame([("12 Main St.!",)], "addr string")
    assert clean_columns(df).collect()[0]["addr"] == "12 main st"


def test_null_sentinel_only_strings(spark):
    df = spark.createDataFrame([(None, None)], "name string, n int")
    row = null_sentinel(df).collect()[0]
    assert row["name"] == "null_"
    assert row["n"] is None


def test_ensure_unique_id_added_and_preserved(spark):
    df = spark.createDataFrame([("a",), ("b",)], "v string")
    with_id = ensure_unique_id(df)
    assert "unique_id" in with_id.columns
    assert dict(with_id.dtypes)["unique_id"] == "string"
    assert with_id.select("unique_id").distinct().count() == 2
    # idempotent
    assert ensure_unique_id(with_id).columns == with_id.columns


def test_ensure_unique_id_deterministic(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "v string")
    a = ensure_unique_id(df, deterministic=True).orderBy("v").collect()
    b = ensure_unique_id(df, deterministic=True).orderBy("v").collect()
    assert a == b


def test_string_columns(spark):
    df = spark.createDataFrame([("x", 1, 2.0)], "a string, b int, c double")
    assert string_columns(df) == ["a"]
