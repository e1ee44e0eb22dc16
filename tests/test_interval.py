"""Interval join: bucket-explode plan must equal the naive range join on
randomized data across granularities and boundary modes."""

import random

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.interval import interval_join


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(77)
    points = [
        (f"k{rng.randrange(6)}", rng.uniform(0, 1000), i)
        for i in range(300)
    ]
    intervals = []
    for j in range(80):
        start = rng.uniform(0, 1000)
        intervals.append(
            (f"k{rng.randrange(6)}", start, start + rng.uniform(0, 120), j)
        )
    p = spark.createDataFrame(points, "key string, ts double, pid long")
    i = spark.createDataFrame(
        intervals, "key string, start double, end double, iid long"
    )
    return p, i


def _naive(p, i, closed):
    lo = (
        F.col("p.ts") >= F.col("i.start")
        if closed in ("both", "left")
        else F.col("p.ts") > F.col("i.start")
    )
    hi = (
        F.col("p.ts") <= F.col("i.end")
        if closed in ("both", "right")
        else F.col("p.ts") < F.col("i.end")
    )
    return (
        p.alias("p")
        .join(i.alias("i"), (F.col("p.key") == F.col("i.key")) & lo & hi)
        .select(F.col("p.pid"), F.col("i.iid"))
    )


@pytest.mark.parametrize("granularity", [7, 60, 500])
@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
def test_interval_join_equals_naive(spark, data, granularity, closed):
    p, i = data
    got = interval_join(
        p,
        i,
        on="key",
        point_ts="ts",
        start_ts="start",
        end_ts="end",
        granularity_seconds=granularity,
        value_cols=["iid"],
        closed=closed,
    ).select("pid", "iid")
    expected = _naive(p, i, closed)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    # bucket-explode must not duplicate pairs
    assert got.count() == got.distinct().count()


def test_interval_join_multi_key_and_defaults(spark):
    p = spark.createDataFrame(
        [("a", "x", 5.0, 1), ("a", "y", 5.0, 2)],
        "k1 string, k2 string, ts double, pid long",
    )
    i = spark.createDataFrame(
        [("a", "x", 0.0, 10.0, "hit")],
        "k1 string, k2 string, start double, end double, tag string",
    )
    out = interval_join(
        p, i, on=["k1", "k2"], point_ts="ts", start_ts="start", end_ts="end"
    )
    rows = {(r["pid"], r["tag"]) for r in out.collect()}
    assert rows == {(1, "hit")}  # k2 mismatch excludes pid 2


def test_malformed_intervals_dropped_without_blowup(spark):
    """end < start (e.g. a zero-sentinel end on an epoch-seconds start)
    must be dropped BEFORE the bucket explode — it would otherwise emit
    millions of descending buckets for one corrupt row."""
    p = spark.createDataFrame([("a", 5.0, 1)], "key string, ts double, pid long")
    i = spark.createDataFrame(
        [("a", 1.7e9, 0.0, 1), ("a", 0.0, 10.0, 2), ("a", None, 10.0, 3)],
        "key string, start double, end double, iid long",
    )
    out = interval_join(
        p, i, on="key", point_ts="ts", start_ts="start", end_ts="end",
        granularity_seconds=300, value_cols=["iid"],
    )
    assert {r["iid"] for r in out.collect()} == {2}


def test_interval_join_collision_raises(spark):
    p = spark.createDataFrame([("a", 1.0, 1)], "k string, ts double, tag long")
    i = spark.createDataFrame(
        [("a", 0.0, 2.0, "x")], "k string, start double, end double, tag string"
    )
    with pytest.raises(ValueError, match="collide"):
        interval_join(
            p, i, on="k", point_ts="ts", start_ts="start", end_ts="end"
        )


def test_interval_join_on_timestamp_ntz_columns(spark, sf_dir):
    """Regression: Spark 4 reads the testdata's parquet ``ts`` as
    TIMESTAMP_NTZ, which forbids a direct cast to DOUBLE — the operator
    must route timestamps through its NTZ-safe epoch helper. Joins real
    NTZ points against NTZ intervals and checks against a naive range
    join on the same data."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"  # env precondition
    points = ev.limit(200).select("event_id", "user_id", "ts")
    intervals = ev.limit(50).select(
        F.col("user_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTE")).alias("start"),
        F.col("ts").alias("end"),
        F.col("event_id").alias("iid"),
    )
    got = interval_join(
        points,
        intervals,
        on="user_id",
        point_ts="ts",
        start_ts="start",
        end_ts="end",
        granularity_seconds=900,
        value_cols=["iid"],
    ).select("event_id", "iid")
    naive = (
        points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.user_id") == F.col("i.user_id"))
            & (F.col("p.ts") >= F.col("i.start"))
            & (F.col("p.ts") <= F.col("i.end")),
        )
        .select(F.col("p.event_id"), F.col("i.iid"))
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    assert got.count() > 0
