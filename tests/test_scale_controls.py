"""Scale-control levers: per-block caps, hot-key salting, model
persistence, bucketed/partitioned sinks."""

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.blocking import cap_block_size, salt_hot_keys
from auto_data_linkage_spark.compare import Comparison
from auto_data_linkage_spark.model import FellegiSunterModel


@pytest.fixture()
def skewed(spark):
    rows = [(str(i), "hot" if i < 80 else f"cold{i}") for i in range(100)]
    return spark.createDataFrame(rows, "unique_id string, key string")


def test_cap_block_size(spark, skewed):
    capped = cap_block_size(skewed, ["key"], 10)
    sizes = {r["key"]: r["count"] for r in capped.groupBy("key").count().collect()}
    assert sizes["hot"] == 10
    assert all(v == 1 for k, v in sizes.items() if k != "hot")
    # deterministic selection
    a = sorted(r["unique_id"] for r in cap_block_size(skewed, ["key"], 10).collect())
    b = sorted(r["unique_id"] for r in cap_block_size(skewed, ["key"], 10).collect())
    assert a == b


def test_salt_hot_keys(spark, skewed):
    salted = salt_hot_keys(skewed, ["key"], hot_threshold=20, salt_buckets=4)
    hot = salted.where(F.col("key") == "hot")
    n_salts = hot.select("__salt").distinct().count()
    assert n_salts > 1  # hot key split
    cold_salts = {
        r["__salt"] for r in salted.where(F.col("key") != "hot").select("__salt").distinct().collect()
    }
    assert cold_salts == {0}  # cold keys untouched
    max_bucket = (
        salted.groupBy("key", "__salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_bucket < 80  # the hot block is genuinely subdivided


def test_model_save_load_roundtrip(spark, people, tmp_path):
    from auto_data_linkage_spark.cleaning import null_sentinel

    df = null_sentinel(people)
    comps = [
        Comparison("surname", "levenshtein", 2),
        Comparison("given_name", "jaro_winkler", 0.9),
    ]
    model = FellegiSunterModel(comps, [("postcode",)])
    model.estimate_u(df, target_pairs=500)
    path = str(tmp_path / "model.json")
    model.save(path)
    loaded = FellegiSunterModel.load(path)
    assert loaded.params["surname"].u == model.params["surname"].u
    assert [c.column for c in loaded.comparisons] == ["surname", "given_name"]
    a = model.predict(df).orderBy("unique_id_l", "unique_id_r").collect()
    b = loaded.predict(df).orderBy("unique_id_l", "unique_id_r").collect()
    assert [r["match_probability"] for r in a] == [
        r["match_probability"] for r in b
    ]


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    from auto_data_linkage_spark.plans.explain import physical_plan
    from auto_data_linkage_spark.sources.catalog import write_partitioned

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_parted")
    write_partitioned(orders, out, ["o_orderstatus"])
    back = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    assert back.count() == orders.where(F.col("o_orderstatus") == "F").count()
    # partition pruning: the scan must not read all partitions
    assert "PartitionFilters" in physical_plan(back)


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """Co-located storage: two tables bucketed on the join key sort-merge
    join with ZERO exchanges — the storage-side answer to repeated
    blocking joins on the same keys."""
    from auto_data_linkage_spark.plans.explain import count_exchanges
    from auto_data_linkage_spark.sources.catalog import write_bucketed

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(
        cust.select("c_custkey", "c_name"), "b_left", ["c_custkey"], 4
    )
    write_bucketed(
        cust.select("c_custkey", "c_mktsegment"), "b_right", ["c_custkey"], 4
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_left").join(spark.table("b_right"), "c_custkey")
        assert count_exchanges(joined) == 0
        assert joined.count() == cust.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def _unsalted_pairs(df, key="key", id_col="unique_id"):
    l, r = df.alias("l"), df.alias("r")
    return {
        (row["a"], row["b"])
        for row in l.join(
            r,
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .collect()
    }


@pytest.mark.parametrize("hot_threshold", [None, 20])
def test_salted_self_join_is_lossless(spark, skewed, hot_threshold):
    """Property (round-3 item 5): the replicated-salt join must produce
    EXACTLY the unsalted pair set — salting redistributes work, never
    drops cross-salt pairs (unlike salt_hot_keys' estimation-only salt)."""
    from auto_data_linkage_spark.blocking import salted_self_join_pairs

    got_df = salted_self_join_pairs(
        skewed,
        ["key"],
        salt_buckets=4,
        hot_threshold=hot_threshold,
        id_column="unique_id",
    )
    got = {
        (r["unique_id_l"], r["unique_id_r"]) for r in got_df.collect()
    }
    assert got_df.count() == len(got)  # no duplicate pairs either
    assert got == _unsalted_pairs(skewed)


def test_salted_self_join_property_random(spark):
    """Hypothesis-style randomized check across several skew shapes."""
    import random

    from auto_data_linkage_spark.blocking import salted_self_join_pairs

    rng = random.Random(7)
    for trial in range(3):
        rows = [
            (i, f"k{rng.randrange(1, 4) if rng.random() < 0.7 else rng.randrange(1, 30)}")
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "unique_id long, key string")
        got = {
            (r["unique_id_l"], r["unique_id_r"])
            for r in salted_self_join_pairs(
                df, ["key"], salt_buckets=rng.choice([2, 5, 8]),
                hot_threshold=rng.choice([None, 10]),
            ).collect()
        }
        assert got == _unsalted_pairs(df), f"trial {trial}"


def test_salted_join_select_columns_including_id_no_duplicates(spark):
    from auto_data_linkage_spark.blocking import salted_self_join_pairs

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y")], "unique_id long, key string, name string"
    )
    out = salted_self_join_pairs(
        df, ["key"], salt_buckets=2, select_columns=("unique_id", "name")
    )
    assert len(out.columns) == len(set(out.columns))
    assert {r["name_l"] for r in out.collect()} == {"x"}
