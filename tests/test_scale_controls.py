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
