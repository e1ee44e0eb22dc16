"""Count-min sketch: estimate bounds, merge associativity, sketch size
bound, and the broadcast-query plan shape."""

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import sketch as SK


@pytest.fixture(scope="module")
def values(spark):
    # known frequencies: a:5, b:3, c:1
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)]
    return spark.createDataFrame(rows, "v string")


def test_estimates_upper_bound_and_exact_when_wide(spark, values):
    cms = SK.count_min_build(values, "v", width=1024, depth=4)
    items = values.select("v").distinct()
    got = {
        r.v: r.est
        for r in SK.count_min_query(cms, items, "v", width=1024, depth=4).collect()
    }
    # CM never underestimates; with 3 keys in 1024 buckets it is exact
    assert got == {"a": 5, "b": 3, "c": 1}


def test_estimates_never_underestimate_when_narrow(spark, values):
    # force collisions with a 2-bucket sketch
    cms = SK.count_min_build(values, "v", width=2, depth=2)
    items = values.select("v").distinct()
    got = {
        r.v: r.est
        for r in SK.count_min_query(cms, items, "v", width=2, depth=2).collect()
    }
    true = {"a": 5, "b": 3, "c": 1}
    for k, t in true.items():
        assert got[k] >= t


def test_sketch_size_bounded(spark, values):
    cms = SK.count_min_build(values, "v", width=8, depth=3)
    rows = cms.collect()
    assert len(rows) <= 8 * 3
    assert {r.hash_row for r in rows} <= {0, 1, 2}
    assert all(0 <= r.bucket < 8 for r in rows)


def test_merge_equals_build_on_union(spark, values):
    half1 = values.limit(4)
    half2 = values.exceptAll(half1)
    s1 = SK.count_min_build(half1, "v", width=64, depth=3)
    s2 = SK.count_min_build(half2, "v", width=64, depth=3)
    merged = SK.count_min_merge(s1, s2)
    full = SK.count_min_build(values, "v", width=64, depth=3)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b


def test_unseen_item_estimates_small(spark, values):
    cms = SK.count_min_build(values, "v", width=1024, depth=4)
    items = spark.createDataFrame([("zzz",)], "v string")
    est = SK.count_min_query(cms, items, "v", width=1024, depth=4).collect()[0].est
    assert est == 0  # no collisions at this width


def test_query_plan_broadcasts_sketch(spark, values):
    from auto_data_linkage_spark.plans.explain import physical_plan

    cms = SK.count_min_build(values, "v", width=64, depth=3)
    items = values.select("v").distinct()
    plan = physical_plan(SK.count_min_query(cms, items, "v", width=64, depth=3))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_count_min_foreachbatch_maintenance(spark, sf_dir, tmp_path):
    """The streaming-state story for the sketch: fold each arriving
    micro-batch's partial sketch into a persisted one (union +
    re-aggregate). Because CM is a counter array, the folded sketch must
    equal the one built over the full corpus in a single batch."""
    from pyspark.sql import functions as F

    from auto_data_linkage_spark.operators import sketch as SK
    from auto_data_linkage_spark.operators import text as X
    from auto_data_linkage_spark.streaming.documents import read_document_stream

    state = str(tmp_path / "sketch")
    kw = dict(width=64, depth=3)

    def fold(batch_df, batch_id):
        toks = batch_df.select(F.explode(X.tokens("text")).alias("term"))
        part = SK.count_min_build(toks, "term", **kw)
        import os

        if os.path.exists(state):
            prev = spark.read.parquet(state)
            merged = SK.count_min_merge(prev, part).localCheckpoint(eager=True)
        else:
            merged = part
        merged.write.mode("overwrite").parquet(state)

    stream = read_document_stream(
        spark, f"{sf_dir}/documents.parquet", max_files_per_trigger=1
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    folded = sorted(map(tuple, spark.read.parquet(state).collect()))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(X.tokens("text")).alias("term"))
    full = sorted(map(tuple, SK.count_min_build(toks, "term", **kw).collect()))
    assert folded == full
