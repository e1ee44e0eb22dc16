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


# ---------------------------------------------------------------- HLL


@pytest.fixture(scope="module")
def many(spark):
    return spark.range(0, 5000).select(
        (F.col("id") % 2).alias("half"),
        F.concat(F.lit("v"), (F.col("id") % 1200).cast("string")).alias("v"),
    )


def test_hll_estimate_within_tolerance(spark, many):
    est = SK.hll_estimate(SK.hll_build(many, "v", lgk=12)).collect()[0]
    assert abs(est.distinct_est - 1200) <= 0.05 * 1200


def test_hll_merge_matches_whole(spark, many):
    """Union of per-half sketches estimates the same as one sketch over
    the whole input (the HLL merge is lossless w.r.t. the sketch)."""
    whole = SK.hll_estimate(SK.hll_build(many, "v", lgk=12)).collect()[0]
    per = SK.hll_build(many, "v", ["half"], lgk=12)
    merged = SK.hll_estimate(SK.hll_merge(per)).collect()[0]
    assert merged.distinct_est == whole.distinct_est


def test_hll_grouped(spark, many):
    out = SK.hll_estimate(SK.hll_build(many, "v", ["half"], lgk=12))
    got = {r.half: r.distinct_est for r in out.collect()}
    # each half holds 600 + 600 overlapping ids -> still <=1200 distinct
    for half, exact in ((0, 600), (1, 600)):
        assert abs(got[half] - exact) <= 0.05 * exact


def test_hll_sketch_is_small(spark, many):
    rows = SK.hll_build(many, "v", ["half"], lgk=12).collect()
    assert len(rows) == 2
    for r in rows:
        assert len(r.hll) <= (1 << 12) + 64  # ~4 KiB + header


# ---------------------------------------------------------------- KLL


def test_kll_quantiles_within_rank_tolerance(spark, many):
    """The value KLL returns for q is an input value whose RANK is
    within ±eps of q — check rank, not value (values 'v0'..'v1199' are
    strings; use a numeric column instead)."""
    df = spark.range(0, 10_000).select((F.col("id") % 1000).alias("x"))
    out = SK.kll_quantiles(
        SK.kll_build(df, "x", dtype="bigint"), [0.5, 0.9], dtype="bigint"
    ).collect()[0]
    assert out.kll_n == 10_000
    # x is uniform over 0..999: exact p50=~500, p90=~900; eps(k=200)=1.65%
    assert abs(out.q50 - 500) <= 0.03 * 1000
    assert abs(out.q90 - 900) <= 0.03 * 1000


def test_kll_merge_matches_whole_guarantee(spark):
    df = spark.range(0, 8_000).select(
        (F.col("id") % 2).alias("half"), (F.col("id") % 500).cast("double").alias("x")
    )
    per = SK.kll_build(df, "x", ["half"])
    merged = SK.kll_quantiles(SK.kll_merge(per), [0.5]).collect()[0]
    assert merged.kll_n == 8_000
    assert abs(merged.q50 - 250) <= 0.03 * 500


def test_kll_bad_dtype_raises(spark):
    df = spark.range(5).select(F.col("id").alias("x"))
    import pytest as _pt

    with _pt.raises(ValueError):
        SK.kll_build(df, "x", dtype="decimal")


# -------------------------------------------------------------- theta


def test_theta_union_and_intersect(spark):
    # A = 0..5999, B = 4000..9999 -> overlap 2000, union 10000
    a = spark.range(0, 6000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(4000, 10_000).select(F.col("id").cast("string").alias("v"))
    sk = SK.theta_build(a, "v", lgk=14).withColumn("g", F.lit(1)).unionByName(
        SK.theta_build(b, "v", lgk=14).withColumn("g", F.lit(1))
    )
    uni = SK.theta_estimate(SK.theta_union(sk, ["g"])).collect()[0]
    inter = SK.theta_estimate(SK.theta_intersect(sk, ["g"])).collect()[0]
    assert abs(uni.distinct_est - 10_000) <= 0.05 * 10_000
    assert abs(inter.distinct_est - 2_000) <= 0.08 * 2_000


def test_corpus_overlap_report(spark):
    a = spark.range(0, 6000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(4000, 10_000).select(F.col("id").cast("string").alias("v"))
    r = SK.corpus_overlap(a, b, "v").collect()[0]
    assert abs(r.a_distinct - 6000) <= 0.05 * 6000
    assert abs(r.b_distinct - 6000) <= 0.05 * 6000
    assert abs(r.overlap_est - 2000) <= 0.08 * 2000
    assert abs(r.union_est - 10_000) <= 0.05 * 10_000
    assert abs(r.jaccard_est - 0.2) <= 0.05


# ------------------------------------------------------------- bloom
def test_bloom_no_false_negatives_and_low_fp(spark):
    from auto_data_linkage_spark.operators.sketch import (
        bloom_build,
        bloom_contains,
    )
    from pyspark.sql import functions as F

    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(500)], "v string"
    )
    words = bloom_build(members, "v", m_bits=1 << 14, n_hashes=4)
    assert len(words) == -(-(1 << 14) // 63)
    probe = spark.createDataFrame(
        [(f"member-{i}", True) for i in range(500)]
        + [(f"other-{i}", False) for i in range(2000)],
        "v string, expected boolean",
    )
    rows = probe.select(
        "expected",
        bloom_contains(F.col("v"), words, m_bits=1 << 14, n_hashes=4).alias(
            "got"
        ),
    ).collect()
    # every member hits (no false negatives, the Bloom guarantee)
    assert all(r["got"] for r in rows if r["expected"])
    # false positives stay near the analytic rate (~2% at this load);
    # generous bound so the test is not flaky on hash luck
    fp = sum(1 for r in rows if r["got"] and not r["expected"])
    assert fp / 2000 < 0.10, fp


def test_bloom_build_is_deterministic(spark):
    from auto_data_linkage_spark.operators.sketch import bloom_build

    df = spark.createDataFrame([(f"x{i}",) for i in range(100)], "v string")
    a = bloom_build(df, "v", m_bits=4096, n_hashes=3)
    b = bloom_build(df, "v", m_bits=4096, n_hashes=3)
    assert a == b and any(a)
