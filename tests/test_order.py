"""Deterministic training order / curriculum staging (operators/order.py)."""

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import order as O


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_training_order_deterministic_and_bounded(docs):
    a = O.training_order(docs, n_shards=16, seed=7).select(
        "doc_id", "shard", "order_key"
    )
    b = O.training_order(docs, n_shards=16, seed=7).select(
        "doc_id", "shard", "order_key"
    )
    ra = {r["doc_id"]: (r["shard"], r["order_key"]) for r in a.collect()}
    rb = {r["doc_id"]: (r["shard"], r["order_key"]) for r in b.collect()}
    assert ra == rb
    assert all(0 <= s < 16 for s, _ in ra.values())
    # a different seed reshuffles: shard assignment must not be static
    c = O.training_order(docs, n_shards=16, seed=8).select("doc_id", "shard")
    rc = {r["doc_id"]: r["shard"] for r in c.collect()}
    assert any(rc[d] != ra[d][0] for d in ra)


def test_training_order_spreads_source_clustering(docs):
    """The point of the seeded shuffle: a source that arrives clustered
    must land spread across shards (every shard sees >1 source when
    sources ≪ rows)."""
    out = O.training_order(docs, n_shards=8)
    per_shard = (
        out.groupBy("shard")
        .agg(F.countDistinct("source").alias("n_src"))
        .collect()
    )
    assert per_shard and all(r["n_src"] > 1 for r in per_shard)


def test_order_key_independent_of_shard_hash(docs):
    """order_key must not be the shard hash (seed offset): otherwise
    every shard's rows sort by the residue that placed them there. If
    the hashes were identical, order_key % n == shard would hold for
    EVERY row; independent hashes agree ~1/n of the time."""
    rows = O.training_order(docs, n_shards=4, seed=3).select(
        "doc_id", "shard", "order_key"
    ).collect()
    frac_same = sum(
        r["order_key"] % 4 == r["shard"] for r in rows
    ) / len(rows)
    assert 0.05 < frac_same < 0.6, frac_same


def test_training_order_zero_shuffle_plan(docs):
    """Assignment is a pure projection — no Exchange in the plan (the
    writer downstream pays the one shard exchange it already owed)."""
    plan = (
        O.training_order(docs, n_shards=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_curriculum_stage_masses_and_monotonicity(docs):
    staged = O.curriculum_stages(docs, "n_chars", n_stages=4)
    counts = {
        r["stage"]: r["cnt"]
        for r in staged.groupBy("stage").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(counts.values())
    assert set(counts) == {0, 1, 2, 3}
    # quantile bands: every stage holds ~25% (ties can skew a few rows)
    for s in counts:
        assert counts[s] >= n * 0.15, counts
    # monotone: max score of stage s <= min score of stage s+2 is too
    # strict with ties; check stage means strictly increase
    means = dict(
        staged.groupBy("stage")
        .agg(F.avg("n_chars").alias("m"))
        .rdd.map(lambda r: (r["stage"], r["m"]))
        .collect()
    )
    assert means[0] < means[1] < means[2] < means[3]


def test_curriculum_pinned_thresholds(docs):
    """Explicit thresholds pin stages across corpus versions: a grown
    corpus must not reshape the curriculum when pins are passed."""
    ts = O.stage_thresholds(docs, "n_chars", n_stages=4)
    subset = docs.where(F.col("doc_id") % 2 == 0)
    pinned = O.curriculum_stages(subset, "n_chars", thresholds=ts)
    full = {
        r["doc_id"]: r["stage"]
        for r in O.curriculum_stages(docs, "n_chars", n_stages=4)
        .select("doc_id", "stage")
        .collect()
    }
    for r in pinned.select("doc_id", "stage").collect():
        assert r["stage"] == full[r["doc_id"]]


def test_curriculum_stage_is_rowlocal_plan(docs):
    """With pinned thresholds the staging plan has NO Exchange at all
    (stage is a literal comparison; no quantile aggregate runs)."""
    plan = (
        O.curriculum_stages(docs, "n_chars", thresholds=[100.0, 300.0])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_validation_errors(docs):
    with pytest.raises(ValueError):
        O.training_order(docs, n_shards=0)
    with pytest.raises(ValueError):
        O.stage_thresholds(docs, "n_chars", n_stages=1)


def test_curriculum_realized_through_write_shards(docs, spark, tmp_path):
    """The end-to-end composition: stage + order + write_shards(order_cols)
    produces shard directories whose physical row order is the curriculum
    (stage ascending, hash-shuffled within)."""
    from auto_data_linkage_spark.operators.pack import write_shards

    staged = O.curriculum_stages(
        O.training_order(docs, n_shards=4, seed=2), "n_chars", n_stages=3,
        seed=2,
    )
    path = str(tmp_path / "shards")
    write_shards(staged, path, 4, order_cols=["stage", "order_key"])
    back = spark.read.parquet(path)
    assert back.select("shard").distinct().count() == 4
    for s in range(4):
        rows = back.where(F.col("shard") == s).collect()
        keys = [(r["stage"], r["order_key"]) for r in rows]
        assert keys == sorted(keys), f"shard {s} not in curriculum order"


def test_write_shards_order_cols_validation(docs, tmp_path):
    from auto_data_linkage_spark.operators.pack import write_shards

    with pytest.raises(ValueError):
        write_shards(docs, str(tmp_path / "x"), 4, order_cols=["order_key"])


def test_score_prune_top_and_bottom(docs):
    n = docs.count()
    top = O.score_prune(docs, "n_chars", 0.3, keep="top")
    bot = O.score_prune(docs, "n_chars", 0.3, keep="bottom")
    nt, nb = top.count(), bot.count()
    # exact up to ties/interpolation: within a few rows of the target
    assert abs(nt - 0.3 * n) <= max(3, 0.02 * n), (nt, n)
    assert abs(nb - 0.3 * n) <= max(3, 0.02 * n), (nb, n)
    # kept sets sit at the right end of the distribution
    lo_top = top.agg(F.min("n_chars")).first()[0]
    hi_bot = bot.agg(F.max("n_chars")).first()[0]
    assert lo_top > hi_bot
    # pinned threshold skips the aggregate and reproduces the cut
    thr = O.stage_thresholds(docs, "n_chars", n_stages=10)[6]  # p70
    pinned = O.score_prune(docs, "n_chars", 0.3, keep="top", threshold=thr)
    assert pinned.count() == nt


def test_score_prune_validation(docs):
    with pytest.raises(ValueError):
        O.score_prune(docs, "n_chars", 0.0)
    with pytest.raises(ValueError):
        O.score_prune(docs, "n_chars", 0.5, keep="middle")
