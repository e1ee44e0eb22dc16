from pyspark.sql import functions as F

from auto_data_linkage_spark.cluster import cluster_at_threshold, connected_components


import pytest

# threshold 0 forces the distributed star algorithm; the default exercises
# the driver union-find fast path — both must produce identical output
THRESHOLDS = [0, 1_000_000]


def _components(spark, edges, threshold):
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = connected_components(df, driver_threshold=threshold).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r["component"], set()).add(r["node"])
    return sorted(frozenset(g) for g in groups.values())


@pytest.mark.parametrize("threshold", THRESHOLDS)
def test_cc_two_components(spark, threshold):
    comps = _components(spark, [("a", "b"), ("b", "c"), ("x", "y")], threshold)
    assert comps == sorted([frozenset({"a", "b", "c"}), frozenset({"x", "y"})])


@pytest.mark.parametrize("threshold", THRESHOLDS)
def test_cc_chain_long(spark, threshold):
    # a chain stresses convergence (naive min-propagation needs O(n) rounds)
    n = 40
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    comps = _components(spark, edges, threshold)
    assert len(comps) == 1
    assert len(comps[0]) == n + 1


@pytest.mark.parametrize("threshold", THRESHOLDS)
def test_cc_star_and_cycle(spark, threshold):
    edges = [("h", f"s{i}") for i in range(5)] + [("c1", "c2"), ("c2", "c3"), ("c3", "c1")]
    comps = _components(spark, edges, threshold)
    assert sorted(len(c) for c in comps) == [3, 6]


@pytest.mark.parametrize("threshold", THRESHOLDS)
def test_cc_component_id_is_min(spark, threshold):
    df = spark.createDataFrame([("b", "c"), ("a", "b")], "src string, dst string")
    rows = connected_components(df, driver_threshold=threshold).collect()
    assert {r["component"] for r in rows} == {"a"}


@pytest.mark.parametrize("threshold", THRESHOLDS)
def test_cc_self_loop_only_node_is_singleton(spark, threshold):
    # a node appearing ONLY in self-loop edges must still come out as its
    # own singleton component (round-1 advice: it was dropped entirely)
    comps = _components(
        spark, [("a", "b"), ("z", "z"), ("a", "a")], threshold
    )
    assert comps == sorted([frozenset({"a", "b"}), frozenset({"z"})])


def test_cluster_at_threshold_singletons(spark):
    records = spark.createDataFrame(
        [("1", "x"), ("2", "y"), ("3", "z")], "unique_id string, v string"
    )
    preds = spark.createDataFrame(
        [("1", "2", 0.95), ("2", "3", 0.10)],
        "unique_id_l string, unique_id_r string, match_probability double",
    )
    out = {r["unique_id"]: r["cluster_id"] for r in
           cluster_at_threshold(records, preds, 0.8).collect()}
    assert out["1"] == out["2"]
    assert out["3"] == "3"  # singleton keeps own id
