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


def test_cc_large_graph_probe_never_ships_edge_rows(spark, monkeypatch):
    """The size probe must be a bounded distributed count: when the graph
    exceeds driver_threshold, no driver fetch (collect/take/tail) may
    ever return more than threshold edge rows — the old take(threshold+1)
    probe shipped the first threshold+1 rows even for graphs 100x larger."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    fetched = []
    orig_collect, orig_take, orig_tail = CDF.collect, CDF.take, CDF.tail

    def spy_collect(self):
        rows = orig_collect(self)
        fetched.append(len(rows))
        return rows

    def spy_take(self, num):
        rows = orig_take(self, num)
        fetched.append(len(rows))
        return rows

    def spy_tail(self, num):
        rows = orig_tail(self, num)
        fetched.append(len(rows))
        return rows

    monkeypatch.setattr(CDF, "collect", spy_collect)
    monkeypatch.setattr(CDF, "take", spy_take)
    monkeypatch.setattr(CDF, "tail", spy_tail)

    threshold = 10
    edges = [(f"n{i}", f"n{i+1}") for i in range(200)]  # one long chain
    df = spark.createDataFrame(edges, "src string, dst string")
    comps = connected_components(df, driver_threshold=threshold)
    rows = orig_collect(comps)
    assert max(fetched, default=0) <= threshold, fetched
    # and the distributed path still computes the single chain component
    assert len({r["component"] for r in rows}) == 1
    assert len(rows) == 201


def test_cc_small_graph_fast_path_fetches_once(spark, monkeypatch):
    """Below the threshold the edge list is fetched exactly once (the
    bounded count probe ships no rows, then one collect)."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    calls = []
    orig_collect = CDF.collect

    def spy_collect(self):
        rows = orig_collect(self)
        calls.append(len(rows))
        return rows

    monkeypatch.setattr(CDF, "collect", spy_collect)
    df = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    out = connected_components(df, driver_threshold=100)
    rows = orig_collect(out)
    assert calls == [2]  # exactly one driver fetch, of the 2 edges
    assert len({r["component"] for r in rows}) == 1


def test_over_threshold_takes_distributed_path_without_edge_collect(
    spark, monkeypatch
):
    """Over driver_threshold the star-rounds path must run: the driver
    union-find is never invoked (monkeypatched to raise), and the
    result is identical to the driver path's output on the same graph."""
    import auto_data_linkage_spark.cluster as C

    edges = [(i, i + 1) for i in range(0, 60, 2)]  # 30 two-node comps
    edges += [(100, 101), (101, 102), (102, 100)]  # one triangle
    df = spark.createDataFrame(edges, "src long, dst long")

    want = {
        (r["node"], r["component"])
        for r in connected_components(df, driver_threshold=10_000).collect()
    }

    def boom(*a, **k):
        raise AssertionError("driver union-find ran on an over-threshold graph")

    monkeypatch.setattr(C, "_union_find_components", boom)
    got = {
        (r["node"], r["component"])
        for r in C.connected_components(df, driver_threshold=5).collect()
    }
    assert got == want
