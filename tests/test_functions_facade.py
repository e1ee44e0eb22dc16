"""Reference-surface facade (arc.sql.functions same-named equivalents)."""

import math

from auto_data_linkage_spark.functions import (
    arc_combinatorial_count_agg,
    arc_entropy_agg,
    arc_generate_blocking_rules,
    arc_merge_count_map_agg,
)


def test_arc_entropy_agg_auto_base(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",)], "c string"
    )
    # 2 equiprobable values, base = distinct count (2) -> entropy 1.0
    h = arc_entropy_agg(df, 0, "c")
    assert math.isclose(h["c"], 1.0, abs_tol=1e-9)
    # explicit base e
    h_e = arc_entropy_agg(df, math.e, "c")
    assert math.isclose(h_e["c"], math.log(2), abs_tol=1e-9)


def test_arc_combinatorial_count_and_merge(spark):
    df = spark.createDataFrame(
        [("x", "1"), ("x", "1"), ("y", "2")], "a string, b string"
    )
    cc = arc_combinatorial_count_agg(df, 2, 1, "a", "b")
    rows = {(r["combo"], r["vals"]): r["cnt"] for r in cc.collect()}
    assert rows[("a", "x")] == 2
    assert rows[("a,b", "x\x1f1")] == 2  # unit-separator value tuples
    merged = arc_merge_count_map_agg(cc.union(cc))
    m = {(r["combo"], r["vals"]): r["cnt"] for r in merged.collect()}
    assert m[("a", "x")] == 4  # key-wise sum


def test_arc_generate_blocking_rules_shape(spark):
    df = spark.createDataFrame(
        [("x", str(i % 3)) for i in range(30)], "a string, b string"
    )
    out = arc_generate_blocking_rules(df, 2, 2, "a", "b")
    assert out.columns == ["splink_rule", "rule_squared_count"]
    assert out.count() >= 1
    assert all("l." in r["splink_rule"] for r in out.collect())
