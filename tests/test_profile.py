import math

import pytest

from auto_data_linkage_spark.profile import (
    column_combinations,
    column_entropies,
    combo_value_counts,
    entropy_df,
    max_distinct_count,
    melt,
    rule_block_stats,
    value_counts,
)


@pytest.fixture(scope="module")
def golden(spark):
    """The reference's golden entropy fixture
    (ARC_EntropyAggBehaviors.scala:45-58)."""
    return spark.createDataFrame(
        [
            (1, "a", "b", "c", "d"),
            (2, "a", "b", "c", "c"),
            (3, "a", "b", "c", "g"),
            (4, "g", "h1", ";", "a0"),
            (5, "g", "h2", "+", "a1"),
            (6, "g", "h3", "/", "a2"),
            (7, "g", "h1", ";", "a2"),
            (9, "g", "h2", "1", "a1"),
        ],
        "id int, a string, b string, c string, d string",
    )


def _h(counts, base):
    n = sum(counts)
    return -sum(c / n * math.log(c / n) for c in counts) / math.log(base)


def test_entropy_golden_values_distinct_base(spark, golden):
    """Golden values from ARC_EntropyAggBehaviors.scala:66-90 (auto base =
    per-column distinct count), matched to 3 decimals like the reference."""
    got = column_entropies(golden, ["a", "b", "c", "d"], base="distinct")
    expected = {
        "a": _h([3, 5], 2),
        "b": _h([3, 2, 2, 1], 4),
        "c": _h([3, 2, 1, 1, 1], 5),
        "d": _h([1, 1, 1, 1, 2, 2], 6),
    }
    for col, exp in expected.items():
        assert round(got[col], 3) == round(exp, 3), col


def test_entropy_fixed_base(spark, golden):
    got = column_entropies(golden, ["a"], base=10)
    assert got["a"] == pytest.approx(_h([3, 5], 10), abs=1e-9)


def test_entropy_df_matches_collected(spark, golden):
    dist = {r["col"]: r["entropy"] for r in entropy_df(golden, ["a", "b"]).collect()}
    coll = column_entropies(golden, ["a", "b"], base=math.e)
    for c in ("a", "b"):
        assert dist[c] == pytest.approx(coll[c], abs=1e-9)


def test_entropy_constant_column_is_zero(spark):
    df = spark.createDataFrame([("x",), ("x",), ("x",)], "a string")
    assert column_entropies(df, ["a"], base="distinct")["a"] == 0.0
    assert column_entropies(df, ["a"], base=2)["a"] == 0.0


def test_melt_and_value_counts(spark, golden):
    m = melt(golden, ["a", "b"])
    assert m.columns == ["col", "val"]
    assert m.count() == 16
    vc = {(r["col"], r["val"]): r["cnt"] for r in value_counts(golden, ["a"]).collect()}
    assert vc[("a", "a")] == 3 and vc[("a", "g")] == 5


def test_column_combinations_cardinality():
    # n-choose-k parity (reference ARC_GenerateCombinationsBehaviors.scala)
    cols = ["a", "b", "c", "d", "e"]
    combos = column_combinations(cols, 2)
    assert len(combos) == 5 + 10
    assert len(column_combinations(cols, 3)) == 5 + 10 + 10
    assert all(tuple(sorted(c)) == c for c in combos)


def test_combo_value_counts(spark, golden):
    from auto_data_linkage_spark.profile import COMBO_VALUE_SEP as SEP

    counts = combo_value_counts(golden, [("a",), ("a", "b")])
    got = {(r["combo"], r["vals"]): r["cnt"] for r in counts.collect()}
    assert got[("a", "a")] == 3
    assert got[("a,b", f"a{SEP}b")] == 3
    assert got[("a,b", f"g{SEP}h1")] == 2


def test_combo_value_counts_min_count_prunes(spark, golden):
    counts = combo_value_counts(golden, [("d",)], min_count=2)
    vals = {r["vals"] for r in counts.collect()}
    assert vals == {"a1", "a2"}


def test_rule_block_stats_untrimmed(spark, golden):
    counts = combo_value_counts(golden, [("a",)])
    stats = rule_block_stats(counts, trim=False).collect()
    assert len(stats) == 1
    row = stats[0]
    # blocks of 3 and 5 rows -> k = 9, 25; avg = 17
    assert row["rule"] == "a"
    assert row["n_blocks"] == 2
    assert row["avg_squared"] == 17


def test_max_distinct_count(spark, golden):
    assert max_distinct_count(golden, ["a", "b", "c", "d"]) == 6


def test_skew_report_hand_values(spark):
    from auto_data_linkage_spark.profile import skew_report

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, ["k"], top=2).collect()
    assert [(r.val, r.cnt, r.rank) for r in out] == [("a", 6, 1), ("b", 3, 2)]
    assert out[0].share == 0.6
    assert all(r.max_share == 0.6 for r in out)
