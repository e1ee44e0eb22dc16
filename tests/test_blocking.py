import pytest

from auto_data_linkage_spark.blocking import (
    RuleEstimate,
    count_lookup,
    deterministic_rule,
    estimate_or_rule,
    generate_blocking_rules,
)
from auto_data_linkage_spark.model import BlockingRule, candidate_pairs
from auto_data_linkage_spark.compare import Comparison


def test_estimate_or_rule_reference_semantics():
    """Exact parity with ARC_EstimateSquaredCountOR.scala:22-35: singleton
    -> its avg squared count; pairs -> n1*k2 + n2*k1 - k1*k2 summed."""
    lookup = {("a",): (10, 100), ("b",): (20, 50), ("c",): (5, 9)}
    assert estimate_or_rule((("a",),), lookup) == 100
    assert estimate_or_rule((("a",), ("b",)), lookup) == 10 * 50 + 20 * 100 - 100 * 50
    three = (
        (10 * 50 + 20 * 100 - 100 * 50)
        + (10 * 9 + 5 * 100 - 100 * 9)
        + (20 * 9 + 5 * 50 - 50 * 9)
    )
    assert estimate_or_rule((("a",), ("b",), ("c",)), lookup) == three


def test_rule_estimate_to_sql():
    r = RuleEstimate((("surname", "postcode"), ("suburb",)), 42)
    assert r.to_sql() == (
        "(l.surname = r.surname AND l.postcode = r.postcode) OR (l.suburb = r.suburb)"
    )
    assert [b.columns for b in r.to_blocking_rules()] == [
        ("surname", "postcode"), ("suburb",)
    ]


def test_count_lookup_shapes(spark, people):
    lookup = count_lookup(
        people, ["surname", "postcode"], max_columns_per_and_rule=2, min_count=1
    )
    assert ("surname",) in lookup
    assert ("postcode",) in lookup
    assert ("postcode", "surname") in lookup
    for n, k in lookup.values():
        assert n >= 1 and k >= 1


def test_generated_rules_estimates_track_true_counts(spark, people):
    """The estimate is a heuristic — verify it orders rules consistently
    with TRUE blocking-join pair counts (SURVEY §7: verify by comparison,
    not bit-for-bit)."""
    rules = generate_blocking_rules(
        people,
        ["surname", "postcode", "suburb"],
        comparison_size_limit=10_000,
        sample_rows=None,
    )
    assert rules, "expected at least one affordable rule"
    comps = [Comparison("surname", "exact", 0)]
    sizes = {}
    for r in rules:
        if len(r.arms) != 1:
            continue
        true_pairs = candidate_pairs(
            people, r.to_blocking_rules(), comps
        ).count()
        sizes[r.arms] = (r.estimated_pairs, true_pairs)
    ests = [v[0] for v in sizes.values()]
    trues = [v[1] for v in sizes.values()]
    # estimates within a constant factor of n^2-flavored truth, and ranking
    # broadly agrees: the cheapest-estimated single rule is among the
    # cheapest by truth
    best_est = min(sizes, key=lambda a: sizes[a][0])
    assert sizes[best_est][1] <= sorted(trues)[1 if len(trues) > 1 else 0]


def test_budget_filter(spark, people):
    rules = generate_blocking_rules(
        people, ["surname", "postcode"], comparison_size_limit=1, sample_rows=None
    )
    assert rules == []


def test_deterministic_rule_picks_largest_of_smallest():
    rules = [RuleEstimate((("a",),), e) for e in (5, 50, 500)]
    assert deterministic_rule(rules).estimated_pairs == 500
    assert deterministic_rule([]) is None


def test_or_rule_search_covers_wide_schema_exhaustively(spark):
    """Reference-parity breadth (ARC.scala top-1000 re-expansion): on a
    wide schema whose combination space fits inside the beam, the search
    must return EVERY affordable OR rule an exhaustive enumeration finds
    — the old 40-cheapest-arm shortcut silently dropped rules whose arms
    weren't individually cheap."""
    import random
    from itertools import combinations

    from auto_data_linkage_spark.blocking import (
        count_lookup,
        estimate_or_rule,
        generate_blocking_rules,
    )

    rng = random.Random(13)
    n_cols = 12
    rows = [
        tuple(f"v{rng.randrange(2 + (c % 7))}" for c in range(n_cols))
        for _ in range(400)
    ]
    cols = [f"c{i}" for i in range(n_cols)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} string" for c in cols))

    limit = 50_000
    got = generate_blocking_rules(
        df,
        cols,
        comparison_size_limit=limit,
        max_columns_per_and_rule=1,
        max_rules_per_or_rule=3,
        sample_rows=None,
        top_k=1000,
    )
    got_sets = {r.arms for r in got}

    lookup = count_lookup(df, cols, max_columns_per_and_rule=1)
    arms = sorted(lookup)
    exhaustive = set()
    for i in (1, 2, 3):
        for arm_set in combinations(arms, i):
            if estimate_or_rule(arm_set, lookup) < limit:
                exhaustive.add(arm_set)
    # same budget (top_k=1000): every affordable exhaustive rule that fits
    # in the final top-1000 must be present
    missing = exhaustive - got_sets
    assert len(exhaustive) <= 1000  # precondition: budget covers the space
    assert not missing, sorted(missing)[:5]


def test_or_rule_search_beam_overflow_returns_true_affordable_topk(spark):
    """Review finding: a descending-only beam over >top_k pair sets can
    evict affordable combinations before the final limit filter. With
    top_k far below C(n,2), the result must equal the TRUE top-k of the
    exhaustively-enumerated affordable rule set."""
    import random
    from itertools import combinations

    from auto_data_linkage_spark.blocking import (
        count_lookup,
        estimate_or_rule,
        generate_blocking_rules,
    )

    rng = random.Random(3)
    cols = [f"c{i}" for i in range(8)]
    rows = [
        tuple(f"v{rng.randrange(2 + 7 * (c % 4))}" for c in range(8))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, ", ".join(f"{c} string" for c in cols))
    limit, k = 30_000, 5  # k far below C(8,2)=28 pair sets
    got = generate_blocking_rules(
        df,
        cols,
        comparison_size_limit=limit,
        max_columns_per_and_rule=1,
        max_rules_per_or_rule=2,
        sample_rows=None,
        top_k=k,
    )
    lookup = count_lookup(df, cols, max_columns_per_and_rule=1)
    arms = sorted(lookup)
    exhaustive = [
        (tuple(sorted(s)), estimate_or_rule(tuple(sorted(s)), lookup))
        for i in (1, 2)
        for s in combinations(arms, i)
    ]
    want = sorted(
        [x for x in exhaustive if x[1] < limit], key=lambda x: (-x[1], x[0])
    )[:k]
    assert [(r.arms, r.estimated_pairs) for r in got] == want


# ----------------------------------------- untrimmed total-pairs guard
# The reference's estimator is a TRIMMED per-block average: hot-block
# rules keep a small trimmed estimate while their true pair count
# explodes (measured at 150k rows — SCALE.md "AutoLinker E2E"). The
# total_pairs_guard gate drops them on the UNTRIMMED total.


def _skewed_df(spark):
    """`hot`: two 60-row blocks + 80 singleton-ish blocks — the trimmed
    estimate collapses toward the tiny median while the true squared
    total is 2·60² + tail; `pc`: 40 uniform 4-row blocks (benign)."""
    rows = []
    uid = 0
    for b in range(2):
        for _ in range(60):
            rows.append((uid, f"hot{b}", f"pc{uid % 40}")); uid += 1
    for t in range(40):
        for _ in range(2):
            rows.append((uid, f"tail{t}", f"pc{uid % 40}")); uid += 1
    return spark.createDataFrame(rows, "unique_id long, hot string, pc string")


def test_total_squared_lookup_is_untrimmed(spark):
    from auto_data_linkage_spark.blocking import total_squared_lookup

    df = _skewed_df(spark)
    totals = total_squared_lookup(
        df, ["hot", "pc"], max_columns_per_and_rule=1
    )
    # untrimmed: the two 60-row blocks dominate (2·3600 + 40·4 = 7360)
    assert totals[("hot",)] == 2 * 60 * 60 + 40 * 2 * 2
    assert totals[("pc",)] == 40 * 5 * 5  # 200 rows over 40 blocks of 5


def test_total_pairs_guard_drops_hot_rule_trim_admits(spark):
    df = _skewed_df(spark)
    kw = dict(
        comparison_size_limit=3_000,
        max_columns_per_and_rule=1,
        max_rules_per_or_rule=1,
        sample_rows=None,
    )
    # reference parity: the trimmed estimate (median-dominated by the
    # 40 tail blocks) admits the hot rule under the 3k budget
    base = generate_blocking_rules(df, ["hot", "pc"], **kw)
    assert ("hot",) in {r.arms[0] for r in base}
    # guarded: the untrimmed total (7,360 > 3,000) evicts it; the
    # benign rule survives and its estimate/order are untouched
    guarded = generate_blocking_rules(
        df, ["hot", "pc"], total_pairs_guard=3_000, **kw
    )
    arms = {r.arms[0] for r in guarded}
    assert ("hot",) not in arms and ("pc",) in arms
    pc_base = next(r for r in base if r.arms[0] == ("pc",))
    pc_guarded = next(r for r in guarded if r.arms[0] == ("pc",))
    assert pc_base.estimated_pairs == pc_guarded.estimated_pairs


def test_total_pairs_guard_default_is_reference_parity(spark, people):
    kw = dict(comparison_size_limit=10_000, sample_rows=None)
    assert generate_blocking_rules(
        people, ["surname", "postcode", "suburb"], **kw
    ) == generate_blocking_rules(
        people, ["surname", "postcode", "suburb"],
        total_pairs_guard=None, **kw
    )


def test_autolinker_passes_guard_through(spark, people, monkeypatch):
    from auto_data_linkage_spark import blocking as blocking_mod
    from auto_data_linkage_spark.autolink import AutoLinker

    seen = {}
    real = blocking_mod.generate_blocking_rules

    def spy(df, attrs, **kw):
        seen["guard"] = kw.get("total_pairs_guard")
        return real(df, attrs, **kw)

    monkeypatch.setattr(blocking_mod, "generate_blocking_rules", spy)
    linker = AutoLinker(
        comparison_size_limit=10_000, max_evals=1,
        total_pairs_guard=9_999_999, random_seed=1,
    )
    linker.auto_link(people.drop("unique_id"))
    assert seen["guard"] == 9_999_999


def test_generate_rules_warns_when_sampled_without_guard(spark):
    """Round-15: the loud runtime signal for the known-biased regime —
    n past the estimation sample with no untrimmed guard reproduces the
    measured 150k stall (SCALE.md), so generate_blocking_rules warns."""
    import warnings as _w

    from tests.febrl_fixture import SCHEMA, make_people

    big = spark.createDataFrame(make_people(120, 0.3, seed=9), SCHEMA)
    cols = ["surname", "postcode"]
    # force the sampled regime with a tiny sample_rows instead of 10k+
    # real rows — the warning keys on n > sample_rows, not on 10k
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        generate_blocking_rules(
            big, cols, comparison_size_limit=10_000, sample_rows=50
        )
    assert any("total_pairs_guard" in str(r.message) for r in rec)

    # guard present → silent; unsampled → silent
    with _w.catch_warnings(record=True) as rec2:
        _w.simplefilter("always")
        generate_blocking_rules(
            big, cols, comparison_size_limit=10_000, sample_rows=50,
            total_pairs_guard=10_000,
        )
        generate_blocking_rules(
            big, cols, comparison_size_limit=10_000, sample_rows=None
        )
    assert not [r for r in rec2 if "total_pairs_guard" in str(r.message)]
