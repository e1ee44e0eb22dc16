import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.cleaning import null_sentinel
from auto_data_linkage_spark.cluster import cluster_at_threshold
from auto_data_linkage_spark.compare import Comparison
from auto_data_linkage_spark.metrics import pairwise_prf
from auto_data_linkage_spark.model import (
    BlockingRule,
    FellegiSunterModel,
    candidate_pairs,
)


def test_blocking_rule_parse_roundtrip():
    r = BlockingRule.parse("l.surname = r.surname AND l.postcode = r.postcode")
    assert r.columns == ("surname", "postcode")
    assert r.to_sql() == "l.surname = r.surname AND l.postcode = r.postcode"
    assert BlockingRule.parse(("a", "b")).columns == ("a", "b")


def test_candidate_pairs_basic(spark):
    df = spark.createDataFrame(
        [("1", "smith", "2000"), ("2", "smith", "2000"), ("3", "jones", "2000")],
        "unique_id string, surname string, postcode string",
    )
    comps = [Comparison("surname", "levenshtein", 2)]
    pairs = candidate_pairs(df, [BlockingRule(("surname",))], comps)
    rows = pairs.collect()
    assert len(rows) == 1
    assert (rows[0]["unique_id_l"], rows[0]["unique_id_r"]) == ("1", "2")
    assert rows[0]["gamma_surname"] == 2


def test_candidate_pairs_disjoint_across_rules(spark):
    # pair (1,2) matches BOTH rules; match-key negation must emit it once
    df = spark.createDataFrame(
        [("1", "smith", "2000"), ("2", "smith", "2000"), ("4", "smith", "9999")],
        "unique_id string, surname string, postcode string",
    )
    comps = [Comparison("surname", "levenshtein", 2)]
    rules = [BlockingRule(("surname",)), BlockingRule(("postcode",))]
    pairs = candidate_pairs(df, rules, comps)
    keyed = {(r["unique_id_l"], r["unique_id_r"]) for r in pairs.collect()}
    assert keyed == {("1", "2"), ("1", "4"), ("2", "4")}
    assert pairs.count() == 3  # no duplicate pair rows


def test_candidate_pairs_null_blocking_col_not_dropped(spark):
    # rows 1/2 match rule 2 (postcode) but have NULL surname: the negation
    # of rule 1 (surname) must be null-safe or the pair silently vanishes
    df = spark.createDataFrame(
        [("1", None, "2000"), ("2", None, "2000"), ("3", "jones", "9999")],
        "unique_id string, surname string, postcode string",
    )
    comps = [Comparison("postcode", "levenshtein", 1)]
    rules = [BlockingRule(("surname",)), BlockingRule(("postcode",))]
    pairs = candidate_pairs(df, rules, comps)
    keyed = {(r["unique_id_l"], r["unique_id_r"]) for r in pairs.collect()}
    assert keyed == {("1", "2")}


def test_scores_monotone_in_agreement(spark, people):
    df = null_sentinel(people)
    comps = [
        Comparison("given_name", "levenshtein", 2),
        Comparison("surname", "levenshtein", 2),
        Comparison("suburb", "levenshtein", 2),
    ]
    model = FellegiSunterModel(comps, [("postcode",)], prior=0.01)
    scored = model.predict(df)
    rows = {
        (r["unique_id_l"], r["unique_id_r"]): r["match_probability"]
        for r in scored.collect()
    }
    # (3,15) is an exact duplicate pair; every gamma exact -> near 1
    exact_pair = rows[("15", "3")] if ("15", "3") in rows else rows[("3", "15")]
    assert exact_pair > 0.99


def test_u_estimation_shifts_params(spark, people):
    df = null_sentinel(people)
    comps = [Comparison("surname", "levenshtein", 2)]
    model = FellegiSunterModel(comps, [("postcode",)])
    before = dict(model.params["surname"].u)
    model.estimate_u(df, target_pairs=500)
    after = model.params["surname"].u
    assert after != before
    # random pairs rarely share a surname -> u(exact) small, u(else) large
    assert after[0] > 0.5


def test_em_converges_and_improves_m(spark, people):
    df = null_sentinel(people)
    comps = [
        Comparison("given_name", "levenshtein", 2),
        Comparison("surname", "levenshtein", 2),
    ]
    model = FellegiSunterModel(comps, [("postcode",)])
    model.estimate_u(df, target_pairs=500)
    iters = model.estimate_m_em(df, ("postcode",))
    assert 1 <= iters <= model.max_em_iterations
    m = model.params["surname"].m
    assert m[2] > 0.5  # matches mostly agree exactly on surname


def test_end_to_end_dedup_recovers_entities(spark, people):
    """The PR-1 slice: clean -> block -> compare -> score -> cluster."""
    df = null_sentinel(people)
    comps = [
        Comparison("given_name", "jaro_winkler", 0.9),
        Comparison("surname", "levenshtein", 2),
        Comparison("suburb", "levenshtein", 2),
        Comparison("postcode", "levenshtein", 1),
    ]
    model = FellegiSunterModel(
        comps, [("postcode",), ("surname",)], prior=5 / (17 * 16 / 2)
    )
    preds = model.predict(df)
    clusters = cluster_at_threshold(df, preds, 0.8)
    prf = pairwise_prf(clusters, "recid")
    assert prf["recall"] >= 0.8, prf
    assert prf["precision"] >= 0.8, prf


def test_tf_adjustment_rare_values_score_higher(spark):
    """Agreeing on a rare surname must outscore agreeing on a common one
    when tf_adjustment is on; without it they tie."""
    rows = [(str(i), "smith", "2000") for i in range(20)] + [
        ("100", "zyzmalski", "2000"),
        ("101", "zyzmalski", "2000"),
    ]
    df = spark.createDataFrame(rows, "unique_id string, surname string, pc string")

    def probs(tf):
        comps = [Comparison("surname", "levenshtein", 2, tf_adjustment=tf)]
        model = FellegiSunterModel(comps, [("pc",)], prior=0.01)
        got = {}
        for r in model.predict(df).collect():
            if r["surname_l"] != r["surname_r"]:
                continue  # cross pairs (gamma 0) aren't the comparison
            key = "rare" if r["surname_l"] == "zyzmalski" else "common"
            got[key] = r["match_probability"]
        return got

    base = probs(False)
    adj = probs(True)
    assert base["rare"] == base["common"]
    assert adj["rare"] > adj["common"]
    # common values are clamped at the global exact-u: never score below
    # the fuzzy level's evidence direction
    assert adj["common"] <= base["common"] + 1e-9


def test_model_roundtrip_preserves_tf_flag(tmp_path):
    comps = [Comparison("a", "exact", 0, tf_adjustment=True)]
    model = FellegiSunterModel(comps, [("a",)])
    path = str(tmp_path / "m.json")
    model.save(path)
    assert FellegiSunterModel.load(path).comparisons[0].tf_adjustment is True


def test_candidate_pairs_max_block_size_drops_hot_key(spark):
    # "smith" block has 4 rows (6 pairs); "jones" has 2 (1 pair). Cap 3
    # excludes the hot block entirely, leaves the small one untouched.
    rows = [(str(i), "smith", "2000") for i in range(1, 5)]
    rows += [("8", "jones", "2000"), ("9", "jones", "2000")]
    df = spark.createDataFrame(
        rows, "unique_id string, surname string, postcode string"
    )
    comps = [Comparison("surname", "levenshtein", 2)]
    rule = BlockingRule(("surname",))
    full = candidate_pairs(df, [rule], comps)
    assert full.count() == 7
    capped = candidate_pairs(df, [rule], comps, max_block_size=3)
    got = {(r["unique_id_l"], r["unique_id_r"]) for r in capped.collect()}
    assert got == {("8", "9")}


def test_candidate_pairs_max_block_size_link_mode(spark):
    left = spark.createDataFrame(
        [("l1", "smith"), ("l2", "smith"), ("l3", "jones")],
        "unique_id string, surname string",
    )
    right = spark.createDataFrame(
        [("r1", "smith"), ("r2", "jones")],
        "unique_id string, surname string",
    )
    comps = [Comparison("surname", "levenshtein", 2)]
    rule = BlockingRule(("surname",))
    capped = candidate_pairs(
        left, [rule], comps, right_df=right, max_block_size=1
    )
    got = {(r["unique_id_l"], r["unique_id_r"]) for r in capped.collect()}
    # smith exceeds the cap on the left side; only jones×jones survives
    assert got == {("l3", "r2")}


def test_candidate_pairs_block_cap_trim_bounds_pairs(spark):
    rows = [(str(i), "smith", "2000") for i in range(1, 7)]
    df = spark.createDataFrame(
        rows, "unique_id string, surname string, postcode string"
    )
    comps = [Comparison("surname", "levenshtein", 2)]
    rule = BlockingRule(("surname",))
    trimmed = candidate_pairs(
        df, [rule], comps, max_block_size=3, block_cap_mode="trim"
    )
    # 6-row block trimmed to a deterministic 3-row subset -> C(3,2) pairs
    assert trimmed.count() == 3
    again = candidate_pairs(
        df, [rule], comps, max_block_size=3, block_cap_mode="trim"
    )
    assert sorted(map(tuple, trimmed.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_block_cap_negation_sees_capped_prior_rule(spark):
    # Rows 1,2 live in a hot surname block (4 rows > cap 3) AND share a
    # small postcode block. The surname rule's cap drops them, so the
    # postcode rule's cross-rule negation must NOT exclude the pair —
    # negating the raw prior condition would lose it entirely.
    rows = [(str(i), "smith", f"{2000 + i}") for i in range(3, 7)]
    rows += [("1", "smith", "9999"), ("2", "smith", "9999")]
    df = spark.createDataFrame(
        rows, "unique_id string, surname string, postcode string"
    )
    comps = [Comparison("surname", "levenshtein", 2)]
    rules = [BlockingRule(("surname",)), BlockingRule(("postcode",))]
    # surname block now has 6 rows (> cap), postcode 9999 has 2 (<= cap)
    capped = candidate_pairs(df, rules, comps, max_block_size=3)
    got = {(r["unique_id_l"], r["unique_id_r"]) for r in capped.collect()}
    assert ("1", "2") in got
    # and nothing from the hot surname block via the surname rule
    assert all(
        not (l in "3456" and r in "3456") for l, r in got
    ), got


def test_match_key_dedup_equals_dropduplicates(spark):
    # Invariant: the no-shuffle match-key negation and the dropDuplicates
    # path must produce the same pair set, whatever the rule overlap.
    import random

    rng = random.Random(7)
    for case in range(3):
        rows = [
            (
                str(i),
                rng.choice(["a", "b", "c", None]),
                rng.choice(["x", "y", None]),
                rng.choice(["p", "q", "r"]),
            )
            for i in range(40)
        ]
        df = spark.createDataFrame(
            rows, "unique_id string, s string, t string, u string"
        )
        comps = [Comparison("u", "levenshtein", 1)]
        rules = [
            BlockingRule(("s",)),
            BlockingRule(("t",)),
            BlockingRule(("s", "t")),
        ]
        a = {
            (r["unique_id_l"], r["unique_id_r"])
            for r in candidate_pairs(df, rules, comps).collect()
        }
        b = {
            (r["unique_id_l"], r["unique_id_r"])
            for r in candidate_pairs(
                df, rules, comps, deduplicate_across_rules=False
            ).collect()
        }
        assert a == b, f"case {case}: {a ^ b}"


def test_em_contingency_matches_model_em(spark):
    """Round-15 ask #7 parity pin: queries._em_contingency — the driver
    arithmetic behind the linkage_funnel_trained catalog row (and its
    recursive-CTE DuckDB twin) — IS the single-comparison fix_u case of
    FellegiSunterModel.estimate_m_em: same init (the model's default
    m/u priors = queries._FS), same tol (em_convergence 0.01), same
    update. The model's E-step runs in log space (exp∘log round-trip),
    so equality is to 1e-9, with the iteration count exact."""
    from auto_data_linkage_spark.model import ELSE_LEVEL, EXACT_LEVEL, FUZZY_LEVEL
    from auto_data_linkage_spark.queries import _FS, _em_contingency

    # model default priors and the funnel's constants must be the same
    # numbers, or the parity claim is vacuous
    from auto_data_linkage_spark.model import _DEFAULT_M, _DEFAULT_U

    assert {l: _FS[l][0] for l in (0, 1, 2)} == {
        ELSE_LEVEL: _DEFAULT_M[ELSE_LEVEL],
        FUZZY_LEVEL: _DEFAULT_M[FUZZY_LEVEL],
        EXACT_LEVEL: _DEFAULT_M[EXACT_LEVEL],
    }
    assert {l: _FS[l][1] for l in (0, 1, 2)} == {
        ELSE_LEVEL: _DEFAULT_U[ELSE_LEVEL],
        FUZZY_LEVEL: _DEFAULT_U[FUZZY_LEVEL],
        EXACT_LEVEL: _DEFAULT_U[EXACT_LEVEL],
    }

    # small frame with all three gamma levels inside one block
    rows = [
        ("1", "smith", "b"), ("2", "smith", "b"),        # exact
        ("3", "smyth", "b"), ("4", "smythe", "b"),       # fuzzy vs 1/2
        ("5", "jonathan", "b"), ("6", "zzzzzzzz", "b"),  # else
    ]
    df = spark.createDataFrame(rows, "unique_id string, name string, blk string")
    comps = [Comparison("name", "levenshtein", 2)]
    model = FellegiSunterModel(comps, [BlockingRule(("blk",))])
    iters_model = model.estimate_m_em(df, BlockingRule(("blk",)), fix_u=True)

    pairs = candidate_pairs(df, [BlockingRule(("blk",))], comps)
    lvl = {
        int(r["gamma_name"]): float(r["count"])
        for r in pairs.groupBy("gamma_name").count().collect()
    }
    m0, m1, m2, lam, iters = _em_contingency(
        lvl.get(0, 0.0), lvl.get(1, 0.0), lvl.get(2, 0.0)
    )
    assert iters == iters_model
    trained = model.params["name"].m
    assert trained[ELSE_LEVEL] == pytest.approx(m0, abs=1e-9)
    assert trained[FUZZY_LEVEL] == pytest.approx(m1, abs=1e-9)
    assert trained[EXACT_LEVEL] == pytest.approx(m2, abs=1e-9)
    # fix_u left u at the priors
    assert model.params["name"].u[EXACT_LEVEL] == _FS[2][1]
