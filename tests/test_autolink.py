import pytest

from auto_data_linkage_spark.autolink import AutoLinker
from auto_data_linkage_spark.metrics import (
    information_gain_power_ratio,
    pairwise_prf,
)


def test_pairwise_prf_perfect_clustering(spark, people):
    clusters = people.withColumn("cluster_id", people["recid"])
    prf = pairwise_prf(clusters, "recid")
    assert prf["precision"] == 1.0 and prf["recall"] == 1.0 and prf["f1"] == 1.0


def test_pairwise_prf_all_singletons(spark, people):
    clusters = people.withColumn("cluster_id", people["unique_id"])
    prf = pairwise_prf(clusters, "recid")
    assert prf["recall"] == 0.0 and prf["true_positives"] == 0.0


def test_information_gain_zero_when_no_multiclusters(spark, people):
    clusters = people.withColumn("cluster_id", people["unique_id"])
    um = information_gain_power_ratio(
        people, clusters, ["given_name", "surname"]
    )
    assert um.information_gain_power_ratio == 0.0


def test_information_gain_positive_for_true_clusters(spark, people):
    clusters = people.withColumn("cluster_id", people["recid"])
    um = information_gain_power_ratio(
        people, clusters, ["given_name", "surname", "suburb", "postcode"]
    )
    assert um.scaled_gain > 0
    assert um.adjusted_gain > 0
    assert um.information_gain_power_ratio > 0


def test_information_gain_matches_reference_formula(spark):
    """Golden test against the reference math (autolinker.py:149-223):
    entropies over the matched subset, per-column gains SUMMED, result
    pow(gain_base_c, gain_base_u)."""
    import math
    from collections import Counter

    rows = [
        ("1", "x", "p", "c1"),
        ("2", "x", "q", "c1"),
        ("3", "y", "p", "c1"),
        ("4", "z", "r", "c2"),
        ("5", "z", "r", "c2"),
        ("6", "w", "s", "s6"),  # singleton cluster — excluded from matched
    ]
    data = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows], "unique_id string, a string, b string"
    )
    clusters = spark.createDataFrame(
        rows, "unique_id string, a string, b string, cluster_id string"
    )
    um = information_gain_power_ratio(data, clusters, ["a", "b"])

    def entropy(vals, base):
        n = len(vals)
        return -sum(
            (c / n) * math.log(c / n, base) for c in Counter(vals).values()
        )

    matched = [r for r in rows if r[3] in ("c1", "c2")]
    base_c = 2  # two multi-record clusters
    base_u = 4  # max distinct values of any column in the ORIGINAL data
    expected = {}
    for base in (base_c, base_u):
        gain = 0.0
        for col in (1, 2):
            h_matched = entropy([r[col] for r in matched], base)
            per_cluster = [
                entropy([r[col] for r in matched if r[3] == cid], base)
                for cid in ("c1", "c2")
            ]
            gain += h_matched - sum(per_cluster) / len(per_cluster)
        expected[base] = gain
    assert um.scaled_gain == pytest.approx(expected[base_c], rel=1e-9)
    assert um.adjusted_gain == pytest.approx(expected[base_u], rel=1e-9)
    assert um.information_gain_power_ratio == pytest.approx(
        math.pow(expected[base_c], expected[base_u]), rel=1e-9
    )


@pytest.mark.slow
def test_auto_link_end_to_end(spark, people):
    """Full unsupervised search on the FEBRL-style fixture: must find the
    planted duplicates with decent quality, no labels used for training."""
    linker = AutoLinker(
        comparison_size_limit=5_000,
        max_evals=3,
        true_label="recid",
        random_seed=7,
    )
    best = linker.auto_link(people.drop("unique_id"))
    assert best.score >= 0.0
    clusters = linker.best_clusters_at_threshold(0.8)
    prf = pairwise_prf(clusters, "recid")
    # 5 planted duplicate pairs; unsupervised search should recover most
    assert prf["recall"] >= 0.6, prf
    assert prf["precision"] >= 0.6, prf
    scores = linker.get_scores_df()
    assert {"unique_id_l", "unique_id_r", "match_probability"} <= set(scores.columns)


@pytest.mark.exhaustive
def test_random_sampler_mode(spark, people):
    """sampler="random" (the A/B control arm, tools/tpe_ab.py) must run
    the same loop with the Parzen model disabled and still link."""
    linker = AutoLinker(
        max_evals=2,
        comparison_size_limit=100_000,
        random_seed=5,
        sampler="random",
    )
    linker.auto_link(people)
    assert linker.best_trial is not None
    assert len(linker.trials) == 2
    with pytest.raises(ValueError, match="sampler"):
        AutoLinker(sampler="parzen")


class TestAutoGuards:
    """Round-15: AutoLinker is scale-safe by DEFAULT — the "auto" guards
    resolve against n at auto_link time (SCALE.md "AutoLinker E2E at
    150k rows" is the measured failure the defaults now prevent)."""

    def test_small_n_resolves_to_reference_parity(self):
        linker = AutoLinker(comparison_size_limit=100_000)
        assert linker._resolve_guards(10_000) == (None, None)

    def test_large_n_derives_cap_and_guard(self):
        linker = AutoLinker(comparison_size_limit=100_000)
        cap, guard = linker._resolve_guards(10_001)
        assert guard == 100_000
        # ceil(sqrt(100_000)) = 317: one block contributes ≤ cap² ≈ budget
        assert cap == 317
        assert (cap - 1) ** 2 < 100_000 <= cap * cap

    def test_large_n_cap_scales_with_budget(self):
        linker = AutoLinker(comparison_size_limit=5_000_000)
        cap, guard = linker._resolve_guards(150_000)
        assert guard == 5_000_000
        assert cap == 2_237  # ceil(sqrt(5M)) — the 150k E2E's derived cap

    def test_parity_forces_none_at_any_n(self):
        linker = AutoLinker(comparison_size_limit=100_000, parity=True)
        assert linker._resolve_guards(10_000_000) == (None, None)

    def test_explicit_values_pass_through(self):
        linker = AutoLinker(
            comparison_size_limit=100_000,
            max_block_size=123,
            total_pairs_guard=456,
        )
        assert linker._resolve_guards(5) == (123, 456)
        assert linker._resolve_guards(10_000_000) == (123, 456)

    def test_explicit_none_passes_through(self):
        linker = AutoLinker(
            comparison_size_limit=100_000,
            max_block_size=None,
            total_pairs_guard=None,
        )
        assert linker._resolve_guards(10_000_000) == (None, None)

    def test_bad_string_rejected(self):
        with pytest.raises(ValueError, match="total_pairs_guard"):
            AutoLinker(total_pairs_guard="yes")
        with pytest.raises(ValueError, match="max_block_size"):
            AutoLinker(max_block_size="cap")

    def test_default_run_records_resolved_guards(self, spark, people):
        linker = AutoLinker(
            comparison_size_limit=5_000, max_evals=1, random_seed=7
        )
        linker.auto_link(people.drop("unique_id"))
        # fixture is tiny (< 10k rows): defaults resolved to parity
        assert linker.resolved_max_block_size is None
        assert linker.resolved_total_pairs_guard is None
