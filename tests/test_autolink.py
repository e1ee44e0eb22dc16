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
    assert um.adjusted_gain > 0
    assert um.standardized_gain > 0


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
