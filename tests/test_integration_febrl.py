"""Reference-scale integration test: full unsupervised auto-link on a
~560-row FEBRL-style dirty-people table (the reference's integration run
is 1000 rows of the same shape, integration-tests/deduplication_test.py).
"""

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.autolink import AutoLinker
from auto_data_linkage_spark.cleaning import null_sentinel
from auto_data_linkage_spark.cluster import cluster_at_threshold
from auto_data_linkage_spark.compare import Comparison
from auto_data_linkage_spark.metrics import clustering_scores, pairwise_prf
from auto_data_linkage_spark.model import FellegiSunterModel

from tests.febrl_fixture import SCHEMA, make_people


# r16 test-tier split: this module is a lifecycle-matrix / property /
# full-catalog sweep — cost is a matrix-sized multiple of a unit test,
# so it runs in the exhaustive tier (pytest -m exhaustive), not the
# default wall-budgeted gate. See pytest.ini + OPTIMIZATION_r16.md.
pytestmark = pytest.mark.exhaustive


@pytest.fixture(scope="module")
def febrl(spark):
    return spark.createDataFrame(make_people(400, 0.4, seed=42), SCHEMA).cache()


@pytest.mark.slow
def test_trained_model_dedups_febrl(spark, febrl):
    """Hand-configured model + real training (u sampling + EM): the
    supervised scores gate end-to-end correctness at reference scale."""
    df = null_sentinel(febrl)
    comps = [
        Comparison("given_name", "jaro_winkler", 0.88),
        Comparison("surname", "jaro_winkler", 0.88),
        Comparison("suburb", "levenshtein", 2),
        Comparison("postcode", "levenshtein", 1),
        Comparison("date_of_birth", "levenshtein", 1),
    ]
    rules = [("suburb",), ("postcode",), ("date_of_birth",)]
    model = FellegiSunterModel(comps, rules)
    model.estimate_u(df, target_pairs=80_000, seed=1)
    model.estimate_m_em(df, ("suburb",))
    model.estimate_m_em(df, ("date_of_birth",))
    preds = model.predict(df)
    clusters = cluster_at_threshold(df, preds, 0.9)
    prf = pairwise_prf(clusters, "recid")
    assert prf["recall"] >= 0.9, prf
    assert prf["precision"] >= 0.9, prf
    cs = clustering_scores(clusters, "recid")
    assert cs["homogeneity"] >= 0.95, cs
    assert cs["adjusted_rand"] >= 0.85, cs


@pytest.mark.slow
def test_autolinker_unsupervised_febrl(spark, febrl):
    """Fully unsupervised search (no labels used in training) recovers
    most planted duplicates.

    The F1 floor is the linkage-quality gate: a silent search-quality
    regression (e.g. a TPE scoring bug) degrades the unsupervised
    objective's correlation with truth and lands well below it. The
    seeded 4-eval run scores F1 = 1.0 on this fixture (recorded round 6);
    0.85 leaves margin for sampling jitter without letting a real
    regression through."""
    linker = AutoLinker(
        comparison_size_limit=200_000,
        max_evals=4,
        true_label="recid",
        random_seed=42,
    )
    linker.auto_link(febrl.drop("unique_id"))
    clusters = linker.best_clusters_at_threshold(0.8)
    prf = pairwise_prf(clusters, "recid")
    assert prf["recall"] >= 0.5, prf
    assert prf["precision"] >= 0.5, prf
    assert prf["f1"] >= 0.85, prf
