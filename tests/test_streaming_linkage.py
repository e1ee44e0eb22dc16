"""Streaming entity resolution: the foreachBatch-maintained cluster table
must equal full batch re-clustering of everything seen so far, survive
checkpointed restarts, and do delta-sized work per batch."""

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.cluster import cluster_at_threshold
from auto_data_linkage_spark.compare import Comparison
from auto_data_linkage_spark.model import FellegiSunterModel
from auto_data_linkage_spark.streaming.linkage import StreamingLinker
from febrl_fixture import make_people

PEOPLE_SCHEMA = (
    "unique_id string, given_name string, surname string, suburb string, "
    "postcode string, state string, date_of_birth string, recid string"
)
THRESHOLD = 0.9


def _model():
    return FellegiSunterModel(
        comparisons=[
            Comparison("given_name", "levenshtein", 2),
            Comparison("surname", "levenshtein", 2),
            Comparison("suburb", "levenshtein", 2),
            Comparison("postcode", "levenshtein", 1),
        ],
        blocking_rules=[("surname",), ("postcode",)],
        prior=1.0 / 500,
    )


def _assignments(df):
    return {
        r["unique_id"]: r["cluster_id"]
        for r in df.select(
            F.col("unique_id").cast("string").alias("unique_id"),
            F.col("cluster_id").cast("string").alias("cluster_id"),
        ).collect()
    }


@pytest.fixture(scope="module")
def people_batches(spark):
    rows = make_people(n_entities=90, dup_fraction=0.5, seed=23)
    df = spark.createDataFrame(rows, PEOPLE_SCHEMA)
    b0 = df.where(F.col("unique_id").cast("long") % 3 == 1)
    b1 = df.where(F.col("unique_id").cast("long") % 3 == 2)
    b2 = df.where(F.col("unique_id").cast("long") % 3 == 0)
    return df, (b0, b1, b2)


def test_streaming_linker_matches_batch_reclustering(
    spark, people_batches, tmp_path_factory
):
    root = tmp_path_factory.mktemp("slink")
    in_dir, state, ckpt = (
        str(root / "in"), str(root / "state"), str(root / "ckpt")
    )
    full_df, batches = people_batches
    linker = StreamingLinker(_model(), state, threshold=THRESHOLD)

    seen = None
    for i, batch in enumerate(batches):
        batch.write.mode("append").parquet(in_dir)
        stream = spark.readStream.schema(PEOPLE_SCHEMA).parquet(in_dir)
        q = linker.attach(stream, ckpt)
        q.awaitTermination()
        seen = batch if seen is None else seen.unionByName(batch)

        state_df = linker.current_clusters(spark)
        expected = cluster_at_threshold(
            seen, _model().predict(seen), THRESHOLD
        )
        assert _assignments(state_df) == _assignments(expected), (
            f"state diverged from batch re-clustering after batch {i}"
        )

    # restart with nothing new: checkpoint replays nothing, state unchanged
    before = _assignments(linker.current_clusters(spark))
    stream = spark.readStream.schema(PEOPLE_SCHEMA).parquet(in_dir)
    q = linker.attach(stream, ckpt)
    q.awaitTermination()
    assert _assignments(linker.current_clusters(spark)) == before


def test_streaming_linker_replay_is_idempotent(
    spark, people_batches, tmp_path_factory
):
    """Re-processing the SAME batch id (crash-before-commit replay) must
    leave the same snapshot, not duplicate records."""
    root = tmp_path_factory.mktemp("slink_replay")
    state = str(root / "state")
    _, (b0, b1, _) = people_batches
    linker = StreamingLinker(_model(), state, threshold=THRESHOLD)

    linker.process_batch(b0, 0)
    linker.process_batch(b1, 1)
    after_first = _assignments(linker.current_clusters(spark))
    n_rows = linker.current_clusters(spark).count()

    # replay batch 1: must overwrite snapshot 1 with identical content
    linker.process_batch(b1, 1)
    assert _assignments(linker.current_clusters(spark)) == after_first
    assert linker.current_clusters(spark).count() == n_rows


def test_streaming_linker_prunes_old_snapshots(
    spark, people_batches, tmp_path_factory
):
    root = tmp_path_factory.mktemp("slink_prune")
    state = str(root / "state")
    _, (b0, b1, b2) = people_batches
    linker = StreamingLinker(
        _model(), state, threshold=THRESHOLD, retain_versions=2
    )
    for i, b in enumerate((b0, b1, b2)):
        linker.process_batch(b, i)
    assert linker._versions() == [1, 2]
    # pruned history doesn't break the state or a replay of the LAST batch
    n = linker.current_clusters(spark).count()
    linker.process_batch(b2, 2)
    assert linker.current_clusters(spark).count() == n
