"""Streaming entity resolution: maintain a cluster table continuously as
record batches arrive (Structured Streaming ``foreachBatch`` +
contraction-based incremental clustering).

The reference has no streaming surface at all (SURVEY §2.12); this is the
green-field extension the 100 TB pipeline actually needs: the clustered
base is a long-lived asset, each micro-batch does delta-sized work
(:mod:`auto_data_linkage_spark.incremental`), and the state is versioned
so replays are idempotent.

State layout: one parquet snapshot per micro-batch id under
``state_dir/batch=<id>/``. A batch REPLAYED after a crash overwrites its
own snapshot (same ``batch_id`` ⇒ same directory ⇒ same result — the
source offsets come from the stream checkpoint), so the sink is
effectively exactly-once without a transactional table format. The
snapshot is the full cluster table: at true scale you'd swap this single
file-snapshot for a Delta/Iceberg MERGE of only the delta rows — the
assignment/merge DataFrames this module produces are exactly that merge's
input, so only ``_write_state`` changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from auto_data_linkage_spark.cluster import cluster_at_threshold
from auto_data_linkage_spark.incremental import (
    apply_increment,
    incremental_assign,
)


class StreamingLinker:
    """Continuous dedup/linkage over a stream of records.

    ``model`` is a trained
    :class:`~auto_data_linkage_spark.model.FellegiSunterModel` (set a
    fixed ``prior`` — scoring must not depend on batch size). The first
    batch is clustered outright; every later batch folds in via
    incremental assignment. ``current_clusters`` exposes the latest state.
    """

    def __init__(
        self,
        model,
        state_dir: str,
        *,
        threshold: float = 0.8,
        unique_id: str = "unique_id",
        retain_versions: int = 3,
    ):
        self.model = model
        self.state_dir = state_dir
        self.threshold = threshold
        self.unique_id = unique_id
        # snapshots to keep. ≥2 is required for crash replay (a replayed
        # batch folds into the snapshot BEFORE its own); more buys manual
        # time travel at the cost of disk
        self.retain_versions = max(2, retain_versions)

    # ---------------------------------------------------------- state io
    def _versions(self) -> list[int]:
        if not os.path.isdir(self.state_dir):
            return []
        out = []
        for name in os.listdir(self.state_dir):
            if name.startswith("batch="):
                try:
                    out.append(int(name.split("=", 1)[1]))
                except ValueError:
                    continue
        return sorted(out)

    def current_clusters(self, spark: SparkSession) -> DataFrame | None:
        """Latest cluster-table snapshot, or None before the first batch."""
        versions = self._versions()
        if not versions:
            return None
        return spark.read.parquet(
            f"{self.state_dir}/batch={versions[-1]}"
        )

    def _state_before(
        self, spark: SparkSession, batch_id: int
    ) -> DataFrame | None:
        """Latest snapshot written by a batch EARLIER than ``batch_id``.
        A replayed batch (crash after snapshot write, before checkpoint
        commit) must fold into the state as of its original run — reading
        the overall latest would fold its own snapshot in twice."""
        versions = [v for v in self._versions() if v < batch_id]
        if not versions:
            return None
        return spark.read.parquet(
            f"{self.state_dir}/batch={versions[-1]}"
        )

    def _write_state(self, df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            f"{self.state_dir}/batch={batch_id}"
        )
        self._prune(keep_latest=batch_id)

    def _prune(self, keep_latest: int) -> None:
        """Drop snapshots beyond ``retain_versions``, never the one just
        written nor the ``retain_versions - 1`` before it."""
        import shutil

        keep = set(
            sorted(v for v in self._versions() if v <= keep_latest)[
                -self.retain_versions:
            ]
        )
        keep.add(keep_latest)
        for v in self._versions():
            if v not in keep and v < keep_latest:
                shutil.rmtree(
                    f"{self.state_dir}/batch={v}", ignore_errors=True
                )

    # ------------------------------------------------------------- logic
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: fold one micro-batch into the cluster state."""
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        uid = self.unique_id
        base = self._state_before(spark, batch_id)
        if base is None:
            scored = self.model.predict(batch_df)
            clustered = cluster_at_threshold(
                batch_df, scored, self.threshold, unique_id=uid
            )
        else:
            inc = incremental_assign(
                self.model,
                base,
                batch_df,
                threshold=self.threshold,
                unique_id=uid,
            )
            clustered = apply_increment(base, batch_df, inc, unique_id=uid)
        # ids keep their native type end-to-end: cluster_at_threshold and
        # incremental_assign both label components by the same typed
        # minimum, so every snapshot has one stable schema and numeric ids
        # never fall into lexicographic ordering
        self._write_state(clustered, batch_id)

    def attach(self, stream_df: DataFrame, checkpoint: str):
        """Start the maintenance query on a streaming DataFrame of records.
        ``availableNow`` drains the backlog then stops — call repeatedly
        with the same checkpoint to process only what's new."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
