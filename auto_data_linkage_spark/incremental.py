"""Incremental entity resolution: fold a batch of NEW records into an
existing clustering without re-clustering the base table.

The reference (and Splink 3.x) always re-clusters from scratch —
``cluster_pairwise_predictions_at_threshold`` over the full pair table
(autolinker.py:1063-1066). At 100 TB that is the one cost you cannot pay
per arrival: the base clustering is an asset to MAINTAIN, not recompute.

The standard trick is **cluster contraction**: connected components is
invariant under contracting an already-connected subgraph to one
super-node, so

    CC(E_base ∪ E_delta)  ≡  expand( CC( contract_base(E_delta) ) )

where ``contract_base`` maps every base endpoint of a delta edge to its
existing cluster id. The iterative work therefore scales with the DELTA
graph (≈ |new batch| + touched clusters), never with |base|:

1. new↔base candidate pairs: link-mode blocking join (the batch is the
   small side — Catalyst/AQE broadcasts it), scored by the trained model.
2. new↔new candidate pairs: dedup-mode blocking within the batch.
3. Contract: map matched base records to their ``cluster_id``.
4. Connected components over the contracted delta edges only.
5. Per component, the new cluster id is the MIN over member ids (base
   clusters contribute their cluster id, new records their unique id).
   Because the engine's cluster ids are themselves component minima, this
   reproduces EXACTLY the labels a full re-clustering of base ∪ batch
   would assign (verified in tests/test_incremental.py).

Outputs are (assignments for the new batch, merge events for existing
clusters). New evidence can legitimately merge two existing clusters —
a silent hazard in naive implementations; here it is surfaced as data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auto_data_linkage_spark.cluster import connected_components

# node-id prefixes inside the contracted CC graph; chosen so the two
# namespaces can never collide whatever the raw ids look like
_CLUSTER_PREFIX = "c:"
_RECORD_PREFIX = "r:"


@dataclass
class Increment:
    """Result of folding one batch into an existing clustering.

    - ``assignments``: (unique_id, cluster_id) for EVERY new record —
      matched records carry their component's id, unmatched ones their own
      unique id (same singleton convention as ``cluster_at_threshold``).
    - ``merges``: (old_cluster_id, new_cluster_id) rows, one per existing
      cluster whose id changes — either absorbed into another cluster via
      a bridging new record, or relabeled because a new record's id is the
      new component minimum. Apply with :func:`apply_increment`.
    """

    assignments: DataFrame
    merges: DataFrame


def incremental_components(
    base_assignments: DataFrame,
    delta_edges: DataFrame,
    *,
    node_col: str = "node",
    component_col: str = "component",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Connected components of ``E_base ∪ E_delta`` given only the BASE
    ASSIGNMENTS (node → component) and the delta edges, via cluster
    contraction. Returns (node, component) for every node touched by a
    delta edge plus every member cluster id, where ``component`` is the
    minimum member id.

    Ids are namespaced as strings inside the contracted graph, but the
    component MINIMUM is computed in the base assignment's ORIGINAL
    component type — numeric ids compare numerically, matching what a
    full re-clustering over the same ids would label (a lexicographic min
    would relabel cluster 9 to "100"). The CC input is the contracted
    delta graph — size O(|delta|), never O(base).
    """
    id_type = base_assignments.schema[component_col].dataType
    base = base_assignments.select(
        F.col(node_col).cast("string").alias("node"),
        F.col(component_col).cast("string").alias("component"),
    )
    edges = delta_edges.select(
        F.col(src).cast("string").alias("src"),
        F.col(dst).cast("string").alias("dst"),
    )

    def contract(side: str) -> DataFrame:
        nonlocal edges
        # base endpoints become their cluster's super-node; unknown
        # endpoints are new records
        return (
            edges.join(
                base.withColumnRenamed("node", side), side, "left"
            )
            .withColumn(
                side,
                F.when(
                    F.col("component").isNotNull(),
                    F.concat(F.lit(_CLUSTER_PREFIX), F.col("component")),
                ).otherwise(F.concat(F.lit(_RECORD_PREFIX), F.col(side))),
            )
            .drop("component")
        )

    edges = contract("src")
    edges = contract("dst")

    cc = connected_components(edges)
    # a component's final id is the min RAW id over members (in the
    # ORIGINAL id type): contracted cluster nodes contribute their cluster
    # id, record nodes their own id
    stripped = cc.select(
        "node",
        "component",
        F.expr("substring(node, 3)").cast(id_type).alias("raw"),
    )
    comp_min = stripped.groupBy("component").agg(
        F.min("raw").alias("cluster_id")
    )
    # node keeps its namespace prefix (c:/r:) so callers can tell cluster
    # super-nodes from record nodes; component is the raw min id. Join
    # strategy left to AQE: comp_min is delta-sized, usually broadcast
    return stripped.join(comp_min, "component").select(
        "node", F.col("cluster_id").alias(component_col)
    )


def incremental_assign(
    model,
    base_clusters: DataFrame,
    new_records: DataFrame,
    *,
    threshold: float = 0.8,
    unique_id: str = "unique_id",
    cluster_col: str = "cluster_id",
    score_base: DataFrame | None = None,
    within_batch: bool = True,
) -> Increment:
    """Assign ``new_records`` to clusters of ``base_clusters`` using a
    trained :class:`~auto_data_linkage_spark.model.FellegiSunterModel`.

    ``base_clusters`` is the engine's cluster table: the base records'
    attribute columns plus ``cluster_col`` (``cluster_at_threshold``
    output). Unique ids must be distinct across base and batch, and ids
    keep their ORIGINAL type end-to-end — numeric ids pick numeric
    component minima, exactly like a full re-clustering.

    Runs TWO scoring passes, both delta-sized: batch↔base (link mode — the
    batch broadcasts against the partitioned base) and batch↔batch (dedup
    mode). The base never self-joins again.

    Two-table linking engines restrict which pairs are legal:
    ``score_base`` (default: all of ``base_clusters``'s records) narrows
    the batch↔base pass to a subset — e.g. only the OPPOSITE table's rows
    under link_only semantics — while the contraction still sees every
    base assignment, so matches into any existing cluster relabel
    correctly. ``within_batch=False`` skips the batch↔batch pass (a batch
    from one side of a two-table link never pairs with itself).
    """
    id_type = base_clusters.schema[cluster_col].dataType
    base_records = (
        score_base if score_base is not None else base_clusters
    ).drop(cluster_col)
    # batch ↔ base evidence (link mode: no l<r filter, left = batch)
    nb = model.predict(new_records, right_df=base_records, threshold=threshold)
    delta = nb.select(
        F.col(f"{unique_id}_l").alias("src"), F.col(f"{unique_id}_r").alias("dst")
    )
    if within_batch:
        # batch ↔ batch evidence (dedup mode)
        nn = model.predict(new_records, threshold=threshold)
        delta = delta.unionByName(
            nn.select(
                F.col(f"{unique_id}_l").alias("src"),
                F.col(f"{unique_id}_r").alias("dst"),
            )
        )
    # cache the (delta-sized) edge list: its lineage is two blocking-join
    # scoring plans over the base, and downstream consumers (CC size probe,
    # contraction joins, assignment/merge branches) would re-run that
    # lineage once each — measured 2-3x the whole incremental cost
    delta = delta.cache()

    base_assign = base_clusters.select(
        F.col(unique_id).alias("node"), F.col(cluster_col).alias("component")
    )
    # eager localCheckpoint materializes the contracted-CC result ONCE and
    # lets the delta cache go immediately — a plain .cache() here pinned
    # two plans in the CacheManager per call, a storage leak under
    # StreamingLinker's one-call-per-micro-batch usage (checkpoint RDDs
    # are released by the ContextCleaner when the Increment is dropped)
    comp = incremental_components(base_assign, delta).localCheckpoint(
        eager=True
    )
    delta.unpersist()

    new_ids = new_records.select(unique_id)
    matched = comp.where(
        F.col("node").startswith(_RECORD_PREFIX)
    ).select(
        F.col("node")
        .substr(F.lit(3), F.length("node"))
        .cast(base_clusters.schema[unique_id].dataType)
        .alias(unique_id),
        F.col("component").alias(cluster_col),
    )
    assignments = (
        new_ids.join(matched, unique_id, "left")
        .withColumn(
            cluster_col,
            F.coalesce(F.col(cluster_col), F.col(unique_id).cast(id_type)),
        )
    )

    merges = (
        comp.where(F.col("node").startswith(_CLUSTER_PREFIX))
        .select(
            F.col("node")
            .substr(F.lit(3), F.length("node"))
            .cast(id_type)
            .alias("old_cluster_id"),
            F.col("component").alias("new_cluster_id"),
        )
        .where(F.col("old_cluster_id") != F.col("new_cluster_id"))
        .distinct()
    )
    return Increment(assignments=assignments, merges=merges)


def apply_increment(
    base_clusters: DataFrame,
    new_records: DataFrame,
    increment: Increment,
    *,
    unique_id: str = "unique_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Fold an :class:`Increment` back into the cluster table: relabel
    merged clusters (broadcast join — merges are delta-sized) and append
    the batch with its assignments. Result is the same schema as
    ``base_clusters`` and equals a full re-clustering of base ∪ batch
    under the min-id labeling convention."""
    relabeled = (
        base_clusters.join(
            F.broadcast(
                increment.merges.withColumnRenamed("old_cluster_id", cluster_col)
            ),
            cluster_col,
            "left",
        )
        .withColumn(
            cluster_col,
            F.coalesce(F.col("new_cluster_id"), F.col(cluster_col)),
        )
        .drop("new_cluster_id")
    )
    batch = new_records.join(increment.assignments, unique_id, "left")
    return relabeled.unionByName(batch.select(*relabeled.columns))
