"""Evaluation metrics (reference parity: autolinker.py:149-223 unsupervised
information-gain objective; :1190-1232 supervised pairwise P/R/F1).

All pair-level metrics are computed in Spark (the reference pulls clusters
to pandas/sklearn at autolinker.py:1243 — we stay distributed).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from auto_data_linkage_spark.profile import column_entropies


@dataclass
class UnsupervisedMetrics:
    adjusted_gain: float
    standardized_gain: float
    information_gain_power_ratio: float


def information_gain_power_ratio(
    data: DataFrame,
    clusters: DataFrame,
    attribute_columns: list[str],
    unique_id: str = "unique_id",
    *,
    base_u: int | None = None,
) -> UnsupervisedMetrics:
    """The reference's unsupervised objective
    (``_calculate_unsupervised_metrics``, autolinker.py:149-223).

    Let H(data) be per-column entropy over the whole table and H(within) the
    mean per-cluster entropy over records in multi-record clusters. The
    *information gain* of the clustering is the entropy drop; the reference
    scales two variants (adjusted = log base c = #multi-clusters;
    standardized = log base u = max distinct values in any column) and
    combines them as ``I_s ** I_a`` (autolinker.py:212-217).
    """
    counts = clusters.groupBy("cluster_id").count()
    multi = counts.where(F.col("count") > 1)
    c = multi.count()
    if c == 0:
        return UnsupervisedMetrics(0.0, 0.0, 0.0)
    clustered = clusters.join(
        F.broadcast(multi.select("cluster_id")), "cluster_id", "inner"
    )

    if base_u is None:
        # max distinct-value count across attribute columns (A8,
        # autolinker.py:597-602) — one job via a single agg
        row = data.agg(
            *[F.countDistinct(col).alias(col) for col in attribute_columns]
        ).collect()[0]
        base_u = max(max(row[col] for col in attribute_columns), 2)
    base_c = max(c, 2)

    def mean_entropy(df: DataFrame, base: float) -> float:
        ents = column_entropies(df, attribute_columns, base=base)
        return sum(ents.values()) / len(attribute_columns)

    def mean_within_entropy(base: float) -> float:
        # per-cluster per-column entropy, averaged — computed with ONE
        # melt + two-level aggregation, not one job per cluster
        melted = clustered.select(
            "cluster_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(col).alias("col"),
                            F.col(col).cast("string").alias("val"),
                        )
                        for col in attribute_columns
                    ]
                )
            ).alias("kv"),
        ).select("cluster_id", "kv.col", "kv.val")
        vc = melted.groupBy("cluster_id", "col", "val").count()
        tot = Window.partitionBy("cluster_id", "col")
        p = F.col("count") / F.sum("count").over(tot)
        ent = vc.select(
            "cluster_id",
            "col",
            (-p * F.log(float(base), p)).alias("term"),
        ).groupBy("cluster_id", "col").agg(F.sum("term").alias("h"))
        row = ent.groupBy().agg(F.avg("h").alias("mh")).collect()[0]
        return float(row["mh"] or 0.0)

    adj_gain = mean_entropy(data, base_c) - mean_within_entropy(base_c)
    std_gain = mean_entropy(data, base_u) - mean_within_entropy(base_u)
    adj_gain = max(adj_gain, 0.0)
    std_gain = max(std_gain, 0.0)
    return UnsupervisedMetrics(
        adjusted_gain=adj_gain,
        standardized_gain=std_gain,
        information_gain_power_ratio=math.pow(std_gain, adj_gain)
        if std_gain > 0
        else 0.0,
    )


def clustering_scores(
    clusters: DataFrame,
    true_label: str,
    cluster_col: str = "cluster_id",
) -> dict[str, float]:
    """Supervised clustering scores computed IN SPARK from the
    (cluster, label) contingency counts — replaces the reference's
    ``toPandas`` + sklearn path (autolinker.py:1234-1257) with three
    aggregations; no driver-side row data.

    Returns homogeneity, completeness, V-measure (entropy-based; public
    formulas) and adjusted Rand index (pair-count formula).
    """
    cont = (
        clusters.groupBy(cluster_col, true_label)
        .count()
        .select(
            F.col(cluster_col).alias("k"),
            F.col(true_label).alias("c"),
            F.col("count").cast("double").alias("n"),
        )
    ).cache()
    n_total = cont.agg(F.sum("n")).collect()[0][0]
    if not n_total:
        return {k: 0.0 for k in (
            "homogeneity", "completeness", "v_measure", "adjusted_rand"
        )}

    def entropy_of(keys: list[str]) -> float:
        sizes = cont.groupBy(*keys).agg(F.sum("n").alias("m"))
        row = sizes.agg(
            F.sum(-(F.col("m") / n_total) * F.log(F.col("m") / n_total))
        ).collect()[0]
        return float(row[0] or 0.0)

    h_c = entropy_of(["c"])
    h_k = entropy_of(["k"])
    # H(C|K) = -Σ_{k,c} (n/N) ln(n / n_k)
    nk = cont.groupBy("k").agg(F.sum("n").alias("nk"))
    joint = cont.join(nk, "k")
    h_c_given_k = float(
        joint.agg(
            F.sum(-(F.col("n") / n_total) * F.log(F.col("n") / F.col("nk")))
        ).collect()[0][0]
        or 0.0
    )
    nc = cont.groupBy("c").agg(F.sum("n").alias("nc"))
    joint_c = cont.join(nc, "c")
    h_k_given_c = float(
        joint_c.agg(
            F.sum(-(F.col("n") / n_total) * F.log(F.col("n") / F.col("nc")))
        ).collect()[0][0]
        or 0.0
    )
    homogeneity = 1.0 if h_c == 0 else 1.0 - h_c_given_k / h_c
    completeness = 1.0 if h_k == 0 else 1.0 - h_k_given_c / h_k
    v = (
        0.0
        if homogeneity + completeness == 0
        else 2 * homogeneity * completeness / (homogeneity + completeness)
    )

    # adjusted Rand from pair counts
    def comb2(col):
        return col * (col - 1) / 2

    sum_ij = cont.agg(F.sum(comb2(F.col("n")))).collect()[0][0] or 0.0
    sum_k = nk.agg(F.sum(comb2(F.col("nk")))).collect()[0][0] or 0.0
    sum_c = nc.agg(F.sum(comb2(F.col("nc")))).collect()[0][0] or 0.0
    total_pairs = n_total * (n_total - 1) / 2
    expected = sum_k * sum_c / total_pairs if total_pairs else 0.0
    max_index = (sum_k + sum_c) / 2
    ari = (
        0.0
        if max_index == expected
        else (sum_ij - expected) / (max_index - expected)
    )
    cont.unpersist()
    return {
        "homogeneity": homogeneity,
        "completeness": completeness,
        "v_measure": v,
        "adjusted_rand": float(ari),
    }


def pairwise_prf(
    clusters: DataFrame,
    true_label: str,
    unique_id: str = "unique_id",
) -> dict[str, float]:
    """Supervised pairwise precision/recall/F1/Jaccard from cluster vs
    true-label pair counts (reference autolinker.py:1190-1232), computed
    entirely with aggregations — no pair self-joins.

    #pairs sharing a key = Σ n·(n−1)/2 over key group sizes; true positives
    come from group sizes of the (cluster, label) pair.
    """

    def pair_count(df: DataFrame, keys: list[str]) -> int:
        sizes = df.groupBy(*keys).count()
        row = sizes.agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p")
        ).collect()[0]
        return int(row["p"] or 0)

    predicted = pair_count(clusters, ["cluster_id"])
    actual = pair_count(clusters, [true_label])
    tp = pair_count(clusters, ["cluster_id", true_label])
    fp = predicted - tp
    fn = actual - tp
    precision = tp / predicted if predicted else 0.0
    recall = tp / actual if actual else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    jaccard = tp / (tp + fp + fn) if (tp + fp + fn) > 0 else 0.0
    return {
        "true_positives": float(tp),
        "false_positives": float(fp),
        "false_negatives": float(fn),
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "jaccard": jaccard,
    }
