import math

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import similarity as S
from auto_data_linkage_spark.operators.similarity import (
    brute_force_topk,
    build_centroids,
    cosine_expr,
    dot_expr,
    ivf_topk,
    topk_pandas,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_small(spark, sf_dir):
    # small deterministic slice (dim 64) for the PQ property tests
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(60)
        .cache()
    )


def test_dot_and_cosine_exprs(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>"
    )
    row = df.select(
        dot_expr(F.col("a"), F.col("b")).alias("dot"),
        cosine_expr(F.col("a"), F.col("b")).alias("cos"),
    ).collect()[0]
    assert row["dot"] == pytest.approx(32.0)
    assert row["cos"] == pytest.approx(32.0 / (math.sqrt(14) * math.sqrt(77)))


def test_cosine_zero_norm_safe(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>"
    )
    assert df.select(cosine_expr(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"] == 0.0


def test_brute_force_topk(spark, emb):
    queries = emb.where(F.col("vec_id") < 3)
    out = brute_force_topk(emb, queries, k=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, nbrs in by_q.items():
        assert len(nbrs) == 5
        ranks = [n["rank"] for n in sorted(nbrs, key=lambda n: n["rank"])]
        assert ranks == [1, 2, 3, 4, 5]
        sims = [n["cosine"] for n in sorted(nbrs, key=lambda n: n["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(n["neighbor_id"] != q for n in nbrs)


def test_ivf_recall_on_clustered_data(spark):
    """On data whose cells reflect geometry (tight clusters), IVF with
    nprobe=1 must match brute force exactly. (The driver's synthetic
    embeddings table has labels UNcorrelated with geometry — only ~4% of
    true neighbors share the query's label — so recall there is
    structurally nprobe/ncells; the plumbing test below covers it.)"""
    import random

    rng = random.Random(42)
    rows = []
    vid = 0
    for cluster in range(5):
        center = [rng.gauss(0, 1) for _ in range(16)]
        for _ in range(20):
            vec = [c + rng.gauss(0, 0.01) for c in center]
            rows.append((vid, vec, cluster))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = df.where(F.col("vec_id") % 20 == 0)
    exact = brute_force_topk(df, queries, k=5)
    approx = ivf_topk(df, queries, k=5, nprobe=1)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) == 1.0


def test_ivf_probes_fewer_rows(spark, emb):
    queries = emb.where(F.col("vec_id") < 2)
    approx = ivf_topk(emb, queries, k=3, nprobe=1)
    # every neighbor must come from ONE cell per query (the probed one)
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    out = approx.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
    )
    per_q = out.groupBy("query_id").agg(F.countDistinct("label").alias("cells")).collect()
    assert all(r["cells"] == 1 for r in per_q)
    assert len(labels) > 1


def test_build_centroids_shape(spark, emb):
    cents = build_centroids(emb).collect()
    assert len(cents) == 10
    assert all(len(r["centroid"]) == 64 for r in cents)


def test_pandas_topk_matches_fold_path(spark, emb):
    qrows = emb.where(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    qvecs = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    a = brute_force_topk(emb, emb.where(F.col("vec_id") < 3), k=4)
    b = topk_pandas(emb, qvecs, k=4)
    sa = sorted((r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in a.collect())
    sb = sorted((r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in b.collect())
    assert sa == sb


def test_lsh_topk_recall_on_clustered_data(spark):
    """Hyperplane LSH must recover most true neighbors on clustered
    vectors (near-identical vectors share signature bands)."""
    import random

    from auto_data_linkage_spark.operators.similarity import lsh_topk

    rng = random.Random(3)
    rows = []
    vid = 0
    for cluster in range(8):
        center = [rng.gauss(0, 1) for _ in range(16)]
        for _ in range(15):
            rows.append((vid, [c + rng.gauss(0, 0.02) for c in center], cluster))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = df.where(F.col("vec_id") % 15 == 0)
    exact = brute_force_topk(df, queries, k=5)
    approx = lsh_topk(df, queries, k=5, dim=16, n_planes=12, band_bits=6)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, recall


def _clustered_df(spark, n_clusters=6, per_cluster=20, dim=16, seed=7):
    import random

    rng = random.Random(seed)
    rows, vid = [], 0
    for _ in range(n_clusters):
        center = [rng.gauss(0, 1) for _ in range(dim)]
        for _ in range(per_cluster):
            rows.append((vid, [c + rng.gauss(0, 0.02) for c in center]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_centroids_recover_clusters(spark):
    from auto_data_linkage_spark.operators.similarity import (
        assign_cells,
        kmeans_centroids,
    )

    df = _clustered_df(spark)
    cents = kmeans_centroids(df, k=6, max_iter=8, seed=1)
    assert len(cents) == 6 and all(len(c) == 16 for c in cents)
    labeled = assign_cells(df, cents)
    # every planted cluster (20 consecutive ids) should map to ONE cell
    sizes = (
        labeled.groupBy((F.col("vec_id") / 20).cast("int").alias("g"))
        .agg(F.countDistinct("cell").alias("cells"))
        .collect()
    )
    assert all(r["cells"] == 1 for r in sizes), sizes


def test_kmeans_deterministic(spark):
    from auto_data_linkage_spark.operators.similarity import kmeans_centroids

    df = _clustered_df(spark)
    a = kmeans_centroids(df, k=4, max_iter=3, seed=5)
    b = kmeans_centroids(df, k=4, max_iter=3, seed=5)
    assert a == b


def test_ivf_kmeans_topk_exact_on_tight_clusters(spark):
    from auto_data_linkage_spark.operators.similarity import ivf_kmeans_topk

    df = _clustered_df(spark)
    queries = df.where(F.col("vec_id") % 20 == 0)
    exact = brute_force_topk(df, queries, k=5)
    approx = ivf_kmeans_topk(
        df, queries, k=5, n_cells=6, nprobe=1, max_iter=8, seed=1
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) == 1.0


def test_lsh_signature_deterministic(spark):
    from auto_data_linkage_spark.operators.similarity import signature_expr

    df = spark.createDataFrame(
        [(1, [0.5] * 8), (2, [-0.5] * 8)], "vec_id long, embedding array<float>"
    )
    a = [r["s"] for r in df.select(signature_expr(F.col("embedding"), 8).alias("s")).collect()]
    b = [r["s"] for r in df.select(signature_expr(F.col("embedding"), 8).alias("s")).collect()]
    assert a == b
    assert a[0] != a[1]  # opposite vectors -> complementary signs


# ------------------------------------------------- product quantization
def test_pq_exact_when_corpus_is_codebook(spark, emb_small):
    """Perfect-reconstruction property: with n_codewords = |corpus|,
    every corpus vector reconstructs exactly (its own subvectors are
    codewords), so ADC scores equal true cosines and PQ top-k equals
    brute force, ranks included."""
    from auto_data_linkage_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    n = emb_small.count()
    queries = emb_small.limit(3)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in pq_topk(
            emb_small, queries, k=5, m=4, n_codewords=n
        ).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in brute_force_topk(emb_small, queries, k=5).collect()
    }
    assert got == want


def test_pq_encode_codes_in_range_and_deterministic(spark, emb_small):
    from auto_data_linkage_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    cbs = pq_codebooks(emb_small, m=4, n_codewords=8)
    assert len(cbs) == 4 and all(len(b) == 8 for b in cbs)
    out1 = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb_small, cbs).collect()}
    out2 = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb_small, cbs).collect()}
    assert out1 == out2
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in out1.values())


def test_pq_kmeans_rerank_recall(spark, emb_small):
    """The production recipe (learned per-subspace codebooks + exact
    re-rank of the PQ shortlist) must recover most true neighbors."""
    from auto_data_linkage_spark.operators.similarity import (
        brute_force_topk,
        pq_codebooks_kmeans,
        pq_topk,
    )

    queries = emb_small.limit(4)
    ex = {}
    for r in brute_force_topk(emb_small, queries, k=5).collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    cbs = pq_codebooks_kmeans(emb_small, m=4, n_codewords=16, max_iter=6)
    pq = {}
    for r in pq_topk(
        emb_small, queries, k=5, codebooks=cbs, rerank_factor=8
    ).collect():
        pq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q] & pq[q]) / 5 for q in ex]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


# ------------------------------------------------------------- IVF-PQ
def test_ivfpq_equals_flat_pq_when_probing_all_cells(spark, emb_small):
    """With nprobe >= #cells, IVF routing prunes nothing, so the composed
    index must equal flat PQ exactly (same codebooks, same ADC scores,
    same tie-breaks) — pins the composition to its parts."""
    from auto_data_linkage_spark.operators.similarity import (
        ivfpq_topk,
        pq_codebooks,
        pq_topk,
    )

    cbs = pq_codebooks(emb_small, m=4, n_codewords=8)
    queries = emb_small.limit(3)
    n_cells = emb_small.select("label").distinct().count()
    flat = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in pq_topk(emb_small, queries, k=5, codebooks=cbs).collect()
    }
    composed = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ivfpq_topk(
            emb_small, queries, k=5, nprobe=n_cells, codebooks=cbs
        ).collect()
    }
    assert composed == flat


def test_ivfpq_rerank_recall_on_clustered_data(spark):
    """On geometry-aligned cells, IVF-PQ with perfect-reconstruction
    codebooks and nprobe=1 must match brute force exactly (cells prune
    to the true cluster; ADC is exact when every vector is a codeword)."""
    import random

    from auto_data_linkage_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )

    rng = random.Random(7)
    rows = []
    vid = 0
    for cluster in range(4):
        center = [rng.gauss(0, 1) for _ in range(16)]
        for _ in range(10):
            vec = [c + rng.gauss(0, 0.01) for c in center]
            rows.append((vid, vec, cluster))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()
    queries = df.where(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(
            df, queries, k=5, nprobe=1, m=4, n_codewords=40, rerank_factor=2
        ).collect()
    }
    assert len(exact & got) / len(exact) == 1.0


def test_ivfpq_scans_fewer_coded_rows_than_flat(spark, emb):
    """The composition's point: the ADC join touches only probed cells'
    rows, strictly fewer than the flat scan on the multi-cell table."""
    from auto_data_linkage_spark.operators.similarity import ivfpq_topk

    queries = emb.where(F.col("vec_id") < 2)
    out = ivfpq_topk(emb, queries, k=3, nprobe=1, m=4, n_codewords=8)
    n_cells = emb.select("label").distinct().count()
    assert n_cells > 1
    # candidate pool per query ~ |corpus|/n_cells; all ranked rows must
    # come from the single probed cell per query
    cells = {
        r["label"]
        for r in out.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "neighbor_id",
        )
        .select("query_id", "label")
        .distinct()
        .collect()
    }
    assert len(cells) <= queries.count()  # one probed cell per query


def test_covariance_stats_matches_numpy(spark):
    import numpy as np

    from auto_data_linkage_spark.operators.similarity import covariance_stats

    rng = np.random.RandomState(7)
    data = rng.randn(200, 8) * np.arange(1, 9)[None, :]
    df = spark.createDataFrame(
        [(i, row.astype("float32").tolist()) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    ).repartition(5)
    cov, mean, n = covariance_stats(df, dim=8)
    assert n == 200
    f32 = data.astype("float32").astype("float64")
    np.testing.assert_allclose(mean, f32.mean(axis=0), atol=1e-6)
    np.testing.assert_allclose(cov, np.cov(f32.T, bias=True), atol=1e-6)


def test_pca_project_recovers_dominant_axes(spark):
    import numpy as np

    from auto_data_linkage_spark.operators.similarity import (
        pca_components,
        pca_project,
    )

    rng = np.random.RandomState(3)
    # variance concentrated in the first two axes
    base = rng.randn(300, 2) * [10.0, 5.0]
    noise = rng.randn(300, 6) * 0.1
    data = np.hstack([base, noise]).astype("float32")
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    comps, mean = pca_components(df, dim=8, out_dim=2)
    # the two top axes live in the first two coordinates
    assert np.abs(comps[:, :2]).sum() > 10 * np.abs(comps[:, 2:]).sum()
    proj = pca_project(df, comps, mean)
    rows = proj.orderBy("vec_id").collect()
    got = np.asarray([r.pca for r in rows], dtype=np.float64)
    # projected variance ordering: first component dominates
    v = got.var(axis=0)
    assert v[0] > v[1] > 1.0
    # determinism: a second fit projects identically
    comps2, mean2 = pca_components(df, dim=8, out_dim=2)
    np.testing.assert_allclose(comps, comps2, atol=1e-12)
    # schema: float32 array appended, original columns intact
    assert proj.columns == ["vec_id", "embedding", "pca"]
    assert len(rows[0].pca) == 2


# ------------------------------------------------------------- kNN graph


def _clustered_vecs(spark, n_per=40, clusters=4, dim=8, spread=0.05):
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(clusters, dim))
    rows = []
    vid = 0
    for c in range(clusters):
        for _ in range(n_per):
            v = centers[c] + spread * rng.normal(size=dim)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, truth int, embedding array<double>")


def test_knn_graph_neighbors_share_cluster(spark):
    from auto_data_linkage_spark.operators.similarity import (
        kmeans_centroids,
        knn_graph,
    )

    df = _clustered_vecs(spark).cache()
    cents = kmeans_centroids(df, k=8, seed=3)
    g = knn_graph(df, cents, k=5, nprobe=2)
    rows = g.collect()
    # every vector has exactly 5 neighbors (cells hold >= 6 members)
    from collections import Counter

    deg = Counter(r.query_id for r in rows)
    assert set(deg.values()) == {5}
    # tight clusters: neighbors overwhelmingly share the true cluster
    truth = {r.vec_id: r.truth for r in df.collect()}
    same = sum(truth[r.query_id] == truth[r.neighbor_id] for r in rows)
    assert same / len(rows) > 0.95


def test_knn_graph_matches_brute_force_when_one_cell(spark):
    from auto_data_linkage_spark.operators.similarity import (
        brute_force_topk,
        knn_graph,
    )

    df = _clustered_vecs(spark, n_per=25, clusters=2).cache()
    # one cell -> knn_graph degenerates to exact brute force
    g = knn_graph(df, [[0.0] * 8], k=3, nprobe=1)
    bf = brute_force_topk(df, df, k=3)
    got = {(r.query_id, r.neighbor_id, r.rank) for r in g.collect()}
    want = {(r.query_id, r.neighbor_id, r.rank) for r in bf.collect()}
    assert got == want


def test_knn_graph_no_corpus_broadcast(spark):
    from auto_data_linkage_spark.operators.similarity import knn_graph

    df = _clustered_vecs(spark)
    g = knn_graph(df, [[0.0] * 8, [1.0] * 8], k=2, nprobe=2)
    plan = g._jdf.queryExecution().executedPlan().toString()
    # the members-x-probes join must be a shuffle join on cell, not a
    # broadcast of a corpus-sized side; the only broadcast allowed is
    # the centroid routing table (2 rows)
    import re

    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    corpus_joins = [ln for ln in joins if "cell#" in ln]
    assert corpus_joins, plan
    assert all("Broadcast" not in ln for ln in corpus_joins), plan


# ---------------------------------------------------------------- SQ8
def test_sq8_recall_vs_brute_force(spark, emb):
    """Symmetric int8 keeps ~full recall: top-5 sets overlap >= 4/5 per
    query against exact brute force (quantization error ~1/254 of the
    per-vector max — far below typical neighbor gaps)."""
    queries = emb.where(F.col("vec_id") < 3)
    exact = S.brute_force_topk(emb, queries, k=5)
    approx = S.sq8_topk(emb, queries, k=5)
    et = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    at = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    per_q = {}
    for q, n in et:
        per_q.setdefault(q, [0, 0])[0] += 1
    for q, n in at & et:
        per_q[q][1] += 1
    assert all(hit >= total - 1 for total, hit in per_q.values()), per_q


def test_sq8_rerank_scores_are_exact(spark, emb):
    """rerank_factor > 0 re-scores the shortlist against true vectors:
    every returned cosine must equal the brute-force cosine for that
    (query, neighbor) pair."""
    queries = emb.where(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in S.brute_force_topk(emb, queries, k=50).collect()
    }
    rr = S.sq8_topk(emb, queries, k=5, rerank_factor=4).collect()
    assert rr
    for r in rr:
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact and exact[key] == r["cosine"]


def test_sq8_accepts_persisted_codes(spark, emb, tmp_path):
    """sq8_topk(codes=...) over a persisted sq8_encode table returns the
    same rows as the inline path — the 4x-smaller-scan serving shape."""
    queries = emb.where(F.col("vec_id") < 3)
    path = str(tmp_path / "sq8")
    S.sq8_encode(emb).write.parquet(path)
    codes = spark.read.parquet(path)
    inline = sorted(
        map(tuple, S.sq8_topk(emb, queries, k=5).collect())
    )
    served = sorted(
        map(tuple, S.sq8_topk(emb, queries, k=5, codes=codes).collect())
    )
    assert inline == served


def test_sq8_reconstruction_error_bound(spark, emb):
    """|recon_i - x_i| <= 0.5/scale for every element (round-half-up is
    within half a code step)."""
    q, scale = S.quantize_int8(F.col("embedding"))
    err = emb.select(
        F.array_max(
            F.zip_with(
                F.transform(q, lambda c: c.cast("double") / scale),
                F.col("embedding"),
                lambda r, x: F.abs(r - x.cast("double")),
            )
        ).alias("e"),
        (F.lit(0.5) / scale).alias("bound"),
    )
    bad = err.where(F.col("e") > F.col("bound") + 1e-12).count()
    assert bad == 0


def test_sq8_no_corpus_shuffle_plan(spark, emb):
    """Corpus scans once with a row-local decode; the only exchange is
    the query-partitioned window (queries broadcast)."""
    queries = emb.where(F.col("vec_id") < 3)
    plan = (
        S.sq8_topk(emb, queries, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan


# --------------------------------------------------- embedding outliers
def test_prototypicality_range_and_planted_outlier(spark):
    """A vector pointing away from its cell's direction scores lowest."""
    import random

    rng = random.Random(5)
    rows = []
    for i in range(30):
        rows.append((i, [1.0 + rng.uniform(-0.05, 0.05) for _ in range(8)], 0))
    rows.append((99, [-1.0] * 8, 0))  # planted outlier in cell 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    p = S.prototypicality(df).collect()
    assert all(-1.0 - 1e-9 <= r["proto"] <= 1.0 + 1e-9 for r in p)
    worst = min(p, key=lambda r: r["proto"])
    assert worst["vec_id"] == 99


def test_embedding_outliers_flags_bounded_fraction(spark, emb):
    out = S.embedding_outliers(emb, quantile=0.1)
    per_cell = (
        out.groupBy("cell")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("is_outlier").cast("int")).alias("flagged"),
        )
        .collect()
    )
    assert per_cell
    for r in per_cell:
        # strict < cut flags at most the quantile fraction per cell
        assert r["flagged"] <= r["n"] * 0.1 + 1, r
    # flagged rows are exactly the lowest-proto rows per cell
    rows = out.collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        flagged = {r["vec_id"] for r in members if r["is_outlier"]}
        if not flagged:
            continue
        cut_proto = max(r["proto"] for r in members if r["is_outlier"])
        unflagged_below = [
            r for r in members
            if not r["is_outlier"] and r["proto"] < cut_proto
        ]
        assert not unflagged_below, (cell, unflagged_below)


def test_embedding_outliers_quantile_validation(spark, emb):
    with pytest.raises(ValueError):
        S.embedding_outliers(emb, quantile=0.0)
    with pytest.raises(ValueError):
        S.embedding_outliers(emb, quantile=1.0)


def test_embedding_outliers_reuses_provided_centroids(spark, emb):
    """centroids= skips the build aggregate — serving shape for a stored
    routing table; results must match the inline path."""
    cents = S.build_centroids(emb)
    a = sorted(map(tuple, S.embedding_outliers(emb, quantile=0.1).collect()))
    b = sorted(
        map(
            tuple,
            S.embedding_outliers(emb, quantile=0.1, centroids=cents).collect(),
        )
    )
    assert a == b


# ------------------------------------------------------ multi-probe LSH
def test_lsh_multiprobe_monotone_recall(spark):
    """Probing 1-bit-neighbor buckets can only ADD candidates: the
    multiprobe result set per query is a superset of the base set, and
    recall vs brute force is monotone non-decreasing (strictly better
    on this clustered fixture)."""
    # noisy clusters (σ=0.5 vs unit centers): members straddle
    # hyperplanes, so single-bucket LSH has real recall headroom
    import random

    rng = random.Random(11)
    rows, vid = [], 0
    for _ in range(6):
        center = [rng.gauss(0, 1) for _ in range(16)]
        for _ in range(25):
            rows.append((vid, [c + rng.gauss(0, 0.5) for c in center]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.where(F.col("vec_id") % 25 == 0)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(df, queries, k=5).collect()
    }

    def hits(mp):
        from auto_data_linkage_spark.operators.similarity import lsh_topk

        return {
            (r.query_id, r.neighbor_id)
            for r in lsh_topk(
                df, queries, k=5, dim=16, n_planes=12, band_bits=6,
                multiprobe=mp,
            ).collect()
        }

    base, probed = hits(0), hits(4)
    assert len(truth & probed) >= len(truth & base)
    assert len(truth & probed) > len(truth & base), (
        len(truth & base), len(truth & probed),
    )


def test_lsh_multiprobe_validation(spark):
    from auto_data_linkage_spark.operators.similarity import lsh_topk

    df = _clustered_df(spark, n_clusters=2, per_cluster=4, dim=16, seed=1)
    with pytest.raises(ValueError, match="multiprobe"):
        lsh_topk(df, df.limit(1), k=2, dim=16, band_bits=6, multiprobe=7)
