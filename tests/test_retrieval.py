"""BM25 inverted-index retrieval: value correctness against a hand
computation, set semantics, determinism, and plan shape (broadcast probe,
no cartesian products)."""

import math

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import retrieval as R


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark shuffles the big table"),
        (2, "the small table broadcasts"),
        (3, "big joins shuffle big tables"),
        (4, "cats purr"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bm25_ref(corpus, query_terms, k1=1.2, b=0.75):
    """Driver-side reference implementation over tokenized python lists."""
    n = len(corpus)
    dls = {d: len(t) for d, t in corpus.items()}
    avgdl = sum(dls.values()) / n
    scores = {}
    for term in set(query_terms):
        df = sum(1 for t in corpus.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, toks in corpus.items():
            tf = toks.count(term)
            if tf == 0:
                continue
            denom = tf + k1 * (1 - b + b * dls[d] / avgdl)
            scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / denom
    return scores


def test_bm25_matches_hand_computation(spark, docs):
    corpus = {
        1: "spark shuffles the big table".split(),
        2: "the small table broadcasts".split(),
        3: "big joins shuffle big tables".split(),
        4: "cats purr".split(),
    }
    q = spark.createDataFrame(
        [(100, "big"), (100, "table")], ["query_id", "term"]
    )
    got = {
        r.doc_id: r.bm25
        for r in R.bm25_topk(docs, q, k=10).collect()
    }
    want = _bm25_ref(corpus, ["big", "table"])
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(round(s, 6), abs=1e-6)


def test_bm25_repeated_query_terms_score_once(spark, docs):
    q1 = spark.createDataFrame([(1, "big")], ["query_id", "term"])
    q2 = spark.createDataFrame(
        [(1, "big"), (1, "big")], ["query_id", "term"]
    )
    a = sorted(map(tuple, R.bm25_topk(docs, q1, k=10).collect()))
    b = sorted(map(tuple, R.bm25_topk(docs, q2, k=10).collect()))
    assert a == b


def test_bm25_rank_is_dense_and_ordered(spark, docs):
    q = spark.createDataFrame(
        [(7, "big"), (7, "table"), (7, "cats")], ["query_id", "term"]
    )
    rows = (
        R.bm25_topk(docs, q, k=2)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].bm25 >= rows[1].bm25


def test_bm25_exclude_self(spark, docs):
    probes = R.query_terms_from_docs(docs, n_terms=3)
    hits = R.bm25_topk(docs, probes, k=10, exclude_self=True).collect()
    assert all(r.query_id != r.doc_id for r in hits)
    assert hits  # docs share vocabulary, so cross-hits must exist


def test_bm25_unknown_terms_yield_empty(spark, docs):
    q = spark.createDataFrame([(1, "zzz")], ["query_id", "term"])
    assert R.bm25_topk(docs, q, k=5).count() == 0


def test_bm25_plan_shape(spark, docs):
    """The corpus-side probe must be a broadcast hash join (postings
    stream past the broadcast query-term table) and the plan must contain
    no cartesian/broadcast-nested-loop over the corpus."""
    from auto_data_linkage_spark.plans.explain import physical_plan

    q = spark.createDataFrame([(1, "big")], ["query_id", "term"])
    plan = physical_plan(R.bm25_topk(docs, q, k=5))
    import re

    def nodes(kind):
        # formatted plans mention each node twice (tree + detail); count
        # the numbered detail headers only
        return len(re.findall(rf"\(\d+\) {kind}\b", plan))

    assert nodes("BroadcastHashJoin") >= 2  # probe + vocab semi-join
    assert nodes("SortMergeJoin") == 0
    assert nodes("CartesianProduct") == 0
    # the only nested-loop allowed is the 1-row stats attach on the
    # broadcast (query-vocabulary) side
    assert nodes("BroadcastNestedLoopJoin") <= 1


def test_rrf_fuse_hand_computed(spark):
    from auto_data_linkage_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
        "query_id long, doc_id long, rank int",
    )
    den = spark.createDataFrame(
        [(1, 20, 1), (1, 40, 2), (1, 10, 3)],
        "query_id long, doc_id long, rank int",
    )
    out = {r.doc_id: (r.rrf, r.rank) for r in rrf_fuse(lex, den, k=4).collect()}
    # doc 20: 1/62 + 1/61 ; doc 10: 1/61 + 1/63 ; doc 30: 1/63 ; doc 40: 1/62
    assert out[20][1] == 1 and out[10][1] == 2
    assert out[30][1] == 4 and out[40][1] == 3
    assert out[20][0] == round(1 / 62 + 1 / 61, 6)
    assert out[10][0] == round(1 / 61 + 1 / 63, 6)


def test_rrf_fuse_requires_two_lists(spark):
    import pytest as _pytest

    from auto_data_linkage_spark.operators.retrieval import rrf_fuse

    lst = spark.createDataFrame(
        [(1, 10, 1)], "query_id long, doc_id long, rank int"
    )
    with _pytest.raises(ValueError):
        rrf_fuse(lst)


def test_hybrid_topk_contains_both_modalities(spark, sf_dir):
    """A doc ranked top-1 by BOTH systems must win fusion; the fused
    list is deterministic across runs."""
    from auto_data_linkage_spark.operators import retrieval as R
    from auto_data_linkage_spark.operators import similarity as S

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = R.query_terms_from_docs(
        docs.where(F.col("doc_id") % 100 == 0), n_terms=8
    )
    qv = emb.where(F.col("vec_id") % 100 == 0)
    out = R.hybrid_topk(docs, emb, probes, qv, k=5, fetch_k=20)
    rows = out.collect()
    assert set(out.columns) == {"query_id", "doc_id", "rrf", "rank"}
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    lex = R.bm25_topk(docs, probes, k=20, exclude_self=True)
    dense = S.brute_force_topk(emb, qv, k=20)
    lex1 = {(r.query_id, r.doc_id) for r in lex.collect() if r.rank == 1}
    den1 = {
        (r.query_id, r.neighbor_id) for r in dense.collect() if r.rank == 1
    }
    for q, d in lex1 & den1:
        top = [r.doc_id for r in by_q[q] if r.rank == 1]
        assert top == [d]
    again = sorted(
        (r.query_id, r.doc_id, r.rrf, r.rank)
        for r in R.hybrid_topk(docs, emb, probes, qv, k=5, fetch_k=20).collect()
    )
    assert again == sorted((r.query_id, r.doc_id, r.rrf, r.rank) for r in rows)


def test_rrf_fuse_accepts_ann_index_lists(spark, sf_dir, tmp_path):
    """The SCALE.md claim made real: a persisted-index ANN list fuses
    through rrf_fuse unchanged (same (query_id, id, rank) contract as
    the brute-force path)."""
    from auto_data_linkage_spark.operators import retrieval as R
    from auto_data_linkage_spark.operators.annindex import (
        ann_index_topk,
        build_ann_index,
        load_ann_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "idx")
    build_ann_index(emb, path, m=8, n_codewords=8)
    idx = load_ann_index(spark, path)
    qv = emb.where(F.col("vec_id") % 100 == 0)
    ann = ann_index_topk(idx, qv, k=12, nprobe=2)
    probes = R.query_terms_from_docs(
        docs.where(F.col("doc_id") % 100 == 0), n_terms=8
    )
    lex = R.bm25_topk(docs, probes, k=12, exclude_self=True)
    fused = R.rrf_fuse(
        lex, ann.withColumnRenamed("neighbor_id", "doc_id"), k=5
    )
    rows = fused.collect()
    assert rows and set(fused.columns) == {"query_id", "doc_id", "rrf", "rank"}
    assert all(1 <= r.rank <= 5 for r in rows)


def test_hard_negatives_drops_positives_and_renumbers(spark):
    from auto_data_linkage_spark.operators.retrieval import hard_negatives

    ranked = spark.createDataFrame(
        [(1, d, float(100 - d), d) for d in range(1, 9)],
        "query_id long, doc_id long, bm25 double, rank int",
    )
    pos = spark.createDataFrame(
        [(1, 2), (1, 5)], "query_id long, doc_id long"
    )
    out = sorted(
        (r.doc_id, r.neg_rank)
        for r in hard_negatives(ranked, pos, k=4).collect()
    )
    # docs 2 and 5 removed; survivors by score: 1,3,4,6 -> ranks 1..4
    assert out == [(1, 1), (3, 2), (4, 3), (6, 4)]


def test_hard_negatives_modality_agnostic(spark, sf_dir):
    """A dense cosine list mines through the same operator (score_col
    override), and queries whose positives crowd the list just return
    fewer negatives — never a positive."""
    from auto_data_linkage_spark.operators import similarity as S
    from auto_data_linkage_spark.operators.retrieval import hard_negatives

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.where(F.col("vec_id") % 100 == 0)
    dense = S.brute_force_topk(emb, qv, k=10).withColumnRenamed(
        "neighbor_id", "doc_id"
    )
    pos = dense.where(F.col("rank") <= 8).select("query_id", "doc_id")
    out = hard_negatives(dense, pos, k=5, score_col="cosine").collect()
    pset = {(r.query_id, r.doc_id) for r in pos.collect()}
    assert out
    assert all((r.query_id, r.doc_id) not in pset for r in out)
    per_q = {}
    for r in out:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert all(n == 2 for n in per_q.values())  # 10 deep - 8 positives


# ------------------------------------------------------ retrieval metrics
def test_retrieval_metrics_hand_computed(spark):
    from auto_data_linkage_spark.operators.retrieval import retrieval_metrics

    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2), (3, 30, 1)],
        "query_id long, neighbor_id long, rank int",
    )
    results = spark.createDataFrame(
        [
            (1, 10, 1), (1, 99, 2),   # one of two relevant; best rank 1
            (2, 98, 1), (2, 20, 2),   # one of two relevant; best rank 2
            (3, 97, 1), (3, 96, 2),   # zero relevant
        ],
        "query_id long, neighbor_id long, rank int",
    )
    got = {r["query_id"]: r for r in retrieval_metrics(results, truth).collect()}
    assert got[1]["recall"] == 0.5 and got[1]["rr"] == 1.0
    assert got[2]["recall"] == 0.5 and got[2]["rr"] == 0.5
    assert got[3]["recall"] == 0.0 and got[3]["rr"] == 0.0 and got[3]["n_hit"] == 0
    # depth recap at k=1: query 2's hit sat at result-rank 2 -> gone;
    # query 1's rank-1 result IS truth's rank-1 item -> kept
    at1 = {r["query_id"]: r for r in retrieval_metrics(results, truth, k=1).collect()}
    assert at1[2]["n_hit"] == 0 and at1[1]["n_hit"] == 1
    assert at1[1]["n_relevant"] == 1 and at1[1]["recall"] == 1.0


def test_retrieval_metrics_perfect_results(spark, sf_dir):
    """An exact result set scores recall 1.0 / rr 1.0 on every query."""
    from pyspark.sql import functions as F

    from auto_data_linkage_spark.operators.retrieval import retrieval_metrics
    from auto_data_linkage_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, queries, k=5)
    m = retrieval_metrics(exact, exact).collect()
    assert m and all(r["recall"] == 1.0 and r["rr"] == 1.0 for r in m)


class TestTfidfKeywords:
    def test_characteristic_terms_rank_first(self, spark):
        from auto_data_linkage_spark.operators.retrieval import (
            tfidf_keywords,
        )

        docs = spark.createDataFrame(
            [
                (1, "common common zebra zebra zebra"),
                (2, "common common quartz"),
                (3, "common plasma plasma"),
            ],
            "doc_id long, text string",
        )
        out = tfidf_keywords(docs, k=2)
        rows = {(r.doc_id, r.rank): r for r in out.collect()}
        # the doc-unique term beats the corpus-universal one everywhere
        assert rows[(1, 1)].term == "zebra"
        assert rows[(2, 1)].term == "quartz"
        assert rows[(3, 1)].term == "plasma"
        # a term in EVERY doc has smoothed idf ln((N+1)/(N+1)) = 0
        assert rows[(1, 2)].term == "common" and rows[(1, 2)].tfidf == 0.0
        # df values are document frequencies, not term counts
        assert rows[(1, 1)].df == 1 and rows[(1, 2)].df == 3

    def test_topk_plan_is_window_group_limited(self, spark):
        from auto_data_linkage_spark.operators.retrieval import (
            tfidf_keywords,
        )

        docs = spark.createDataFrame(
            [(i, f"alpha beta doc{i}") for i in range(8)],
            "doc_id long, text string",
        )
        plan = (
            tfidf_keywords(docs, k=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan, plan[:2000]
