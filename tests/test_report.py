"""Dataset-card corpus report."""

from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.report import corpus_report


def test_corpus_report_hand_values(spark):
    rows = [
        (1, "a b c", "en"),
        (2, "a b c", "en"),  # exact dup of 1
        (3, "one two three four", "fr"),
        (4, "x", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = corpus_report(df).collect()[0]
    assert r.n_docs == 4
    assert r.total_words == 3 + 3 + 4 + 1
    assert r.n_langs == 2
    assert r.exact_dup_rate == 0.25  # 3 distinct of 4
    import math

    want = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert abs(r.lang_entropy - want) < 1e-6
    # sorted word counts [1,3,3,4]: p50 = 3.0 exact interpolation
    assert r.p50_words == 3.0


def test_corpus_report_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = corpus_report(docs).collect()[0]
    assert r.n_docs == docs.count()
    assert 0 <= r.exact_dup_rate < 1
    assert r.p50_words <= r.p95_words


def test_corpus_diff_statuses(spark):
    from auto_data_linkage_spark.operators.report import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "gamma text")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha   text"),   # whitespace-only change -> unchanged
            (2, "beta text revised"),
            (4, "delta text"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_text_never_shuffles(spark, sf_dir):
    """Scale contract: the join exchanges carry (id, 32-char md5) only."""
    import re

    from auto_data_linkage_spark.operators.report import corpus_diff

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = corpus_diff(docs, docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)
