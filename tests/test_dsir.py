"""DSIR importance resampling (operators/dsir.py): value parity against
an independent pure-Python reference, selection behavior on a two-style
corpus, determinism, and the broadcast/zero-corpus-shuffle plan shape."""

import math
import re

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.dsir import (
    bucket_counts,
    dsir_logweights,
    dsir_resample,
    hashed_feature_buckets,
)


# ---------------------------------------------------------------- reference
def _py_tokens(text):
    return [t for t in re.split(r"\s+", text.lower()) if t != ""]


def _py_hash64(value, seed=0):
    import hashlib

    h = hashlib.md5(f"{seed}|{value}".encode()).hexdigest()
    return int(h[:15], 16)


def _py_features(text, n_buckets, seed=0):
    toks = _py_tokens(text)
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_py_hash64(f, seed) % n_buckets for f in feats]


def _py_logweights(raw_rows, target_rows, n_buckets, alpha=1.0):
    """Independent reference: (id -> (n_feats, log_w)) per the DSIR
    smoothed bucket-unigram likelihood ratio."""
    from collections import Counter

    ct, cr = Counter(), Counter()
    for _, text in target_rows:
        ct.update(_py_features(text, n_buckets))
    for _, text in raw_rows:
        cr.update(_py_features(text, n_buckets))
    tt, tr = sum(ct.values()), sum(cr.values())
    ab = alpha * n_buckets
    out = {}
    for doc_id, text in raw_rows:
        feats = _py_features(text, n_buckets)
        if not feats:
            continue
        s = sum(
            math.log(ct[b] + alpha) - math.log(cr[b] + alpha) for b in feats
        )
        out[doc_id] = (
            len(feats),
            round(s + len(feats) * (math.log(tr + ab) - math.log(tt + ab)), 6),
        )
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(30):
        rows.append((i, f"the quick brown fox number {i} jumps over the lazy dog"))
    for i in range(30, 60):
        rows.append((i, f"def compile {i} argv return printf hello world code"))
    rows.append((60, ""))  # zero tokens: no features, omitted
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + i, "def parse return value printf compile argv code loop")
         for i in range(8)],
        "doc_id long, text string",
    )
    return raw, target, rows


def test_logweights_match_python_reference(corpus):
    raw, target, rows = corpus
    got = {
        r.doc_id: (r.n_feats, r.log_w)
        for r in dsir_logweights(raw, target, n_buckets=256).collect()
    }
    want = _py_logweights(
        [(r[0], r[1]) for r in rows],
        [(1000 + i, "def parse return value printf compile argv code loop")
         for i in range(8)],
        256,
    )
    assert set(got) == set(want)  # empty doc omitted on both sides
    for doc_id in want:
        assert got[doc_id][0] == want[doc_id][0], doc_id
        assert got[doc_id][1] == pytest.approx(want[doc_id][1], abs=2e-6), doc_id


def test_resample_prefers_target_style_and_is_deterministic(corpus):
    raw, target, _ = corpus
    sel = dsir_resample(raw, target, 12, n_buckets=256).collect()
    assert len(sel) == 12
    assert [r.sel_rank for r in sorted(sel, key=lambda r: r.sel_rank)] == list(
        range(1, 13)
    )
    code_like = sum(1 for r in sel if 30 <= r.doc_id < 60)
    assert code_like >= 9  # importance mass concentrates on target style
    again = dsir_resample(raw, target, 12, n_buckets=256).collect()
    assert sorted(map(tuple, sel)) == sorted(map(tuple, again))
    shifted = dsir_resample(raw, target, 12, n_buckets=256, seed=5).collect()
    assert sorted(map(tuple, sel)) != sorted(map(tuple, shifted))


def test_bucket_counts_bounded_by_bucket_space(corpus):
    raw, _, _ = corpus
    bc = bucket_counts(raw, n_buckets=32)
    assert bc.count() <= 32
    total = bc.agg(F.sum("cnt")).collect()[0][0]
    n_feats = raw.select(
        F.size(hashed_feature_buckets(F.col("text"), n_buckets=32)).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total == n_feats


def test_plan_broadcasts_stats_and_scans_raw_without_corpus_shuffle(
    spark, sf_dir, corpus
):
    """The two distribution joins and the totals attach must be
    broadcasts; the only exchange on the raw side is the per-doc
    aggregate (hash partitioning on the id), never a join shuffle."""
    from auto_data_linkage_spark.plans.explain import physical_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.where(F.col("doc_id") % 97 == 0)
    raw = docs.where(F.col("doc_id") % 97 != 0)
    plan = physical_plan(dsir_logweights(raw, target, n_buckets=512))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # no corpus-sized cartesian: the only nested loops are one-row
    # broadcast scalar attaches (the totals); the formatted plan names
    # each node twice (tree line + detail header), so count tree lines
    assert plan.count("BroadcastNestedLoopJoin Cross BuildRight") <= 2
