"""DSIR — data selection with importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The published recipe for steering a raw web crawl toward a target
distribution (Wikipedia, books, a domain corpus) WITHOUT training a
classifier: model both corpora as bags of hashed n-grams over a fixed
bucket space, score every raw document by its log importance weight

    log w(doc) = sum over feature occurrences f of
                     [ ln p_target(b(f)) - ln p_raw(b(f)) ]

under Laplace-smoothed bucket unigram models, then sample the kept set
with probability proportional to ``w`` (Gumbel-top-k, without
replacement). Features are the document's unigrams AND bigrams hashed
into ``n_buckets`` (the paper's 10k default).

Why this shape scales to 100 TB:

- the feature projection (tokens + zipped bigrams + hash) is entirely
  row-local codegen — the corpus is scanned once;
- the two distribution tables are bounded by ``n_buckets`` BY
  CONSTRUCTION (not Heaps' law — hashing fixes the cardinality), so
  they always broadcast, at any corpus size;
- the only corpus-sized exchange is the per-document aggregate of
  ``(id, bucket)`` ints, map-side combined to distinct buckets per doc
  per task — strictly smaller than :func:`~.lm.unigram_logprob`'s
  (id, token-string) exchange, which this plan otherwise mirrors;
- resampling is a global top-k (per-partition TakeOrdered, one merge of
  k·partitions candidates), never a sort of the corpus.

Cross-engine determinism: bucket assignment uses the portable
``md5_hash64`` and the Gumbel draw derives its uniform from the same
hash, so scores AND the selected set replay identically on DuckDB and
across runs (the catalog oracle recomputes both in SQL).

No reference analogue (green-field extension; the reference repo's
scope is record linkage — see SURVEY.md §2 scope note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.text import md5_hash64, tokens

__all__ = [
    "hashed_feature_buckets",
    "bucket_counts",
    "dsir_logweights",
    "dsir_resample",
]


def hashed_feature_buckets(
    text: Column | str, *, n_buckets: int = 10_000, seed: int = 0
) -> Column:
    """Array of hashed-n-gram feature buckets for one document: every
    unigram and every bigram of the whitespace token stream, hashed into
    ``[0, n_buckets)`` with the portable md5 hash. Occurrences repeat
    (bag semantics, as the DSIR counts require). Row-local — no shuffle,
    no explode."""
    toks = tokens(text)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    return F.transform(
        feats, lambda t: F.pmod(md5_hash64(t, seed), F.lit(n_buckets))
    )


def bucket_counts(
    docs: DataFrame,
    *,
    n_buckets: int = 10_000,
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """(bucket, cnt) hashed-feature histogram of a corpus — at most
    ``n_buckets`` rows regardless of corpus size, so the result always
    broadcasts. One explode + one map-side-combined hash aggregate."""
    ex = docs.select(
        F.explode(
            hashed_feature_buckets(
                F.col(text_col), n_buckets=n_buckets, seed=seed
            )
        ).alias("bucket")
    )
    return ex.groupBy("bucket").agg(F.count("*").alias("cnt"))


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    *,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Per-document DSIR log importance weight of every ``raw`` document
    against the ``target`` distribution: ``(id, n_feats, log_w)`` with

        log_w = sum_f [ ln(ct[b]+alpha) - ln(cr[b]+alpha) ]
                + n_feats * ( ln(Tr + alpha*B) - ln(Tt + alpha*B) )

    i.e. the smoothed bucket-unigram log-likelihood ratio, algebraically
    split so the corpus totals attach once as broadcast scalars instead
    of riding inside every per-feature term. Buckets unseen in a corpus
    contribute their smoothing mass only (left join + coalesce 0).

    Documents with zero tokens have no features and are omitted (they
    carry no evidence either way — union them back with ``log_w = -inf``
    semantics downstream if needed; :func:`dsir_resample` never selects
    them, which is the conservative choice).

    ``log_w`` is rounded to 6 decimals for cross-engine stability.
    """
    # The exploded raw-side features feed THREE consumers (the per-doc
    # aggregate, the raw histogram, and the raw total inside ``tot``);
    # left declarative, Catalyst re-runs the tokenize + bigram + md5
    # projection over the raw corpus once per consumer — measured as two
    # extra ~1 s full-width hashing passes at bench scale. Pinning the
    # (id, bucket) ints is far cheaper than one md5 pass. ``cr`` is then
    # a pure integer re-aggregation of the SAME rows, so every count —
    # and the partition layout the per-doc float sum reads — is
    # bit-identical to the unpinned plan.
    feats = raw.select(
        F.col(id_col),
        F.explode(
            hashed_feature_buckets(
                F.col(text_col), n_buckets=n_buckets, seed=seed
            )
        ).alias("bucket"),
    ).localCheckpoint(eager=False)
    ct = (
        bucket_counts(
            target, n_buckets=n_buckets, text_col=text_col, seed=seed
        )
        .withColumnRenamed("cnt", "ct")
        .localCheckpoint(eager=False)
    )
    cr = (
        feats.groupBy("bucket")
        .agg(F.count("*").alias("cr"))
        .localCheckpoint(eager=False)
    )
    # totals: one-row broadcast scalars (constant attach, not a shuffle)
    tot = ct.agg(F.sum("ct").alias("__tt")).crossJoin(
        cr.agg(F.sum("cr").alias("__tr"))
    )
    a = float(alpha)
    ab = a * float(n_buckets)
    per_doc = (
        feats.join(F.broadcast(ct), "bucket", "left")
        .join(F.broadcast(cr), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum(
                F.log(F.coalesce(F.col("ct"), F.lit(0)) + F.lit(a))
                - F.log(F.coalesce(F.col("cr"), F.lit(0)) + F.lit(a))
            ).alias("__s"),
        )
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        F.col(id_col),
        F.col("n_feats"),
        F.round(
            F.col("__s")
            + F.col("n_feats")
            * (F.log(F.col("__tr") + F.lit(ab)) - F.log(F.col("__tt") + F.lit(ab))),
            6,
        ).alias("log_w"),
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    *,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Select ``k`` raw documents by importance resampling WITHOUT
    replacement: Gumbel-top-k over the log weights — key
    ``log_w + Gumbel(hash(id))`` with the Gumbel draw
    ``-ln(-ln u)`` derived from the portable id hash, which is exactly
    sampling proportional-to-``w`` without replacement (the Gumbel-max
    equivalence to Efraimidis-Spirakis priority sampling).

    Deterministic: membership is a pure function of the corpus and the
    seed, so re-runs and engines agree. Returns
    ``(id, n_feats, log_w, sel_rank)``; keys are rounded to 6 decimals
    before ranking, ties break on id. The selection is a global top-k —
    per-partition partial TakeOrdered, one k-sized merge — never a full
    sort of the corpus.
    """
    lw = dsir_logweights(
        raw,
        target,
        n_buckets=n_buckets,
        alpha=alpha,
        text_col=text_col,
        id_col=id_col,
        seed=seed,
    )
    # uniform in (0, 1]: (hash+1) / 2^60 — md5_hash64 is 60-bit
    u = (
        md5_hash64(F.col(id_col).cast("string"), seed + 1) + 1
    ) / F.lit(float(1 << 60))
    key = F.round(F.col("log_w") - F.log(-F.log(u)), 6)
    # the rank window runs AFTER limit(k) — k rows, one task, not a
    # corpus-wide single-partition sort
    return (
        lw.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn(
            "sel_rank",
            F.row_number().over(
                Window.orderBy(F.col("__key").desc(), F.col(id_col).asc())
            ),
        )
        .drop("__key")
    )
