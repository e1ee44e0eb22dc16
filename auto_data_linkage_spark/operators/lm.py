"""Corpus-level language-model quality scoring.

A standard pre-training curation signal (CCNet / Gopher / RefinedWeb
style) is "how surprising is this document under a cheap LM trained on
the corpus itself" — documents with very low average log-probability are
boilerplate-free gibberish, very high ones are degenerate repetition.
The cheapest useful LM is a unigram model, and it is fully expressible
as two DataFrame aggregations:

1. vocabulary pass: ``explode(tokens) -> groupBy(token).count()`` — the
   result is bounded by vocabulary size (Heaps' law: ~millions of rows
   even at 100 TB corpus scale), NOT corpus size, so it broadcasts;
2. scoring pass: map-side broadcast join of each token against the
   vocabulary, then one per-document aggregate.

Per-document score: ``avg(-log2 p(token)) = log2(total) -
avg(log2(count))`` — the algebraic split keeps the global token total
out of the per-row expression (it joins in once, as a broadcast scalar),
so the whole plan is scan → explode → two hash aggregates → one
broadcast join, no shuffle of the document text at any point.

At 100 TB: the explode ships only (id, token) pairs; the vocabulary
aggregate is partial (map-side combine) so the exchange carries one row
per distinct token per task. If the vocabulary outgrows the broadcast
threshold (web-scale multilingual corpora), pass
``broadcast_vocab=False`` to fall back to a sort-merge join on token —
same result, one extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.text import tokens


def unigram_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, cnt) vocabulary table — one explode + one hash aggregate
    with map-side partials."""
    ex = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    return ex.groupBy("token").agg(F.count("*").alias("cnt"))


def unigram_logprob(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document ``(id, n_tokens, avg_neg_logp)`` where
    ``avg_neg_logp = mean over tokens of -log2 p(token)`` under the
    corpus unigram distribution (duplicate tokens in a document count
    each occurrence, as an LM would)."""
    ex = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    vocab = ex.groupBy("token").agg(F.count("*").alias("cnt"))
    vocab_join = F.broadcast(vocab) if broadcast_vocab else vocab
    # one scalar row (the corpus token total) — crossJoin of a broadcast
    # single row is a map-side constant attach, not a shuffle
    total = vocab.agg(F.sum("cnt").alias("__total"))
    per_doc = (
        ex.join(vocab_join, "token")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(F.log2("cnt")).alias("__avg_log_cnt"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(
            F.log2("__total") - F.col("__avg_log_cnt"), 6
        ).alias("avg_neg_logp"),
    )


def bigram_logprob(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document bigram conditional log-probability score:
    ``avg over positions i>=2 of -log2 p(t_i | t_{i-1})`` with
    ``p(cur|prev) = count(prev,cur) / count(prev,·)`` estimated from the
    corpus itself (unsmoothed MLE — every scored bigram is observed at
    least once by construction, so no zero mass on the diagonal use).

    Returns ``(id, n_bigrams, avg_neg_logp2)`` for documents with >= 2
    tokens (shorter documents have no bigram evidence and are omitted —
    pair with :func:`unigram_logprob` for full coverage).

    Plan shape mirrors :func:`unigram_logprob` one order up: bigrams are
    built by zipping the token array with its own shift (``slice`` +
    ``zip_with`` — codegen, no self-join), exploded once; the bigram and
    prefix count tables are Heaps'-law bounded and broadcast back; the
    per-position surprise ``log2 c(prev,·) - log2 c(prev,cur)`` averages
    in one hash aggregate. The per-row difference (NOT the difference of
    averages) keeps float summation order identical to the SQL oracle.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    bg = docs.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        F.col(id_col), F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur")
    )
    c2 = bg.groupBy("prev", "cur").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("prev").agg(F.count("*").alias("c1"))
    if broadcast_vocab:
        c2, c1 = F.broadcast(c2), F.broadcast(c1)
    scored = (
        bg.join(c2, ["prev", "cur"])
        .join(c1, "prev")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(F.log2("c1") - F.log2("c2")), 6
            ).alias("avg_neg_logp2"),
        )
    )
    return scored


def perplexity_buckets(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    head_pct: int = 33,
    tail_pct: int = 33,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, public
    recipe): score every document with the corpus LM
    (:func:`unigram_logprob`) and split the corpus into ``head`` (the
    lowest-perplexity ``head_pct`` percent, the cleanest text), ``tail``
    (the highest ``tail_pct``), and ``middle`` — the standard
    stratification for mixing or for dropping the tail. CCNet buckets
    per language: pass ``group_col="lang"``; ``None`` buckets globally.

    Bucket membership is RANK-based, not value-threshold-based:
    ``head = the floor(n·head_pct/100) lowest-scored documents`` under
    the total order ``(avg_neg_logp asc, id asc)``, with all arithmetic
    in integers — so the split is bit-exact across engines and re-runs
    (a value cut point from an interpolated percentile can flip a
    boundary document on a last-ulp difference; a rank cannot).

    Returns ``(id[, group], n_tokens, avg_neg_logp, bucket)``.

    Plan: scoring is unigram_logprob's pass (explode + hash-agg +
    broadcast vocab join); ranking is one window over the SCORED rows
    (doc-count-sized, not token-sized).
    """
    from pyspark.sql import Window

    scored = unigram_logprob(
        docs, text_col=text_col, id_col=id_col,
        broadcast_vocab=broadcast_vocab,
    )
    if group_col:
        scored = scored.join(
            docs.select(F.col(id_col), F.col(group_col)).distinct(), id_col
        )
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(
        F.asc("avg_neg_logp"), F.asc(id_col)
    )
    wn = Window.partitionBy(*part)
    rn = F.row_number().over(w)
    n = F.count("*").over(wn)
    # floor(n*pct/100) in pure integer arithmetic (no double division)
    head_n = ((n * head_pct) - F.pmod(n * head_pct, F.lit(100))) / 100
    head_n = head_n.cast("bigint")
    tail_n = ((n * tail_pct) - F.pmod(n * tail_pct, F.lit(100))) / 100
    tail_n = tail_n.cast("bigint")
    bucket = (
        F.when(rn <= head_n, "head")
        .when(rn > n - tail_n, "tail")
        .otherwise("middle")
    )
    cols = [F.col(id_col)]
    if group_col:
        cols.append(F.col(group_col))
    return scored.select(
        *cols, "n_tokens", "avg_neg_logp", bucket.alias("bucket")
    )
