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
