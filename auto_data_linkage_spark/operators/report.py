"""Dataset-card report: the one-row corpus summary a training-data
release ships with (counts, token mass, language balance, duplication,
length distribution) — composed entirely from certified primitives.

The reference's closest surface is the profiler the AutoLinker runs
before rule search (column entropies / distinct counts,
autolinker.py:560–605 feeding blocking-rule generation); this extends
that idea corpus-wide for the LLM-pipeline. Every statistic here is
EXACT and SQL-expressible (the catalog row hash-matches DuckDB on all
columns — no tolerance flags), computed in ONE job over two scans:

- a single hash-aggregate pass for counts / token mass / distinct
  fingerprints (map-side partials; the text column itself never
  shuffles — only its md5 travels);
- one small per-lang aggregate for entropy (|langs| rows) joined back
  as a broadcast;
- an exact ``percentile`` for the length quantiles (Spark sorts only
  the int token counts, never documents).

At 100 TB swap the exact percentile for sketch.kll_* and the distinct
fingerprint count for sketch.hll_* (both certified separately) — the
report's schema is the contract, the estimators are a cost knob.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.text import tokens

__all__ = ["corpus_report"]


def corpus_report(
    df: DataFrame,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """One-row dataset card: ``(n_docs, total_words, n_langs,
    lang_entropy, exact_dup_rate, p50_words, p95_words)``. Exact by
    construction; rounding to 6 decimals makes the doubles
    engine-portable."""
    base = df.select(
        F.md5(F.col(text_col)).alias("__fp"),
        F.size(tokens(F.col(text_col))).alias("__nw"),
        F.col(lang_col).alias("__lang"),
    )
    main = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("__nw").alias("total_words"),
        F.count_distinct("__lang").alias("n_langs"),
        F.count_distinct("__fp").alias("__n_distinct"),
        F.round(
            F.expr("percentile(__nw, array(0.5, 0.95))")[0], 6
        ).alias("p50_words"),
        F.round(
            F.expr("percentile(__nw, array(0.5, 0.95))")[1], 6
        ).alias("p95_words"),
    )
    # entropy over the lang distribution: p_i = cnt_i / n
    counts = base.groupBy("__lang").agg(F.count("*").alias("cnt"))
    ent = (
        counts.crossJoin(F.broadcast(counts.agg(F.sum("cnt").alias("tot"))))
        .select(
            (
                -(F.col("cnt") / F.col("tot"))
                * F.log(math.e, F.col("cnt") / F.col("tot"))
            ).alias("term")
        )
        .agg(F.round(F.sum("term"), 6).alias("lang_entropy"))
    )
    return main.crossJoin(ent).select(
        "n_docs",
        "total_words",
        "n_langs",
        "lang_entropy",
        F.round(1 - F.col("__n_distinct") / F.col("n_docs"), 6).alias(
            "exact_dup_rate"
        ),
        "p50_words",
        "p95_words",
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Version-over-version corpus audit: per-id status ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` between two corpus
    snapshots, by the whitespace-normalized content fingerprint
    (:func:`text.doc_fingerprint` — cosmetic whitespace shifts are not
    "changes"). The companion to the versioned upsert: diff version
    V-1 against V to see exactly what a delta did.

    Plan: each side reduces to ``(id, fingerprint)`` in its scan
    projection — the wide text column never shuffles — then ONE full
    outer equi-join on the id. Returns ``(id, status, fingerprint_old,
    fingerprint_new)``."""
    from pyspark.sql import functions as F

    from auto_data_linkage_spark.operators.text import doc_fingerprint

    o = old.select(
        F.col(id_col), doc_fingerprint(text_col).alias("fingerprint_old")
    )
    n = new.select(
        F.col(id_col), doc_fingerprint(text_col).alias("fingerprint_new")
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("fingerprint_old").isNull(), F.lit("added"))
        .when(F.col("fingerprint_new").isNull(), F.lit("removed"))
        .when(
            F.col("fingerprint_old") == F.col("fingerprint_new"),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col(id_col),
        status.alias("status"),
        "fingerprint_old",
        "fingerprint_new",
    )
