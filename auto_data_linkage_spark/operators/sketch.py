"""Mergeable sketches: count-min frequency estimation as plain
aggregation, plus HyperLogLog distinct-count sketches (end of module).

The classic streaming sketch (Cormode & Muthukrishnan 2005) expressed as
DataFrame composition — no UDF, no custom state:

- **build**: each value increments ``depth`` cells, one per seeded hash
  row; the whole sketch is a ``groupBy(row, bucket).sum()`` — map-side
  partial aggregation compresses each partition to ≤ depth×width cells
  BEFORE the shuffle, so the exchange volume is bounded by the sketch
  size (constant), not the data size. That bound is exactly why the
  sketch works at 100 TB: frequency estimation over any number of rows
  shuffles at most ``depth × width`` cells per partition.
- **merge**: sketches are counters — union + re-aggregate.
- **query**: join items to their depth cells, take the min across rows
  (upper-biased estimate; error ≤ εN with ε = e/width at probability
  1−(1/e)^depth).

Hashing uses the repo's portable 60-bit md5 hash (text.md5_hash64), so
sketches and estimates replay bit-identically on the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.text import md5_hash64

__all__ = [
    "cm_bucket",
    "count_min_build",
    "count_min_merge",
    "count_min_query",
    "hll_build",
    "hll_merge",
    "hll_estimate",
    "kll_build",
    "kll_merge",
    "kll_quantiles",
    "theta_build",
    "theta_union",
    "theta_intersect",
    "theta_estimate",
    "corpus_overlap",
    "bloom_positions",
    "bloom_build",
    "bloom_contains",
]


def cm_bucket(col: Column, row: int, width: int) -> Column:
    """The sketch cell (non-negative) for ``col`` in hash row ``row``."""
    return F.pmod(md5_hash64(col, seed=row), F.lit(width))


def count_min_build(
    df: DataFrame,
    col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (hash_row, bucket, cnt), ≤ depth×width rows.

    ``weight_col`` counts each row by a weight instead of 1 (e.g. a
    pre-aggregated (value, count) input).
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("hash_row"),
                    cm_bucket(F.col(col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.select(rows, w.alias("__w"))
        .select("cell.hash_row", "cell.bucket", "__w")
        .groupBy("hash_row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (width, depth): counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("hash_row", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_query(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``items[col]``: min over the item's
    ``depth`` cells (missing cells count 0). The sketch side is at most
    depth×width rows — broadcast it; items stream past."""
    cells = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("hash_row"),
                        cm_bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(col, "cell.hash_row", "cell.bucket")
    joined = cells.join(
        F.broadcast(sketch), ["hash_row", "bucket"], "left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return joined.groupBy(col).agg(F.min("cnt").alias("est"))


# --------------------------------------------------------------------------
# HyperLogLog distinct-count sketches (Apache DataSketches via Spark's
# hll_sketch_agg family). Unlike approx_count_distinct — whose sketch
# never leaves the aggregation — these return the sketch BYTES, so
# per-batch sketches can be persisted with corpus stats and merged later
# without rescanning: distinct-token / distinct-url / distinct-ngram
# tracking across incremental ingests at 100 TB costs one scan per NEW
# batch plus a union of kilobyte-sized sketches (lgk=12 → 4 KiB each,
# relative error ≈ 1.04/√2^lgk ≈ 1.6%).


def hll_build(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    *,
    lgk: int = 12,
) -> DataFrame:
    """Per-group (or global) mergeable HLL sketch of distinct ``col``
    values, as a binary ``hll`` column. Plain hash aggregation: map-side
    partial sketches merge before the shuffle, so exchange volume is
    ≤ one sketch per (group, partition) regardless of row count."""
    agg = F.hll_sketch_agg(F.col(col), lgk).alias("hll")
    return df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)


def hll_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    *,
    sketch_col: str = "hll",
) -> DataFrame:
    """Union sketches (e.g. per-ingest-batch rows) into one per group —
    the lossless HLL merge: the union estimates exactly what a single
    sketch over the concatenated inputs would."""
    agg = F.hll_union_agg(F.col(sketch_col)).alias("hll")
    return (
        sketches.groupBy(*group_cols).agg(agg) if group_cols else sketches.agg(agg)
    )


def hll_estimate(df: DataFrame, *, sketch_col: str = "hll") -> DataFrame:
    """Append ``distinct_est`` (bigint) decoded from the sketch."""
    return df.withColumn(
        "distinct_est",
        F.hll_sketch_estimate(F.col(sketch_col)).cast("bigint"),
    )

# --------------------------------------------------------------------------
# KLL quantile sketches (Karnin–Lang–Liberty 2016, via Spark's
# kll_sketch_agg family). The quantile leg of the mergeable-sketch
# family (count-min = frequency, HLL = distinct, theta = set algebra):
# per-ingest-batch sketches of token counts / quality scores / doc
# lengths persist with corpus stats and merge losslessly, so "what is
# the p99 document length across all batches so far" never rescans old
# batches. k=200 (the library default, ~1 KiB) gives normalized rank
# error ~1.65%; the value returned for quantile q is an EXACT input
# value whose rank is within ±eps·n of q·n.

_KLL_TYPES = {"bigint", "double", "float"}


def _kll_fn(name: str, dtype: str):
    if dtype not in _KLL_TYPES:
        raise ValueError(f"kll dtype must be one of {_KLL_TYPES}, got {dtype!r}")
    return getattr(F, f"{name}_{dtype}")


def kll_build(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    *,
    dtype: str = "double",
    k: int = 200,
) -> DataFrame:
    """Per-group (or global) mergeable KLL quantile sketch of ``col``
    as a binary ``kll`` column. ``dtype`` picks the typed DataSketches
    variant (``bigint``/``double``/``float``); the input column is cast
    to it. Same exchange shape as :func:`hll_build`: map-side partial
    sketches, ≤ one ~1 KiB sketch per (group, partition) shuffled."""
    agg = _kll_fn("kll_sketch_agg", dtype)(
        F.col(col).cast("long" if dtype == "bigint" else dtype), F.lit(k)
    ).alias("kll")
    return df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)


def kll_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    *,
    sketch_col: str = "kll",
    dtype: str = "double",
    k: int = 200,
) -> DataFrame:
    """Merge per-batch KLL sketches into one per group. The merged
    sketch carries the same rank-error guarantee as a single sketch
    built over the concatenated inputs."""
    agg = _kll_fn("kll_merge_agg", dtype)(F.col(sketch_col), F.lit(k)).alias(
        "kll"
    )
    return (
        sketches.groupBy(*group_cols).agg(agg) if group_cols else sketches.agg(agg)
    )


def kll_quantiles(
    df: DataFrame,
    qs: list[float],
    *,
    sketch_col: str = "kll",
    dtype: str = "double",
    prefix: str = "q",
) -> DataFrame:
    """Append one column per requested quantile (``q50`` for 0.5, …)
    decoded from the sketch, plus ``kll_n`` (the sketched row count —
    exact, KLL tracks n losslessly)."""
    qfn = _kll_fn("kll_sketch_get_quantile", dtype)
    nfn = _kll_fn("kll_sketch_get_n", dtype)
    out = df
    for q in qs:
        name = f"{prefix}{int(round(q * 100))}"
        out = out.withColumn(name, qfn(F.col(sketch_col), F.lit(float(q))))
    return out.withColumn("kll_n", nfn(F.col(sketch_col)))


# --------------------------------------------------------------------------
# Theta sketches (distinct-value SET ALGEBRA — the operation HLL cannot
# do): union AND intersection AND difference of distinct sets, each
# estimable. The 100 TB use: "how many distinct urls / fingerprints do
# corpus A and corpus B share" without ever joining A against B — build
# one ~32 KiB sketch per corpus (one scan each, map-side partials),
# intersect driver-free. Also the incremental-ingest novelty metric:
# |new batch \ everything so far| = theta_difference(batch, union-so-far).


def theta_build(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    *,
    lgk: int = 12,
) -> DataFrame:
    """Per-group (or global) theta sketch of distinct ``col`` values as
    a binary ``theta`` column (lgk=12 → ≤4096 retained hashes, relative
    error ≈ 1.6% after set operations)."""
    agg = F.theta_sketch_agg(F.col(col), lgk).alias("theta")
    return df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)


def theta_union(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    *,
    sketch_col: str = "theta",
    lgk: int = 12,
) -> DataFrame:
    """Union sketches into one per group (the HLL-merge analog)."""
    agg = F.theta_union_agg(F.col(sketch_col), lgk).alias("theta")
    return (
        sketches.groupBy(*group_cols).agg(agg) if group_cols else sketches.agg(agg)
    )


def theta_intersect(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    *,
    sketch_col: str = "theta",
) -> DataFrame:
    """Intersect sketches within each group: the estimate of the result
    is |∩ of the distinct sets| — overlap WITHOUT a join."""
    agg = F.theta_intersection_agg(F.col(sketch_col)).alias("theta")
    return (
        sketches.groupBy(*group_cols).agg(agg) if group_cols else sketches.agg(agg)
    )


def theta_estimate(df: DataFrame, *, sketch_col: str = "theta") -> DataFrame:
    """Append ``distinct_est`` (bigint) decoded from the sketch."""
    return df.withColumn(
        "distinct_est",
        F.theta_sketch_estimate(F.col(sketch_col)).cast("bigint"),
    )


def corpus_overlap(
    a: DataFrame,
    b: DataFrame,
    col: str,
    *,
    lgk: int = 14,
) -> DataFrame:
    """One-row overlap report between two corpora on distinct ``col``
    values: ``(a_distinct, b_distinct, overlap_est, union_est,
    jaccard_est)`` — two single scans + kilobyte-sized driver-free
    sketch algebra, no join between a and b ever happens."""
    sa = theta_build(a, col, lgk=lgk).select(F.col("theta").alias("ta"))
    sb = theta_build(b, col, lgk=lgk).select(F.col("theta").alias("tb"))
    both = sa.crossJoin(sb)  # 1 row × 1 row
    return both.select(
        F.theta_sketch_estimate(F.col("ta")).cast("bigint").alias("a_distinct"),
        F.theta_sketch_estimate(F.col("tb")).cast("bigint").alias("b_distinct"),
        F.theta_sketch_estimate(F.theta_intersection("ta", "tb"))
        .cast("bigint")
        .alias("overlap_est"),
        F.theta_sketch_estimate(F.theta_union("ta", "tb"))
        .cast("bigint")
        .alias("union_est"),
        (
            F.theta_sketch_estimate(F.theta_intersection("ta", "tb"))
            / F.theta_sketch_estimate(F.theta_union("ta", "tb"))
        ).alias("jaccard_est"),
    )


# ------------------------------------------------------------- bloom
# Portable Bloom filter (Bloom 1970): k md5-derived bit positions per
# value over an m-bit filter stored as ceil(m/63) bigint words. 63
# usable bits per word — the sign bit stays clear, so the identical
# 1 << bit arithmetic runs on DuckDB (which overflow-checks bigint
# shifts) and under Spark ANSI mode. Deterministic by construction:
# membership tests replay bit-identically cross-engine, false positives
# included, which is what makes bloom-backed operators oracle-checkable.
BLOOM_SEED = 7000
BLOOM_WORD_BITS = 63


def bloom_positions(col: Column, *, m_bits: int, n_hashes: int) -> Column:
    """The value's ``n_hashes`` bit positions in ``[0, m_bits)``."""
    return F.array(
        *[
            F.pmod(md5_hash64(col, seed=BLOOM_SEED + i), F.lit(m_bits))
            for i in range(n_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    *,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> list[int]:
    """Build the filter over ``df[col]``'s values and return it as the
    dense word list (length ``ceil(m_bits / 63)``) — the whole sketch is
    ~``m_bits/8`` bytes (128 KB at the default 2²⁰), which is the point:
    it rides into any downstream projection as ONE array literal, so
    membership probes cost zero joins and zero shuffles regardless of
    how many values were inserted.

    Distributed build: explode positions → per-word ``bit_or`` of masks
    — map-side partial aggregation bounds the exchange at the sketch
    size per partition, the same scaling law as the count-min build.
    """
    n_words = -(-m_bits // BLOOM_WORD_BITS)
    rows = (
        df.select(
            F.explode(
                bloom_positions(F.col(col), m_bits=m_bits, n_hashes=n_hashes)
            ).alias("p")
        )
        .select(
            F.floor(F.col("p") / BLOOM_WORD_BITS).cast("bigint").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("bigint"),
                F.pmod(F.col("p"), F.lit(BLOOM_WORD_BITS)).cast("int"),
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[int(r["w"])] = int(r["bits"])
    return words


def bloom_contains(
    col: Column,
    words: list[int],
    *,
    m_bits: int,
    n_hashes: int,
) -> Column:
    """Boolean membership probe against a built filter — a pure codegen
    projection (array literal + element_at + shift), no join. False
    positives at the standard rate ≈ (1 − e^{−kn/m})^k; never false
    negatives."""
    lit = F.lit(words)

    def _ok(p: Column) -> Column:
        word = F.element_at(
            lit, F.floor(p / BLOOM_WORD_BITS).cast("int") + 1
        )
        bit = F.pmod(p, F.lit(BLOOM_WORD_BITS)).cast("int")
        return (
            F.call_function("shiftright", word, bit).bitwiseAND(F.lit(1)) == 1
        )

    return F.forall(
        bloom_positions(col, m_bits=m_bits, n_hashes=n_hashes), _ok
    )
