"""Z-order (Morton) multi-column layout clustering.

Single-column ``sortWithinPartitions`` makes parquet min/max statistics
selective for ONE key; queries filtering on a second column still scan
everything. Interleaving the bits of several rank-scaled columns into one
Morton value and range-partitioning + sorting on it clusters the data so
per-file min/max envelopes stay tight on EVERY participating column —
the standard lakehouse answer (Delta/Iceberg ``OPTIMIZE ZORDER BY``) to
multi-dimensional scan pruning, here as a plain DataFrame operator any
parquet write can use.

Scale shape: one light min/max aggregate per column (broadcast — no
driver collect), one codegen'd bit-interleave projection, then a single
``repartitionByRange`` exchange on the z-value (range partitioning
samples the column; that is the same machinery any global sort pays).
Nothing is quadratic and no UDF is involved.

Determinism: scaling uses pure BIGINT arithmetic
(``(x - min) * (2^bits - 1) DIV (max - min)``), so the z-values are
bit-identical across engines — the catalog oracle replays the exact
computation in DuckDB. Linear min/max scaling assumes roughly uniform
key spread; for heavily skewed columns substitute a quantile-based
pre-bucketing before interleave (the interleave itself is agnostic to
how the per-column codes were produced).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interleave_bits", "zvalue", "quantile_codes", "zorder_layout"]


def interleave_bits(codes: list[Column], bits: int = 8) -> Column:
    """Morton-interleave ``bits`` low bits of each integer code column.

    Bit ``i`` of column ``j`` lands at output position ``i*len(codes)+j``
    — the classic round-robin interleave. Expression size is
    ``bits × len(codes)`` OR-terms; at the default 8 bits × 2-3 columns
    it stays comfortably inside whole-stage codegen (the measured
    codegen cliff in this repo is ~190 expression nodes).
    """
    n = len(codes)
    if bits * n > 63:
        raise ValueError(
            f"bits*columns = {bits * n} exceeds the 63 usable bits of a "
            "signed BIGINT z-value; lower bits or cluster fewer columns"
        )
    terms = [
        F.shiftleft(
            F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1)),
            i * n + j,
        )
        for i in range(bits)
        for j, c in enumerate(codes)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zvalue(df: DataFrame, cols: list[str], *, bits: int = 8) -> DataFrame:
    """Append a ``zval`` column: per-column min/max scaled to
    ``[0, 2^bits)`` with exact integer arithmetic, then bit-interleaved.

    The min/max aggregate is one row; it attaches via a broadcast
    cross-join so the values stay on the executors.
    """
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("bigint").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("bigint").alias(f"__max_{c}"))
    stats = df.agg(*aggs)
    top = (1 << bits) - 1
    out = df.crossJoin(F.broadcast(stats))
    codes = []
    for c in cols:
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        span = hi - lo
        num = (F.col(c).cast("bigint") - lo) * top
        # exact integer division cross-engine: subtract the remainder
        # first, so the one float divide is of an exact multiple (no
        # Column floordiv operator exists; this avoids string expr())
        codes.append(
            F.when(span > 0, ((num - num % span) / span).cast("bigint"))
            .otherwise(F.lit(0))
        )
    out = out.withColumn("zval", interleave_bits(codes, bits))
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])


def quantile_codes(
    df: DataFrame,
    col: str,
    *,
    bits: int = 8,
    relative_error: float = 0.001,
) -> Column:
    """Skew-robust per-column code for the interleave: rank by
    approximate quantile boundaries instead of min/max linear scaling.

    ``approxQuantile`` (Greenwald–Khanna) computes the ``2^bits − 1``
    boundaries in one pass with a bounded-size driver transfer (the
    sketch, not the data); the code expression is then a fold over the
    boundary-constant array — pure codegen, no join. A heavily skewed
    column (min/max scaling would collapse most rows into one code)
    gets ~equal-mass codes, which is what keeps z-value ranges
    informative. Use the result as a pre-coded input column and
    interleave with :func:`interleave_bits` directly.
    """
    top = (1 << bits) - 1
    bounds = df.stat.approxQuantile(
        col, [i / (top + 1) for i in range(1, top + 1)], relative_error
    )
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    x = F.col(col).cast("double")
    return F.aggregate(
        barr,
        F.lit(0).cast("bigint"),
        lambda acc, b: acc + F.when(x >= b, 1).otherwise(0),
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    num_partitions: int | None = None,
    keep_zval: bool = False,
) -> DataFrame:
    """Cluster rows for write: range-partition + sort on the z-value.

    Feed the result straight to a parquet write (optionally through
    :func:`auto_data_linkage_spark.sources.layout.write_corpus`): each
    output file then covers a tight hyper-rectangle of the z-ordered
    key space, so min/max row-group stats prune on every ``cols``
    member.
    """
    z = zvalue(df, cols, bits=bits)
    parts = [F.col("zval")]
    if num_partitions:
        z = z.repartitionByRange(num_partitions, *parts)
    else:
        z = z.repartitionByRange(*parts)
    z = z.sortWithinPartitions("zval")
    return z if keep_zval else z.drop("zval")
