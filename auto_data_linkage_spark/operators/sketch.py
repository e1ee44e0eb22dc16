"""Count-min sketch: mergeable frequency estimation as plain aggregation.

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

__all__ = ["cm_bucket", "count_min_build", "count_min_merge", "count_min_query"]


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
