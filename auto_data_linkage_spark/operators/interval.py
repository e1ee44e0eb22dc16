"""Interval (range) join — points joined to the intervals containing
them — composed from existing DataFrame ops with the bucket-explode
technique.

A naive range join (`l.key = r.key AND l.ts BETWEEN r.start AND r.end`)
executes as an equi-join on the key followed by a per-key candidate
filter: every (point, interval) pair sharing the key is materialized
first — per-key |points|·|intervals|, the classic quadratic blowup.

The scale path buckets time at a fixed granularity: each interval
explodes to the buckets it covers, each point lands in exactly one
bucket, and the join becomes EQUI on (key, bucket) followed by the exact
range filter. A point meets an interval in exactly one bucket (its own),
so no duplicate pairs and no post-dedup shuffle. Candidate space drops to
pairs co-located in the same bucket — for intervals of length ≈ L and
granularity g, each interval spans ≈ L/g + 1 buckets; pick g on the order
of the typical interval length (rows shipped scale with Σ(L_i/g), while
candidate quality degrades as g grows past L). The exchange is an
ordinary hash shuffle on (key, bucket) — AQE skew-splitting applies, and
hot single buckets can additionally be salted like any other key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: list[str] | str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    granularity_seconds: int = 300,
    value_cols: list[str] | None = None,
    closed: str = "both",
) -> DataFrame:
    """Inner-join every ``points`` row to each ``intervals`` row (same
    ``on`` keys) whose ``[start_ts, end_ts]`` contains ``point_ts``.

    Timestamps may be TIMESTAMP or numeric (seconds). ``closed`` ∈
    {"both", "left", "right", "neither"} picks boundary inclusivity.
    ``value_cols`` (default: all non-key interval columns) are appended to
    the point row; alias them on ``intervals`` first if they collide.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [
            c for c in intervals.columns
            if c not in keys and c not in (start_ts, end_ts)
        ]
    clash = set(value_cols) & set(points.columns)
    if clash:
        raise ValueError(f"value_cols collide with point columns: {sorted(clash)}")
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"unknown closed mode {closed!r}")

    p_types, i_types = dict(points.dtypes), dict(intervals.dtypes)

    def p_secs(col):
        return _secs(col, p_types[col])

    def i_secs(col):
        return _secs(col, i_types[col])

    g = float(granularity_seconds)
    p = points.withColumn(
        "__bucket", F.floor(p_secs(point_ts) / F.lit(g)).cast("long")
    )
    # guard malformed intervals BEFORE the explode: end < start makes
    # F.sequence step backwards across the whole gap (one corrupt row with
    # a zero-sentinel end would emit millions of bucket rows, all filtered
    # later — or fail the job on sequence length). Such rows can never
    # match, so dropping them preserves semantics. NULL bounds yield a
    # NULL sequence, which explode already drops.
    i = intervals.where(i_secs(end_ts) >= i_secs(start_ts)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(i_secs(start_ts) / F.lit(g)).cast("long"),
                F.floor(i_secs(end_ts) / F.lit(g)).cast("long"),
            )
        ),
    )
    pa = p.alias("p")
    ia = i.select(*keys, "__bucket", start_ts, end_ts, *value_cols).alias("i")
    cond = F.col("p.__bucket") == F.col("i.__bucket")
    for k in keys:
        cond = cond & (F.col(f"p.{k}") == F.col(f"i.{k}"))
    pt = _secs(f"p.{point_ts}", p_types[point_ts])
    st = _secs(f"i.{start_ts}", i_types[start_ts])
    en = _secs(f"i.{end_ts}", i_types[end_ts])
    lo = pt >= st if closed in ("both", "left") else pt > st
    hi = pt <= en if closed in ("both", "right") else pt < en
    joined = pa.join(ia, cond, "inner").where(lo & hi)
    return joined.select(
        *[F.col(f"p.{c}") for c in points.columns],
        *[F.col(f"i.{v}") for v in value_cols],
    )


def _secs(col_ref: str, dtype: str):
    """Epoch-seconds double: NTZ-safe timestamp path (Spark 4 forbids a
    direct TIMESTAMP_NTZ→DOUBLE cast; the intermediate cast reinterprets
    the wall clock in the UTC session zone — session.epoch_seconds
    verifies the zone pin), passthrough for numerics."""
    if dtype.startswith("timestamp"):
        from auto_data_linkage_spark.session import epoch_seconds

        return epoch_seconds(col_ref)
    return F.col(col_ref).cast("double")
