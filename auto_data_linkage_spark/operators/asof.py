"""As-of (nearest-event) join — a custom operator Spark has no builtin
for, expressed as a composition of existing DataFrame ops (the preferred
tier for custom operators; no UDF, no range-join explosion).

Plan shape: tag both sides, union, ONE shuffle on the join keys, a
partitioned window carrying the most recent (or next) right-side values
onto each left row, filter back to left rows. Cost is a single exchange +
sort over |L| + |R| rows — compare a naive range join, whose candidate
space is per-key |L|·|R| before the "latest" filter. At 100 TB the union
rows are narrow (keys + timestamp + carried values only), the sort is the
same one the window join needs anyway, and skewed keys fall under AQE's
skew handling like any other shuffle.

Semantics match DuckDB/kdb ASOF JOIN (each left row picks the single
right row with the greatest ``right_ts`` ≤ ``left_ts``; ``direction=
"forward"`` picks the smallest ≥). Ties on the timestamp are resolved by
``allow_exact``; ties among right rows sharing (key, ts) should be
pre-deduplicated by the caller (any engine's as-of is arbitrary there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    allow_exact: bool = True,
) -> DataFrame:
    """For every ``left`` row, attach ``value_cols`` from the latest
    ``right`` row with ``right_ts <= left_ts`` within the same ``on`` keys
    (``direction="backward"``; ``"forward"`` = earliest ``>=``). Left rows
    with no match keep NULLs (left-join semantics).

    ``value_cols`` must not collide with ``left`` columns — alias on the
    ``right`` side first. The right timestamp itself can be carried by
    including its (aliased) copy in ``value_cols``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    # right rows enter the union carrying only keys + ts + ONE payload
    # struct; the struct is picked whole, so every carried value comes
    # from the SAME matched right row (per-column ignorenulls picking
    # could otherwise stitch values from different rows when a right
    # value is legitimately NULL)
    payload = "__asof_payload"
    # ASOF semantics (DuckDB/kdb): NULL never matches — a right row with a
    # NULL timestamp or NULL key must not be picked (NULLs sort first in
    # ascending order, so an unfiltered NULL-ts right row would sit at the
    # head of EVERY backward frame and match left rows with no real
    # predecessor)
    r_valid = right.where(F.col(right_ts).isNotNull())
    for k in keys:
        r_valid = r_valid.where(F.col(k).isNotNull())
    r = r_valid.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(left_ts),
        F.struct(*[F.col(v) for v in value_cols]).alias(payload),
        F.lit(False).alias(_TAG),
    )
    payload_type = r.schema[payload].dataType
    l = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(payload_type).alias(payload),
        F.lit(True).alias(_TAG),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # order ties so an exact-timestamp right row is visible iff allow_exact:
    # backward scans the preceding frame, so "visible" = right sorts BEFORE
    # left at equal ts; forward scans the following frame, so it's the
    # reverse
    right_first = allow_exact if direction == "backward" else not allow_exact
    tie = F.when(F.col(_TAG) == F.lit(not right_first), 0).otherwise(1)
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(left_ts).asc(), tie.asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        picked = F.last(F.col(payload), ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(left_ts).asc(), tie.asc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        picked = F.first(F.col(payload), ignorenulls=True).over(w)

    carried = unioned.select("*", picked.alias("__asof_picked"))
    # a left row with a NULL timestamp matches nothing either (it sorts
    # before everything, so the forward frame would otherwise hand it the
    # earliest right row)
    keep = F.when(F.col(left_ts).isNotNull(), F.col("__asof_picked"))
    return carried.where(F.col(_TAG)).select(
        *[F.col(c) for c in left.columns],
        *[keep.getField(v).alias(v) for v in value_cols],
    )
