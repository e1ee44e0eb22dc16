"""As-of join operator: backward/forward, exact-tie handling, left-join
NULLs, and whole-row payload integrity (no cross-row stitching)."""

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, px, note) — note is NULL on the ts=20 row on purpose
    return spark.createDataFrame(
        [
            ("a", 10, 1.0, "ten"),
            ("a", 20, 2.0, None),
            ("a", 30, 3.0, "thirty"),
            ("b", 15, 9.0, "b15"),
        ],
        "key string, qts long, px double, note string",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [("a", 5), ("a", 20), ("a", 25), ("a", 99), ("b", 14), ("c", 50)],
        "key string, ts long",
    )


def _rows(df):
    return {
        (r["key"], r["ts"]): (r["px"], r["note"]) for r in df.collect()
    }


def test_backward_allow_exact(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on="key", left_ts="ts", right_ts="qts",
        value_cols=["px", "note"],
    )
    assert _rows(out) == {
        ("a", 5): (None, None),        # nothing at or before 5
        ("a", 20): (2.0, None),        # exact tie matches; note stays NULL
        ("a", 25): (2.0, None),        # latest ≤ 25 is the ts=20 row
        ("a", 99): (3.0, "thirty"),
        ("b", 14): (None, None),
        ("c", 50): (None, None),       # key absent from right
    }


def test_backward_strict(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on="key", left_ts="ts", right_ts="qts",
        value_cols=["px", "note"], allow_exact=False,
    )
    got = _rows(out)
    assert got[("a", 20)] == (1.0, "ten")  # exact tie now invisible


def test_forward(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on="key", left_ts="ts", right_ts="qts",
        value_cols=["px", "note"], direction="forward",
    )
    got = _rows(out)
    assert got[("a", 5)] == (1.0, "ten")
    assert got[("a", 20)] == (2.0, None)   # exact tie matches forward too
    assert got[("a", 25)] == (3.0, "thirty")
    assert got[("a", 99)] == (None, None)
    assert got[("b", 14)] == (9.0, "b15")


def test_forward_strict(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on="key", left_ts="ts", right_ts="qts",
        value_cols=["px", "note"], direction="forward", allow_exact=False,
    )
    assert _rows(out)[("a", 20)] == (3.0, "thirty")


def test_payload_not_stitched_across_rows(spark, trades, quotes):
    """The carried (px, note) must come from ONE right row: at ts=25 the
    match is the ts=20 row whose note is NULL — a per-column ignorenulls
    pick would wrongly surface "ten" from the older row."""
    out = asof_join(
        trades, quotes, on="key", left_ts="ts", right_ts="qts",
        value_cols=["px", "note"],
    )
    assert _rows(out)[("a", 25)] == (2.0, None)


def test_null_never_matches(spark):
    """ASOF semantics: NULL timestamps and NULL keys never match —
    a NULL-ts right row must not become everyone's predecessor, a NULL-ts
    left row matches nothing (even forward), NULL keys don't pair up."""
    quotes = spark.createDataFrame(
        [("a", None, 99.0, "bad"), ("a", 10, 1.0, "ten"),
         (None, 5, 7.0, "nullkey")],
        "key string, qts long, px double, note string",
    )
    trades = spark.createDataFrame(
        [("a", 5), ("a", None), (None, 50)], "key string, ts long"
    )
    for direction in ("backward", "forward"):
        out = asof_join(
            trades, quotes, on="key", left_ts="ts", right_ts="qts",
            value_cols=["px", "note"], direction=direction,
        )
        rows = {(r["key"], r["ts"]): (r["px"], r["note"]) for r in out.collect()}
        assert rows[("a", None)] == (None, None)
        assert rows[(None, 50)] == (None, None)
        if direction == "backward":
            assert rows[("a", 5)] == (None, None)  # not the NULL-ts quote
        else:
            assert rows[("a", 5)] == (1.0, "ten")
        assert out.count() == 3  # left rows all retained


def test_value_col_collision_raises(spark, trades, quotes):
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades, quotes.withColumnRenamed("px", "ts"),
            on="key", left_ts="ts", right_ts="qts", value_cols=["ts"],
        )
