"""Z-order layout clustering: interleave correctness, scaling edges, and
the actual pruning benefit (per-partition min/max envelopes tighten on
BOTH columns vs a single-column sort)."""

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import zorder as Z


def test_interleave_bits_known_values(spark):
    # x=0b11, y=0b01 -> bits: x0->pos0, y0->pos1, x1->pos2, y1->pos3
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    out = df.select(
        Z.interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()[0].z
    assert out == 0b0111  # x0=1@0, y0=1@1, x1=1@2, y1=0@3


def test_interleave_locality_ordering(spark):
    # Morton order of a 2x2 grid is (0,0) (1,0) (0,1) (1,1)
    rows = [(x, y) for x in (0, 1) for y in (0, 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", Z.interleave_bits([F.col("x"), F.col("y")], bits=1).alias("z")
        ).collect()
    }
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}


def test_zvalue_constant_column_is_safe(spark):
    df = spark.createDataFrame([(i, 7) for i in range(10)], "a long, b long")
    out = Z.zvalue(df, ["a", "b"], bits=4)
    rows = out.collect()
    assert len(rows) == 10
    # constant column codes to 0 everywhere; zval still separates on `a`
    assert len({r.zval for r in rows}) == 10


def test_zvalue_range_is_bounded(spark):
    df = spark.createDataFrame(
        [(i * 13 % 101, i * 7 % 97) for i in range(200)], "a long, b long"
    )
    rows = Z.zvalue(df, ["a", "b"], bits=8).collect()
    assert all(0 <= r.zval < (1 << 16) for r in rows)


def _partition_spans(df, col):
    """Sum over partitions of (max-min) of `col` — the pruning envelope."""
    spans = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .collect()
    )
    return sum(r.span for r in spans)


def test_zorder_layout_tightens_both_columns(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey")
    )
    n_parts = 8
    zed = Z.zorder_layout(
        li, ["l_partkey", "l_suppkey"], bits=8, num_partitions=n_parts
    )
    single = li.repartitionByRange(n_parts, F.col("l_partkey"))

    z_part = _partition_spans(zed, "l_partkey")
    z_supp = _partition_spans(zed, "l_suppkey")
    s_part = _partition_spans(single, "l_partkey")
    s_supp = _partition_spans(single, "l_suppkey")

    # single-column range sort is optimal on its own column but dreadful
    # on the other; z-order must be substantially tighter on the SECOND
    # column while staying far better than unclustered on the first.
    assert z_supp < 0.7 * s_supp
    # unclustered baseline: every partition spans ~the full key range
    full_part = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("s")
    ).collect()[0].s
    assert z_part < 0.7 * n_parts * full_part
    assert s_part <= z_part  # sanity: dedicated sort wins its own column


def test_zorder_layout_drops_or_keeps_zval(spark):
    df = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    assert "zval" not in Z.zorder_layout(df, ["a", "b"]).columns
    assert "zval" in Z.zorder_layout(df, ["a", "b"], keep_zval=True).columns


def test_interleave_rejects_bigint_overflow(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2, 3, 4)], "a long, b long, c long, d long")
    cols = [F.col(c) for c in ("a", "b", "c", "d")]
    with _pytest.raises(ValueError):
        Z.interleave_bits(cols, bits=16)  # 64 positions > 63
    # 15 bits x 4 cols = 60 positions: fine
    assert df.select(Z.interleave_bits(cols, bits=15).alias("z")).collect()


def test_quantile_codes_balance_skewed_column(spark):
    """A power-law column collapses under min/max scaling (most rows get
    code 0) but spreads ~uniformly under quantile coding."""
    rows = [(i, int(1.5 ** min(i % 40, 30))) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v long")

    linear = Z.zvalue(df, ["v"], bits=4).select("zval")
    lin_top = (
        linear.groupBy("zval").count().orderBy(F.desc("count")).first()["count"]
    )
    assert lin_top > 1000  # min/max scaling collapses the skewed mass

    coded = df.select(Z.quantile_codes(df, "v", bits=4).alias("c"))
    counts = [r["count"] for r in coded.groupBy("c").count().collect()]
    assert max(counts) < 1000  # quantile codes split the hot mass
    assert len(counts) >= 8    # and use a healthy share of the 16 codes
    # codes stay in range and are usable by interleave_bits directly
    rng = coded.agg(F.min("c"), F.max("c")).collect()[0]
    assert 0 <= rng[0] and rng[1] <= 15
