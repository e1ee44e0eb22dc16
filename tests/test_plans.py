"""Plan-shape assertions: the scale contracts of the catalog queries
(pushdown, pruning, broadcast, bounded exchanges) pinned as tests."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from auto_data_linkage_spark.plans.explain import (
    codegen_stage_count,
    count_exchanges,
    has_pushed_filter,
    scan_columns,
    uses_broadcast_join,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    q = entry_mod.queries()["groupby_agg"]
    df = q(spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate")


def test_column_pruning(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    two = li.select("l_orderkey", "l_quantity")
    cols = scan_columns(two)
    assert set(cols) == {"l_orderkey", "l_quantity"}


def test_dim_joins_broadcast(spark, sf_dir):
    df = entry_mod.queries()["join_inner_multi"](spark, sf_dir)
    assert uses_broadcast_join(df)


def test_groupby_agg_single_shuffle(spark, sf_dir):
    df = entry_mod.queries()["groupby_agg"](spark, sf_dir)
    # one shuffle for the final aggregation; partial agg is map-side
    assert count_exchanges(df) <= 1


def test_entropy_bounded_exchanges(spark, sf_dir):
    # melt -> groupBy -> window -> groupBy: must stay under 4 exchanges
    df = entry_mod.queries()["entropy"](spark, sf_dir)
    assert count_exchanges(df) <= 3


def test_codegen_present(spark, sf_dir):
    df = entry_mod.queries()["groupby_agg"](spark, sf_dir)
    assert codegen_stage_count(df) >= 1


def test_blocking_join_is_broadcast_with_pushdown(spark, sf_dir):
    df = entry_mod.queries()["blocking_self_join"](spark, sf_dir)
    assert uses_broadcast_join(df)
    assert has_pushed_filter(df, "c_nationkey")
