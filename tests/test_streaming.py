"""Streaming operators driven to completion via the memory sink, pinned to
their batch twins on the same data."""

import os

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.streaming.events import (
    enrich_stream,
    read_event_stream,
    run_to_memory,
    running_user_totals,
    session_counts,
    stream_dedup,
    stream_stream_join,
    windowed_counts,
    write_parquet_stream,
)


@pytest.fixture(scope="module")
def stream(spark, sf_dir):
    return read_event_stream(spark, f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    from auto_data_linkage_spark.queries_llm import _events

    return _events(spark, sf_dir)


def test_windowed_counts_match_batch(spark, stream, events_batch):
    # complete mode: append would (correctly) withhold the final windows
    # still inside the watermark horizon at end-of-stream
    run_to_memory(windowed_counts(stream), "win_counts", output_mode="complete")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from win_counts").collect()
    }
    expected = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in events_batch.groupBy(
            F.date_trunc("minute", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == expected
    assert len(got) > 0


def test_session_counts_match_batch_totals(spark, stream, events_batch):
    run_to_memory(session_counts(stream), "sess_counts", output_mode="complete")
    got = spark.sql(
        "select sum(n_events) as total, count(*) as sessions from sess_counts"
    ).collect()[0]
    assert got["total"] == events_batch.count()
    # session count must match the batch sessionize query
    from auto_data_linkage_spark.queries_llm import sessionize

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    n_batch_sessions = sessionize(spark, sf_dir).count()
    assert got["sessions"] == n_batch_sessions


def test_stream_dedup_first_per_key(spark, stream, events_batch):
    run_to_memory(stream_dedup(stream), "dedup_stream", output_mode="append")
    got = spark.sql("select count(*) as n from dedup_stream").collect()[0]["n"]
    expected = events_batch.select("user_id", "event_type").distinct().count()
    assert got == expected


def test_running_user_totals_stateful(spark, stream, events_batch):
    run_to_memory(
        running_user_totals(stream), "running_totals", output_mode="update"
    )
    # last non-finalized row per user must equal the batch totals
    rows = spark.sql(
        """
        select user_id, max(n_events) as n from running_totals
        where not finalized group by user_id
        """
    ).collect()
    got = {r["user_id"]: r["n"] for r in rows}
    expected = {
        r["user_id"]: r["n"]
        for r in events_batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == expected


def test_parquet_sink_checkpointed(spark, stream, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    q = write_parquet_stream(
        windowed_counts(stream), out, ckpt, available_now=True
    )
    q.awaitTermination(120)
    written = spark.read.parquet(out)
    assert written.count() > 0
    assert set(written.columns) == {
        "window_start", "event_type", "n_events", "total_value",
    }


def test_enrich_stream_matches_batch_join(spark, stream, events_batch):
    dim = spark.createDataFrame(
        [(int(r["user_id"]), f"seg{int(r['user_id']) % 3}")
         for r in events_batch.select("user_id").distinct().collect()],
        "user_id long, segment string",
    )
    run_to_memory(enrich_stream(stream, dim, "user_id"), "enriched_q")
    got = (
        spark.table("enriched_q").groupBy("segment").count().collect()
    )
    want = events_batch.join(dim, "user_id").groupBy("segment").count().collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_stream_stream_join_matches_batch_interval_join(
    spark, stream, events_batch
):
    """Purchases joined to same-user clicks within the prior 60 minutes,
    streaming vs the batch interval join on identical data."""
    purchases = stream.where(F.col("event_type") == "purchase")
    clicks = stream.where(F.col("event_type") == "click")
    joined = stream_stream_join(
        purchases,
        clicks,
        on="user_id",
        lookback="60 minutes",
        watermark="30 minutes",
    )
    run_to_memory(
        joined.select(
            "user_id",
            F.col("l_event_id").alias("purchase_id"),
            F.col("r_event_id").alias("click_id"),
        ),
        "ss_join_q",
    )
    got = {
        (r["user_id"], r["purchase_id"], r["click_id"])
        for r in spark.table("ss_join_q").collect()
    }

    p = events_batch.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    c = events_batch.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    want = {
        (r["user_id"], r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 60 minutes"))
            & (F.col("c_ts") <= F.col("ts")),
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_read_event_stream_empty_directory_starts(spark, tmp_path):
    """Production pattern: the landing directory exists but is empty at
    stream start — the source must construct (fallback schema) instead
    of failing schema inference, and pick files up later."""
    d = tmp_path / "landing"
    d.mkdir()
    s = read_event_stream(spark, str(d))
    assert s.isStreaming
    assert dict(s.dtypes)["ts"] == "timestamp"  # NTZ cast for watermarks
    q = run_to_memory(windowed_counts(s), "empty_dir_q", output_mode="complete")
    assert spark.sql("select count(*) n from empty_dir_q").collect()[0]["n"] == 0


def test_epoch_seconds_rejects_non_utc_session(spark):
    """The NTZ reinterpretation is only correct under the UTC pin — a
    foreign session zone must fail loudly, not shift event times."""
    import pytest as _pytest

    from auto_data_linkage_spark.session import epoch_seconds

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with _pytest.raises(ValueError, match="timeZone=UTC"):
            epoch_seconds("ts")
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # restored: the helper builds the cast expression again
    epoch_seconds("ts")
