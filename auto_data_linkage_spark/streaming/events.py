"""Structured Streaming operators over event streams.

The reference has no streaming surface (SURVEY §2.12) — this module is the
green-field extension designed on Structured Streaming primitives:

- file-source ``readStream`` with an explicit schema (production swaps in
  Kafka; the transformations are source-agnostic),
- event-time **watermarks** bounding state for late data,
- **tumbling/sliding window** aggregations (`F.window`),
- **session windows** (`F.session_window`) with data-driven gaps,
- **stream dedup** via ``dropDuplicates`` within the watermark,
- a custom **stateful operator** (`applyInPandasWithState`): per-user
  running aggregates with idle-timeout finalization.

Batch twins of these queries live in ``queries_llm`` (tumbling agg,
sessionize, dedup-first) and are DuckDB-oracle-checked; streaming tests
pin the streaming output to the batch results on the same data.

Scale notes: state size is bounded by watermark horizon × key cardinality;
shuffle partitions set state-store parallelism (one store per partition).
``availableNow`` triggers give batch-like backfills with streaming
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fallback stream schema when the source directory is still empty at
# stream start (the current testdata writer's shape: µs TIMESTAMP_NTZ)
EVENTS_FALLBACK_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream over the events table. Swap
    ``format("parquet")`` for Kafka + ``from_json`` in production —
    everything downstream is source-agnostic.

    File streams require an explicit schema; it is taken from a static
    read of the same path so the stream always sees what the files
    actually store. Writers vary: current testdata stores µs
    TIMESTAMP_NTZ (streamed as-is), older writers stored TIMESTAMP(NANOS)
    which Spark 4 surfaces as raw-long under ``nanosAsLong`` — rebuilt to
    µs timestamps by the shared loader helper. Hardcoding either shape
    silently mis-reads the other (a nanos schema applied to µs data lands
    every event in 1970)."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from auto_data_linkage_spark.session import rebuild_nanos_timestamps

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(path).schema
    except AnalysisException:
        # start-stream-before-files-arrive: an empty landing directory
        # can't be schema-probed (UNABLE_TO_INFER_SCHEMA) — fall back to
        # the documented events layout (µs TIMESTAMP_NTZ, the current
        # writer's shape) so the stream starts and picks files up later
        schema = EVENTS_FALLBACK_SCHEMA
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path.endswith(".parquet"):
        # file sources stream a DIRECTORY; narrow to the one file via glob
        directory, filename = path.rsplit("/", 1)
        reader = reader.option("pathGlobFilter", filename)
        path = directory
    raw = reader.load(path)
    raw = rebuild_nanos_timestamps(raw)
    # EventTimeWatermark demands TIMESTAMP — TIMESTAMP_NTZ is rejected
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Under the engine's pinned UTC
    # session zone the cast is a pure reinterpretation of the wall clock,
    # so streaming results line up with the NTZ batch twins.
    if dict(raw.dtypes).get("ts") == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_counts(
    events: DataFrame,
    *,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation with a
    watermark. Append-mode-safe: a window emits once the watermark passes
    its end, and its state is dropped."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session aggregation with a data-driven session window —
    the streaming twin of the batch ``sessionize`` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    *,
    watermark: str = "1 hour",
) -> DataFrame:
    """First event per key within the watermark horizon — streaming state
    dedup (`dropDuplicates` keeps the first arrival per key; the watermark
    bounds how long each key's state lives)."""
    return events.withWatermark("ts", watermark).dropDuplicates(list(keys))


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    how: str = "left",
) -> DataFrame:
    """Stream–static enrichment join: attach dimension attributes to each
    event. Stateless — Spark re-plans the static side per micro-batch, so
    a small dim broadcasts (no shuffle of the stream) and dim updates
    between batches are picked up. Use left join to keep events whose key
    is missing from the dim (inner silently drops them)."""
    return events.join(F.broadcast(dim), on=on, how=how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "60 minutes",
    watermark: str = "30 minutes",
    prefix: tuple[str, str] = ("l_", "r_"),
) -> DataFrame:
    """Stream–stream interval join: each left event pairs with the right
    events of the same key whose ``ts_col`` falls within ``[left ts -
    lookback, left ts]`` (the interval-join shape of
    ``operators/interval.py``, in streaming form).

    Both sides MUST be watermarked and the join MUST carry a time-range
    condition — that is what lets Spark bound each side's buffered state
    (right rows older than the watermark minus ``lookback`` can never
    match again and are evicted; an unconstrained stream–stream join
    buffers forever). Non-key columns are prefixed per side, so the output
    schema is collision-free: key, ``l_*``, ``r_*``.

    State per key ≈ rows within the (watermark + lookback) horizon; the
    shuffle is the usual hash exchange on the key, one per side.
    """
    lp, rp = prefix
    l_ts, r_ts = f"{lp}{ts_col}", f"{rp}{ts_col}"
    l = left.select(
        F.col(on),
        *[F.col(c).alias(f"{lp}{c}") for c in left.columns if c != on],
    ).withWatermark(l_ts, watermark)
    r = right.select(
        F.col(on).alias(f"{rp}{on}"),
        *[F.col(c).alias(f"{rp}{c}") for c in right.columns if c != on],
    ).withWatermark(r_ts, watermark)
    cond = (
        (F.col(on) == F.col(f"{rp}{on}"))
        & (F.col(r_ts) >= F.col(l_ts) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(r_ts) <= F.col(l_ts))
    )
    return l.join(r, cond, "inner").drop(f"{rp}{on}")


_RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)
_RUNNING_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("finalized", T.BooleanType()),
    ]
)


def running_user_totals(
    events: DataFrame, *, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum) emitted on every update. The state is two numbers
    per user — O(#users), not O(#events).

    ``idle_timeout_ms`` adds ProcessingTimeTimeout finalization (a closing
    row with ``finalized=true`` when a user goes idle). Leave ``None`` for
    drain-style backfills: timeout checks schedule extra micro-batches,
    which starves ``processAllAvailable``-driven harnesses.
    """
    import pandas as pd  # local import keeps module import light

    use_timeout = idle_timeout_ms is not None

    def update(key, pdfs, state):
        (user_id,) = key
        if use_timeout and state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, n, round(total, 2), True)],
                columns=["user_id", "n_events", "total_value", "finalized"],
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if use_timeout:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [(user_id, n, round(total, 2), False)],
            columns=["user_id", "n_events", "total_value", "finalized"],
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_RUNNING_OUT_SCHEMA,
            stateStructType=_RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                "ProcessingTimeTimeout" if use_timeout else "NoTimeout"
            ),
        )
    )


def run_to_memory(
    stream_df: DataFrame, query_name: str, *, output_mode: str = "append"
) -> None:
    """Drive a streaming query to completion against the memory sink
    (test/backfill harness): process everything available, then stop."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def write_parquet_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    output_mode: str = "append",
    available_now: bool = True,
):
    """Exactly-once parquet sink with checkpointing; ``availableNow``
    drains the current backlog then stops (batch-like backfill with
    streaming semantics)."""
    writer = (
        stream_df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
