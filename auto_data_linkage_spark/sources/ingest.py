"""Corpus ingest front door: schema-enforced JSONL/CSV reads with
corrupt-record quarantine and content-derived document ids.

The reference only ever reads trusted tables (Spark/pandas DataFrames
handed to AutoLinker, autolinker.py:688 — no raw-file ingest surface);
a 100 TB training-data pipeline, by contrast, starts from crawl-shaped
JSONL where some fraction of lines is malformed. The Spark-first shape:

- read in PERMISSIVE mode with an explicit schema + a corrupt-record
  column — ONE scan classifies every line (FAILFAST would abort the
  job on the first bad line; DROPMALFORMED silently destroys evidence);
- split the result into (clean, quarantine) once, from a cached
  classification pass — the quarantine keeps the raw line for replay;
- derive ids from content hashes, not row numbers: stable across
  re-ingest, partitioning, and engine, and exactly what incremental
  dedup / upsert keys need.

Scale notes: the quarantine split is a cached boolean filter, not a
second parse; `bad_record_path`-style side outputs are a sink choice
(write the quarantine DataFrame wherever evidence should live). The
content-id hash is one md5 over the text column — scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "CORRUPT_COL",
    "read_jsonl_corpus",
    "read_csv_corpus",
    "split_quarantine",
    "with_content_id",
    "ingest_report",
    "stream_read_jsonl",
    "stream_ingest",
]

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return schema.add(T.StructField(CORRUPT_COL, T.StringType(), True))


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> DataFrame:
    """PERMISSIVE JSONL scan: well-formed lines parse into ``schema``,
    malformed lines land whole in ``_corrupt_record`` (added to the
    schema automatically) with every data column null. One pass; no
    inference; bad lines cannot abort the job."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    header: bool = True,
) -> DataFrame:
    """PERMISSIVE CSV scan with the same quarantine contract as
    :func:`read_jsonl_corpus` (malformed rows → ``_corrupt_record``)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )


def split_quarantine(
    df: DataFrame,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split a permissive read into ``(clean, quarantine)``:
    quarantine = parse failures (``_corrupt_record`` set) plus rows
    missing any ``required`` column. ``clean`` drops the corrupt column.

    The input is cached first — Spark refuses a filter that references
    ONLY the internal corrupt-record column of a live JSON scan (the
    parser would have to re-run per filter), and one classification
    pass feeding both branches is what we want anyway. Call
    ``clean.unpersist()``'s parent when both branches are consumed, or
    write both sides in the same job."""
    df = df.cache()
    bad = F.col(CORRUPT_COL).isNotNull()
    for c in required or []:
        bad = bad | F.col(c).isNull()
    return (
        df.where(~bad).drop(CORRUPT_COL),
        df.where(bad),
    )


def with_content_id(
    df: DataFrame,
    cols: list[str] | str = "text",
    *,
    id_col: str = "content_id",
) -> DataFrame:
    """Append a deterministic 128-bit content id: md5 over the
    ``\\x1f``-joined columns. Stable across re-ingest, engines, and
    partitioning (unlike row numbers / monotonically_increasing_id),
    so it is the natural key for incremental upsert and exact dedup —
    two byte-identical documents get the SAME id by construction.
    Consequently exact dedup over content-hash ids is
    ``df.dropDuplicates([id_col])`` (NOT ``dedup.exact_dedup``, whose
    min-id semi-join assumes unique row ids)."""
    cols = [cols] if isinstance(cols, str) else cols
    joined = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    return df.withColumn(id_col, F.md5(joined))


def ingest_report(clean: DataFrame, quarantine: DataFrame) -> DataFrame:
    """One-row ingest summary: clean/quarantine row counts and the
    quarantine's parse-failure vs missing-required breakdown."""
    c = clean.agg(F.count("*").alias("clean_rows"))
    q = quarantine.agg(
        F.count("*").alias("quarantine_rows"),
        F.count(F.col(CORRUPT_COL)).alias("parse_failures"),
    )
    return c.crossJoin(q).select(
        "clean_rows",
        "quarantine_rows",
        "parse_failures",
        (F.col("quarantine_rows") - F.col("parse_failures")).alias(
            "missing_required"
        ),
    )


def stream_read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_jsonl_corpus`: a file-source
    ``readStream`` over a landing directory with the same PERMISSIVE +
    corrupt-record contract. New files become micro-batches; the
    checkpoint (set on the sink) guarantees each file is ingested
    exactly once across restarts."""
    reader = (
        spark.readStream.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def stream_ingest(
    stream: DataFrame,
    clean_path: str,
    quarantine_path: str,
    checkpoint: str,
    *,
    required: list[str] | None = None,
    available_now: bool = True,
):
    """Fold a streaming permissive read into TWO parquet sinks — clean
    appends to the corpus, failures append to a replayable quarantine —
    via ``foreachBatch`` (a micro-batch is a plain DataFrame, so the
    batch :func:`split_quarantine` — one cached classification pass
    feeding both writes — applies unchanged; a streaming filter on the
    corrupt column alone would be rejected by Spark). ``availableNow``
    drains the backlog and stops — the cron-style incremental ingest;
    pass ``available_now=False`` for a continuous daemon. Returns the
    started query (caller awaits/stops)."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        clean, quarantine = split_quarantine(batch, required)
        clean.write.mode("append").parquet(clean_path)
        quarantine.write.mode("append").parquet(quarantine_path)
        batch.unpersist()

    writer = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ------------------------------------------------------------- WET/WARC
WET_DELIM = "WARC/1.0"


def read_wet_corpus(
    spark: SparkSession,
    path: str,
    *,
    min_payload_chars: int = 1,
) -> DataFrame:
    """Common-Crawl-style WET records (the WARC text conversion — the
    raw-crawl entry format of the public C4/CCNet/RefinedWeb pipelines)
    as one DataFrame: ``(url, warc_date, record_type, content_length,
    text)``, one row per conversion record.

    Mechanics: ``spark.read.option("lineSep", "WARC/1.0").text`` splits
    the stream on record boundaries — Hadoop's text input handles a
    custom delimiter ACROSS split boundaries, so plain ``.wet`` files
    stay splittable at any size (gzipped ``.wet.gz`` reads transparently
    but one-task-per-file — Common Crawl ships ~10⁴–10⁵ files per
    crawl, so file count, not in-file splitting, carries the
    parallelism there). Header fields come out of the record head with
    ``regexp_extract``; the payload is everything past the first blank
    line. All codegen built-ins — no UDF, no shuffle.

    Non-``conversion`` records (``warcinfo`` preambles, request/response
    records in full WARC inputs) and payloads shorter than
    ``min_payload_chars`` are dropped; keep the raw read if you need
    them:``spark.read.option("lineSep", WET_DELIM).text(path)``.
    """
    raw = spark.read.option("lineSep", WET_DELIM).text(path)
    return _parse_wet(raw, min_payload_chars)


def _parse_wet(raw: DataFrame, min_payload_chars: int) -> DataFrame:
    """Record parse shared by the batch and streaming WET readers."""

    def hdr(name: str):
        # header lines end with \r?\n; capture to end-of-line
        return F.regexp_extract(
            F.col("value"), rf"(?m)^{name}:\s*([^\r\n]+)", 1
        )

    # payload = after the first blank line (\n\n or \r\n\r\n)
    # \A anchors the match, so at most one replacement can occur
    payload = F.regexp_replace(
        F.col("value"), r"(?s)\A.*?\r?\n\r?\n", ""
    )
    out = raw.select(
        hdr("WARC-Target-URI").alias("url"),
        hdr("WARC-Date").alias("warc_date"),
        hdr("WARC-Type").alias("record_type"),
        hdr("Content-Length").cast("long").alias("content_length"),
        # regexp trim: F.trim strips only 0x20, not the \r\n record tails
        F.regexp_replace(payload, r"^\s+|\s+$", "").alias("text"),
    )
    return out.where(
        (F.col("record_type") == "conversion")
        & (F.length("text") >= min_payload_chars)
    )


def stream_read_wet(
    spark: SparkSession,
    path: str,
    *,
    min_payload_chars: int = 1,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_wet_corpus`: a file-source
    ``readStream`` over a crawl landing directory, new ``.wet`` files
    become micro-batches of parsed conversion records (identical parse
    — shared ``_parse_wet``). Compose with
    ``streaming.documents.curate_stream(html_col=...)`` for the
    continuous crawl front door; the sink checkpoint guarantees each
    file ingests exactly once across restarts."""
    reader = spark.readStream.option("lineSep", WET_DELIM)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return _parse_wet(reader.text(path), min_payload_chars)
