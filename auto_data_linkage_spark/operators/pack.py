"""Sequence packing + stratified sampling — the two dataset-assembly
operators a pre-training pipeline runs after curation:

- :func:`pack_sequences` assigns documents to fixed-capacity bins
  (context windows) so short documents share a sequence instead of
  wasting pad tokens. The declarative streaming approximation used at
  scale: within a hash bucket, order by (token count desc, id) and cut
  bins wherever the running token total crosses a capacity multiple —
  one window cumsum, no sequential driver loop. Bucketing gives
  executor-width parallelism; each bucket's window is independent, so
  the plan is a single hash exchange + sort, never a global single-
  partition window. A document's bin is decided by where its FIRST
  token lands, so a bin can overflow by at most one document — the
  standard approximation trade (exact first-fit is inherently
  sequential).
- :func:`stratified_sample` keeps a deterministic hash-slice of every
  stratum — portable (md5-derived), reproducible across engines and
  runs, joinable (the same id always lands on the same side of the
  cut), unlike ``sample()``'s RNG which reshuffles per execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.text import md5_hash64, tokens


def split_chunks(
    docs: DataFrame,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard pre-training / retrieval-index preparation step.

    One row per chunk: (doc_id, chunk_idx, chunk_text, n_tokens). Chunk
    ``i`` starts at token ``i·(chunk_tokens − overlap)``; the final
    chunk may be shorter; empty documents produce no chunks. Entirely
    row-local (tokenize → sequence of starts → posexplode → slice), so
    the operator adds NO shuffle — chunks inherit the input partitioning,
    which is exactly what a downstream per-chunk map or dedup wants.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    starts = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__tk"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    piece = F.slice(F.col("__tk"), F.col("__start") + 1, chunk_tokens)
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


#: Sentence boundary: terminal punctuation, whitespace, then an
#: uppercase start. RE2-safe (no lookarounds — a sentinel-replace +
#: split instead), so the DuckDB oracle runs the identical pattern.
#: Honest heuristic tier (like lang_id): "Dr. Smith" splits wrong;
#: real corpora tolerate it because chunk boundaries are soft anyway.
SENTENCE_BOUNDARY_RE = r"([.!?])\s+([A-Z])"
_SENT_SEP = "\x1e"  # ASCII record separator — never in prose


def split_sentences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per sentence: (doc_id, sent_idx, sentence). Pure
    row-local projection (sentinel-replace -> split -> posexplode);
    zero shuffle, chunks inherit input partitioning."""
    marked = F.regexp_replace(
        F.col(text_col), SENTENCE_BOUNDARY_RE, "$1" + _SENT_SEP + "$2"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(marked, _SENT_SEP)).alias(
            "sent_idx", "sentence"
        ),
    ).where(F.trim(F.col("sentence")) != "")


def sentence_chunks(
    docs: DataFrame,
    *,
    max_tokens: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-boundary-respecting chunking — the RAG/packing
    preparation that never cuts mid-sentence (unlike
    :func:`split_chunks`' fixed token windows): greedily accumulate
    sentences until ``max_tokens``, then start a new chunk.

    One row per chunk: (doc_id, chunk_idx, chunk_text, n_tokens). A
    sentence is assigned to chunk ``floor(tokens_before_it /
    max_tokens)`` — soft boundaries: a chunk may overflow by (at most)
    its final sentence, the conventional trade for never splitting one.

    Plan: sentence explode -> ONE window keyed by doc (cumulative
    token count; bounded per partition by document length, the same
    posture as line_dedup) -> grouped ordered reassembly. Empty
    documents produce no chunks.
    """
    sents = split_sentences(docs, id_col=id_col, text_col=text_col)
    n_tok = F.size(tokens(F.col("sentence")))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = sents.select(
        "doc_id",
        "sent_idx",
        "sentence",
        n_tok.alias("__nt"),
    ).select(
        "doc_id",
        "sent_idx",
        "sentence",
        "__nt",
        F.floor(
            F.coalesce(F.sum("__nt").over(w), F.lit(0)) / max_tokens
        ).cast("int").alias("chunk_idx"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("sent_idx", "sentence"))
    )
    return (
        assigned.groupBy("doc_id", "chunk_idx")
        .agg(
            F.array_join(
                F.transform(ordered, lambda s: s["sentence"]), " "
            ).alias("chunk_text"),
            F.sum("__nt").alias("n_tokens"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    *,
    capacity: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> DataFrame:
    """Input rows + ``(bucket, bin)``: ``bin`` is the document's packed
    sequence within its bucket (globally unique as the pair). Documents
    longer than ``capacity`` get a bin of their own (the cumsum cut
    isolates them). Deterministic: bucket is a portable id hash, order
    within a bucket is (token count desc, id)."""
    bucket = F.pmod(md5_hash64(F.col(id_col).cast("string")), F.lit(num_buckets))
    w = (
        Window.partitionBy("__bucket")
        .orderBy(F.desc(token_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        docs.withColumn("__bucket", bucket.cast("int"))
        .withColumn("__cum", F.sum(token_col).over(w))
        .withColumn(
            "bin",
            F.floor(
                (F.col("__cum") - F.col(token_col)) / F.lit(float(capacity))
            ).cast("int"),
        )
    )
    return out.withColumnRenamed("__bucket", "bucket").drop("__cum")


def pack_stats(
    docs: DataFrame,
    *,
    capacity: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> DataFrame:
    """Per-bin packing summary (bucket, bin, n_docs, tokens) — the
    utilization view: tokens/capacity per bin is the packing
    efficiency."""
    packed = pack_sequences(
        docs,
        capacity=capacity,
        token_col=token_col,
        id_col=id_col,
        num_buckets=num_buckets,
    )
    return packed.groupBy("bucket", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).alias("tokens"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    *,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its portable
    id-hash lands under its stratum's slice — ``pmod(hash(id), 10000) <
    fraction * 10000``. Sampling decisions are a pure function of the id,
    so re-runs, engines, and incremental arrivals agree on membership
    (``sampleBy`` re-draws per execution). Strata absent from
    ``fractions`` fall back to ``default_fraction``."""
    slot = F.pmod(md5_hash64(F.col(id_col).cast("string")), F.lit(10000))
    rule = F.lit(int(default_fraction * 10000))
    for value, frac in sorted(fractions.items()):
        rule = F.when(
            F.col(strata_col) == value, F.lit(int(frac * 10000))
        ).otherwise(rule)
    return df.where(slot < rule)


def sample_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-``k`` sample per group: rank rows inside each
    group by the portable id hash (tie-broken by id) and keep the first
    ``k``. A reproducible, engine-portable replacement for per-group
    reservoir sampling — membership is a pure function of the ids
    present, so re-runs agree. One hash exchange on the group keys;
    Spark's WindowGroupLimit pushes the ``rank <= k`` cap below the
    exchange as a per-map-partition partial limit, so a hot group ships
    at most ``k`` rows per map task rather than its full size.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        md5_hash64(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def weighted_sample_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (top-``k``
    overall): the exponential-jumps / priority-sampling key — rank by
    ``u^(1/w)`` descending, where ``u`` is a uniform derived from the
    portable id hash (Efraimidis & Spirakis 2006). Heavier rows win
    proportionally more often, the pass is single-scan and fully
    distributed (a global top-k: per-partition partial TakeOrdered, then
    one merge of k·parts candidates), and the draw replays identically
    across engines and re-runs.

    Rows with non-positive weight never win. The selection key is
    computed in log space (``ln(u)/w``) for numeric stability with
    tiny weights.
    """
    # uniform in (0,1]: (hash+1) / (2^60) — md5_hash64 is 60-bit
    u = (md5_hash64(F.col(id_col).cast("string")) + 1) / F.lit(float(1 << 60))
    key = F.when(
        F.col(weight_col) > 0, F.log(u) / F.col(weight_col)
    ).otherwise(F.lit(float("-inf")))
    return (
        df.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__key")
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    *,
    alpha: float = 0.5,
    target_fraction: float = 0.3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted domain mixing (the multinomial-sampling rule
    from multilingual / multi-source pre-training, e.g. the ``p_s ∝
    n_s^alpha`` recipe of XLM-R and the Pile): compute each stratum's
    keep-rate so the expected sample is ``target_fraction`` of the
    corpus with stratum mass rebalanced by ``count^alpha`` —
    ``alpha < 1`` up-samples small sources and down-samples dominant
    ones; ``alpha = 1`` degenerates to uniform sampling.

    ``rate_s = min(1, target_fraction · total · n_s^alpha / (Σ_t
    n_t^alpha · n_s))``; membership is the same deterministic md5
    hash-slice as :func:`stratified_sample` (the integer-floored
    threshold makes the cut engine-portable). Rates capped at 1 leave
    the realized total slightly under target — the standard behavior
    (you cannot up-sample past 1 without repetition; pair with
    ``F.explode(F.sequence(...))`` epoch repetition if oversampling is
    wanted).

    Plan shape: one small groupBy for the per-stratum counts, one
    single-row global aggregate, both attached back via broadcast joins
    — the corpus itself is scanned once and never shuffled.
    """
    cnts = df.groupBy(strata_col).agg(F.count("*").alias("__cnt"))
    tot = cnts.agg(
        F.sum("__cnt").alias("__total"),
        F.sum(F.pow("__cnt", F.lit(alpha))).alias("__wsum"),
    )
    rates = cnts.crossJoin(F.broadcast(tot)).select(
        F.col(strata_col),
        F.least(
            F.lit(1.0),
            F.lit(target_fraction)
            * F.col("__total")
            * F.pow("__cnt", F.lit(alpha))
            / (F.col("__wsum") * F.col("__cnt")),
        ).alias("__rate"),
    )
    slot = F.pmod(md5_hash64(F.col(id_col).cast("string")), F.lit(10000))
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(slot < F.floor(F.col("__rate") * 10000))
        .drop("__rate")
    )


def epoch_mixture(
    df: DataFrame,
    strata_col: str,
    weights: dict,
    *,
    token_budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    max_repeat: float = 16.0,
) -> DataFrame:
    """Domain mixing WITH up-sampling: repeat each domain so the output
    hits ``token_budget`` tokens at the target ``weights`` mixture —
    the epoch-repetition recipe of Llama / Gopher / DoReMi data cards,
    where small high-value domains (wiki, books, code) run for several
    epochs while the dominant web crawl runs < 1.

    Each domain ``d`` gets repeat factor ``r_d = token_budget ·
    weights[d] / tokens_d`` (capped at ``max_repeat`` — unbounded
    repetition of a tiny domain hurts more than missing its weight).
    Every document is emitted ``floor(r_d)`` times; a deterministic
    ``frac(r_d)`` hash-slice of the domain's documents (same md5 slice
    rule as :func:`stratified_sample`) gets one extra copy, so the
    expected token total matches the budget share exactly. Output rows
    carry ``epoch`` (1-based copy index) — downstream shuffling/packing
    treats copies as distinct rows. Domains absent from ``weights``
    get weight 0 and are dropped.

    Plan shape: one small per-domain token aggregate joined back via
    broadcast, then a row-local ``explode(sequence(1, n_copies))`` —
    the corpus is scanned once and never shuffled; output size is the
    budgeted corpus, which is the irreducible cost of repetition.

    Relation to :func:`epoch_repeat`: that operator REALIZES caller-
    supplied per-stratum rates (0-based ``copy``, epoch-shiftable
    residual slice); this one PLANS the rates from a token budget and
    target weights, entirely declaratively (the per-domain token totals
    never round-trip through the driver), and emits a 1-based ``epoch``
    index. Collect this operator's implied rates and hand them to
    :func:`epoch_repeat` when you need per-epoch residual rotation.
    """
    toks = df.groupBy(strata_col).agg(
        F.sum(token_col).cast("double").alias("__tok")
    )
    w = F.lit(0.0)
    for value, wgt in sorted(weights.items()):
        w = F.when(F.col(strata_col) == value, F.lit(float(wgt))).otherwise(w)
    rates = toks.select(
        F.col(strata_col),
        F.least(
            F.lit(float(max_repeat)),
            F.lit(float(token_budget)) * w / F.col("__tok"),
        ).alias("__r"),
    )
    slot = F.pmod(md5_hash64(F.col(id_col).cast("string")), F.lit(10000))
    n_full = F.floor(F.col("__r")).cast("bigint")
    extra_slots = F.floor((F.col("__r") - F.floor(F.col("__r"))) * 10000)
    n_copies = n_full + F.when(slot < extra_slots, F.lit(1)).otherwise(
        F.lit(0)
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .withColumn("__n_copies", n_copies)
        .where(F.col("__n_copies") >= 1)  # sequence(1, 0) would descend
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("__n_copies"))),
        )
        .drop("__r", "__n_copies")
    )


def token_budget_cap(
    df: DataFrame,
    strata_col: str,
    budget,
    *,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """HARD per-stratum token cap — the down-sampling complement of
    :func:`epoch_mixture`: keep a deterministic hash-ordered prefix of
    each stratum whose cumulative token count stays within its budget.
    Data cards state domain budgets as hard token caps ("at most X B
    tokens of web crawl"); the probabilistic rate slice only hits them
    in expectation. The first budget-crossing document is INCLUDED, so
    a stratum with enough data always REACHES its budget; strata under
    budget keep everything.

    ``budget`` is an int (every stratum) or a ``{stratum: budget}``
    dict — strata absent from the dict are DROPPED (the weight-0
    convention of :func:`epoch_mixture`). Returns the kept input rows
    plus ``cum_tokens`` (running total INCLUDING the row, in hash
    order).

    Plan shape: ONE window cumsum per stratum, ordered by a portable
    md5 hash of the id (ties by id) — because the order is a uniform
    hash, the kept prefix is simultaneously an unbiased random
    subsample, and the result is deterministic across engines (the
    DuckDB oracle replays the same hash chain). Skew note: a
    mega-stratum serializes its cumsum through one partition's window
    sort — at 100 TB cap coarser units first (shard-level token
    totals, then documents within the selected shards), the standard
    two-level recipe; the operator itself is the exact inner level.
    """
    order = md5_hash64(F.col(id_col).cast("string"), seed)
    if isinstance(budget, dict):
        b = F.lit(None).cast("bigint")
        for value, cap in sorted(budget.items()):
            b = F.when(
                F.col(strata_col) == value, F.lit(int(cap))
            ).otherwise(b)
    else:
        b = F.lit(int(budget))
    w = (
        Window.partitionBy(strata_col)
        .orderBy(order.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_tokens", F.sum(token_col).over(w))
        .withColumn("__budget", b)
        .where(
            F.col("__budget").isNotNull()
            & (F.col("cum_tokens") - F.col(token_col) < F.col("__budget"))
        )
        .drop("__budget")
    )


def assign_shards(
    df: DataFrame,
    n_shards: int,
    *,
    id_col: str | list[str] = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training-data
    export: ``shard = hash(id) mod n_shards`` and ``shard_order =
    hash(id)`` (the within-shard sort key). Hashing the id breaks the
    source/time clustering of the raw corpus — the "global shuffle"
    pre-training wants — while staying a pure function of the id, so
    re-runs, engines, and incremental arrivals agree on placement
    (late-arriving documents land in their stable shard instead of
    forcing a corpus-wide reshuffle; contrast ``orderBy(rand())``).
    ``salt`` reshuffles every epoch deterministically.

    ``id_col`` may be a list for a composite key — required when the
    input carries repeated rows distinguished only by another column
    (e.g. :func:`epoch_repeat`'s ``copy``): pass
    ``id_col=["doc_id", "copy"]`` so each repeat hashes independently
    and copies of the same document scatter across shards instead of
    landing adjacent in one.

    No reference analogue (the reference exports nothing); this is the
    LLM-pipeline dataset-export step. Adds NO shuffle itself — the
    exchange happens (once, on ``shard``) only in :func:`write_shards`.
    """
    cols = [id_col] if isinstance(id_col, str) else list(id_col)
    key = (
        F.col(cols[0]).cast("string")
        if len(cols) == 1
        else F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    )
    h = md5_hash64(key, seed=salt)
    return df.withColumn(
        "shard", F.pmod(h, F.lit(n_shards)).cast("int")
    ).withColumn("shard_order", h)


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    *,
    id_col: str | list[str] = "doc_id",
    salt: int = 0,
    order_cols: list[str] | None = None,
) -> str:
    """Write the deterministically shuffled corpus as ``shard=N/``
    parquet directories, each sorted by ``shard_order`` — a training
    loader then streams shards sequentially and still sees a globally
    shuffled document order. ONE hash exchange on ``shard`` (each shard
    is built by exactly one reducer, so each directory is one sorted
    file), then a partitioned write; at 100 TB pick ``n_shards`` so a
    shard (~corpus/n) fits a reducer's spill budget, or raise
    ``spark.sql.files.maxRecordsPerFile`` to split within a shard.

    ``order_cols`` overrides the within-shard sort with columns the
    input already carries — e.g. ``["stage", "order_key"]`` from
    :func:`~auto_data_linkage_spark.operators.order.curriculum_stages`
    + :func:`~auto_data_linkage_spark.operators.order.training_order`
    realizes a curriculum (easy→hard stages, shuffled within) for the
    SAME one exchange the plain shuffle pays."""
    if order_cols is None:
        sharded = assign_shards(df, n_shards, id_col=id_col, salt=salt)
        sort_cols = ["shard", "shard_order"]
    else:
        missing = [c for c in ["shard", *order_cols] if c not in df.columns]
        if missing:
            raise ValueError(
                f"order_cols requires pre-assigned columns; missing {missing}"
            )
        sharded = df
        sort_cols = ["shard", *order_cols]
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions(*sort_cols)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    return path


def epoch_repeat(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    *,
    id_col: str = "doc_id",
    epoch: int = 0,
) -> DataFrame:
    """Oversampling companion to :func:`mixture_sample`: realize
    per-stratum rates that may EXCEED 1 by repetition — ``floor(rate)``
    full copies of every row plus one more for the deterministic
    hash-slice of rows covering the fractional remainder (e.g. rate
    2.3 → every row twice, 30% of rows a third time). The standard
    up-weighting for scarce high-quality sources (textbooks/wiki
    repeated 2–5× in published data recipes) where a keep-rate sampler
    cannot go above 1.

    Adds a ``copy`` column (0-based) so downstream shuffling/sharding
    can spread repeats — pass ``id_col=["doc_id", "copy"]`` to
    :func:`assign_shards` / :func:`write_shards` so each repeat hashes
    independently (sharding on ``doc_id`` alone would place all copies
    of a document adjacent in the same shard, defeating the global
    shuffle for oversampled rows). ``epoch`` shifts the fractional
    slice so different epochs repeat DIFFERENT residual rows.

    Plan: rates become a broadcast map; the repeat is one
    ``explode(sequence(...))`` projection — no shuffle, no driver loop,
    output size = Σ n_s·rate_s by construction.
    """
    spark = df.sparkSession
    from auto_data_linkage_spark.session import local_rows_df

    rate_rows = [(k, float(v)) for k, v in sorted(rates.items())]
    rdf = local_rows_df(spark, rate_rows, [strata_col, "__rate"])
    slot = F.pmod(
        md5_hash64(
            F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(epoch)))
        ),
        F.lit(10000),
    )
    n_copies = (
        F.floor("__rate")
        + (slot < F.floor((F.col("__rate") % 1) * 10000)).cast("int")
    ).cast("int")
    # sequence(0, -1) DESCENDS in Spark, so n_copies = 0 must produce an
    # EMPTY array (row dropped by explode), not [0, -1]
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(0), n_copies - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.join(F.broadcast(rdf), strata_col)
        .withColumn("copy", F.explode(copies))
        .drop("__rate")
    )


def leakage_safe_split(
    df: DataFrame,
    *,
    weights: dict[str, float] | None = None,
    group_col: str | None = None,
    id_col: str = "doc_id",
    salt: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment with a LEAKAGE
    GUARD: when ``group_col`` is given (a registered domain from
    :func:`urls.registered_domain`, a source, a dedup cluster id),
    every row of a group lands in the SAME split — near-duplicates and
    same-site boilerplate cannot straddle train and eval, the
    held-out-contamination failure mode a plain row-hash split has.

    Assignment is the portable 60-bit md5 hash of the group key (or
    the id) mod 1e6 against cumulative weight thresholds — a pure
    projection: re-runs, engines, and INCREMENTAL ARRIVALS agree (a
    late-crawled page of a test-split domain joins the test split
    instead of leaking into train), ``salt`` re-draws. Weights
    normalize to 1; default 98/1/1.

    Plan: zero shuffles, zero UDFs — one withColumn. Compose with
    :func:`dedup` (exact/near) BEFORE splitting for the full
    leakage story, or decontaminate train against the resulting
    eval splits."""
    from auto_data_linkage_spark.operators.text import md5_hash64

    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = float(sum(weights.values()))
    key_col = F.col(group_col) if group_col is not None else F.col(id_col)
    slot = F.pmod(
        md5_hash64(key_col.cast("string"), seed=salt), F.lit(1_000_000)
    )
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w / total
        cond = slot < int(round(cum * 1_000_000))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def fim_split(
    docs: DataFrame,
    *,
    rate: float = 0.5,
    min_tokens: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Fill-in-the-middle span splitting (the FIM pre-training
    transformation of Bavarian et al. 2022 / StarCoder): a
    deterministic ``rate`` slice of documents is split into
    (prefix, middle, suffix) at two positions drawn from the id hash,
    for the downstream <pre><suf><mid> sequence reordering; the rest
    pass through untransformed (``fim = false``, full text in
    ``prefix``) — the published recipes apply FIM to 50–90% of docs,
    not all.

    Operates on the normalized whitespace token stream (the engine's
    portable ``tokens`` — lowercased), so split points are token
    boundaries and the transformation replays identically across
    engines and runs: membership AND split points are pure functions of
    the id. Documents shorter than ``min_tokens`` are never split.
    ``middle`` may be empty when the two draws coincide (the rate of
    that is 1/n per doc — the usual convention keeps it).

    Entirely row-local (hash projections + array slices): NO shuffle,
    NO explode — chunks inherit the input partitioning. At 100 TB this
    is a pure map over the corpus, the cheapest possible shape.
    """
    tk = tokens(text_col)
    n = F.size(tk)
    sid = F.col(id_col).cast("string")
    slot = F.pmod(md5_hash64(sid, seed), F.lit(10000))
    do_fim = (slot < F.lit(int(rate * 10000))) & (n >= F.lit(min_tokens))
    a = F.pmod(md5_hash64(sid, seed + 1), n)
    b = F.pmod(md5_hash64(sid, seed + 2), n)
    lo = F.least(a, b)
    hi = F.greatest(a, b)
    return docs.select(
        F.col(id_col),
        do_fim.alias("fim"),
        F.when(do_fim, F.concat_ws(" ", F.slice(tk, 1, lo)))
        .otherwise(F.concat_ws(" ", tk))
        .alias("prefix"),
        F.when(do_fim, F.concat_ws(" ", F.slice(tk, lo + 1, hi - lo)))
        .otherwise(F.lit(""))
        .alias("middle"),
        F.when(do_fim, F.concat_ws(" ", F.slice(tk, hi + 1, n - hi)))
        .otherwise(F.lit(""))
        .alias("suffix"),
    )
