"""Deterministic training order: global hash shuffle and curriculum
staging for the final pre-training corpus.

After curation/dedup/mixing, the corpus must be written in a
well-mixed order — consecutive training batches drawn from one domain
or one crawl snapshot destabilize the loss, and an engine that cannot
reproduce the exact order cannot reproduce a training run.  The classic
recipe (T5/GPT-3 data pipelines; public descriptions in the C4 and
Pile papers) is a seeded global shuffle; curriculum learning
(Bengio et al. 2009, ICML — public) additionally orders easy→hard in
coarse stages while still shuffling WITHIN each stage.

Why this shape scales to 100 TB:

- a literal global sort of the corpus is the one thing we refuse to do:
  :func:`training_order` only ASSIGNS ``(shard, order_key)`` — a pure
  row-local projection (zero shuffle, zero driver state).  The writer
  downstream (``pack.write_shards`` partitions by shard; files sort by
  ``order_key`` within a shard via ``sortWithinPartitions``) realizes
  the order with ONE exchange that it was already paying for sharding;
- :func:`curriculum_stages` needs the corpus-wide score quantiles, but
  fetches them with ONE aggregate that returns a single broadcastable
  row (``n_stages - 1`` doubles) — never a global window
  (``ntile``/``percent_rank`` over an unpartitioned window funnels the
  whole corpus through one task, the exact scale-killer this avoids);
- both order keys come from the portable ``md5_hash64``, so shard
  membership and within-shard order replay bit-identically across
  engines, runs, and cluster sizes (the catalog oracle recomputes them
  in DuckDB).

No reference analogue (green-field extension; the reference repo's
scope is record linkage — see SURVEY.md §2 scope note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.text import md5_hash64


def order_key_expr(id_col: Column | str, seed: int = 0) -> Column:
    """Portable within-shard ordering key: ``md5_hash64(seed+1 | id)``.

    Seeded one past the shard hash so shard assignment and in-shard
    order are independent draws — reusing one hash would sort every
    shard's rows by the same residue that placed them there.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_hash64(c.cast("string"), seed=seed + 1)


def training_order(
    df: DataFrame,
    *,
    n_shards: int = 1024,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every row a deterministic ``(shard, order_key)`` pair — the
    seeded global shuffle, declared instead of executed.

    The shard half delegates to :func:`~auto_data_linkage_spark.operators
    .pack.assign_shards` (one source of truth for the placement hash);
    ``order_key`` is an INDEPENDENT hash (seed offset) so the within-
    shard order survives a resharding: change ``n_shards`` and rows move
    between shards but keep their relative order, which ``shard_order``
    (the placement hash itself) cannot promise.  Reading shards
    ``0..n-1`` each sorted by ``order_key`` IS the shuffled corpus, and
    the assignment is a zero-shuffle projection — the only exchange
    happens in the writer that was already partitioning by shard.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from auto_data_linkage_spark.operators.pack import assign_shards

    return assign_shards(df, n_shards, id_col=id_col, salt=seed).drop(
        "shard_order"
    ).withColumn("order_key", order_key_expr(F.col(id_col), seed=seed))


def stage_thresholds(
    df: DataFrame,
    score_col: str,
    *,
    n_stages: int = 4,
) -> list[float]:
    """Corpus-wide score quantile cuts for ``n_stages`` equal-mass
    stages: the interpolated ``i/n_stages`` percentiles for
    ``i = 1..n_stages-1``, rounded to 6 decimals (cross-engine floor —
    DuckDB's ``quantile_cont`` computes the identical linear
    interpolation).  ONE aggregate, one broadcastable row."""
    if n_stages < 2:
        raise ValueError(f"n_stages must be >= 2, got {n_stages}")
    fracs = [i / n_stages for i in range(1, n_stages)]
    row = df.agg(
        F.percentile(F.col(score_col).cast("double"), fracs).alias("t")
    ).first()
    ts = row["t"] if row is not None else None
    if ts is None:
        raise ValueError(
            f"cannot compute stage thresholds: {score_col} is empty/all-null"
        )
    return [round(float(t), 6) for t in ts]


def curriculum_stages(
    df: DataFrame,
    score_col: str,
    *,
    n_stages: int = 4,
    seed: int = 0,
    id_col: str = "doc_id",
    thresholds: list[float] | None = None,
) -> DataFrame:
    """Curriculum assignment: stage ``s`` holds the rows whose score
    falls in the ``s``-th corpus-wide quantile band (0 = lowest =
    served first), each stage internally shuffled by ``order_key``.

    Training order is ``ORDER BY (stage, order_key)`` — easy→hard
    across stages, uniform within — and, like :func:`training_order`,
    this only DECLARES the order: stage is a row-local comparison
    against ``n_stages - 1`` broadcast threshold literals, never a
    global window.  Pass precomputed ``thresholds`` to pin stages
    across corpus versions (so a grown corpus does not silently reshape
    the curriculum).
    """
    ts = (
        [round(float(t), 6) for t in thresholds]
        if thresholds is not None
        else stage_thresholds(df, score_col, n_stages=n_stages)
    )
    sc = F.col(score_col).cast("double")
    stage = F.lit(0)
    for t in ts:
        stage = stage + F.when(sc > F.lit(t), 1).otherwise(0)
    return df.withColumn("stage", stage.cast("int")).withColumn(
        "order_key", order_key_expr(F.col(id_col), seed=seed)
    )


def score_prune(
    df: DataFrame,
    score_col: str,
    keep_frac: float,
    *,
    keep: str = "top",
    threshold: float | None = None,
) -> DataFrame:
    """Keep the best ``keep_frac`` of the corpus by a score column — the
    corpus-wide quantile prune behind perplexity filtering (CCNet),
    classifier-score filtering (GPT-3/PaLM data cards), and CLIP-score
    pruning (DataComp): ``keep="top"`` keeps scores strictly above the
    ``1 - keep_frac`` quantile, ``keep="bottom"`` keeps strictly below
    the ``keep_frac`` quantile (for "lower is better" scores like
    perplexity).

    Same scale shape as :func:`curriculum_stages`: the cut is ONE
    aggregate returning one double (never a global rank/window), the
    filter is a broadcast literal comparison, and the kept fraction is
    exact up to score ties and quantile interpolation. Pass
    ``threshold`` to pin the cut across corpus versions (and skip the
    aggregate entirely — zero-job planning).
    """
    if not 0.0 < keep_frac < 1.0:
        raise ValueError(f"keep_frac must be in (0, 1), got {keep_frac}")
    if keep not in ("top", "bottom"):
        raise ValueError(f"keep must be 'top' or 'bottom', got {keep!r}")
    if threshold is None:
        frac = 1.0 - keep_frac if keep == "top" else keep_frac
        row = df.agg(
            F.round(
                F.percentile(F.col(score_col).cast("double"), frac), 6
            ).alias("t")
        ).first()
        t = row["t"] if row is not None else None
        if t is None:
            raise ValueError(
                f"cannot compute prune threshold: {score_col} is "
                "empty/all-null"
            )
        threshold = float(t)
    sc = F.col(score_col).cast("double")
    cond = sc > F.lit(threshold) if keep == "top" else sc < F.lit(threshold)
    return df.where(cond)
