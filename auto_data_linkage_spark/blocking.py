"""Blocking-rule enumeration + join-size estimation WITHOUT executing joins
(reference parity: SURVEY §3.2 — ``arc_generate_blocking_rules``,
ARC.scala:10-113, ARC_EstimateSquaredCountOR.scala:20-35).

The key optimizer idea of the reference: the candidate-pair count of an
equality blocking rule is ≈ Σ count² over its blocks, so rules can be
costed from per-combination value counts (one aggregation over a sample)
instead of running O(#rules) self-joins. OR-of-AND rules combine arm
estimates by inclusion–exclusion: ``est(A OR B) = n_A·k_B + n_B·k_A −
k_A·k_B`` summed over arm pairs.

Spark-first mapping: combination enumeration is driver-side
``itertools`` (inputs are column-name lists); value counts are one
melt-explode + one shuffle (:func:`profile.combo_value_counts`); per-rule
stats collect to a small dict (the reference does exactly this at
ARC.scala:107-110); the OR search is pure Python arithmetic over that dict.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from itertools import combinations as _combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auto_data_linkage_spark.model import BlockingRule
from auto_data_linkage_spark.profile import (
    column_combinations,
    combo_value_counts,
    rule_block_stats,
)


# widest arm pool the driver-side pair enumeration will consider (cap on
# the quadratic C(n,2) loop in generate_blocking_rules; cheapest arms kept)
_ARM_CAP = 300

# extension pool per i>=3 re-expansion level: each kept partial extends
# with (i-2)-subsets drawn from the _EXT_CAP cheapest remaining arms.
# Without this the level loop enumerates C(_ARM_CAP, i-2) subsets PER
# PARTIAL (~44k × 2·top_k partials at i=4 — a driver stall on wide
# schemas). Same safety argument as _ARM_CAP: adding an expensive arm
# only raises an OR-rule's estimate, so restricting extensions to cheap
# arms cannot evict a rule that would have survived the final
# comparison_size_limit filter. Worst-case level work is bounded by
# 2·top_k · C(_EXT_CAP, max_rules_per_or_rule-2).
_EXT_CAP = 60

# default estimation-sample size (reference autolinker.py:280-284). Also
# the regime boundary for AutoLinker's "auto" guards: past this row
# count the rule estimate is a quadratically-scaled sample extrapolation
# and the untrimmed guard becomes mandatory for scale safety.
ESTIMATION_SAMPLE_ROWS = 10_000


@dataclass(frozen=True)
class RuleEstimate:
    """An OR-of-AND blocking rule with its estimated candidate-pair count."""

    arms: tuple[tuple[str, ...], ...]  # each arm = AND of these columns
    estimated_pairs: int

    def to_sql(self) -> str:
        """Reference-style rule string (ARC_ToSplinkRule.scala:17-24)."""
        rendered = [
            "(" + " AND ".join(f"l.{c} = r.{c}" for c in arm) + ")"
            for arm in self.arms
        ]
        return " OR ".join(rendered)

    def to_blocking_rules(self) -> list[BlockingRule]:
        return [BlockingRule(arm) for arm in self.arms]


def count_lookup(
    df: DataFrame,
    attribute_columns: list[str],
    *,
    max_columns_per_and_rule: int = 2,
    min_count: int = 2,
    top_k: int = 1000,
) -> dict[tuple[str, ...], tuple[int, int]]:
    """Stage A (ARC.scala:10-53): per AND-rule (column combination) →
    ``(n_blocks, trimmed_avg_squared_block_size)``.

    One explode + one shuffle builds all combination value counts; the
    per-rule stat table is ≤ #combinations rows — safe to collect.
    """
    combos = column_combinations(attribute_columns, max_columns_per_and_rule)
    counts = combo_value_counts(df, combos, min_count=min_count)
    stats = rule_block_stats(counts).orderBy("avg_squared").limit(
        max(top_k, len(combos))
    )
    out: dict[tuple[str, ...], tuple[int, int]] = {}
    for r in stats.collect():
        out[tuple(r["rule"].split(","))] = (int(r["n_blocks"]), int(r["avg_squared"]))
    return out


def estimate_or_rule(
    arms: tuple[tuple[str, ...], ...],
    lookup: dict[tuple[str, ...], tuple[int, int]],
) -> int:
    """Inclusion–exclusion pair-count estimate for an OR of AND-arms —
    exact reference semantics (ARC_EstimateSquaredCountOR.scala:22-35):
    a single arm contributes its trimmed-average squared block size ``k``;
    multi-arm rules sum over arm *pairs* ``n1·k2 + n2·k1 − k1·k2`` where
    ``n`` is the arm's block count."""
    if len(arms) == 1:
        return int(lookup.get(arms[0], (0, 0))[1])
    total = 0
    for a, b in _combinations(arms, 2):
        n1, k1 = lookup[a]
        n2, k2 = lookup[b]
        total += n1 * k2 + n2 * k1 - k1 * k2
    return int(total)  # reference does not clamp negatives


def total_squared_lookup(
    df: DataFrame,
    attribute_columns: list[str],
    *,
    max_columns_per_and_rule: int = 2,
    min_count: int = 2,
) -> dict[tuple[str, ...], int]:
    """Per AND-rule UNTRIMMED total squared block size — ``Σ cnt²`` over
    the rule's blocks, the true (2×) pair mass on this frame, where the
    reference's :func:`count_lookup` statistic is a TRIMMED per-block
    average (outlier blocks replaced by the median, ARC.scala:36-40).

    The difference matters exactly at scale: a rule whose few HOT
    blocks dominate its pair count — the null-sentinel block of a
    mostly-null column, a low-cardinality attribute — keeps a small
    trimmed average while its total explodes quadratically; measured at
    150k rows the gap reaches 10²–10³× (SCALE.md "AutoLinker E2E at
    150k rows": 8 tasks pinned >1,000 s CPU each by a rule the trimmed
    estimate admitted). Hot blocks also SURVIVE row sampling
    proportionally (cnt_sample ≈ f·cnt, so k scales by f² — undone by
    the caller's quadratic scale factor), which makes this total a
    reliable hot-rule detector on the same 10k sample, while the many
    tiny blocks sampling wipes out contribute negligible pair mass
    anyway. Same one-explode plan as :func:`count_lookup`; the agg is
    a plain SUM (no percentile window)."""
    combos = column_combinations(attribute_columns, max_columns_per_and_rule)
    counts = combo_value_counts(df, combos, min_count=min_count)
    rows = (
        counts.groupBy("combo")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("total"))
        .collect()
    )
    return {tuple(r["combo"].split(",")): int(r["total"]) for r in rows}


def generate_blocking_rules(
    df: DataFrame,
    attribute_columns: list[str],
    *,
    comparison_size_limit: int = 100_000,
    max_columns_per_and_rule: int = 2,
    max_rules_per_or_rule: int = 3,
    sample_rows: int | None = ESTIMATION_SAMPLE_ROWS,
    seed: int = 42,
    top_k: int = 1000,
    total_pairs_guard: int | None = None,
) -> list[RuleEstimate]:
    """Full reference pipeline (§3.2 stages A-C): sample → count lookup →
    enumerate OR-rules for i = 1..max arms → estimate → keep rules under
    ``comparison_size_limit``, ordered by estimate descending (richer rules
    first, reference autolinker.py:290-302).

    Defaults match the reference: 100k pair budget (autolinker.py:693),
    ≤2 cols per AND, ≤3 arms per OR (autolinker.py:263-264), 10k-row
    estimation sample (autolinker.py:280-284).

    ``total_pairs_guard`` adds a conservative second gate the reference
    lacks: rules whose UNTRIMMED estimated total squared block size
    (:func:`total_squared_lookup`, union-bounded over OR arms, sample-
    scaled like the main estimate) exceeds the guard are dropped even
    when their trimmed estimate fits ``comparison_size_limit``. Same
    units as ``comparison_size_limit`` (squared counts ≈ 2× pairs).
    Default ``None`` keeps exact reference parity; the selection order
    among surviving rules is unchanged either way. Rationale + measured
    failure mode: SCALE.md "AutoLinker E2E at 150k rows".
    """
    n = df.count()
    sampled = df
    scale = 1.0
    if sample_rows is not None and n > sample_rows:
        frac = sample_rows / n
        sampled = df.sample(fraction=frac, seed=seed)
        scale = (n / sample_rows) ** 2  # pair counts scale quadratically
        if total_pairs_guard is None:
            # past the sample size the trimmed avg-k² statistic is
            # quadratically extrapolated AND median-trimmed — the regime
            # where it is measured to under-cost hot-block rules by
            # 10²–10³× (SCALE.md "AutoLinker E2E at 150k rows"). Loud by
            # design: the silent version of this stalled a 150k-row run.
            warnings.warn(
                f"generate_blocking_rules: n={n} exceeds the estimation "
                f"sample ({sample_rows} rows) and total_pairs_guard is "
                "None — the trimmed pair estimate can admit rules whose "
                "true pair count is orders of magnitude over "
                "comparison_size_limit (hot-block bias; see SCALE.md "
                "'AutoLinker E2E at 150k rows'). Pass total_pairs_guard="
                "comparison_size_limit (or use AutoLinker's default "
                "'auto' guards) unless exact reference parity is "
                "required.",
                UserWarning,
                stacklevel=2,
            )

    lookup = count_lookup(
        sampled,
        attribute_columns,
        max_columns_per_and_rule=max_columns_per_and_rule,
        top_k=top_k,
    )
    if not lookup:
        return []

    guard_totals: dict[tuple[str, ...], int] = {}
    if total_pairs_guard is not None:
        guard_totals = total_squared_lookup(
            sampled,
            attribute_columns,
            max_columns_per_and_rule=max_columns_per_and_rule,
        )

    def _over_guard(arm_set: tuple[tuple[str, ...], ...]) -> bool:
        if total_pairs_guard is None:
            return False
        # union bound: Σ arm totals ≥ the OR's true total (pairs from
        # several arms are counted once per arm) — conservative, and
        # an arm absent from the totals (all blocks pruned by
        # min_count) contributes 0
        est = sum(guard_totals.get(a, 0) for a in arm_set) * scale
        return est > total_pairs_guard

    arms_sorted = sorted(lookup)
    seen: set[tuple[tuple[str, ...], ...]] = set()
    results: list[RuleEstimate] = []

    def add(arm_set: tuple[tuple[str, ...], ...]) -> RuleEstimate:
        est = int(estimate_or_rule(arm_set, lookup) * scale)
        r = RuleEstimate(arm_set, est)
        if arm_set not in seen:
            seen.add(arm_set)
            results.append(r)
        return r

    # i=1: single-arm rules
    for arm in arms_sorted:
        add((arm,))

    # i>=2: the reference's top-k re-expansion (ARC.scala:56-83 via
    # ARC_GeneratePartialCombinations.scala:11-51): score ALL 2-arm
    # combinations, keep the top `top_k` partials by estimate DESCENDING
    # (richer rules first — affordability is filtered at the end, exactly
    # like the reference's python side), then for i>2 extend each kept
    # partial with every (i-2)-subset of the remaining arms, dedup on the
    # sorted arm set, and keep the level's top `top_k`. All arithmetic is
    # driver-side over the collected count lookup — the same place the
    # reference evaluates its countMap. Two deviations from the
    # reference, both only ADDING coverage / bounding cost:
    # - pairing is capped at the `_ARM_CAP` cheapest arms (a very wide
    #   schema otherwise enumerates C(5000, 2) sets in driver Python;
    #   expensive arms only make ORs more expensive, so the cheap cap
    #   cannot evict affordable rules),
    # - alongside the reference's descending beam, the top_k AFFORDABLE
    #   pairs are retained too — a desc-only beam over a space larger
    #   than top_k would evict exactly the combinations that survive the
    #   final comparison_size_limit filter.
    if max_rules_per_or_rule >= 2:
        pair_arms = arms_sorted
        if len(pair_arms) > _ARM_CAP:
            pair_arms = sorted(
                pair_arms, key=lambda a: (lookup[a][1], a)
            )[:_ARM_CAP]
            pair_arms.sort()
        pairs = [
            RuleEstimate(
                tuple(sorted(p)), int(estimate_or_rule(tuple(sorted(p)), lookup) * scale)
            )
            for p in _combinations(pair_arms, 2)
        ]
        pairs.sort(key=lambda r: (-r.estimated_pairs, r.arms))
        beam = pairs[:top_k]
        affordable_pairs = [
            r for r in pairs if r.estimated_pairs < comparison_size_limit
        ][:top_k]
        partials = list(
            dict.fromkeys([r.arms for r in beam] + [r.arms for r in affordable_pairs])
        )
        for arm_set in partials:
            add(arm_set)
        # cheapest-first extension pool (bounds the i>=3 level loop; see
        # _EXT_CAP note — expensive arms can't produce affordable rules)
        ext_arms = sorted(
            pair_arms, key=lambda a: (lookup[a][1], a)
        )[:_EXT_CAP]
        ext_arms.sort()
        for i in range(3, max_rules_per_or_rule + 1):
            level: dict[tuple, int] = {}
            for partial in partials:
                rest = [a for a in ext_arms if a not in partial]
                for ext in _combinations(rest, i - 2):
                    arm_set = tuple(sorted((*partial, *ext)))
                    if arm_set not in level:
                        level[arm_set] = int(
                            estimate_or_rule(arm_set, lookup) * scale
                        )
            ranked = sorted(level.items(), key=lambda kv: (-kv[1], kv[0]))
            affordable_level = [
                kv for kv in ranked if kv[1] < comparison_size_limit
            ][:top_k]
            for arm_set, _ in list(
                dict.fromkeys(ranked[:top_k] + affordable_level)
            ):
                add(arm_set)

    affordable = [
        r
        for r in results
        if r.estimated_pairs < comparison_size_limit
        and not _over_guard(r.arms)
    ]
    affordable.sort(key=lambda r: (-r.estimated_pairs, r.arms))
    return affordable[:top_k]


def cap_block_size(
    df: DataFrame,
    block_columns: tuple[str, ...] | list[str],
    max_rows_per_block: int,
    *,
    id_column: str = "unique_id",
) -> DataFrame:
    """Hard per-block cap BEFORE pair generation (SURVEY §7 watch list:
    a blocking key shared by 10^5 rows creates 10^10 pairs; the reference
    only filters at rule granularity).

    Keeps a deterministic subset (smallest ``xxhash64(id)`` first) of at
    most ``max_rows_per_block`` rows per block value, so the worst block
    contributes ≤ cap²/2 pairs. One window pass — at scale this is a
    shuffle on the block key, which the subsequent blocking join needs
    anyway (the partitioning is reused)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in block_columns]).orderBy(
        F.xxhash64(F.col(id_column)), F.col(id_column)
    )
    return (
        df.withColumn("__bs_rn", F.row_number().over(w))
        .where(F.col("__bs_rn") <= max_rows_per_block)
        .drop("__bs_rn")
    )


def salt_hot_keys(
    df: DataFrame,
    block_columns: tuple[str, ...] | list[str],
    *,
    hot_threshold: int,
    salt_buckets: int = 8,
    id_column: str = "unique_id",
) -> DataFrame:
    """Add a ``__salt`` column splitting blocks larger than
    ``hot_threshold`` into ``salt_buckets`` sub-blocks (hash of the row
    id); small blocks get salt 0. Joining on (block cols + __salt) bounds
    any single join partition to ~hot_threshold rows at the cost of
    missing cross-salt pairs within hot blocks — a LOSSY sampling trade
    acceptable only for estimation passes. For candidate-pair generation
    use :func:`salted_self_join_pairs`, which replicates one side across
    the salts and loses nothing. Deterministic."""
    from pyspark.sql import Window

    counts = df.groupBy(*[F.col(c) for c in block_columns]).agg(
        F.count("*").alias("__bs_cnt")
    )
    joined = df.join(F.broadcast(counts), list(block_columns), "left")
    salt = F.when(
        F.col("__bs_cnt") > hot_threshold,
        F.pmod(F.xxhash64(F.col(id_column)), F.lit(salt_buckets)),
    ).otherwise(F.lit(0))
    return joined.withColumn("__salt", salt.cast("int")).drop("__bs_cnt")


def salted_self_join_pairs(
    df: DataFrame,
    block_columns: tuple[str, ...] | list[str],
    *,
    salt_buckets: int = 8,
    hot_threshold: int | None = None,
    id_column: str = "unique_id",
    select_columns: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """LOSSLESS skew-safe blocking self-join: every ``id_l < id_r`` pair
    sharing the block key, with no block ever landing on one reducer.

    This is the documented default for skewed candidate generation (AQE
    skew-splitting handles moderate skew on its own; beyond that, salt).
    The classic replicated-salt scheme:

    - probe side: one salt per row, ``hash(id) % B`` (hot blocks only
      when ``hot_threshold`` is set, else every block),
    - build side: each row REPLICATED across all ``B`` salts via a
      constant-array explode,
    - join on (block cols, salt) + ``id_l < id_r``.

    A pair (a, b) meets exactly once — at salt ``hash(a) % B``, because b
    is present at every salt — so the pair set equals the unsalted join's
    (property-tested), unlike :func:`salt_hot_keys` which drops cross-salt
    pairs. Cost: the build side is shipped ``B`` times (explode happens
    before the exchange), in return for the widest block splitting into
    ``B`` shuffle partitions. Pick B ≈ hot-block-rows / desired-partition-
    rows. With ``hot_threshold``, cold blocks skip replication entirely
    (salt 0 on both sides), so the multiplier only applies to hot rows.
    """
    keys = list(block_columns)
    cols = [id_column, *keys, *[c for c in select_columns if c not in keys]]
    base = df.select(*dict.fromkeys(cols))
    B = int(salt_buckets)

    if hot_threshold is None:
        hot = F.lit(True)
        probe = base
    else:
        counts = base.groupBy(*[F.col(c) for c in keys]).agg(
            F.count("*").alias("__bs_cnt")
        )
        # per-block counts are ≤ |distinct block values| rows; broadcast
        probe = base.join(F.broadcast(counts), keys, "left")
        hot = F.col("__bs_cnt") > hot_threshold
    left = probe.withColumn(
        "__salt",
        F.when(hot, F.pmod(F.xxhash64(F.col(id_column)), F.lit(B)))
        .otherwise(F.lit(0))
        .cast("int"),
    ).drop("__bs_cnt")

    if hot_threshold is None:
        right_salts = F.sequence(F.lit(0), F.lit(B - 1))
        build = base
    else:
        right_salts = F.when(hot, F.sequence(F.lit(0), F.lit(B - 1))).otherwise(
            F.array(F.lit(0))
        )
        build = probe
    right = (
        build.withColumn("__salt", F.explode(right_salts))
        .withColumn("__salt", F.col("__salt").cast("int"))
        .drop("__bs_cnt")
    )

    la, ra = left.alias("l"), right.alias("r")
    cond = F.col(f"l.{id_column}") < F.col(f"r.{id_column}")
    for k in [*keys, "__salt"]:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    out_cols = [
        F.col(f"l.{id_column}").alias(f"{id_column}_l"),
        F.col(f"r.{id_column}").alias(f"{id_column}_r"),
        *[F.col(f"l.{k}").alias(k) for k in keys],
    ]
    for c in select_columns:
        # id_column already emitted as id_l/id_r; keys emitted unsuffixed
        if c not in keys and c != id_column:
            out_cols.append(F.col(f"l.{c}").alias(f"{c}_l"))
            out_cols.append(F.col(f"r.{c}").alias(f"{c}_r"))
    return la.join(ra, cond, "inner").select(*out_cols)


def deterministic_rule(rules: list[RuleEstimate]) -> RuleEstimate | None:
    """The reference's deterministic-rule heuristic (autolinker.py:298):
    among the 500 smallest-estimate rules, pick the largest — a rule tight
    enough to be nearly deterministic but as productive as possible."""
    if not rules:
        return None
    smallest = sorted(rules, key=lambda r: r.estimated_pairs)[:500]
    return max(smallest, key=lambda r: r.estimated_pairs)
