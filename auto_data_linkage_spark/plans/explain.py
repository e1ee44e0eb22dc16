"""Physical-plan inspection helpers.

The scale contract of every operator in this engine is a *plan shape*,
not just a result: filters pushed to the parquet scan, small sides
broadcast, projections inside whole-stage codegen, no gratuitous
exchanges. These helpers turn those claims into assertions so tests (and
the perf pass) can pin them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (post-AQE initial plan)."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().simpleString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the scale-cost headline.
    Broadcast exchanges are excluded (they ship a small side, not the
    data)."""
    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
        and line.strip().startswith("(")
    )


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True when the parquet scan carries a pushed filter on ``column``."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and column in line and "[]" not in line:
            return True
    return False


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or (
        "BroadcastNestedLoopJoin" in physical_plan(df)
    )


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the (first) parquet scan — column
    pruning check: a 2-column projection must not scan 16 columns."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            return [
                f.split(":")[0].strip() for f in schema.split(",") if ":" in f
            ]
    return []


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan — EXECUTES the query (collect) so
    adaptive planning finalizes on the df's own query execution. A write
    would not do: it plans a separate execution, leaving this one
    unfinalized. Use for codegen/strategy assertions only in tests."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan_stats(df: DataFrame) -> dict:
    """Join/exchange strategy counts of the FINAL (post-AQE) plan —
    EXECUTES the query once, JVM-side only (``queryExecution.toRdd``:
    no rows cross to the driver or to Python, unlike
    :func:`executed_plan`'s collect), so it is safe on large results.
    AQE picks join strategies from RUNTIME sizes, so a broadcast→SMJ
    flip that only happens past the broadcast threshold is invisible
    in the pre-execution plan — this is the inspection the sf0.1 plan
    pins (tests/plan_baselines_sf01.json via
    ``tools/gen_plan_baselines.py --sf01``) are built from. Returns
    ``{"exchanges", "smj", "bhj", "bnlj", "cartesian"}``."""
    qe = df._jdf.queryExecution()
    qe.toRdd().count()  # execute: finalizes adaptive planning
    plan = qe.executedPlan().toString()
    shuffle_exchanges = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "ReusedExchange" not in line
    )
    return {
        "exchanges": shuffle_exchanges,
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
    }


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans in the EXECUTED plan (runs the
    query). Fewer, wider spans = more of the query runs as fused JVM
    loops."""
    plan = executed_plan(df)
    ids = set()
    for line in plan.splitlines():
        if "WholeStageCodegen" in line:
            ids.add(line.split("(")[-1].split(")")[0])
        stripped = line.strip().lstrip("+-: ").strip()
        if stripped.startswith("*("):
            ids.add(stripped[2:].split(")", 1)[0])
    return len(ids)


# ---------------------------------------------------------------- audit
# The scale-killer checklist a reviewer applies before shipping a job
# to a 1000-executor cluster, as data: which physical-plan nodes mean
# "this will not survive a 100x scale-up", graded by how often they
# are defensible.
_SCALE_SMELLS = (
    # code, severity, plan-node marker, why
    (
        "cartesian-product", "error", "CartesianProduct",
        "O(left*right) pair blowup — block/bucket/band the join instead",
    ),
    (
        "row-python-udf", "error", "BatchEvalPython",
        "row-at-a-time Python eval in the hot path — use built-in "
        "functions or an Arrow pandas UDF (ArrowEvalPython)",
    ),
    (
        "nested-loop-join", "warn", "BroadcastNestedLoopJoin",
        "fine when the broadcast side is a scalar/tiny frame; quadratic "
        "work per row otherwise — confirm the build side is bounded",
    ),
    (
        "sort-merge-join", "info", "SortMergeJoin",
        "correct for two big sides; confirm the smaller side genuinely "
        "cannot broadcast (or bucket both sides to skip the sort)",
    ),
)


def plan_findings(df: DataFrame) -> list[dict]:
    """Scale-killer audit of ``df``'s physical plan. Returns one
    ``{"code", "severity", "node", "why"}`` per smell present —
    ``severity`` is ``"error"`` (would not survive a scale-up:
    CartesianProduct, row-at-a-time Python eval), ``"warn"``
    (BroadcastNestedLoopJoin — legitimate for broadcast-scalar
    attaches, quadratic otherwise), or ``"info"`` (SortMergeJoin —
    often correct, worth a look). Purely driver-side string
    inspection of the pre-execution plan: free to run on any
    DataFrame before triggering it."""
    plan = physical_plan(df)
    return [
        {"code": code, "severity": sev, "node": node, "why": why}
        for code, sev, node, why in _SCALE_SMELLS
        if node in plan
    ]


def assert_scalable(df: DataFrame, *, allow: tuple = ()) -> list[dict]:
    """Raise ``AssertionError`` when ``df``'s plan carries an
    ``error``-grade scale smell not listed in ``allow`` (codes from
    :func:`plan_findings`); returns the full findings list (warns and
    infos included) otherwise — the one-call pre-flight for a job
    about to ship:

        assert_scalable(my_pipeline_df)   # raises on CartesianProduct
                                          # or row-at-a-time Python

    ``allow=("cartesian-product",)`` opts in a deliberate tiny cross
    (e.g. a literal 3-row grid); the return value still reports it."""
    findings = plan_findings(df)
    bad = [
        f for f in findings
        if f["severity"] == "error" and f["code"] not in allow
    ]
    if bad:
        raise AssertionError(
            "plan has scale-killer nodes: "
            + "; ".join(f"{f['code']} ({f['node']}: {f['why']})" for f in bad)
        )
    return findings
