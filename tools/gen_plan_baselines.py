"""Regenerate tests/plan_baselines.json — the pinned plan-SHAPE budget.

For every registered catalog query, record the shuffle-exchange count
of its physical plan at the test fixture scale (sf0.001 — plan shapes
below the broadcast threshold are stable there). The companion test
(tests/test_plan_baselines.py) fails when a query's exchange count
GROWS past its pinned budget: the time budget (bench.py --all)
catches a slow regression, this catches the structural one (a lost
broadcast, a new shuffle) even when the small-SF timing hides it.

Run after intentionally changing a query's plan:

    python tools/gen_plan_baselines.py

and commit the diff — the diff IS the review artifact ("this change
adds one exchange to X because ...").
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auto_data_linkage_spark.plans.explain import count_exchanges  # noqa: E402
from auto_data_linkage_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "plan_baselines.json",
)


SF01_DIR = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
OUT_SF01 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "plan_baselines_sf01.json",
)


def main() -> None:
    import auto_data_linkage_spark.queries as catalog

    if "--sf01" in sys.argv[1:]:
        # the sf0.1 FINAL-plan pins (VERDICT r14 ask #3): AQE decides
        # join strategies from runtime sizes, so a broadcast→SMJ flip
        # that only appears past the broadcast threshold is invisible
        # to the sf0.001 static pins — these record the post-execution
        # (isFinalPlan) exchange + join-strategy counts of the HEADLINE
        # set at the bench SF. Compared by `bench.py --check-plans`
        # (bench-adjacent — the suite stays sf0.001-only and fast).
        # Regenerate after an intentional plan change:
        #     python tools/gen_plan_baselines.py --sf01
        # and commit the diff.
        from bench import BENCH_QUERIES
        from auto_data_linkage_spark.plans.explain import final_plan_stats

        spark = get_spark("plan-baselines-sf01", cpus=8)
        qs = catalog.queries()
        out = {}
        for name in BENCH_QUERIES:
            out[name] = final_plan_stats(qs[name](spark, SF01_DIR))
            print(f"{name}: {out[name]}")
        with open(OUT_SF01, "w") as f:
            json.dump(out, f, indent=0, sort_keys=True)
            f.write("\n")
        print(f"wrote {len(out)} sf0.1 final-plan baselines -> {OUT_SF01}")
        spark.stop()
        return

    spark = get_spark("plan-baselines", cpus=8)
    out = {}
    for name, fn in catalog.queries().items():
        out[name] = count_exchanges(fn(spark, SF_DIR))
        print(f"{out[name]:3d}  {name}")
    with open(OUT, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(out)} baselines -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
