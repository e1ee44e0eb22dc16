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


def main() -> None:
    import auto_data_linkage_spark.queries as catalog

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
