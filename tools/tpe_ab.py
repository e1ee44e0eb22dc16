"""TPE-vs-random A/B on the FEBRL fixture (SCALE.md evidence).

The reference searches its hyperopt space with TPE (reference
autolinker.py:818-825); this engine's dependency-free TPESampler
(tpe.py) follows the same Bergstra recipe. This script runs the full
unsupervised AutoLinker search twice at equal trial budgets — once with
the Parzen model, once locked in the pure-random startup phase — and
prints the best-objective-so-far curve plus the supervised PRF of each
arm's final model, so trial-efficiency parity is recorded evidence
rather than an assumption.

Usage: python tools/tpe_ab.py [n_trials] [seed]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auto_data_linkage_spark.autolink import AutoLinker
from auto_data_linkage_spark.metrics import pairwise_prf
from auto_data_linkage_spark.session import get_spark
from tests.febrl_fixture import SCHEMA, make_people


def run_arm(spark, febrl, sampler: str, n_trials: int, seed: int):
    linker = AutoLinker(
        comparison_size_limit=200_000,
        max_evals=n_trials,
        true_label="recid",
        random_seed=seed,
        sampler=sampler,
    )
    t0 = time.time()
    linker.auto_link(febrl.drop("unique_id"))
    elapsed = time.time() - t0
    curve = []
    best = float("-inf")
    for t in linker.trials:
        best = max(best, t.score)
        curve.append(round(best, 6))
    clusters = linker.best_clusters_at_threshold(0.8)
    prf = pairwise_prf(clusters, "recid")
    return {
        "sampler": sampler,
        "best": round(best, 6),
        "curve": curve,
        "f1": round(prf["f1"], 4),
        "precision": round(prf["precision"], 4),
        "recall": round(prf["recall"], 4),
        "sec": round(elapsed, 1),
    }


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    spark = get_spark("tpe-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    # corruptions=3: the single-corruption fixture is too easy — every
    # configuration links perfectly and all trials tie (recorded in the
    # first A/B run), so the harder variant is what lets the objective
    # separate good configurations from bad ones
    febrl = spark.createDataFrame(
        make_people(400, 0.4, seed=42, corruptions=3), SCHEMA
    ).cache()
    febrl.count()
    out = [run_arm(spark, febrl, s, n_trials, seed) for s in ("tpe", "random")]
    for arm in out:
        print("AB:", json.dumps(arm))
    tpe, rand = out
    print(
        f"AB_SUMMARY: tpe_best={tpe['best']} random_best={rand['best']} "
        f"tpe>=random: {tpe['best'] >= rand['best']}"
    )


if __name__ == "__main__":
    main()
