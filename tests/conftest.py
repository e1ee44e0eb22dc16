import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auto_data_linkage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # The engine's default AQE coalescing floor (64k) is a SCALE knob:
    # it keeps compute-dense, byte-light intermediates parallel at bench
    # size and above. On this suite's tiny fixtures (12-row FEBRL,
    # sf0.001) it leaves every post-shuffle stage at shuffle.partitions
    # tasks where one would do, and per-task overhead dominates —
    # measured 164.9 s -> 75.6 s over four representative test files
    # with the floor at the Spark default. Tests pin 1m; the bench and
    # production sessions keep the engine default.
    spark = get_spark(
        "adls-tests",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m"
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def people(spark):
    """FEBRL-style dedup fixture: 12 clean records + controlled
    typo-duplicates, true entity in ``recid`` (mirrors the reference's
    integration fixture shape, FIXTURES.md F1)."""
    base = [
        # (given_name, surname, suburb, postcode, recid)
        ("lachlan", "berry", "bittern", "4814", "e1"),
        ("mitchell", "green", "kooringal", "4558", "e2"),
        ("sophie", "white", "tardun", "2321", "e3"),
        ("amber", "dixon", "gowrie", "3073", "e4"),
        ("ruby", "campbell", "parkes", "2620", "e5"),
        ("oliver", "harris", "seaford", "5162", "e6"),
        ("chloe", "walker", "mildura", "3500", "e7"),
        ("jack", "taylor", "penrith", "2750", "e8"),
        ("emily", "clark", "hobart", "7000", "e9"),
        ("liam", "lewis", "cairns", "4870", "e10"),
        ("grace", "young", "darwin", "0800", "e11"),
        ("noah", "hall", "geelong", "3220", "e12"),
    ]
    dups = [
        ("lachlam", "berry", "bittern", "4814", "e1"),   # typo given_name
        ("mitchell", "grene", "kooringal", "4558", "e2"),  # typo surname
        ("sophie", "white", "tardun", "2321", "e3"),     # exact duplicate
        ("amber", "dixon", "gowrie", "3037", "e4"),      # postcode transposition
        (None, "campbell", "parkes", "2620", "e5"),      # missing given_name
    ]
    rows = [(str(i + 1),) + r for i, r in enumerate(base + dups)]
    return spark.createDataFrame(
        rows, "unique_id string, given_name string, surname string, "
        "suburb string, postcode string, recid string"
    )
