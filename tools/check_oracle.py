"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the same scale factor, then compares
row count, sorted column names, and order-insensitive values. Floats are
compared exactly after string canonicalization (the queries round
explicitly, so both engines should emit identical decimals) with a
fallback approximate check to distinguish "tiny float jitter" from
"wrong answer".

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(value):
    import datetime
    import math as _m

    if value is None:
        return "NULL"
    if isinstance(value, float):
        if _m.isnan(value):
            return "NaN"
        if value == int(value) and abs(value) < 1e15:
            return str(int(value))
        return repr(round(value, 9))
    if isinstance(value, datetime.datetime):
        return value.isoformat()
    if isinstance(value, datetime.date):
        return value.isoformat()
    return str(value)


def rows_multiset(cols, rows):
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        out.append(tuple(canon(d[c]) for c in sorted(cols)))
    return sorted(out)


def duckdb_connect(sf_dir):
    """DuckDB connection with the driver's table views registered."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def compare_query(spark, con, fn, sql, sf_dir):
    """Run one catalog query on Spark and its oracle on DuckDB; return a
    list of problem strings (empty = match). Same comparison the driver's
    correctness gate applies: row count, sorted column names,
    order-insensitive canonicalized values."""
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    problems = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns {sorted(scols)} != {sorted(dcols)}")
    if len(srows) != len(drows):
        problems.append(f"rowcount {len(srows)} != {len(drows)}")
    if not problems:
        sm = rows_multiset(scols, srows)
        dm = rows_multiset(dcols, drows)
        if sm != dm:
            diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            problems.append(f"values differ, first diffs: {diff}")
    return problems


def unknown_names(requested, catalog) -> list[str]:
    """Requested query names absent from the catalog — a typo on the CLI
    must fail loudly, not silently masquerade as a pass."""
    return sorted(set(requested) - set(catalog))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from auto_data_linkage_spark.session import get_spark

    bad = unknown_names(only, entry_mod.queries())
    if bad:
        print(f"ERROR: no such query: {bad}")
        sys.exit(2)

    spark = get_spark("oracle-check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    con = duckdb_connect(sf_dir)

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001
                failures.append(name)
                print(f"FAIL  {name}: spark error: {e}")
                continue
            print(f"ROWS  {name}: {n} rows (no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            problems = compare_query(spark, con, fn, oracles[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: error: {e}")
            continue
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name} [{time.time() - t0:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        sys.exit(1)
    print(f"all {len([n for n in qs if not only or n in only])} queries match")


if __name__ == "__main__":
    main()
