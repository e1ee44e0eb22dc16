"""bench.py --all (the full-catalog regression gate, VERDICT r13 ask
#4): one JSON line timing EVERY catalog entry min-of-repeats with a
hard per-query budget — over-budget queries are listed and the process
exits non-zero, so a demoted back-window query can't silently regress.

The gate's plumbing is tested here against a stubbed catalog (the real
135-query sweep is the tool's own job — measured numbers live in
SCALE.md "Full-catalog time budget"); what must never break silently
is the contract: --all times all entries, budget trips exit(1), the
headline mode is untouched."""

import json
import os
import sys
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    sys.path.insert(0, ROOT)
    try:
        import bench
    finally:
        sys.path.remove(ROOT)
    return bench


def _stub_queries(spark, slow_names=()):
    def make(name):
        def q(s, sf_dir):
            if name in slow_names:
                time.sleep(0.25)
            return spark.range(5)

        return q

    # global_agg must exist: main() uses it as the warmup query
    return {n: make(n) for n in ("global_agg", "fast_one", "fast_two")}


@pytest.fixture()
def bench_env(monkeypatch, spark, sf_dir):
    m = _mod()
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "1")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    monkeypatch.setattr(m, "get_spark", lambda *a, **k: spark)
    return m


def _last_json(capsys):
    out = [
        line
        for line in capsys.readouterr().out.splitlines()
        if line.startswith("{")
    ]
    assert out, "bench printed no JSON line"
    return json.loads(out[-1])


def test_all_times_every_catalog_entry(bench_env, monkeypatch, spark, capsys):
    m = bench_env
    qs = _stub_queries(spark)
    monkeypatch.setattr(m.catalog, "queries", lambda: qs)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--all"])
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BUDGET", "30")
    m.main()  # no SystemExit: everything inside budget
    d = _last_json(capsys)
    assert d["metric"] == "catalog_queries_total"
    assert d["n_queries"] == 3 and sorted(d["queries"]) == sorted(qs)
    assert d["over_budget"] == {} and d["budget_sec"] == 30.0
    assert d["value"] == round(sum(d["queries"].values()), 3)


def test_all_budget_trips_nonzero_exit(bench_env, monkeypatch, spark, capsys):
    m = bench_env
    qs = _stub_queries(spark, slow_names={"fast_two"})
    monkeypatch.setattr(m.catalog, "queries", lambda: qs)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--all"])
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BUDGET", "0.2")
    with pytest.raises(SystemExit) as exc:
        m.main()
    assert exc.value.code == 1
    d = _last_json(capsys)
    assert "fast_two" in d["over_budget"]
    assert "fast_one" not in d["over_budget"]


def test_headline_mode_unchanged(bench_env, monkeypatch, spark, capsys):
    """Without --all the artifact keeps its r12 min-of-3 shape — the
    driver parses this line every round."""
    m = bench_env
    qs = _stub_queries(spark)
    monkeypatch.setattr(m.catalog, "queries", lambda: qs)
    monkeypatch.setattr(m, "BENCH_QUERIES", ["fast_one", "fast_two"])
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    m.main()
    d = _last_json(capsys)
    assert d["metric"] == "headline_queries_total"
    assert sorted(d["queries"]) == ["fast_one", "fast_two"]
    assert "queries_single_shot" in d and "over_budget" not in d
