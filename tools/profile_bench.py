"""Per-query profiling harness (guide §1: measure first).

Runs the named catalog queries once each (after a warmup) with the Spark
event log enabled, labeling every query's jobs via setJobDescription, then
parses the event log and prints, per query: wall seconds, number of jobs,
number of stages/tasks, total task time, shuffle read/write bytes, and the
slowest stages. This attributes bench seconds to *structure* (job count,
exchanges) vs *work* (task time, shuffle bytes) — the first question the
optimization guide asks.

Usage:
    python tools/profile_bench.py [query ...]       # default: headline set
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=...
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auto_data_linkage_spark import queries as catalog
from auto_data_linkage_spark.session import get_spark

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--parse":
        walls = {}
        if len(sys.argv) > 3:
            with open(sys.argv[3]) as fh:
                walls = json.load(fh)
        report(sys.argv[2], walls)
        return
    os.makedirs(EVDIR, exist_ok=True)
    import shutil

    for f in glob.glob(os.path.join(EVDIR, "*")):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark(
        "profile",
        cpus=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    qs = catalog.queries()
    names = sys.argv[1:] or [n for n in __import__("bench").BENCH_QUERIES]
    qs["global_agg"](spark, sf_dir).collect()  # warmup

    walls: dict[str, float] = {}
    for name in names:
        # unlabeled warm pass (codegen/JIT/broadcast warm), then the
        # labeled pass the report attributes — steady state, like the
        # bench's min-of-3
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.sparkContext.setJobDescription(f"Q::{name}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        walls[name] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    report(app_id, walls)


def _open_event_lines(app_id: str):
    """Yield event-log JSON lines; handles Spark 4 rolling dirs (+zstd)."""
    roots = [p for p in glob.glob(os.path.join(EVDIR, "*")) if app_id in p]
    roots += [p for p in [app_id] if os.path.exists(p)]  # literal path mode
    assert roots, f"no event log for {app_id}"
    for root in roots:
        files = (
            sorted(glob.glob(os.path.join(root, "events_*")))
            if os.path.isdir(root)
            else [root]
        )
        for f in files:
            if f.endswith(".zstd"):
                raise SystemExit(
                    f"compressed log {f}: decompress first (tools note: "
                    "run with spark.eventLog.compress=false, or use the "
                    "JVM ZStdCompressionCodec), then --parse <plain file>"
                )
            with open(f) as fh:
                yield from fh


def report(app_id: str, walls: dict[str, float]) -> None:
    jobs = {}      # jobId -> {desc, t0, t1, stage_ids}
    stages = {}    # stageId -> {name, t0, t1, ntask, task_time, sh_r, sh_w, in_b}
    if True:
        for line in _open_event_lines(app_id):
            ev = json.loads(line)
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "desc": props.get("spark.job.description", ""),
                    "t0": ev.get("Submission Time", 0),
                    "stage_ids": ev.get("Stage IDs", []),
                }
            elif et == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev.get("Completion Time", 0)
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "t0": si.get("Submission Time", 0),
                    "t1": si.get("Completion Time", 0),
                    "ntask": si.get("Number of Tasks", 0),
                    "task_time": 0,
                    "sh_r": 0,
                    "sh_w": 0,
                    "in_b": 0,
                }
            elif et == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                tm = ev.get("Task Metrics") or {}
                if sid in stages:
                    stages[sid]["task_time"] += tm.get("Executor Run Time", 0)
                    stages[sid]["sh_r"] += (tm.get("Shuffle Read Metrics") or {}).get(
                        "Remote Bytes Read", 0
                    ) + (tm.get("Shuffle Read Metrics") or {}).get(
                        "Local Bytes Read", 0
                    )
                    stages[sid]["sh_w"] += (
                        tm.get("Shuffle Write Metrics") or {}
                    ).get("Shuffle Bytes Written", 0)
                    stages[sid]["in_b"] += (tm.get("Input Metrics") or {}).get(
                        "Bytes Read", 0
                    )
                elif sid is not None:
                    # stage completed event not yet seen (task ends first)
                    stages.setdefault(
                        sid,
                        {
                            "name": "?",
                            "t0": 0,
                            "t1": 0,
                            "ntask": 0,
                            "task_time": 0,
                            "sh_r": 0,
                            "sh_w": 0,
                            "in_b": 0,
                        },
                    )

    per_q: dict[str, dict] = {}
    for jid, j in jobs.items():
        desc = j.get("desc", "")
        if not desc.startswith("Q::"):
            continue
        q = desc[3:]
        d = per_q.setdefault(
            q,
            {
                "jobs": 0,
                "job_ms": 0,
                "stages": 0,
                "tasks": 0,
                "task_ms": 0,
                "sh_r": 0,
                "sh_w": 0,
                "in_b": 0,
                "slow": [],
            },
        )
        d["jobs"] += 1
        d["job_ms"] += j.get("t1", j["t0"]) - j["t0"]
        for sid in j["stage_ids"]:
            if sid in stages and stages[sid]["t1"]:
                s = stages[sid]
                d["stages"] += 1
                d["tasks"] += s["ntask"]
                d["task_ms"] += s["task_time"]
                d["sh_r"] += s["sh_r"]
                d["sh_w"] += s["sh_w"]
                d["in_b"] += s["in_b"]
                d["slow"].append(
                    (s["t1"] - s["t0"], s["ntask"], s["name"].split("\n")[0][:90])
                )

    order = sorted(per_q, key=lambda q: -walls.get(q, 0))
    for q in order:
        d = per_q[q]
        d["slow"].sort(reverse=True)
        print(
            f"\n=== {q}: wall={walls.get(q, 0):.2f}s jobs={d['jobs']} "
            f"job_ms={d['job_ms']} stages={d['stages']} tasks={d['tasks']} "
            f"task_s={d['task_ms'] / 1000:.1f} shR={d['sh_r'] >> 20}MB "
            f"shW={d['sh_w'] >> 20}MB in={d['in_b'] >> 20}MB"
        )
        for ms, nt, nm in d["slow"][:6]:
            print(f"    {ms:6d}ms {nt:4d}t  {nm}")
    print(
        json.dumps(
            {
                q: {
                    k: v
                    for k, v in per_q[q].items()
                    if k != "slow"
                }
                | {"wall": round(walls.get(q, 0), 3)}
                for q in order
            }
        )
    )


if __name__ == "__main__":
    main()
