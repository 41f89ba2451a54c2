#!/usr/bin/env python3
"""Stage-level profile of one registry query via the Spark event log.

Usage: python scripts/stage_profile.py QUERY [--sf DIR]

Runs warmup + one timed execution with spark.eventLog enabled, then
parses the event log: per-stage wall time, task count, sum of task run
time / deserialize / GC / scheduler-overhead — the instrument that
separates "the tasks are slow" from "scheduling 32 tiny tasks per
stage x N stages is the cost" (guide §1.1/§2.2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hangarbay_spark.queries import REGISTRY  # noqa: E402
from hangarbay_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="hb_ev_")
    spark = get_spark(
        app_name=f"stage_profile_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    fn = REGISTRY[name].fn
    fn(spark, sf).collect()  # warmup
    try:
        for rdd in list(sc._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)
        sc._jvm.System.gc()
    except Exception:
        pass
    sc.setJobGroup("timed", name)
    t0 = time.perf_counter()
    fn(spark, sf).collect()
    wall = time.perf_counter() - t0
    t_mark = time.time() * 1000.0
    spark.stop()

    # parse the event log
    stages = {}  # (stageId, attempt) -> dict
    tasks = {}  # stage -> aggregates
    f = None
    for root, _dirs, files in os.walk(evdir):
        for fname in files:
            if "events" in fname or fname.startswith("local-"):
                f = os.path.join(root, fname)
    with open(f) as fh:
        for line in fh:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = si["Stage ID"]
                sub = si.get("Submission Time", 0)
                comp = si.get("Completion Time", 0)
                stages[key] = {
                    "name": si["Stage Name"].split(" ")[0],
                    "ntask": si["Number of Tasks"],
                    "wall_ms": comp - sub,
                    "sub": sub,
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                ti = ev.get("Task Info") or {}
                agg = tasks.setdefault(
                    sid,
                    {
                        "run": 0,
                        "deser": 0,
                        "gc": 0,
                        "ser": 0,
                        "launch2fin": 0,
                        "n": 0,
                        "fetchwait": 0,
                        "shuffwrite": 0,
                    },
                )
                agg["run"] += tm.get("Executor Run Time", 0)
                agg["deser"] += tm.get("Executor Deserialize Time", 0)
                agg["gc"] += tm.get("JVM GC Time", 0)
                agg["ser"] += tm.get("Result Serialization Time", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                agg["fetchwait"] += srm.get("Fetch Wait Time", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                agg["shuffwrite"] += swm.get("Shuffle Write Time", 0) // 1000000
                agg["launch2fin"] += ti.get("Finish Time", 0) - ti.get(
                    "Launch Time", 0
                )
                agg["n"] += 1

    print(f"\nQUERY {name}: timed wall = {wall:.3f}s")
    print(
        f"{'stage':>6} {'tasks':>5} {'wall_ms':>8} {'sum_l2f':>8} "
        f"{'sum_run':>8} {'deser':>6} {'gc':>5} {'fetchw':>6} {'name'}"
    )
    tot_wall = 0
    # only stages submitted in the timed window (after warmup): take the
    # last ~half by submission — print all, let the reader slice
    for sid in sorted(stages):
        s = stages[sid]
        t = tasks.get(sid, {})
        tot_wall += s["wall_ms"]
        print(
            f"{sid:>6} {s['ntask']:>5} {s['wall_ms']:>8} "
            f"{t.get('launch2fin', 0):>8} {t.get('run', 0):>8} "
            f"{t.get('deser', 0):>6} {t.get('gc', 0):>5} "
            f"{t.get('fetchwait', 0):>6} {s['name'][:40]}"
        )
    print(f"sum stage wall = {tot_wall} ms (all attempts incl. warmup)")
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
