#!/usr/bin/env python3
"""Isolated per-query measurement for the r11 optimization round: time,
Spark job/stage/task counts, and explain('formatted') dump.

Usage:
    python scripts/measure.py QUERY [QUERY...] [--plan SUFFIX]
        [--sf DIR] [--runs N]

Methodology matches bench.py (one untimed warmup, forced JVM GC
boundary, timed ``.collect()`` runs, min reported); additionally
reports the number of Spark jobs / stages / tasks the LAST timed run
scheduled — the instrument for the 32-core tiny-task anti-scaling
cluster (guide §1 / §2.2: per-stage scheduling overhead x step count).
Plan dumps go to ``plans/r11/<query>_<SUFFIX>.txt``.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hangarbay_spark.queries import REGISTRY  # noqa: E402
from hangarbay_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plan", default=None, help="suffix for plans/r11 dump")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="hangarbay_measure")
    sc = spark.sparkContext
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def jvm_gc() -> None:
        try:
            for rdd in list(sc._jsc.getPersistentRDDs().values()):
                rdd.unpersist(False)
            sc._jvm.System.gc()
        except Exception:
            pass

    for name in args.names:
        fn = REGISTRY[name].fn
        sc.setJobDescription(f"{name}: warmup")
        w0 = time.perf_counter()
        fn(spark, args.sf).collect()
        warm = time.perf_counter() - w0
        if args.plan:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            pdir = os.path.join(here, "plans", "r11")
            os.makedirs(pdir, exist_ok=True)
            with open(
                os.path.join(pdir, f"{name}_{args.plan}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        reads = []
        jobs = stages = tasks = 0
        for i in range(args.runs):
            jvm_gc()
            group = f"measure_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            reads.append(time.perf_counter() - t0)
            st = sc.statusTracker()
            job_ids = st.getJobIdsForGroup(group)
            jobs, stages, tasks = len(job_ids), 0, 0
            for jid in job_ids:
                ji = st.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = st.getStageInfo(sid)
                    if si is not None:
                        stages += 1
                        tasks += si.numTasks
            sc.setJobGroup("", "")
        print(
            f"MEASURE {name}: warmup={warm:.2f}s timed={min(reads):.3f}s "
            f"(reads: {', '.join(f'{r:.3f}' for r in reads)}) "
            f"jobs={jobs} stages={stages} tasks={tasks}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
