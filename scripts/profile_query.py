#!/usr/bin/env python3
"""Per-query profiling harness for the optimization rounds.

Usage:
    python scripts/profile_query.py QUERY [QUERY...] [--plan SUFFIX]
        [--sf DIR] [--runs N]

For each named registry query: one untimed warmup (codegen + one-time
index builds), a synchronous JVM GC boundary, then ``--runs`` timed
executions (min reported — contamination only ever adds time,
bench.py's estimator).  The timed action is the bench's own
``.collect()`` (results are contract-bounded).  With ``--plan SUFFIX``
the query's ``explain('formatted')`` is also written to
``plans/r10/<query>_<SUFFIX>.txt`` (the judge checks plan claims
against these files).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hangarbay_spark.queries import REGISTRY  # noqa: E402
from hangarbay_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plan", default=None, help="suffix for plans/r10 dump")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="hangarbay_profile")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in args.names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        w0 = time.perf_counter()
        fn(spark, args.sf).collect()
        warm = time.perf_counter() - w0
        if args.plan:
            df = fn(spark, args.sf)
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(
                here, "plans", "r10", f"{name}_{args.plan}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
        reads = []
        for i in range(args.runs):
            try:
                # same boundary as bench.py: drop leaked checkpoint
                # blocks (ContextCleaner lags py4j detach), then GC
                for rdd in list(
                    spark.sparkContext._jsc.getPersistentRDDs().values()
                ):
                    rdd.unpersist(False)
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            spark.sparkContext.setJobDescription(f"{name}: timed {i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            reads.append(time.perf_counter() - t0)
        print(f"{name}: warmup={warm:.2f}s timed={min(reads):.3f}s "
              f"(reads: {', '.join(f'{r:.3f}' for r in reads)})",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
