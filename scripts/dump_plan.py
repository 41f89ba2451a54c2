#!/usr/bin/env python3
"""Dump explain('formatted') for registry queries WITHOUT executing
them (plan evidence for the optimization rounds; cheap enough to run
while other work occupies the container).

Usage: python scripts/dump_plan.py QUERY[,QUERY...] SUFFIX
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hangarbay_spark.queries import REGISTRY  # noqa: E402
from hangarbay_spark.session import get_spark  # noqa: E402


def main() -> None:
    names, suffix = sys.argv[1].split(","), sys.argv[2]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hangarbay_dump_plan")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        df = REGISTRY[name].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(here, "plans", "r11", f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
