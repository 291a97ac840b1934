#!/usr/bin/env python3
"""Capture .explain('formatted') for bench-tier queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [query ...]

Writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<suffix>.txt (default r12) for each named query (default: the
full bench tier). The query CALLABLE may itself run eager work (index
builds, streaming drains) before returning its final DataFrame — that
work executes here exactly as in bench.py, so capturing plans for the
journey rows costs roughly one unmeasured bench pass. The captured plan
is the plan of the RETURNED frame (the read/report path for journey
rows; the full computation for lazy rows) — the same frame bench.py
forces through the noop sink.

Optional env SPARK_GRAFT_SF_DIR selects the data dir (default sf0.1 to
match the bench record).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.cache import release_tracked
from simple_map_reduce_spark.queries import QUERIES
from simple_map_reduce_spark.session import get_session


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: capture_plans.py <suffix> [query ...]")
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.BENCH_QUERIES + bench.EXTENDED_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="smr-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure instead of dying
            text = f"EXPLAIN FAILED: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        release_tracked()
        spark.catalog.clearCache()
        print(f"captured {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
