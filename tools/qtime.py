#!/usr/bin/env python3
"""Targeted per-query timer: bench.py's exact methodology (noop sink,
one warmup, min over reps, cache release between runs) over a named
subset — for A/B-ing one optimization without paying a full bench.

Usage: python tools/qtime.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_REPS
(default 2), SPARK_GRAFT_CPUS.
Prints one JSON line {query: sec, ...} plus loadavg bookends.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.cache import release_tracked
from simple_map_reduce_spark.queries import QUERIES
from simple_map_reduce_spark.session import get_session


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: qtime.py <query> [query ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    spark = get_session(app_name="smr-qtime")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    load_start = os.getloadavg()
    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"qtime: {name} warmup")
        try:
            force(QUERIES[name](spark, sf_dir))
        except Exception:
            pass
        release_tracked()
        spark.catalog.clearCache()
        best = None
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"qtime: {name} rep{r}")
            start = time.perf_counter()
            force(QUERIES[name](spark, sf_dir))
            took = time.perf_counter() - start
            best = took if best is None else min(best, took)
            release_tracked()
            spark.catalog.clearCache()
        out[name] = round(best, 4)
    print(
        json.dumps(
            {
                "queries": out,
                "total": round(sum(out.values()), 4),
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
