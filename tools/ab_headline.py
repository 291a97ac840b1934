#!/usr/bin/env python3
"""Interleaved A/B headline harness (persistent form of the r9
``/tmp/ab_headline.py`` experiment, VERDICT r8 item 5 / r9 item 7).

Cross-window bench records cannot distinguish host drift from code
regression: the r4->r8 headline read +15% across four windows while the
same-window A/B measured +4.5%. This harness makes the same-window
comparison repeatable:

- ONE shared runner (``--inner``) executes a tree's OWN 42-query
  headline registry (``bench.BENCH_QUERIES``) with the bench.py
  methodology — no-op DSv2 sink (pruning-proof forcing), one unmeasured
  warmup, ``release_tracked()`` + ``clearCache()`` between reps, min of
  ``SPARK_GRAFT_BENCH_REPS`` (default 2) measured reps per query — in a
  FRESH process/JVM per run, ``sys.path`` pinned to that tree alone.
- The outer driver interleaves the runs A,B,B,A inside one window and
  estimates each tree as the MIN over its runs: a transient co-tenant
  spike inflates one run, not both, so the min cancels it (the reason
  the r9 record was valid at loadavg 3-6.7).

Usage:
    git worktree add /tmp/ab_r4 <marker-commit>
    python tools/ab_headline.py /tmp/ab_r4 /root/repo > BENCH_rN_ab.json

The two trees' ``BENCH_QUERIES`` lists must be identical (asserted) —
the headline tier has been frozen since r4 precisely so this comparison
stays like-for-like.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _inner(tree: str, sf_dir: str) -> None:
    """One measured pass over ``tree``'s own headline registry; prints
    ONE JSON line. Runs with sys.path pinned to the tree so the
    registry, session config, and operators are all that tree's own."""
    os.chdir(tree)
    sys.path.insert(0, tree)
    import bench  # the tree's own harness module (list + imports)

    try:
        from simple_map_reduce_spark.cache import release_tracked
    except ImportError:  # a tree predating cache tracking
        def release_tracked() -> None:
            pass

    from simple_map_reduce_spark.session import get_session

    spark = get_session(app_name="smr-ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = bench.QUERIES
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in bench.BENCH_QUERIES:
        force(queries[name](spark, sf_dir))  # unmeasured warmup
        release_tracked()
        spark.catalog.clearCache()
        best = None
        for _ in range(reps):
            start = time.perf_counter()
            force(queries[name](spark, sf_dir))
            took = time.perf_counter() - start
            best = took if best is None else min(best, took)
            release_tracked()
            spark.catalog.clearCache()
        timings[name] = round(best, 4)
    print(
        json.dumps(
            {
                "tree": tree,
                # the tree's ACTUAL executed list, for the outer driver's
                # like-for-like check (ADVICE r10: a source-regex guard
                # truncates on ']' in comments and dies under python -O)
                "bench_queries": list(bench.BENCH_QUERIES),
                "total": round(sum(timings.values()), 4),
                "queries": timings,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


def _run_once(label: str, tree: str, sf_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--inner", tree, sf_dir],
        capture_output=True,
        text=True,
        check=False,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{label} run failed:\n{proc.stderr[-2000:]}"
        )
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    rec["label"] = label
    return rec


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--inner":
        _inner(sys.argv[2], sys.argv[3])
        return
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # bench.py's idle gate (both the 1- and 5-min averages): the
    # interleave + min estimator tolerates a noisy window, but starting
    # inside a quiet one is strictly better evidence
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT_SEC", "900"))
    threshold = max(2.0, (os.cpu_count() or 1) / 5)
    waited = 0.0
    while waited < budget and max(os.getloadavg()[:2]) > threshold:
        time.sleep(30)
        waited += 30

    # like-for-like guard, pass 1 (cheap, BEFORE any measured run):
    # import each tree's own bench module and read the list it would
    # actually execute. ADVICE r10 retired the old source-regex parse —
    # a ']' inside a list comment truncated the match, re.findall
    # picked up quoted words in comments, and `assert` vanishes under
    # python -O — so both passes compare real lists and raise
    # RuntimeError.
    def qlist(path: str) -> list[str]:
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                "import sys, json; sys.path.insert(0, sys.argv[1]); "
                "import bench; print(json.dumps(bench.BENCH_QUERIES))",
                path,
            ],
            cwd=path,
            capture_output=True,
            text=True,
            check=False,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"cannot read BENCH_QUERIES from {path}:\n{proc.stderr[-2000:]}"
            )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    if qlist(tree_a) != qlist(tree_b):
        raise RuntimeError("headline lists differ — comparison is not like-for-like")

    # interleave A,B,B,A: both trees sample the window's start AND end,
    # so a monotone load drift biases neither side
    runs = [
        _run_once("a_run1", tree_a, sf_dir),
        _run_once("b_run1", tree_b, sf_dir),
        _run_once("b_run2", tree_b, sf_dir),
        _run_once("a_run2", tree_a, sf_dir),
    ]
    # pass 2: the lists each measured run ACTUALLY executed (emitted by
    # _inner itself, so no parse can drift from execution)
    executed = {tuple(r.get("bench_queries", ())) for r in runs}
    if len(executed) != 1:
        raise RuntimeError("measured runs executed differing headline lists")
    min_a = min(r["total"] for r in runs if r["label"].startswith("a_"))
    min_b = min(r["total"] for r in runs if r["label"].startswith("b_"))

    def per_query_min(prefix: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for r in runs:
            if r["label"].startswith(prefix):
                for k, v in r["queries"].items():
                    out[k] = min(v, out.get(k, v))
        return out

    pq_a, pq_b = per_query_min("a_"), per_query_min("b_")
    ratios = sorted(pq_b[k] / pq_a[k] for k in pq_a)
    median_ratio = ratios[len(ratios) // 2]
    print(
        json.dumps(
            {
                "experiment": "headline_ab",
                "tree_a": tree_a,
                "tree_b": tree_b,
                "sf_dir": sf_dir,
                "runs": [
                    {
                        "label": r["label"],
                        "total": r["total"],
                        "loadavg": r["loadavg"],
                    }
                    for r in runs
                ],
                "idle_waited_sec": waited,
                "min_of_runs_total_a": round(min_a, 3),
                "min_of_runs_total_b": round(min_b, 3),
                "same_window_ratio_b_over_a": round(min_b / min_a, 4),
                "median_per_query_ratio": round(median_ratio, 4),
                "per_query_min_a": pq_a,
                "per_query_min_b": pq_b,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
