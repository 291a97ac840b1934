"""Interleaved extended-tier A/B: HEAD vs the r10 marker tree, one
window, A,B,B,A, min per tree per query (ab_headline.py methodology
over an explicit like-for-like row list)."""
import json, os, subprocess, sys, time

ROWS = [
    "minhash_dup_pairs", "dedup_prune", "semantic_ingest",
    "label_confusion", "pretraining_manifest", "pretraining_manifest_kb",
    "neardup_keep_best", "semantic_keep_best",
    "streaming_keep_best", "streaming_semantic_keep_best",
]

if len(sys.argv) == 3 and sys.argv[1] == "--inner":
    tree = sys.argv[2]
    os.chdir(tree)
    sys.path.insert(0, tree)
    from simple_map_reduce_spark.cache import release_tracked
    from simple_map_reduce_spark.queries import QUERIES
    from simple_map_reduce_spark.session import get_session
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="smr-ab-ext")
    spark.sparkContext.setLogLevel("ERROR")
    def force(df):
        df.write.format("noop").mode("overwrite").save()
    out = {}
    for name in ROWS:
        try:
            force(QUERIES[name](spark, sf_dir))  # warmup
        except Exception:
            pass
        release_tracked(); spark.catalog.clearCache()
        t0 = time.perf_counter()
        force(QUERIES[name](spark, sf_dir))
        out[name] = round(time.perf_counter() - t0, 4)
        release_tracked(); spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()
    sys.exit(0)

a_tree, b_tree = sys.argv[1], sys.argv[2]  # A = old marker, B = HEAD
runs = {"A": [], "B": []}
for tag, tree in (("A", a_tree), ("B", b_tree), ("B", b_tree), ("A", a_tree)):
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--inner", tree],
        capture_output=True, text=True, env={**os.environ},
    )
    line = r.stdout.strip().splitlines()[-1]
    runs[tag].append(json.loads(line))
    print(f"run {tag}: {line}", file=sys.stderr)
best = {
    t: {q: min(run[q] for run in runs[t]) for q in ROWS} for t in runs
}
ratios = {q: round(best["B"][q] / best["A"][q], 3) for q in ROWS}
rec = {
    "a_tree": a_tree, "b_tree": b_tree, "rows": ROWS,
    "a_min": best["A"], "b_min": best["B"], "b_over_a": ratios,
    "total_a": round(sum(best["A"].values()), 3),
    "total_b": round(sum(best["B"].values()), 3),
    "total_ratio": round(sum(best["B"].values()) / sum(best["A"].values()), 4),
    "loadavg": [round(x, 2) for x in os.getloadavg()],
}
print(json.dumps(rec))
