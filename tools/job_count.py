#!/usr/bin/env python3
"""Spark-job counter for the ingest protocols: how many JOBS one
keep-best ingest (or one streaming epoch) issues — the metric VERDICT
r11 item 1 asks to drive down ("jobs/epoch measurably down in the phase
profile"). Per-job fixed overhead dominates these protocol paths at
sf0.1, so the job count is the honest structural number that survives
host noise (wall-clock swings ±50% window-to-window on this box; the
job count of a deterministic protocol does not).

Usage: python tools/job_count.py <journey> [reps]
Journeys: neardup_kb | semantic_kb | streaming_kb | streaming_skb
Env: SPARK_GRAFT_SF_DIR (default sf0.01 — the job COUNT is
scale-independent for these protocol paths), SPARK_GRAFT_CPUS.
Prints one JSON line {phase: {jobs, sec}, ...}.

Job counting reads the UI REST API (/api/v1/applications/<id>/jobs) —
job ids are monotone per SparkContext, so the count of ids in a window
is the number of jobs the window issued.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.session import get_session


def _n_jobs(spark) -> int:
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{url}/api/v1/applications/{app}/jobs") as r:
        return len(json.load(r))


def main() -> None:
    journey = sys.argv[1] if len(sys.argv) > 1 else "neardup_kb"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    # the default session disables the UI; the REST job listing needs it
    spark = get_session(
        app_name="smr-jobcount", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.functions.text import token_count
    from simple_map_reduce_spark.queries_ext import (
        INCR_MOD,
        MINHASH_THRESHOLD,
        SEM_INGEST_TAU,
        SKEW_CAP,
        load_table,
    )

    out: dict[str, dict] = {}

    def timed(phase: str, fn) -> None:
        before = _n_jobs(spark)
        t0 = time.perf_counter()
        fn()
        took = time.perf_counter() - t0
        jobs = _n_jobs(spark) - before
        rec = out.setdefault(phase, {"jobs": [], "sec": []})
        rec["jobs"].append(jobs)
        rec["sec"].append(round(took, 3))

    for rep in range(reps):
        import tempfile

        root = tempfile.mkdtemp(prefix=f"jobcount_{journey}_")
        cat = Catalog(spark, os.path.join(root, "wh"))
        if journey in ("neardup_kb", "streaming_kb"):
            from simple_map_reduce_spark.operators.dedup import NearDupIndex

            docs = load_table(spark, sf_dir, "documents").withColumn(
                "q", token_count("text")
            )
            corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
            idx = NearDupIndex(
                cat,
                f"jc{rep}",
                threshold=MINHASH_THRESHOLD,
                max_bucket=SKEW_CAP,
            )
            timed("build", lambda: idx.build(corpus, quality_col="q"))
            if journey == "neardup_kb":
                batch = docs.filter(F.col("doc_id") % INCR_MOD == 0)
                timed(
                    "ingest_keep_best",
                    lambda: idx.ingest_keep_best(batch, "q"),
                )
            else:
                _drain_stream(
                    spark, root, docs, "doc_id", idx, timed, quality=True
                )
        elif journey in ("semantic_kb", "streaming_skb"):
            from simple_map_reduce_spark.operators.similarity import IvfIndex

            emb = load_table(spark, sf_dir, "embeddings")
            qual = load_table(spark, sf_dir, "documents").select(
                F.col("doc_id").alias("vec_id"),
                F.col("n_chars").alias("q"),
            )
            embq = emb.join(qual, "vec_id").select("vec_id", "embedding", "q")
            corpus = embq.filter(F.col("vec_id") % INCR_MOD != 0)
            idx = IvfIndex(cat, f"jc{rep}")
            timed("build", lambda: idx.build(corpus, quality_col="q"))
            if journey == "semantic_kb":
                batch = embq.filter(F.col("vec_id") % INCR_MOD == 0)
                timed(
                    "ingest_keep_best",
                    lambda: idx.ingest_keep_best(batch, SEM_INGEST_TAU, "q"),
                )
            else:
                _drain_stream(
                    spark, root, embq, "vec_id", idx, timed, quality=True
                )
        else:
            raise SystemExit(f"unknown journey {journey!r}")
        from simple_map_reduce_spark.cache import release_tracked

        release_tracked()
        spark.catalog.clearCache()

    summary = {
        phase: {
            "jobs": rec["jobs"],
            "sec": rec["sec"],
            "min_sec": min(rec["sec"]),
        }
        for phase, rec in out.items()
    }
    print(json.dumps(summary))
    spark.stop()


def _drain_stream(spark, root, frame, id_col, idx, timed, quality) -> None:
    """Two-epoch streaming drain, the bench rows' exact shape."""
    import shutil

    from simple_map_reduce_spark.queries_ext import INCR_MOD, SEM_INGEST_TAU

    epochs = [
        frame.filter(F.col(id_col) % (2 * INCR_MOD) == 0),
        frame.filter(F.col(id_col) % (2 * INCR_MOD) == INCR_MOD),
    ]
    src = os.path.join(root, "src")
    os.makedirs(src)
    for i, part in enumerate(epochs):
        stage = os.path.join(root, f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        pf = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = os.path.join(src, f"{'ab'[i]}.parquet")
        shutil.move(os.path.join(stage, pf), dst)
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    stream = (
        spark.readStream.schema(epochs[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from simple_map_reduce_spark.operators.dedup import NearDupIndex

    if isinstance(idx, NearDupIndex):
        timed(
            "stream_drain_2_epochs",
            lambda: idx.ingest_stream_keep_best(
                stream, os.path.join(root, "ckpt"), "q"
            ),
        )
    else:
        timed(
            "stream_drain_2_epochs",
            lambda: idx.ingest_stream_keep_best(
                stream, os.path.join(root, "ckpt"), SEM_INGEST_TAU, "q"
            ),
        )


if __name__ == "__main__":
    main()
