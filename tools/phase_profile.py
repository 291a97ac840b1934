#!/usr/bin/env python3
"""Phase-level timer for the composed journey rows: times each eager
phase (index build, ingest/challenge, final read) of one journey
separately, so optimization effort lands on the phase that actually
carries the seconds — bench.py's single number cannot distinguish a
slow build from a slow challenge.

Usage: python tools/phase_profile.py <journey> [reps]
Journeys: neardup_keep_best | semantic_keep_best | bm25_stream_ingest |
          bm25_ingest_topk | semantic_ingest | chunk_semantic_ingest
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line {phase: sec, ...} (min over reps per phase set —
each rep rebuilds from scratch like the bench's measured run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.cache import release_tracked
from simple_map_reduce_spark.session import get_session


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def profile_neardup_keep_best(spark, sf_dir, timings):
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.functions.text import token_count
    from simple_map_reduce_spark.operators.dedup import NearDupIndex
    from simple_map_reduce_spark.operators.tombstones import live
    from simple_map_reduce_spark.queries_ext import (
        INCR_MOD,
        MINHASH_THRESHOLD,
        SKEW_CAP,
        _idx_root,
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "q", token_count("text")
    )
    corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    batch = docs.filter(F.col("doc_id") % INCR_MOD == 0)
    cat = Catalog(spark, _idx_root("neardup_kb_", sf_dir))
    idx = NearDupIndex(
        cat, "neardup_kb", threshold=MINHASH_THRESHOLD, max_bucket=SKEW_CAP
    )
    t0 = time.perf_counter()
    idx.build(corpus, quality_col="q")
    timings.setdefault("build", []).append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    idx.ingest_keep_best(batch, "q")
    timings.setdefault("ingest_keep_best", []).append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    force(
        live(cat, "neardup_kb", cat.get_bucketed(idx.quality_table))
        .select("id", "q")
        .orderBy("id")
    )
    timings.setdefault("final_read", []).append(time.perf_counter() - t0)


def profile_semantic_keep_best(spark, sf_dir, timings):
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.similarity import IvfIndex
    from simple_map_reduce_spark.operators.tombstones import live
    from simple_map_reduce_spark.queries_ext import (
        INCR_MOD,
        SEM_INGEST_TAU,
        SEMDEDUP_K,
        _idx_root,
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qual = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), F.col("n_chars").alias("q")
    )
    embq = emb.join(qual, "vec_id").select("vec_id", "embedding", "q")
    corpus = embq.filter(F.col("vec_id") % INCR_MOD != 0)
    batch = embq.filter(F.col("vec_id") % INCR_MOD == 0)
    cat = Catalog(spark, _idx_root("sem_kb_prof_", sf_dir))
    idx = IvfIndex(cat, "sem_kb", n_centroids=SEMDEDUP_K)
    t0 = time.perf_counter()
    idx.build(corpus, quality_col="q")
    timings.setdefault("build", []).append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    idx.ingest_keep_best(batch, SEM_INGEST_TAU, "q")
    timings.setdefault("ingest_keep_best", []).append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    force(
        live(cat, "sem_kb", cat.get_bucketed(idx.quality_table))
        .select("id", "q")
        .orderBy("id")
    )
    timings.setdefault("final_read", []).append(time.perf_counter() - t0)


def profile_bm25_stream_ingest(spark, sf_dir, timings):
    # batch-mode phase twin of the streaming row: build + 2 ingests +
    # search (the stream adds the epoch protocol on top)
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.retrieval import Bm25Index
    from simple_map_reduce_spark.queries_ext import (
        BM25_K,
        BM25_QUERIES,
        INCR_MOD,
        _idx_root,
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    e0 = docs.filter(F.col("doc_id") % (2 * INCR_MOD) == 0)
    e1 = docs.filter(F.col("doc_id") % (2 * INCR_MOD) == INCR_MOD)
    cat = Catalog(spark, _idx_root("bm25_prof_", sf_dir))
    idx = Bm25Index(cat, "bm25_prof")
    t0 = time.perf_counter()
    idx.build(corpus)
    timings.setdefault("build", []).append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    idx.ingest(e0)
    timings.setdefault("ingest_e0", []).append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    idx.ingest(e1)
    timings.setdefault("ingest_e1", []).append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    force(idx.search(BM25_QUERIES, k=BM25_K))
    timings.setdefault("search", []).append(time.perf_counter() - t0)


PROFILES = {
    "neardup_keep_best": profile_neardup_keep_best,
    "semantic_keep_best": profile_semantic_keep_best,
    "bm25_stream_ingest": profile_bm25_stream_ingest,
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in PROFILES:
        raise SystemExit(f"usage: phase_profile.py {'|'.join(PROFILES)} [reps]")
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="smr-phase-profile")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, list[float]] = {}
    for r in range(reps + 1):  # rep 0 is the unmeasured warmup
        spark.sparkContext.setJobDescription(f"phase-profile: {name} rep{r}")
        tmp: dict[str, list[float]] = {} if r == 0 else timings
        PROFILES[name](spark, sf_dir, tmp)
        release_tracked()
        spark.catalog.clearCache()
    out = {k: round(min(v), 4) for k, v in timings.items()}
    print(
        json.dumps(
            {
                "journey": name,
                "phases": out,
                "total": round(sum(out.values()), 4),
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
