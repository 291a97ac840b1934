"""Behavioral tests for BM25 retrieval (operators/retrieval.py) — the
oracle-parity suite proves Spark↔DuckDB agreement; these prove the
scoring against a transparent pure-Python BM25 and pin the posting-list
plan shape."""

from __future__ import annotations

import math
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_SCALE,
    bm25_topk,
)

DOCS = [
    (1, "hash join beats sort merge join for small build sides"),
    (2, "sort merge join wins when both sides are huge"),
    (3, "a scan with a filter pushed down reads less data"),
    (4, "the hash table spills to disk under memory pressure"),
    (5, "join join join"),  # tf saturation case
]


def _py_bm25(docs, queries, k=10, k1=BM25_K1, b=BM25_B):
    toks = {i: re.findall(r"\w+", t.lower()) for i, t in docs}
    dl = {i: len(ts) for i, ts in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    out = []
    for qid, terms in queries:
        scores = {}
        for t in dict.fromkeys(terms):
            df = sum(1 for ts in toks.values() if t in ts)
            if not df:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for i, ts in toks.items():
                tf = Counter(ts)[t]
                if not tf:
                    continue
                c = idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dl[i] / avgdl)
                )
                scores[i] = scores.get(i, 0) + math.floor(c * BM25_SCALE + 0.5)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out += [
            (qid, i, sq / float(BM25_SCALE), r + 1)
            for r, (i, sq) in enumerate(ranked)
        ]
    return sorted(out)


def test_bm25_matches_python_reference(spark):
    queries = [(1, ["hash", "join"]), (2, ["scan", "filter"]), (3, ["join"])]
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(map(tuple, bm25_topk(df, queries, k=4).collect()))
    assert got == _py_bm25(DOCS, queries, k=4)


def test_bm25_relevance_sanity(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = bm25_topk(df, [(1, ["hash", "join"])], k=5).collect()
    ranked = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)]
    # doc 1 has both terms — must outrank every single-term doc
    assert ranked[0] == 1
    # doc 3 has neither term — must not appear at all
    assert 3 not in ranked


def test_bm25_posting_filter_below_token_shuffle(spark):
    """The term filter must sit directly on the token explode, BELOW
    every exchange — the tf shuffle carries posting rows, never the raw
    token stream."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = (
        bm25_topk(df, [(1, ["hash", "join"])], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    lines = plan.splitlines()
    explodes = [
        i for i, l in enumerate(lines)
        if "Generate explode" in l and "tok#" in l
    ]
    assert explodes, plan
    for i in explodes:
        # the line ABOVE each token explode (its parent) is the term
        # filter — nothing between the explode and the IN-list prune
        assert "IN (hash,join)" in lines[i - 1], lines[i - 1]


# ---------------------------------------------------------------------------
# tf_topk / rrf_fuse / hard_negatives (round 6)
# ---------------------------------------------------------------------------

from simple_map_reduce_spark.operators.retrieval import (  # noqa: E402
    RRF_K,
    hard_negatives,
    rrf_fuse,
    tf_topk,
)


def _py_tf(docs, queries, k=10):
    toks = {i: re.findall(r"\w+", t.lower()) for i, t in docs}
    out = []
    for qid, terms in queries:
        scores = {}
        for t in dict.fromkeys(terms):
            for i, ts in toks.items():
                tf = Counter(ts)[t]
                if tf:
                    scores[i] = scores.get(i, 0) + tf
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out += [(qid, i, sc, r + 1) for r, (i, sc) in enumerate(ranked)]
    return sorted(out)


def test_tf_topk_matches_python_reference(spark):
    queries = [(1, ["hash", "join"]), (2, ["scan", "filter"]), (3, ["join"])]
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(map(tuple, tf_topk(df, queries, k=4).collect()))
    assert got == _py_tf(DOCS, queries, k=4)


def _py_rrf(run_a, run_b, k=10, k_rrf=RRF_K):
    """run_*: {(qid, doc): rank}"""
    out = []
    for qid in {q for q, _ in list(run_a) + list(run_b)}:
        docs = {d for q, d in list(run_a) + list(run_b) if q == qid}
        rows = []
        for d in docs:
            ra = run_a.get((qid, d), 0)
            rb = run_b.get((qid, d), 0)
            score = (1.0 / (k_rrf + ra) if ra else 0.0) + (
                1.0 / (k_rrf + rb) if rb else 0.0
            )
            rows.append((d, ra, rb, score))
        rows.sort(key=lambda r: (-r[3], r[0]))
        out += [
            (qid, d, ra, rb, score, i + 1)
            for i, (d, ra, rb, score) in enumerate(rows[:k])
        ]
    return sorted(out)


def _runs_df(spark, run):
    return spark.createDataFrame(
        [(q, d, r) for (q, d), r in run.items()],
        "query_id bigint, doc_id bigint, rank bigint",
    )


def test_rrf_fuse_matches_python_reference(spark):
    # overlap (doc 5 in both), disjoint tails, two queries
    run_a = {(1, 5): 1, (1, 7): 2, (1, 9): 3, (2, 4): 1}
    run_b = {(1, 5): 2, (1, 8): 1, (2, 4): 2, (2, 6): 1}
    got = sorted(
        map(tuple, rrf_fuse(_runs_df(spark, run_a), _runs_df(spark, run_b), k=3).collect())
    )
    assert got == _py_rrf(run_a, run_b, k=3)


def test_rrf_both_lists_beat_single_list(spark):
    """A doc ranked 2nd in BOTH lists must outrank docs ranked 1st in
    only one list — the whole point of the fusion."""
    run_a = {(1, 10): 1, (1, 99): 2}
    run_b = {(1, 20): 1, (1, 99): 2}
    rows = rrf_fuse(_runs_df(spark, run_a), _runs_df(spark, run_b), k=3).collect()
    top = min(rows, key=lambda r: r.fused_rank)
    assert top.doc_id == 99 and top.rank_a == 2 and top.rank_b == 2


def test_rrf_hybrid_dense_sparse_composition(spark):
    """The canonical hybrid: cosine_topk (dense) fused with bm25_topk
    (sparse), embeddings CRAFTED so the dense run overlaps the keyword
    run — covers the merge path the registered lexical-ensemble query
    exercises on real data, in the dense+sparse shape."""
    from simple_map_reduce_spark.operators.similarity import cosine_topk

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    # vec 1 ≈ vec 2 (the BM25 "join" docs); vec 3/4/5 far away
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
            (4, [-1.0, 0.0]),
            (5, [0.5, 0.5]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    dense = cosine_topk(emb, [1], k=2).withColumnRenamed("neighbor_id", "doc_id")
    sparse = bm25_topk(docs, [(1, ["join", "merge"])], k=3)
    fused = rrf_fuse(dense, sparse, k=5).collect()
    by_doc = {r.doc_id: r for r in fused}
    assert by_doc[2].rank_a > 0 and by_doc[2].rank_b > 0  # doc 2 in both
    assert by_doc[2].fused_rank == 1


def test_hard_negatives_removes_sparse_hits(spark):
    dense = spark.createDataFrame(
        [(1, 5, 0.9, 1), (1, 7, 0.8, 2), (1, 9, 0.7, 3)],
        "query_id bigint, doc_id bigint, score double, rank bigint",
    )
    sparse = spark.createDataFrame(
        [(1, 5, 1), (1, 8, 2)], "query_id bigint, doc_id bigint, rank bigint"
    )
    got = {r.doc_id for r in hard_negatives(dense, sparse).collect()}
    assert got == {7, 9}  # 5 is lexically matched → not a hard negative


def test_chunk_hybrid_topk_fuses_both_retrievers(spark):
    """The hybrid RAG query must genuinely fuse TWO live runs: fused
    rows must include docs found by both retrievers (rank_a>0 AND
    rank_b>0) as well as single-retriever docs, per-query fused ranks
    contiguous from 1, and the rrf score must equal the two reciprocal
    terms exactly (one IEEE add of exact-integer reciprocals)."""
    from simple_map_reduce_spark.queries import QUERIES
    from simple_map_reduce_spark.operators.retrieval import RRF_K
    from tests.conftest import SF_SMOKE

    rows = QUERIES["chunk_hybrid_topk"](spark, SF_SMOKE).collect()
    assert rows
    both = [r for r in rows if r.rank_a > 0 and r.rank_b > 0]
    only_a = [r for r in rows if r.rank_a > 0 and r.rank_b == 0]
    only_b = [r for r in rows if r.rank_b > 0 and r.rank_a == 0]
    assert both and (only_a or only_b), (
        f"degenerate fusion: both={len(both)} a={len(only_a)} b={len(only_b)}"
    )
    for r in rows:
        expect = (1.0 / (RRF_K + r.rank_a) if r.rank_a else 0.0) + (
            1.0 / (RRF_K + r.rank_b) if r.rank_b else 0.0
        )
        assert r.rrf_score == expect
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.fused_rank)
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (qid, ranks)
