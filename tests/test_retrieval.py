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
