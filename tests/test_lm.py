"""Behavioral tests for bigram LM quality scoring (operators/lm.py) —
the oracle-parity suite proves Spark↔DuckDB agreement; these prove the
model math against a transparent pure-Python reference and pin the
edge cases."""

from __future__ import annotations

import math
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.operators.lm import LM_SCALE, bigram_lm_scores

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the cat"),  # repeated bigram "the cat"
    (3, "completely unrelated gibberish tokens here"),
    (4, "the"),        # single token → zero bigrams
    (5, ""),           # empty doc → zero bigrams
    (6, "the cat"),    # exactly one bigram
]


def _py_lm(docs):
    toks = {i: re.findall(r"\w+", t.lower()) for i, t in docs}
    uni = Counter(w for ts in toks.values() for w in ts)
    vocab = len(uni)
    bi = Counter(
        (ts[j], ts[j + 1]) for ts in toks.values() for j in range(len(ts) - 1)
    )
    out = {}
    for i, ts in toks.items():
        pairs = [(ts[j], ts[j + 1]) for j in range(len(ts) - 1)]
        if not pairs:
            out[i] = (0, 0.0)
            continue
        s = sum(
            math.floor(
                math.log((bi[p] + 1.0) / (uni[p[0]] + vocab)) * LM_SCALE + 0.5
            )
            for p in pairs
        )
        out[i] = (len(pairs), math.floor(s / len(pairs) + 0.5) / LM_SCALE)
    return out


def test_bigram_lm_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in bigram_lm_scores(df).collect()
    }
    assert got == _py_lm(DOCS)


def test_bigram_lm_short_docs_report_no_signal(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
    assert got[4].n_bigrams == 0 and got[4].avg_logprob == 0.0
    assert got[5].n_bigrams == 0 and got[5].avg_logprob == 0.0
    assert got[6].n_bigrams == 1


def test_bigram_lm_repeated_bigram_scores_higher(spark):
    """Doc 2 re-uses the corpus's most frequent bigram — its mean
    log-probability must exceed doc 3's one-off token soup."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r.doc_id: r.avg_logprob for r in bigram_lm_scores(df).collect()}
    assert got[2] > got[3]


def test_bigram_lm_stable_under_repartition(spark):
    """Quantize-before-sum makes the score partition-order-free."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = {r.doc_id: r.avg_logprob for r in bigram_lm_scores(df).collect()}
    b = {
        r.doc_id: r.avg_logprob
        for r in bigram_lm_scores(df.repartition(7)).collect()
    }
    assert a == b


def test_perplexity_prune_matches_python_reference(spark):
    from simple_map_reduce_spark.operators.lm import (
        THRESH_SCALE,
        perplexity_prune_report,
    )

    docs = [
        (1, "the cat sat on the mat", "en"),
        (2, "the cat sat on the cat", "en"),
        (3, "completely unrelated gibberish tokens here", "en"),
        (4, "the", "en"),                       # unscored
        (5, "the cat sat on the mat", "fr"),
        (6, "zz yy xx ww vv", "fr"),
        (7, "the cat sat", "fr"),
    ]
    py = _py_lm([(i, t) for i, t, _ in docs])
    by_lang = {}
    for i, _, lang in docs:
        n, avg = py[i]
        if n == 0:
            by_lang.setdefault(lang, {"scored": [], "uns": 0})["uns"] = (
                by_lang.setdefault(lang, {"scored": [], "uns": 0})["uns"] + 1
            )
        else:
            by_lang.setdefault(lang, {"scored": [], "uns": 0})["scored"].append(
                math.floor(avg * THRESH_SCALE + 0.5)
            )
    expect = {}
    for lang, d in by_lang.items():
        qs = sorted(d["scored"], reverse=True)
        if not qs:
            continue
        t = qs[(len(qs) + 1) // 2 - 1]
        expect[lang] = (
            len(qs),
            d["uns"],
            t / THRESH_SCALE,
            sum(1 for x in qs if x >= t),
        )

    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    got = {
        r.lang: (r.n_scored, r.n_unscored, r.threshold, r.n_kept)
        for r in perplexity_prune_report(df).collect()
    }
    assert got == expect


def test_perplexity_prune_keeps_at_least_half(spark):
    docs = [(i, f"tok{i} tok{i+1} tok{i+2}", "en") for i in range(30)]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    from simple_map_reduce_spark.operators.lm import perplexity_prune_report

    row = perplexity_prune_report(df).collect()[0]
    assert row.n_kept * 2 >= row.n_scored  # value threshold keeps ties


def test_cms_lm_sketch_tracks_exact_scores(spark):
    """Accuracy gate for the labeled-approximate LM tier (the HLL/GK
    policy: error-bound pytest instead of a DuckDB oracle). Count-Min
    only OVER-estimates counts, so with a width far above the corpus'
    distinct-bigram count collisions are rare and scores sit near the
    exact tier: n_bigrams must be EXACT (counting needs no model), and
    the score drift bounded."""
    from simple_map_reduce_spark.operators.lm import (
        bigram_lm_scores,
        bigram_lm_scores_sketch,
    )
    from simple_map_reduce_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
    approx = {r.doc_id: r for r in bigram_lm_scores_sketch(docs).collect()}
    assert set(exact) == set(approx)
    assert all(
        approx[d].n_bigrams == exact[d].n_bigrams for d in exact
    ), "n_bigrams is exact by construction"
    scored = [d for d in exact if exact[d].n_bigrams > 0]
    assert scored
    diffs = sorted(
        abs(approx[d].avg_logprob - exact[d].avg_logprob) for d in scored
    )
    # collisions shift ln((c_ab+1)/(c_a+V)) by at most the collision
    # mass; HLL's vocab estimate shifts the smoothing denominator a few
    # percent — both stay well inside these gates at smoke scale
    mean_abs = sum(diffs) / len(diffs)
    assert mean_abs < 0.05, f"mean |Δ| {mean_abs}"
    assert diffs[int(0.95 * len(diffs))] < 0.15, f"p95 |Δ| {diffs[int(0.95*len(diffs))]}"


def test_cms_lm_sketch_scoring_is_broadcast_only(spark):
    """The point of the sketch tier: the scoring pass must contain NO
    vocab-keyed shuffle — every model lookup is a broadcast hash join
    on the bounded CMS tables; the only Exchanges are the CMS builds
    (≤ depth·width groups) and the per-doc aggregate."""
    from simple_map_reduce_spark.operators.lm import (
        CMS_DEPTH,
        bigram_lm_scores_sketch,
    )
    from simple_map_reduce_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        bigram_lm_scores_sketch(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2 * CMS_DEPTH
    # no shuffle keyed on the bigram/unigram text keys (the exact
    # form's posting join shape)
    assert "Exchange hashpartitioning(pair" not in plan
    assert "Exchange hashpartitioning(w1" not in plan
