"""Accuracy gates for the approximate-sketch tier (vocab_sketch,
value_quantiles_sketch): no duckdb oracle (different approx algorithms),
so correctness = bounded error against the exact tier at sf0.01."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.queries import QUERIES
from simple_map_reduce_spark.sources.readers import load_table
from tests.conftest import SF_ORACLE


def test_vocab_sketch_within_hll_error(spark):
    approx = {
        r.lang: (r.approx_vocab, r.n_tokens)
        for r in QUERIES["vocab_sketch"](spark, SF_ORACLE).collect()
    }
    from simple_map_reduce_spark.operators.aggregates import TOKEN_RE

    docs = load_table(spark, SF_ORACLE, "documents")
    exact = {
        r.lang: (r.exact_vocab, r.n_tokens)
        for r in docs.select(
            "lang",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), F.lit(0))
            ).alias("word"),
        )
        .groupBy("lang")
        .agg(
            F.countDistinct("word").alias("exact_vocab"),
            F.count("*").alias("n_tokens"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for lang, (a, nt) in approx.items():
        e, nt_e = exact[lang]
        assert nt == nt_e  # the exact companion column must be exact
        # rsd=0.02 → 3-sigma bound 6%
        assert abs(a - e) <= 0.06 * e, (lang, a, e)


def test_value_quantiles_sketch_close_to_exact(spark):
    approx = {
        r.event_type: (r.p25, r.p50, r.p75)
        for r in QUERIES["value_quantiles_sketch"](spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    for etype, (p25, p50, p75) in approx.items():
        vals = sorted(
            r.value for r in ev.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)
        for p, got in [(0.25, p25), (0.5, p50), (0.75, p75)]:
            # rank-error bound: within 1% of n positions of the true rank
            lo = vals[max(0, int((p - 0.01) * n) - 1)]
            hi = vals[min(n - 1, int((p + 0.01) * n) + 1)]
            assert lo <= got <= hi, (etype, p, got, lo, hi)
