"""Property-based tests (hypothesis) for the text/dedup [EXT] functions —
the SURVEY.md §5 adopted-strategy item (d). Spark round-trips per example
are expensive, so examples are capped and batched into one DataFrame per
property run.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from simple_map_reduce_spark.functions.text import (
    BPE_RE,
)

# printable ASCII only: Python's \s is Unicode-aware and treats
# \x1c-\x1f as whitespace, Java/RE2 don't. Spark and the DuckDB oracle
# AGREE on those chars (both ASCII-\s), so the engine is consistent —
# it's the Python reference below that diverges outside printable ASCII.
TEXT = st.text(
    alphabet=st.characters(codec="ascii", exclude_categories=["Cc"]),
    min_size=0,
    max_size=200,
)


@given(st.lists(TEXT, min_size=1, max_size=20))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_tokenize_matches_python_re(spark_global, texts):
    """Spark tokenization ≡ re.findall(r'\\w+', s.lower()) for ASCII."""
    from simple_map_reduce_spark.functions.text import tokenize

    df = spark_global.createDataFrame([(t,) for t in texts], ["text"])
    got = [r["toks"] for r in df.select(tokenize("text").alias("toks")).collect()]
    want = [re.findall(r"\w+", t.lower()) for t in texts]
    assert got == want


@given(st.lists(TEXT, min_size=1, max_size=20))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_bpe_count_matches_python_re(spark_global, texts):
    from simple_map_reduce_spark.functions.text import token_count_bpe

    df = spark_global.createDataFrame([(t,) for t in texts], ["text"])
    got = [r["n"] for r in df.select(token_count_bpe("text").alias("n")).collect()]
    want = [len(re.findall(BPE_RE, t)) for t in texts]
    assert got == want


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=2, max_size=8))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_exact_dedup_partitions_input(spark_global, texts):
    """Representative count == distinct contents; dup_counts sum to n."""
    from simple_map_reduce_spark.operators.dedup import exact_dedup

    df = spark_global.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = exact_dedup(df, "text", "doc_id").collect()
    assert len(rows) == len(set(texts))
    assert sum(r["dup_count"] for r in rows) == len(texts)


# session-scoped spark fixture shared with conftest but under a name the
# @given-wrapped tests can use without fixture-per-example teardown cost
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


@given(st.integers(min_value=0, max_value=(1 << 60) - 1), st.integers(0, 15))
@settings(max_examples=50, deadline=None)
def test_minhash_mix_overflow_safe_and_duckdb_exact(h, i):
    """The universal-hash mix must (a) keep every intermediate < 2^63 so
    DuckDB's overflow-checking int64 arithmetic never raises, (b) land in
    [0, P), and (c) evaluate to the identical value through the generated
    DuckDB SQL — the property the oracle twins rely on."""
    import duckdb

    from simple_map_reduce_spark.functions.hashes import (
        MINHASH_PRIME,
        duckdb_minhash_mix,
        minhash_params,
    )

    a, b, c = minhash_params(i)
    hi, lo = h >> 30, h & ((1 << 30) - 1)
    assert a * hi + b * lo + c < (1 << 63)
    expected = (a * hi + b * lo + c) % MINHASH_PRIME
    assert 0 <= expected < MINHASH_PRIME
    got = duckdb.sql(f"SELECT {duckdb_minhash_mix(str(h), i)}").fetchone()[0]
    assert got == expected
