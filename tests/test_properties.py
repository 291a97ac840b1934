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
    """The permutation mix must (a) keep every intermediate < 2^63 so
    DuckDB's overflow-checking int64 arithmetic never raises, (b) land in
    [0, 2^61), and (c) evaluate to the identical value through the
    generated DuckDB SQL — the property the oracle twins rely on. The
    expected value is the r9 two-round avalanche reference (affine →
    xor-shift → affine → xor-shift) computed independently in Python."""
    import duckdb

    from simple_map_reduce_spark.functions.hashes import (
        MINHASH_PRIME,
        duckdb_minhash_mix,
        minhash_params,
        minhash_params2,
    )

    m30 = (1 << 30) - 1
    a, b, c = minhash_params(i)
    a2, b2, c2 = minhash_params2(i)
    hi, lo = h >> 30, h & m30
    assert a * hi + b * lo + c < (1 << 63)
    u = (a * hi + b * lo + c) % MINHASH_PRIME
    v = u ^ (u >> 31)
    # round 2's high half is 31 bits (v < 2^61), so the sum still fits
    assert a2 * (v >> 30) + b2 * (v & m30) + c2 < (1 << 63)
    w = (a2 * (v >> 30) + b2 * (v & m30) + c2) % MINHASH_PRIME
    expected = w ^ (w >> 29)
    assert 0 <= expected < (1 << 61)
    got = duckdb.sql(f"SELECT {duckdb_minhash_mix(str(h), i)}").fetchone()[0]
    assert got == expected


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=10
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_span_dedup_matches_reference_on_random_docs(spark_global, texts):
    """span_dedup ≡ the Python reference for arbitrary tiny-alphabet
    docs (heavy span collisions by construction), and the corpus keeps
    each distinct span text exactly once."""
    from tests.test_spans import _ref_span_dedup

    docs = list(enumerate(texts))
    df = spark_global.createDataFrame(docs, ["doc_id", "text"])
    from simple_map_reduce_spark.operators.spans import span_dedup

    rows = span_dedup(df, "doc_id", "text", span_tokens=2).collect()
    got = {r["doc_id"]: (r["n_spans"], r["kept_spans"], r["clean_md5"]) for r in rows}
    assert got == _ref_span_dedup(docs, 2)
    distinct_spans = {
        " ".join(t.split()[p * 2 : (p + 1) * 2])
        for _, t in docs
        for p in range((len(t.split()) + 1) // 2)
    }
    assert sum(k for _, k, _ in got.values()) == len(distinct_spans)


@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_shuffle_positions_is_md5_rank_for_any_keys(spark_global, keys):
    """shuffle_positions ≡ rank in (md5(str(key)), key) order, a
    permutation of 0..n-1, for arbitrary bigint keys."""
    import hashlib

    from simple_map_reduce_spark.operators.sampling import shuffle_positions

    df = spark_global.createDataFrame([(k,) for k in keys], ["doc_id"])
    got = {
        r["doc_id"]: r["shuffle_pos"]
        for r in shuffle_positions(df, "doc_id").collect()
    }
    order = sorted(keys, key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k))
    assert got == {k: i for i, k in enumerate(order)}


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),   # doc_id (dups dropped below)
            st.sampled_from(["en", "fr", "de"]),
            st.integers(min_value=0, max_value=1500),  # n_tokens
        ),
        min_size=1,
        max_size=30,
    ),
    st.sampled_from([1, 2, 3, 7, 1000]),               # shard span
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_sharded_packing_equivalence_property(spark_global, rows, span):
    """chunk_assignment_sharded ≡ chunk_assignment for ANY ids/langs/
    token counts and ANY shard span, and both ≡ a Python prefix-sum
    reference — the invariant behind using the single-window form as the
    sharded scale tier's oracle."""
    from simple_map_reduce_spark.operators.packing import (
        chunk_assignment,
        chunk_assignment_sharded,
    )

    uniq = {}
    for i, lang, n in rows:
        uniq[i] = (lang, n)
    data = [(i, lang, n) for i, (lang, n) in sorted(uniq.items())]
    df = spark_global.createDataFrame(
        data, "doc_id bigint, lang string, n_tokens bigint"
    )
    base = {
        r["doc_id"]: (r["chunk_id"], r["chunk_offset"])
        for r in chunk_assignment(df, chunk_tokens=512).collect()
    }
    sharded = {
        r["doc_id"]: (r["chunk_id"], r["chunk_offset"])
        for r in chunk_assignment_sharded(df, chunk_tokens=512, span=span).collect()
    }
    assert sharded == base
    # Python reference: per-lang exclusive prefix sum in id order
    start, want = {}, {}
    for i, lang, n in data:
        s = start.get(lang, 0)
        want[i] = (s // 512, s % 512)
        start[lang] = s + n
    assert base == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # label
            st.lists(
                st.floats(
                    min_value=-2.0, max_value=2.0,
                    allow_nan=False, allow_infinity=False, width=32,
                ),
                min_size=4, max_size=4,
            ),
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_label_centroids_match_python_reference(spark_global, rows):
    """The quantized-exact centroid mean ≡ a bit-for-bit Python
    reference: floor(x·1e6 + 0.5) integer sums per (label, dim), the
    quotient re-quantized the same way — Python floats ARE IEEE doubles,
    so any divergence is an engine bug, not noise."""
    import math

    from simple_map_reduce_spark.operators.similarity import label_centroids

    data = [(i, vec, lab) for i, (lab, vec) in enumerate(rows)]
    df = spark_global.createDataFrame(data, "vec_id bigint, embedding array<float>, label int")
    got = {
        r["centroid_label"]: r["cvec"]
        for r in label_centroids(df).collect()
    }
    # reference: float32 storage round-trip, then exact integer means
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    sums, counts = {}, {}
    for _, vec, lab in data:
        counts[lab] = counts.get(lab, 0) + 1
        for d, x in enumerate(vec):
            sums[(lab, d)] = sums.get((lab, d), 0) + math.floor(f32(x) * 1e6 + 0.5)
    want = {
        lab: [
            float(math.floor(sums[(lab, d)] / counts[lab] + 0.5)) / 1e6
            for d in range(4)
        ]
        for lab in counts
    }
    assert got == want


def test_shuffle_positions_rejects_null_keys(spark_global):
    """A NULL shuffle key would hash to a NULL shard and silently vanish
    in the offsets join — the operator must fail loudly instead."""
    import pytest as _pytest

    from simple_map_reduce_spark.operators.sampling import shuffle_positions

    df = spark_global.createDataFrame([(1,), (None,)], "k bigint")
    with _pytest.raises(Exception, match="must be non-null"):
        shuffle_positions(df, "k").collect()


@given(
    st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=24),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_bpe_train_matches_reference_on_random_corpora(spark_global, texts, k):
    """Random tiny-alphabet corpora maximize merge collisions (repeated
    symbols, overlapping runs, merges-of-merges) — the learned merge
    sequence must match the pure-Python greedy reference exactly."""
    from simple_map_reduce_spark.operators.bpe import bpe_train
    from tests.test_bpe import _py_bpe

    df = spark_global.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_cnt)
        for r in bpe_train(df, "text", num_merges=k).orderBy("merge_rank").collect()
    ]
    want, _ = _py_bpe(texts, k)
    assert got == want, (texts, k, got, want)


@given(
    st.lists(
        st.lists(st.integers(min_value=-3, max_value=3), min_size=3, max_size=3),
        min_size=3,
        max_size=10,
    ),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_semdedup_matches_python_reference(spark_global, vecs):
    """Prune set ≡ a pure-Python cluster-then-prune reference on random
    small-integer vectors. Examples whose cosines sit within 1e-6 of the
    threshold or of an assignment tie are discarded (rounding at the 6th
    decimal is the engines' contract; the reference does not replicate
    Spark's HALF_UP repr rounding)."""
    import math

    from hypothesis import assume

    from simple_map_reduce_spark.operators.similarity import (
        kmeans_refine,
        semdedup_prune,
    )

    vecs = [v for v in vecs if any(x != 0 for x in v)]
    assume(len(vecs) >= 3)
    tau, k = 0.9, 2
    norms = [math.sqrt(sum(x * x for x in v)) for v in vecs]

    def cos(i, j):
        d = sum(a * b for a, b in zip(vecs[i], vecs[j]))
        return d / (norms[i] * norms[j])

    # seeds = first k ids; assignment by max cosine, centroid-id tiebreak
    seeds = list(range(k))
    assign = {}
    for i in range(len(vecs)):
        sims = [cos(i, s) for s in seeds]
        best = max(sims)
        assume(sum(1 for s in sims if abs(s - best) < 1e-6) == 1)
        assign[i] = sims.index(best)
    for i in range(len(vecs)):
        for j in range(i):
            if assign[i] == assign[j]:
                assume(abs(cos(i, j) - tau) > 1e-6)
    want = {}
    for i in range(len(vecs)):
        js = [
            j for j in range(i) if assign[j] == assign[i] and cos(i, j) >= tau
        ]
        if js:
            want[i] = min(js)

    emb = spark_global.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )
    cents = kmeans_refine(emb, n_centroids=k, iters=0)
    got = {
        r.vec_id: r.kept_id
        for r in semdedup_prune(emb, tau=tau, centroids=cents).collect()
    }
    assert got == want, (vecs, assign, got, want)


@given(
    st.lists(
        st.integers(min_value=0, max_value=60), min_size=1, max_size=6
    ),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_token_chunks_matches_reference_on_random_docs(
    spark_global, token_counts, stride
):
    """token_chunks ≡ the pure-Python window reference for any doc
    lengths, any (chunk_tokens ≥ stride) pair — including n == 0, exact
    multiples, and single-window docs."""
    from simple_map_reduce_spark.operators.chunking import token_chunks

    chunk_tokens = stride + (token_counts[0] % 7)  # ≥ stride, varied
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(n)))
        for i, n in enumerate(token_counts)
    ]
    df = spark_global.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
        for r in token_chunks(
            df, chunk_tokens=chunk_tokens, stride=stride
        ).collect()
    )
    want = []
    for i, text in docs:
        t = text.split()
        n = len(t)
        nc = 1 if n <= chunk_tokens else 1 + (n - chunk_tokens + stride - 1) // stride
        for c in range(nc):
            want.append(
                (
                    i,
                    c,
                    max(0, min(chunk_tokens, n - c * stride)),
                    " ".join(t[c * stride : c * stride + chunk_tokens]),
                )
            )
    assert got == sorted(want)


@given(
    st.dictionaries(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=1, max_value=30),
        ),
        st.integers(min_value=1, max_value=10),
        min_size=1,
        max_size=20,
    ),
    st.dictionaries(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=1, max_value=30),
        ),
        st.integers(min_value=1, max_value=10),
        min_size=1,
        max_size=20,
    ),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_rrf_fuse_matches_reference_on_random_runs(spark_global, run_a, run_b):
    """rrf_fuse ≡ the pure-Python RRF for arbitrary (possibly
    overlapping, possibly rank-duplicated) run pairs."""
    from simple_map_reduce_spark.operators.retrieval import RRF_K, rrf_fuse

    def df_of(run):
        return spark_global.createDataFrame(
            [(q, d, r) for (q, d), r in run.items()],
            "query_id bigint, doc_id bigint, rank bigint",
        )

    got = sorted(
        map(tuple, rrf_fuse(df_of(run_a), df_of(run_b), k=5).collect())
    )
    want = []
    for qid in {q for q, _ in list(run_a) + list(run_b)}:
        rows = []
        for d in {d for q, d in list(run_a) + list(run_b) if q == qid}:
            ra, rb = run_a.get((qid, d), 0), run_b.get((qid, d), 0)
            score = (1.0 / (RRF_K + ra) if ra else 0.0) + (
                1.0 / (RRF_K + rb) if rb else 0.0
            )
            rows.append((d, ra, rb, score))
        rows.sort(key=lambda r: (-r[3], r[0]))
        want += [
            (qid, d, ra, rb, s, i + 1)
            for i, (d, ra, rb, s) in enumerate(rows[:5])
        ]
    assert got == sorted(want)


@given(
    st.lists(
        st.lists(st.integers(min_value=-3, max_value=3), min_size=3, max_size=3),
        min_size=3,
        max_size=10,
    ),
    st.data(),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_semdedup_keep_best_matches_python_reference(spark_global, vecs, data):
    """Keep-best prune ≡ a pure-Python dominance reference on random
    small-integer vectors with random integer qualities: i is pruned
    when some same-cluster tau-neighbor j dominates it by (q, -id), and
    kept_id is the (q, -id)-max dominator. Same near-threshold/
    near-tie discards as the min-id sibling above."""
    import math

    from hypothesis import assume

    from simple_map_reduce_spark.operators.similarity import (
        kmeans_refine,
        semdedup_keep_best,
    )

    vecs = [v for v in vecs if any(x != 0 for x in v)]
    assume(len(vecs) >= 3)
    qual = [
        data.draw(st.integers(min_value=0, max_value=5)) for _ in vecs
    ]
    tau, k = 0.9, 2
    norms = [math.sqrt(sum(x * x for x in v)) for v in vecs]

    def cos(i, j):
        d = sum(a * b for a, b in zip(vecs[i], vecs[j]))
        return d / (norms[i] * norms[j])

    seeds = list(range(k))
    assign = {}
    for i in range(len(vecs)):
        sims = [cos(i, s) for s in seeds]
        best = max(sims)
        assume(sum(1 for s in sims if abs(s - best) < 1e-6) == 1)
        assign[i] = sims.index(best)
    for i in range(len(vecs)):
        for j in range(i):
            if assign[i] == assign[j]:
                assume(abs(cos(i, j) - tau) > 1e-6)
    # dominance reference: (q, -id) strict total order
    want = {}
    for i in range(len(vecs)):
        doms = [
            j
            for j in range(len(vecs))
            if j != i
            and assign[j] == assign[i]
            and cos(i, j) >= tau
            and (qual[j], -j) > (qual[i], -i)
        ]
        if doms:
            want[i] = max(doms, key=lambda j: (qual[j], -j))

    emb = spark_global.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )
    qdf = spark_global.createDataFrame(
        [(i, q) for i, q in enumerate(qual)], ["vec_id", "q"]
    )
    cents = kmeans_refine(emb, n_centroids=k, iters=0)
    got = {
        r.vec_id: r.kept_id
        for r in semdedup_keep_best(emb, qdf, tau=tau, centroids=cents).collect()
    }
    assert got == want, (vecs, qual, assign, got, want)
