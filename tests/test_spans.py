"""Unit tests for span-level exact dedup (operators/spans.py) and the
deterministic corpus shuffle (operators/sampling.shuffle_positions),
each against a plain-Python reference implementation."""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.operators.sampling import shuffle_positions
from simple_map_reduce_spark.operators.spans import doc_spans, span_dedup


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _ref_span_dedup(docs: list[tuple[int, str]], w: int) -> dict[int, tuple[int, int, str]]:
    """Python reference: (doc_id -> (n_spans, kept_spans, clean_md5))."""
    spans: list[tuple[int, int, str]] = []
    for did, text in docs:
        toks = text.split()
        for p in range((len(toks) + w - 1) // w):
            spans.append((did, p, " ".join(toks[p * w : (p + 1) * w])))
    first: dict[str, tuple[int, int]] = {}
    for did, p, s in sorted(spans):
        first.setdefault(s, (did, p))
    out: dict[int, tuple[int, int, str]] = {}
    for did, text in docs:
        toks = text.split()
        n = (len(toks) + w - 1) // w
        kept = [
            " ".join(toks[p * w : (p + 1) * w])
            for p in range(n)
            if first[" ".join(toks[p * w : (p + 1) * w])] == (did, p)
        ]
        out[did] = (n, len(kept), _md5(" ".join(kept)))
    return out


DOCS = [
    (1, "a b c d e f g"),          # 3 spans of 3/3/1 tokens at w=3
    (2, "x y z a b c"),            # its "a b c" span duplicates doc 1's first
    (3, "a b c d e f"),            # BOTH spans already seen in doc 1? no —
                                   # doc 1's spans are "a b c","d e f","g";
                                   # doc 3 = "a b c","d e f" → fully deduped
    (4, "  a   b  c   "),          # whitespace runs: same "a b c" span
    (5, ""),                       # empty text: zero spans, md5('')
    (6, "q r"),                    # single short span, unique
]


def test_span_dedup_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_spans"], r["kept_spans"], r["clean_md5"])
        for r in span_dedup(df, "doc_id", "text", span_tokens=3).collect()
    }
    assert got == _ref_span_dedup(DOCS, 3)


def test_span_dedup_fully_duplicated_doc_keeps_nothing(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in span_dedup(df, "doc_id", "text", 3).collect()}
    assert got[3]["kept_spans"] == 0
    assert got[3]["clean_md5"] == _md5("")
    assert got[5]["n_spans"] == 0 and got[5]["clean_md5"] == _md5("")
    # every input id survives to the output
    assert set(got) == {d for d, _ in DOCS}


def test_first_occurrence_is_doc_then_pos_ordered(spark):
    # the same span in two docs: lower doc_id wins regardless of pos
    docs = [(10, "p q r s s s"), (2, "zz zz zz s s s")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in span_dedup(df, "doc_id", "text", 3).collect()}
    # doc 2 holds the first occurrence of "s s s" (doc order, not input order)
    assert got[2]["kept_spans"] == 2
    assert got[10]["kept_spans"] == 1
    assert got[10]["clean_md5"] == _md5("p q r")


def test_doc_spans_short_tail_and_empty(spark):
    df = spark.createDataFrame([(1, "a b c d e"), (2, "")], ["doc_id", "text"])
    rows = doc_spans(df, "doc_id", "text", span_tokens=2).collect()
    got = {(r["doc_id"], r["pos"]): r["span_text"] for r in rows}
    assert got[(1, 0)] == "a b" and got[(1, 1)] == "c d" and got[(1, 2)] == "e"
    assert got[(2, None)] is None  # posexplode_outer keeps the empty doc


def test_shuffle_positions_matches_global_md5_order(spark):
    ids = list(range(40))
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r["shuffle_pos"]
        for r in shuffle_positions(df, "doc_id").collect()
    }
    ref_order = sorted(ids, key=lambda i: (_md5(str(i)), i))
    assert got == {did: pos for pos, did in enumerate(ref_order)}
    # positions are a permutation of 0..n-1
    assert sorted(got.values()) == ids


def test_shuffle_positions_stable_under_repartition(spark):
    df = spark.createDataFrame([(i,) for i in range(64)], ["doc_id"])
    a = {r["doc_id"]: r["shuffle_pos"] for r in shuffle_positions(df, "doc_id").collect()}
    b = {
        r["doc_id"]: r["shuffle_pos"]
        for r in shuffle_positions(df.repartition(7), "doc_id").collect()
    }
    assert a == b


def test_shuffle_positions_grouped_restarts_per_group(spark):
    """group_cols: positions are the md5 rank WITHIN each group, each
    group starting at 0 — and match the ungrouped rank computed over
    each group's rows alone."""
    import hashlib

    rows = [(i, "even" if i % 2 == 0 else "odd") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    got = {
        (r.grp, r.doc_id): r.shuffle_pos
        for r in shuffle_positions(df, "doc_id", group_cols=["grp"]).collect()
    }
    for grp in ("even", "odd"):
        ids = [i for i, g in rows if g == grp]
        expect = {
            d: p
            for p, d in enumerate(
                sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
            )
        }
        assert {d: got[(grp, d)] for d in ids} == expect


def test_shuffle_positions_ungrouped_unchanged_by_group_extension(spark):
    """The default path must produce the identical global rank it did
    before group_cols existed (corpus_shuffle's oracle depends on it)."""
    import hashlib

    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id bigint")
    got = {r.doc_id: r.shuffle_pos for r in shuffle_positions(df, "doc_id").collect()}
    expect = {
        d: p
        for p, d in enumerate(
            sorted(range(40), key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        )
    }
    assert got == expect


def test_shuffle_positions_null_group_raises(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "doc_id bigint, grp string"
    )
    with _pytest.raises(Exception, match="NULL group"):
        shuffle_positions(df, "doc_id", group_cols=["grp"]).collect()
