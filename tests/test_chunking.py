"""Behavioral tests for RAG token-window chunking
(operators/chunking.py) against a pure-Python reference, plus the
window-overlap invariants a retrieval pipeline depends on."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.operators.chunking import token_chunks


def _py_chunks(text, w, s):
    t = text.split()
    n = len(t)
    nc = 1 if n <= w else 1 + (n - w + s - 1) // s
    return [
        (i, max(0, min(w, n - i * s)), " ".join(t[i * s : i * s + w]))
        for i in range(nc)
    ]


# token counts straddling every window boundary for (w=8, s=4)
@pytest.mark.parametrize("n_tokens", [0, 1, 7, 8, 9, 12, 13, 16, 17, 40])
def test_token_chunks_matches_python_reference(spark, n_tokens):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = sorted(
        (r.chunk_id, r.n_tokens, r.chunk_text)
        for r in token_chunks(df, chunk_tokens=8, stride=4).collect()
    )
    assert got == _py_chunks(text, 8, 4)


def test_adjacent_chunks_overlap_by_window_minus_stride(spark):
    text = " ".join(f"t{i}" for i in range(40))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        token_chunks(df, chunk_tokens=8, stride=4).collect(),
        key=lambda r: r.chunk_id,
    )
    for a, b in zip(rows, rows[1:]):
        ta, tb = a.chunk_text.split(), b.chunk_text.split()
        assert ta[4:] == tb[: len(ta) - 4]  # suffix of a == prefix of b


def test_non_overlapping_chunks_reassemble_document(spark):
    """stride == chunk_tokens partitions the token stream exactly —
    rejoining the chunks in order reproduces the document."""
    text = " ".join(f"t{i}" for i in range(21))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        token_chunks(df, chunk_tokens=8, stride=8).collect(),
        key=lambda r: r.chunk_id,
    )
    assert " ".join(r.chunk_text for r in rows) == text


def test_every_doc_appears_even_empty(spark):
    df = spark.createDataFrame([(1, ""), (2, "one two")], ["doc_id", "text"])
    rows = token_chunks(df, chunk_tokens=8, stride=4).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert by_doc[1].n_tokens == 0 and by_doc[1].chunk_text == ""
    assert by_doc[2].n_tokens == 2


def test_invalid_params_raise():
    with pytest.raises(ValueError):
        token_chunks(None, chunk_tokens=8, stride=0)
    with pytest.raises(ValueError):
        token_chunks(None, chunk_tokens=8, stride=9)


def test_null_text_doc_still_appears(spark):
    """NULL text must behave like empty text — the doc stays in the
    chunk table instead of silently exiting the retrieval corpus."""
    df = spark.createDataFrame(
        [(1, "one two"), (2, None)], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in token_chunks(df, chunk_tokens=4, stride=2).collect()}
    assert rows[2].chunk_id == 0 and rows[2].n_tokens == 0 and rows[2].chunk_text == ""
