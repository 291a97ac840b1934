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


def test_md5_slice_embedding_shape_and_determinism(spark):
    """One md5 per row, hex-slice components in [1, 65536], identical
    text → identical vector (the oracle-twinnable embedding contract)."""
    from simple_map_reduce_spark.functions.hashes import md5_slice_embedding

    df = spark.createDataFrame(
        [("alpha beta",), ("alpha beta",), ("",)], ["t"]
    ).select(md5_slice_embedding("t", dims=8).alias("v"))
    rows = [r.v for r in df.collect()]
    assert all(len(v) == 8 for v in rows)
    assert all(1.0 <= x <= 65536.0 for v in rows for x in v)
    assert rows[0] == rows[1]          # deterministic
    assert rows[0] != rows[2]          # content-sensitive
    with pytest.raises(ValueError):
        md5_slice_embedding("t", dims=9)


def test_chunk_vectors_packed_ids(spark):
    from simple_map_reduce_spark.operators.chunking import (
        CHUNK_ID_SPAN,
        chunk_vectors,
    )

    df = spark.createDataFrame(
        [(7, " ".join(f"w{i}" for i in range(40)))], "doc_id bigint, text string"
    )
    rows = chunk_vectors(df, chunk_tokens=32, stride=16).collect()
    assert {r.vec_id for r in rows} == {
        7 * CHUNK_ID_SPAN + r.chunk_id for r in rows
    }
    assert all(r.doc_id == 7 for r in rows)


def test_chunk_ann_doc_topk_rollup_semantics(spark, tmp_path):
    """End-to-end RAG read path on an engineered corpus: a 16-token-
    period document yields identical overlapping windows, so every
    chunk of the twin doc scores cosine 1.0 against the query chunk —
    checking (a) max-sim-per-doc rollup, (b) MIN-chunk tiebreak within
    a doc, (c) doc-id tiebreak across equal-score docs, (d) the query's
    own chunk is excluded but its doc may still be retrieved."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.chunking import chunk_ann_doc_topk

    period = " ".join(f"p{i}" for i in range(16))
    pattern = " ".join([period] * 4)          # 64 tokens, period 16
    other = " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(0, pattern), (200, pattern), (300, other)],
        "doc_id bigint, text string",
    )
    cat = Catalog(spark, str(tmp_path / "cwh"))
    out = chunk_ann_doc_topk(
        docs, cat, "ca_t", [0], k_chunks=10, k_docs=3,
        n_centroids=4, nprobe=2,
    ).collect()
    by_doc = {r.doc_id: r for r in out}
    # doc 0 (the query's own doc): chunks 1,2 are identical to chunk 0,
    # so it retrieves itself at score 1.0 via its SMALLEST non-self chunk
    assert by_doc[0].best_score == 1.0 and by_doc[0].best_chunk_id == 1
    # twin doc 200: all three chunks score 1.0 → min-chunk tiebreak = 0
    assert by_doc[200].best_score == 1.0 and by_doc[200].best_chunk_id == 0
    # equal best_score → doc-id tiebreak orders doc 0 before doc 200
    assert by_doc[0].doc_rank == 1 and by_doc[200].doc_rank == 2
    assert all(r.query_doc == 0 for r in out)
    ranks = sorted(r.doc_rank for r in out)
    assert ranks == list(range(1, len(out) + 1))  # contiguous from 1


def test_chunk_ann_text_topk_free_text_query(spark, tmp_path):
    """The general ANN query path (IvfIndex.search over NEGATIVE
    external ids): a free-text query equal to a doc's window text must
    retrieve that doc's matching chunk at cosine 1.0, and its own
    negative id can never collide with (or hide) a packed chunk id."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.chunking import (
        chunk_ann_text_topk,
        chunk_vectors,
    )
    from simple_map_reduce_spark.operators.similarity import IvfIndex

    period = " ".join(f"p{i}" for i in range(16))
    pattern = " ".join([period] * 4)
    other = " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(0, pattern), (300, other)], "doc_id bigint, text string"
    )
    cat = Catalog(spark, str(tmp_path / "twh"))
    idx = IvfIndex(cat, "txt_t", n_centroids=4, nprobe=2)
    idx.build(chunk_vectors(docs).select("vec_id", "embedding"))

    query = " ".join([period] * 2)  # == every window of the pattern doc
    out = chunk_ann_text_topk(
        spark, cat, "txt_t", [query, "unrelated words entirely"],
        k_chunks=8, k_docs=2, n_centroids=4, nprobe=2,
    ).collect()
    q0 = [r for r in out if r.query_idx == 0]
    by_doc = {r.doc_id: r for r in q0}
    assert by_doc[0].best_score == 1.0 and by_doc[0].best_chunk_id == 0
    assert by_doc[0].doc_rank == 1
    # the second query exists and ranks contiguously from 1
    q1 = sorted(r.doc_rank for r in out if r.query_idx == 1)
    assert q1 and q1[0] == 1


def test_chunk_semantic_ingest_gates_duplicate_spans(spark, tmp_path):
    """Span-level semantic dedup on ingest: a batch doc repeating an
    INDEXED doc's 16-token period has every chunk rejected as a corpus
    match (identical window text → md5 vectors at cosine 1.0); an
    intra-batch twin pair rejects the larger doc's chunks as batch
    matches; novel text is admitted into the index tables."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.chunking import (
        CHUNK_ID_SPAN,
        chunk_vectors,
    )
    from simple_map_reduce_spark.operators.similarity import IvfIndex

    period = " ".join(f"p{i}" for i in range(16))
    pattern = " ".join([period] * 4)
    novel = " ".join(f"n{i}" for i in range(40))
    twin = " ".join(f"t{i}" for i in range(16)) + " " + " ".join(f"t{i}" for i in range(16))
    cat = Catalog(spark, str(tmp_path / "cswh"))
    idx = IvfIndex(cat, "cs_t", n_centroids=4)
    idx.build(
        chunk_vectors(
            spark.createDataFrame([(1, pattern)], "doc_id bigint, text string")
        ).select("vec_id", "embedding")
    )
    batch = spark.createDataFrame(
        [(100, pattern), (200, novel), (300, twin), (400, twin)],
        "doc_id bigint, text string",
    )
    report = idx.ingest(
        chunk_vectors(batch).select("vec_id", "embedding"), tau=0.999
    ).collect()
    by = {}
    for r in report:
        by.setdefault(r.vec_id // CHUNK_ID_SPAN, []).append(r)
    # every chunk of the corpus-duplicate doc is rejected: chunk 0 as a
    # corpus match; its identical chunks 1,2 additionally as intra-batch
    # duplicates of chunk 0 (the min-id chain — both classes are right)
    assert {r.vec_id % CHUNK_ID_SPAN for r in by[100]} == {0, 1, 2}
    corpus_rows = [r for r in by[100] if r.matched_in == "corpus"]
    assert corpus_rows and all(
        r.kept_id // CHUNK_ID_SPAN == 1 for r in corpus_rows
    )
    batch_rows = [r for r in by[100] if r.matched_in == "batch"]
    assert all(r.kept_id == 100 * CHUNK_ID_SPAN for r in batch_rows)
    # intra-batch twins: the larger doc's chunks reject as 'batch'
    assert {r.matched_in for r in by[400]} == {"batch"}
    assert all(r.kept_id // CHUNK_ID_SPAN == 300 for r in by[400])
    # novel doc fully admitted (no report rows), lands in the index
    assert 200 not in by
    stored_docs = {
        r.id // CHUNK_ID_SPAN
        for r in cat.get_bucketed(idx.vectors_table).select("id").collect()
    }
    assert 200 in stored_docs and 100 not in stored_docs
