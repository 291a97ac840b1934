from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
)


def test_quality_features_and_guards(spark):
    df = spark.createDataFrame([(1, "The cat and the dog!"), (2, "")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in quality_score(df).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 5
    assert r1["n_punct"] == 1
    assert r1["n_stopwords"] == 3  # the, and, the
    assert 0.0 <= r1["quality"] <= 1.0
    r2 = out[2]  # empty doc: guarded ratios, no NULL/NaN
    assert r2["punct_ratio"] == 0.0 and r2["stopword_ratio"] == 0.0
    assert r2["quality"] is not None


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is happy"),
            (2, "el gato de la casa y los perros"),
            (3, "le chien et le chat dans les maisons des gens"),
            (4, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "fr", 4: "und"}


def test_fingerprint_normalizes_formatting(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "other text")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]  # same token stream → same fingerprint
    assert fps[1] != fps[3]


def test_redact_pii_scrubs_emails_and_phones(spark):
    from simple_map_reduce_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+spam@example.co.uk or call 555-123-4567"),
            (2, "no pii in this document at all"),
            (3, "two mails: a@b.io c_d%x@sub.domain.org and 123.456.7890"),
        ],
        ["doc_id", "text"],
    )
    n_e, n_p = pii_counts("text")
    out = {
        r["doc_id"]: (r["e"], r["p"], r["clean"])
        for r in df.select(
            "doc_id", n_e.alias("e"), n_p.alias("p"), redact_pii("text").alias("clean")
        ).collect()
    }
    assert out[1][:2] == (1, 1)
    assert out[1][2] == "mail me at <EMAIL> or call <PHONE>"
    assert out[2] == (0, 0, "no pii in this document at all")
    assert out[3][:2] == (2, 1)
    assert "<EMAIL>" in out[3][2] and "<PHONE>" in out[3][2]
    assert "@" not in out[3][2]


def test_chunk_assignment_packing_invariants(spark):
    """Concatenate-and-chunk: offsets advance by token count within a
    language stream, wrap modulo the window, and chunk ids never
    decrease in doc order."""
    from simple_map_reduce_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    rows = sorted(
        QUERIES["chunk_assignment"](spark, SF_SMOKE).collect(),
        key=lambda r: (r["lang"], r["doc_id"]),
    )
    from itertools import groupby

    for _, grp in groupby(rows, key=lambda r: r["lang"]):
        start = 0
        for r in grp:
            assert r["chunk_id"] == start // 512
            assert r["chunk_offset"] == start % 512
            start += r["n_tokens"]
