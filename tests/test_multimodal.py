"""Multimodal plumbing tests: real schemas, Arrow batching, UDTF shapes —
the decode bodies are stubs (no media libs in this container), but
everything Spark-side must behave exactly as with a real decoder."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.multimodal import (
    _fake_dims,
    attach_binary,
    decode_audio_features,
    decode_image_features,
    resize_images,
    sample_frames,
)


def _media(spark):
    df = spark.createDataFrame(
        [(1, "some image bytes"), (2, "other payload here")], ["doc_id", "payload"]
    )
    return attach_binary(df, "doc_id", "payload", "image/png")


def test_attach_binary_schema_and_meta(spark):
    media = _media(spark)
    assert [f.dataType.simpleString() for f in media.schema.fields] == [
        "bigint",
        "binary",
        "string",
        "struct<byte_len:bigint,content_md5:string>",
    ]
    row = media.filter(F.col("doc_id") == 1).collect()[0]
    assert bytes(row["content"]) == b"some image bytes"
    assert row["meta"]["byte_len"] == 16


def test_metadata_filter_without_decode(spark):
    """Filters on the metadata struct are Catalyst predicates — no Python,
    no blob deserialization."""
    media = _media(spark)
    out = media.filter(F.col("meta.byte_len") > 16)
    assert "mapInPandas" not in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 1


def test_image_decode_stub_is_deterministic(spark):
    media = _media(spark)
    a = {r["doc_id"]: (r["width"], r["height"], r["n_channels"]) for r in decode_image_features(media).collect()}
    b = {r["doc_id"]: (r["width"], r["height"], r["n_channels"]) for r in decode_image_features(media).collect()}
    assert a == b and set(a) == {1, 2}
    feats = decode_image_features(media).collect()[0]["feature"]
    assert len(feats) == 4 and all(0.0 <= f <= 1.0 for f in feats)


def test_strict_mode_raises_not_implemented(spark):
    media = _media(spark)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)) as exc:
        decode_image_features(media, strict=True).collect()
    assert "NotImplementedError" in str(exc.value)


def test_audio_stub_schema(spark):
    out = decode_audio_features(_media(spark))
    assert out.columns == ["doc_id", "sample_rate", "n_samples", "rms"]
    assert out.count() == 2


def test_resize_aspect_fit_invariants(spark):
    """Aspect-fit contract: long side pinned to target, short side
    floor-scaled, orientation preserved, never zero."""
    media = _media(spark)
    out = {r["doc_id"]: (r["out_w"], r["out_h"]) for r in resize_images(media, target=64).collect()}
    dims = {
        r["doc_id"]: _fake_dims(bytes(r["content"]))[:2]
        for r in media.select("doc_id", "content").collect()
    }
    for doc_id, (w, h) in dims.items():
        ow, oh = out[doc_id]
        assert max(ow, oh) == 64 and min(ow, oh) >= 1
        assert (w >= h) == (ow >= oh)  # orientation preserved
        if w >= h:
            assert oh == h * 64 // w
        else:
            assert ow == w * 64 // h


def test_frame_sampling_is_udtf_shaped(spark):
    """0..n output rows per input row."""
    out = sample_frames(_media(spark), every_n=5)
    assert out.columns == ["doc_id", "frame_idx", "frame"]
    per_doc = {r["doc_id"]: r["cnt"] for r in out.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    assert all(c >= 1 for c in per_doc.values())
