"""REAL decoders behind the multimodal contract (VERDICT r7 item 6):
RIFF/WAV and PPM/PGM parse actual bytes through the same mapInPandas
Arrow path as the deterministic-fake tier — hand-built fixtures with
known samples/pixels give exact expected features."""

from __future__ import annotations

import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from simple_map_reduce_spark.multimodal import (
    _parse_pnm,
    _parse_wav,
    decode_ppm_features,
    decode_wav_features,
)


def _wav16(samples, sample_rate=8000, n_channels=1, pre_chunks=b""):
    """Minimal RIFF/WAVE with 16-bit PCM ``samples`` (interleaved if
    multi-channel). ``pre_chunks`` injects extra chunks between fmt and
    data (real writers emit LIST/fact there)."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += pre_chunks + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav8(samples_u8, sample_rate=11025):
    data = bytes(samples_u8)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parse_wav_pcm16_exact_rms():
    # samples ±16384 → normalized ±0.5 → rms exactly 0.5
    payload = _wav16([16384, -16384, 16384, -16384], sample_rate=16000)
    sr, nch, n, rms = _parse_wav(payload)
    assert (sr, nch, n) == (16000, 1, 4)
    assert rms == pytest.approx(0.5, abs=1e-12)


def test_parse_wav_stereo_and_extra_chunks():
    # a LIST chunk between fmt and data must be skipped, not mis-parsed
    pre = b"LIST" + struct.pack("<I", 4) + b"INFO"
    payload = _wav16(
        [0, 16384, 0, -16384], sample_rate=44100, n_channels=2, pre_chunks=pre
    )
    sr, nch, n, rms = _parse_wav(payload)
    assert (sr, nch, n) == (44100, 2, 2)  # 4 samples / 2 channels
    assert rms == pytest.approx(math.sqrt((0.25 + 0.25) / 4), abs=1e-12)


def test_parse_wav_pcm8_unsigned_midpoint():
    # 8-bit PCM is unsigned around 128: [128, 255, 0] → [0, ~1, -1]
    sr, nch, n, rms = _parse_wav(_wav8([128, 255, 0]))
    assert (sr, nch, n) == (11025, 1, 3)
    expected = math.sqrt((0.0 + (127 / 128) ** 2 + 1.0) / 3)
    assert rms == pytest.approx(expected, abs=1e-12)


def test_parse_wav_rejects_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        _parse_wav(b"not audio at all")
    with pytest.raises(ValueError, match="fmt/data"):
        _parse_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_parse_ppm_p6_known_pixels():
    # 2x1 P6: pure red + pure blue, maxval 255
    payload = b"P6 2 1 255\n" + bytes([255, 0, 0, 0, 0, 255])
    w, h, c, feat = _parse_pnm(payload)
    assert (w, h, c) == (2, 1, 3)
    assert feat == pytest.approx([0.5, 0.0, 0.5, 1 / 3], abs=1e-12)


def test_parse_pgm_p5_with_comment_and_16bit():
    payload = b"P5 # a comment\n2 2 255\n" + bytes([0, 255, 128, 127])
    w, h, c, feat = _parse_pnm(payload)
    assert (w, h, c) == (2, 2, 1)
    m = (0 + 255 + 128 + 127) / 4 / 255
    assert feat == pytest.approx([m, m, m, m], abs=1e-12)
    # 16-bit maxval rasters are big-endian per the PNM spec
    payload16 = b"P5 1 1 65535\n" + struct.pack(">H", 32768)
    w, h, c, feat = _parse_pnm(payload16)
    assert (w, h, c) == (1, 1, 1)
    assert feat[0] == pytest.approx(32768 / 65535, abs=1e-12)


def test_parse_pnm_rejects_garbage():
    with pytest.raises(ValueError, match="P5/P6"):
        _parse_pnm(b"JFIF....")
    with pytest.raises(ValueError, match="truncated PNM raster"):
        _parse_pnm(b"P6 4 4 255\n" + bytes(5))


def test_wav_decode_through_spark(spark):
    """The full mapInPandas path: binary column in, typed features out,
    exact values — real bytes through the same Arrow contract as the
    stub tier."""
    rows = [
        (1, bytearray(_wav16([16384, -16384], sample_rate=16000))),
        (2, bytearray(_wav8([128, 255, 0]))),
    ]
    media = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r.doc_id: r for r in decode_wav_features(media).collect()}
    assert got[1].sample_rate == 16000 and got[1].n_samples == 2
    assert got[1].rms == pytest.approx(0.5, abs=1e-12)
    assert got[2].sample_rate == 11025 and got[2].n_channels == 1


def test_ppm_decode_through_spark(spark):
    rows = [
        (1, bytearray(b"P6 2 1 255\n" + bytes([255, 0, 0, 0, 0, 255]))),
        (2, bytearray(b"P5 1 1 255\n" + bytes([51]))),
    ]
    media = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r.doc_id: r for r in decode_ppm_features(media).collect()}
    assert (got[1].width, got[1].height, got[1].n_channels) == (2, 1, 3)
    assert list(got[1].feature) == pytest.approx([0.5, 0.0, 0.5, 1 / 3])
    assert got[2].feature[0] == pytest.approx(0.2)


def test_parse_wav_rejects_short_fmt_and_oversize_chunk():
    """ADVICE r8: a fmt chunk shorter than 16 bytes must raise ValueError
    (not struct.error), and a chunk whose declared size extends past the
    payload must fail loudly instead of silently truncating the read."""
    short = struct.pack("<HHI", 1, 1, 8000)  # 8 of the required 16 bytes
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(short)) + short
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="fmt chunk"):
        _parse_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    good = _wav16([16384, -16384, 16384, -16384])
    with pytest.raises(ValueError, match="exceeds payload"):
        _parse_wav(good[:-2])  # data declares 8 bytes, only 6 remain
