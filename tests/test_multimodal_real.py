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

import numpy as np
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


# ---------------------------------------------------------------------------
# PNG (VERDICT r9 item 4: the codec-free third real decoder)
# ---------------------------------------------------------------------------

import zlib


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(width, height, color_type, rows, filters=None, depth=8,
         interlace=0, split_idat=False):
    """Hand-built PNG: ``rows`` is a list of per-row pixel byte lists
    (already channel-interleaved); ``filters`` assigns each row's filter
    byte, with the raw scanline payload computed by FORWARD-filtering
    the known pixels — so the decoder's unfilter must invert exactly."""
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    bpp = channels
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytes(width * channels)
    for y in range(height):
        line = bytes(rows[y])
        ft = filters[y]
        enc = bytearray(line)
        if ft == 1:
            for i in range(len(line) - 1, bpp - 1, -1):
                enc[i] = (line[i] - line[i - bpp]) & 0xFF
        elif ft == 2:
            for i in range(len(line)):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(len(line)):
                left = line[i - bpp] if i >= bpp else 0
                enc[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(len(line)):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0,
                       interlace)
    comp = zlib.compress(bytes(raw))
    if split_idat:
        mid = len(comp) // 2
        idat = _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
    else:
        idat = _chunk(b"IDAT", comp)
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + idat
        + _chunk(b"IEND", b"")
    )


def test_parse_png_gray_all_filter_types():
    """A 4x5 grayscale image exercising every filter type (None, Sub,
    Up, Average, Paeth) — the unfilter must reconstruct the exact known
    pixels, proven by the exact mean."""
    from simple_map_reduce_spark.multimodal import _parse_png

    rows = [
        [0, 64, 128, 255],
        [10, 20, 30, 40],
        [50, 60, 70, 80],
        [90, 100, 110, 120],
        [130, 140, 150, 160],
    ]
    payload = _png(4, 5, 0, rows, filters=[0, 1, 2, 3, 4])
    w, h, c, feat = _parse_png(payload)
    assert (w, h, c) == (4, 5, 1)
    expected = sum(sum(r) for r in rows) / (20 * 255.0)
    assert feat[0] == pytest.approx(expected, abs=1e-15)
    assert feat == [feat[0]] + [feat[0]] * 3  # gray pads with overall


def test_parse_png_rgb_and_rgba_channel_means():
    from simple_map_reduce_spark.multimodal import _parse_png

    # 2x2 RGB: R plane {255,255,0,0}, G plane {0,...}, B plane {255,...}
    rgb_rows = [
        [255, 0, 255, 255, 0, 255],
        [0, 0, 255, 0, 0, 255],
    ]
    w, h, c, feat = _parse_png(_png(2, 2, 2, rgb_rows, filters=[4, 1]))
    assert (w, h, c) == (2, 2, 3)
    assert feat[0] == pytest.approx(0.5, abs=1e-15)      # R mean
    assert feat[1] == 0.0                                 # G mean
    assert feat[2] == pytest.approx(1.0, abs=1e-15)      # B mean
    # RGBA: alpha plane all 255 -> 4th feature is the alpha mean
    rgba_rows = [[10, 20, 30, 255, 40, 50, 60, 255]]
    w, h, c, feat = _parse_png(_png(2, 1, 6, rgba_rows, filters=[2]))
    assert (w, h, c) == (2, 1, 4)
    assert feat[3] == pytest.approx(1.0, abs=1e-15)
    assert feat[0] == pytest.approx(25 / 255.0, abs=1e-15)


def test_parse_png_split_idat_and_gray_alpha():
    """IDAT may arrive as multiple chunks (per spec, they concatenate);
    gray+alpha (color type 4) decodes as 2 channels."""
    from simple_map_reduce_spark.multimodal import _parse_png

    rows = [[100, 255, 200, 255], [50, 255, 150, 255]]
    w, h, c, feat = _parse_png(_png(2, 2, 4, rows, split_idat=True))
    assert (w, h, c) == (2, 2, 2)
    assert feat[0] == pytest.approx(125 / 255.0, abs=1e-15)
    assert feat[1] == pytest.approx(1.0, abs=1e-15)


def test_parse_png_rejects_garbage():
    """The rejection matrix: every malformed form raises ValueError with
    a diagnostic, never a silent zero feature."""
    from simple_map_reduce_spark.multimodal import _parse_png

    good = _png(2, 2, 0, [[1, 2], [3, 4]])
    cases = [
        (b"not a png at all", "signature"),
        (good[:20], "exceeds payload"),
    ]
    # bad CRC: flip one bit inside the IHDR body
    bad_crc = bytearray(good)
    bad_crc[16] ^= 0x01
    cases.append((bytes(bad_crc), "CRC"))
    # 16-bit depth / palette / interlaced all refuse
    cases.append((_png(2, 2, 0, [[1, 2], [3, 4]], depth=16), "bit_depth"))
    cases.append((_png(2, 2, 0, [[1, 2], [3, 4]], interlace=1), "interlace"))
    # bad filter byte on a scanline
    raw = b"\x09" + bytes([1, 2]) + b"\x00" + bytes([3, 4])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bad_filter = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )
    cases.append((bad_filter, "filter type"))
    # truncated raster: one scanline missing
    short = b"\x00" + bytes([1, 2])
    trunc = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(short)) + _chunk(b"IEND", b"")
    )
    cases.append((trunc, "scanlines"))
    # corrupt deflate stream
    bad_z = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\x00bogus") + _chunk(b"IEND", b"")
    )
    cases.append((bad_z, "inflate"))
    # missing IEND
    cases.append((good[: good.index(b"IEND") - 4], "IEND"))
    for payload, msg in cases:
        with pytest.raises(ValueError, match=msg):
            _parse_png(payload)


def test_png_decode_through_spark(spark):
    """The Arrow contract end to end: binary column in, exact features
    out, same schema as the PPM tier."""
    from simple_map_reduce_spark.multimodal import decode_png_features

    p1 = _png(4, 5, 0, [
        [0, 64, 128, 255],
        [10, 20, 30, 40],
        [50, 60, 70, 80],
        [90, 100, 110, 120],
        [130, 140, 150, 160],
    ], filters=[0, 1, 2, 3, 4])
    p2 = _png(2, 2, 2, [
        [255, 0, 255, 255, 0, 255],
        [0, 0, 255, 0, 0, 255],
    ], filters=[4, 1])
    media = spark.createDataFrame(
        [(1, bytearray(p1)), (2, bytearray(p2))],
        "doc_id bigint, content binary",
    )
    out = {r.doc_id: r for r in decode_png_features(media).collect()}
    assert (out[1].width, out[1].height, out[1].n_channels) == (4, 5, 1)
    assert (out[2].width, out[2].height, out[2].n_channels) == (2, 2, 3)
    assert out[2].feature[1] == 0.0
    assert out[2].feature[0] == pytest.approx(0.5, abs=1e-15)


def test_png_unfilter_roundtrip_property():
    """Property (hypothesis): for RANDOM pixels, dimensions, channel
    layouts, and per-row filter choices, the decoder's unfilter inverts
    the test encoder's forward filter BYTE-EXACTLY. The fixed tests
    above pin small hand-checked cases; this sweeps the index/stride/
    bpp space (first-row Up/Average/Paeth against the zero row, first-
    pixel Sub/Paeth with no left neighbor, 1xN and Nx1 shapes) where
    off-by-bpp bugs live. Pixels come back from the raw IDAT via an
    independent minimal chunk walk, so the assertion is on the exact
    reconstructed scanlines, not a mean that errors could cancel out of."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from simple_map_reduce_spark.multimodal import _parse_png, _png_unfilter

    def idat_raw(blob: bytes) -> bytes:
        pos, idat = 8, bytearray()
        while pos + 8 <= len(blob):
            (clen,) = struct.unpack_from(">I", blob, pos)
            ctype = blob[pos + 4 : pos + 8]
            if ctype == b"IDAT":
                idat += blob[pos + 8 : pos + 8 + clen]
            pos += 12 + clen
        return zlib.decompress(bytes(idat))

    @given(
        color=st.sampled_from([0, 2, 4, 6]),
        dims=st.tuples(st.integers(1, 7), st.integers(1, 7)),
        data=st.data(),
    )
    @settings(max_examples=60, deadline=None)
    def prop(color, dims, data):
        w, h = dims
        channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
        stride = w * channels
        rows = [
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=stride, max_size=stride
                )
            )
            for _ in range(h)
        ]
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        blob = _png(w, h, color, rows, filters=filters)
        # byte-exact scanline reconstruction
        got = _png_unfilter(idat_raw(blob), h, stride, channels)
        assert got == b"".join(bytes(r) for r in rows)
        # and the full parse agrees on shape + exact channel means:
        # integer sums are exact in float64, so sum/n/255 is the
        # bit-stable contract (matches the parser's dtype-accumulated
        # mean — NOT a per-element x/255 mean, which differs in the ulp)
        pw, ph, pc, feat = _parse_png(blob)
        assert (pw, ph, pc) == (w, h, channels)
        arr = np.array(rows, dtype=np.int64).reshape(h, w, channels)
        means = [int(arr[:, :, c].sum()) / (h * w) / 255.0 for c in range(channels)]
        overall = int(arr.sum()) / (h * w * channels) / 255.0
        assert feat == (means + [overall] * 4)[:4]

    prop()


# ---------------------------------------------------------------------------
# GIF (the codec-free FOURTH real decoder: hand-written LZW)
# ---------------------------------------------------------------------------


def _gif_codes(indices, m):
    """Greedy LZW encode (code list, no packing): longest dict match,
    clear first, end last — the canonical GIF compressor shape."""
    clear = 1 << m
    d = {(i,): i for i in range(clear)}
    nxt = clear + 2
    codes = [clear]
    buf = ()
    for s in indices:
        cand = buf + (s,)
        if cand in d:
            buf = cand
        else:
            codes.append(d[buf])
            if nxt < 4096:
                d[cand] = nxt
                nxt += 1
            buf = (s,)
    if buf:
        codes.append(d[buf])
    codes.append(clear + 1)
    return codes


def _pack_codes(codes, m):
    """LSB-first variable-width packing, simulating the DECODER's table
    growth so each code is emitted at the width the decoder will read
    it with (width grows after the table reaches 2^width)."""
    clear, end = 1 << m, (1 << m) + 1
    width, nxt, prev_seen = m + 1, clear + 2, False
    acc = n = 0
    out = bytearray()
    for code in codes:
        assert code < (1 << width)
        acc |= code << n
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
        if code == clear:
            width, nxt, prev_seen = m + 1, clear + 2, False
        elif code != end:
            if prev_seen and nxt < 4096:
                nxt += 1
                if nxt == (1 << width) and width < 12:
                    width += 1
            prev_seen = True
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif(width, height, indices, palette, m=None, sig=b"GIF89a",
         interlace=False, local=False, extensions=b"", lzw=None,
         trailer=True):
    """Hand-built single-frame GIF. ``palette`` is a list of (r, g, b);
    its length must be a power of two in 2..256. ``lzw`` overrides the
    encoder with raw LZW bytes (the hand-derived fixtures)."""
    n = len(palette)
    bits = n.bit_length() - 1  # n = 2^bits
    m = m if m is not None else max(2, bits)
    pal = b"".join(bytes(c) for c in palette)
    if lzw is None:
        lzw = _pack_codes(_gif_codes(indices, m), m)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        sub += bytes([len(chunk)]) + chunk
    sub += b"\x00"
    lsd_packed = 0x80 | (bits - 1) if not local else 0x00
    img_packed = (0x80 | (bits - 1) if local else 0x00) | (0x40 if interlace else 0x00)
    out = (
        sig
        + struct.pack("<HHBBB", width, height, lsd_packed, 0, 0)
        + (pal if not local else b"")
        + extensions
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, img_packed)
        + (pal if local else b"")
        + bytes([m]) + bytes(sub)
    )
    return out + (b"\x3b" if trailer else b"")


_PAL4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]


def test_parse_gif_hand_derived_lzw_stream():
    """The LZW bytes are derived BY HAND from the GIF89a spec (not by
    the test encoder — this breaks any encoder/decoder mirror bug).
    2x2 frame, 4-color palette, m=2 (clear=4, end=5, width starts 3),
    pixels [0,1,2,3] -> codes 4,0,1,2,3,5. Width evolution: after code
    2 the table reaches 8 = 2^3 (entries 6,7 added by codes 1,2), so
    codes 3 and 5 read at width 4. LSB-first packing:
      (4,w3)(0,w3)(1,w3)(2,w3)(3,w4)(5,w4)
      = bits 001 000 100 010 1100 1010 (each value LSB-first)
      = bytes 0x44 0x34 0x05."""
    from simple_map_reduce_spark.multimodal import _parse_gif

    blob = _gif(2, 2, None, _PAL4, lzw=bytes([0x44, 0x34, 0x05]))
    w, h, c, feat = _parse_gif(blob)
    assert (w, h, c) == (2, 2, 3)
    # pixels are palette entries 0..3: channel means = 255/4 each
    assert feat[0] == feat[1] == feat[2] == pytest.approx(0.25, abs=1e-15)
    assert feat[3] == pytest.approx(0.25, abs=1e-15)


def test_parse_gif_hand_derived_kwkwk_case():
    """The KwKwK corner (a code equal to the next unassigned entry),
    hand-derived: pixels [1,1,1,1] greedy-encode to codes 4,1,6,1,5
    where 6 is consumed BEFORE it is defined — the decoder must emit
    prev + prev[0]. Widths: 4,1,6,1 at w3 (table hits 8 after the
    second 1 defines entry 7), end 5 at w4. LSB-first:
      001 100 011 100 1010 = bytes 0x8C 0x53."""
    from simple_map_reduce_spark.multimodal import _parse_gif

    blob = _gif(2, 2, None, _PAL4, lzw=bytes([0x8C, 0x53]))
    w, h, c, feat = _parse_gif(blob)
    assert (w, h, c) == (2, 2, 3)
    # all four pixels are palette[1] = (255, 0, 0)
    assert feat[0] == pytest.approx(1.0, abs=1e-15)
    assert feat[1] == feat[2] == 0.0
    assert feat[3] == pytest.approx(1.0 / 3, abs=1e-15)


def test_parse_gif_encoder_roundtrip_and_variants():
    """Encoder round trip across palette sizes, both signatures, local
    color tables, skipped extensions (GCE + comment), and a raster big
    enough to force several width growths."""
    from simple_map_reduce_spark.multimodal import _parse_gif

    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # graphic control ext
    comment = b"\x21\xfe\x05hello\x00"
    # 16x16, 8-color palette, deterministic pseudo-random indices
    idx = [(i * 7 + 3) % 8 for i in range(256)]
    pal8 = [(32 * i, 255 - 32 * i, i) for i in range(8)]
    blob = _gif(16, 16, idx, pal8, extensions=gce + comment)
    w, h, c, feat = _parse_gif(blob)
    assert (w, h, c) == (16, 16, 3)
    exp = np.array([pal8[i] for i in idx], dtype=np.float64) / 255.0
    want = [float(exp[:, ch].mean()) for ch in range(3)] + [float(exp.mean())]
    assert feat == pytest.approx(want, abs=1e-15)
    # GIF87a + local color table
    blob87 = _gif(4, 2, [0, 1, 2, 3, 3, 2, 1, 0], _PAL4, sig=b"GIF87a",
                  local=True)
    w, h, c, feat = _parse_gif(blob87)
    assert (w, h, c) == (4, 2, 3)
    assert feat[0] == feat[1] == feat[2] == pytest.approx(0.25, abs=1e-15)


def test_parse_gif_roundtrip_property():
    """Property (hypothesis): random dims, palette sizes, and index
    rasters survive encode->decode with exact channel means."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from simple_map_reduce_spark.multimodal import _parse_gif

    @given(
        dims=st.tuples(st.integers(1, 9), st.integers(1, 9)),
        bits=st.integers(1, 4),
        data=st.data(),
    )
    @settings(max_examples=40, deadline=None)
    def prop(dims, bits, data):
        w, h = dims
        n = 1 << bits
        pal = [
            (i * 255 // max(1, n - 1), (i * 37) % 256, (i * 101) % 256)
            for i in range(n)
        ]
        idx = data.draw(
            st.lists(st.integers(0, n - 1), min_size=w * h, max_size=w * h)
        )
        pw, ph, pc, feat = _parse_gif(_gif(w, h, idx, pal))
        assert (pw, ph, pc) == (w, h, 3)
        exp = np.array([pal[i] for i in idx], dtype=np.float64) / 255.0
        want = [float(exp[:, ch].mean()) for ch in range(3)] + [float(exp.mean())]
        assert feat == pytest.approx(want, abs=1e-15)

    prop()


def test_parse_gif_rejects_garbage():
    from simple_map_reduce_spark.multimodal import _parse_gif

    good = _gif(2, 2, [0, 1, 2, 3], _PAL4)
    cases = [
        (b"JFIF" + good[4:], "signature"),
        (good[:10], "signature" if len(good[:10]) < 13 else "truncated"),
        (good[:-1], "trailer"),  # trailer byte stripped
        (_gif(2, 2, [0, 1, 2, 3], _PAL4, interlace=True), "interlaced"),
        # LZW raster one pixel short for the declared 2x2 frame
        (_gif(2, 2, [0, 1, 2], _PAL4), "pixels"),
        # raster overflows the frame
        (_gif(2, 2, [0, 1, 2, 3, 1], _PAL4), "overflows"),
        # truncated sub-block chain: declare 10 data bytes, supply none
        (good[: good.index(b"\x3b") - 4] + b"\x0a", "sub-block"),
    ]
    # bad LZW: a code beyond the table (width-3 code 7 right after clear)
    #   (4,w3)(7,w3) -> bits 001 111 -> byte 0x3C
    cases.append((_gif(2, 2, None, _PAL4, lzw=bytes([0x3C])), "LZW code"))
    # pixel index beyond a 2-entry local-palette (index 3 with pal size 2
    # still encodes: m=2 allows roots 0..3)
    pal2 = [(0, 0, 0), (255, 255, 255)]
    cases.append((_gif(2, 2, [0, 1, 3, 1], pal2, m=2), "palette"))
    for payload, msg in cases:
        with pytest.raises(ValueError, match=msg):
            _parse_gif(payload)


def test_gif_decode_through_spark(spark):
    """The Arrow contract end to end: binary column in, exact features
    out, same schema as the PPM/PNG tier."""
    from simple_map_reduce_spark.multimodal import decode_gif_features

    g1 = _gif(2, 2, [0, 1, 2, 3], _PAL4)
    g2 = _gif(4, 2, [1] * 8, _PAL4)
    media = spark.createDataFrame(
        [(1, bytearray(g1)), (2, bytearray(g2))],
        "doc_id bigint, content binary",
    )
    out = {r.doc_id: r for r in decode_gif_features(media).collect()}
    assert (out[1].width, out[1].height, out[1].n_channels) == (2, 2, 3)
    assert (out[2].width, out[2].height, out[2].n_channels) == (4, 2, 3)
    assert out[2].feature[0] == pytest.approx(1.0, abs=1e-15)
    assert out[2].feature[1] == 0.0


def test_all_parsers_fail_closed_on_arbitrary_bytes():
    """Fuzz property (hypothesis): every real parser either decodes or
    raises ValueError — NEVER struct.error/IndexError/zlib.error/
    MemoryError — on (a) arbitrary bytes prefixed with each format's
    magic (so the fuzz reaches past the signature check) and (b) valid
    blobs with a few mutated bytes (GIF has no CRC, so mutations drive
    deep into the LZW/palette paths; PNG mutations mostly die at the
    CRC, which is itself the contract). A decode job over 100 TB of
    crawled bytes WILL meet every one of these; fail-closed is the
    executor-safety contract the bomb caps above complete."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from simple_map_reduce_spark.multimodal import (
        _parse_bmp,
        _parse_gif,
        _parse_png,
        _parse_pnm,
        _parse_tiff,
        _parse_wav,
    )

    valid = [
        (_parse_gif, _gif(2, 2, [0, 1, 2, 3], _PAL4)),
        (_parse_png, _png(2, 2, 0, [[0, 64], [128, 255]], filters=[0, 2])),
        (_parse_pnm, b"P6 2 1 255\n" + bytes([255, 0, 0, 0, 0, 255])),
        (_parse_wav, _wav16([16384, -16384], sample_rate=16000)),
        (_parse_bmp, _bmp(2, 2, [[(255, 0, 0), (0, 255, 0)],
                                 [(0, 0, 255), (9, 9, 9)]])),
        (_parse_tiff, _tiff(2, 2, bytes([0, 255, 128, 127]))),
    ]
    magics = [b"GIF89a", b"\x89PNG\r\n\x1a\n", b"P6 ", b"RIFF", b"BM",
              b"II\x2a\x00"]

    @given(
        which=st.integers(0, 5),
        junk=st.binary(min_size=0, max_size=120),
        edits=st.lists(
            st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
            min_size=1,
            max_size=4,
        ),
    )
    @settings(max_examples=150, deadline=None)
    def prop(which, junk, edits):
        parse, blob = valid[which]
        mutated = bytearray(blob)
        for p, v in edits:
            mutated[p % len(blob)] = v
        for payload in (magics[which] + junk, bytes(mutated)):
            try:
                parse(payload)
            except ValueError:
                pass  # the only permitted failure

    prop()


def test_decompression_bombs_rejected_before_allocation():
    """ADVICE r10 (both mediums): raster size is an attacker-declared
    header field, so every parser must reject width*height > MAX_PIXELS
    with the contractual ValueError BEFORE any header-sized allocation
    (inflate buffer, LZW output, palette map, unfilter loop). Each blob
    here is a few hundred bytes; pre-cap, the PNG case committed
    ~460 MB before raising and the GIF case could MemoryError."""
    from simple_map_reduce_spark.multimodal import (
        MAX_PIXELS,
        _parse_gif,
        _parse_png,
    )

    # PNG declaring 2^30 x 2^20 (the measured ~460 MB-peak case): the
    # cap must fire on the IHDR alone, before the IDAT is inflated
    ihdr = struct.pack(">IIBBBBB", 1 << 30, 1 << 20, 8, 0, 0, 0, 0)
    bomb_png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(64)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        _parse_png(bomb_png)

    # dims-consistent PNG bomb: 8192x8192 > MAX_PIXELS would pass the
    # old expected-size inflate cap (zero raster compresses ~1000x) and
    # enter the per-byte Python unfilter — the cap rejects it first
    big = 8192
    assert big * big > MAX_PIXELS
    ihdr2 = struct.pack(">IIBBBBB", big, big, 8, 0, 0, 0, 0)
    bomb_png2 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr2)
        + _chunk(b"IDAT", zlib.compress(bytes(big * (big + 1))))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        _parse_png(bomb_png2)

    # GIF declaring 65535x65535 (~4.3e9 px): must fail before the LZW
    # decode / palette map, and as ValueError, never MemoryError
    bomb_gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 65535, 65535, 0x80, 0, 0)  # GCT, 2 colors
        + bytes(6)  # the 2-entry global color table
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 65535, 65535, 0)
        + b"\x02"  # LZW min code size
        + b"\x01\x44\x00"  # one sub-block + terminator
        + b"\x3b"
    )
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        _parse_gif(bomb_gif)

    # PNM header declaring 1e10 px: rejected before the raster read
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        _parse_pnm(b"P6 100000 100000 255\n" + bytes(16))


# ---------------------------------------------------------------------------
# BMP (the codec-free FIFTH real decoder)
# ---------------------------------------------------------------------------


def _bmp(width, height, pixels_rgb, bpp=24, top_down=False, palette=None,
         compression=0, planes=1, data_off=None):
    """Hand-built uncompressed BMP. ``pixels_rgb`` is row-major
    top-left-origin [(r,g,b)...] rows; storage converts to BGR, pads
    rows to 4 bytes, and reverses row order unless ``top_down``."""
    if bpp == 24:
        rows = [
            b"".join(bytes([b, g, r]) for (r, g, b) in row) for row in pixels_rgb
        ]
    else:  # 8-bit: pixels_rgb is index rows, palette is [(r,g,b)...]
        rows = [bytes(row) for row in pixels_rgb]
    stride = (width * (bpp // 8) + 3) & ~3
    rows = [r + bytes(stride - len(r)) for r in rows]
    if not top_down:
        rows = rows[::-1]
    raster = b"".join(rows)
    pal = b""
    if bpp == 8:
        pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette)
    off = data_off if data_off is not None else 54 + len(pal)
    h_field = -height if top_down else height
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, h_field, planes, bpp, compression,
        len(raster), 2835, 2835, len(palette or []), 0,
    )
    head = b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
    return head + dib + pal + raster


def test_parse_bmp_24bit_known_pixels_and_padding():
    from simple_map_reduce_spark.multimodal import _parse_bmp

    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    w, h, c, feat = _parse_bmp(_bmp(2, 2, px))
    assert (w, h, c) == (2, 2, 3)
    assert feat[0] == pytest.approx(510 / 4 / 255, abs=1e-15)  # R mean
    assert feat[1] == pytest.approx(510 / 4 / 255, abs=1e-15)  # G mean
    assert feat[2] == pytest.approx(510 / 4 / 255, abs=1e-15)  # B mean
    # bottom-up vs top-down must decode to the SAME image
    up = _parse_bmp(_bmp(2, 2, px, top_down=False))
    down = _parse_bmp(_bmp(2, 2, px, top_down=True))
    assert up == down
    # 3-wide: stride 12 with 3 pad bytes per row — padding never leaks
    px3 = [[(10, 20, 30), (40, 50, 60), (70, 80, 90)]]
    w, h, c, feat3 = _parse_bmp(_bmp(3, 1, px3))
    assert (w, h) == (3, 1)
    assert feat3[0] == pytest.approx((10 + 40 + 70) / 3 / 255, abs=1e-15)


def test_parse_bmp_8bit_palette():
    from simple_map_reduce_spark.multimodal import _parse_bmp

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    w, h, c, feat = _parse_bmp(
        _bmp(2, 2, [[0, 1], [2, 3]], bpp=8, palette=pal, top_down=True)
    )
    assert (w, h, c) == (2, 2, 3)
    assert feat[0] == pytest.approx(510 / 4 / 255, abs=1e-15)
    # an index beyond the palette fails loudly
    with pytest.raises(ValueError, match="beyond the"):
        _parse_bmp(_bmp(1, 1, [[3]], bpp=8, palette=pal[:2], top_down=True))


def test_parse_bmp_rejects_garbage():
    from simple_map_reduce_spark.multimodal import _parse_bmp

    px = [[(1, 2, 3)]]
    with pytest.raises(ValueError, match="bad magic"):
        _parse_bmp(b"PNG" + bytes(60))
    with pytest.raises(ValueError, match="compression"):
        _parse_bmp(_bmp(1, 1, px, compression=1))
    with pytest.raises(ValueError, match="planes"):
        _parse_bmp(_bmp(1, 1, px, planes=2))
    with pytest.raises(ValueError, match="runs past"):
        _parse_bmp(_bmp(1, 1, px)[:-2])
    with pytest.raises(ValueError, match="runs past"):
        _parse_bmp(_bmp(1, 1, px, data_off=10_000))
    # the shared bomb cap, before any raster-sized allocation
    bomb = bytearray(_bmp(1, 1, px))
    struct.pack_into("<ii", bomb, 18, 100_000, 100_000)
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        _parse_bmp(bytes(bomb))


def test_bmp_decode_through_spark(spark):
    from simple_map_reduce_spark.multimodal import decode_bmp_features

    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    media = spark.createDataFrame(
        [(1, bytearray(_bmp(2, 2, px)))], "doc_id bigint, content binary"
    )
    got = decode_bmp_features(media).collect()[0]
    assert (got.width, got.height, got.n_channels) == (2, 2, 3)
    assert got.feature[0] == pytest.approx(0.5, abs=1e-12)


# ---------------------------------------------------------------------------
# TIFF (the codec-free SIXTH real decoder — closes the category)
# ---------------------------------------------------------------------------


def _tiff(width, height, pixel_bytes, samples=1, photometric=None, bo="<",
          compression=1, bits=None, strips=1):
    """Hand-built baseline uncompressed TIFF (either byte order).
    ``pixel_bytes`` is the full raster; ``strips`` splits it into that
    many strips with real offset/count arrays."""
    photometric = (2 if samples == 3 else 1) if photometric is None else photometric
    bits = bits if bits is not None else [8] * samples
    rows_per_strip = max(1, height // strips)
    chunks = []
    per = rows_per_strip * width * samples
    for i in range(0, len(pixel_bytes), per):
        chunks.append(pixel_bytes[i : i + per])
    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    # layout: header(8) IFD, then out-of-line value areas, then strips
    entries = []
    def entry(tag, ftype, values):
        entries.append((tag, ftype, values))
    entry(256, 3, [width]); entry(257, 3, [height])
    entry(258, 3, bits); entry(259, 3, [compression])
    entry(262, 3, [photometric]); entry(277, 3, [samples])
    entry(278, 3, [rows_per_strip])
    entry(273, 4, None); entry(279, 4, None)  # filled after layout
    entries.sort()
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    tsz = {3: 2, 4: 4}
    # first pass: compute out-of-line area
    out_off = 8 + ifd_size
    overflow = {}
    for tag, ftype, values in entries:
        count = len(values) if values is not None else len(chunks)
        if tsz[ftype] * count > 4:
            overflow[tag] = out_off
            out_off += tsz[ftype] * count
    strip_offsets, pos = [], out_off
    for c in chunks:
        strip_offsets.append(pos); pos += len(c)
    strip_counts = [len(c) for c in chunks]
    filled = {273: strip_offsets, 279: strip_counts}
    ifd = struct.pack(bo + "H", n)
    out_area = b""
    for tag, ftype, values in entries:
        values = filled.get(tag, values)
        count = len(values)
        fmt = {3: "H", 4: "I"}[ftype]
        packed = struct.pack(bo + fmt * count, *values)
        if len(packed) <= 4:
            ifd += struct.pack(bo + "HHI", tag, ftype, count) + packed.ljust(4, b"\0")
        else:
            ifd += struct.pack(bo + "HHII", tag, ftype, count, overflow[tag])
            out_area += packed
    ifd += struct.pack(bo + "I", 0)  # next-IFD pointer
    return header + ifd + out_area + b"".join(chunks)


def test_parse_tiff_gray_both_orders_and_whiteiszero():
    from simple_map_reduce_spark.multimodal import _parse_tiff

    raster = bytes([0, 255, 128, 127])
    for bo in ("<", ">"):
        w, h, c, feat = _parse_tiff(_tiff(2, 2, raster, bo=bo))
        assert (w, h, c) == (2, 2, 1)
        assert feat[0] == pytest.approx((0 + 255 + 128 + 127) / 4 / 255, abs=1e-15)
    # PHOTOMETRIC 0 (WhiteIsZero) inverts so the feature is intensity
    w, h, c, feat0 = _parse_tiff(_tiff(2, 2, raster, photometric=0))
    assert feat0[0] == pytest.approx((255 + 0 + 127 + 128) / 4 / 255, abs=1e-15)


def test_parse_tiff_rgb_multi_strip():
    from simple_map_reduce_spark.multimodal import _parse_tiff

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    raster = b"".join(bytes(p) for p in px)
    w, h, c, feat = _parse_tiff(_tiff(2, 2, raster, samples=3, strips=2))
    assert (w, h, c) == (2, 2, 3)
    assert feat[0] == pytest.approx(510 / 4 / 255, abs=1e-15)
    assert feat[1] == pytest.approx(510 / 4 / 255, abs=1e-15)
    assert feat[2] == pytest.approx(510 / 4 / 255, abs=1e-15)


def test_parse_tiff_rejects_garbage():
    from simple_map_reduce_spark.multimodal import _parse_tiff

    good = _tiff(2, 2, bytes([0, 255, 128, 127]))
    with pytest.raises(ValueError, match="byte-order"):
        _parse_tiff(b"PNG" + bytes(20))
    with pytest.raises(ValueError, match="magic"):
        _parse_tiff(b"II\x2b\x00" + bytes(20))
    with pytest.raises(ValueError, match="compression"):
        _parse_tiff(_tiff(2, 2, bytes(4), compression=5))
    with pytest.raises(ValueError, match="bit depths"):
        _parse_tiff(_tiff(2, 2, bytes(4), bits=[16]))
    with pytest.raises(ValueError, match="raster bytes|runs past"):
        _parse_tiff(good[:-2])  # truncated strip
    # the shared bomb cap: huge declared dims, a tiny actual payload
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        _parse_tiff(_tiff(60000, 60000, bytes(8)))


def test_tiff_decode_through_spark(spark):
    from simple_map_reduce_spark.multimodal import decode_tiff_features

    media = spark.createDataFrame(
        [(1, bytearray(_tiff(2, 2, bytes([0, 255, 128, 127]))))],
        "doc_id bigint, content binary",
    )
    got = decode_tiff_features(media).collect()[0]
    assert (got.width, got.height, got.n_channels) == (2, 2, 1)
    assert got.feature[0] == pytest.approx(510 / 4 / 255, abs=1e-12)
