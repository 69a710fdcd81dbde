"""Real media codecs (operators/media_codec.py): PNG encode/decode round
trip, scanline filter coverage, header parsers, WAV PCM round trip, and the
Spark decode-stats path against the closed-form synthesis."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from scalable_data_integration_with_llms_spark.operators.media_codec import (
    PNG_SIGNATURE,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    parse_gif_header,
    parse_jpeg_header,
    parse_png_header,
    sniff_format,
    synth_dims,
    synth_pixels,
    synth_png,
)


def test_png_round_trip_rgb():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == (13, 21, 3)
    assert np.array_equal(out, arr)


def test_png_round_trip_grey_and_rgba():
    rng = np.random.default_rng(8)
    grey = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(grey))[:, :, 0], grey)
    rgba = rng.integers(0, 256, size=(6, 4, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def test_png_header_and_crc_guard():
    content = encode_png(np.zeros((3, 7, 3), dtype=np.uint8))
    assert parse_png_header(content) == (7, 3, 8, 3)
    corrupted = bytearray(content)
    corrupted[40] ^= 0xFF  # flip a byte inside a chunk payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))
    with pytest.raises(ValueError, match="signature"):
        parse_png_header(b"nope" + content)


def _png_from_raw(raw: bytes, w: int, h: int, color_type: int) -> bytes:
    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def test_png_all_filter_types():
    """Hand-build filtered scanlines (spec §6) and check the un-filter
    reconstructs the intended pixels for Sub, Up, Average and Paeth."""
    # target image, greyscale 4x4
    img = np.array(
        [[10, 20, 30, 40], [15, 25, 35, 45], [100, 90, 80, 70], [1, 2, 3, 4]],
        dtype=np.uint8,
    )
    # row 0: Sub     -> line[i] = x[i] - x[i-1]
    r0 = np.diff(np.concatenate([[0], img[0].astype(np.int32)])) % 256
    # row 1: Up      -> line[i] = x[i] - up[i]
    r1 = (img[1].astype(np.int32) - img[0]) % 256
    # row 2: Average -> line[i] = x[i] - (left + up)//2
    r2 = np.zeros(4, dtype=np.int32)
    for i in range(4):
        left = int(img[2][i - 1]) if i > 0 else 0
        r2[i] = (int(img[2][i]) - (left + int(img[1][i])) // 2) % 256
    # row 3: Paeth
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    r3 = np.zeros(4, dtype=np.int32)
    for i in range(4):
        a = int(img[3][i - 1]) if i > 0 else 0
        b = int(img[2][i])
        c = int(img[2][i - 1]) if i > 0 else 0
        r3[i] = (int(img[3][i]) - paeth(a, b, c)) % 256
    raw = (
        b"\x01" + bytes(r0.astype(np.uint8))
        + b"\x02" + bytes(r1.astype(np.uint8))
        + b"\x03" + bytes(r2.astype(np.uint8))
        + b"\x04" + bytes(r3.astype(np.uint8))
    )
    out = decode_png(_png_from_raw(raw, 4, 4, 0))
    assert np.array_equal(out[:, :, 0], img)


def test_jpeg_header():
    # minimal SOI + APP0 + SOF0 + EOI skeleton
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 24, 33, 3) + b"\x01\x11\x00"
    jpg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    assert parse_jpeg_header(jpg) == (33, 24, 3)
    with pytest.raises(ValueError):
        parse_jpeg_header(b"\x00\x00")


def test_gif_header():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert parse_gif_header(gif) == (320, 200)
    with pytest.raises(ValueError):
        parse_gif_header(b"NOTGIF" + b"\x00" * 8)


def test_wav_round_trip():
    rng = np.random.default_rng(9)
    samples = rng.integers(-32768, 32767, size=(480, 2), dtype=np.int16)
    out, rate = decode_wav(encode_wav(samples, sample_rate=8000))
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_sniff_format():
    assert sniff_format(encode_png(np.zeros((2, 2), dtype=np.uint8))) == "png"
    assert sniff_format(encode_wav(np.zeros(4, dtype=np.int16))) == "wav"
    assert sniff_format(b"\xff\xd8rest") == "jpeg"
    assert sniff_format(b"GIF87a..") == "gif"
    assert sniff_format(b"??") == "unknown"


def test_synth_png_matches_formula():
    mid = 123
    w, h = synth_dims(mid)
    arr = decode_png(synth_png(mid))
    assert arr.shape == (h, w, 3)
    assert np.array_equal(arr, synth_pixels(mid))


def test_spark_decode_stats_matches_numpy(spark):
    from scalable_data_integration_with_llms_spark.operators.multimodal import (
        image_decode_stats,
        synthesize_png_media,
    )

    ids = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    stats = {r["media_id"]: r for r in image_decode_stats(synthesize_png_media(ids, "doc_id")).collect()}
    for i in range(20):
        px = synth_pixels(i).astype(np.int64)
        flat = px.reshape(-1)
        r = stats[i]
        w, h = synth_dims(i)
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_pixels"] == flat.size
        assert r["px_sum"] == flat.sum()
        assert r["px_wsum"] == (flat * np.arange(1, flat.size + 1)).sum()
        assert (r["px_min"], r["px_max"]) == (flat.min(), flat.max())


def test_dhash_separation_and_banding(spark):
    """Near-dup variants differ by <=1 dHash bit; distinct images sit far
    apart; the banded query finds exactly the brute-force pair set."""
    import itertools

    from scalable_data_integration_with_llms_spark.operators.media_codec import (
        decode_png, dhash64, synth_variant_png,
    )
    from scalable_data_integration_with_llms_spark.queries import QUERIES
    from scalable_data_integration_with_llms_spark.queries.similarity_q import (
        _golden_image_dhash_pairs,
    )

    h = {
        (p, v): dhash64(decode_png(synth_variant_png(p, v))) % (1 << 64)
        for p in range(10) for v in (0, 1)
    }
    assert all(bin(h[(p, 0)] ^ h[(p, 1)]).count("1") <= 1 for p in range(10))
    cross = [
        bin(h[(a, 0)] ^ h[(b, 0)]).count("1")
        for a, b in itertools.combinations(range(10), 2)
    ]
    assert min(cross) > 8  # distinct images never look like near-dups

    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in QUERIES["q_image_dhash_dedup"](spark, "/root/testdata/sf0.001").collect()
    )
    assert got == sorted(_golden_image_dhash_pairs())
    # every planted pair found
    assert {(a, b) for a, b, _m in got} >= {(2 * p, 2 * p + 1) for p in range(30)}
