"""Real media codecs, pure stdlib (the multimodal decode kernel).

No image/audio libraries exist in this container, so the engine implements
the public file-format specs directly:

- **PNG** (RFC 2083 / W3C spec): full chunk reader with CRC verification,
  IHDR parse, multi-IDAT zlib inflate, and all five scanline filters
  (None/Sub/Up/Average/Paeth) un-applied — a genuine decoder for 8-bit
  RGB/RGBA/greyscale non-interlaced images, plus the matching encoder.
- **JPEG** (ITU T.81): marker walk to the SOF segment for dimensions and
  component count (header parse; entropy decode is out of scope).
- **GIF** (87a/89a): logical-screen descriptor (little-endian dims).
- **WAV** (RIFF): fmt/data chunk parse + PCM16 sample decode.

These run inside ``mapInPandas`` batches (operators/multimodal.py): payload
bytes stay in the scan stage, only decoded features reach a shuffle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w)`` or ``(h, w, channels)`` uint8 array as a real PNG
    (8-bit, non-interlaced, filter type 0 on every scanline)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _iter_chunks(content: bytes):
    pos = len(PNG_SIGNATURE)
    n = len(content)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        tag = content[pos + 4 : pos + 8]
        payload = content[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", content[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        yield tag, payload
        pos += 12 + length
        if tag == b"IEND":
            return


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Un-apply PNG scanline filters (spec §6: None/Sub/Up/Average/Paeth)."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for r in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8).astype(np.int32)
        pos += 1 + stride
        prev = out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need the left neighbor -> sequential
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0  # left
                b = prev[i]  # up
                if ftype == 1:  # Sub
                    cur[i] = (line[i] + a) & 0xFF
                elif ftype == 3:  # Average
                    cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:  # Paeth
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (line[i] + pred) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def parse_png_header(content: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, channels) from IHDR, CRC-verified."""
    if content[: len(PNG_SIGNATURE)] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    for tag, payload in _iter_chunks(content):
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            return w, h, depth, _PNG_CHANNELS[color_type]
    raise ValueError("PNG missing IHDR")


def decode_png(content: bytes) -> np.ndarray:
    """Full decode to an ``(h, w, channels)`` uint8 array (8-bit only)."""
    w, h, depth, ch = parse_png_header(content)
    if depth != 8:
        raise ValueError(f"bit depth {depth} not supported")
    idat = b"".join(p for t, p in _iter_chunks(content) if t == b"IDAT")
    raw = zlib.decompress(idat)
    expected = h * (1 + w * ch)
    if len(raw) != expected:
        raise ValueError(f"PNG pixel data {len(raw)} bytes, expected {expected}")
    return _unfilter(raw, h, w, ch)


def parse_jpeg_header(content: bytes) -> tuple[int, int, int]:
    """(width, height, components) from the first SOF marker (ITU T.81)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at {pos}")
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOF*
            _prec, h, w, comps = struct.unpack(">BHHB", content[pos + 4 : pos + 10])
            return w, h, comps
        pos += 2 + seglen
    raise ValueError("JPEG missing SOF")


def parse_gif_header(content: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor (little-endian)."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", content[6:10])
    return w, h


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """PCM16 mono/stereo RIFF/WAVE writer."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    data = arr.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """(samples[(n, channels)] int16, sample_rate) from a PCM16 RIFF/WAVE."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    n = len(content)
    n_ch = rate = bits = None
    data = None
    while pos + 8 <= n:
        tag = content[pos : pos + 4]
        (length,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        payload = content[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", payload[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif tag == b"data":
            data = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if data is None or n_ch is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2").reshape(-1, n_ch)
    return samples, rate


def sniff_format(content: bytes) -> str:
    if content[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
        return "png"
    if content[:2] == b"\xff\xd8":
        return "jpeg"
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# -- deterministic synthesis (the oracle-checkable test pattern) ---------------
# Dimensions and pixel values are closed-form in the media id so a SQL oracle
# can recompute every statistic the decoder emits; any defect in chunk
# framing, CRC, deflate, filtering, or reshape breaks the position-weighted
# checksum.

SYNTH_CHANNELS = 3


def synth_dims(media_id: int) -> tuple[int, int]:
    return 16 + media_id % 17, 16 + (media_id * 7) % 13  # (width, height)


def synth_pixels(media_id: int) -> np.ndarray:
    w, h = synth_dims(media_id)
    r = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(w, dtype=np.int64)[None, :, None]
    ch = np.arange(SYNTH_CHANNELS, dtype=np.int64)[None, None, :]
    return ((media_id * 31 + r * 7 + c * 3 + ch * 11) % 256).astype(np.uint8)


def synth_png(media_id: int) -> bytes:
    return encode_png(synth_pixels(media_id))


def dhash64(pixels: np.ndarray) -> int:
    """Perceptual difference hash (dHash, public algorithm): channel-SUM
    grayscale (integer — no float resize, so the hash is engine-exact),
    a 9x8 strided sample grid, row-wise left>right comparisons -> 64 bits
    returned as a SIGNED int64 (bit 63 wraps negative, matching Spark's
    BIGINT so banding via shiftrightunsigned agrees across engines)."""
    gray = pixels.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    r_idx = (np.arange(8, dtype=np.int64) * h) // 8
    c_idx = (np.arange(9, dtype=np.int64) * w) // 9
    g = gray[np.ix_(r_idx, c_idx)]
    bits = 0
    for r in range(8):
        for c in range(8):
            bits = (bits << 1) | int(g[r, c] > g[r, c + 1])
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def noise_pixels(pair_id: int) -> np.ndarray:
    """High-frequency deterministic pixels (multiplicative-hash noise) —
    unlike the smooth ``synth_pixels`` gradient, these give dHashes with
    well-distributed bits, so distinct images land far apart in Hamming
    space (the property a perceptual-dedup test needs)."""
    w, h = synth_dims(pair_id)
    r = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(w, dtype=np.int64)[None, :, None]
    ch = np.arange(SYNTH_CHANNELS, dtype=np.int64)[None, None, :]
    v = r * 2654435761 + c * 40503 + ch * 97 + pair_id * 1013904223
    return (((v >> 7) ^ v) % 256).astype(np.uint8)


def synth_variant_png(pair_id: int, variant: int) -> bytes:
    """A near-dup image pair generator: variant 0 is noise_pixels(pair_id)
    verbatim; variant 1 nudges one pixel by +1 (mod 256) — a perceptual
    near-duplicate whose dHash differs in at most a few bits."""
    px = noise_pixels(pair_id).copy()
    if variant:
        px[0, 0, 0] = (int(px[0, 0, 0]) + 1) % 256
    return encode_png(px)
