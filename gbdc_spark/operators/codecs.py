"""Stdlib-only real media codecs: 8-bit grayscale PNG (``zlib`` +
``struct``) and PCM-16 mono WAV (``wave``).

The multimodal stages (operators/multimodal.py) treat payloads as opaque
binary sniffed by magic bytes; these codecs let the SAME stages exercise
genuine wire formats instead of only the synthetic GBDM container — no
third-party imagery/audio libraries required (this container ships
none).  The PNG decoder implements the full scanline filter set
(None/Sub/Up/Average/Paeth, RFC 2083 §6) so externally-produced
grayscale PNGs decode too, not just our own filter-0 output.

Scale note: codecs run inside ``mapInPandas`` workers next to the data;
nothing here touches the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "PNG_MAGIC",
    "WAV_MAGIC",
    "png_encode",
    "png_decode",
    "wav_encode",
    "wav_decode",
]

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_MAGIC = b"RIFF"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """8-bit grayscale PNG: IHDR (bit depth 8, color type 0), one IDAT
    with filter-0 scanlines, IEND."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("png_encode expects a 2-D grayscale array")
    h, w = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = np.concatenate(
        [np.concatenate([[0], row]) for row in px.astype(np.uint8)]
    ).astype(np.uint8).tobytes() if h else b""
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, w: int, h: int) -> np.ndarray:
    """Undo per-scanline filters for 1 byte/pixel (RFC 2083 §6.2-6.6)."""
    out = np.zeros((h, w), dtype=np.uint8)
    stride = w + 1
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        ftype = line[0]
        cur = np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 1:  # Sub
            rec = cur.copy()
            for x in range(1, w):
                rec[x] = (rec[x] + rec[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = cur.copy()
            rec[0] = (rec[0] + prev[0] // 2) & 0xFF
            for x in range(1, w):
                rec[x] = (rec[x] + (rec[x - 1] + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            rec = cur.copy()
            for x in range(w):
                a = rec[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Parse chunks, inflate IDAT, unfilter → 2-D uint8 grayscale."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    h = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise NotImplementedError(
                    "only 8-bit grayscale PNG is supported (stdlib codec)"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + body + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    if len(raw) != (w + 1) * h:
        raise ValueError("PNG scanline size mismatch")
    return _unfilter(raw, w, h)


def wav_encode(pcm: np.ndarray, sample_rate: int) -> bytes:
    """PCM-16 mono WAV via the stdlib ``wave`` writer."""
    import io
    import wave

    samples = np.asarray(pcm, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 sample array, sample_rate); mono PCM-16 only."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2 or f.getnchannels() != 1:
            raise NotImplementedError(
                "only mono PCM-16 WAV is supported (stdlib codec)"
            )
        sr = f.getframerate()
        pcm = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2")
    return pcm, sr
