"""Minimal pure-Python image codecs (PNG / BMP / RAW) on numpy + stdlib zlib.

No PIL exists in this environment (SURVEY.md §0); these codecs back the
fixtures generator (encode) and the sampled PSNR fidelity pass (decode).
All three formats are lossless here, so decoded pixels are bit-exact and
PSNR is +inf ≥ 40 dB (BASELINE.json:15 fidelity clause; SURVEY.md §7 notes
``jpeg`` rows appear only as format-violation plants, never PSNR-checked).

Pixel arrays are uint8, shape (h, w, 3), RGB.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    # filter byte 0 (None) per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = px.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    out = np.empty((h, w * 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        f, line = raw[y, 0], raw[y, 1:]
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 1:  # Sub (bpp=3)
            cur = line.astype(np.int16).copy()
            for x in range(3, w * 3):
                cur[x] = (cur[x] + cur[x - 3]) & 0xFF
            out[y] = cur.astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {f}")
        prev = out[y]
    return out.reshape(h, w, 3)


def bmp_encode(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    bgr = px[::-1, :, ::-1]  # bottom-up, BGR
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + dib + body


def bmp_decode(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    rows = np.frombuffer(data[offset : offset + (row_bytes + pad) * h], dtype=np.uint8)
    rows = rows.reshape(h, row_bytes + pad)[:, :row_bytes]
    return rows.reshape(h, w, 3)[::-1, :, ::-1].copy()


def raw_encode(px: np.ndarray) -> bytes:
    return px.tobytes()  # row-major RGB, w*h*3 bytes (FIXTURES.md §1)


def raw_decode(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3).copy()


def encode(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(px)
    if fmt == "bmp":
        return bmp_encode(px)
    if fmt in ("raw", "jpeg", "webp"):
        # jpeg/webp are plant-only formats: store RAW payload so the bytes
        # column is well-formed; format checks flag the fmt value itself.
        return raw_encode(px)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "bmp":
        return bmp_decode(data)
    return raw_decode(data, w, h)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; +inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
