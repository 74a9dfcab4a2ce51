"""Pure-Python BMP codec (24-bit BI_RGB) — read + write.

Same codec-from-spec pattern as sources/png.py and sources/wav.py: the
Windows BITMAPFILEHEADER/BITMAPINFOHEADER layout is a tiny public format, so
real image ingest of uncompressed bitmaps needs no external library.
Supported: 24-bit uncompressed (BI_RGB) with an info header of >= 40 bytes,
top-down or bottom-up row order, 4-byte row padding. Everything else raises
a named BmpError.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"BM"


class BmpError(ValueError):
    """Named error for BMP payloads outside the implemented subset."""


def decode(buf: bytes) -> np.ndarray:
    """Decode a BMP payload -> uint8 RGB array [height, width, 3]."""
    if len(buf) < 54 or buf[:2] != MAGIC:
        raise BmpError("not a BMP payload")
    (off,) = struct.unpack_from("<I", buf, 10)
    (hsize,) = struct.unpack_from("<I", buf, 14)
    if hsize < 40:
        raise BmpError("BITMAPCOREHEADER (OS/2) unsupported (40-byte+ info header only)")
    w, h = struct.unpack_from("<ii", buf, 18)
    _planes, bpp = struct.unpack_from("<HH", buf, 26)
    (comp,) = struct.unpack_from("<I", buf, 30)
    if bpp != 24 or comp != 0:
        raise BmpError(f"{bpp}-bit / compression {comp} unsupported (24-bit BI_RGB only)")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise BmpError("non-positive BMP dimensions")
    stride = (w * 3 + 3) & ~3
    if off + stride * h > len(buf):
        raise BmpError("BMP pixel data truncated")
    img = np.zeros((h, w, 3), np.uint8)
    for r in range(h):
        rowb = buf[off + r * stride : off + r * stride + w * 3]
        row = np.frombuffer(rowb, np.uint8).reshape(w, 3)[:, ::-1]  # BGR -> RGB
        img[h - 1 - r if bottom_up else r] = row
    return img


def encode(img: np.ndarray) -> bytes:
    """Encode a uint8 RGB array [h, w, 3] as a bottom-up 24-bit BMP."""
    arr = np.asarray(img, np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise BmpError("encode expects [h, w, 3] RGB")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h - 1, -1, -1):
        row = np.ascontiguousarray(arr[r][:, ::-1]).tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    data = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return MAGIC + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54) + info + data
