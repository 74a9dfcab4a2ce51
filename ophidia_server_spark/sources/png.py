"""Pure-Python PNG codec (decode + minimal encode) over stdlib zlib.

The PNG format is a small public spec (RFC 2083 / W3C PNG): length-tagged
chunks, an IHDR header, zlib-compressed IDAT scanlines, five per-row byte
filters. The container has no image libraries, so the engine decodes PNG
directly — this feeds the real resize kernel in pipeline/multimodal.py
(reference ingest treats images as opaque payloads; decode parity target is
the spec itself, not a library).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA), non-interlaced. Everything else raises with the
exact unsupported field named. Decode cost is one pass per file; at corpus
scale each executor task decodes its own payloads inside mapInPandas, so
this module stays driver-free.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(buf: bytes):
    pos = 8
    while pos + 8 <= len(buf):
        (length,), tag = struct.unpack(">I", buf[pos : pos + 4]), buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        yield tag, data
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode(buf: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array. Palette images
    come back expanded to RGB."""
    if buf[:8] != MAGIC:
        raise ValueError("not a PNG file (bad magic)")
    w = h = None
    color_type = None
    palette = None
    idat = bytearray()
    for tag, data in _chunks(buf):
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            if comp or filt:
                raise ValueError("nonstandard PNG compression/filter method")
        elif tag == b"PLTE":
            palette = np.frombuffer(data, dtype="uint8").reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(data)
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong size")
    out = np.empty((h, stride), dtype="uint8")
    prev = np.zeros(stride, dtype="uint8")
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype="uint8", count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:
            pass
        elif ftype == 2:  # up
            row += prev
        elif ftype in (1, 3, 4):  # sub / average / paeth need left-to-right
            line = row.astype("int32")
            pr = prev.astype("int32")
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                if ftype == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    line[x] = (line[x] + (a + pr[x]) // 2) & 0xFF
                else:
                    c = pr[x - ch] if x >= ch else 0
                    line[x] = (line[x] + _paeth(a, pr[x], c)) & 0xFF
            row = line.astype("uint8")
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = row
        prev = row
    img = out.reshape(h, w, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        img = palette[img[:, :, 0]]
    return img


def encode(img: np.ndarray) -> bytes:
    """(h, w[, channels]) uint8 array -> PNG bytes (filter 0, one IDAT).
    The write-side twin used to build image payloads in tests/pipelines."""
    arr = np.asarray(img, dtype="uint8")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"cannot encode {ch}-channel image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    return (
        MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan, 6))
        + chunk(b"IEND", b"")
    )
