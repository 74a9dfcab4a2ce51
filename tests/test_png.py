"""PNG codec: exact-pixel fidelity against hand-assembled files exercising
every scanline filter type, palette expansion, and the decode->resize
pipeline through Spark (pipeline/multimodal.py)."""

import struct
import zlib

import numpy as np
import pytest

from ophidia_server_spark.sources import png


def _chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return struct.pack(">I", len(data)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def _manual_png(w, h, color_type, scanlines, plte=None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = png.MAGIC + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
    return out + _chunk(b"IEND", b"")


def test_decode_filter_types_golden():
    # 3x3 RGB, each row a different filter, assembled by hand from the spec:
    # row0 filter 0 (none), row1 filter 1 (sub), row2 filter 2 (up)
    row0 = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])
    # actual row1 = [5,5,5, 15,25,35, 45,55,65]; sub stores delta vs left pixel
    row1 = bytes([5, 5, 5, 10, 20, 30, 30, 30, 30])
    # actual row2 = row1 + 1 per byte; up stores delta vs previous row
    row2 = bytes([1] * 9)
    buf = _manual_png(3, 3, 2, [b"\x00" + row0, b"\x01" + row1, b"\x02" + row2])
    img = png.decode(buf)
    want = np.array(
        [
            [[10, 20, 30], [40, 50, 60], [70, 80, 90]],
            [[5, 5, 5], [15, 25, 35], [45, 55, 65]],
            [[6, 6, 6], [16, 26, 36], [46, 56, 66]],
        ],
        dtype="uint8",
    )
    assert img.shape == (3, 3, 3)
    assert (img == want).all()


def test_decode_average_and_paeth_filters():
    # grayscale 4x2: row0 average (left/2 since no prev), row1 paeth
    # actual row0 = [8, 12, 14, 15]: avg filter stores x - (left+up)//2
    r0 = bytes([8, 12 - 4, 14 - 6, 15 - 7])
    # actual row1 = [10, 13, 15, 16]; paeth predictor picks nearest of
    # (left, up, up-left); compute stored deltas by replaying the predictor
    actual1 = [10, 13, 15, 16]
    prev = [8, 12, 14, 15]
    stored = []
    for x in range(4):
        a = actual1[x - 1] if x else 0
        c = prev[x - 1] if x else 0
        stored.append((actual1[x] - png._paeth(a, prev[x], c)) & 0xFF)
    buf = _manual_png(4, 2, 0, [b"\x03" + r0, b"\x04" + bytes(stored)])
    img = png.decode(buf)
    assert img[:, :, 0].tolist() == [[8, 12, 14, 15], actual1]


def test_decode_palette_expands_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    buf = _manual_png(3, 1, 3, [b"\x00" + bytes([0, 1, 2])], plte=plte)
    img = png.decode(buf)
    assert img.tolist() == [[[255, 0, 0], [0, 255, 0], [0, 0, 255]]]


def test_encode_decode_roundtrip_rgb_and_rgba():
    rng = np.random.default_rng(3)
    for ch in (1, 2, 3, 4):
        src = rng.integers(0, 256, size=(5, 7, ch), dtype=np.uint8)
        back = png.decode(png.encode(src))
        assert (back == src).all(), f"channels={ch}"


def test_decode_rejects_named_unsupported():
    with pytest.raises(ValueError, match="bad magic"):
        png.decode(b"JFIF" + b"\x00" * 32)
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    buf = png.MAGIC + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        png.decode(buf)


def test_decode_images_real_png_dimensions(spark):
    from ophidia_server_spark.pipeline import multimodal as mm

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(png.encode(img))),
        (2, bytearray(b"not a png at all........")),
        (3, bytearray(png.MAGIC + b"\x00" * 10)),  # poison PNG: truncated
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mm.decode_images(df).collect()}
    assert (got[1].width, got[1].height) == (9, 6)  # real IHDR, not a fake
    n2 = len(rows[1][1])
    assert (got[2].width, got[2].height) == (n2 % 640, n2 % 480)  # fake path
    assert got[3].width == len(rows[2][1]) % 640  # poison falls back per-row


def test_decode_resize_png_exact_pixels(spark):
    from ophidia_server_spark.pipeline import multimodal as mm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(png.encode(img))), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in mm.decode_resize_png(df, 4, 4).collect()}
    ys = (np.arange(4) * 8 // 4).astype("int64")
    want = img[np.ix_(ys, ys)]
    assert got[1].ok == 1 and (got[1].width, got[1].height) == (8, 8)
    assert bytes(got[1].resized) == want.tobytes()
    assert got[2].ok == 0 and bytes(got[2].resized) == b""
