"""BMP codec tests: roundtrips, handmade top-down payloads, named errors."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ophidia_server_spark.sources import bmp


def test_roundtrip_with_row_padding():
    # width 5 -> 15-byte rows padded to 16: the 4-byte-stride path
    img = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
    buf = bmp.encode(img)
    assert buf[:2] == b"BM"
    assert np.array_equal(bmp.decode(buf), img)


def test_handmade_topdown_payload():
    # negative height = top-down row order per the spec
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    rows = b"".join(
        bytes(img[r][:, ::-1].tobytes()) + b"\x00\x00" for r in range(2)
    )  # stride 8
    info = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    buf = b"BM" + struct.pack("<IHHI", 14 + 40 + len(rows), 0, 0, 54) + info + rows
    assert np.array_equal(bmp.decode(buf), img)


def test_named_errors():
    with pytest.raises(bmp.BmpError, match="not a BMP"):
        bmp.decode(b"PNG...............................................................")
    img = np.zeros((1, 1, 3), np.uint8)
    buf = bytearray(bmp.encode(img))
    struct.pack_into("<H", buf, 28, 8)  # claim 8-bit
    with pytest.raises(bmp.BmpError, match="8-bit"):
        bmp.decode(bytes(buf))
    with pytest.raises(bmp.BmpError, match="truncated"):
        bmp.decode(bmp.encode(np.zeros((4, 4, 3), np.uint8))[:-8])
