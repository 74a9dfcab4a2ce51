"""Baseline JPEG codec (sources/jpeg.py, from the public ITU-T T.81 spec):
handcrafted golden streams with pixel values derivable by hand, encoder/
decoder roundtrips across gray/RGB/subsampling/restarts/odd sizes, and the
named refusal for unsupported processes."""

import struct

import numpy as np
import pytest

from ophidia_server_spark.sources import jpeg


def _handcrafted(dc_category: int, dc_bits: int) -> bytes:
    """A fully hand-assembled 8x8 grayscale baseline JPEG: identity quant
    table, a 3-bit DC Huffman table for categories 0-7, a 1-bit AC table
    holding only EOB. Every byte below is written from the spec, not from
    the encoder under test."""
    out = bytearray(b"\xff\xd8")
    # DQT: table 0, 8-bit, all ones
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    # SOF0: 8-bit, 8x8, 1 component, sampling 1x1, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 11) + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0]
    )
    # DHT DC table 0: categories 0..7 as the eight 3-bit codes
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 8) + b"\x00" + bytes(
        [0, 0, 8] + [0] * 13
    ) + bytes(range(8))
    # DHT AC table 0: the single symbol 0x00 (EOB) as the 1-bit code 0
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + b"\x10" + bytes(
        [1] + [0] * 15
    ) + b"\x00"
    # SOS: 1 component, DC/AC table 0
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    # entropy bits: DC category code (3 bits = the category itself), its
    # magnitude bits, then EOB (one 0 bit); pad with 1s
    bits = f"{dc_category:03b}"
    if dc_category:
        bits += format(dc_bits, f"0{dc_category}b")
    bits += "0"
    bits += "1" * (-len(bits) % 8)
    for i in range(0, len(bits), 8):
        b = int(bits[i:i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    out += b"\xff\xd9"
    return bytes(out)


def test_handcrafted_zero_dc_decodes_to_flat_128():
    # DC category 0 => coefficient 0 => IDCT(0) + 128 = 128 everywhere
    img = jpeg.decode(_handcrafted(0, 0))
    assert img.shape == (8, 8, 1)
    assert (img == 128).all()


def test_handcrafted_dc_127_decodes_to_flat_144():
    # category 7, magnitude bits 1111111 => EXTEND gives +127; quant 1 so
    # the block's only coefficient is DC=127; IDCT spreads 127/8 = 15.875
    # over the block => 143.875 -> rounds to 144 everywhere
    img = jpeg.decode(_handcrafted(7, 0b1111111))
    assert img.shape == (8, 8, 1)
    assert (img == 144).all()


def test_handcrafted_negative_dc_extend():
    # category 7, magnitude bits 0000000 => EXTEND maps to -127 (T.81
    # F.2.2.1: v < 2^(t-1) => v - 2^t + 1) => 128 - 15.875 -> 112
    img = jpeg.decode(_handcrafted(7, 0))
    assert (img == 112).all()


def test_solid_grayscale_is_exact_at_quality_75():
    # the gate query's invariant: at quality 75 the Annex-K luminance DC
    # step is 8, exactly the DCT DC gain, so solid images roundtrip exactly
    for v in (20, 77, 128, 219):
        img = np.full((13, 21, 1), v, dtype=np.uint8)
        out = jpeg.decode(jpeg.encode(img, quality=75))
        assert out.shape == (13, 21, 1)
        assert (out == v).all()


def test_gradient_roundtrip_within_tolerance():
    x = np.linspace(0, 255, 64)
    img = np.tile(x, (48, 1)).astype(np.uint8)[:, :, None]
    out = jpeg.decode(jpeg.encode(img, quality=90))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 4


def test_rgb_444_and_420_roundtrip():
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], -1
    ).astype(np.uint8)
    for sub, tol in (("444", 4), ("420", 8)):
        out = jpeg.decode(jpeg.encode(img, quality=92, subsampling=sub))
        assert out.shape == (40, 56, 3)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= tol


def test_restart_markers_do_not_change_pixels():
    img = np.tile(np.linspace(0, 255, 40), (24, 1)).astype(np.uint8)[:, :, None]
    a = jpeg.decode(jpeg.encode(img, quality=85))
    b = jpeg.decode(jpeg.encode(img, quality=85, restart_interval=2))
    with_rst = jpeg.encode(img, quality=85, restart_interval=2)
    assert b"\xff\xdd" in with_rst and b"\xff\xd0" in with_rst
    assert (a == b).all()


def test_odd_sizes_crop_exactly():
    img = np.full((9, 10, 3), 99, dtype=np.uint8)
    out = jpeg.decode(jpeg.encode(img, quality=75, subsampling="420"))
    assert out.shape == (9, 10, 3)
    assert (out == 99).all()


def test_progressive_is_refused_by_name():
    bad = b"\xff\xd8\xff\xc2" + struct.pack(">H", 11) + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0]
    ) + b"\xff\xd9"
    with pytest.raises(ValueError, match="0xFFC2"):
        jpeg.decode(bad)


def test_truncated_and_garbage_raise_not_crash():
    with pytest.raises(ValueError):
        jpeg.decode(b"\x00\x01\x02")
    full = jpeg.encode(np.full((8, 8, 1), 50, dtype=np.uint8))
    with pytest.raises(Exception):
        jpeg.decode(full[:20])


def test_decode_images_dispatches_jpeg(spark):
    import pandas as pd

    from ophidia_server_spark.pipeline import multimodal as mm

    payloads = [
        jpeg.encode(np.full((6, 11, 1), 90, dtype=np.uint8)),
        b"not an image at all",
    ]
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": payloads})
    df = spark.createDataFrame(pdf)
    rows = {r["doc_id"]: r for r in mm.decode_images(df).collect()}
    assert rows[1]["width"] == 11 and rows[1]["height"] == 6
    assert rows[2]["width"] == len(payloads[1]) % 640


def test_decode_jpeg_features_poison_tolerant(spark):
    import pandas as pd

    from ophidia_server_spark.pipeline import multimodal as mm

    img = np.full((4, 5, 1), 30, dtype=np.uint8)
    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "payload": [jpeg.encode(img, quality=75), b"\xff\xd8garbage"],
    })
    rows = {r["doc_id"]: r for r in
            mm.decode_jpeg_features(spark.createDataFrame(pdf)).collect()}
    assert rows[1]["ok"] == 1 and rows[1]["mean_pixel"] == 30
    assert rows[1]["sum_pixels"] == 30 * 4 * 5 and rows[1]["channels"] == 1
    assert rows[2]["ok"] == 0
