"""GIF codec goldens: LZW vectors, structural layout, interlace, animation
composite semantics (transparency + disposal), and the palette guard."""

import struct

import numpy as np
import pytest

from ophidia_server_spark.sources import gif


def _pal(n=16):
    return np.array([[17 * k, 5 * k, 11 * k] for k in range(n)], dtype=np.uint8)


def test_lzw_roundtrip_vectors():
    for min_code in (2, 4, 8):
        for data in (b"", b"\x00", b"\x01\x01\x01\x01", bytes(range(4)) * 50,
                     np.random.RandomState(0).randint(0, 1 << min_code, 5000)
                     .astype("uint8").tobytes()):
            comp = gif._lzw_encode(data, min_code)
            assert gif._lzw_decode(comp, min_code, len(data)) == data, (min_code, len(data))


def test_single_frame_roundtrip_and_structure():
    rng = np.random.RandomState(7)
    f = _pal()[rng.randint(0, 16, (9, 11))]
    buf = gif.encode(f)
    # structural goldens at spec offsets
    assert buf[:6] == b"GIF87a"
    w, h, packed, bg, aspect = struct.unpack_from("<HHBBB", buf, 6)
    assert (w, h) == (11, 9)
    assert packed & 0x80  # global color table present
    assert buf[-1] == 0x3B  # trailer
    d = gif.decode(buf)
    assert np.array_equal(d["frames"][0], f)
    assert d["version"] == "87a"


def test_animation_roundtrip_with_delays():
    rng = np.random.RandomState(9)
    frames = [_pal()[rng.randint(0, 16, (6, 8))] for _ in range(3)]
    buf = gif.encode(frames, delays_cs=[5, 10, 15])
    assert buf[:6] == b"GIF89a"
    d = gif.decode(buf)
    assert len(d["frames"]) == 3 and d["delays_cs"] == [5, 10, 15]
    for got, want in zip(d["frames"], frames):
        assert np.array_equal(got, want)


def test_interlaced_image_deinterlaces():
    # craft an interlaced frame by hand: encode normally, then rebuild the
    # image block with the interlace flag and pass-ordered rows
    f = _pal()[np.arange(80).reshape(10, 8) % 16]
    plain = gif.encode(f)
    h, w = f.shape[:2]
    colors = np.unique(f.reshape(-1, 3), axis=0)
    lut = {tuple(c): i for i, c in enumerate(colors)}
    idx = np.array([[lut[tuple(px)] for px in row] for row in f], dtype=np.uint8)
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for y in range(start, h, step)]
    inter = idx[order]
    comp = gif._lzw_encode(inter.tobytes(), 4)
    blocks = b"".join(
        bytes([len(comp[i:i + 255])]) + comp[i:i + 255]
        for i in range(0, len(comp), 255)
    ) + b"\x00"
    # header length is structural (0x2c can legally appear inside the
    # palette bytes, so searching for it is wrong)
    gct_size = 2 << (plain[10] & 0x07)
    head_end = 13 + 3 * gct_size
    rebuilt = (
        plain[:head_end]
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)
        + bytes([4]) + blocks + b"\x3b"
    )
    d = gif.decode(rebuilt)
    assert np.array_equal(d["frames"][0], f)


def test_transparency_composites_over_previous_frame():
    # frame 2 marks index 0 transparent: those pixels must keep frame 1's
    # colors in the rendered composite
    pal = _pal(4)
    f0 = pal[np.full((4, 4), 3, dtype=np.uint8)]
    buf = gif.encode([f0, pal[np.array([[0, 1]] * 2 + [[1, 0]] * 2, dtype=np.uint8)
                              .repeat(2, axis=1)]])
    # rewrite frame 2's graphic control to set the transparency flag on the
    # palette index of color 0 (find color 0's index in the encoded table)
    d_plain = gif.decode(buf)
    # hand-build instead: full control over indices
    colors = np.unique(np.concatenate([pal[:4]]).reshape(-1, 3), axis=0)
    lut = {tuple(c): i for i, c in enumerate(colors)}
    t_idx = lut[tuple(pal[0])]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
    table = np.zeros((4, 3), np.uint8)
    table[: len(colors)] = colors
    out += table.tobytes()
    idx0 = np.full((4, 4), lut[tuple(pal[3])], dtype=np.uint8)
    idx1 = np.array([[t_idx, lut[tuple(pal[1])]] * 2] * 4, dtype=np.uint8)
    for fi, idx in enumerate((idx0, idx1)):
        flags = 0x01 if fi == 1 else 0x00  # transparency on frame 2
        out += b"\x21\xf9\x04" + struct.pack("<BHB", flags, 0, t_idx) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
        out += bytes([2])
        comp = gif._lzw_encode(idx.tobytes(), 2)
        out += bytes([len(comp)]) + comp + b"\x00"
    out += b"\x3b"
    d = gif.decode(bytes(out))
    assert len(d["frames"]) == 2
    got = d["frames"][1]
    # transparent pixels show frame 1's color (pal[3]); others pal[1]
    assert np.array_equal(got[0, 0], pal[3])
    assert np.array_equal(got[0, 1], pal[1])


def test_rejects_outside_subset():
    with pytest.raises(gif.GifError, match="not a GIF"):
        gif.decode(b"NOPE")
    arr = np.zeros((20, 20, 3), np.uint8)
    arr[..., 0] = np.arange(400).reshape(20, 20) % 256
    arr[..., 1] = np.arange(400).reshape(20, 20) // 256
    with pytest.raises(gif.GifError, match="256-entry"):
        gif.encode(arr)
    with pytest.raises(gif.GifError, match="share one size"):
        gif.encode([np.zeros((2, 2, 3), np.uint8), np.zeros((3, 3, 3), np.uint8)])


def test_disposal_restore_previous_and_reserved_rejected():
    # three frames: base canvas, an overlay with disposal=3 (restore
    # previous), then a tiny patch — frame 3's composite must start from
    # frame 1's canvas (the overlay undone), not from frame 2's
    colors = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                      np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
    out += colors.tobytes()
    idx0 = np.full((4, 4), 0, dtype=np.uint8)        # all dark
    idx1 = np.full((4, 4), 1, dtype=np.uint8)        # all red overlay
    idx2 = np.full((1, 1), 2, dtype=np.uint8)        # one green pixel
    specs = [
        (idx0, 0, (0, 0, 4, 4)),   # disposal none
        (idx1, 3, (0, 0, 4, 4)),   # disposal restore-previous
        (idx2, 0, (0, 0, 1, 1)),
    ]
    for idx, disp, (x, y, w, h) in specs:
        out += b"\x21\xf9\x04" + struct.pack("<BHB", disp << 2, 0, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", x, y, w, h, 0)
        out += bytes([2])
        comp = gif._lzw_encode(idx.tobytes(), 2)
        out += bytes([len(comp)]) + comp + b"\x00"
    out += b"\x3b"
    d = gif.decode(bytes(out))
    assert len(d["frames"]) == 3
    assert np.array_equal(d["frames"][1][0, 0], colors[1])  # overlay visible
    f2 = d["frames"][2]
    assert np.array_equal(f2[0, 0], colors[2])              # new patch
    assert np.array_equal(f2[3, 3], colors[0])              # overlay undone
    # reserved disposal methods must raise, not composite wrong
    bad = bytearray(out)
    gce_at = bytes(out).index(b"\x21\xf9\x04")
    bad[gce_at + 3] = 4 << 2
    with pytest.raises(gif.GifError, match="disposal"):
        gif.decode(bytes(bad))
