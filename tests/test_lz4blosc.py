"""LZ4-block + Blosc-frame codec tests.

No lz4/blosc library exists in this container, so correctness rests on the
same three legs as the other from-spec codecs (test_hdf5.py):
  1. hand-built spec vectors decoded to known bytes (breaks circularity),
  2. roundtrips through our own encoder over varied data shapes,
  3. byte-level assertions that encoder output matches the public formats
     (LZ4 block format description; c-blosc README_HEADER.rst), plus named
     errors for the unsupported corners (zstd, bit-shuffle).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ophidia_server_spark.sources import lz4blosc as lb


# -- LZ4 spec vectors -------------------------------------------------------

def test_lz4_literals_only_vector():
    # token high nibble = literal count, no match after last literals
    assert lb.lz4_decompress_block(b"\x50hello") == b"hello"


def test_lz4_match_vector():
    # "abcd" + match(offset=4, len=8) = "abcd" * 3
    src = b"\x44abcd\x04\x00" + b"\x00"
    assert lb.lz4_decompress_block(src) == b"abcdabcdabcd"


def test_lz4_overlapping_rle_vector():
    # classic RLE: 1 literal + overlapping match offset 1 -> run of 16 "a"
    src = b"\x1ba\x01\x00" + b"\x00"
    assert lb.lz4_decompress_block(src) == b"a" * 16


def test_lz4_extended_lengths_vector():
    # literal run of 270 (15 + 255 + 0) then match len 19 (15-nibble + ext 0)
    lit = bytes(range(256)) + b"x" * 14
    src = b"\xff\xff\x00" + lit + b"\x0e\x00\x00" + b"\x00"
    out = lb.lz4_decompress_block(src)
    assert out == lit + lit[-14:] + lit[-14:-9]


def test_lz4_malformed_raises_named():
    with pytest.raises(lb.Lz4Error):
        lb.lz4_decompress_block(b"\x50he")  # literal run past end
    with pytest.raises(lb.Lz4Error):
        lb.lz4_decompress_block(b"\x14abc\x00\x00\x00")  # zero offset
    with pytest.raises(lb.Lz4Error):
        lb.lz4_decompress_block(b"\x14a\x09\x00\x00")  # offset before start
    with pytest.raises(lb.Lz4Error):
        lb.lz4_decompress_block(b"\x50hello", dst_size=99)


def test_lz4_roundtrip_shapes():
    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"a",
        b"abcd",
        b"hello world " * 400,
        bytes(rng.integers(0, 256, 10_000, dtype=np.uint8)),  # incompressible
        np.arange(4096, dtype="<f8").tobytes(),
        b"\x00" * 100_000,
        bytes(rng.integers(0, 4, 65_000, dtype=np.uint8)),
    ]
    for data in cases:
        comp = lb.lz4_compress_block(data)
        assert lb.lz4_decompress_block(comp, len(data)) == data


def test_lz4_compresses_repetitive_data():
    data = b"the quick brown fox " * 1000
    assert len(lb.lz4_compress_block(data)) < len(data) // 10


# -- Blosc frames -----------------------------------------------------------

def test_blosc_header_golden_bytes():
    data = np.arange(1024, dtype="<f8").tobytes()
    frame = lb.blosc_compress(data, typesize=8)
    version, versionlz, flags, typesize = frame[0], frame[1], frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    assert version == 2 and typesize == 8
    assert flags & 0x01          # byte-shuffle
    assert flags & 0x10          # blocks not split
    assert (flags >> 5) == 1     # compressor code: lz4
    assert nbytes == len(data) and cbytes == len(frame)
    assert 0 < blocksize <= nbytes and blocksize % 8 == 0


def test_blosc_roundtrip_multiblock_and_shuffle():
    data = np.linspace(0.0, 1.0, 50_000).astype("<f8").tobytes()
    for blocksize in (1 << 20, 4096, 1000):  # 1000 snaps to typesize multiple
        frame = lb.blosc_compress(data, typesize=8, blocksize=blocksize)
        assert lb.blosc_decompress(frame) == data
        assert len(frame) < len(data)  # beats memcpy on smooth data
    # shuffle makes the repeated-constant case collapse
    const = np.full(10_000, 3.14, "<f8").tobytes()
    assert len(lb.blosc_compress(const, typesize=8)) < len(const) // 20
    # no shuffle, typesize 1, empty payload
    assert lb.blosc_decompress(lb.blosc_compress(b"xyz" * 100, typesize=1)) == b"xyz" * 100
    assert lb.blosc_decompress(lb.blosc_compress(b"", typesize=4)) == b""


def test_blosc_memcpy_mode_for_incompressible():
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 256, 8192, dtype=np.uint8))
    frame = lb.blosc_compress(data, typesize=1)
    assert frame[2] & 0x02       # memcpy flag
    assert len(frame) == len(data) + 16
    assert lb.blosc_decompress(frame) == data


def _handmade_frame(data: bytes, typesize: int, blocksize: int, *, split: bool,
                    codec: int = 1, shuffle: bool = True) -> bytes:
    """Build a frame the way c-blosc lays it out, with explicit control over
    the split mode — covering the pre-1.14 split format our writer never
    emits (writer always sets the don't-split bit)."""
    nbytes = len(data)
    nblocks = (nbytes + blocksize - 1) // blocksize
    flags = (codec << 5) | (0x01 if shuffle else 0) | (0 if split else 0x10)
    blocks = []
    for bi in range(nblocks):
        chunk = data[bi * blocksize : (bi + 1) * blocksize]
        if shuffle:
            chunk = lb._shuffle(chunk, typesize)
        nsplits = typesize if split and len(chunk) % typesize == 0 else 1
        ne = len(chunk) // nsplits
        streams = b""
        for j in range(nsplits):
            part = chunk[j * ne : (j + 1) * ne]
            comp = zlib.compress(part) if codec == 3 else lb.lz4_compress_block(part)
            if len(comp) >= len(part):
                comp = part
            streams += struct.pack("<i", len(comp)) + comp
        blocks.append(streams)
    header_len = 16 + 4 * nblocks
    total = header_len + sum(map(len, blocks))
    bstarts, pos = [], header_len
    for b in blocks:
        bstarts.append(pos)
        pos += len(b)
    return (
        struct.pack("<BBBBIII", 2, 1, flags, typesize, nbytes, blocksize, total)
        + struct.pack(f"<{nblocks}I", *bstarts)
        + b"".join(blocks)
    )


def test_blosc_reads_split_frames():
    data = np.arange(6000, dtype="<i4").tobytes()
    frame = _handmade_frame(data, 4, 8192, split=True)
    assert lb.blosc_decompress(frame) == data
    # multi-block split with a leftover block
    frame2 = _handmade_frame(data, 4, 4096, split=True)
    assert lb.blosc_decompress(frame2) == data


def test_blosc_reads_zlib_codec_frames():
    data = np.arange(3000, dtype="<f8").tobytes()
    frame = _handmade_frame(data, 8, 8192, split=False, codec=3)
    assert lb.blosc_decompress(frame) == data


def test_blosc_unsupported_named_errors():
    data = b"abcd" * 100
    frame = bytearray(_handmade_frame(data, 4, 4096, split=False))
    frame[2] = (4 << 5) | 0x10   # zstd codec
    with pytest.raises(lb.BloscError, match="zstd"):
        lb.blosc_decompress(bytes(frame))
    frame[2] = (1 << 5) | 0x04   # bit-shuffle
    with pytest.raises(lb.BloscError, match="bit-shuffle"):
        lb.blosc_decompress(bytes(frame))
    with pytest.raises(lb.BloscError):
        lb.blosc_decompress(b"\x02\x01\x00\x08")  # truncated header
