"""Pure-Python LZ4-block and Blosc(v1)-frame codecs.

Real CMIP6/Pangeo cloud Zarr stores default to the numcodecs Blosc compressor
with cname="lz4" (zarr-python's default), so reading them needs exactly two
small public formats:

  * the LZ4 *block* format (lz4.github.io/lz4/lz4_Block_format.html): a
    sequence stream of [token][literals][2-byte offset][matchlen] with
    15-run-length extension bytes;
  * the c-blosc1 frame (c-blosc README_HEADER.rst): a 16-byte header
    (version, versionlz, flags, typesize, nbytes, blocksize, cbytes) followed
    by per-block start offsets and per-block streams, each stream prefixed by
    an int32 compressed size; flags carry byte/bit-shuffle, memcpy mode, the
    "blocks are not split" bit (0x10) and the compressor code in bits 5-7.

Same codec-from-spec pattern as sources/png.py and sources/hdf5.py: built
from struct/numpy primitives, not a port of the C libraries. Reference
ingest surface: the reference imports whatever its I/O servers can decode
(oph_json_objkeys.h:114-117); Zarr+blosc is the cloud-era equivalent.

When pyarrow's bundled C codecs are present (they are in this environment),
lz4 streams decode through pyarrow's lz4_raw for speed and the pure-Python
decoder stays as the dependency-free fallback; blosc frames carrying
snappy/zstd streams decode through pyarrow as well (sources/codecs.py).

Scale notes: decompression happens executor-side, one chunk per task (see
operators/io_ops.py oph_importzarr), so the pure-Python cost parallelizes
across the cluster. The match-copy uses slice/period tricks rather than
per-byte loops; the compressor is a greedy 4-byte hash matcher (format-
conformant output, not libz4-ratio-identical — any conformant stream is
valid).
"""

from __future__ import annotations

import struct

import numpy as np


class Lz4Error(ValueError):
    """Named error for malformed LZ4 block streams."""


class BloscError(ValueError):
    """Named error for Blosc frames outside the implemented subset."""


# ---------------------------------------------------------------------------
# LZ4 block format
# ---------------------------------------------------------------------------

def lz4_decompress_block(src: bytes, dst_size: int | None = None) -> bytes:
    """Decode one LZ4 block. `dst_size`, when given, is validated."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        # literal run (high nibble, 15 => extension bytes of 255 + last)
        ll = token >> 4
        if ll == 15:
            while True:
                if i >= n:
                    raise Lz4Error("truncated literal-length extension")
                b = src[i]
                i += 1
                ll += b
                if b != 255:
                    break
        if i + ll > n:
            raise Lz4Error("literal run past end of block")
        out += src[i : i + ll]
        i += ll
        if i == n:
            break  # last sequence is literals-only by spec
        if i + 2 > n:
            raise Lz4Error("truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise Lz4Error("zero match offset")
        ml = token & 0xF
        if ml == 15:
            while True:
                if i >= n:
                    raise Lz4Error("truncated match-length extension")
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        ml += 4  # minmatch
        start = len(out) - offset
        if start < 0:
            raise Lz4Error("match offset before start of output")
        if offset >= ml:
            out += out[start : start + ml]
        else:
            # overlapping match repeats a period-`offset` pattern
            pattern = out[start:]
            reps = ml // offset + 1
            out += (pattern * reps)[:ml]
    if dst_size is not None and len(out) != dst_size:
        raise Lz4Error(f"decoded {len(out)} bytes, expected {dst_size}")
    return bytes(out)


def _emit_run(out: bytearray, length: int) -> None:
    rem = length - 15
    while rem >= 255:
        out.append(255)
        rem -= 255
    out.append(rem)


def lz4_compress_block(src: bytes) -> bytes:
    """Greedy LZ4 block encoder (4-byte hash matches, format-conformant)."""
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x00"
    table: dict[bytes, int] = {}
    i = anchor = 0
    limit = n - 12  # spec: last match must start >= 12 bytes before the end
    while i < limit:
        key = src[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF:
            m, k, maxm = i + 4, j + 4, n - 5  # last 5 bytes stay literals
            while m < maxm and src[m] == src[k]:
                m += 1
                k += 1
            lit = src[anchor:i]
            ml = m - i - 4
            token = (min(len(lit), 15) << 4) | min(ml, 15)
            out.append(token)
            if len(lit) >= 15:
                _emit_run(out, len(lit))
            out += lit
            out += (i - j).to_bytes(2, "little")
            if ml >= 15:
                _emit_run(out, ml)
            i = anchor = m
        else:
            i += 1
    lit = src[anchor:]
    out.append(min(len(lit), 15) << 4)
    if len(lit) >= 15:
        _emit_run(out, len(lit))
    out += lit
    return bytes(out)


# ---------------------------------------------------------------------------
# Blosc v1 frame
# ---------------------------------------------------------------------------

_SHUFFLE = 0x1
_MEMCPYED = 0x2
_BITSHUFFLE = 0x4
_DONT_SPLIT = 0x10
_CODEC_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_MAX_SPLITS = 16
_MIN_BUFFERSIZE = 128


def _unshuffle(buf: bytes, typesize: int) -> bytes:
    """Inverse byte-shuffle: gather each element's bytes back together.
    Trailing bytes that don't fill a whole element are stored verbatim."""
    if typesize <= 1 or len(buf) < typesize:
        return buf
    nel = len(buf) // typesize
    body = nel * typesize
    arr = np.frombuffer(buf[:body], np.uint8).reshape(typesize, nel)
    return arr.T.tobytes() + buf[body:]


def _shuffle(buf: bytes, typesize: int) -> bytes:
    if typesize <= 1 or len(buf) < typesize:
        return buf
    nel = len(buf) // typesize
    body = nel * typesize
    arr = np.frombuffer(buf[:body], np.uint8).reshape(nel, typesize)
    return arr.T.tobytes() + buf[body:]


def _decode_stream(frame: bytes, pos: int, neblock: int, codec: int) -> tuple[bytes, int]:
    """One [int32 csize][payload] stream -> (decoded bytes, next position)."""
    if pos + 4 > len(frame):
        raise BloscError("truncated stream header")
    (csize,) = struct.unpack_from("<i", frame, pos)
    pos += 4
    if csize < 0 or pos + csize > len(frame):
        raise BloscError("stream size out of bounds")
    payload = frame[pos : pos + csize]
    pos += csize
    if csize == neblock:  # stored uncompressed
        return payload, pos
    if codec == 1:
        # fast path: pyarrow's bundled C lz4 (raw-block format); the
        # pure-Python decoder stays as the no-pyarrow fallback
        from ophidia_server_spark.sources import codecs

        if codecs.have("lz4_raw"):
            try:
                return codecs.decompress("lz4_raw", payload, neblock), pos
            except ValueError as exc:
                raise BloscError(f"lz4 stream: {exc}") from exc
        return lz4_decompress_block(payload, neblock), pos
    if codec == 3:
        import zlib

        data = zlib.decompress(payload)
        if len(data) != neblock:
            raise BloscError(f"zlib stream decoded {len(data)} != {neblock}")
        return data, pos
    if codec in (2, 4):  # snappy / zstd via pyarrow's bundled codecs
        from ophidia_server_spark.sources import codecs

        name = "snappy" if codec == 2 else "zstd"
        try:
            return codecs.decompress(name, payload, neblock), pos
        except codecs.CodecUnavailable as exc:
            raise BloscError(f"blosc {name} stream: {exc}") from exc
        except ValueError as exc:
            raise BloscError(f"blosc {name} stream: {exc}") from exc
    raise BloscError(
        f"blosc compressor {_CODEC_NAMES.get(codec, codec)!r} unsupported "
        "(lz4/zlib/snappy/zstd only)"
    )


def blosc_decompress(frame: bytes) -> bytes:
    """Decode a c-blosc1 frame (the numcodecs Blosc chunk payload)."""
    if len(frame) < 16:
        raise BloscError("frame shorter than the 16-byte header")
    version, _versionlz, flags, typesize = frame[0], frame[1], frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    if version < 1 or version > 2:
        raise BloscError(f"blosc format version {version} unsupported")
    if cbytes != len(frame):
        raise BloscError(f"cbytes field {cbytes} != frame length {len(frame)}")
    if flags & _BITSHUFFLE:
        raise BloscError("blosc bit-shuffle filter unsupported (byte-shuffle only)")
    if nbytes == 0:
        return b""
    if flags & _MEMCPYED:
        if len(frame) < 16 + nbytes:
            raise BloscError("memcpy frame shorter than nbytes")
        return frame[16 : 16 + nbytes]

    codec = flags >> 5
    if blocksize == 0:
        raise BloscError("blosc frame declares blocksize 0 with data present")
    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = struct.unpack_from(f"<{nblocks}I", frame, 16)
    out = bytearray()
    for bi in range(nblocks):
        bsize = min(blocksize, nbytes - bi * blocksize)
        # split decision (c-blosc1: flags bit 4 says "not split"; split needs
        # whole typesize rows and a non-trivial stream size); pre-1.14 frames
        # don't carry the bit, so validate and fall back to the other choice
        want_split = (
            not (flags & _DONT_SPLIT)
            and 1 < typesize <= _MAX_SPLITS
            and blocksize // typesize >= _MIN_BUFFERSIZE
            and bsize % typesize == 0
        )
        candidates = [typesize, 1] if want_split else [1, typesize]
        candidates = [s for s in dict.fromkeys(candidates) if s == 1 or bsize % s == 0]
        block = None
        for ci, nsplits in enumerate(candidates):
            try:
                pos = bstarts[bi]
                parts = []
                for _ in range(nsplits):
                    part, pos = _decode_stream(frame, pos, bsize // nsplits, codec)
                    parts.append(part)
                block = b"".join(parts)
                break
            except (BloscError, Lz4Error):
                if ci == len(candidates) - 1:
                    raise
        if flags & _SHUFFLE:
            block = _unshuffle(block, typesize)
        out += block
    if len(out) != nbytes:
        raise BloscError(f"decoded {len(out)} bytes, expected {nbytes}")
    return bytes(out)


def blosc_compress(
    raw: bytes, typesize: int = 8, *, shuffle: bool = True,
    blocksize: int = 1 << 20, cname: str = "lz4",
) -> bytes:
    """Encode a c-blosc1 frame readable by any blosc implementation.

    Writes unsplit blocks (flag 0x10) with the lz4 codec; falls back to
    memcpy mode when compression doesn't pay. `blocksize` is snapped to a
    typesize multiple.
    """
    if cname != "lz4":
        raise BloscError(f"blosc_compress supports cname='lz4' only, got {cname!r}")
    nbytes = len(raw)
    typesize = max(1, min(typesize, 255))
    do_shuffle = shuffle and typesize > 1
    flags = _DONT_SPLIT | (1 << 5) | (_SHUFFLE if do_shuffle else 0)
    if nbytes == 0:
        return struct.pack("<BBBBIII", 2, 1, flags, typesize, 0, 0, 16)
    blocksize = max(typesize, min(blocksize, nbytes))
    blocksize -= blocksize % typesize
    nblocks = (nbytes + blocksize - 1) // blocksize

    streams = []
    for bi in range(nblocks):
        chunk = raw[bi * blocksize : (bi + 1) * blocksize]
        if do_shuffle:
            chunk = _shuffle(chunk, typesize)
        comp = lz4_compress_block(chunk)
        if len(comp) >= len(chunk):  # stored stream: csize == neblock
            comp = chunk
        streams.append(struct.pack("<i", len(comp)) + comp)

    header_len = 16 + 4 * nblocks
    total = header_len + sum(len(s) for s in streams)
    if total >= nbytes + 16:  # compression doesn't pay: memcpy mode
        return (
            struct.pack(
                "<BBBBIII", 2, 1, _MEMCPYED | (1 << 5), typesize,
                nbytes, blocksize, nbytes + 16,
            )
            + raw
        )
    bstarts, pos = [], header_len
    for s in streams:
        bstarts.append(pos)
        pos += len(s)
    return b"".join(
        [
            struct.pack(
                "<BBBBIII", 2, 1, flags, typesize, nbytes, blocksize, total
            ),
            struct.pack(f"<{nblocks}I", *bstarts),
            *streams,
        ]
    )
