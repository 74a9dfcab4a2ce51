"""Compression codec shims backed by pyarrow's bundled C codecs.

pyarrow (baked into this environment) ships zstd, lz4 (frame and raw-block),
and snappy codecs compiled into libarrow — no standalone python-lz4/zstandard
packages needed. This module is the one place that touches them:

  * `decompress(name, payload, size)` — raw one-shot decompression; pyarrow
    requires the exact decompressed size, which every caller here knows
    (HDF5 chunks, blosc streams and Zarr chunks all declare their decoded
    length in their own headers/metadata).
  * `zstd_decompress(frame, expected)` — zstd *frame* decode; when the caller
    doesn't know the size, the frame header's Frame_Content_Size field
    (RFC 8878 §3.1.1.1) is parsed instead. Real writers (numcodecs, the HDF5
    zstd plugin, c-blosc) all use the one-shot compressor, which always
    records FCS.
  * `zstd_compress(data, level)` — one-shot frame with FCS recorded.

The pure-Python LZ4 in lz4blosc.py remains the fallback when a pyarrow build
lacks a codec (`have()` gates every fast path), keeping the read path
dependency-free-correct and merely slower.
"""

from __future__ import annotations


class CodecUnavailable(ValueError):
    """Named error: the environment's pyarrow build lacks this codec."""


_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def _codec(name: str):
    try:
        import pyarrow as pa
    except ImportError as exc:  # pragma: no cover - pyarrow is baked in
        raise CodecUnavailable(f"pyarrow not importable ({exc})") from exc
    try:
        if not pa.Codec.is_available(name):
            raise CodecUnavailable(f"pyarrow build lacks codec {name!r}")
        return pa.Codec(name)
    except CodecUnavailable:
        raise
    except Exception as exc:
        raise CodecUnavailable(f"pyarrow codec {name!r}: {exc}") from exc


def have(name: str) -> bool:
    try:
        _codec(name)
        return True
    except CodecUnavailable:
        return False


def decompress(name: str, payload: bytes, size: int) -> bytes:
    """One-shot decompression of `payload` into exactly `size` bytes.

    `name` is a pyarrow codec name: 'zstd', 'snappy', 'lz4_raw' (the LZ4
    *block* format — what blosc streams and numcodecs LZ4 payloads contain),
    or 'lz4' (the LZ4 frame format).
    """
    try:
        out = bytes(_codec(name).decompress(payload, size))
    except CodecUnavailable:
        raise
    except Exception as exc:  # Arrow raises OSError subclasses on bad input
        raise ValueError(f"{name} payload invalid: {exc}") from exc
    if len(out) != size:
        raise ValueError(f"{name} decoded {len(out)} bytes, expected {size}")
    return out


def zstd_frame_content_size(frame: bytes) -> int | None:
    """Frame_Content_Size from a zstd frame header (RFC 8878 §3.1.1.1), or
    None when the writer omitted it (streaming mode with unknown size)."""
    if len(frame) < 6 or frame[:4] != _ZSTD_MAGIC:
        return None
    fhd = frame[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    dict_flag = fhd & 0x3
    pos = 5
    if not single_segment:
        pos += 1  # Window_Descriptor byte
    pos += (0, 1, 2, 4)[dict_flag]
    if fcs_flag == 0:
        # field present (1 byte) only in single-segment frames
        return frame[pos] if single_segment and pos < len(frame) else None
    nbytes = (0, 2, 4, 8)[fcs_flag]
    if pos + nbytes > len(frame):
        return None
    val = int.from_bytes(frame[pos : pos + nbytes], "little")
    return val + 256 if fcs_flag == 1 else val


def zstd_decompress(frame: bytes, expected: int | None = None) -> bytes:
    """Decode one zstd frame; size comes from the caller or the frame's FCS."""
    size = expected if expected is not None else zstd_frame_content_size(frame)
    if size is None:
        raise ValueError(
            "zstd frame carries no Frame_Content_Size and no expected size "
            "was provided (streaming-mode frames unsupported)"
        )
    return decompress("zstd", frame, size)


def zstd_compress(data: bytes, level: int = 3) -> bytes:
    import pyarrow as pa

    try:
        codec = pa.Codec("zstd", compression_level=level)
    except Exception as exc:
        raise CodecUnavailable(f"pyarrow zstd: {exc}") from exc
    return bytes(codec.compress(data))
