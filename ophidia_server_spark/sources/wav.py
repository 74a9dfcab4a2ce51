"""Pure-Python WAV (RIFF/PCM) codec — read + write.

Same codec-from-spec pattern as sources/png.py: the RIFF container and PCM
sample layout are tiny public formats (the Microsoft/IBM WAVE spec), so real
audio ingest needs no external library. Reference ingest surface: the
reference imports whatever its I/O servers decode (oph_json_objkeys.h:
114-117); audio corpora are the multimodal-pipeline equivalent.

Supported: RIFF/WAVE with an fmt chunk of format 1 (integer PCM, 8/16/32
bit) or 3 (IEEE float32), any channel count/sample rate, data chunk
anywhere in the chunk list. Everything else raises a named WavError.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"RIFF"


class WavError(ValueError):
    """Named error for WAV payloads outside the implemented subset."""


_PCM_DTYPES = {(1, 8): "u1", (1, 16): "<i2", (1, 32): "<i4", (3, 32): "<f4"}


def decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV payload -> (samples[n_frames, n_channels], sample_rate).

    8-bit PCM is unsigned per the spec (offset-128); wider PCM is signed
    little-endian; format 3 is float32. Samples come back in their stored
    dtype — feature extraction normalizes as it needs."""
    if len(buf) < 12 or buf[:4] != MAGIC or buf[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(buf), 8 + struct.unpack_from("<I", buf, 4)[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk shorter than 16 bytes")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    dtype = _PCM_DTYPES.get((audio_format, bits))
    if dtype is None:
        raise WavError(
            f"WAV format {audio_format} / {bits}-bit unsupported "
            "(integer PCM 8/16/32 or float32 only)"
        )
    if n_channels < 1:
        raise WavError("WAV with zero channels")
    arr = np.frombuffer(data, dtype)
    frames = len(arr) // n_channels
    return arr[: frames * n_channels].reshape(frames, n_channels), sample_rate


def encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode [n_frames, n_channels] uint8/int16/float32 samples as WAV."""
    arr = np.atleast_2d(np.asarray(samples))
    if arr.dtype == np.uint8:
        audio_format, bits = 1, 8
        payload = arr.tobytes()
    elif arr.dtype == np.int16:
        audio_format, bits = 1, 16
        payload = arr.astype("<i2").tobytes()
    elif arr.dtype == np.int32:
        audio_format, bits = 1, 32
        payload = arr.astype("<i4").tobytes()
    elif arr.dtype == np.float32:
        audio_format, bits = 3, 32
        payload = arr.astype("<f4").tobytes()
    else:
        raise WavError(f"encode supports uint8/int16/int32/float32, got {arr.dtype}")
    n_channels = arr.shape[1]
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", audio_format, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    chunks = b"".join(
        [b"fmt ", struct.pack("<I", len(fmt)), fmt,
         b"data", struct.pack("<I", len(payload)), payload,
         b"" if len(payload) % 2 == 0 else b"\x00"]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
