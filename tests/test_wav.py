"""WAV (RIFF/PCM) codec tests: byte-exact roundtrips, spec-structural
assertions against handmade payloads, named errors for out-of-subset forms."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ophidia_server_spark.sources import wav


def test_roundtrip_uint8_mono():
    s = np.arange(256, dtype="u1").reshape(-1, 1)
    buf = wav.encode(s, 8000)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    back, rate = wav.decode(buf)
    assert rate == 8000
    assert back.dtype == np.dtype("u1")
    assert np.array_equal(back, s)


def test_roundtrip_int16_stereo_and_float32():
    s = (np.arange(100, dtype="<i2") - 50).reshape(-1, 2)
    back, rate = wav.decode(wav.encode(s.astype(np.int16), 44100))
    assert rate == 44100 and back.shape == (50, 2)
    assert np.array_equal(back, s)
    f = (np.linspace(-1, 1, 64, dtype=np.float32)).reshape(-1, 1)
    back, _ = wav.decode(wav.encode(f, 16000))
    assert np.array_equal(back, f)


def test_handmade_payload_with_extra_chunk():
    # a LIST chunk before data (players write these) must be skipped; odd
    # chunk sizes are word-aligned per the RIFF spec
    pcm = bytes(range(7))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"LIST" + struct.pack("<I", 3) + b"abc\x00"     # odd size + pad
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm + b"\x00"
    )
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    samples, rate = wav.decode(buf)
    assert rate == 8000
    assert samples.ravel().tolist() == list(range(7))


def test_named_errors():
    with pytest.raises(wav.WavError, match="RIFF"):
        wav.decode(b"nope")
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)  # mu-law: unsupported
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 1) + b"x\x00")
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(wav.WavError, match="unsupported"):
        wav.decode(buf)
    with pytest.raises(wav.WavError, match="missing"):
        wav.decode(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
