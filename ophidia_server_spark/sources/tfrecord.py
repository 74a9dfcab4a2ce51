"""TFRecord container + tf.train.Example codec, from the public specs.

The TFRecord file format (TensorFlow's documented record framing,
tensorflow/core/lib/io/record_writer.h) is a sequence of

    uint64  length        (little-endian)
    uint32  masked_crc32c(length bytes)
    byte    data[length]
    uint32  masked_crc32c(data)

where ``masked = rotr32(crc32c(x), 15) + 0xa282ead8`` — the same CRC-32C
(Castagnoli) already implemented for the Zarr v3 checksum codec
(sources/zarr.py:_crc32c), reused here so the repo keeps ONE checksum
implementation.

The payload is a ``tf.train.Example`` protobuf message, encoded with a
minimal from-spec protobuf wire-format writer/reader (the public protobuf
encoding doc: varints, tag = field_number << 3 | wire_type, length-delimited
submessages).  Message shapes (tensorflow/core/example/example.proto and
feature.proto, both public):

    Example   { Features features = 1; }
    Features  { map<string, Feature> feature = 1; }   # entries: key=1, value=2
    Feature   { oneof kind { BytesList bytes_list = 1;
                             FloatList float_list = 2;
                             Int64List int64_list = 3; } }
    BytesList { repeated bytes value = 1; }
    FloatList { repeated float value = 1 [packed = true]; }
    Int64List { repeated int64 value = 1 [packed = true]; }

Only these three feature kinds exist in the format; floats are IEEE-754
binary32 by definition, so exporting a Spark ``float`` column is lossless
while ``double`` narrows (callers choose).  Encoding is canonical and
deterministic: feature keys are emitted in sorted order and packed numeric
lists are always used, so identical rows produce identical bytes on every
engine — the property the correctness gate hashes.

Extends the reference's export surface (oph_json_objkeys.h:114-117 lists
its nc/csv export operators) with the ML-training interchange format, the
same way the ORC/Arrow/Zarr paths do.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

from ophidia_server_spark.sources.zarr import _crc32c


class TFRecordError(ValueError):
    """Raised for malformed framing, CRC mismatches, or bad protobuf."""


_MASK_DELTA = 0xA282EAD8


def masked_crc(data: bytes) -> int:
    """TFRecord's masked CRC-32C: rotate right 15, add the mask delta."""
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    """Unsigned varint. int64 negatives are encoded as their 64-bit two's
    complement (ten bytes), per the protobuf spec for non-zigzag int64."""
    v &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise TFRecordError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise TFRecordError("varint too long")
    return result, pos


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """A length-delimited field (wire type 2)."""
    return _tag(field, 2) + _varint(len(payload)) + payload


# ---------------------------------------------------------------------------
# Example encode
# ---------------------------------------------------------------------------


def _encode_feature(value) -> bytes:
    """One Feature message from a python value.

    bytes/str (or list thereof)  -> BytesList  (str encodes utf-8)
    int  (or list of int)        -> Int64List  (packed)
    float (or list of float)     -> FloatList  (packed binary32)
    """
    if not isinstance(value, (list, tuple)):
        value = [value]
    if all(isinstance(v, (bytes, str)) for v in value):
        payload = b"".join(
            _ld(1, v.encode("utf-8") if isinstance(v, str) else bytes(v))
            for v in value
        )
        return _ld(1, payload)  # Feature.bytes_list
    if all(isinstance(v, bool) or isinstance(v, int) for v in value):
        packed = b"".join(_varint(int(v)) for v in value)
        return _ld(3, _ld(1, packed))  # Feature.int64_list, packed varints
    if all(isinstance(v, (int, float)) for v in value):
        packed = struct.pack(f"<{len(value)}f", *[float(v) for v in value])
        return _ld(2, _ld(1, packed))  # Feature.float_list, packed binary32
    raise TFRecordError(f"unsupported feature value: {value!r}")


def encode_example(features: dict) -> bytes:
    """Canonical tf.train.Example bytes for a {name: value} dict.

    Keys are emitted sorted so the encoding is deterministic regardless of
    dict order; None values are skipped (absent feature, the TF convention
    for missing)."""
    entries = b""
    for key in sorted(features):
        value = features[key]
        if value is None:
            continue
        entry = _ld(1, key.encode("utf-8")) + _ld(2, _encode_feature(value))
        entries += _ld(1, entry)  # Features.feature map entry
    return _ld(1, entries)  # Example.features


# ---------------------------------------------------------------------------
# Example decode
# ---------------------------------------------------------------------------


def _parse_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) triples from a message body.
    Length-delimited values come back as bytes; varints as int; fixed32/64
    as raw bytes (callers unpack)."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            if pos + ln > len(buf):
                raise TFRecordError("truncated length-delimited field")
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise TFRecordError(f"unsupported wire type {wire}")
        yield field, wire, val


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _decode_feature(buf: bytes) -> tuple[str, list]:
    """A Feature message -> (kind, values) with kind in
    {'bytes', 'float', 'int64'}."""
    for field, wire, val in _parse_fields(buf):
        if field == 1:  # BytesList
            return "bytes", [v for f, _, v in _parse_fields(val) if f == 1]
        if field == 2:  # FloatList
            out: list[float] = []
            for f, w, v in _parse_fields(val):
                if f != 1:
                    continue
                if w == 2:  # packed
                    out.extend(struct.unpack(f"<{len(v) // 4}f", v))
                else:  # unpacked fixed32
                    out.extend(struct.unpack("<f", v))
            return "float", out
        if field == 3:  # Int64List
            out_i: list[int] = []
            for f, w, v in _parse_fields(val):
                if f != 1:
                    continue
                if w == 2:  # packed varints
                    pos = 0
                    while pos < len(v):
                        x, pos = _read_varint(v, pos)
                        out_i.append(_signed64(x))
                else:
                    out_i.append(_signed64(v))
            return "int64", out_i
    return "bytes", []  # empty Feature: no kind set


def decode_example(data: bytes) -> dict[str, tuple[str, list]]:
    """tf.train.Example bytes -> {name: (kind, values)}."""
    out: dict[str, tuple[str, list]] = {}
    for field, _, val in _parse_fields(data):
        if field != 1:
            continue  # unknown top-level field: skip (proto forward-compat)
        for ef, _, entry in _parse_fields(val):
            if ef != 1:
                continue
            name, feat = None, None
            for mf, _, mv in _parse_fields(entry):
                if mf == 1:
                    name = mv.decode("utf-8")
                elif mf == 2:
                    feat = mv
            if name is not None:
                out[name] = _decode_feature(feat if feat is not None else b"")
    return out


# ---------------------------------------------------------------------------
# record framing
# ---------------------------------------------------------------------------


def write_records(path: str, payloads: Iterable[bytes]) -> int:
    """Write framed records; returns the record count."""
    n = 0
    with open(path, "wb") as fh:
        for data in payloads:
            header = struct.pack("<Q", len(data))
            fh.write(header)
            fh.write(struct.pack("<I", masked_crc(header)))
            fh.write(data)
            fh.write(struct.pack("<I", masked_crc(data)))
            n += 1
    return n


def read_records(path: str) -> Iterator[bytes]:
    """Yield record payloads, verifying both CRCs (TFRecordError on any
    corruption or truncation — a training job must not silently read a
    damaged shard)."""
    with open(path, "rb") as fh:
        while True:
            header = fh.read(8)
            if not header:
                return
            if len(header) < 8:
                raise TFRecordError("truncated length header")
            (want_len,) = struct.unpack("<Q", header)
            hcrc_raw = fh.read(4)
            if len(hcrc_raw) < 4:
                raise TFRecordError("truncated length CRC")
            if masked_crc(header) != struct.unpack("<I", hcrc_raw)[0]:
                raise TFRecordError("length CRC mismatch")
            data = fh.read(want_len)
            if len(data) < want_len:
                raise TFRecordError("truncated record body")
            dcrc_raw = fh.read(4)
            if len(dcrc_raw) < 4:
                raise TFRecordError("truncated data CRC")
            if masked_crc(data) != struct.unpack("<I", dcrc_raw)[0]:
                raise TFRecordError("data CRC mismatch")
            yield data
