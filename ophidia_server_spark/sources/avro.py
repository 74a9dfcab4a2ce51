"""Avro Object Container File codec, from the public Apache Avro spec.

File layout (the spec's "Object Container Files" section):

    magic  "Obj" \\x01
    file metadata map: avro.schema (JSON), avro.codec ("null" | "deflate")
    16-byte sync marker
    blocks: [row count, byte size, serialized rows (codec-compressed),
             sync marker] ...

Binary encoding (the spec's "Binary Encoding" section):
    int/long  : zigzag varint           boolean : one byte 0/1
    float     : 4 bytes LE IEEE-754     double  : 8 bytes LE
    bytes/str : long(len) + raw         null    : zero bytes
    record    : fields in declared order, concatenated
    union     : long(branch index) + value
    array     : blocks of long(count) + items, terminated by count 0
    map       : blocks of long(count) + (key string, value), count 0 ends

Implemented schema subset — the DataFrame interchange surface: a top-level
record of null/boolean/int/long/float/double/bytes/string fields, nullable
via ["null", T] unions, and array<primitive>. "deflate" is RFC 1951 raw
deflate via stdlib zlib (wbits=-15), per the spec. Anything else raises
AvroError with the schema node named.

Spark ships Avro support only as an external package; this keeps the
engine's I/O surface self-contained the same way sources/netcdf3.py and
sources/hdf5.py do for the scientific formats.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Iterable, Iterator

MAGIC = b"Obj\x01"


class AvroError(ValueError):
    """Malformed container, unsupported schema node, or bad encoding."""


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(n: int) -> bytes:
    v = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise AvroError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(result), pos
        shift += 7
        if shift > 63:
            raise AvroError("varint too long")


def _write_bytes(b: bytes) -> bytes:
    return write_long(len(b)) + b


# ---------------------------------------------------------------------------
# schema-driven value codec
# ---------------------------------------------------------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


def _encode_value(schema, v) -> bytes:
    if isinstance(schema, list):  # union — branch index then value
        if v is None:
            try:
                idx = schema.index("null")
            except ValueError:
                raise AvroError("null value for a union without a null branch")
            return write_long(idx)
        idx = next(
            (i for i, s in enumerate(schema) if s != "null"), None
        )
        if idx is None:
            raise AvroError("union has no non-null branch")
        return write_long(idx) + _encode_value(schema[idx], v)
    if isinstance(schema, dict):
        if schema.get("type") == "array":
            items = schema["items"]
            out = b""
            vals = list(v)
            if vals:
                out += write_long(len(vals))
                out += b"".join(_encode_value(items, x) for x in vals)
            return out + write_long(0)
        if schema.get("type") in _PRIMITIVES:
            return _encode_value(schema["type"], v)
        raise AvroError(f"unsupported schema node: {schema!r}")
    if schema == "null":
        return b""
    if schema == "boolean":
        return b"\x01" if v else b"\x00"
    if schema in ("int", "long"):
        return write_long(int(v))
    if schema == "float":
        return struct.pack("<f", float(v))
    if schema == "double":
        return struct.pack("<d", float(v))
    if schema == "bytes":
        return _write_bytes(bytes(v))
    if schema == "string":
        return _write_bytes(str(v).encode("utf-8"))
    raise AvroError(f"unsupported schema node: {schema!r}")


def _decode_value(schema, buf: memoryview, pos: int):
    if isinstance(schema, list):
        idx, pos = read_long(buf, pos)
        if not 0 <= idx < len(schema):
            raise AvroError(f"union branch {idx} out of range")
        branch = schema[idx]
        if branch == "null":
            return None, pos
        return _decode_value(branch, buf, pos)
    if isinstance(schema, dict):
        if schema.get("type") == "array":
            items = schema["items"]
            out = []
            while True:
                count, pos = read_long(buf, pos)
                if count == 0:
                    return out, pos
                if count < 0:  # spec: negative count precedes a block size
                    _, pos = read_long(buf, pos)
                    count = -count
                for _ in range(count):
                    v, pos = _decode_value(items, buf, pos)
                    out.append(v)
        if schema.get("type") in _PRIMITIVES:
            return _decode_value(schema["type"], buf, pos)
        raise AvroError(f"unsupported schema node: {schema!r}")
    if schema == "null":
        return None, pos
    if schema == "boolean":
        if pos >= len(buf):
            raise AvroError("truncated boolean")
        return buf[pos] != 0, pos + 1
    if schema in ("int", "long"):
        return read_long(buf, pos)
    if schema == "float":
        if pos + 4 > len(buf):
            raise AvroError("truncated float")
        return struct.unpack("<f", buf[pos : pos + 4])[0], pos + 4
    if schema == "double":
        if pos + 8 > len(buf):
            raise AvroError("truncated double")
        return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if schema in ("bytes", "string"):
        ln, pos = read_long(buf, pos)
        raw = bytes(buf[pos : pos + ln])
        if len(raw) < ln:
            raise AvroError("truncated bytes/string")
        return (raw.decode("utf-8") if schema == "string" else raw), pos + ln
    raise AvroError(f"unsupported schema node: {schema!r}")


# ---------------------------------------------------------------------------
# container read/write
# ---------------------------------------------------------------------------


def _sync_marker(seed: str) -> bytes:
    """Deterministic 16-byte sync marker (md5 of the seed) — reproducible
    files, same role as the random marker the spec allows."""
    import hashlib

    return hashlib.md5(seed.encode()).digest()


def write_container(
    path: str, schema: dict, rows: Iterable[dict],
    codec: str = "deflate", block_rows: int = 4096,
) -> int:
    """Write an Object Container File; returns the row count. `schema` is
    the record schema dict ({"type": "record", "name": ..., "fields":
    [{"name", "type"}...]}); rows are {field: value} dicts."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    fields = schema["fields"]
    sync = _sync_marker(path)
    n = 0
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
            "avro.codec": codec.encode(),
        }
        fh.write(write_long(len(meta)))
        for k in sorted(meta):
            fh.write(_write_bytes(k.encode()) + _write_bytes(meta[k]))
        fh.write(write_long(0))
        fh.write(sync)

        buf = io.BytesIO()
        count = 0

        def flush():
            nonlocal count
            if not count:
                return
            data = buf.getvalue()
            if codec == "deflate":
                comp = zlib.compressobj(9, zlib.DEFLATED, -15)
                data = comp.compress(data) + comp.flush()
            fh.write(write_long(count) + write_long(len(data)))
            fh.write(data)
            fh.write(sync)
            buf.seek(0)
            buf.truncate()
            count = 0

        for row in rows:
            for f in fields:
                buf.write(_encode_value(f["type"], row.get(f["name"])))
            count += 1
            n += 1
            if count >= block_rows:
                flush()
        flush()
    return n


def read_container(path: str) -> tuple[dict, Iterator[dict]]:
    """Parse an Object Container File; returns (schema, row iterator).
    Sync markers are verified per block — a torn object-store read fails
    loudly instead of yielding shifted garbage."""
    raw = open(path, "rb").read()
    if raw[:4] != MAGIC:
        raise AvroError("bad magic — not an Avro container")
    buf = memoryview(raw)
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = read_long(buf, pos)
        if count == 0:
            break
        if count < 0:
            _, pos = read_long(buf, pos)
            count = -count
        for _ in range(count):
            klen, pos = read_long(buf, pos)
            key = bytes(buf[pos : pos + klen]).decode()
            pos += klen
            vlen, pos = read_long(buf, pos)
            meta[key] = bytes(buf[pos : pos + vlen])
            pos += vlen
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    sync = bytes(buf[pos : pos + 16])
    pos += 16
    fields = schema["fields"]

    def rows() -> Iterator[dict]:
        p = pos
        while p < len(buf):
            count, p = read_long(buf, p)
            size, p = read_long(buf, p)
            data = bytes(buf[p : p + size])
            if len(data) < size:
                raise AvroError("truncated block")
            p += size
            if bytes(buf[p : p + 16]) != sync:
                raise AvroError("sync marker mismatch — corrupt block")
            p += 16
            if codec == "deflate":
                data = zlib.decompress(data, -15)
            block = memoryview(data)
            bp = 0
            for _ in range(count):
                row = {}
                for f in fields:
                    row[f["name"]], bp = _decode_value(f["type"], block, bp)
                yield row

    return schema, rows()
