"""Pure-Python NetCDF3 (classic / 64-bit-offset) codec.

The reference's entire ingest surface is NetCDF (oph_importnc/oph_importncs,
/root/reference/src/oph_json_objkeys.h:114-117); this container has no
netCDF/xarray library, so the classic file format — a small, fully public
on-disk spec (Unidata "NetCDF Classic Format Specification": CDF-1 magic
'CDF\\x01', CDF-2 'CDF\\x02') — is implemented directly. Only what the
engine needs is covered:

  read:  dims, global/variable attributes, all six classic types
         (byte, char, short, int, float, double), fixed and record
         variables, CDF-1 and CDF-2 offsets, the STREAMING numrecs
         sentinel (0xFFFFFFFF, left by interrupted writers).
  write: CDF-1 by default, CDF-2 (64-bit offsets) automatically when any
         variable's payload crosses the 2 GiB classic limit; record
         variables along one unlimited dimension (interleaved record
         slabs, matching the read side byte-for-byte).

netCDF-4 files are HDF5 containers (magic '\\x89HDF'); read() detects the
magic and delegates to the pure-Python HDF5 codec (sources/hdf5.py), so
callers are format-blind across classic and netCDF-4 files.

Everything is driven through numpy big-endian dtypes; per-file decode cost
is one sequential read, which is the unit of parallelism for the Spark side
(`operators/io_ops.py` fans the file list out with mapInPandas).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
# CDF-5 ("64-bit data", the pnetcdf extension of the classic spec) adds:
NC_UBYTE, NC_USHORT, NC_UINT, NC_INT64, NC_UINT64 = 7, 8, 9, 10, 11

_DTYPES = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
    NC_UBYTE: np.dtype(">u1"),
    NC_USHORT: np.dtype(">u2"),
    NC_UINT: np.dtype(">u4"),
    NC_INT64: np.dtype(">i8"),
    NC_UINT64: np.dtype(">u8"),
}
_NC_TYPE_OF = {
    "int8": NC_BYTE,
    "int16": NC_SHORT,
    "int32": NC_INT,
    "int64": NC_INT,  # classic format has no 64-bit int; checked narrow on write
    "float32": NC_FLOAT,
    "float64": NC_DOUBLE,
}
_NC_TYPE_OF_CDF5 = dict(
    _NC_TYPE_OF,
    int64=NC_INT64, uint8=NC_UBYTE, uint16=NC_USHORT,
    uint32=NC_UINT, uint64=NC_UINT64,
)

_ABSENT = b"\x00" * 8
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C


@dataclass
class Variable:
    name: str
    dimensions: tuple[str, ...]
    attributes: dict
    data: np.ndarray


@dataclass
class Dataset:
    """In-memory image of one NetCDF3 file."""

    dimensions: dict[str, int | None] = field(default_factory=dict)  # None = record dim
    attributes: dict = field(default_factory=dict)
    variables: dict[str, Variable] = field(default_factory=dict)


def _pad(n: int) -> int:
    return (4 - n % 4) % 4


class _Reader:
    def __init__(self, buf: bytes, wide: bool = False):
        self.buf = buf
        self.pos = 0
        # CDF-5: every NON_NEG field in the grammar (list counts, name
        # lengths, dim sizes, attribute value counts, var ndims/dimids/
        # vsize) widens to INT64; tags and nc_type stay 4 bytes
        self.wide = wide

    def bytes(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated NetCDF3 file")
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.bytes(4))[0]

    def i8(self) -> int:
        return struct.unpack(">q", self.bytes(8))[0]

    def nn(self) -> int:
        """One NON_NEG field: INT in CDF-1/2, INT64 in CDF-5."""
        return self.i8() if self.wide else self.i4()

    def name(self) -> str:
        n = self.nn()
        s = self.bytes(n).decode("utf-8")
        self.bytes(_pad(n))
        return s

    def values(self, nc_type: int, n: int):
        dt = _DTYPES[nc_type]
        raw = self.bytes(dt.itemsize * n)
        self.bytes(_pad(dt.itemsize * n))
        if nc_type == NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=dt)
        return arr.tolist() if n != 1 else arr[0].item()

    def att_list(self) -> dict:
        tag, n = self.i4(), self.nn()
        if tag not in (_NC_ATTRIBUTE, 0) or (tag == 0 and n != 0):
            raise ValueError(f"bad attribute list header ({tag}, {n})")
        out = {}
        for _ in range(n):
            nm = self.name()
            t = self.i4()
            cnt = self.nn()
            out[nm] = self.values(t, cnt)
        return out


def read(
    path: str, variables: set[str] | None = None,
    subset: dict | None = None, subset_type: str = "coord", mask_fn=None,
) -> Dataset:
    """Parse a classic (CDF-1) or 64-bit-offset (CDF-2) NetCDF file.
    `variables` (optional) limits which data variables materialize — a
    no-op for the classic format (decode is zero-copy np.frombuffer views)
    but a real chunk-decompression saving on the netCDF-4 path, where
    `subset`/`subset_type`/`mask_fn` additionally prune whole chunks
    (hdf5.read docstring); classic callers apply their own numpy slicing."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    magic = r.bytes(4)
    if magic == b"\x89HDF":
        # netCDF-4: delegate to the pure-Python HDF5 codec (sources/hdf5.py).
        # Imported lazily — hdf5.py uses this module's Dataset/Variable model.
        from ophidia_server_spark.sources import hdf5

        return hdf5.read(path, variables, subset, subset_type, mask_fn)
    if magic[:3] != b"CDF" or magic[3] not in (1, 2, 5):
        raise ValueError(f"not a NetCDF3 classic file: magic={magic!r}")
    wide = magic[3] == 5      # CDF-5: 64-bit data (pnetcdf extension)
    large = magic[3] == 2 or wide
    r.wide = wide
    numrecs = r.i8() if wide else r.i4()

    ds = Dataset()
    # dimension list
    tag, ndims = r.i4(), r.nn()
    if tag not in (_NC_DIMENSION, 0) or (tag == 0 and ndims != 0):
        raise ValueError("bad dimension list header")
    dim_names: list[str] = []
    dim_sizes: list[int] = []
    for _ in range(ndims):
        nm = r.name()
        sz = r.nn()
        dim_names.append(nm)
        dim_sizes.append(sz)
        ds.dimensions[nm] = None if sz == 0 else sz

    ds.attributes = r.att_list()

    # variable headers
    tag, nvars = r.i4(), r.nn()
    if tag not in (_NC_VARIABLE, 0) or (tag == 0 and nvars != 0):
        raise ValueError("bad variable list header")
    headers = []
    for _ in range(nvars):
        nm = r.name()
        nd = r.nn()
        dimids = [r.nn() for _ in range(nd)]
        atts = r.att_list()
        nc_type = r.i4()
        vsize = r.nn()
        begin = r.i8() if large else r.i4()
        headers.append((nm, dimids, atts, nc_type, vsize, begin))

    rec_vars = [h for h in headers if h[1] and dim_sizes[h[1][0]] == 0]
    recsize = sum(h[4] for h in rec_vars)

    if numrecs == -1:
        # STREAMING sentinel 0xFFFFFFFF: an interrupted writer never patched
        # numrecs. Derive the record count from the bytes actually present
        # after the record section start (spec-sanctioned recovery).
        if rec_vars:
            first_begin = min(h[5] for h in rec_vars)
            if len(rec_vars) == 1:
                h = rec_vars[0]
                shp = [dim_sizes[i] for i in h[1]]
                per_rec = int(np.prod(shp[1:], dtype=np.int64)) if len(shp) > 1 else 1
                stride = per_rec * _DTYPES[h[3]].itemsize
            else:
                stride = recsize
            numrecs = (len(buf) - first_begin) // stride if stride else 0
        else:
            numrecs = 0

    for nm, dimids, atts, nc_type, vsize, begin in headers:
        dt = _DTYPES[nc_type]
        shape = [dim_sizes[i] for i in dimids]
        is_rec = bool(dimids) and shape[0] == 0
        if is_rec:
            shape[0] = numrecs
            per_rec = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
            chunk = per_rec * dt.itemsize
            # record variables interleave: one record of each var per
            # stride. Spec special case: a SINGLE record variable packs its
            # record slabs contiguously with no inter-record padding (matters
            # for byte/char/short payloads whose chunk is not 4-aligned).
            stride = recsize if len(rec_vars) > 1 else chunk
            parts = [
                np.frombuffer(buf, dtype=dt, count=per_rec, offset=begin + rec * stride)
                for rec in range(numrecs)
            ]
            arr = np.concatenate(parts).reshape(shape) if parts else np.empty(shape, dt)
        else:
            count = int(np.prod(shape, dtype=np.int64)) if shape else 1
            arr = np.frombuffer(buf, dtype=dt, count=count, offset=begin).reshape(shape)
        ds.variables[nm] = Variable(
            name=nm,
            dimensions=tuple(dim_names[i] for i in dimids),
            attributes=atts,
            data=arr,
        )
    return ds


def _enc_name(s: str, w: str = ">i") -> bytes:
    b = s.encode("utf-8")
    return struct.pack(w, len(b)) + b + b"\x00" * _pad(len(b))


def _nc_type_for(arr: np.ndarray, wide: bool = False) -> int:
    if arr.dtype.kind == "S" or arr.dtype.kind == "U":
        return NC_CHAR
    table = _NC_TYPE_OF_CDF5 if wide else _NC_TYPE_OF
    t = table.get(np.dtype(arr.dtype).name)
    if t is None:
        raise ValueError(f"unsupported dtype for NetCDF3: {arr.dtype}")
    return t


def _enc_values(nc_type: int, values) -> tuple[bytes, int]:
    if nc_type == NC_CHAR:
        raw = values.encode("utf-8") if isinstance(values, str) else bytes(values)
        n = len(raw)
    else:
        arr = np.asarray(values, dtype=_DTYPES[nc_type])
        raw = arr.tobytes()
        n = arr.size
    return raw + b"\x00" * _pad(len(raw)), n


def _enc_att_list(atts: dict, w: str = ">i") -> bytes:
    if not atts:
        return struct.pack(">i", 0) + struct.pack(w, 0)
    out = [struct.pack(">i", _NC_ATTRIBUTE) + struct.pack(w, len(atts))]
    for nm, val in atts.items():
        if isinstance(val, str):
            t = NC_CHAR
        elif isinstance(val, (list, np.ndarray)):
            t = _nc_type_for(np.asarray(val))
        elif isinstance(val, float):
            t = NC_DOUBLE
        else:
            t = NC_INT
        raw, n = _enc_values(t, val)
        out.append(_enc_name(nm, w) + struct.pack(">i", t) + struct.pack(w, n) + raw)
    return b"".join(out)


def _checked_cast(v: Variable, nc_type: int) -> np.ndarray:
    """Cast a payload to its on-disk dtype, refusing lossy narrowing: numpy's
    int64 -> int32 cast silently wraps, which would corrupt exported data."""
    arr = np.asarray(v.data)
    if arr.dtype == np.int64 and nc_type == NC_INT:
        if arr.size and (arr.max() > 2**31 - 1 or arr.min() < -(2**31)):
            raise ValueError(
                f"variable {v.name!r}: int64 values exceed the NC_INT range of "
                "the classic format; cast to float64 (or rescale) before export"
            )
    return np.ascontiguousarray(arr, dtype=_DTYPES[nc_type])


def write(path: str, ds: Dataset, version: str = "auto") -> None:
    """Write a classic file: CDF-1, or CDF-2 (64-bit offsets) automatically
    once any offset crosses the 2 GiB CDF-1 limit (version='64bit' forces
    CDF-2; version='cdf5' emits the 64-bit-data CDF-5 layout, where every
    NON_NEG header field is INT64 and int64/unsigned payloads keep their
    width instead of narrow-checking). One dimension may be unlimited
    (size None): variables whose first dim is unlimited are written as
    interleaved record slabs, mirroring read()'s layout exactly (incl. the
    single-record-variable no-padding special case)."""
    wide = version == "cdf5"
    w = ">q" if wide else ">i"
    dim_names = list(ds.dimensions)
    dim_index = {n: i for i, n in enumerate(dim_names)}
    rec_dims = [n for n, sz in ds.dimensions.items() if sz is None]
    if len(rec_dims) > 1:
        raise ValueError("classic format allows at most one unlimited dimension")
    rec_dim = rec_dims[0] if rec_dims else None

    fixed_heads, rec_heads = [], []  # (var, nc_type, vsize, payload-or-chunks)
    numrecs = 0
    for v in ds.variables.values():
        nc_type = _nc_type_for(v.data, wide=wide)
        arr = _checked_cast(v, nc_type)
        if rec_dim is not None and v.dimensions and v.dimensions[0] == rec_dim:
            if numrecs and arr.shape[0] != numrecs:
                raise ValueError("record variables disagree on record count")
            numrecs = arr.shape[0]
            chunk = int(np.prod(arr.shape[1:], dtype=np.int64)) * arr.itemsize
            rec_heads.append((v, nc_type, chunk + _pad(chunk), arr))
        else:
            raw = arr.tobytes()
            raw += b"\x00" * _pad(len(raw))
            fixed_heads.append((v, nc_type, len(raw), raw))
    if len(rec_heads) == 1:  # spec: single record variable packs unpadded
        v, t, vsize, arr = rec_heads[0]
        chunk = int(np.prod(arr.shape[1:], dtype=np.int64)) * arr.itemsize
        rec_heads[0] = (v, t, chunk, arr)
    var_heads = fixed_heads + rec_heads
    recsize = sum(h[2] for h in rec_heads)

    def encode(large: bool) -> tuple[bytes, bytes, list[int], int]:
        off_fmt = ">q" if (large or wide) else ">i"
        magic = b"CDF\x05" if wide else (b"CDF\x02" if large else b"CDF\x01")
        header = [magic, struct.pack(w, numrecs)]
        if dim_names:
            header.append(struct.pack(">i", _NC_DIMENSION) + struct.pack(w, len(dim_names)))
            for n in dim_names:
                header.append(
                    _enc_name(n, w) + struct.pack(w, ds.dimensions[n] or 0)
                )
        else:
            header.append(struct.pack(">i", 0) + struct.pack(w, 0))
        header.append(_enc_att_list(ds.attributes, w))
        head = b"".join(header)

        def var_block(begins: list[int]) -> bytes:
            if not var_heads:
                return struct.pack(">i", 0) + struct.pack(w, 0)
            parts = [struct.pack(">i", _NC_VARIABLE) + struct.pack(w, len(var_heads))]
            for (v, nc_type, vsize, _), begin in zip(var_heads, begins):
                parts.append(_enc_name(v.name, w))
                parts.append(struct.pack(w, len(v.dimensions)))
                parts.extend(struct.pack(w, dim_index[d]) for d in v.dimensions)
                parts.append(_enc_att_list(v.attributes, w))
                parts.append(struct.pack(">i", nc_type) + struct.pack(w, vsize))
                parts.append(struct.pack(off_fmt, begin))
            return b"".join(parts)

        header_len = len(head) + len(var_block([0] * len(var_heads)))
        begins, off = [], header_len
        for _, _, vsize, _ in fixed_heads:
            begins.append(off)
            off += vsize
        for _, _, vsize, _ in rec_heads:  # record vars share the record section
            begins.append(off)
            off += vsize
        end = begins[len(fixed_heads)] + numrecs * recsize if rec_heads else off
        return head, var_block(begins), begins, end

    head, vblock, begins, end = encode(large=version == "64bit")
    if version == "auto" and end > 2**31 - 1:
        head, vblock, begins, end = encode(large=True)

    with open(path, "wb") as f:
        f.write(head)
        f.write(vblock)
        for _, _, _, raw in fixed_heads:
            f.write(raw)
        for rec in range(numrecs):
            for v, nc_type, vsize, arr in rec_heads:
                # slice (not index): indexing a 1-D big-endian array yields a
                # NATIVE-endian numpy scalar, silently flipping byte order
                slab = arr[rec : rec + 1].tobytes()
                f.write(slab + b"\x00" * (vsize - len(slab)))
