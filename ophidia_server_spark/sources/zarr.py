"""Pure-Python Zarr v2 + v3 codec.

Modern climate holdings (CMIP6 cloud archives, Pangeo) publish datacubes as
Zarr — the chunked array format the community moved to after netCDF-4, and
the natural cloud-object-store layout for the reference's data model (one
chunk per object = one fragment per task, oph_ophidiadb_query.h:48).  The
format is tiny and fully public (Zarr storage specification v2): a directory
per array with a `.zarray` JSON descriptor, optional `.zattrs` attributes,
and one file per chunk named `i.j.k` in C order.  netCDF-style semantics ride
on the xarray convention: an `_ARRAY_DIMENSIONS` attribute lists each
array's dimension names.

  read:  consolidated or per-array metadata, C-order chunks, compressors
         zlib/gzip, blosc with lz4/zlib/snappy/zstd streams (blosc+lz4 — the
         numcodecs default of real CMIP6/Pangeo cloud stores — decodes via
         pyarrow's bundled C lz4 with the pure-Python sources/lz4blosc.py
         codec as fallback; snappy/zstd streams via pyarrow,
         sources/codecs.py), raw numcodecs lz4 and zstd chunks, or none; any
         numpy endianness/dtype, fill_value for missing chunks (sparse
         stores write only non-empty chunks).
  write: one array per variable + 1-D coordinate arrays, configurable chunk
         shape, zlib, blosc-lz4 or zstd compression, `_ARRAY_DIMENSIONS` +
         consolidated metadata (`.zmetadata`) so cloud readers need one
         metadata GET.

Zarr v3 (the zarr-python 3 default, zarr-specs v3 core): `zarr.json` group/
array nodes, regular chunk grids, default ("c/"-prefixed) and v2 chunk-key
encodings, dimension_names, and the codec chains bytes(endian) / gzip / zstd
/ blosc / crc32c / transpose — both read (incl. the one-task-per-chunk Spark
import) and write (`zarr_format=3`).  Sharded (sharding_indexed) arrays
round-trip: reads parse each shard's binary (offset, nbytes) index (crc32c
verified, start/end locations) and decode inner chunks through their own
codec chain, missing entries filling with fill_value; writes
(`shard_inner={name: inner_shape}`) pack many inner chunks per shard
object — the object-count knob for 100 TB object stores.

API mirrors sources/netcdf3.py (read(path) -> Dataset, write(path, ds)); the
Spark side decodes chunk PARALLEL per file-list task exactly like the NetCDF
paths.  Only blosc's legacy blosclz streams still raise a named ZarrError.
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import dataclass

import numpy as np

from ophidia_server_spark.sources.netcdf3 import Dataset, Variable


class ZarrError(ValueError):
    """Named error for Zarr features outside the implemented subset."""


def _decompress(raw: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid in ("zlib", "gzip"):
        return zlib.decompress(raw, 47)  # auto-detect zlib/gzip wrapper
    if cid == "blosc":
        # the numcodecs default (cname=lz4) of real CMIP6/Pangeo cloud
        # stores; the frame header carries the actual codec, so cname in the
        # metadata is advisory
        from ophidia_server_spark.sources.lz4blosc import BloscError, blosc_decompress

        try:
            return blosc_decompress(raw)
        except BloscError as exc:
            raise ZarrError(f"blosc chunk: {exc}") from exc
    if cid == "lz4":
        # numcodecs LZ4 codec: 4-byte little-endian original size + block
        from ophidia_server_spark.sources import codecs
        from ophidia_server_spark.sources.lz4blosc import Lz4Error, lz4_decompress_block

        if len(raw) < 4:
            raise ZarrError("lz4 chunk shorter than its 4-byte size header")
        size = int.from_bytes(raw[:4], "little")
        try:
            if codecs.have("lz4_raw"):  # pyarrow C fast path
                return codecs.decompress("lz4_raw", raw[4:], size)
            return lz4_decompress_block(raw[4:], size)
        except (Lz4Error, ValueError) as exc:
            raise ZarrError(f"lz4 chunk: {exc}") from exc
    if cid == "zstd":
        # numcodecs Zstd codec: one zstd frame per chunk; the one-shot
        # compressor numcodecs uses always records Frame_Content_Size, so the
        # decoded length comes from the frame header itself
        from ophidia_server_spark.sources import codecs

        try:
            return codecs.zstd_decompress(raw)
        except codecs.CodecUnavailable as exc:
            raise ZarrError(f"zstd chunk: {exc}") from exc
        except ValueError as exc:
            raise ZarrError(f"zstd chunk: {exc}") from exc
    raise ZarrError(
        f"Zarr compressor {cid!r} unsupported "
        "(zlib/gzip/blosc(lz4|zlib|snappy|zstd)/lz4/zstd/none only)"
    )


def compressor_meta(level: int | str | None, itemsize: int = 1) -> dict | None:
    """.zarray compressor dict for a write option — the single source of
    truth shared by _compress and the executor-sharded export metadata
    (operators/io_ops.py), so codec parameters can never desynchronize
    from the bytes actually written."""
    if level is None:
        return None
    if level in ("blosc", "blosc-lz4"):
        return {
            "id": "blosc", "cname": "lz4", "clevel": 5,
            "shuffle": 1 if itemsize > 1 else 0, "blocksize": 0,
        }
    if level == "zstd":
        return {"id": "zstd", "level": 3}
    return {"id": "zlib", "level": level}


def _compress(
    raw: bytes, level: int | str | None, itemsize: int = 1
) -> tuple[bytes, dict | None]:
    meta = compressor_meta(level, itemsize)
    if level is None:
        return raw, None
    if level in ("blosc", "blosc-lz4"):
        from ophidia_server_spark.sources.lz4blosc import blosc_compress

        return blosc_compress(raw, itemsize), meta
    if level == "zstd":
        from ophidia_server_spark.sources import codecs

        return codecs.zstd_compress(raw, 3), meta
    return zlib.compress(raw, level), meta


@dataclass
class ZArray:
    shape: tuple[int, ...]
    chunks: tuple[int, ...]
    dtype: np.dtype
    compressor: dict | None
    fill_value: object
    order: str
    version: int = 2
    codecs: tuple = ()           # v3 codec chain (spec order, outermost last)
    key_sep: str = "."           # v3 chunk_key_encoding separator
    key_encoding: str = "v2"     # 'default' (c/-prefixed) | 'v2'


# Zarr v3 core data types <-> numpy (always little-endian on disk via the
# `bytes` codec unless it says big)
_V3_DTYPES = {
    "bool": "b1", "int8": "i1", "int16": "i2", "int32": "i4", "int64": "i8",
    "uint8": "u1", "uint16": "u2", "uint32": "u4", "uint64": "u8",
    "float16": "f2", "float32": "f4", "float64": "f8",
    "complex64": "c8", "complex128": "c16",
}
_V3_DTYPES_INV = {v: k for k, v in _V3_DTYPES.items()}


def _load_v3_array(meta: dict) -> ZArray:
    """Array metadata per the Zarr v3 core spec (`zarr.json`)."""
    if meta.get("node_type") != "array":
        raise ZarrError(f"zarr.json node_type {meta.get('node_type')!r} is not an array")
    grid = meta.get("chunk_grid", {})
    if grid.get("name") != "regular":
        raise ZarrError(f"chunk grid {grid.get('name')!r} unsupported (regular only)")
    dt = meta.get("data_type")
    if dt not in _V3_DTYPES:
        raise ZarrError(f"v3 data_type {dt!r} unsupported")
    codecs = tuple(meta.get("codecs") or ())
    cke = meta.get("chunk_key_encoding", {"name": "default"})
    name = cke.get("name", "default")
    if name not in ("default", "v2"):
        raise ZarrError(f"chunk_key_encoding {name!r} unsupported")
    sep = cke.get("configuration", {}).get("separator", "/" if name == "default" else ".")
    dtype = np.dtype(_V3_DTYPES[dt])
    for c in codecs:  # the array->bytes codec fixes on-disk endianness
        if c.get("name") == "bytes":
            endian = c.get("configuration", {}).get("endian", "little")
            dtype = dtype.newbyteorder("<" if endian == "little" else ">")
    return ZArray(
        shape=tuple(meta["shape"]),
        chunks=tuple(grid.get("configuration", {}).get("chunk_shape", ())),
        dtype=dtype,
        compressor=None,
        fill_value=meta.get("fill_value"),
        order="C",
        version=3,
        codecs=codecs,
        key_sep=sep,
        key_encoding=name,
    )


def _load_zarray(meta: dict) -> ZArray:
    fmt = int(meta.get("zarr_format", 2))
    if fmt == 3:
        return _load_v3_array(meta)
    if fmt != 2:
        raise ZarrError(f"zarr_format {meta.get('zarr_format')} unsupported (v2/v3 only)")
    order = meta.get("order", "C")
    if order != "C":
        raise ZarrError("Fortran-order Zarr arrays unsupported (C order only)")
    if meta.get("filters"):
        raise ZarrError("Zarr filters are unsupported (compressor-only stores)")
    return ZArray(
        shape=tuple(meta["shape"]),
        chunks=tuple(meta["chunks"]),
        dtype=np.dtype(meta["dtype"]),
        compressor=meta.get("compressor"),
        fill_value=meta.get("fill_value"),
        order=order,
    )


def _chunk_relpath(za: ZArray, idx: tuple) -> str:
    """On-disk chunk key for a grid index, per the array's format/encoding."""
    if za.version == 2:
        return ".".join(map(str, idx)) or "0"
    parts = list(map(str, idx))
    if za.key_encoding == "default":
        # spec: "c" joined with the grid indices by the separator; a "/"
        # separator makes each index a directory level ("c/0/0")
        return za.key_sep.join(["c"] + parts)
    return za.key_sep.join(parts) or "0"


_CRC32C_TABLE = None


def _crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli, polynomial 0x1EDC6F41 reflected) — the v3
    `crc32c` checksum codec. Table-driven, stdlib-free."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _decode_shard(raw: bytes, za: ZArray, conf: dict) -> np.ndarray:
    """Decode one v3 shard (`sharding_indexed` array->bytes codec): encoded
    inner chunks concatenated with a binary index of (offset, nbytes) u64-LE
    pairs — one per inner-grid cell in row-major order, 2^64-1 marking a
    missing (fill-value) inner chunk — optionally crc32c-checked, at the
    start or end of the shard object per index_location."""
    import itertools

    inner = tuple(conf["chunk_shape"])
    inner_codecs = tuple(conf.get("codecs") or ({"name": "bytes"},))
    index_codecs = tuple(
        conf.get("index_codecs") or ({"name": "bytes"}, {"name": "crc32c"})
    )
    # The 16*n(+4) layout below assumes a raw little-endian index: any other
    # index codec (e.g. zstd-compressed index) would be misparsed into garbage
    # offsets, so reject it by name rather than decode wrong data.
    unsupported_idx = [
        c.get("name") for c in index_codecs if c.get("name") not in ("bytes", "crc32c")
    ]
    if unsupported_idx:
        raise ZarrError(
            f"unsupported shard index codec(s) {unsupported_idx}: "
            "only 'bytes' (little-endian) and 'crc32c' are implemented"
        )
    for c in index_codecs:
        if (
            c.get("name") == "bytes"
            and c.get("configuration", {}).get("endian", "little") != "little"
        ):
            raise ZarrError("big-endian shard index is not implemented")
    if any(len(inner) and o % i for o, i in zip(za.chunks, inner)):
        raise ZarrError(
            f"shard inner chunk shape {inner} does not divide the shard shape {za.chunks}"
        )
    grid = [o // i for o, i in zip(za.chunks, inner)]
    n = int(np.prod(grid, dtype=np.int64)) if grid else 1
    has_crc = any(c.get("name") == "crc32c" for c in index_codecs)
    idx_size = 16 * n + (4 if has_crc else 0)
    if len(raw) < idx_size:
        raise ZarrError("shard shorter than its chunk index")
    if conf.get("index_location", "end") == "start":
        idx_raw = raw[:idx_size]
    else:
        idx_raw = raw[-idx_size:]
    if has_crc:
        want = int.from_bytes(idx_raw[-4:], "little")
        idx_raw = idx_raw[:-4]
        if _crc32c(idx_raw) != want:
            raise ZarrError("shard index crc32c checksum mismatch")
    pairs = np.frombuffer(idx_raw, "<u8").reshape(n, 2)
    dtype = za.dtype
    for c in inner_codecs:  # the inner bytes codec fixes on-disk endianness
        if c.get("name") == "bytes":
            endian = c.get("configuration", {}).get("endian", "little")
            dtype = dtype.newbyteorder("<" if endian == "little" else ">")
    inner_za = ZArray(
        shape=za.chunks, chunks=inner, dtype=dtype, compressor=None,
        fill_value=za.fill_value, order="C", version=3, codecs=inner_codecs,
    )
    out = np.full(za.chunks, _resolve_fill(za.fill_value, za.dtype), za.dtype)
    missing = 0xFFFFFFFFFFFFFFFF
    for ci, idxs in enumerate(itertools.product(*[range(g) for g in grid])):
        off, nb = int(pairs[ci, 0]), int(pairs[ci, 1])
        if off == missing:
            continue
        if off + nb > len(raw):
            raise ZarrError("shard inner chunk extends past the shard object")
        chunk = _decode_v3_chunk(raw[off : off + nb], inner_za)
        sel = tuple(slice(i * c, (i + 1) * c) for i, c in zip(idxs, inner))
        out[sel] = chunk
    return out


def _decode_v3_chunk(raw: bytes, za: ZArray) -> np.ndarray:
    """Run the v3 codec chain in reverse: bytes->bytes codecs innermost-last,
    then the `bytes` array->bytes codec, then array->array codecs. A
    `sharding_indexed` codec recurses per inner chunk (_decode_shard)."""
    from ophidia_server_spark.sources import codecs as cshim

    for c in za.codecs:
        if c.get("name") == "sharding_indexed":
            return _decode_shard(raw, za, c.get("configuration", {}))
    array_codecs = []
    for c in reversed(za.codecs):
        name, conf = c.get("name"), c.get("configuration", {})
        if name == "gzip":
            raw = zlib.decompress(raw, 47)
        elif name == "zstd":
            raw = cshim.zstd_decompress(raw)
        elif name == "blosc":
            from ophidia_server_spark.sources.lz4blosc import BloscError, blosc_decompress

            try:
                raw = blosc_decompress(raw)
            except BloscError as exc:
                raise ZarrError(f"blosc chunk: {exc}") from exc
        elif name == "crc32c":
            if len(raw) < 4:
                raise ZarrError("crc32c codec payload shorter than its checksum")
            want = int.from_bytes(raw[-4:], "little")
            raw = raw[:-4]
            if _crc32c(raw) != want:
                raise ZarrError("crc32c checksum mismatch")
        elif name == "bytes":
            pass  # endianness already folded into za.dtype
        elif name == "transpose":
            array_codecs.append(conf.get("order"))
        else:
            raise ZarrError(f"v3 codec {name!r} unsupported")
    chunk = np.frombuffer(raw, za.dtype)
    for order in array_codecs:
        if order is None:
            continue
        # stored layout is the transposed shape; invert the permutation
        tshape = tuple(za.chunks[i] for i in order)
        inv = np.argsort(order)
        chunk = chunk.reshape(tshape).transpose(inv)
    return np.ascontiguousarray(chunk).reshape(za.chunks)


def _resolve_fill(fill, dtype: "np.dtype"):
    """Translate a Zarr v2 JSON fill_value into a numpy scalar for `dtype`.

    Spec (v2 §fill-value): null means undefined — missing chunks then have no
    mandated content; we materialize them as zeros. Float/complex specials
    encode as the strings "NaN"/"Infinity"/"-Infinity"; for "S"/"V" dtypes a
    string fill is the base64 encoding of the raw bytes.
    """
    if fill is None:
        return 0
    if isinstance(fill, str):
        if dtype.kind in "fc":
            specials = {"NaN": np.nan, "Infinity": np.inf, "-Infinity": -np.inf}
            if fill in specials:
                return specials[fill]
            raise ZarrError(f"unsupported string fill_value {fill!r} for dtype {dtype}")
        if dtype.kind in "SV":
            import base64

            try:
                return base64.b64decode(fill)
            except Exception as exc:
                raise ZarrError(f"fill_value {fill!r} is not valid base64 for dtype {dtype}") from exc
        if dtype.kind == "U":
            return fill
        raise ZarrError(f"string fill_value {fill!r} invalid for dtype {dtype}")
    return fill


def read_array(store: str, name: str, meta: dict | None = None,
               attrs: dict | None = None) -> tuple[np.ndarray, dict]:
    """Decode one Zarr array (all chunks) from a directory store."""
    adir = os.path.join(store, name)
    if meta is None:
        zpath = os.path.join(adir, ".zarray")
        if os.path.exists(zpath):
            with open(zpath) as fh:
                meta = json.load(fh)
        else:  # Zarr v3 array: one zarr.json carries metadata + attributes
            with open(os.path.join(adir, "zarr.json")) as fh:
                meta = json.load(fh)
    za = _load_zarray(meta)
    if attrs is None:
        attrs = {}
        if za.version == 3:
            attrs = dict(meta.get("attributes") or {})
            if meta.get("dimension_names"):
                # surface v3 dimension names through the xarray convention so
                # the Dataset mapping is format-agnostic
                attrs.setdefault("_ARRAY_DIMENSIONS", list(meta["dimension_names"]))
        else:
            apath = os.path.join(adir, ".zattrs")
            if os.path.exists(apath):
                with open(apath) as fh:
                    attrs = json.load(fh)
    fill = _resolve_fill(za.fill_value, za.dtype)
    out = np.full(za.shape, fill, za.dtype) if za.shape else np.zeros((), za.dtype)
    grid = [
        range((s + c - 1) // c) for s, c in zip(za.shape, za.chunks)
    ] or [range(1)]
    import itertools

    for idx in itertools.product(*grid):
        cpath = os.path.join(adir, _chunk_relpath(za, idx if za.shape else ()))
        if not os.path.exists(cpath):
            continue  # missing chunk = fill value
        with open(cpath, "rb") as fh:
            raw = fh.read()
        if za.version == 3:
            chunk = _decode_v3_chunk(raw, za)
        else:
            chunk = np.frombuffer(_decompress(raw, za.compressor), za.dtype).reshape(za.chunks)
        if za.shape:
            sel = tuple(
                slice(i * c, min((i + 1) * c, s))
                for i, c, s in zip(idx, za.chunks, za.shape)
            )
            csel = tuple(slice(0, sl.stop - sl.start) for sl in sel)
            out[sel] = chunk[csel]
        else:
            out = chunk
    return out, attrs


def read(path: str) -> Dataset:
    """Read a Zarr v2 group store into the netcdf3 Dataset model.  Uses
    consolidated metadata (.zmetadata) when present — the one-GET cloud
    pattern — else walks per-array .zarray files."""
    ds = Dataset()
    consolidated = None
    zmeta = os.path.join(path, ".zmetadata")
    if os.path.exists(zmeta):
        with open(zmeta) as fh:
            consolidated = json.load(fh).get("metadata", {})
    gattrs_path = os.path.join(path, ".zattrs")
    root_v3 = os.path.join(path, "zarr.json")
    if consolidated and ".zattrs" in consolidated:
        ds.attributes = dict(consolidated[".zattrs"])
    elif os.path.exists(gattrs_path):
        with open(gattrs_path) as fh:
            ds.attributes = json.load(fh)
    v3_meta: dict | None = None
    if os.path.exists(root_v3) and not consolidated:
        with open(root_v3) as fh:
            root_meta = json.load(fh)
        if root_meta.get("node_type") == "group":
            ds.attributes = dict(root_meta.get("attributes") or {})
            # v3 consolidated metadata (one-GET cloud read): the root node
            # inlines every child's zarr.json under consolidated_metadata
            cm = root_meta.get("consolidated_metadata") or {}
            if cm.get("metadata"):
                v3_meta = dict(cm["metadata"])

    if v3_meta is not None:
        names = sorted(
            k for k, m in v3_meta.items() if m.get("node_type") == "array"
        )
        if not names:
            raise ZarrError(f"no Zarr arrays found under {path!r}")
        for name in names:
            arr, attrs = read_array(path, name, v3_meta[name])
            dims = tuple(attrs.get("_ARRAY_DIMENSIONS", ()))
            if not dims:
                dims = tuple(f"dim_{i}" for i in range(arr.ndim))
            for d, s in zip(dims, arr.shape):
                ds.dimensions.setdefault(d, s)
            user_attrs = {k: v for k, v in attrs.items() if k != "_ARRAY_DIMENSIONS"}
            ds.variables[name] = Variable(name, dims, user_attrs, arr)
        return ds

    if consolidated:
        names = sorted(
            k[: -len("/.zarray")] for k in consolidated if k.endswith("/.zarray")
        )
    else:
        # walk nested groups (.zgroup dirs, or v3 zarr.json group nodes):
        # array names become their slash-joined store paths, mirroring
        # consolidated-key naming
        names = []

        def _v3_node(sub: str) -> str | None:
            zj = os.path.join(sub, "zarr.json")
            if not os.path.exists(zj):
                return None
            with open(zj) as fh:
                return json.load(fh).get("node_type")

        def walk(rel: str):
            base = os.path.join(path, rel) if rel else path
            for n in sorted(os.listdir(base)):
                sub = os.path.join(base, n)
                full = f"{rel}/{n}" if rel else n
                if not os.path.isdir(sub):
                    continue
                if os.path.exists(os.path.join(sub, ".zarray")):
                    names.append(full)
                elif os.path.exists(os.path.join(sub, ".zgroup")):
                    walk(full)
                else:
                    node = _v3_node(sub)
                    if node == "array":
                        names.append(full)
                    elif node == "group":
                        walk(full)

        walk("")
    if not names:
        raise ZarrError(f"no Zarr arrays found under {path!r}")

    for name in names:
        meta = consolidated.get(f"{name}/.zarray") if consolidated else None
        attrs = consolidated.get(f"{name}/.zattrs") if consolidated else None
        arr, attrs = read_array(path, name, meta, attrs)
        dims = tuple(attrs.get("_ARRAY_DIMENSIONS", ()))
        if not dims:  # plain Zarr without the xarray convention
            dims = tuple(f"dim_{i}" for i in range(arr.ndim))
        for d, s in zip(dims, arr.shape):
            ds.dimensions.setdefault(d, s)
        user_attrs = {k: v for k, v in attrs.items() if k != "_ARRAY_DIMENSIONS"}
        ds.variables[name] = Variable(name, dims, user_attrs, arr)
    return ds


def write(path: str, ds: Dataset, chunks: dict | None = None,
          compress: int | str | None = 4, zarr_format: int = 2,
          shard_inner: dict | None = None) -> None:
    """Write the Dataset as a Zarr group store.
    `chunks` maps variable name -> chunk shape (defaults to one chunk per
    ~first-dimension slab bounded at 1024 rows). `compress` is a zlib level,
    "blosc-lz4" for a blosc frame (the v2 cloud-store default codec),
    "zstd", or None. `zarr_format=2` (default) writes .zarray/.zattrs +
    consolidated metadata; `zarr_format=3` writes zarr.json nodes with a
    bytes+compressor codec chain, `c/`-prefixed chunk keys and
    dimension_names (the zarr-python 3 layout)."""
    if zarr_format == 3:
        return _write_v3(path, ds, chunks, compress, shard_inner)
    if zarr_format != 2:
        raise ZarrError(f"zarr_format {zarr_format} unsupported (2 or 3)")
    os.makedirs(path, exist_ok=True)
    consolidated: dict = {".zgroup": {"zarr_format": 2}}
    with open(os.path.join(path, ".zgroup"), "w") as fh:
        json.dump({"zarr_format": 2}, fh)
    if ds.attributes:
        gattrs = _json_safe(ds.attributes)
        consolidated[".zattrs"] = gattrs
        with open(os.path.join(path, ".zattrs"), "w") as fh:
            json.dump(gattrs, fh)

    dim_sizes = {
        n: (sz if sz is not None else _unlimited_size(ds, n))
        for n, sz in ds.dimensions.items()
    }
    for name, v in ds.variables.items():
        arr = np.ascontiguousarray(v.data)
        if arr.dtype.kind in ("U", "S"):
            arr = arr.astype(f"S{max(arr.dtype.itemsize, 1)}")
        adir = os.path.join(path, name)
        os.makedirs(adir, exist_ok=True)
        cshape = tuple(
            (chunks or {}).get(name)
            # chunk dims are >= 1 even for zero-length arrays (spec: chunks
            # must be positive; a 0-length array simply has no chunk files)
            or [max(1, min(s, 1024)) if i == 0 else max(1, s)
                for i, s in enumerate(arr.shape)]
        ) or arr.shape
        nchunks = [
            (s + c - 1) // c for s, c in zip(arr.shape, cshape)
        ] or [1]
        compressor = None
        import itertools

        for idx in itertools.product(*[range(n) for n in nchunks]):
            sel = tuple(
                slice(i * c, min((i + 1) * c, s))
                for i, c, s in zip(idx, cshape, arr.shape)
            )
            piece = np.zeros(cshape, arr.dtype) if arr.shape else arr
            if arr.shape:
                src = arr[sel]
                piece[tuple(slice(0, x.stop - x.start) for x in sel)] = src
            raw, compressor = _compress(piece.tobytes(), compress, arr.dtype.itemsize)
            with open(os.path.join(adir, ".".join(map(str, idx)) or "0"), "wb") as fh:
                fh.write(raw)

        zmeta = {
            "zarr_format": 2,
            "shape": list(arr.shape),
            "chunks": list(cshape) or [1],
            "dtype": arr.dtype.str,
            "compressor": compressor,
            "fill_value": "NaN" if arr.dtype.kind == "f" else 0,
            "order": "C",
            "filters": None,
        }
        attrs = _json_safe(dict(v.attributes))
        attrs["_ARRAY_DIMENSIONS"] = list(v.dimensions)
        with open(os.path.join(adir, ".zarray"), "w") as fh:
            json.dump(zmeta, fh)
        with open(os.path.join(adir, ".zattrs"), "w") as fh:
            json.dump(attrs, fh)
        consolidated[f"{name}/.zarray"] = zmeta
        consolidated[f"{name}/.zattrs"] = attrs

    with open(os.path.join(path, ".zmetadata"), "w") as fh:
        json.dump({"zarr_consolidated_format": 1, "metadata": consolidated}, fh)


def _v3_compress(raw: bytes, compress, itemsize: int) -> tuple[bytes, list]:
    """Encode one chunk for v3; returns (payload, bytes->bytes codec metas)."""
    if compress is None:
        return raw, []
    if compress in ("blosc", "blosc-lz4"):
        from ophidia_server_spark.sources.lz4blosc import blosc_compress

        conf = {
            "cname": "lz4", "clevel": 5, "typesize": itemsize, "blocksize": 0,
            "shuffle": "shuffle" if itemsize > 1 else "noshuffle",
        }
        return blosc_compress(raw, itemsize), [{"name": "blosc", "configuration": conf}]
    if compress == "zstd":
        from ophidia_server_spark.sources import codecs

        return codecs.zstd_compress(raw, 3), [
            {"name": "zstd", "configuration": {"level": 3, "checksum": False}}
        ]
    # int zlib level -> the v3 gzip codec (RFC 1952 framing, wbits 31)
    co = zlib.compressobj(compress, zlib.DEFLATED, 31)
    return co.compress(raw) + co.flush(), [
        {"name": "gzip", "configuration": {"level": compress}}
    ]


def _encode_shard(
    piece: np.ndarray, inner: tuple, compress, itemsize: int
) -> tuple[bytes, list]:
    """Encode one shard object: inner chunks through the bytes+compressor
    chain, concatenated, followed by the (offset, nbytes) u64-LE index with
    its crc32c — the `sharding_indexed` on-disk layout the reader parses."""
    import itertools
    import struct

    grid = [o // i for o, i in zip(piece.shape, inner)]
    body = b""
    entries = []
    inner_metas: list = []
    for idx in itertools.product(*[range(g) for g in grid]):
        sel = tuple(slice(i * c, (i + 1) * c) for i, c in zip(idx, inner))
        enc, inner_metas = _v3_compress(
            np.ascontiguousarray(piece[sel]).tobytes(), compress, itemsize
        )
        entries.append((len(body), len(enc)))
        body += enc
    index = b"".join(struct.pack("<QQ", o, nb) for o, nb in entries)
    index += _crc32c(index).to_bytes(4, "little")
    conf = {
        "chunk_shape": list(inner),
        "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}]
        + inner_metas,
        "index_codecs": [{"name": "bytes"}, {"name": "crc32c"}],
        "index_location": "end",
    }
    return body + index, [{"name": "sharding_indexed", "configuration": conf}]


def _write_v3(path: str, ds: Dataset, chunks: dict | None,
              compress: int | str | None,
              shard_inner: dict | None = None) -> None:
    """Zarr v3 writer: zarr.json per node, regular chunk grid, default
    ("c/"-prefixed) chunk keys, bytes(little) + compressor codec chain.
    `shard_inner` maps variable name -> inner chunk shape: that variable's
    chunks become SHARDS (sharding_indexed codec) holding many inner chunks
    per object — the 100 TB object-store knob (a billion-chunk array stays
    a million objects while reads still address inner chunks)."""
    import itertools

    os.makedirs(path, exist_ok=True)
    child_meta: dict[str, dict] = {}
    for name, v in ds.variables.items():
        arr = np.ascontiguousarray(v.data)
        key = arr.dtype.str.lstrip("<>=|")
        if key not in _V3_DTYPES_INV:
            raise ZarrError(f"dtype {arr.dtype} has no Zarr v3 core data type")
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        adir = os.path.join(path, name)
        os.makedirs(adir, exist_ok=True)
        cshape = tuple(
            (chunks or {}).get(name)
            or [max(1, min(s, 1024)) if i == 0 else max(1, s)
                for i, s in enumerate(arr.shape)]
        ) or arr.shape
        inner = tuple((shard_inner or {}).get(name) or ())
        if inner:
            if len(inner) != len(cshape) or any(c % i for c, i in zip(cshape, inner)):
                raise ZarrError(
                    f"shard inner shape {inner} must divide the chunk shape {cshape}"
                )
        nchunks = [(s + c - 1) // c for s, c in zip(arr.shape, cshape)] or [1]
        codec_metas: list = []
        for idx in itertools.product(*[range(n) for n in nchunks]):
            sel = tuple(
                slice(i * c, min((i + 1) * c, s))
                for i, c, s in zip(idx, cshape, arr.shape)
            )
            piece = np.zeros(cshape, arr.dtype) if arr.shape else arr
            if arr.shape:
                src = arr[sel]
                piece[tuple(slice(0, x.stop - x.start) for x in sel)] = src
            if inner:
                payload, codec_metas = _encode_shard(
                    piece, inner, compress, arr.dtype.itemsize
                )
            else:
                payload, codec_metas = _v3_compress(
                    piece.tobytes(), compress, arr.dtype.itemsize
                )
            rel = "/".join(["c"] + [str(i) for i in (idx if arr.shape else ())])
            cpath = os.path.join(adir, rel)
            os.makedirs(os.path.dirname(cpath), exist_ok=True)
            with open(cpath, "wb") as fh:
                fh.write(payload)
        meta = {
            "zarr_format": 3,
            "node_type": "array",
            "shape": list(arr.shape),
            "data_type": _V3_DTYPES_INV[key],
            "chunk_grid": {
                "name": "regular",
                "configuration": {"chunk_shape": list(cshape) or []},
            },
            "chunk_key_encoding": {
                "name": "default", "configuration": {"separator": "/"},
            },
            "fill_value": "NaN" if arr.dtype.kind == "f" else 0,
            # sharded arrays carry ONLY the sharding codec at the top level
            # (the bytes+compressor chain lives inside its configuration)
            "codecs": (
                codec_metas if inner
                else [{"name": "bytes", "configuration": {"endian": "little"}}]
                + codec_metas
            ),
            "attributes": _json_safe(dict(v.attributes)),
            "dimension_names": list(v.dimensions),
        }
        with open(os.path.join(adir, "zarr.json"), "w") as fh:
            json.dump(meta, fh)
        child_meta[name] = meta
    # root group node last, inlining every child's metadata (v3 consolidated
    # metadata — the one-GET cloud read, mirroring v2's .zmetadata)
    with open(os.path.join(path, "zarr.json"), "w") as fh:
        json.dump(
            {
                "zarr_format": 3, "node_type": "group",
                "attributes": _json_safe(ds.attributes or {}),
                "consolidated_metadata": {
                    "kind": "inline", "must_understand": False,
                    "metadata": child_meta,
                },
            },
            fh,
        )


def _json_safe(attrs: dict) -> dict:
    out = {}
    for k, v in attrs.items():
        if isinstance(v, np.generic):
            v = v.item()
        elif isinstance(v, np.ndarray):
            v = v.tolist()
        out[k] = v
    return out


def _unlimited_size(ds: Dataset, dim: str) -> int:
    for v in ds.variables.values():
        if v.dimensions and v.dimensions[0] == dim:
            return int(np.asarray(v.data).shape[0])
    return 0
