"""Pure-Python netCDF-4 (HDF5) codec.

Real climate archives (CMIP5/6) are predominantly netCDF-4 — HDF5 container
files carrying the netCDF data model via the public "NetCDF-4 Format" mapping
(dimension-scale datasets + DIMENSION_LIST references).  The reference's
ingest surface is oph_importnc (/root/reference/src/oph_json_objkeys.h:114-117)
and real deployments feed it netCDF-4; this container has no libhdf5/h5py /
netCDF4 library, so the subset of the public HDF5 File Format Specification
that netCDF-4 files actually use is implemented directly:

  read:  superblock v0/v2/v3; object headers v1 and v2 (OHDR, incl. OCHK
         continuations); groups stored as symbol tables (TREE/HEAP/SNOD) or
         as in-header link messages; dataspace v1/v2; datatypes fixed-point,
         IEEE float, fixed string, vlen string, object reference, vlen
         sequence, compound (struct columns, v1-v3 member encodings);
         data layout v3 compact/contiguous/chunked (v1 chunk
         B-tree) and v4 (ALL five libver-latest chunk indexes:
         single-chunk, implicit, fixed-array incl. filtered elements and
         paged data blocks, extensible-array incl. super blocks and
         secondary data-block pages, and v2 B-tree at any depth incl.
         internal nodes); filters deflate (zlib), shuffle, fletcher32 with per-chunk
         filter masks; attributes v1/v2/v3 incl. global-heap vlen payloads
         and dense storage (ATTRINFO -> fractal heap + name-index v2
         B-tree); the netCDF-4 dimension mapping (CLASS=DIMENSION_SCALE
         datasets, DIMENSION_LIST object references, phony "this is a
         netCDF dimension" scales).
  write: superblock v0, v1 object headers, symbol-table root group,
         contiguous or single-level-chunked (+deflate/shuffle) datasets
         (v1-B-tree, extensible-array, or v2-B-tree chunk indexes via
         index=), the netCDF-4 dimension-scale convention
         (CLASS/NAME/DIMENSION_LIST/_Netcdf4Dimid attributes, vlen
         references through a global heap) — enough that the files we
         write are valid netCDF-4 for any reader and roundtrip
         byte-exactly through read().

The API mirrors sources/netcdf3.py: read(path) -> netcdf3.Dataset and
write(path, ds), so operators/io_ops.py dispatches on the file magic and the
rest of the engine is format-blind.  Per-file decode is one sequential read;
the Spark side parallelizes across files (mapInPandas), matching the
fragment-per-task model the reference uses for its NetCDF ingest.

Everything here derives from the public "HDF5 File Format Specification
Version 2.0" and the public netCDF-4 format documentation; no library code
was consulted or ported.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

from ophidia_server_spark.sources.netcdf3 import Dataset, Variable

MAGIC = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF

# message type ids (spec IV.A.2)
M_NIL, M_DATASPACE, M_LINKINFO, M_DATATYPE = 0x00, 0x01, 0x02, 0x03
M_FILL_OLD, M_FILL, M_LINK, M_LAYOUT = 0x04, 0x05, 0x06, 0x08
M_GROUPINFO, M_FILTERS, M_ATTR, M_CONT, M_SYMTAB = 0x0A, 0x0B, 0x0C, 0x10, 0x11
M_ATTRINFO = 0x15

# netCDF-4 bookkeeping attributes hidden from users (public netCDF-4 mapping)
_HIDDEN_ATTRS = {
    "CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST",
    "_Netcdf4Dimid", "_Netcdf4Coordinates", "_NCProperties",
}


class Hdf5Error(ValueError):
    """Named error for the HDF5 features outside the implemented subset."""


# ---------------------------------------------------------------------------
# datatype model (shared by reader and writer)
# ---------------------------------------------------------------------------

@dataclass
class DType:
    cls: int                    # HDF5 datatype class
    size: int
    np_dtype: np.dtype | None = None
    vlen_base: "DType | None" = None   # class 9
    is_vlen_string: bool = False
    charset_utf8: bool = False


def _parse_datatype(buf: bytes, off: int) -> tuple[DType, int]:
    """Parse a datatype message at `off`; returns (DType, bytes consumed)."""
    b0 = buf[off]
    version, cls = b0 >> 4, b0 & 0x0F
    bits = buf[off + 1] | (buf[off + 2] << 8) | (buf[off + 3] << 16)
    size = struct.unpack_from("<I", buf, off + 4)[0]
    pos = off + 8
    if cls == 0:  # fixed-point
        big = bits & 1
        signed = bool(bits & 0x08)
        dt = np.dtype(f"{'>' if big else '<'}{'i' if signed else 'u'}{size}")
        return DType(cls, size, dt), pos + 4 - off
    if cls == 1:  # IEEE float
        big = bits & 1
        dt = np.dtype(f"{'>' if big else '<'}f{size}")
        return DType(cls, size, dt), pos + 12 - off
    if cls == 3:  # fixed-length string
        return DType(cls, size, np.dtype(f"S{size}"),
                     charset_utf8=bool((bits >> 8) & 0x0F)), pos - off
    if cls == 7:  # reference (object reference only)
        if bits & 0x0F:
            raise Hdf5Error("only object references are supported")
        return DType(cls, size), pos - off
    if cls == 9:  # variable-length
        vtype = bits & 0x0F
        utf8 = bool((bits >> 8) & 0x0F)
        base, used = _parse_datatype(buf, pos)
        return (
            DType(cls, size, vlen_base=base, is_vlen_string=(vtype == 1),
                  charset_utf8=utf8),
            pos + used - off,
        )
    if cls == 6:  # compound: decode members into a structured numpy dtype
        nmembers = bits & 0xFFFF
        names, formats, offsets = [], [], []
        pos_m = pos
        for _ in range(nmembers):
            e = buf.index(b"\x00", pos_m)
            nm = buf[pos_m:e].decode("utf-8")
            if version in (1, 2):   # name null-padded to a multiple of 8
                nlen = e - pos_m + 1
                pos_m += nlen + ((8 - nlen % 8) % 8)
                moff = struct.unpack_from("<I", buf, pos_m)[0]
                pos_m += 4
                if version == 1:
                    ndims = buf[pos_m]
                    if ndims:
                        raise Hdf5Error("array-valued compound members unsupported")
                    # dimensionality(1) reserved(3) perm(4) reserved(4) dims(16)
                    pos_m += 28
            else:                   # version 3: bare name, variable offset size
                pos_m = e + 1
                osz = max(1, (max(size, 1).bit_length() + 7) // 8)
                moff = int.from_bytes(buf[pos_m : pos_m + osz], "little")
                pos_m += osz
            mdt, used = _parse_datatype(buf, pos_m)
            pos_m += used
            names.append(nm)
            offsets.append(moff)
            formats.append(
                mdt.np_dtype if mdt.np_dtype is not None else np.dtype(f"V{mdt.size}")
            )
        np_dt = np.dtype(
            {"names": names, "formats": formats, "offsets": offsets, "itemsize": size}
        )
        return DType(cls, size, np_dt), pos_m - off
    raise Hdf5Error(f"HDF5 datatype class {cls} is outside the netCDF-4 subset")


def _parse_dataspace(buf: bytes, off: int) -> tuple[list[int], list[int]]:
    """Returns (dims, maxdims); scalar space -> ([], [])."""
    version = buf[off]
    if version == 1:
        rank, flags = buf[off + 1], buf[off + 2]
        pos = off + 8
    elif version == 2:
        rank, flags = buf[off + 1], buf[off + 2]
        pos = off + 4
    else:
        raise Hdf5Error(f"dataspace version {version} unsupported")
    dims = [struct.unpack_from("<Q", buf, pos + 8 * i)[0] for i in range(rank)]
    pos += 8 * rank
    maxdims = dims
    if flags & 1:
        maxdims = [struct.unpack_from("<Q", buf, pos + 8 * i)[0] for i in range(rank)]
    return dims, maxdims


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _lookup3(data: bytes, init: int = 0) -> int:
    """Jenkins lookup3 `hashlittle` — the metadata checksum of every v2-era
    HDF5 block (spec: "Checksum" fields of EAHD/EAIB/EADB/EASB/BTHD/...;
    the algorithm is Bob Jenkins' public lookup3.c, 2006)."""
    M = 0xFFFFFFFF

    def rot(x, k):
        return ((x << k) | (x >> (32 - k))) & M

    length = len(data)
    a = b = c = (0xDEADBEEF + length + init) & M
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i : i + 4], "little")) & M
        b = (b + int.from_bytes(data[i + 4 : i + 8], "little")) & M
        c = (c + int.from_bytes(data[i + 8 : i + 12], "little")) & M
        a = (a - c) & M; a ^= rot(c, 4); c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 6); a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 8); b = (b + a) & M
        a = (a - c) & M; a ^= rot(c, 16); c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 19); a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 4); b = (b + a) & M
        i += 12
        length -= 12
    if length == 0:
        return c
    tail = data[i:] + b"\x00" * (12 - length)
    a = (a + int.from_bytes(tail[0:4], "little")) & M
    if length > 4:
        b = (b + int.from_bytes(tail[4:8], "little")) & M
    if length > 8:
        c = (c + int.from_bytes(tail[8:12], "little")) & M
    c ^= b; c = (c - rot(b, 14)) & M
    a ^= c; a = (a - rot(c, 11)) & M
    b ^= a; b = (b - rot(a, 25)) & M
    c ^= b; c = (c - rot(b, 16)) & M
    a ^= c; a = (a - rot(c, 4)) & M
    b ^= a; b = (b - rot(a, 14)) & M
    c ^= b; c = (c - rot(b, 24)) & M
    return c


def _ea_sblk_info(max_nelmts_bits: int, data_blk_min_elmts: int):
    """Per-super-block geometry of an extensible array (H5EA design: data
    block sizes double every other super block). Returns a list of
    (ndblks, dblk_nelmts, start_idx, start_dblk) where start_idx is the
    element offset past the index-block elements."""
    nsblks = 1 + (max_nelmts_bits - (data_blk_min_elmts.bit_length() - 1))
    out = []
    start_idx = start_dblk = 0
    for u in range(nsblks):
        ndblks = 1 << (u // 2)
        dblk_nelmts = data_blk_min_elmts * (1 << ((u + 1) // 2))
        out.append((ndblks, dblk_nelmts, start_idx, start_dblk))
        start_idx += ndblks * dblk_nelmts
        start_dblk += ndblks
    return out


@dataclass
class _Obj:
    """One HDF5 object (dataset or group) during the read walk."""

    name: str
    addr: int
    dims: list[int] = field(default_factory=list)
    maxdims: list[int] = field(default_factory=list)
    dtype: DType | None = None
    layout: tuple | None = None     # ('contiguous', addr, size) | ('chunked', btree, chunk_dims) | ('compact', bytes)
    filters: list[tuple[int, list[int]]] = field(default_factory=list)
    attrs: dict = field(default_factory=dict)
    children: "list[_Obj]" = field(default_factory=list)   # groups only
    is_group: bool = False


class _H5Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        sb_off = self._find_superblock()
        self.base = sb_off
        self.root_addr = self._parse_superblock(sb_off)

    # -- superblock ---------------------------------------------------------

    def _find_superblock(self) -> int:
        off = 0
        while off < len(self.buf):
            if self.buf[off : off + 8] == MAGIC:
                return off
            off = 512 if off == 0 else off * 2
        raise Hdf5Error("HDF5 signature not found")

    def _parse_superblock(self, off: int) -> int:
        version = self.buf[off + 8]
        if version == 0 or version == 1:
            so, sl = self.buf[off + 13], self.buf[off + 14]
            if (so, sl) != (8, 8):
                raise Hdf5Error(f"offset/length sizes {so}/{sl} unsupported (need 8/8)")
            ste_off = off + 24 + 32 + (4 if version == 1 else 0)
            # root group symbol table entry: link-name-offset(8) | OH addr(8)
            return struct.unpack_from("<Q", self.buf, ste_off + 8)[0]
        if version in (2, 3):
            so, sl = self.buf[off + 9], self.buf[off + 10]
            if (so, sl) != (8, 8):
                raise Hdf5Error(f"offset/length sizes {so}/{sl} unsupported (need 8/8)")
            return struct.unpack_from("<Q", self.buf, off + 12 + 8 * 3)[0]
        raise Hdf5Error(f"superblock version {version} unsupported")

    def at(self, addr: int) -> int:
        return self.base + addr

    # -- object headers -----------------------------------------------------

    def read_object(self, addr: int, name: str) -> _Obj:
        obj = _Obj(name=name, addr=addr)
        if self.buf[self.at(addr) : self.at(addr) + 4] == b"OHDR":
            msgs = self._messages_v2(addr)
        else:
            msgs = self._messages_v1(addr)
        symtab = None
        links = []
        for mtype, data_off, data_len in msgs:
            if mtype == M_DATASPACE:
                obj.dims, obj.maxdims = _parse_dataspace(self.buf, data_off)
            elif mtype == M_DATATYPE:
                obj.dtype, _ = _parse_datatype(self.buf, data_off)
            elif mtype == M_LAYOUT:
                obj.layout = self._parse_layout(data_off)
            elif mtype == M_FILTERS:
                obj.filters = self._parse_filters(data_off)
            elif mtype == M_ATTR:
                k, v = self._parse_attribute(data_off)
                obj.attrs[k] = v
            elif mtype == M_SYMTAB:
                symtab = struct.unpack_from("<QQ", self.buf, data_off)
            elif mtype == M_LINK:
                links.append(self._parse_link(data_off))
            elif mtype == M_ATTRINFO:
                # spec: version(1) flags(1) [max creation index(2)]
                # fractal-heap addr(8) name-index v2-B-tree addr(8)
                aflags = self.buf[data_off + 1]
                pos = data_off + 2 + (2 if aflags & 1 else 0)
                fheap, name_bt = struct.unpack_from("<QQ", self.buf, pos)
                if fheap != UNDEF:
                    for k, v in self._dense_attributes(fheap, name_bt):
                        obj.attrs[k] = v
        if symtab is not None:
            obj.is_group = True
            btree, heap = symtab
            for child_name, child_addr in self._walk_symbol_table(btree, heap):
                obj.children.append(self.read_object(child_addr, child_name))
        elif links:
            obj.is_group = True
            for child_name, child_addr in links:
                obj.children.append(self.read_object(child_addr, child_name))
        return obj

    def _messages_v1(self, addr: int):
        p = self.at(addr)
        version = self.buf[p]
        if version != 1:
            raise Hdf5Error(f"object header version {version} unsupported")
        nmess = struct.unpack_from("<H", self.buf, p + 2)[0]
        hsize = struct.unpack_from("<I", self.buf, p + 8)[0]
        blocks = [(p + 16, hsize)]
        out = []
        while blocks and len(out) < nmess:
            bp, blen = blocks.pop(0)
            end = bp + blen
            while bp + 8 <= end and len(out) < nmess:
                mtype, msize, _flags = struct.unpack_from("<HHB", self.buf, bp)
                data_off = bp + 8
                if mtype == M_CONT:
                    coff, clen = struct.unpack_from("<QQ", self.buf, data_off)
                    blocks.append((self.at(coff), clen))
                elif mtype != M_NIL:
                    out.append((mtype, data_off, msize))
                bp = data_off + msize
        return out

    def _messages_v2(self, addr: int):
        out = []

        def scan_block(p: int, first: bool):
            if first:
                flags = self.buf[p + 5]
                q = p + 6
                if flags & 0x20:
                    q += 8          # access/mod/change/birth times
                if flags & 0x10:
                    q += 4          # max compact / min dense
                cs_bytes = 1 << (flags & 0x03)
                chunk0 = int.from_bytes(self.buf[q : q + cs_bytes], "little")
                q += cs_bytes
                end = q + chunk0
            else:
                flags = self._v2_flags
                q = p + 4           # skip OCHK signature
                end = self._block_end
            track = bool(flags & 0x04)
            while q + 4 <= end:
                mtype = self.buf[q]
                msize = struct.unpack_from("<H", self.buf, q + 1)[0]
                q += 4 + (2 if track else 0)
                if mtype == M_CONT:
                    coff, clen = struct.unpack_from("<QQ", self.buf, q)
                    conts.append((self.at(coff), clen))
                elif mtype != M_NIL:
                    out.append((mtype, q, msize))
                q += msize

        p = self.at(addr)
        self._v2_flags = self.buf[p + 5]
        conts: list[tuple[int, int]] = []
        scan_block(p, True)
        while conts:
            cp, clen = conts.pop(0)
            if self.buf[cp : cp + 4] != b"OCHK":
                raise Hdf5Error("bad OCHK continuation signature")
            self._block_end = cp + clen - 4     # trailing checksum
            scan_block(cp, False)
        return out

    def _parse_link(self, off: int) -> tuple[str, int]:
        version, flags = self.buf[off], self.buf[off + 1]
        pos = off + 2
        ltype = 0
        if flags & 0x08:
            ltype = self.buf[pos]; pos += 1
        if flags & 0x04:
            pos += 8        # creation order
        if flags & 0x10:
            pos += 1        # charset
        ls = 1 << (flags & 0x03)
        nlen = int.from_bytes(self.buf[pos : pos + ls], "little")
        pos += ls
        nm = self.buf[pos : pos + nlen].decode("utf-8")
        pos += nlen
        if ltype != 0:
            raise Hdf5Error("only hard links are supported")
        return nm, struct.unpack_from("<Q", self.buf, pos)[0]

    # -- groups: TREE / HEAP / SNOD ----------------------------------------

    def _walk_symbol_table(self, btree_addr: int, heap_addr: int):
        hp = self.at(heap_addr)
        if self.buf[hp : hp + 4] != b"HEAP":
            raise Hdf5Error("bad local heap signature")
        heap_data = struct.unpack_from("<Q", self.buf, hp + 24)[0]

        def heap_name(offset: int) -> str:
            p = self.at(heap_data) + offset
            e = self.buf.index(b"\x00", p)
            return self.buf[p:e].decode("utf-8")

        def walk(addr: int):
            p = self.at(addr)
            sig = self.buf[p : p + 4]
            if sig == b"TREE":
                level = self.buf[p + 5]
                used = struct.unpack_from("<H", self.buf, p + 6)[0]
                q = p + 24      # past siblings
                # keys and children interleave: key0 child0 ... key_n
                children = []
                q += 8          # key 0
                for _ in range(used):
                    children.append(struct.unpack_from("<Q", self.buf, q)[0])
                    q += 16     # child + next key
                for c in children:
                    yield from walk(c)
            elif sig == b"SNOD":
                nsym = struct.unpack_from("<H", self.buf, p + 6)[0]
                q = p + 8
                for _ in range(nsym):
                    name_off, oh_addr = struct.unpack_from("<QQ", self.buf, q)
                    yield heap_name(name_off), oh_addr
                    q += 40
            else:
                raise Hdf5Error(f"bad group node signature {sig!r}")

        yield from walk(btree_addr)

    # -- layout / filters / data -------------------------------------------

    def _parse_layout(self, off: int) -> tuple:
        version = self.buf[off]
        if version == 3:
            lclass = self.buf[off + 1]
            if lclass == 0:
                size = struct.unpack_from("<H", self.buf, off + 2)[0]
                return ("compact", self.buf[off + 4 : off + 4 + size])
            if lclass == 1:
                a, s = struct.unpack_from("<QQ", self.buf, off + 2)
                return ("contiguous", a, s)
            if lclass == 2:
                ndim = self.buf[off + 2]
                bt = struct.unpack_from("<Q", self.buf, off + 3)[0]
                cdims = [
                    struct.unpack_from("<I", self.buf, off + 11 + 4 * i)[0]
                    for i in range(ndim)
                ]
                return ("chunked", bt, cdims)    # last entry = element size
            raise Hdf5Error(f"layout class {lclass} unsupported")
        if version == 4:
            # libver-latest files (spec: Data Layout Message v4): chunked
            # layouts carry a chunk-index type instead of the v1 B-tree
            lclass = self.buf[off + 1]
            if lclass == 0:
                size = struct.unpack_from("<H", self.buf, off + 2)[0]
                return ("compact", self.buf[off + 4 : off + 4 + size])
            if lclass == 1:
                a, s = struct.unpack_from("<QQ", self.buf, off + 2)
                return ("contiguous", a, s)
            if lclass != 2:
                raise Hdf5Error(f"layout v4 class {lclass} unsupported")
            flags = self.buf[off + 2]
            ndim = self.buf[off + 3]
            enc = self.buf[off + 4]
            pos = off + 5
            cdims = []
            for _ in range(ndim):
                cdims.append(int.from_bytes(self.buf[pos : pos + enc], "little"))
                pos += enc
            itype = self.buf[pos]
            pos += 1
            info: dict = {"flags": flags}
            if itype == 1:          # single chunk
                if flags & 0x02:    # filtered: size + mask precede the address
                    info["csize"] = struct.unpack_from("<Q", self.buf, pos)[0]
                    info["mask"] = struct.unpack_from("<I", self.buf, pos + 8)[0]
                    pos += 12
            elif itype == 2:        # implicit: contiguous unfiltered chunks
                pass
            elif itype == 3:        # fixed array
                info["page_bits"] = self.buf[pos]
                pos += 1
            elif itype == 4:        # extensible array (1 unlimited dim)
                # spec: Max Bits, Index Elements, Min Pointers, Min
                # Elements (1 byte each) + Page Bits (2) — the creation
                # parameters are repeated in the EAHD block itself, which
                # the reader treats as authoritative
                info["max_bits"] = self.buf[pos]
                info["index_elmts"] = self.buf[pos + 1]
                info["min_pointers"] = self.buf[pos + 2]
                info["min_elmts"] = self.buf[pos + 3]
                info["page_bits"] = struct.unpack_from("<H", self.buf, pos + 4)[0]
                pos += 6
            elif itype == 5:        # version-2 B-tree (>1 unlimited dim)
                # spec: Node Size (4), Split Percent (1), Merge Percent (1)
                info["node_size"] = struct.unpack_from("<I", self.buf, pos)[0]
                info["split"] = self.buf[pos + 4]
                info["merge"] = self.buf[pos + 5]
                pos += 6
            else:
                raise Hdf5Error(f"v4 chunk index type {itype} unknown")
            addr = struct.unpack_from("<Q", self.buf, pos)[0]
            return ("chunked4", cdims, itype, addr, info)
        raise Hdf5Error(
            f"data layout message version {version} unsupported (v3/v4 only)"
        )

    def _parse_filters(self, off: int) -> list[tuple[int, list[int]]]:
        version = self.buf[off]
        nf = self.buf[off + 1]
        pos = off + (8 if version == 1 else 2)
        out = []
        for _ in range(nf):
            fid = struct.unpack_from("<H", self.buf, pos)[0]
            has_name = version == 1 or fid >= 256
            nlen = struct.unpack_from("<H", self.buf, pos + 2)[0] if has_name else 0
            ncv = struct.unpack_from("<H", self.buf, pos + (6 if has_name else 4))[0]
            pos += 8 if has_name else 6
            if nlen:
                pos += nlen + ((8 - nlen % 8) % 8 if version == 1 else 0)
            cvals = [struct.unpack_from("<I", self.buf, pos + 4 * i)[0] for i in range(ncv)]
            pos += 4 * ncv
            if version == 1 and ncv % 2:
                pos += 4
            out.append((fid, cvals))
        return out

    def _defilter(self, raw: bytes, filters, mask: int = 0) -> bytes:
        # mask is the chunk's per-filter skip bitmask: bit i set means filter i
        # (pipeline order) was skipped at write time and must not be reversed.
        for i, (fid, cvals) in reversed(list(enumerate(filters))):
            if mask & (1 << i):
                continue
            if fid == 1:            # deflate
                raw = zlib.decompress(raw)
            elif fid == 2:          # shuffle
                s = cvals[0] if cvals else 1
                if s > 1 and len(raw) % s == 0:
                    n = len(raw) // s
                    raw = (
                        np.frombuffer(raw, np.uint8).reshape(s, n).T.tobytes()
                    )
            elif fid == 3:          # fletcher32: payload + 4-byte checksum
                raw = raw[:-4]
            elif fid == 32015:      # registered zstd plugin: one frame/chunk
                from ophidia_server_spark.sources import codecs

                try:
                    raw = codecs.zstd_decompress(raw)
                except ValueError as exc:
                    raise Hdf5Error(f"zstd chunk: {exc}") from exc
            elif fid == 32004:      # registered lz4 plugin framing:
                # [u64be orig size][u32be block size] then per block
                # [u32be csize][lz4 raw block]; csize == block size => stored
                from ophidia_server_spark.sources import codecs
                from ophidia_server_spark.sources.lz4blosc import (
                    Lz4Error,
                    lz4_decompress_block,
                )

                if len(raw) < 12:
                    raise Hdf5Error("lz4 chunk shorter than its 12-byte header")
                orig = int.from_bytes(raw[:8], "big")
                bsize = int.from_bytes(raw[8:12], "big") or orig or 1
                pos, parts, left = 12, [], orig
                try:
                    while left > 0:
                        csize = int.from_bytes(raw[pos : pos + 4], "big")
                        pos += 4
                        blk, this = raw[pos : pos + csize], min(bsize, left)
                        pos += csize
                        if csize == this:
                            parts.append(blk)
                        elif codecs.have("lz4_raw"):
                            parts.append(codecs.decompress("lz4_raw", blk, this))
                        else:
                            parts.append(lz4_decompress_block(blk, this))
                        left -= this
                except (Lz4Error, ValueError) as exc:
                    raise Hdf5Error(f"lz4 chunk: {exc}") from exc
                raw = b"".join(parts)
            elif fid == 32001:      # registered blosc plugin: blosc1 frame
                from ophidia_server_spark.sources.lz4blosc import (
                    BloscError,
                    blosc_decompress,
                )

                try:
                    raw = blosc_decompress(raw)
                except BloscError as exc:
                    raise Hdf5Error(f"blosc chunk: {exc}") from exc
            else:
                raise Hdf5Error(
                    f"filter id {fid} unsupported (deflate/shuffle/fletcher32/"
                    "zstd-32015/lz4-32004/blosc-32001 only)"
                )
        return raw

    def _chunk_entries(self, btree_addr: int, ndim: int):
        """Yield (chunk_size, filter_mask, offsets, data_addr) from a v1 chunk B-tree."""
        def walk(addr: int):
            p = self.at(addr)
            if self.buf[p : p + 4] != b"TREE":
                raise Hdf5Error("bad chunk B-tree signature")
            level = self.buf[p + 5]
            used = struct.unpack_from("<H", self.buf, p + 6)[0]
            q = p + 24
            key_len = 8 + 8 * ndim
            for _ in range(used):
                csize, mask = struct.unpack_from("<II", self.buf, q)
                offs = [
                    struct.unpack_from("<Q", self.buf, q + 8 + 8 * i)[0]
                    for i in range(ndim)
                ]
                child = struct.unpack_from("<Q", self.buf, q + key_len)[0]
                if level == 0:
                    yield csize, mask, offs, child
                else:
                    yield from walk(child)
                q += key_len + 8

        yield from walk(btree_addr)

    # -- v4 chunk indexes (libver-latest files) -----------------------------

    def _fixed_array_elements(self, fahd_addr: int):
        """Yield (addr, csize|None, mask) per element of a Fixed Array index
        (spec appendix: FAHD header + FADB data block, optionally paged)."""
        p = self.at(fahd_addr)
        if self.buf[p : p + 4] != b"FAHD":
            raise Hdf5Error("bad fixed-array header signature")
        client = self.buf[p + 5]
        entry_size = self.buf[p + 6]
        page_bits = self.buf[p + 7]
        nelmts = struct.unpack_from("<Q", self.buf, p + 8)[0]
        dblk = struct.unpack_from("<Q", self.buf, p + 16)[0]
        if client not in (0, 1):
            raise Hdf5Error(f"fixed-array client id {client} unknown")
        if dblk == UNDEF:
            return
        q = self.at(dblk)
        if self.buf[q : q + 4] != b"FADB":
            raise Hdf5Error("bad fixed-array data block signature")
        q += 4 + 1 + 1 + 8          # sig, version, client, header address
        per_page = 1 << page_bits
        paged = nelmts > per_page
        if paged:
            npages = (nelmts + per_page - 1) // per_page
            q += (npages + 7) // 8  # page-init bitmap
            q += 4                  # data-block checksum; pages follow
        def element(at: int):
            addr = struct.unpack_from("<Q", self.buf, at)[0]
            if client == 1:
                size_len = entry_size - 12
                csize = int.from_bytes(self.buf[at + 8 : at + 8 + size_len], "little")
                mask = struct.unpack_from("<I", self.buf, at + 8 + size_len)[0]
                return addr, csize, mask
            return addr, None, 0

        if not paged:
            for i in range(nelmts):
                yield element(q + i * entry_size)
            return
        left = nelmts
        while left > 0:
            count = min(per_page, left)
            for i in range(count):
                yield element(q + i * entry_size)
            q += count * entry_size + 4  # page elements + page checksum
            left -= count

    def _ea_elements(self, eahd_addr: int):
        """Yield (addr, csize|None, mask) per element (= linear chunk index)
        of an Extensible Array chunk index, in index order up to the max
        index set (spec appendix: EAHD header, EAIB index block, EASB super
        blocks, EADB data blocks with optional element paging)."""
        p = self.at(eahd_addr)
        if self.buf[p : p + 4] != b"EAHD":
            raise Hdf5Error("bad extensible-array header signature")
        client = self.buf[p + 5]
        if client not in (0, 1):
            raise Hdf5Error(f"extensible-array client id {client} unknown")
        elmt_size = self.buf[p + 6]
        max_nelmts_bits = self.buf[p + 7]
        idx_blk_elmts = self.buf[p + 8]
        data_blk_min_elmts = self.buf[p + 9]
        sup_blk_min_ptrs = self.buf[p + 10]
        page_bits = self.buf[p + 11]
        # six length-sized statistics fields precede the index block address
        max_idx_set = struct.unpack_from("<Q", self.buf, p + 12 + 32)[0]
        iblk_addr = struct.unpack_from("<Q", self.buf, p + 12 + 48)[0]
        if max_idx_set == 0 or iblk_addr == UNDEF:
            return
        arr_off_size = (max_nelmts_bits + 7) // 8
        page_nelmts = 1 << page_bits
        sblk_info = _ea_sblk_info(max_nelmts_bits, data_blk_min_elmts)
        # super blocks whose data blocks hang directly off the index block
        iblk_nsblks = 2 * (sup_blk_min_ptrs.bit_length() - 1)
        ndblk_addrs = 2 * (sup_blk_min_ptrs - 1)
        nsblk_addrs = len(sblk_info) - iblk_nsblks

        q = self.at(iblk_addr)
        if self.buf[q : q + 4] != b"EAIB":
            raise Hdf5Error("bad extensible-array index block signature")
        q += 4 + 1 + 1 + 8      # sig, version, client, header address
        elmts_off = q
        dblk_addr_off = elmts_off + idx_blk_elmts * elmt_size
        sblk_addr_off = dblk_addr_off + ndblk_addrs * 8

        def element(at: int):
            addr = struct.unpack_from("<Q", self.buf, at)[0]
            if client == 1:
                size_len = elmt_size - 12
                csize = int.from_bytes(self.buf[at + 8 : at + 8 + size_len], "little")
                mask = struct.unpack_from("<I", self.buf, at + 8 + size_len)[0]
                return addr, csize, mask
            return addr, None, 0

        sblk_dblk_addrs: dict[int, list[int]] = {}

        def super_block(si: int) -> list[int]:
            """Data-block addresses of super block si (>= iblk_nsblks)."""
            if si in sblk_dblk_addrs:
                return sblk_dblk_addrs[si]
            saddr = struct.unpack_from(
                "<Q", self.buf, sblk_addr_off + (si - iblk_nsblks) * 8
            )[0]
            ndblks, dblk_nelmts, _, _ = sblk_info[si]
            if saddr == UNDEF:
                addrs = [UNDEF] * ndblks
            else:
                r = self.at(saddr)
                if self.buf[r : r + 4] != b"EASB":
                    raise Hdf5Error("bad extensible-array super block signature")
                r += 4 + 1 + 1 + 8 + arr_off_size   # .., header addr, block off
                dblk_npages = (
                    dblk_nelmts // page_nelmts if dblk_nelmts > page_nelmts else 0
                )
                if dblk_npages:
                    r += (ndblks * dblk_npages + 7) // 8    # page-init bitmap
                addrs = [
                    struct.unpack_from("<Q", self.buf, r + 8 * i)[0]
                    for i in range(ndblks)
                ]
            sblk_dblk_addrs[si] = addrs
            return addrs

        dblk_elmts_off: dict[int, int] = {}

        def dblock_element(daddr: int, within: int, dblk_nelmts: int):
            """Element `within` of the data block at daddr (paged or not)."""
            if daddr not in dblk_elmts_off:
                r = self.at(daddr)
                if self.buf[r : r + 4] != b"EADB":
                    raise Hdf5Error("bad extensible-array data block signature")
                r += 4 + 1 + 1 + 8 + arr_off_size
                if dblk_nelmts > page_nelmts:
                    r += 4      # data-block prefix checksum; pages follow
                dblk_elmts_off[daddr] = r
            base = dblk_elmts_off[daddr]
            if dblk_nelmts > page_nelmts:   # paged: +4 checksum per page
                page, off = divmod(within, page_nelmts)
                at = base + page * (page_nelmts * elmt_size + 4) + off * elmt_size
            else:
                at = base + within * elmt_size
            return element(at)

        for idx in range(max_idx_set):
            if idx < idx_blk_elmts:
                yield element(elmts_off + idx * elmt_size)
                continue
            rel = idx - idx_blk_elmts
            si = (rel // data_blk_min_elmts + 1).bit_length() - 1
            ndblks, dblk_nelmts, start_idx, start_dblk = sblk_info[si]
            elmt_idx = rel - start_idx
            dblk_idx, within = divmod(elmt_idx, dblk_nelmts)
            if si < iblk_nsblks:
                daddr = struct.unpack_from(
                    "<Q", self.buf, dblk_addr_off + (start_dblk + dblk_idx) * 8
                )[0]
            else:
                daddr = super_block(si)[dblk_idx]
            if daddr == UNDEF:
                yield UNDEF, None, 0
            else:
                yield dblock_element(daddr, within, dblk_nelmts)

    def _v2btree_raw_records(self, bthd_addr: int):
        """Walk a version-2 B-tree of ANY depth in record order, yielding
        (rtype, raw record bytes) (spec: "Version 2 B-trees"). Internal-node
        child pointers are (address, records-in-child, records-in-subtree),
        whose field widths come from the per-level capacity ladder
        (_b2_node_caps) — the subtree-total field exists only on pointers to
        internal children, so its width varies by level."""
        p = self.at(bthd_addr)
        if self.buf[p : p + 4] != b"BTHD":
            raise Hdf5Error("bad v2 B-tree header signature")
        rtype = self.buf[p + 5]
        node_size = struct.unpack_from("<I", self.buf, p + 6)[0]
        rec_size = struct.unpack_from("<H", self.buf, p + 10)[0]
        depth = struct.unpack_from("<H", self.buf, p + 12)[0]
        root_addr = struct.unpack_from("<Q", self.buf, p + 16)[0]
        root_nrec = struct.unpack_from("<H", self.buf, p + 24)[0]
        if root_addr == UNDEF or root_nrec == 0:
            return
        _, _, cum_size, nrec_width = _b2_node_caps(node_size, rec_size, depth)

        def walk(addr: int, nrec: int, level: int):
            q = self.at(addr)
            sig = self.buf[q : q + 4]
            if level == 0:
                if sig != b"BTLF":
                    raise Hdf5Error("bad v2 B-tree leaf signature")
                q += 6
                for i in range(nrec):
                    yield rtype, self.buf[q + i * rec_size : q + (i + 1) * rec_size]
                return
            if sig != b"BTIN":
                raise Hdf5Error("bad v2 B-tree internal node signature")
            q += 6
            # nrec records interleaved with nrec+1 child pointers; pointers
            # to level-1 children carry a subtree-total field of
            # cum_size[level-1] bytes (zero at the leaf level)
            ptr_extra = nrec_width + cum_size[level - 1]
            child_ptr = q + nrec * rec_size
            children = []
            for i in range(nrec + 1):
                caddr = struct.unpack_from("<Q", self.buf, child_ptr)[0]
                cnrec = int.from_bytes(
                    self.buf[child_ptr + 8 : child_ptr + 8 + nrec_width], "little"
                )
                children.append((caddr, cnrec))
                child_ptr += 8 + ptr_extra
            yield from walk(children[0][0], children[0][1], level - 1)
            for i in range(nrec):
                yield rtype, self.buf[q + i * rec_size : q + (i + 1) * rec_size]
                yield from walk(children[i + 1][0], children[i + 1][1], level - 1)

        yield from walk(root_addr, root_nrec, depth)

    def _v2btree_chunk_entries(self, bthd_addr: int, ndim: int):
        """Yield (addr, csize|None, mask, scaled_offsets) from a version-2
        B-tree chunk index (record type 10 = non-filtered, 11 = filtered;
        spec: Version 2 B-trees + Data Layout v4 index type 5)."""
        p = self.at(bthd_addr)
        rec_size = struct.unpack_from("<H", self.buf, p + 10)[0]
        first = True
        for rtype, rec in self._v2btree_raw_records(bthd_addr):
            if first:
                if rtype not in (10, 11):
                    raise Hdf5Error(
                        f"v2 B-tree record type {rtype} is not a chunk index"
                    )
                first = False
            filtered = rtype == 11
            # filtered records: address(8) + chunk size(var) + mask(4) +
            # scaled offsets(8 per dim); non-filtered: address(8) + offsets
            size_len = rec_size - 8 - 4 - 8 * ndim if filtered else 0
            addr = struct.unpack_from("<Q", rec, 0)[0]
            if filtered:
                csize = int.from_bytes(rec[8 : 8 + size_len], "little")
                mask = struct.unpack_from("<I", rec, 8 + size_len)[0]
                base = 8 + size_len + 4
            else:
                csize, mask, base = None, 0, 8
            offs = [
                struct.unpack_from("<Q", rec, base + 8 * i)[0] for i in range(ndim)
            ]
            yield addr, csize, mask, offs

    def _v4_chunk_entries(self, obj: _Obj, chunk_shape: list[int], elem_size: int):
        """Yield (chunk_size, filter_mask, offsets, data_addr) for a v4
        chunk-index layout, mirroring the v1 B-tree generator."""
        _, cdims, itype, addr, info = obj.layout
        shape = obj.dims
        grid = [
            (s + c - 1) // c if c else 1 for s, c in zip(shape, chunk_shape)
        ] or [1]
        raw_size = int(np.prod(chunk_shape, dtype=np.int64)) * elem_size
        if itype == 1:              # single chunk covers the whole dataset
            if addr == UNDEF:
                return
            csize = info.get("csize", raw_size)
            mask = info.get("mask", 0)
            yield csize, mask, [0] * (len(shape) + 1), addr
            return
        import itertools

        if itype == 2:              # implicit: dense unfiltered chunk array
            if addr == UNDEF:
                return
            for n, idx in enumerate(itertools.product(*[range(g) for g in grid])):
                offs = [i * c for i, c in zip(idx, chunk_shape)] + [0]
                yield raw_size, 0, offs, addr + n * raw_size
            return
        if itype == 3:              # fixed array
            elems = self._fixed_array_elements(addr)
            for idx, (caddr, csize, mask) in zip(
                itertools.product(*[range(g) for g in grid]), elems
            ):
                if caddr == UNDEF:
                    continue        # unallocated chunk: fill
                offs = [i * c for i, c in zip(idx, chunk_shape)] + [0]
                yield (csize if csize is not None else raw_size), mask, offs, caddr
            return
        if itype == 4:              # extensible array (one unlimited dim)
            if addr == UNDEF:
                return
            # element order is the linear chunk index over *swizzled*
            # coordinates: the unlimited dimension varies slowest (H5D
            # swizzles it to the front; with the record dim already first —
            # the netCDF-4 layout — this is plain row-major grid order)
            unlim = [i for i, m in enumerate(obj.maxdims) if m == UNDEF]
            ax = unlim[0] if unlim else 0
            order = [ax] + [i for i in range(len(grid)) if i != ax]
            swiz_grid = [grid[i] for i in order]
            for sidx, (caddr, csize, mask) in zip(
                itertools.product(*[range(g) for g in swiz_grid]),
                self._ea_elements(addr),
            ):
                if caddr == UNDEF:
                    continue
                idx = [0] * len(grid)
                for pos, g in zip(order, sidx):
                    idx[pos] = g
                offs = [i * c for i, c in zip(idx, chunk_shape)] + [0]
                yield (csize if csize is not None else raw_size), mask, offs, caddr
            return
        if itype == 5:              # version-2 B-tree (>1 unlimited dim)
            if addr == UNDEF:
                return
            for caddr, csize, mask, scaled in self._v2btree_chunk_entries(
                addr, len(chunk_shape)
            ):
                if caddr == UNDEF:
                    continue
                offs = [s * c for s, c in zip(scaled, chunk_shape)] + [0]
                yield (csize if csize is not None else raw_size), mask, offs, caddr
            return
        raise Hdf5Error(f"v4 chunk index type {itype} unsupported")

    def read_data(self, obj: _Obj, axis_keep: list | None = None) -> np.ndarray:
        """Materialize a dataset. `axis_keep` (optional) holds one entry per
        axis — None (keep all) or a sorted np.ndarray of kept indices. On
        chunked layout, chunks whose index range misses every kept index are
        never decompressed (import-time hyperslab pruning)."""
        dt = obj.dtype
        if dt is None or dt.np_dtype is None:
            raise Hdf5Error(f"dataset {obj.name!r} has an unsupported datatype")
        shape = tuple(obj.dims)
        kind = obj.layout[0] if obj.layout else None

        def sliced(arr: np.ndarray) -> np.ndarray:
            if axis_keep:
                for ax, k in enumerate(axis_keep):
                    if k is not None:
                        arr = np.take(arr, k, axis=ax)
            return arr

        if kind == "compact":
            raw = obj.layout[1]
            return sliced(
                np.frombuffer(raw, dt.np_dtype)[
                    : int(np.prod(shape, dtype=np.int64))
                ].reshape(shape)
            )
        if kind == "contiguous":
            addr, size = obj.layout[1], obj.layout[2]
            if addr == UNDEF:       # never allocated: all fill (zeros)
                return sliced(np.zeros(shape, dt.np_dtype))
            raw = self.buf[self.at(addr) : self.at(addr) + size]
            return sliced(
                np.frombuffer(raw, dt.np_dtype)[
                    : int(np.prod(shape, dtype=np.int64))
                ].reshape(shape)
            )
        if kind in ("chunked", "chunked4"):
            if kind == "chunked":
                btree, cdims = obj.layout[1], obj.layout[2]
                chunk_shape = cdims[:-1]    # last entry is the element size
                entries = (
                    self._chunk_entries(btree, len(cdims))
                    if btree != UNDEF else ()
                )
            else:
                cdims = obj.layout[1]
                # v4 dims normally exclude the element-size entry v3 appends;
                # reconcile against the dataset rank to accept either form
                chunk_shape = cdims[:-1] if len(cdims) == len(shape) + 1 else cdims
                entries = self._v4_chunk_entries(obj, list(chunk_shape), dt.size)
            out = np.zeros(shape, dt.np_dtype)
            for csize, mask, offs, caddr in entries:
                if axis_keep and any(
                    k is not None
                    and not ((k >= o) & (k < min(o + c, s))).any()
                    for k, o, c, s in zip(axis_keep, offs, chunk_shape, shape)
                ):
                    continue    # pruned: this chunk never inflates
                raw = self.buf[self.at(caddr) : self.at(caddr) + csize]
                if obj.filters:
                    raw = self._defilter(raw, obj.filters, mask)
                chunk = np.frombuffer(raw, dt.np_dtype)[
                    : int(np.prod(chunk_shape, dtype=np.int64))
                ].reshape(chunk_shape)
                sel = tuple(
                    slice(o, min(o + c, s))
                    for o, c, s in zip(offs[:-1], chunk_shape, shape)
                )
                csel = tuple(slice(0, s.stop - s.start) for s in sel)
                out[sel] = chunk[csel]
            return sliced(out)
        raise Hdf5Error(f"dataset {obj.name!r} has no data layout")

    # -- attribute values ---------------------------------------------------

    def _global_heap_object(self, addr: int, index: int) -> bytes:
        p = self.at(addr)
        if self.buf[p : p + 4] != b"GCOL":
            raise Hdf5Error("bad global heap signature")
        size = struct.unpack_from("<Q", self.buf, p + 8)[0]
        q, end = p + 16, p + size
        while q + 16 <= end:
            idx, refc = struct.unpack_from("<HH", self.buf, q)
            osize = struct.unpack_from("<Q", self.buf, q + 8)[0]
            if idx == index:
                return self.buf[q + 16 : q + 16 + osize]
            if idx == 0:
                break
            q += 16 + osize + ((8 - osize % 8) % 8)
        raise Hdf5Error(f"global heap object {index} not found")

    def _decode_values(self, dt: DType, raw: bytes, count: int):
        if dt.cls in (0, 1):
            arr = np.frombuffer(raw, dt.np_dtype, count=count)
            return arr
        if dt.cls == 3:
            vals = [
                raw[i * dt.size : (i + 1) * dt.size].split(b"\x00")[0].decode(
                    "utf-8", errors="replace"
                )
                for i in range(count)
            ]
            return vals
        if dt.cls == 6:
            return np.frombuffer(raw, dt.np_dtype, count=count)
        if dt.cls == 7:
            return list(np.frombuffer(raw, "<u8", count=count))
        if dt.cls == 9:
            out = []
            for i in range(count):
                n, haddr, hidx = struct.unpack_from("<IQI", raw, i * 16)
                blob = self._global_heap_object(haddr, hidx)
                if dt.is_vlen_string:
                    out.append(blob[:n].decode("utf-8", errors="replace"))
                else:
                    out.append(self._decode_values(dt.vlen_base, blob, n))
            return out
        raise Hdf5Error(f"attribute datatype class {dt.cls} unsupported")

    # -- dense attribute storage (fractal heap + name-index v2 B-tree) ------

    def _fractal_heap_reader(self, frhp_addr: int):
        """Parse an FRHP header; returns (id -> absolute offset) resolver for
        managed heap IDs. Supports a root direct block or a root indirect
        block whose children are all direct blocks — the shapes attribute
        heaps of real files take (libhdf5 default: 4096-byte starting
        blocks, attributes are tiny)."""
        p = self.at(frhp_addr)
        if self.buf[p : p + 4] != b"FRHP":
            raise Hdf5Error("bad fractal heap signature")
        heap_id_len = struct.unpack_from("<H", self.buf, p + 5)[0]
        io_filter_len = struct.unpack_from("<H", self.buf, p + 7)[0]
        if io_filter_len:
            raise Hdf5Error("filtered fractal heaps are unsupported")
        # fixed-width tail of the header (spec: Fractal Heap Header)
        q = p + 10 + 4 + 8 * 12
        table_width = struct.unpack_from("<H", self.buf, q)[0]
        start_block = struct.unpack_from("<Q", self.buf, q + 2)[0]
        max_direct = struct.unpack_from("<Q", self.buf, q + 10)[0]
        max_heap_bits = struct.unpack_from("<H", self.buf, q + 18)[0]
        # q+20: starting rows (2); root block address and current rows follow
        root_addr = struct.unpack_from("<Q", self.buf, q + 22)[0]
        cur_rows = struct.unpack_from("<H", self.buf, q + 30)[0]
        off_size = (max_heap_bits + 7) // 8
        len_size = heap_id_len - 1 - off_size

        # map heap-space offset ranges -> direct block base addresses (heap
        # offsets address the block space INCLUDING block headers)
        blocks: list[tuple[int, int, int]] = []  # (heap_off, size, file_addr)
        if cur_rows == 0:
            blocks.append((0, start_block, root_addr))
        else:
            ip = self.at(root_addr)
            if self.buf[ip : ip + 4] != b"FHIB":
                raise Hdf5Error("bad fractal heap indirect block signature")
            ip += 4 + 1 + 8 + off_size  # sig, version, heap addr, block off
            import math

            max_direct_rows = (
                int(math.log2(max_direct)) - int(math.log2(start_block)) + 2
            )
            heap_off = 0
            for row in range(cur_rows):
                if row >= max_direct_rows:
                    raise Hdf5Error(
                        "nested indirect fractal heap blocks are unsupported"
                    )
                size = start_block * (1 << max(0, row - 1))
                for _ in range(table_width):
                    daddr = struct.unpack_from("<Q", self.buf, ip)[0]
                    ip += 8
                    if daddr != UNDEF:
                        blocks.append((heap_off, size, daddr))
                    heap_off += size

        def locate(heap_id: bytes) -> tuple[int, int]:
            vt = heap_id[0]
            if (vt >> 4) & 0x3 != 0:
                raise Hdf5Error("huge/tiny fractal heap objects unsupported")
            off = int.from_bytes(heap_id[1 : 1 + off_size], "little")
            length = int.from_bytes(
                heap_id[1 + off_size : 1 + off_size + len_size], "little"
            )
            for ho, size, faddr in blocks:
                if ho <= off < ho + size:
                    return self.at(faddr) + (off - ho), length
            raise Hdf5Error("fractal heap id outside any direct block")

        return locate

    def _v2_btree_records(self, bthd_addr: int):
        """Yield raw records from a v2 B-tree at any depth (shared walker —
        dense attribute name indexes use the same node format as chunk
        indexes, only the record type differs)."""
        for _rtype, rec in self._v2btree_raw_records(bthd_addr):
            yield rec

    def _dense_attributes(self, fheap_addr: int, name_bt_addr: int):
        """Yield (name, value) for densely-stored attributes: walk the name-
        index v2 B-tree (record type 8: 8-byte heap ID first) and parse each
        attribute message out of the fractal heap."""
        locate = self._fractal_heap_reader(fheap_addr)
        for rec in self._v2_btree_records(name_bt_addr):
            abs_off, _length = locate(rec[:8])
            yield self._parse_attribute(abs_off)

    def _parse_attribute(self, off: int):
        version = self.buf[off]
        if version not in (1, 2, 3):
            raise Hdf5Error(f"attribute message version {version} unsupported")
        nsize, dtsize, dssize = struct.unpack_from("<HHH", self.buf, off + 2)
        pos = off + 8 + (1 if version == 3 else 0)

        def padded(n: int) -> int:
            return n + ((8 - n % 8) % 8) if version == 1 else n

        name = self.buf[pos : pos + nsize].split(b"\x00")[0].decode("utf-8")
        pos += padded(nsize)
        try:
            dt, _ = _parse_datatype(self.buf, pos)
        except Hdf5Error:
            return name, None       # e.g. compound REFERENCE_LIST: skipped
        pos += padded(dtsize)
        dims, _ = _parse_dataspace(self.buf, pos)
        pos += padded(dssize)
        count = int(np.prod(dims, dtype=np.int64)) if dims else 1
        vals = self._decode_values(dt, self.buf[pos:], count)
        if dt.cls in (0, 1):
            lst = np.asarray(vals).tolist()
            return name, lst if dims else lst[0]
        if not dims:
            return name, (vals[0] if isinstance(vals, list) and vals else None)
        return name, vals


def read(
    path: str, variables: set[str] | None = None,
    subset: dict | None = None, subset_type: str = "coord",
    mask_fn=None,
) -> Dataset:
    """Read a netCDF-4 (HDF5) file into the same Dataset model netcdf3 uses.

    `variables` limits which DATA variables are materialized (dimension
    scales always decode — they're the tiny coordinate arrays): a CMIP file
    carries many measures per container, and skipping the others skips
    their entire chunk-decompression cost, not just the rows.

    `subset` maps dim name -> subset spec, evaluated by `mask_fn(coords,
    spec, subset_type)` over each dim's coordinate array (io_ops passes its
    hyperslab parser). The keep-indices prune at CHUNK level: a chunk whose
    index range misses the selection is never decompressed, and scales/
    variables come back already sliced — the import-time hyperslab for
    chunked containers."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _H5Reader(buf)
    root = r.read_object(r.root_addr, "/")
    if not root.is_group:
        raise Hdf5Error("root object is not a group")

    # first pass: address -> name map (to resolve DIMENSION_LIST references)
    addr_name: dict[int, str] = {}
    datasets: list[_Obj] = []

    def collect(g: _Obj, prefix: str):
        for c in g.children:
            c.name = c.name if not prefix else f"{prefix}/{c.name}"
            addr_name[c.addr] = c.name
            if c.is_group:
                collect(c, c.name)
            else:
                datasets.append(c)

    collect(root, "")

    ds = Dataset()
    ds.attributes = {
        k: v for k, v in root.attrs.items() if k not in _HIDDEN_ATTRS and v is not None
    }

    # dimension scales define the dims; phony scales carry no variable
    scales = {}
    dim_cur_size: dict[str, int] = {}
    for o in datasets:
        cls = o.attrs.get("CLASS")
        if cls == "DIMENSION_SCALE":
            size = o.dims[0] if o.dims else 0
            unlimited = bool(o.maxdims) and o.maxdims[0] == UNDEF
            # mirror netcdf3.read: unlimited (record) dims surface as None,
            # the actual record count rides on each variable's shape
            ds.dimensions[o.name] = None if unlimited else size
            dim_cur_size[o.name] = size  # current extent even when unlimited
            scales[o.addr] = o.name
            nm = o.attrs.get("NAME")
            phony = isinstance(nm, str) and nm.startswith(
                "This is a netCDF dimension but not a netCDF variable"
            )
            if not phony:
                ds.variables[o.name] = Variable(
                    name=o.name,
                    dimensions=(o.name,),
                    attributes={
                        k: v for k, v in o.attrs.items()
                        if k not in _HIDDEN_ATTRS and v is not None
                    },
                    data=r.read_data(o),
                )

    # per-dim keep indices from the subset (needs the decoded coordinates);
    # coordinate variables and dimension sizes come back already sliced
    keep: dict[str, "np.ndarray"] = {}
    if subset:
        for d, spec in subset.items():
            cv = ds.variables.get(d)
            # no-coordinate fallback: index positions; unlimited (record) dims
            # store None in ds.dimensions, so resolve their current extent from
            # the dimension-scale dataset itself rather than dropping all rows
            fallback_n = ds.dimensions.get(d) or dim_cur_size.get(d) or 0
            coord = (
                np.asarray(cv.data, "float64")
                if cv is not None
                else np.arange(fallback_n, dtype="float64")
            )
            keep[d] = np.flatnonzero(mask_fn(coord, spec, subset_type))
            if d in ds.dimensions and ds.dimensions[d] is not None:
                ds.dimensions[d] = int(len(keep[d]))
            if cv is not None:
                cv.data = np.take(cv.data, keep[d])

    for o in datasets:
        if o.attrs.get("CLASS") == "DIMENSION_SCALE":
            continue
        if variables is not None and o.name not in variables:
            continue  # skip the decode entirely (chunked: zero inflation)
        dim_list = o.attrs.get("DIMENSION_LIST")
        if dim_list is not None:
            dims = []
            for refs in dim_list:
                ref = refs[0] if isinstance(refs, (list, tuple)) and refs else refs
                dims.append(scales.get(int(ref), addr_name.get(int(ref), "?")))
            dims = tuple(dims)
        else:
            # plain HDF5 dataset without netCDF dims: synthesize phony dims
            dims = tuple(f"phony_dim_{i}" for i in range(len(o.dims)))
            for nm, sz in zip(dims, o.dims):
                ds.dimensions.setdefault(nm, sz)
        axis_keep = [keep.get(d) for d in dims] if keep else None
        ds.variables[o.name] = Variable(
            name=o.name,
            dimensions=dims,
            attributes={
                k: v for k, v in o.attrs.items()
                if k not in _HIDDEN_ATTRS and v is not None
            },
            data=r.read_data(o, axis_keep),
        )
    return ds


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _dt_message(arr: np.ndarray) -> bytes:
    """Datatype message bytes for a numpy array (little-endian on disk)."""
    dt = arr.dtype
    if dt.kind in ("i", "u"):
        size = dt.itemsize
        bits = 0x08 if dt.kind == "i" else 0x00
        return struct.pack(
            "<B3BI", 0x10, bits, 0, 0, size
        ) + struct.pack("<HH", 0, size * 8)
    if dt.kind == "f":
        size = dt.itemsize
        if size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
            sign = 31
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
            sign = 63
        return struct.pack("<B3BI", 0x11, 0x20, sign, 0, size) + props
    if dt.kind == "S":
        return struct.pack("<B3BI", 0x13, 0, 0, 0, dt.itemsize)
    raise Hdf5Error(f"unsupported dtype for netCDF-4 write: {dt}")


def _str_dt_message(n: int) -> bytes:
    return struct.pack("<B3BI", 0x13, 0, 0, 0, max(n, 1))


_REF_DT = struct.pack("<B3BI", 0x17, 0, 0, 0, 8)
_VLEN_REF_DT = struct.pack("<B3BI", 0x19, 0, 0, 0, 16) + _REF_DT


def _ds_message(shape: tuple[int, ...], maxshape: tuple | None = None) -> bytes:
    """Dataspace v1; `maxshape` entries of None encode H5S_UNLIMITED."""
    rank = len(shape)
    flags = 1 if maxshape is not None else 0
    out = struct.pack("<BBBB4x", 1, rank, flags, 0)
    for s in shape:
        out += struct.pack("<Q", s)
    if maxshape is not None:
        for m in maxshape:
            out += struct.pack("<Q", UNDEF if m is None else m)
    return out


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _attr_message(name: str, dt_msg: bytes, shape: tuple[int, ...], payload: bytes) -> bytes:
    nm = name.encode("utf-8") + b"\x00"
    ds_msg = _ds_message(shape) if shape else struct.pack("<BBBB4x", 1, 0, 0, 0)
    head = struct.pack("<BxHHH", 1, len(nm), len(dt_msg), len(ds_msg))
    return head + _pad8(nm) + _pad8(dt_msg) + _pad8(ds_msg) + payload


def _encode_attr(name: str, val) -> bytes:
    if isinstance(val, str):
        raw = val.encode("utf-8")
        return _attr_message(name, _str_dt_message(len(raw)), (), raw)
    if isinstance(val, (bytes, np.bytes_)):
        return _attr_message(name, _str_dt_message(len(val)), (), bytes(val))
    arr = np.asarray(val)
    if arr.dtype == np.int64 and arr.ndim == 0:
        arr = arr.astype("<i4") if -(2**31) <= int(arr) < 2**31 else arr
    arr = arr.astype(arr.dtype.newbyteorder("<"))
    shape = arr.shape if arr.ndim else ()
    return _attr_message(name, _dt_message(arr), shape, arr.tobytes())


class _Alloc:
    """Sequential file-space allocator (8-byte aligned)."""

    def __init__(self, start: int):
        self.pos = start
        self.blocks: list[tuple[int, bytes]] = []

    def put(self, data: bytes, align: int = 8) -> int:
        self.pos += (align - self.pos % align) % align
        addr = self.pos
        self.blocks.append((addr, data))
        self.pos += len(data)
        return addr


def _object_header_v1(messages: list[bytes]) -> bytes:
    body = b""
    for m in messages:
        # message header: type inferred — caller prepends it; here `m` is the
        # full (type, size, flags, data) encoding already
        body += m
    head = struct.pack("<BxHII4x", 1, len(messages), 1, len(body))
    return head + body


def _msg(mtype: int, data: bytes) -> bytes:
    data = _pad8(data)
    return struct.pack("<HHB3x", mtype, len(data), 0) + data


def _filter_pipeline_msg(itemsize: int, compress) -> bytes:
    """Filter-pipeline v1 message: shuffle + (deflate | registered zstd)."""
    filt = struct.pack("<BB6x", 1, 2)
    filt += struct.pack("<HHHH", 2, 0, 1, 1) + struct.pack("<I", itemsize) + b"\x00" * 4
    if compress == "zstd":
        # registered filter 32015; v1 entries with an id >= 256 carry an
        # 8-byte-padded name, one client value (level)
        filt += (
            struct.pack("<HHHH", 32015, 8, 1, 1)
            + b"zstd\x00\x00\x00\x00"
            + struct.pack("<I", 3) + b"\x00" * 4
        )
    else:
        filt += struct.pack("<HHHH", 1, 0, 1, 1) + struct.pack("<I", compress) + b"\x00" * 4
    return filt


_EA_DEFAULTS = dict(max_bits=32, index_elmts=4, min_pointers=4,
                    min_elmts=16, page_bits=10)


def _write_earray_index(alloc: "_Alloc", chunks, filtered: bool,
                        params: dict | None = None) -> int:
    """Emit an Extensible Array chunk index for `chunks` (a list of
    (addr, csize, mask) in linear chunk order) and return the EAHD address.
    Parameters default to libhdf5's dataset-chunk values
    (H5D_EARRAY_* creation constants); spec: appendix "Extensible Array"."""
    prm = {**_EA_DEFAULTS, **(params or {})}
    max_bits, idx_blk = prm["max_bits"], prm["index_elmts"]
    min_elmts, min_ptrs = prm["min_elmts"], prm["min_pointers"]
    page_bits = prm["page_bits"]
    client = 1 if filtered else 0
    size_len = 4
    elmt_size = 8 + size_len + 4 if filtered else 8
    arr_off = (max_bits + 7) // 8
    page_nelmts = 1 << page_bits
    sblk_info = _ea_sblk_info(max_bits, min_elmts)
    iblk_nsblks = 2 * (min_ptrs.bit_length() - 1)
    ndblk_addrs = 2 * (min_ptrs - 1)
    nsblk_addrs = len(sblk_info) - iblk_nsblks
    n = len(chunks)

    def elem(i: int) -> bytes:
        if i < n:
            addr, csize, mask = chunks[i]
        else:
            addr, csize, mask = UNDEF, 0, 0
        out = struct.pack("<Q", addr)
        if filtered:
            out += int(csize or 0).to_bytes(size_len, "little")
            out += struct.pack("<I", mask)
        return out

    def with_cksum(body: bytes) -> bytes:
        return body + struct.pack("<I", _lookup3(body))

    # header first (children embed its address): reserve, patch at the end
    hdr_size = 12 + 6 * 8 + 8 + 4
    hdr_addr = alloc.put(b"\x00" * hdr_size)
    hdr_slot = len(alloc.blocks) - 1

    def dblock(first: int, nelmts: int) -> int:
        """Write one data block covering elements [first, first+nelmts)."""
        head = b"EADB" + struct.pack("<BB", 0, client)
        head += struct.pack("<Q", hdr_addr)
        head += first.to_bytes(arr_off, "little")
        if nelmts > page_nelmts:        # paged: prefix cksum, then pages
            body = with_cksum(head)
            for pg in range(0, nelmts, page_nelmts):
                page = b"".join(elem(first + pg + i) for i in range(page_nelmts))
                body += with_cksum(page)
            return alloc.put(body)
        body = head + b"".join(elem(first + i) for i in range(nelmts))
        return alloc.put(with_cksum(body))

    # data blocks reachable straight from the index block
    direct_dblks: list[int] = []
    covered = idx_blk
    for si in range(iblk_nsblks):
        ndblks, dblk_nelmts, start_idx, _ = sblk_info[si]
        for d in range(ndblks):
            first = idx_blk + start_idx + d * dblk_nelmts
            if first < n:
                direct_dblks.append(dblock(first, dblk_nelmts))
            else:
                direct_dblks.append(UNDEF)
            covered = max(covered, first + dblk_nelmts)
    # super blocks for the rest
    sblk_addrs: list[int] = []
    n_sblks = n_dblks = 0
    for si in range(iblk_nsblks, len(sblk_info)):
        ndblks, dblk_nelmts, start_idx, _ = sblk_info[si]
        first_elmt = idx_blk + start_idx
        if first_elmt >= n:
            sblk_addrs.append(UNDEF)
            continue
        daddrs = []
        for d in range(ndblks):
            first = first_elmt + d * dblk_nelmts
            if first < n:
                daddrs.append(dblock(first, dblk_nelmts))
                n_dblks += 1
            else:
                daddrs.append(UNDEF)
        body = b"EASB" + struct.pack("<BB", 0, client)
        body += struct.pack("<Q", hdr_addr)
        body += first_elmt.to_bytes(arr_off, "little")
        dblk_npages = dblk_nelmts // page_nelmts if dblk_nelmts > page_nelmts else 0
        if dblk_npages:             # page-init bitmap: mark all pages present
            body += b"\xff" * ((ndblks * dblk_npages + 7) // 8)
        body += b"".join(struct.pack("<Q", a) for a in daddrs)
        sblk_addrs.append(alloc.put(with_cksum(body)))
        n_sblks += 1

    # index block
    body = b"EAIB" + struct.pack("<BB", 0, client)
    body += struct.pack("<Q", hdr_addr)
    body += b"".join(elem(i) for i in range(idx_blk))
    body += b"".join(struct.pack("<Q", a) for a in direct_dblks[:ndblk_addrs])
    body += b"".join(
        struct.pack("<Q", sblk_addrs[i] if i < len(sblk_addrs) else UNDEF)
        for i in range(nsblk_addrs)
    )
    iblk_addr = alloc.put(with_cksum(body))

    n_direct = sum(1 for a in direct_dblks if a != UNDEF)
    hdr = b"EAHD" + struct.pack(
        "<8B", 0, client, elmt_size, max_bits, idx_blk, min_elmts,
        min_ptrs, page_bits,
    )
    hdr += struct.pack(
        "<6Q", n_sblks, 0, n_direct + n_dblks, 0, n, n,
    )
    hdr += struct.pack("<Q", iblk_addr)
    alloc.blocks[hdr_slot] = (hdr_addr, with_cksum(hdr))
    return hdr_addr


def _b2_node_caps(node_size: int, rec_size: int, depth: int):
    """Per-level capacity ladder for a version-2 B-tree (spec: "Version 2
    B-trees"; mirrors the library's node_info init). Node prefix is 10 bytes
    (sig 4 + version 1 + type 1 + checksum 4); a child pointer at level l is
    address(8) + records-in-child(nrec_width) + records-in-subtree
    (cum_size[l-1], 0 for leaf children). Returns (max_nrec, cum_max,
    cum_size, nrec_width), each list indexed by level 0..depth:
      max_nrec[l]  — record capacity of one node at level l
      cum_max[l]   — record capacity of a whole subtree rooted at level l
      cum_size[l]  — byte width of the subtree-total field on a pointer TO a
                     level-l child
    nrec_width (bytes for records-in-child) is bounded by the leaf capacity,
    which dominates every node's record count."""

    def enc(v: int) -> int:
        return max(1, (int(v).bit_length() + 7) // 8)

    max_nrec = [(node_size - 10) // rec_size]
    cum_max = [max_nrec[0]]
    cum_size = [0]
    nrec_width = enc(max_nrec[0])
    for lvl in range(1, depth + 1):
        ptr = 8 + nrec_width + cum_size[lvl - 1]
        cap = (node_size - 10 - ptr) // (rec_size + ptr)
        if cap < 1:
            raise Hdf5Error(
                f"v2 B-tree node size {node_size} too small for internal "
                f"nodes at depth {lvl} (record size {rec_size})"
            )
        max_nrec.append(cap)
        cum = (cap + 1) * cum_max[lvl - 1] + cap
        cum_max.append(cum)
        cum_size.append(enc(cum))
    return max_nrec, cum_max, cum_size, nrec_width


def _write_btree2_index(alloc: "_Alloc", records, ndim: int,
                        filtered: bool, node_size: int = 2048) -> int:
    """Emit a version-2 B-tree chunk index for `records` ((addr, csize,
    mask, scaled_offsets), pre-sorted by offsets) and return the BTHD
    address. Record type 10/11 per the Data Layout v4 spec. Builds however
    many levels the record count needs: leaves first, then internal nodes
    whose records separate their children (BTIN child pointers carry the
    child's own record count and, above depth 1, the subtree total)."""
    size_len = 4
    rec_size = 8 + (size_len + 4 if filtered else 0) + 8 * ndim
    rtype = 11 if filtered else 10

    def encode(rec) -> bytes:
        addr, csize, mask, scaled = rec
        out = struct.pack("<Q", addr)
        if filtered:
            out += int(csize or 0).to_bytes(size_len, "little")
            out += struct.pack("<I", mask)
        return out + b"".join(struct.pack("<Q", s) for s in scaled)

    # smallest depth whose subtree capacity fits the record count
    depth = 0
    while _b2_node_caps(node_size, rec_size, depth)[1][depth] < len(records):
        depth += 1
    max_nrec, cum_max, cum_size, nrec_width = _b2_node_caps(
        node_size, rec_size, depth
    )
    # minimum records a full-depth subtree rooted at each level can carry
    # while keeping every internal node >= 1 record (2 children + 1
    # separator): libhdf5's insertion builder never emits an under-filled
    # internal node, and external readers may reject one
    min_sub = [1]
    for _ in range(depth):
        min_sub.append(2 * min_sub[-1] + 1)

    def build(recs: list, level: int) -> tuple[int, int, int]:
        """Write the subtree for `recs` at `level`; returns (node address,
        records in the node itself, records in the whole subtree)."""
        if level == 0:
            if len(recs) > max_nrec[0]:
                raise Hdf5Error("v2 B-tree leaf overflow (builder bug)")
            body = b"BTLF" + struct.pack("<BB", 0, rtype)
            for r in recs:
                body += encode(r)
            return (
                alloc.put(body + struct.pack("<I", _lookup3(body))),
                len(recs),
                len(recs),
            )
        # split into m >= 2 child subtrees + (m-1) separator records: the
        # smallest m whose even split fits a level-1 subtree, bounded by
        # this node's fan-out. Every leaf must sit at the header's depth,
        # so each child subtree must also receive at least min_sub[level-1]
        # records — the parent's own distribution guarantees enough records
        # are available (len(recs) >= min_sub[level]) for every node size
        # that holds >= 2 leaf records.
        child_cap = cum_max[level - 1]
        need = min_sub[level - 1]
        m = 2 if len(recs) >= 3 else 1
        while (
            m <= max_nrec[level]
            and -(-(len(recs) - (m - 1)) // m) > child_cap
        ):
            m += 1
        if -(-(len(recs) - (m - 1)) // m) > child_cap:
            raise Hdf5Error("v2 B-tree capacity mismatch (builder bug)")
        n_child = len(recs) - (m - 1)
        base, extra = divmod(n_child, m)
        shares = [base + (1 if i < extra else 0) for i in range(m)]
        if n_child >= m * need:
            # borrow from the fullest siblings so no child drops below the
            # minimum a full-depth subtree needs — keeps every descendant
            # BTIN at >= 1 record, matching what libhdf5's insertion
            # builder produces (external readers may reject empty BTINs)
            for i in range(m):
                while shares[i] < need:
                    j = max(range(m), key=lambda x: shares[x])
                    shares[j] -= 1
                    shares[i] += 1
        # else: degenerate capacity (node size holds < 2 leaf records, a
        # stress-test-only configuration) — keep the even split; chains of
        # under-filled nodes are unavoidable at that node size
        children, seps = [], []
        pos = 0
        for i in range(m):
            take = shares[i]
            children.append(build(recs[pos : pos + take], level - 1))
            pos += take
            if i < m - 1:
                seps.append(recs[pos])
                pos += 1
        body = b"BTIN" + struct.pack("<BB", 0, rtype)
        for r in seps:
            body += encode(r)
        for caddr, cnrec, ctotal in children:
            body += struct.pack("<Q", caddr)
            body += cnrec.to_bytes(nrec_width, "little")
            if cum_size[level - 1]:
                body += ctotal.to_bytes(cum_size[level - 1], "little")
        return (
            alloc.put(body + struct.pack("<I", _lookup3(body))),
            len(seps),
            len(recs),
        )

    root_addr, root_nrec, total = build(list(records), depth)
    hdr = b"BTHD" + struct.pack("<BB", 0, rtype)
    hdr += struct.pack("<I", node_size)
    hdr += struct.pack("<HH", rec_size, depth)  # record size, depth
    hdr += struct.pack("<BB", 100, 40)          # split / merge percent
    hdr += struct.pack("<QHQ", root_addr, root_nrec, total)
    return alloc.put(hdr + struct.pack("<I", _lookup3(hdr)))


def write(path: str, ds: Dataset, compress: int | str | None = None,
          chunk_rows: int | None = None, index: str | None = None,
          ea_params: dict | None = None, b2_node_size: int = 2048) -> None:
    """Write `ds` as a netCDF-4 (HDF5) file: superblock v0, symbol-table root
    group, one dimension-scale dataset per dimension, data variables with
    DIMENSION_LIST references. `compress` switches data layout to
    single-dimension chunking with shuffle + deflate (a zlib level) or
    shuffle + the registered zstd filter 32015 (`compress="zstd"`);
    `chunk_rows` bounds the first-dimension chunk length.

    `index` selects the chunk-index family for extendable (unlimited-dim)
    datasets: None keeps the v1 B-tree; "earray" emits a Data Layout v4
    message with an Extensible Array index (the libver-latest layout of
    appended record variables; `ea_params` overrides the creation
    constants); "btree2" emits a version-2 B-tree index whose depth follows
    the chunk count (`b2_node_size` sets the tree's node size — smaller
    nodes force deeper trees, the same knob as the library's creation
    parameter)."""
    alloc = _Alloc(96)      # superblock v0 with 8/8 sizes is 96 bytes

    dim_names = list(ds.dimensions)
    dim_sizes = {
        n: (sz if sz is not None else _record_count(ds, n)) for n, sz in ds.dimensions.items()
    }
    unlimited = {n for n, sz in ds.dimensions.items() if sz is None}

    def _var_dims(nm: str) -> tuple[str, ...]:
        v = ds.variables.get(nm)
        if v is not None and nm not in ds.dimensions:
            return tuple(v.dimensions)
        return (nm,) if nm in ds.dimensions else ()

    def _is_extendable(nm: str) -> bool:
        dims = _var_dims(nm)
        return any(d in unlimited for d in dims)

    # ---- plan objects: every dim is a scale dataset; vars reference them
    names: list[str] = []
    for n in dim_names:
        names.append(n)
    for v in ds.variables:
        if v not in ds.dimensions:
            names.append(v)
    names.sort()

    # reserve object-header addresses AFTER building payloads; build payloads
    # first into closures, then lay out: heap data, data payloads, headers.
    ghp_entries: list[bytes] = []       # global heap objects (vlen refs)

    def ghp_ref(payload: bytes) -> tuple[int, int]:
        ghp_entries.append(payload)
        return len(ghp_entries)         # index (addr patched later)

    # data payloads first (address known before headers need them)
    data_addr: dict[str, tuple] = {}
    for nm in names:
        var = ds.variables.get(nm)
        if var is None:     # phony dimension: zero-length f4 scale
            arr = np.zeros(dim_sizes[nm], "<f4")
        else:
            arr = np.ascontiguousarray(var.data)
            if arr.dtype == np.int64:
                arr = arr.astype("<i8")
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        # unlimited-dim (extendable) datasets REQUIRE chunked layout per the
        # spec, with or without compression
        chunked = arr.ndim >= 1 and arr.size and (compress is not None or _is_extendable(nm))
        if chunked:
            cshape = list(arr.shape)
            cshape[0] = max(1, min(cshape[0], chunk_rows or cshape[0]))
            chunks = []
            for start in range(0, arr.shape[0], cshape[0]):
                piece = np.zeros(cshape, arr.dtype)
                src = arr[start : start + cshape[0]]
                piece[: src.shape[0]] = src
                raw = piece.tobytes()
                if compress is not None:
                    s = arr.itemsize
                    if s > 1:       # shuffle
                        n = len(raw) // s
                        raw = np.frombuffer(raw, np.uint8).reshape(n, s).T.tobytes()
                    if compress == "zstd":
                        from ophidia_server_spark.sources import codecs

                        raw = codecs.zstd_compress(raw, 3)
                    else:
                        raw = zlib.compress(raw, compress)
                caddr = alloc.put(raw)
                chunks.append((caddr, len(raw), [start] + [0] * (arr.ndim - 1)))
            data_addr[nm] = ("chunked", arr, cshape, chunks)
        else:
            addr = alloc.put(arr.tobytes() or b"\x00" * 0, align=8)
            data_addr[nm] = ("contiguous", arr, addr)

    # chunk indexes: one per chunked dataset. Extendable datasets take the
    # requested v4 index family; everything else keeps the v1 B-tree.
    btree_addr: dict[str, int] = {}
    v4_index: dict[str, tuple[str, int]] = {}   # name -> (kind, index addr)
    for nm, rec in data_addr.items():
        if rec[0] != "chunked":
            continue
        _, arr, cshape, chunks = rec
        if index in ("earray", "btree2") and _is_extendable(nm):
            filtered = compress is not None
            if index == "earray":
                elems = [(caddr, csize, 0) for caddr, csize, _ in chunks]
                v4_index[nm] = ("earray", _write_earray_index(
                    alloc, elems, filtered, ea_params))
            else:
                recs = [
                    (caddr, csize, 0,
                     [o // c for o, c in zip(offs, cshape)])
                    for caddr, csize, offs in chunks
                ]
                v4_index[nm] = ("btree2", _write_btree2_index(
                    alloc, recs, arr.ndim, filtered, node_size=b2_node_size))
            continue
        node = b"TREE" + struct.pack("<BBH", 1, 0, len(chunks))
        node += struct.pack("<QQ", UNDEF, UNDEF)
        for caddr, csize, offs in chunks:
            node += struct.pack("<II", csize, 0)
            node += b"".join(struct.pack("<Q", o) for o in offs + [0])
            node += struct.pack("<Q", caddr)
        node += struct.pack("<II", 0, 0) + b"".join(
            struct.pack("<Q", o) for o in list(arr.shape) + [0]
        )
        btree_addr[nm] = alloc.put(node)

    # object headers — two passes because DIMENSION_LIST needs dim header
    # addresses; pass 1 computes sizes with placeholder addresses.
    def build_header(nm: str, addrs: dict[str, int], ghp_addr: int) -> bytes:
        var = ds.variables.get(nm)
        is_dim = nm in ds.dimensions
        rec = data_addr[nm]
        arr = rec[1]
        vdims = _var_dims(nm)
        maxshape = None
        if any(d in unlimited for d in vdims):
            maxshape = tuple(
                None if d in unlimited else s for d, s in zip(vdims, arr.shape)
            )
        msgs = [
            _msg(M_DATASPACE, _ds_message(arr.shape, maxshape)),
            _msg(M_DATATYPE, _dt_message(arr)),
            _msg(M_FILL, struct.pack("<BBBB", 2, 2, 0, 0)),
        ]
        if rec[0] == "contiguous":
            msgs.append(
                _msg(M_LAYOUT, struct.pack("<BBQQ", 3, 1, rec[2], arr.nbytes))
            )
        elif nm in v4_index:
            # Data Layout v4 (libver-latest): chunk dims at 8 bytes each,
            # then the index type and its creation parameters
            _, arr, cshape, chunks = rec
            kind, iaddr = v4_index[nm]
            lay = struct.pack("<BBBBB", 4, 2, 0, arr.ndim, 8)
            for c in cshape:
                lay += struct.pack("<Q", c)
            if kind == "earray":
                prm = {**_EA_DEFAULTS, **(ea_params or {})}
                lay += struct.pack(
                    "<BBBBBH", 4, prm["max_bits"], prm["index_elmts"],
                    prm["min_pointers"], prm["min_elmts"], prm["page_bits"],
                )
            else:
                # creation parameters must advertise the node size the tree
                # was actually built with, not a fixed 2048
                lay += struct.pack("<BIBB", 5, b2_node_size, 100, 40)
            lay += struct.pack("<Q", iaddr)
            msgs.append(_msg(M_LAYOUT, lay))
            if compress is not None:
                msgs.append(_msg(M_FILTERS, _filter_pipeline_msg(
                    arr.itemsize, compress)))
        else:
            _, arr, cshape, chunks = rec
            lay = struct.pack("<BBB", 3, 2, arr.ndim + 1)
            lay += struct.pack("<Q", btree_addr[nm])
            for c in cshape:
                lay += struct.pack("<I", c)
            lay += struct.pack("<I", arr.itemsize)
            msgs.append(_msg(M_LAYOUT, lay))
            if compress is not None:
                msgs.append(_msg(M_FILTERS, _filter_pipeline_msg(
                    arr.itemsize, compress)))
        if is_dim:
            msgs.append(_msg(M_ATTR, _encode_attr("CLASS", "DIMENSION_SCALE")))
            if var is None:
                msgs.append(_msg(M_ATTR, _encode_attr(
                    "NAME",
                    "This is a netCDF dimension but not a netCDF variable."
                    f"{dim_sizes[nm]:>10}",
                )))
            else:
                msgs.append(_msg(M_ATTR, _encode_attr("NAME", nm)))
            msgs.append(_msg(M_ATTR, _encode_attr(
                "_Netcdf4Dimid", np.int32(dim_names.index(nm))
            )))
        elif var is not None and var.dimensions:
            # DIMENSION_LIST: vlen-of-object-ref per dimension via global heap
            payload = b""
            for i, d in enumerate(var.dimensions):
                ref = struct.pack("<Q", addrs.get(d, 0))
                idx = dimlist_ghp[nm][i]
                payload += struct.pack("<IQI", 1, ghp_addr, idx)
            msgs.append(_msg(M_ATTR, _attr_message(
                "DIMENSION_LIST", _VLEN_REF_DT, (len(var.dimensions),), payload
            )))
        if var is not None:
            for k, v in var.attributes.items():
                msgs.append(_msg(M_ATTR, _encode_attr(k, v)))
        return _object_header_v1(msgs)

    # pre-register global heap slots for every DIMENSION_LIST element
    dimlist_ghp: dict[str, list[int]] = {}
    for nm in names:
        var = ds.variables.get(nm)
        if var is not None and nm not in ds.dimensions and var.dimensions:
            dimlist_ghp[nm] = [ghp_ref(b"\x00" * 8) for _ in var.dimensions]

    sizes = {nm: len(build_header(nm, {}, 0)) for nm in names}
    header_addr: dict[str, int] = {}
    probe = _Alloc(alloc.pos)
    for nm in names:
        header_addr[nm] = probe.put(b"\x00" * sizes[nm])

    # global heap collection (after headers)
    ghp_payload = b""
    for i, entry in enumerate(ghp_entries, start=1):
        ghp_payload += struct.pack("<HH4xQ", i, 1, len(entry)) + _pad8(entry)
    coll_size = 16 + len(ghp_payload) + 16
    ghp_raw = b"GCOL" + struct.pack("<B3xQ", 1, coll_size) + ghp_payload
    ghp_raw += struct.pack("<HH4xQ", 0, 0, coll_size - 16 - len(ghp_payload))
    ghp_addr = probe.put(ghp_raw) if ghp_entries else 0

    # patch global heap entries with real object references
    if ghp_entries:
        rebuilt = []
        for nm in names:
            if nm in dimlist_ghp:
                var = ds.variables[nm]
                for d in var.dimensions:
                    rebuilt.append(struct.pack("<Q", header_addr.get(d, 0)))
        ghp_payload = b""
        for i, entry in enumerate(rebuilt, start=1):
            ghp_payload += struct.pack("<HH4xQ", i, 1, len(entry)) + _pad8(entry)
        ghp_raw = (
            b"GCOL" + struct.pack("<B3xQ", 1, coll_size) + ghp_payload
            + struct.pack("<HH4xQ", 0, 0, coll_size - 16 - len(ghp_payload))
        )

    # emit real headers at the reserved addresses
    for nm in names:
        hdr = build_header(nm, header_addr, ghp_addr)
        alloc.put(hdr)      # same order -> same addresses as the probe pass
        assert alloc.blocks[-1][0] == header_addr[nm], "header layout drift"
    if ghp_entries:
        a = alloc.put(ghp_raw)
        assert a == ghp_addr

    # root group: local heap, SNOD, B-tree, root header
    heap_data = bytearray(b"\x00" * 8)
    name_off = {}
    for nm in names:
        name_off[nm] = len(heap_data)
        heap_data += nm.encode("utf-8") + b"\x00"
        heap_data += b"\x00" * ((8 - len(heap_data) % 8) % 8)
    free_off = len(heap_data)
    heap_data += struct.pack("<QQ", 1, 16)  # free block: next=1 (last), size 16
    heap_data_addr = alloc.put(bytes(heap_data))
    heap_hdr = b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), free_off, heap_data_addr)
    heap_addr = alloc.put(heap_hdr)

    snod = b"SNOD" + struct.pack("<BxH", 1, len(names))
    for nm in names:        # names is sorted — SNOD requires it
        snod += struct.pack("<QQ", name_off[nm], header_addr[nm])
        snod += struct.pack("<I4x16x", 0)
    snod_addr = alloc.put(snod)

    btree = b"TREE" + struct.pack("<BBH", 0, 0, 1)
    btree += struct.pack("<QQ", UNDEF, UNDEF)
    btree += struct.pack("<Q", name_off[names[0]])
    btree += struct.pack("<Q", snod_addr)
    btree += struct.pack("<Q", name_off[names[-1]])
    root_btree = alloc.put(btree)

    root_msgs = [_msg(M_SYMTAB, struct.pack("<QQ", root_btree, heap_addr))]
    for k, v in ds.attributes.items():
        root_msgs.append(_msg(M_ATTR, _encode_attr(k, v)))
    root_hdr_addr = alloc.put(_object_header_v1(root_msgs))

    eof = alloc.pos
    sb = MAGIC + struct.pack("<BBBBBBBxHHI", 0, 0, 0, 0, 0, 8, 8, 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    sb += struct.pack("<QQ", 0, root_hdr_addr)          # root STE: name off, OH addr
    sb += struct.pack("<I4x", 1)                        # cached stab
    sb += struct.pack("<QQ", root_btree, heap_addr)     # scratch: btree+heap

    with open(path, "wb") as f:
        f.write(sb.ljust(96, b"\x00"))
        for addr, data in sorted(alloc.blocks):
            f.seek(addr)
            f.write(data)


def _record_count(ds: Dataset, dim: str) -> int:
    for v in ds.variables.values():
        if v.dimensions and v.dimensions[0] == dim:
            return int(np.asarray(v.data).shape[0])
    return 0
