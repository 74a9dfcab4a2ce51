"""Pure-Python baseline JPEG codec (decode + minimal encode), numpy-only.

Real multimodal corpora are overwhelmingly JPEG, and the container has no
image libraries — so the engine implements the public ITU-T T.81 spec
directly, the same from-spec approach as sources/png.py (RFC 2083) and
sources/avro.py. Decode parity target is the spec itself: reference ingest
treats images as opaque payloads (the reference has no image decode at all;
this extends the pipeline the way a training-data stack needs).

Supported on DECODE — the baseline sequential DCT process, which covers the
vast majority of real-world JPEGs:
  * SOF0 (baseline) and SOF1 (extended sequential, same entropy coding),
    8-bit precision;
  * 1 component (grayscale) or 3 components (JFIF YCbCr) with any integer
    subsampling ratio of Hmax/H, Vmax/V (4:4:4, 4:2:2, 4:2:0, 4:1:1, ...);
  * Huffman entropy coding with per-file DHT tables, byte stuffing, and
    DRI/RSTn restart intervals.
Progressive (SOF2), arithmetic coding, hierarchical, and 12-bit inputs
raise with the exact unsupported marker named — a corpus job routes those
rows to the poison-tolerant fallback, never dies.

ENCODE (test/fixture path, also spec-conformant): baseline grayscale or
YCbCr at 4:4:4 or 4:2:0, Annex-K example quantization tables scaled by the
libjpeg quality convention, and canonical Huffman tables emitted in DHT
(the spec allows any valid table set — the decoder always reads tables
from the file). Restart intervals supported so tests exercise RST resync.

Scale shape: decode cost is one pass per payload; at corpus scale each
executor task decodes its own blobs inside mapInPandas (see
pipeline/multimodal.decode_images) — this module stays driver-free.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"\xff\xd8"

# zigzag scan order (T.81 Figure A.6): zigzag index -> (row, col)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K (K.1/K.2) example quantization tables, natural row-major order
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """The libjpeg quality scaling convention (public IJG formula):
    quality 50 = the Annex-K table verbatim, 100 = all ones."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis C: FDCT = C A C^T, IDCT = C^T F C."""
    c = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return c


_C = _dct_basis()


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers, and
    resynchronizes across RSTn (T.81 F.2.2.5)."""

    __slots__ = ("buf", "pos", "acc", "nbits")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf
        while self.nbits <= 24:
            if self.pos >= len(b):
                # past EOI: pad with 1s (spec: decoder may pad final byte)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            byte = b[self.pos]
            if byte == 0xFF:
                nxt = b[self.pos + 1] if self.pos + 1 < len(b) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker (RST/EOI/next scan): virtual 1-padding
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def restart(self) -> None:
        """Byte-align and consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        b = self.buf
        # skip any fill bytes up to the marker
        while self.pos + 1 < len(b) and not (
            b[self.pos] == 0xFF and 0xD0 <= b[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        if self.pos + 1 < len(b):
            self.pos += 2


def _build_huff(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """(code length, code) -> symbol, canonical assignment (T.81 C.2)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bits(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy data")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def decode(buf: bytes) -> np.ndarray:
    """JPEG bytes -> (height, width, channels) uint8 array (channels 1 for
    grayscale, 3 for YCbCr->RGB). Baseline/extended sequential only —
    anything else raises with the refusing marker named. Both interleaved
    (one multi-component scan) and non-interleaved (one scan per
    component, T.81's single-component MCU rule) scan layouts decode."""
    if buf[:2] != MAGIC:
        raise ValueError("not a JPEG file (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    planes: dict[int, np.ndarray] | None = None
    done: set[int] = set()
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker expected in JPEG header")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(buf):
            raise ValueError("truncated JPEG segment")
        (seglen,) = struct.unpack(">H", buf[pos + 2: pos + 4])
        seg = buf[pos + 4: pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p: p + 64], dtype=np.uint8)
                    p += 64
                else:
                    vals = np.frombuffer(seg[p: p + 128], dtype=">u2")
                    p += 128
                t = np.zeros(64, dtype=np.int64)
                t[_ZZ] = vals.astype(np.int64)  # stored in zigzag order
                qt[tq] = t.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext sequential
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF marker 0xFF{marker:02X}; "
                "only baseline/extended sequential DCT is implemented)"
            )
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1: p + 17])
                n = sum(counts)
                symbols = seg[p + 17: p + 17 + n]
                p += 17 + n
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(
                    counts, symbols
                )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            if planes is None:
                planes = _alloc_planes(frame)
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 15))
            pos = _decode_one_scan(
                buf, pos, frame, scan, planes, qt, huff_dc, huff_ac,
                restart_interval,
            )
            done.update(c["id"] for c, _, _ in scan)
        # else: APPn/COM/etc — skipped
    if frame is None or planes is None:
        raise ValueError("no scan data in JPEG stream")
    missing = [c["id"] for c in frame["comps"] if c["id"] not in done]
    if missing:
        raise ValueError(f"components {missing} have no scan data")
    return _assemble(frame, planes)


def _alloc_planes(frame) -> dict:
    """Full-resolution-grid sample planes per component id, sized to the
    interleaved MCU grid (a superset of the non-interleaved block grid)."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return {
        c["id"]: np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        for c in frame["comps"]
    }


def _decode_block(r, td, ta, qtab, pred, huff_dc, huff_ac) -> tuple:
    zz = np.zeros(64, dtype=np.int64)
    t = _huff_decode(r, huff_dc[td])
    pred += _extend(r.bits(t), t)
    zz[0] = pred
    k = 1
    while k <= 63:
        rs = _huff_decode(r, huff_ac[ta])
        rr, s = rs >> 4, rs & 15
        if s == 0:
            if rr == 15:
                k += 16
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("AC coefficient overrun")
        zz[k] = _extend(r.bits(s), s)
        k += 1
    blk = np.zeros(64, dtype=np.int64)
    blk[_ZZ] = zz
    return pred, _C.T @ (blk.reshape(8, 8) * qtab) @ _C + 128.0


def _decode_one_scan(buf, pos, frame, scan, planes, qt, huff_dc, huff_ac,
                     dri) -> int:
    """One entropy-coded scan into the component planes; returns the byte
    position of the marker that ends the scan. Interleaved scans (ns > 1)
    walk the hmax/vmax MCU grid; a single-component scan uses the T.81
    non-interleaved rule — the MCU is ONE 8x8 block on that component's
    own block grid."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    r = _BitReader(buf, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    if len(scan) > 1:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and mcu_count and mcu_count % dri == 0:
                    r.restart()
                    pred = [0] * len(scan)
                for ci, (comp, td, ta) in enumerate(scan):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            pred[ci], px = _decode_block(
                                r, td, ta, qt[comp["tq"]], pred[ci],
                                huff_dc, huff_ac,
                            )
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            plane = planes[comp["id"]]
                            plane[y0:y0 + 8, x0:x0 + 8] = px
                mcu_count += 1
    else:
        comp, td, ta = scan[0]
        comp_w = -(-w * comp["h"] // hmax)
        comp_h = -(-h * comp["v"] // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        plane = planes[comp["id"]]
        for by in range(bh):
            for bx in range(bw):
                if dri and mcu_count and mcu_count % dri == 0:
                    r.restart()
                    pred = [0]
                pred[0], px = _decode_block(
                    r, td, ta, qt[comp["tq"]], pred[0], huff_dc, huff_ac
                )
                plane[by * 8: by * 8 + 8, bx * 8: bx * 8 + 8] = px
                mcu_count += 1
    return r.pos


def _assemble(frame, planes) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    out = []
    for comp in frame["comps"]:
        p = planes[comp["id"]]
        # integer-ratio upsample to full resolution, then crop
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0),
                      hmax // comp["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        gray = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encode (fixture/test path — spec-conformant baseline)
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.bits((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _enc_tables():
    """Canonical encoder Huffman tables (any valid DHT is legal — the
    decoder always reads tables from the file): 12 DC categories at 4 bits,
    all 256 AC symbols split 128@8 / 128@9 bits (prefix-free: 8-bit codes
    start with 0, 9-bit with 10)."""
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = bytes(range(12))
    ac_counts = [0] * 7 + [128, 128] + [0] * 7
    ac_syms = bytes(range(256))
    dc_codes = {s: (4, s) for s in range(12)}
    ac_codes = {}
    for s in range(128):
        ac_codes[s] = (8, s)
    for s in range(128, 256):
        ac_codes[s] = (9, 256 + (s - 128))
    return (dc_counts, dc_syms, dc_codes), (ac_counts, ac_syms, ac_codes)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _enc_block(wtr, blk, qtab, pred, dc_codes, ac_codes) -> int:
    coef = np.round((_C @ (blk - 128.0) @ _C.T) / qtab).astype(np.int64)
    zz = coef.reshape(-1)[_ZZ]
    diff = int(zz[0]) - pred
    t = _category(diff)
    ln, code = dc_codes[t]
    wtr.bits(code, ln)
    if t:
        wtr.bits(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]  # ZRL
            wtr.bits(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_codes[(run << 4) | s]
        wtr.bits(code, ln)
        wtr.bits(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        ln, code = ac_codes[0x00]  # EOB
        wtr.bits(code, ln)
    return int(zz[0])


def encode(img: np.ndarray, quality: int = 75, subsampling: str = "444",
           restart_interval: int = 0, interleave: bool = True) -> bytes:
    """(h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 -> baseline JPEG
    bytes. `subsampling` '444' or '420' (3-channel only); a non-zero
    `restart_interval` emits DRI + RSTn markers every that-many MCUs
    (interleaved mode only). `interleave=False` writes one scan PER
    COMPONENT (the T.81 non-interleaved layout, each scan on its own
    block grid) — the fixture for the decoder's multi-scan path."""
    if restart_interval and not interleave:
        raise ValueError("restart intervals only supported when interleaved")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode expects 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = 2 if (nc == 3 and subsampling == "420") else 1
    qluma = quant_table(_QT_LUMA, quality).reshape(8, 8)
    qchroma = quant_table(_QT_CHROMA, quality).reshape(8, 8)
    f = img.astype(np.float64)
    if nc == 3:
        rr, gg, bb = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * rr + 0.587 * gg + 0.114 * bb,
            128.0 - 0.168736 * rr - 0.331264 * gg + 0.5 * bb,
            128.0 + 0.5 * rr - 0.418688 * gg - 0.081312 * bb,
        ]
        samp = [(sub, sub), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
    else:
        planes = [f[..., 0]]
        samp = [(1, 1)]
        qsel = [0]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def pad_to(p, ph, pw):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    prepped = []
    for i, p in enumerate(planes):
        ch, cv = samp[i]
        if (hmax // ch, vmax // cv) != (1, 1):
            fy, fx = vmax // cv, hmax // ch
            ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
            p = pad_to(p, ph, pw)
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        prepped.append(pad_to(p, mcuy * cv * 8, mcux * ch * 8))

    (dc_counts, dc_syms, dc_codes), (ac_counts, ac_syms, ac_codes) = _enc_tables()
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"

    def dqt(tid, tab):
        z = np.zeros(64, dtype=np.int64)
        z[np.arange(64)] = tab.reshape(-1)[_ZZ]
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(v) for v in z
        )

    out += dqt(0, qluma)
    if nc == 3:
        out += dqt(1, qchroma)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], qsel[i]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, counts, syms):
        body = bytes([(tc << 4) | th]) + bytes(counts) + syms
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, dc_counts, dc_syms) + dht(1, 0, ac_counts, ac_syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    qtabs = [qluma if q == 0 else qchroma for q in qsel]

    def sos_marker(comp_ids):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([0, 63, 0])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    if interleave or nc == 1:
        out += sos_marker(list(range(1, nc + 1)))
        wtr = _BitWriter()
        pred = [0] * nc
        mcu_count = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    wtr.align()
                    out += wtr.out
                    wtr = _BitWriter()
                    out += bytes([0xFF, 0xD0 + (rst % 8)])
                    rst += 1
                    pred = [0] * nc
                for ci in range(nc):
                    ch, cv = samp[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            blk = prepped[ci][y0:y0 + 8, x0:x0 + 8]
                            pred[ci] = _enc_block(
                                wtr, blk, qtabs[ci], pred[ci], dc_codes, ac_codes
                            )
                mcu_count += 1
        wtr.align()
        out += wtr.out
    else:
        # non-interleaved: one scan per component on its OWN block grid
        for ci in range(nc):
            ch, cv = samp[ci]
            comp_w = -(-w * ch // hmax)
            comp_h = -(-h * cv // vmax)
            bw = -(-comp_w // 8)
            bh = -(-comp_h // 8)
            out += sos_marker([ci + 1])
            wtr = _BitWriter()
            pred_c = 0
            for by in range(bh):
                for bx in range(bw):
                    blk = prepped[ci][by * 8: by * 8 + 8, bx * 8: bx * 8 + 8]
                    pred_c = _enc_block(
                        wtr, blk, qtabs[ci], pred_c, dc_codes, ac_codes
                    )
            wtr.align()
            out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
