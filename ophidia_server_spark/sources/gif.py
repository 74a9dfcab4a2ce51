"""Pure-Python GIF codec (87a/89a) — read + write.

Same codec-from-spec pattern as sources/png.py / bmp.py / wav.py: the GIF
grammar (CompuServe GIF89a specification, public) is a header + logical
screen descriptor, optional global color table, a block stream of extensions
and image descriptors, each image's pixel indices compressed with variable-
code-width LZW. Implemented from the spec:

  read  — 87a and 89a, global and local color tables, multiple frames
          (animation), interlaced images (the 4-pass row shuffle), graphic
          control extensions (frame delay, transparency index reported in
          metadata), full LZW decoding incl. code-width growth and
          clear/end codes. Frames decode to uint8 RGB arrays rendered
          against the prior frame state for disposal method 1 (leave),
          the background for method 2 (restore-bg), and the saved
          pre-frame canvas for method 3 (restore-previous); reserved
          methods >= 4 raise GifError.
  write — single- or multi-frame RGB input whose palette fits 256 exact
          colors (a named GifError otherwise — palette quantization is an
          image-processing choice, not a codec concern), LZW-encoded with
          growing code widths, 89a with per-frame graphic control when
          delays are given.

Everything outside the subset raises a named GifError.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC87 = b"GIF87a"
MAGIC89 = b"GIF89a"


class GifError(ValueError):
    """Named error for GIF payloads outside the implemented subset."""


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, LSB-first bit packing)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset_table():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = end + 1

    width = min_code_size + 1
    next_code = end + 1
    reset_table()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset_table()
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise GifError("LZW: first code not in table")
                entry = table[code]
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise GifError("LZW: code beyond table")
            out += entry
            if prev is not None:
                if next_code < 4096:
                    table.append(prev + entry[:1])
                    next_code += 1
                    if next_code == (1 << width) and width < 12:
                        width += 1
            prev = entry
            if len(out) >= n_expected:
                return bytes(out[:n_expected])
    return bytes(out[:n_expected])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def _read_color_table(buf: bytes, pos: int, n: int):
    tbl = np.frombuffer(buf[pos : pos + 3 * n], np.uint8).reshape(n, 3).copy()
    return tbl, pos + 3 * n


def _read_subblocks(buf: bytes, pos: int):
    chunks = []
    while True:
        if pos >= len(buf):
            raise GifError("truncated sub-block stream")
        n = buf[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(buf[pos : pos + n])
        pos += n


def decode(buf: bytes) -> dict:
    """Decode a GIF payload -> {'width', 'height', 'frames': [HxWx3 uint8],
    'delays_cs': [int], 'version': '87a'|'89a'}. Frames are rendered
    composites (disposal methods none/leave/restore-bg/restore-previous)."""
    if len(buf) < 13 or buf[:6] not in (MAGIC87, MAGIC89):
        raise GifError("not a GIF payload")
    version = buf[3:6].decode()
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(buf, pos, 2 << (packed & 0x07))
    frames, delays = [], []
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None:
        canvas[:] = gct[min(bg_idx, len(gct) - 1)]
    background = canvas.copy()
    transparent = None
    delay = 0
    disposal = 0
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = buf[pos]
            pos += 1
            data, pos = _read_subblocks(buf, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags, delay = data[0], struct.unpack_from("<H", data, 1)[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise GifError(f"unknown GIF block 0x{block:02x}")
        ix, iy, iw, ih, ipacked = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        table = gct
        if ipacked & 0x80:
            table, pos = _read_color_table(buf, pos, 2 << (ipacked & 0x07))
        if table is None:
            raise GifError("image has no color table")
        min_code = buf[pos]
        pos += 1
        data, pos = _read_subblocks(buf, pos)
        idx = np.frombuffer(
            _lzw_decode(data, min_code, iw * ih), np.uint8
        )
        if len(idx) < iw * ih:
            raise GifError("GIF frame pixel data truncated")
        idx = idx.reshape(ih, iw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        rgb = table[np.minimum(idx, len(table) - 1)]
        prior = canvas.copy() if disposal == 3 else None
        region = canvas[iy : iy + ih, ix : ix + iw]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore to background
            canvas[iy : iy + ih, ix : ix + iw] = background[iy : iy + ih, ix : ix + iw]
        elif disposal == 3:  # restore to previous (pre-frame canvas)
            canvas = prior
        elif disposal > 3:
            raise GifError(f"reserved GIF disposal method {disposal}")
        transparent = None
        delay = 0
        disposal = 0
    if not frames:
        raise GifError("GIF contains no image data")
    return {
        "width": w, "height": h, "frames": frames, "delays_cs": delays,
        "version": version,
    }


def encode(frames: "np.ndarray | list", delays_cs: "list[int] | None" = None) -> bytes:
    """Encode one RGB frame (HxWx3 uint8) or a list of same-size frames as
    GIF. The union of colors across frames must fit a 256-entry exact
    palette (GifError otherwise — quantization is the caller's choice)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames or any(f.ndim != 3 or f.shape[2] != 3 for f in frames):
        raise GifError("encode expects HxWx3 uint8 frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise GifError("all frames must share one size")
    colors = np.unique(np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0)
    if len(colors) > 256:
        raise GifError(
            f"{len(colors)} distinct colors exceed the 256-entry exact palette"
        )
    depth = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    size = 1 << depth
    palette = np.zeros((size, 3), np.uint8)
    palette[: len(colors)] = colors
    # vectorized color -> index: pack RGB into one int24 and searchsorted
    # against the (sorted-by-construction) packed palette — a per-pixel
    # Python dict lookup here cost more than the LZW pass itself
    packed_pal = (
        colors[:, 0].astype(np.int64) << 16
    ) | (colors[:, 1].astype(np.int64) << 8) | colors[:, 2].astype(np.int64)
    animated = len(frames) > 1 or delays_cs is not None
    out = bytearray(MAGIC89 if animated else MAGIC87)
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    min_code = max(2, depth)
    for fi, f in enumerate(frames):
        if animated:
            d = (delays_cs or [0] * len(frames))[fi] if delays_cs else 0
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, d, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        flat = f.reshape(-1, 3).astype(np.int64)
        packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
        idx = np.searchsorted(packed_pal, packed).astype(np.uint8).tobytes()
        comp = _lzw_encode(idx, min_code)
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
