"""Pure-Python raster decoders: GIF, BMP, Netpbm, TIFF, Sun Raster,
SGI, XBM.

Together with PNG (multimodal.py) and JPEG (jpeg.py) these cover the
raster formats that actually occur in crawled corpora without any
optional codec dependency — each implemented from its public spec
(GIF89a specification, BITMAPINFOHEADER layout, the netpbm format
pages) and cross-validated against CPython's imghdrdata corpus, whose
``python.png`` is the lossless twin of every sibling file.

All decoders return ``(width, height, channels, pixels)`` row-major
8-bit buffers, matching sources/jpeg.decode_jpeg, and are row-local
pure functions — safe inside any executor UDF (the mapInPandas media
stages in multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_gif",
    "decode_bmp",
    "decode_netpbm",
    "decode_tiff",
    "decode_ras",
    "decode_sgi",
    "decode_xbm",
]

# Dimension sanity cap shared by every decoder here and by the JPEG/PNG
# paths: a corrupt or hostile header that claims 65535x65535 would
# otherwise make the decoder allocate a multi-GB canvas BEFORE any
# pixel data is validated — an executor OOM a single dirty row could
# trigger. 2^26 pixels (= 8192x8192 RGB at 192 MB) is far above real
# crawl imagery; raise it deliberately if a corpus truly needs more.
MAX_PIXELS = 1 << 26


def check_dims(width: int, height: int, what: str = "image") -> None:
    """Reject implausible header dimensions BEFORE allocating."""
    if width <= 0 or height <= 0 or width * height > MAX_PIXELS:
        raise ValueError(
            f"implausible {what} dimensions {width}x{height} "
            f"(cap {MAX_PIXELS} pixels)"
        )


# ---------------------------------------------------------------------------
# GIF (87a/89a): LZW-compressed palette frames; first frame only.
# ---------------------------------------------------------------------------


def _gif_lzw(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF-variant LZW decompress (LSB-first bit packing, dynamic code
    width 3..12 bits, CLEAR/EOI codes)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return out
    return out


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_frames(
    data: bytes, max_frames: int | None = None
) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Composite every frame of a GIF: ``(width, height,
    [(delay_ms, rgb_bytes), ...])``.

    The 89a animation semantics handled: graphic-control delay and
    transparency index (transparent pixels keep the canvas — the
    composited previous frames), and disposal methods 1 (leave), 2
    (restore the frame rect to background) and 3 (restore the previous
    canvas). ``max_frames`` stops the walk early (header-cheap frame
    counting / first-frame decode)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, flags, bg_index, _aspect = struct.unpack("<HHBBB", data[6:13])
    check_dims(sw, sh, "GIF")
    pos = 13
    global_pal = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = data[pos : pos + 3 * n]
        pos += 3 * n
    # disposal-2 fill color: the logical-screen background index
    # resolved through the GLOBAL color table (GIF89a spec; ADVICE r9
    # — zero-fill differed from reference renderers on non-black
    # backgrounds). Without a global table, or with an out-of-range
    # index, black stays the documented fallback (also what browsers
    # render when they treat disposal-2 as restore-to-transparent over
    # a dark page).
    bg_rgb = (0, 0, 0)
    if global_pal and 3 * bg_index + 3 <= len(global_pal):
        bg_rgb = tuple(global_pal[3 * bg_index : 3 * bg_index + 3])
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list[tuple[int, bytes]] = []
    # aggregate output cap: each composited frame is a full canvas, so
    # a few-KB hostile GIF declaring a large screen + thousands of tiny
    # frames could otherwise allocate unbounded memory despite the
    # per-frame MAX_PIXELS check
    max_total = 4 * MAX_PIXELS * 3
    total_bytes = 0
    delay_ms = 0
    transparent = -1
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                gflags = data[pos + 1]
                delay_ms = struct.unpack("<H", data[pos + 2 : pos + 4])[0] * 10
                transparent = data[pos + 4] if gflags & 0x01 else -1
                disposal = (gflags >> 2) & 0x07
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        check_dims(w, h, "GIF frame")
        pos += 9
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = data[pos : pos + 3 * n]
            pos += 3 * n
        if not pal:
            raise ValueError("GIF frame without a color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            n = data[pos]
            lzw += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = _gif_lzw(min_code, bytes(lzw), w * h)
        if len(idx) < w * h:
            raise ValueError("truncated GIF image data")
        # de-interlace row order if flagged
        if iflags & 0x40:
            rows = bytearray(w * h)
            src = 0
            for start, step in _GIF_INTERLACE:
                for y in range(start, h, step):
                    rows[y * w : (y + 1) * w] = idx[src : src + w]
                    src += w
            idx = rows
        before = canvas.copy() if disposal == 3 else None
        npal = len(pal) // 3
        vh = min(h, sh - top)
        vw = min(w, sw - left)
        if vh > 0 and vw > 0:
            # count= trims sloppy-encoder LZW overshoot past w*h (the
            # old per-pixel loop read only the first w*h bytes)
            sub = np.frombuffer(bytes(idx), np.uint8, count=h * w).reshape(
                h, w
            )[:vh, :vw]
            view = canvas[top : top + vh, left : left + vw]
            pal_lut = np.frombuffer(pal, np.uint8).reshape(-1, 3)
            if transparent >= 0:
                # palette bounds apply to OPAQUE pixels only: a
                # transparent index outside the palette is quirky but
                # renderable (it never does a lookup)
                opaque = sub != transparent
                if int(sub[opaque].max(initial=0)) >= npal:
                    raise ValueError("GIF pixel index outside palette")
                view[opaque] = pal_lut[sub[opaque]]
            else:
                if int(sub.max(initial=0)) >= npal:
                    raise ValueError("GIF pixel index outside palette")
                view[:] = pal_lut[sub]
        total_bytes += canvas.nbytes
        if total_bytes > max_total:
            raise ValueError(
                f"GIF frame volume exceeds {max_total} bytes "
                "(hostile or pathological animation)"
            )
        frames.append((delay_ms, canvas.tobytes()))
        if max_frames is not None and len(frames) >= max_frames:
            return sw, sh, frames
        if disposal == 2:  # restore the frame rect to background color
            canvas[top : top + vh, left : left + vw] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas = before
        delay_ms = 0
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("GIF stream without an image descriptor")
    return sw, sh, frames


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode the FIRST frame of a GIF to RGB (transparent pixels keep
    the empty black canvas — use :func:`gif_frames` for animation)."""
    sw, sh, frames = gif_frames(data, max_frames=1)
    return sw, sh, 3, frames[0][1]


# ---------------------------------------------------------------------------
# BMP (Windows BITMAPINFOHEADER, uncompressed 8/24/32-bit)
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an uncompressed BI_RGB BMP (8-bit palette, 24-bit BGR, or
    32-bit BGRA) to RGB. Top-down and bottom-up row orders both
    handled; RLE and bitfield compressions raise."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    pix_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP unsupported")
    width, height = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    compression = struct.unpack("<I", data[30:34])[0]
    if compression == 3 and bpp == 32 and len(data) >= 66:
        # BI_BITFIELDS: only the standard BGRA layout decodes here —
        # decoding any other mask layout as BGR would be silent garbage.
        # The three masks sit at offset 54 both for the size-40 header
        # (appended DWORDs) and for V4/V5 (in-header fields).
        masks = struct.unpack("<III", data[54:66])
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise NotImplementedError(
                f"BMP bitfield masks {tuple(hex(m) for m in masks)} unsupported"
            )
    elif compression != 0:
        raise NotImplementedError(f"BMP compression {compression} unsupported")
    bottom_up = height > 0
    height = abs(height)
    check_dims(width, height, "BMP")
    if bpp == 8:
        n_colors = struct.unpack("<I", data[46:50])[0] or 256
        pal_off = 14 + hdr_size
        pal = data[pal_off : pal_off + 4 * n_colors]  # BGRX quads
    elif bpp not in (24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp} unsupported")
    stride = (width * bpp // 8 + 3) & ~3
    # some writers omit the FINAL row's 4-byte alignment padding —
    # require the pixel payload only, then zero-pad to the full grid
    need = (height - 1) * stride + width * bpp // 8 if height else 0
    if pix_off + need > len(data):
        raise ValueError("truncated BMP pixel data")
    avail = min(height * stride, len(data) - pix_off)
    arr = np.zeros(height * stride, np.uint8)
    arr[:avail] = np.frombuffer(data, np.uint8, count=avail, offset=pix_off)
    rows = arr.reshape(height, stride)
    if bottom_up:
        rows = rows[::-1]
    if bpp == 8:
        quads = np.frombuffer(pal, np.uint8).reshape(-1, 4)
        out = quads[rows[:, :width]][..., (2, 1, 0)]  # BGRX -> RGB
    else:
        step = bpp // 8
        px = rows[:, : width * step].reshape(height, width, step)
        out = px[..., (2, 1, 0)]  # BGR(A) -> RGB
    return width, height, 3, np.ascontiguousarray(out).tobytes()


# ---------------------------------------------------------------------------
# Netpbm: P1-P3 (ASCII) and P4-P6 (binary), maxval <= 255
# ---------------------------------------------------------------------------


def _pnm_tokens(data: bytes, pos: int, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers, skipping ``#``
    comments, returning (values, next offset)."""
    vals: list[int] = []
    cur = b""
    while len(vals) < n and pos <= len(data):
        c = data[pos : pos + 1]
        pos += 1
        if c == b"#":
            while pos < len(data) and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        if c.isdigit():
            cur += c
            continue
        if cur:
            vals.append(int(cur))
            cur = b""
        if not c:
            break
    if len(vals) < n:
        raise ValueError("truncated netpbm header/body")
    return vals, pos


def decode_netpbm(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode PBM/PGM/PPM (both ASCII and raw variants). PBM maps
    1 -> black per the spec. Returns 1 channel for PBM/PGM, 3 for
    PPM."""
    magic = data[:2]
    if magic not in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        raise ValueError("not a netpbm stream")
    kind = magic[1] - 0x30
    bitmap = kind in (1, 4)
    (dims, pos) = _pnm_tokens(data, 2, 2 if bitmap else 3)
    width, height = dims[0], dims[1]
    check_dims(width, height, "netpbm")
    maxval = 1 if bitmap else dims[2]
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm unsupported")
    if maxval <= 0:
        raise ValueError("netpbm maxval must be positive")
    channels = 3 if kind in (3, 6) else 1
    n_vals = width * height * channels
    if kind == 1:  # ASCII bitmap: digits need no separators (spec)
        vals = []
        i = pos
        while i < len(data) and len(vals) < n_vals:
            c = data[i : i + 1]
            i += 1
            if c == b"#":
                while i < len(data) and data[i] not in (0x0A, 0x0D):
                    i += 1
            elif c in (b"0", b"1"):
                vals.append(c[0] - 0x30)
        if len(vals) < n_vals:
            raise ValueError("truncated netpbm header/body")
    elif kind in (2, 3):  # ASCII
        vals, _ = _pnm_tokens(data, pos, n_vals)
    elif kind == 4:  # packed bits, rows padded to whole bytes
        rowbytes = (width + 7) // 8
        packed = np.frombuffer(
            data, np.uint8, count=rowbytes * height, offset=pos
        ).reshape(height, rowbytes)
        vals = np.unpackbits(packed, axis=1)[:, :width].reshape(-1)
    else:  # P5/P6 raw bytes
        body = data[pos : pos + n_vals]
        if len(body) < n_vals:
            raise ValueError("truncated netpbm body")
        vals = list(body)
    if bitmap:
        px = bytes(0 if v else 255 for v in vals)  # 1 = black
    elif maxval == 255:
        px = bytes(vals)
    else:
        px = bytes(v * 255 // maxval for v in vals)
    return width, height, channels, px


# ---------------------------------------------------------------------------
# TIFF (baseline 8-bit: none / LZW / PackBits compression, strips)
# ---------------------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _tiff_values(data: bytes, bo: str, entry: bytes) -> list[int]:
    """All integer values of one IFD entry (inline or via offset)."""
    typ, cnt = struct.unpack(bo + "HI", entry[2:8])
    size = _TIFF_TYPE_SIZE.get(typ, 1) * cnt
    if size > len(data):
        # a corrupt count would otherwise build a gigabyte struct
        # format string before any byte is read
        raise ValueError("TIFF IFD entry count exceeds the file")
    raw = entry[8:12] if size <= 4 else None
    if raw is None:
        off = struct.unpack(bo + "I", entry[8:12])[0]
        raw = data[off : off + size]
    fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}.get(typ)
    if fmt is None:
        return []
    return list(struct.unpack(bo + fmt * cnt, raw[: _TIFF_TYPE_SIZE[typ] * cnt]))


def _tiff_lzw(data: bytes, expected: int) -> bytearray:
    """TIFF-variant LZW: MSB-first bit packing, CLEAR=256/EOI=257,
    EARLY code-width change (one code before the GIF convention)."""
    CLEAR, EOI = 256, 257

    def fresh():
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = fresh()
    width = 9
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                table = fresh()
                width = 9
                prev = None
                continue
            if code == EOI:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt TIFF LZW stream")
            out += entry
            prev = entry
            # early change: bump width when ONE slot remains
            if len(table) >= (1 << width) - 1 and width < 12:
                width += 1
            if len(out) >= expected:
                return out
    return out


def _packbits(data: bytes, expected: int) -> bytearray:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
    return out


def decode_tiff(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline 8-bit TIFF (first IFD): compression none /
    LZW (with the horizontal-differencing predictor) / PackBits,
    photometric gray (0/1), RGB(A) (2), or palette (3), strip layout.
    Tiled, 16-bit, and planar-separate files raise
    ``NotImplementedError``."""
    if data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF stream")
    bo = "<" if data[:2] == b"II" else ">"
    if struct.unpack(bo + "H", data[2:4])[0] != 42:
        raise ValueError("not a TIFF stream (bad magic)")
    ifd = struct.unpack(bo + "I", data[4:8])[0]
    n = struct.unpack(bo + "H", data[ifd : ifd + 2])[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        entry = data[ifd + 2 + 12 * i : ifd + 14 + 12 * i]
        tag = struct.unpack(bo + "H", entry[:2])[0]
        tags[tag] = _tiff_values(data, bo, entry)
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF unsupported")
    width = tags[256][0]
    height = tags[257][0]
    check_dims(width, height, "TIFF")
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} unsupported")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar-separate TIFF unsupported")
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    if photometric not in (0, 1, 2, 3):
        # CMYK (5) / YCbCr (6) samples returned as "RGB" would be
        # silent garbage colors — reject to the Pillow fall-through
        raise NotImplementedError(
            f"TIFF photometric {photometric} unsupported"
        )
    predictor = tags.get(317, [1])[0]
    offsets = tags[273]
    counts = tags.get(279, [len(data) - offsets[0]])
    rows_per_strip = tags.get(278, [height])[0] or height
    rowbytes = width * spp
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = data[off : off + cnt]
        nrows = min(rows_per_strip, height - si * rows_per_strip)
        expected = nrows * rowbytes
        if compression == 1:
            part = strip[:expected]
        elif compression == 5:
            part = _tiff_lzw(strip, expected)
        elif compression == 32773:
            part = _packbits(strip, expected)
        else:
            raise NotImplementedError(f"TIFF compression {compression} unsupported")
        if len(part) < expected:
            raise ValueError("TIFF strip decodes short")
        # decompressors may overshoot by a few bytes on corrupt input;
        # truncating keeps every later strip aligned
        raw += part[:expected]
    if len(raw) < height * rowbytes:
        raise ValueError("truncated TIFF strips")
    if predictor == 2:  # horizontal differencing: cumsum mod 256 per sample
        arr = np.frombuffer(bytes(raw[: height * rowbytes]), np.uint8).reshape(
            height, width, spp
        )
        raw = bytearray(
            (arr.astype(np.int64).cumsum(axis=1) & 0xFF).astype(np.uint8).tobytes()
        )
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    if photometric == 3:  # palette: 16-bit colormap, R then G then B
        cmap = tags.get(320)
        if not cmap or spp != 1:
            raise ValueError("palette TIFF without a colormap")
        ncol = len(cmap) // 3
        lut = (np.asarray(cmap, np.int64).reshape(3, ncol).T >> 8).astype(np.uint8)
        idx = np.frombuffer(bytes(raw[: width * height]), np.uint8)
        if int(idx.max(initial=0)) >= ncol:
            raise ValueError("TIFF palette index outside colormap")
        return width, height, 3, np.ascontiguousarray(lut[idx]).tobytes()
    if photometric == 0 and spp == 1:  # white-is-zero: invert
        raw = bytearray(
            (np.frombuffer(bytes(raw), np.uint8) ^ 0xFF).tobytes()
        )
    channels = spp if spp in (1, 3, 4) else None
    if channels is None:
        raise NotImplementedError(f"TIFF samples-per-pixel {spp} unsupported")
    return width, height, channels, bytes(raw[: width * height * channels])


# ---------------------------------------------------------------------------
# Sun Raster (.ras): 8 big-endian header words, optional colormap,
# 16-bit-padded rows, optional byte RLE
# ---------------------------------------------------------------------------

_RAS_MAGIC = 0x59A66A95


def _ras_unrle(data: bytes, expected: int) -> bytearray:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        b = data[i]
        i += 1
        if b != 0x80:
            out.append(b)
            continue
        count = data[i]
        i += 1
        if count == 0:  # literal 0x80
            out.append(0x80)
        else:
            out += bytes([data[i]]) * (count + 1)
            i += 1
    return out


def decode_ras(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a Sun Raster file (depth 8 gray/palette, 24, or 32; old /
    standard / byte-RLE / RGB-order types) to gray or RGB."""
    if len(data) < 32 or struct.unpack(">I", data[:4])[0] != _RAS_MAGIC:
        raise ValueError("not a Sun Raster stream")
    _, width, height, depth, _length, rtype, maptype, maplen = struct.unpack(
        ">8I", data[:32]
    )
    check_dims(width, height, "Sun Raster")
    if rtype not in (0, 1, 2, 3):
        raise NotImplementedError(f"Sun Raster type {rtype} unsupported")
    if depth not in (8, 24, 32):
        raise NotImplementedError(f"Sun Raster depth {depth} unsupported")
    pos = 32
    cmap = data[pos : pos + maplen] if maptype else b""
    pos += maplen
    rowbytes = (width * depth // 8 + 1) & ~1  # rows pad to 16 bits
    body = data[pos:]
    if rtype == 2:
        body = _ras_unrle(body, rowbytes * height)
    if len(body) < rowbytes * height:
        raise ValueError("truncated Sun Raster data")
    rgb_order = rtype == 3
    if depth == 8:
        if cmap and maptype == 1:
            n = maplen // 3
            lut = np.frombuffer(cmap, np.uint8).reshape(3, n).T
            idx = np.frombuffer(bytes(body), np.uint8, count=height * rowbytes)
            idx = idx.reshape(height, rowbytes)[:, :width]
            return width, height, 3, np.ascontiguousarray(lut[idx]).tobytes()
        rows8 = np.frombuffer(
            bytes(body), np.uint8, count=height * rowbytes
        ).reshape(height, rowbytes)
        return width, height, 1, np.ascontiguousarray(rows8[:, :width]).tobytes()
    step = depth // 8
    rows = np.frombuffer(bytes(body), np.uint8, count=height * rowbytes).reshape(
        height, rowbytes
    )
    px = rows[:, : width * step].reshape(height, width, step)[..., step - 3 :]
    out = px if rgb_order else px[..., ::-1]
    return width, height, 3, np.ascontiguousarray(out).tobytes()


# ---------------------------------------------------------------------------
# SGI image (.sgi/.rgb): bottom-up planar channels, verbatim or RLE
# ---------------------------------------------------------------------------


def decode_sgi(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an SGI image (8-bit channels, verbatim or RLE storage,
    1-4 planar channels stored bottom-up) to interleaved rows."""
    if len(data) < 512 or struct.unpack(">h", data[:2])[0] != 474:
        raise ValueError("not an SGI image stream")
    storage, bpc = data[2], data[3]
    _dim, xsize, ysize, zsize = struct.unpack(">HHHH", data[4:12])
    check_dims(xsize, ysize, "SGI")
    if bpc != 1:
        raise NotImplementedError("16-bit SGI unsupported")
    if zsize not in (1, 2, 3, 4):
        raise NotImplementedError(f"SGI zsize {zsize} unsupported")
    planes = [bytearray(xsize * ysize) for _ in range(zsize)]
    if storage == 0:  # verbatim: z planes of y rows
        pos = 512
        for z in range(zsize):
            for y in range(ysize):
                planes[z][y * xsize : (y + 1) * xsize] = data[pos : pos + xsize]
                pos += xsize
    elif storage == 1:  # RLE: offset/length tables per (row, channel)
        n = ysize * zsize
        offs = struct.unpack(f">{n}I", data[512 : 512 + 4 * n])
        lens = struct.unpack(f">{n}I", data[512 + 4 * n : 512 + 8 * n])
        for z in range(zsize):
            for y in range(ysize):
                off = offs[z * ysize + y]
                row = data[off : off + lens[z * ysize + y]]
                out = bytearray()
                i = 0
                while i < len(row):
                    b = row[i]
                    i += 1
                    count = b & 0x7F
                    if count == 0:
                        break
                    if b & 0x80:  # literal run
                        out += row[i : i + count]
                        i += count
                    else:  # replicate
                        out += bytes([row[i]]) * count
                        i += 1
                planes[z][y * xsize : y * xsize + xsize] = out[:xsize]
    else:
        raise NotImplementedError(f"SGI storage {storage} unsupported")
    channels = zsize if zsize != 2 else 1  # gray+alpha -> keep gray
    out = bytearray(xsize * ysize * channels)
    for y in range(ysize):
        sy = ysize - 1 - y  # bottom-up
        for c in range(channels):
            row = planes[c][sy * xsize : (sy + 1) * xsize]
            base = y * xsize * channels + c
            out[base : base + xsize * channels : channels] = row
    return xsize, ysize, channels, bytes(out)


# ---------------------------------------------------------------------------
# XBM: C-source monochrome bitmap (LSB-first bits, 1 = foreground)
# ---------------------------------------------------------------------------


def decode_xbm(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an X BitMap (the C-source text format) to 8-bit gray
    (foreground bits -> 0/black, background -> 255, matching PBM's
    1-is-black convention)."""
    import re

    text = data.decode("ascii", errors="strict") if isinstance(data, bytes) else data
    mw = re.search(r"#define\s+\w*_?width\s+(\d+)", text)
    mh = re.search(r"#define\s+\w*_?height\s+(\d+)", text)
    mb = re.search(r"_bits\s*\[\s*\]\s*=\s*\{([^}]*)\}", text, re.S)
    if not (mw and mh and mb):
        raise ValueError("not an XBM stream")
    width, height = int(mw.group(1)), int(mh.group(1))
    check_dims(width, height, "XBM")
    vals = [int(v.strip(), 0) for v in mb.group(1).split(",") if v.strip()]
    rowbytes = (width + 7) // 8
    if len(vals) < rowbytes * height:
        raise ValueError("truncated XBM bits")
    out = bytearray(width * height)
    for y in range(height):
        for x in range(width):
            bit = (vals[y * rowbytes + x // 8] >> (x % 8)) & 1
            out[y * width + x] = 0 if bit else 255
    return width, height, 1, bytes(out)
