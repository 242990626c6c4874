"""GIF/BMP/netpbm decoder tests.

Ground truth comes from two directions: CPython's imghdrdata corpus
(independent encoders — ImageMagick-produced siblings of a lossless
python.png twin), and spec-side writers in this file (GIF with a real
LZW compressor incl. interlace, BMP 8/24-bit, netpbm P1-P6) whose
output must decode back bit-exactly.
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np
import pytest

from vechord_spark.sources.rasters import decode_bmp, decode_gif, decode_netpbm

_IMGHDR = Path(
    f"{sys.base_prefix}/lib/python{sys.version_info[0]}."
    f"{sys.version_info[1]}/test/imghdrdata"
)

needs_imghdr = pytest.mark.skipif(
    not (_IMGHDR / "python.png").exists(), reason="imghdrdata corpus not present"
)


def _png_twin():
    from vechord_spark.sources.multimodal import decode_image

    img = decode_image((_IMGHDR / "python.png").read_bytes())
    return np.frombuffer(img.pixels, np.uint8).reshape(
        img.height, img.width, img.channels
    )[..., :3].astype(int)


# ---------------------------------------------------------------------------
# imghdrdata cross-validation
# ---------------------------------------------------------------------------


@needs_imghdr
def test_bmp_matches_png_twin_exactly():
    w, h, ch, px = decode_bmp((_IMGHDR / "python.bmp").read_bytes())
    got = np.frombuffer(px, np.uint8).reshape(h, w, ch).astype(int)
    assert (got == _png_twin()).all()


@needs_imghdr
def test_ppm_matches_png_twin_exactly():
    w, h, ch, px = decode_netpbm((_IMGHDR / "python.ppm").read_bytes())
    got = np.frombuffer(px, np.uint8).reshape(h, w, ch).astype(int)
    assert (got == _png_twin()).all()


@needs_imghdr
def test_gif_matches_png_twin_modulo_quantization():
    """python.gif is ImageMagick-quantized WITH a transparent index
    (the 0xF9 graphic control block), so pixels can differ two ways:
    small palette-quantization error, and transparent slots our
    decoder paints with the palette color. Everything else must sit
    within quantization distance."""
    raw = (_IMGHDR / "python.gif").read_bytes()
    w, h, ch, px = decode_gif(raw)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(int)
    want = _png_twin()
    diff = np.abs(got - want).max(axis=2)
    # transparent-index pixels decode to the palette entry (black here);
    # the logo sits on a fully transparent canvas, so only require that
    # a solid share of the image is opaque and THOSE pixels match
    transparent = (got == 0).all(axis=2)
    assert (diff[~transparent] <= 8).all()
    assert 0.3 < (~transparent).mean()


@needs_imghdr
def test_pgm_pbm_shapes():
    for name, maxval in (("python.pgm", 255), ("python.pbm", 255)):
        w, h, ch, px = decode_netpbm((_IMGHDR / name).read_bytes())
        assert (w, h, ch) == (16, 16, 1)
        a = np.frombuffer(px, np.uint8)
        assert a.min() >= 0 and a.max() <= maxval and len(a) == 256


# ---------------------------------------------------------------------------
# spec-side writers -> exact roundtrip
# ---------------------------------------------------------------------------


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Real GIF LZW compressor (dictionary growth + CLEAR at 12 bits)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > (1 << 12):
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _write_gif(width, height, palette, indices, interlace=False, local=False):
    """Single-frame GIF89a; ``palette`` is a list of RGB triples sized
    a power of two, ``indices`` row-major palette indices."""
    bits = max(1, (len(palette) - 1).bit_length())
    out = bytearray(b"GIF89a")
    gflags = (0x80 | (bits - 1)) if not local else 0x00
    out += struct.pack("<HHBBB", width, height, gflags, 0, 0)
    # pad to the declared 2^bits color-table size
    pal = b"".join(bytes(c) for c in palette).ljust((2 << (bits - 1)) * 3, b"\x00")
    if not local:
        out += pal
    iflags = (0x80 | (bits - 1)) if local else 0x00
    if interlace:
        iflags |= 0x40
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, iflags)
    if local:
        out += pal
    body = bytearray(indices)
    if interlace:
        rows = bytearray()
        for start, step in _INTERLACE:
            for y in range(start, height, step):
                rows += indices[y * width : (y + 1) * width]
        body = rows
    min_code = max(2, bits)
    out += bytes([min_code])
    lzw = _lzw_encode(min_code, bytes(body))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("local", [False, True])
def test_gif_roundtrip_exact(interlace, local):
    rng = np.random.default_rng(3 + interlace + 2 * local)
    w, h, ncolors = 37, 23, 64
    palette = [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(ncolors)]
    idx = rng.integers(0, ncolors, w * h).astype(np.uint8).tobytes()
    data = _write_gif(w, h, palette, idx, interlace=interlace, local=local)
    gw, gh, ch, px = decode_gif(data)
    assert (gw, gh, ch) == (w, h, 3)
    want = b"".join(bytes(palette[i]) for i in idx)
    assert px == want


def test_gif_lzw_dictionary_pressure():
    """Long repetitive index streams push the LZW table through every
    code width up to 12 bits and across a mid-stream CLEAR."""
    w, h = 256, 64
    palette = [(i, 255 - i, i ^ 0x55) for i in range(256)]
    idx = bytes((x * (y + 1)) % 256 for y in range(h) for x in range(w))
    data = _write_gif(w, h, palette, idx)
    gw, gh, ch, px = decode_gif(data)
    want = b"".join(bytes(palette[i]) for i in idx)
    assert (gw, gh) == (w, h) and px == want


def _write_bmp(width, height, rgb, bpp=24):
    stride = (width * bpp // 8 + 3) & ~3
    if bpp == 24:
        pal = b""
        rows = bytearray()
        for y in range(height - 1, -1, -1):  # bottom-up
            row = bytearray()
            for x in range(width):
                r, g, b = rgb[(y * width + x) * 3 : (y * width + x) * 3 + 3]
                row += bytes((b, g, r))
            rows += row.ljust(stride, b"\x00")
    else:  # 8-bit grayscale palette
        pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
        rows = bytearray()
        for y in range(height - 1, -1, -1):
            row = bytes(rgb[(y * width + x) * 3] for x in range(width))
            rows += row.ljust(stride, b"\x00")
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(rows), 2835, 2835,
        256 if pal else 0, 0,
    )
    return hdr + dib + pal + bytes(rows)


def test_bmp_roundtrip_24bit_exact():
    rng = np.random.default_rng(7)
    w, h = 31, 14  # odd width exercises row padding
    rgb = rng.integers(0, 256, w * h * 3).astype(np.uint8).tobytes()
    gw, gh, ch, px = decode_bmp(_write_bmp(w, h, rgb))
    assert (gw, gh, ch) == (w, h, 3) and px == rgb


def test_bmp_roundtrip_8bit_palette():
    rng = np.random.default_rng(8)
    w, h = 17, 9
    gray = rng.integers(0, 256, w * h).astype(np.uint8)
    rgb = np.repeat(gray, 3).tobytes()
    gw, gh, ch, px = decode_bmp(_write_bmp(w, h, rgb, bpp=8))
    assert (gw, gh, ch) == (w, h, 3) and px == rgb


def test_netpbm_all_six_variants():
    rng = np.random.default_rng(9)
    w, h = 13, 7
    gray = rng.integers(0, 256, w * h).astype(np.uint8)
    rgb = rng.integers(0, 256, w * h * 3).astype(np.uint8)
    bits = rng.integers(0, 2, w * h).astype(np.uint8)

    # ASCII variants (with a comment line in the header)
    p1 = (f"P1\n# c\n{w} {h}\n" + " ".join(map(str, bits))).encode()
    p2 = (f"P2\n{w} {h}\n255\n" + " ".join(map(str, gray))).encode()
    p3 = (f"P3\n{w} {h}\n255\n" + " ".join(map(str, rgb))).encode()
    # raw variants
    rowbytes = (w + 7) // 8
    packed = bytearray()
    for y in range(h):
        row = 0
        for x in range(w):
            row |= int(bits[y * w + x]) << (7 - x % 8 + 8 * (rowbytes - 1 - x // 8))
        packed += row.to_bytes(rowbytes, "big")
    p4 = f"P4\n{w} {h}\n".encode() + bytes(packed)
    p5 = f"P5\n{w} {h}\n255\n".encode() + gray.tobytes()
    p6 = f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()

    bw = bytes(0 if b else 255 for b in bits)
    for blob, want, ch in (
        (p1, bw, 1),
        (p2, gray.tobytes(), 1),
        (p3, rgb.tobytes(), 3),
        (p4, bw, 1),
        (p5, gray.tobytes(), 1),
        (p6, rgb.tobytes(), 3),
    ):
        gw, gh, gch, px = decode_netpbm(blob)
        assert (gw, gh, gch) == (w, h, ch)
        assert px == want


def test_netpbm_maxval_scaling():
    data = b"P2\n2 1\n15\n0 15"
    _, _, _, px = decode_netpbm(data)
    assert px == bytes((0, 255))


def test_decode_image_routes_rasters():
    from vechord_spark.sources.multimodal import decode_image

    palette = [(255, 0, 0), (0, 255, 0)]
    gif = _write_gif(2, 1, palette, bytes((0, 1)))
    img = decode_image(gif)
    assert (img.width, img.height, img.channels) == (2, 1, 3)
    assert img.pixels == bytes((255, 0, 0, 0, 255, 0))
    ppm = b"P6\n1 1\n255\n\x01\x02\x03"
    assert decode_image(ppm).pixels == b"\x01\x02\x03"


# ---------------------------------------------------------------------------
# TIFF
# ---------------------------------------------------------------------------

from vechord_spark.sources.rasters import decode_tiff  # noqa: E402


@needs_imghdr
def test_tiff_matches_png_twin_exactly():
    w, h, ch, px = decode_tiff((_IMGHDR / "python.tiff").read_bytes())
    assert (w, h, ch) == (16, 16, 4)  # RGBA, uncompressed
    got = np.frombuffer(px, np.uint8).reshape(h, w, 4)[..., :3].astype(int)
    assert (got == _png_twin()).all()


def _tiff_lzw_encode(raw: bytes) -> bytes:
    """TIFF LZW compressor: MSB-first, CLEAR=256/EOI=257, early
    code-width change."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    cur = b""
    for b in raw:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # TIFF early change: the decoder widens after ADDING entry
        # 2^w - 2 (spec: entry 510 -> 10 bits), and the decoder's table
        # lags the encoder's by one entry, so the encoder widens after
        # ASSIGNING code 2^w - 1
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code >= (1 << 12) - 2:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _write_tiff(width, height, spp, pixels, compression=1, photometric=2,
                predictor=1, rows_per_strip=None, colormap=None):
    rows_per_strip = rows_per_strip or height
    rowbytes = width * spp
    body = bytearray(pixels)
    if predictor == 2:
        diff = bytearray(body)
        for y in range(height):
            base = y * rowbytes
            for x in range(rowbytes - 1, spp - 1, -1):
                diff[base + x] = (body[base + x] - body[base + x - spp]) & 0xFF
        body = diff
    strips = []
    for s0 in range(0, height, rows_per_strip):
        nrows = min(rows_per_strip, height - s0)
        raw = bytes(body[s0 * rowbytes : (s0 + nrows) * rowbytes])
        if compression == 5:
            strips.append(_tiff_lzw_encode(raw))
        elif compression == 32773:  # trivial PackBits: literal runs <= 128
            pb = bytearray()
            for i in range(0, len(raw), 128):
                chunk = raw[i : i + 128]
                pb += bytes([len(chunk) - 1]) + chunk
            strips.append(bytes(pb))
        else:
            strips.append(raw)
    entries = []  # (tag, type, count, value_or_offset, extra_bytes)
    extra = bytearray()
    data_start = 8

    def entry(tag, typ, vals):
        size = {3: 2, 4: 4}[typ] * len(vals)
        fmt = "<" + ("H" if typ == 3 else "I") * len(vals)
        raw = struct.pack(fmt, *vals)
        entries.append((tag, typ, len(vals), raw))

    # strip data first, then colormap, then IFD
    offsets = []
    pos = data_start
    for sdat in strips:
        offsets.append(pos)
        pos += len(sdat)
    cmap_off = pos
    cmap_vals = []
    if colormap is not None:
        ncol = len(colormap)
        cmap_vals = (
            [c[0] << 8 for c in colormap]
            + [c[1] << 8 for c in colormap]
            + [c[2] << 8 for c in colormap]
        )
        pos += 2 * len(cmap_vals)
    ifd_off = pos
    entry(256, 3, [width])
    entry(257, 3, [height])
    entry(258, 3, [8] * spp)
    entry(259, 3, [compression])
    entry(262, 3, [photometric])
    entry(273, 4, offsets)
    entry(277, 3, [spp])
    entry(278, 3, [rows_per_strip])
    entry(279, 4, [len(s) for s in strips])
    if predictor != 1:
        entry(317, 3, [predictor])
    if colormap is not None:
        entries.append((320, 3, len(cmap_vals), struct.pack("<I", cmap_off)))
    entries.sort(key=lambda e: e[0])
    # place oversized entry payloads after the IFD
    ifd_size = 2 + 12 * len(entries) + 4
    tail_off = ifd_off + ifd_size
    ifd = struct.pack("<H", len(entries))
    tail = bytearray()
    for tag, typ, cnt, raw in entries:
        if tag == 320:
            val = raw  # precomputed offset
        elif len(raw) <= 4:
            val = raw.ljust(4, b"\x00")
        else:
            val = struct.pack("<I", tail_off + len(tail))
            tail += raw
        ifd += struct.pack("<HHI", tag, typ, cnt) + val
    ifd += b"\x00\x00\x00\x00"
    out = b"II*\x00" + struct.pack("<I", ifd_off)
    out += b"".join(strips)
    if cmap_vals:
        out += struct.pack("<" + "H" * len(cmap_vals), *cmap_vals)
    out += ifd + bytes(tail)
    return out


@pytest.mark.parametrize("compression", [1, 5, 32773])
@pytest.mark.parametrize("predictor", [1, 2])
def test_tiff_roundtrip_rgb(compression, predictor):
    if compression == 32773 and predictor == 2:
        pytest.skip("predictor is an LZW/deflate companion")
    rng = np.random.default_rng(compression + predictor)
    w, h = 21, 10
    px = rng.integers(0, 256, w * h * 3).astype(np.uint8).tobytes()
    blob = _write_tiff(w, h, 3, px, compression=compression,
                       predictor=predictor if compression == 5 else 1,
                       rows_per_strip=4)
    gw, gh, ch, got = decode_tiff(blob)
    assert (gw, gh, ch) == (w, h, 3) and got == px


def test_tiff_gray_and_palette_and_white_is_zero():
    rng = np.random.default_rng(5)
    w, h = 9, 6
    gray = rng.integers(0, 256, w * h).astype(np.uint8).tobytes()
    # black-is-zero grayscale
    _, _, ch, got = decode_tiff(_write_tiff(w, h, 1, gray, photometric=1))
    assert ch == 1 and got == gray
    # white-is-zero inverts
    _, _, _, got = decode_tiff(_write_tiff(w, h, 1, gray, photometric=0))
    assert got == bytes(255 - b for b in gray)
    # palette
    cmap = [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(256)]
    _, _, ch, got = decode_tiff(
        _write_tiff(w, h, 1, gray, photometric=3, colormap=cmap)
    )
    want = b"".join(bytes(cmap[p]) for p in gray)
    assert ch == 3 and got == want


def test_tiff_probe_and_route():
    from vechord_spark.sources.multimodal import decode_image, probe_image

    blob = _write_tiff(4, 3, 3, bytes(range(36)))
    assert probe_image(blob) == ("tiff", 4, 3)
    img = decode_image(blob)
    assert (img.width, img.height, img.channels) == (4, 3, 3)
    assert img.pixels == bytes(range(36))


# ---------------------------------------------------------------------------
# Sun Raster / SGI / XBM
# ---------------------------------------------------------------------------

from vechord_spark.sources.rasters import (  # noqa: E402
    decode_ras,
    decode_sgi,
    decode_xbm,
)


@needs_imghdr
def test_ras_matches_png_twin_exactly():
    w, h, ch, px = decode_ras((_IMGHDR / "python.ras").read_bytes())
    assert (w, h, ch) == (16, 16, 3)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(int)
    assert (got == _png_twin()).all()


@needs_imghdr
def test_sgi_matches_png_twin_exactly():
    w, h, ch, px = decode_sgi((_IMGHDR / "python.sgi").read_bytes())
    assert (w, h, ch) == (16, 16, 4)  # RGBA, RLE storage
    got = np.frombuffer(px, np.uint8).reshape(h, w, 4)[..., :3].astype(int)
    assert (got == _png_twin()).all()


@needs_imghdr
def test_xbm_decodes_bilevel():
    w, h, ch, px = decode_xbm((_IMGHDR / "python.xbm").read_bytes())
    assert (w, h, ch) == (16, 16, 1)
    assert set(px) <= {0, 255}


def test_ras_roundtrip_synthetic():
    """Writer-side Sun Raster: standard 24-bit BGR and byte-RLE."""
    rng = np.random.default_rng(17)
    w, h = 11, 5
    rgb = rng.integers(0, 256, w * h * 3).astype(np.uint8).tobytes()
    rowbytes = (w * 3 + 1) & ~1
    body = bytearray()
    for y in range(h):
        row = bytearray()
        for x in range(w):
            r, g, b = rgb[(y * w + x) * 3 : (y * w + x) * 3 + 3]
            row += bytes((b, g, r))
        body += row.ljust(rowbytes, b"\x00")
    hdr = struct.pack(">8I", 0x59A66A95, w, h, 24, len(body), 1, 0, 0)
    gw, gh, ch, px = decode_ras(hdr + bytes(body))
    assert (gw, gh, ch) == (w, h, 3) and px == rgb
    # RLE variant: encode with the trivial no-run form (literal bytes,
    # 0x80 escaped) — decoder must unescape exactly
    rle = bytearray()
    for bb in bytes(body):
        if bb == 0x80:
            rle += b"\x80\x00"
        else:
            rle.append(bb)
    hdr2 = struct.pack(">8I", 0x59A66A95, w, h, 24, len(rle), 2, 0, 0)
    gw, gh, ch, px = decode_ras(hdr2 + bytes(rle))
    assert px == rgb
    # and a real run: 20 identical bytes compress to one triple
    flat = bytes([7]) * (rowbytes * h)
    runs = bytearray()
    left = len(flat)
    while left:
        n = min(256, left)
        runs += bytes((0x80, n - 1, 7))
        left -= n
    hdr3 = struct.pack(">8I", 0x59A66A95, w, h, 24, len(runs), 2, 0, 0)
    _, _, _, px = decode_ras(hdr3 + bytes(runs))
    assert px == bytes([7]) * (w * h * 3)


def test_sgi_roundtrip_verbatim():
    rng = np.random.default_rng(18)
    w, h, z = 9, 6, 3
    rgb = rng.integers(0, 256, w * h * z).astype(np.uint8)
    hdr = struct.pack(">hBBHHHH", 474, 0, 1, 3, w, h, z) + b"\x00" * 500
    planes = bytearray()
    for c in range(z):
        for y in range(h):
            sy = h - 1 - y  # file stores bottom-up
            planes += bytes(rgb[(sy * w + x) * z + c] for x in range(w))
    gw, gh, ch, px = decode_sgi(bytes(hdr) + bytes(planes))
    assert (gw, gh, ch) == (w, h, 3) and px == rgb.tobytes()


def test_xbm_roundtrip_synthetic():
    bits = [0b00000001, 0b10000000, 0b11111111]  # 3 rows of width 8
    src = (
        "#define t_width 8\n#define t_height 3\n"
        "static char t_bits[] = {" + ", ".join(hex(b) for b in bits) + "};\n"
    ).encode()
    w, h, ch, px = decode_xbm(src)
    assert (w, h, ch) == (8, 3, 1)
    rows = [px[i * 8 : (i + 1) * 8] for i in range(3)]
    assert rows[0] == bytes((0, 255, 255, 255, 255, 255, 255, 255))
    assert rows[1] == bytes((255,) * 7 + (0,))
    assert rows[2] == bytes((0,) * 8)


def test_probe_and_route_ras_sgi_xbm():
    from vechord_spark.sources.multimodal import decode_image, probe_image

    hdr = struct.pack(">8I", 0x59A66A95, 4, 2, 24, 16, 1, 0, 0)
    body = bytes(range(24)) + b"\x00" * 0
    rows = bytearray()
    for y in range(2):
        rows += body[y * 12 : (y + 1) * 12]
    ras = hdr + bytes(rows)
    assert probe_image(ras) == ("ras", 4, 2)
    assert decode_image(ras).channels == 3
    sgi = struct.pack(">hBBHHHH", 474, 0, 1, 3, 2, 2, 1) + b"\x00" * 500 + bytes(4)
    assert probe_image(sgi) == ("sgi", 2, 2)
    assert decode_image(sgi).channels == 1
    xbm = b"#define a_width 8\n#define a_height 1\nstatic char a_bits[] = {0x0f};"
    assert probe_image(xbm) == ("xbm", 8, 1)
    assert decode_image(xbm).pixels == bytes((0, 0, 0, 0, 255, 255, 255, 255))


def test_bmp_bitfields_masks():
    """BI_BITFIELDS 32-bit: the standard BGRA mask layout decodes;
    any other mask layout must raise, never silently misdecode."""
    import struct as _s

    def bmp32(masks):
        w, h = 2, 1
        rows = bytes((3, 2, 1, 0, 6, 5, 4, 0))  # two BGRA pixels
        off = 14 + 40 + 12
        hdr = b"BM" + _s.pack("<IHHI", off + len(rows), 0, 0, off)
        dib = _s.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 3, len(rows), 0, 0, 0, 0)
        return hdr + dib + _s.pack("<III", *masks) + rows

    std = bmp32((0x00FF0000, 0x0000FF00, 0x000000FF))
    w, h, ch, px = decode_bmp(std)
    assert (w, h, ch) == (2, 1, 3) and px == bytes((1, 2, 3, 4, 5, 6))
    with pytest.raises(NotImplementedError):
        decode_bmp(bmp32((0x000000FF, 0x0000FF00, 0x00FF0000)))  # RGBA order


# ---------------------------------------------------------------------------
# Animated GIF: compositing + frame sampling
# ---------------------------------------------------------------------------

from vechord_spark.sources.rasters import gif_frames  # noqa: E402


def _write_animated_gif(width, height, palette, frames, bg=0):
    """``frames``: list of dicts with keys idx (full-canvas or rect
    indices), rect (left, top, w, h), delay_cs, transparent (index or
    None), disposal. ``bg``: logical-screen background color index."""
    bits = max(1, (len(palette) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), bg, 0)
    out += b"".join(bytes(c) for c in palette).ljust((2 << (bits - 1)) * 3, b"\x00")
    min_code = max(2, bits)
    for f in frames:
        left, top, w, h = f.get("rect", (0, 0, width, height))
        gflags = (f.get("disposal", 0) << 2) | (
            1 if f.get("transparent") is not None else 0
        )
        out += b"\x21\xf9\x04" + bytes(
            (gflags,)
        ) + struct.pack("<H", f.get("delay_cs", 0)) + bytes(
            (f.get("transparent") or 0,)
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, bytes(f["idx"]))
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_animation_compositing():
    """Transparency keeps the previous canvas; disposal 2 clears the
    frame rect; disposal 3 restores the pre-frame canvas."""
    pal = [(10, 10, 10), (200, 0, 0), (0, 200, 0), (0, 0, 200)]
    w = h = 4
    base = bytes([1] * 16)  # all red
    # frame 2: a 2x2 green patch at (1,1), transparent elsewhere-in-rect
    patch = bytes([2, 0, 0, 2])  # transparent=0 -> diagonal green
    # frame 3 (after disposal 3 on frame 2): full blue
    blue = bytes([3] * 16)
    data = _write_animated_gif(w, h, pal, [
        {"idx": base, "delay_cs": 5},
        {"idx": patch, "rect": (1, 1, 2, 2), "delay_cs": 10,
         "transparent": 0, "disposal": 3},
        {"idx": blue, "delay_cs": 5},
    ])
    gw, gh, frames = gif_frames(data)
    assert (gw, gh) == (w, h) and len(frames) == 3
    assert frames[0] == (50, bytes(bytearray(b"".join([bytes(pal[1])] * 16))))
    f1 = np.frombuffer(frames[1][1], np.uint8).reshape(h, w, 3)
    assert frames[1][0] == 100
    assert tuple(f1[1, 1]) == pal[2] and tuple(f1[2, 2]) == pal[2]  # drawn
    assert tuple(f1[1, 2]) == pal[1] and tuple(f1[2, 1]) == pal[1]  # kept
    # disposal 3 restored all-red before frame 3 drew all-blue
    f2 = np.frombuffer(frames[2][1], np.uint8).reshape(h, w, 3)
    assert (f2 == np.array(pal[3])).all()


def test_gif_disposal_background_clears_rect():
    """Disposal 2 restores to the logical-screen BACKGROUND COLOR
    (global-palette RGB of the header's bg index — here pal[0]), not
    to black (ADVICE r9)."""
    pal = [(9, 9, 9), (255, 255, 255)]
    data = _write_animated_gif(2, 2, pal, [
        {"idx": bytes([1, 1, 1, 1]), "disposal": 2, "delay_cs": 1},
        {"idx": bytes([1]), "rect": (0, 0, 1, 1), "delay_cs": 1},
    ])
    _, _, frames = gif_frames(data)
    f1 = np.frombuffer(frames[1][1], np.uint8).reshape(2, 2, 3)
    assert tuple(f1[0, 0]) == pal[1]  # redrawn
    assert tuple(f1[1, 1]) == pal[0]  # cleared to background color


def test_gif_disposal_background_nonzero_index():
    """Non-zero bg index resolves through the global palette; an
    out-of-range index falls back to black instead of raising."""
    pal = [(1, 2, 3), (255, 255, 255), (40, 80, 120), (7, 7, 7)]
    data = _write_animated_gif(2, 2, pal, [
        {"idx": bytes([1, 1, 1, 1]), "disposal": 2, "delay_cs": 1},
        {"idx": bytes([1]), "rect": (0, 0, 1, 1), "delay_cs": 1},
    ], bg=2)
    _, _, frames = gif_frames(data)
    f1 = np.frombuffer(frames[1][1], np.uint8).reshape(2, 2, 3)
    assert tuple(f1[1, 0]) == pal[2]
    # bg index beyond the written palette entries -> black fallback
    # (palette is padded to a power of two with zeros, so use an index
    # past the PADDED table by keeping the palette maximal)
    pal4 = [(5, 5, 5)] * 4
    data2 = _write_animated_gif(2, 2, pal4, [
        {"idx": bytes([1, 1, 1, 1]), "disposal": 2, "delay_cs": 1},
        {"idx": bytes([1]), "rect": (0, 0, 1, 1), "delay_cs": 1},
    ], bg=200)
    _, _, frames2 = gif_frames(data2)
    f2 = np.frombuffer(frames2[1][1], np.uint8).reshape(2, 2, 3)
    assert tuple(f2[1, 0]) == (0, 0, 0)


def test_sample_video_frames_animated_gif():
    from vechord_spark.sources.multimodal import decode_image, sample_video_frames

    pal = [(i, i, i) for i in range(8)]
    # 6 frames, 80 ms each
    data = _write_animated_gif(3, 3, pal, [
        {"idx": bytes([i] * 9), "delay_cs": 8} for i in range(6)
    ])
    kept = sample_video_frames(data, 200)  # keep t=0, 240, 480 -> frames 0, 3, 6->last
    assert len(kept) == 3
    imgs = [decode_image(k) for k in kept]
    assert all((im.width, im.height, im.channels) == (3, 3, 3) for im in imgs)
    assert imgs[0].pixels == bytes([0] * 27)
    assert imgs[1].pixels == bytes([3] * 27)
    assert imgs[2].pixels == bytes([5] * 27)
    # every_ms <= 0 keeps all frames
    assert len(sample_video_frames(data, 0)) == 6


# ---------------------------------------------------------------------------
# Dirty-corpus contract: corrupt bytes -> ValueError/NotImplementedError
# ---------------------------------------------------------------------------


def test_corrupt_streams_raise_only_decode_errors():
    """Truncations, byte flips, and garbage splices over every format
    must surface as ValueError or NotImplementedError — never a stray
    IndexError/struct.error (which would escape probe_media's per-row
    net) — and must fail fast (no multi-GB allocations from corrupt
    headers; see rasters.MAX_PIXELS)."""
    import random

    from vechord_spark.sources.jpeg import encode_jpeg
    from vechord_spark.sources.multimodal import (
        DecodedImage,
        _png_encode,
        decode_image,
        probe_image,
    )

    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, 16 * 12 * 3).astype(np.uint8).tobytes()
    seeds = {
        "jpeg": encode_jpeg(16, 12, 3, px),
        "png": _png_encode(DecodedImage(16, 12, 3, px)),
        "gif": _write_gif(
            16, 12, [(i, i, i) for i in range(16)],
            rng.integers(0, 16, 192).astype(np.uint8).tobytes(),
        ),
        "bmp": _write_bmp(16, 12, px),
        "tiff": _write_tiff(16, 12, 3, px, compression=5, predictor=2),
        "ppm": b"P6\n16 12\n255\n" + px,
    }
    random.seed(1)
    for name, blob in seeds.items():
        for trial in range(60):
            b = bytearray(blob)
            op = trial % 3
            if op == 0:
                b = b[: random.randrange(1, len(b))]
            elif op == 1:
                for _ in range(random.randrange(1, 8)):
                    b[random.randrange(len(b))] = random.randrange(256)
            else:
                i = random.randrange(len(b))
                b[i:i] = bytes(
                    random.randrange(256) for _ in range(random.randrange(1, 16))
                )
            for fn in (decode_image, probe_image):
                try:
                    fn(bytes(b))
                except (ValueError, NotImplementedError):
                    pass  # the two classes the dirty-corpus nets catch


def test_hostile_dimensions_rejected_before_allocation():
    from vechord_spark.sources.rasters import check_dims

    with pytest.raises(ValueError):
        check_dims(65535, 65535)
    with pytest.raises(ValueError):
        check_dims(0, 5)
    # a GIF header claiming a 65535x65535 canvas fails fast
    giant = b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0) + b"\x3b"
    from vechord_spark.sources.rasters import gif_frames

    with pytest.raises(ValueError):
        gif_frames(giant)


def test_tiff_lzw_dictionary_pressure():
    """Incompressible data pushes the LZW table across every width
    boundary (the TIFF early change: widen after entry 2^w - 2) and
    through a mid-stream CLEAR reset — the round-trip must be exact at
    the exact boundary lengths and far beyond them."""
    from vechord_spark.sources.rasters import _tiff_lzw

    raw_full = np.random.default_rng(1).integers(0, 256, 12000).astype(
        np.uint8
    ).tobytes()
    for n in (253, 254, 255, 765, 766, 767, 1789, 1790, 1791, 3837, 3838,
              3839, 5000, 12000):
        raw = raw_full[:n]
        enc = _tiff_lzw_encode(raw)
        assert bytes(_tiff_lzw(enc, len(raw))) == raw, n


# ---------------------------------------------------------------------------
# Review-pass regressions and hazards (round 9b)
# ---------------------------------------------------------------------------


def test_gif_frame_volume_capped():
    """A tiny hostile GIF (large screen + many 1x1 frames) must raise,
    not accumulate unbounded full-canvas frames."""
    pal = [(0, 0, 0), (255, 255, 255)]
    frames = [{"idx": bytes([1]), "rect": (0, 0, 1, 1)} for _ in range(600)]
    data = _write_animated_gif(4096, 4096, pal, frames)
    assert len(data) < 20_000  # the attack is small...
    with pytest.raises(ValueError):
        gif_frames(data)  # ...the output would not be


def test_gif_transparent_index_outside_palette_still_decodes():
    """Quirky-but-renderable: the transparent index may lie outside the
    palette (it never does a lookup)."""
    pal = [(1, 1, 1), (2, 2, 2)]
    data = _write_animated_gif(2, 1, pal, [
        {"idx": bytes([0, 0])},  # canvas becomes palette[0]
        {"idx": bytes([3, 1]), "transparent": 3},  # 3 >= len(pal)
    ])
    _, _, frames = gif_frames(data)
    assert frames[1][1] == bytes((1, 1, 1, 2, 2, 2))  # kept, drawn


def test_netpbm_zero_maxval_raises_value_error():
    with pytest.raises(ValueError):
        decode_netpbm(b"P2\n1 1\n0\n5")


def test_netpbm_p1_unseparated_digits():
    """PBM ASCII pixels need no whitespace separators (spec)."""
    w, h, ch, px = decode_netpbm(b"P1\n2 2\n01\n10\n")
    assert (w, h, ch) == (2, 2, 1)
    assert px == bytes((255, 0, 0, 255))


def test_bmp_missing_final_row_padding_decodes():
    """Writers that omit the last row's 4-byte alignment padding are a
    known in-the-wild quirk."""
    rng = np.random.default_rng(3)
    w, h = 3, 2  # stride 12 vs 9 payload bytes per row
    rgb = rng.integers(0, 256, w * h * 3).astype(np.uint8).tobytes()
    full = _write_bmp(w, h, rgb)
    clipped = full[:-3]  # drop the final row's padding
    gw, gh, ch, px = decode_bmp(clipped)
    assert (gw, gh, ch) == (w, h, 3) and px == rgb


def test_tiff_rejects_cmyk_ycbcr_photometrics():
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, 4 * 2 * 3).astype(np.uint8).tobytes()
    for photometric in (5, 6):
        with pytest.raises(NotImplementedError):
            decode_tiff(_write_tiff(4, 2, 3, px, photometric=photometric))


def test_corrupt_animated_gif_in_video_path_raises_value_error():
    from vechord_spark.sources.multimodal import sample_video_frames

    pal = [(0, 0, 0), (9, 9, 9)]
    data = _write_animated_gif(4, 4, pal, [{"idx": bytes([1] * 16)}] * 3)
    truncated = data[: len(data) - 7]
    with pytest.raises((ValueError, NotImplementedError)):
        sample_video_frames(truncated, 100)
