"""Pure-Python + numpy JPEG codec (ITU-T T.81 / JFIF).

The multimodal path (sources/multimodal.py) treated JPEG as an honest
``NotImplementedError`` stub because the container ships no Pillow;
this module implements the DCT processes directly from the public spec
so JPEG-heavy corpora decode with zero optional dependencies: marker
walk (DQT/DHT/SOF0/SOF1/SOF2/DRI/SOS), byte-stuffed Huffman entropy
decode with restart markers, dequantize -> 8x8 IDCT (one numpy matmul
pair per block), nearest-neighbor chroma upsampling, JFIF YCbCr -> RGB.
Progressive (SOF2, T.81 Annex G: spectral selection + successive
approximation, EOB runs) accumulates scans into coefficient buffers
and reconstructs once at EOI — common in crawl data (~10% of web
JPEGs). Arithmetic coding and hierarchical/lossless processes are out
of scope and raise ``NotImplementedError`` (rare; the probe_image
header walk still reports their dimensions).

The encoder emits baseline 4:4:4 with the spec's example quantization
and Huffman tables (T.81 Annex K) — enough to produce real fixtures
for round-trip tests and thumbnails for sinks, not a rate-optimized
writer.

Scale shape: decode runs inside the existing mapInPandas media stages
(multimodal.extract_media_features); one image never crosses a
partition, so the codec's cost profile is per-row CPU, exactly like
the PNG path above it.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

# Zigzag order from T.81 Figure A.6 (index i holds the raster position
# of the i-th zigzag coefficient).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# 8x8 DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1)u*pi/16);
# IDCT(block) = M.T @ coeffs @ M, DCT(block) = M @ pixels @ M.T.
def _dct_matrix() -> np.ndarray:
    u = np.arange(8).reshape(-1, 1)
    x = np.arange(8).reshape(1, -1)
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    m[0, :] /= np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()

# T.81 Annex K.1 example quantization tables (luminance, chrominance),
# in zigzag order as they appear in a DQT segment.
K1_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
K1_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# T.81 Annex K.3 example Huffman tables: (bits[1..16], huffval).
K3_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
K3_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


class _HuffTable:
    """Canonical Huffman table with a 16-bit peek LUT: one lookup per
    symbol instead of a bit-by-bit tree walk. ``build_lut=False`` skips
    the two 65536-entry decoder arrays for encoder-only use (the
    encoder reads nothing but ``enc``)."""

    def __init__(self, bits, huffval, build_lut=True):
        if build_lut:
            self.lut_value = np.zeros(1 << 16, dtype=np.int16)
            self.lut_size = np.zeros(1 << 16, dtype=np.int8)
            code = 0
            k = 0
            for length in range(1, 17):
                for _ in range(bits[length - 1]):
                    val = huffval[k]
                    k += 1
                    lo = code << (16 - length)
                    hi = lo + (1 << (16 - length))
                    self.lut_value[lo:hi] = val
                    self.lut_size[lo:hi] = length
                    code += 1
                code <<= 1
        # encoder side: symbol -> (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.enc[huffval[k]] = (code, length)
                k += 1
                code += 1
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader: un-stuffs FF 00, stops at markers
    (restarts are consumed explicitly via ``restart``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 48:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) & ((1 << 56) - 1)
                self.nbits += 8  # pad past EOF with zeros (spec 0xFF pad tolerated)
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: pad until consumed by restart()
                    self.acc = (self.acc << 8) & ((1 << 56) - 1)
                    self.nbits += 8
                    continue
                else:  # EOI / next segment: pad
                    self.acc = (self.acc << 8) & ((1 << 56) - 1)
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & ((1 << 56) - 1)
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 sign extension of a t-bit magnitude."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


@dataclass
class _Component:
    cid: int
    h: int
    v: int
    tq: int
    td: int = 0
    ta: int = 0


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode baseline or progressive JPEG -> ``(width, height,
    channels, rgb_bytes)`` (channels 1 for grayscale, 3 for
    YCbCr->RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    progressive = False
    prog: _ProgressiveState | None = None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional fill bytes
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq_id = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                raster = np.zeros(64, dtype=np.int32)
                raster[ZIGZAG] = tbl
                qt[tq_id] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                huffval = list(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, huffval)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if seg[0] != 8:
                # 12-bit extended sequential is legal under SOF1; the
                # 8-bit level shift would decode it to silent garbage
                raise NotImplementedError(
                    f"JPEG sample precision {seg[0]} unsupported (8 only)"
                )
            progressive = marker == 0xC2
            height, width = struct.unpack(">HH", seg[1:5])
            from vechord_spark.sources.rasters import check_dims

            check_dims(width, height, "JPEG")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                # 4-component Adobe CMYK/YCCK would "decode" to garbage
                # RGB with a silently-dropped K channel
                raise NotImplementedError(
                    f"JPEG with {ncomp} components unsupported (1 or 3)"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq_id = seg[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise ValueError(f"bad JPEG sampling factors {h}x{v}")
                comps.append(_Component(cid, h, v, tq_id))
            if ncomp == 1:
                # a single-component scan is non-interleaved (T.81
                # A.2.3): the block grid is ceil(size/8) regardless of
                # the declared sampling factors, which affect nothing
                # else in a one-plane image
                comps[0].h = comps[0].v = 1
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG process SOF{marker - 0xC0} unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS: selectors then entropy data
            ns = seg[0]
            sel = {seg[1 + 2 * j]: seg[2 + 2 * j] for j in range(ns)}
            for c in comps:
                if c.cid in sel:
                    c.td, c.ta = sel[c.cid] >> 4, sel[c.cid] & 0x0F
            scan_start = pos + 2 + seglen
            if not progressive:
                if ns != len(comps):
                    # a sequential scan covering a component subset
                    # (multi-SOS baseline) would decode every
                    # component from one component's entropy data
                    raise NotImplementedError(
                        "multi-scan sequential JPEG unsupported"
                    )
                prog = _ProgressiveState(width, height, comps)
                _decode_baseline_scan(
                    data, scan_start, prog, comps, huff, restart_interval
                )
                return _reconstruct_progressive(prog, comps, qt, width, height)
            if prog is None:
                prog = _ProgressiveState(width, height, comps)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            scan_comps = [c for c in comps if c.cid in sel]
            pos = _decode_progressive_scan(
                data, scan_start, prog, scan_comps, ss, se, a >> 4, a & 0x0F,
                huff, restart_interval,
            )
            continue
        pos += 2 + seglen
    if prog is not None:
        return _reconstruct_progressive(prog, comps, qt, width, height)
    raise ValueError("JPEG stream without an SOS scan")


def _decode_baseline_scan(data, pos, prog, comps, huff, restart_interval):
    """Entropy-decode one fully-interleaved sequential scan into
    ``prog.coef`` (zigzag order); the vectorized
    ``_reconstruct_progressive`` tail does dequantize + IDCT + assembly
    for both processes (one einsum per component, not two matmuls and
    three allocations per block)."""
    reader = _BitReader(data, pos)
    pred = {c.cid: 0 for c in comps}
    n_mcu = 0
    for my in range(prog.mcuy):
        for mx in range(prog.mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.restart()
                pred = {c.cid: 0 for c in comps}
            n_mcu += 1
            for c in comps:
                dc_t = huff[(0, c.td)]
                ac_t = huff[(1, c.ta)]
                for by in range(c.v):
                    for bx in range(c.h):
                        zz = prog.coef[c.cid][my * c.v + by, mx * c.h + bx]
                        p16 = reader.peek16()
                        t = int(dc_t.lut_value[p16])
                        size = int(dc_t.lut_size[p16])
                        if size == 0:
                            raise ValueError("invalid DC Huffman code")
                        reader.skip(size)
                        diff = _extend(reader.receive(t), t)
                        pred[c.cid] += diff
                        zz[0] = pred[c.cid]
                        k = 1
                        while k < 64:
                            p16 = reader.peek16()
                            rs = int(ac_t.lut_value[p16])
                            size = int(ac_t.lut_size[p16])
                            if size == 0:
                                raise ValueError("invalid AC Huffman code")
                            reader.skip(size)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1


def _planes_to_pixels(comps, planes, hmax, vmax, width, height):
    """Upsample to full resolution (nearest; spec leaves the filter
    open), crop to the frame, and color-convert (JFIF YCbCr->RGB)."""
    full = []
    for c in comps:
        p = planes[c.cid]
        if c.h != hmax or c.v != vmax:
            p = np.repeat(np.repeat(p, vmax // c.v, axis=0), hmax // c.h, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        out = np.clip(full[0], 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    return width, height, 3, rgb.tobytes()


# --------------------------------------------------------------------------
# Progressive decoding (T.81 Annex G, Huffman): each SOS carries one
# (spectral band, approximation bit) slice of the DCT coefficients; the
# scans accumulate into per-component coefficient buffers and the image
# reconstructs once, at EOI.
# --------------------------------------------------------------------------


class _ProgressiveState:
    """Per-component DCT coefficient buffers (zigzag order) plus the
    block geometry both scan kinds need: interleaved DC scans walk the
    MCU-padded grid, non-interleaved scans walk the component's own
    ceil(size/8) grid (T.81 A.2.2)."""

    def __init__(self, width, height, comps):
        self.hmax = max(c.h for c in comps)
        self.vmax = max(c.v for c in comps)
        self.mcux = -(-width // (8 * self.hmax))
        self.mcuy = -(-height // (8 * self.vmax))
        self.coef: dict[int, np.ndarray] = {}
        self.nblocks: dict[int, tuple[int, int]] = {}
        for c in comps:
            bh_pad = self.mcuy * c.v
            bw_pad = self.mcux * c.h
            self.coef[c.cid] = np.zeros((bh_pad, bw_pad, 64), dtype=np.int32)
            cw = -(-width * c.h // self.hmax)
            ch = -(-height * c.v // self.vmax)
            self.nblocks[c.cid] = (-(-ch // 8), -(-cw // 8))


def _huff_decode(reader, table):
    p16 = reader.peek16()
    size = int(table.lut_size[p16])
    if size == 0:
        raise ValueError("invalid Huffman code in progressive scan")
    reader.skip(size)
    return int(table.lut_value[p16])


def _decode_progressive_scan(
    data, pos, prog, scan_comps, ss, se, ah, al, huff, restart_interval
):
    """Decode one progressive SOS into ``prog.coef``; returns the
    offset of the marker that follows the entropy-coded segment."""
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC bands")
    if ss > 0 and len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    reader = _BitReader(data, pos)
    if ss == 0:
        _scan_dc(reader, prog, scan_comps, ah, al, huff, restart_interval)
    else:
        _scan_ac(reader, prog, scan_comps[0], ss, se, ah, al, huff,
                 restart_interval)
    # the entropy segment ends at the first real marker (stuffed FF 00
    # and RSTn belong to the segment); the bit reader may have peeked
    # past it, so re-find it by byte scan from the segment start
    i = pos
    while i + 1 < len(data):
        if data[i] == 0xFF and data[i + 1] != 0x00 and not (
            0xD0 <= data[i + 1] <= 0xD7
        ):
            return i
        i += 1
    return len(data)


def _scan_dc(reader, prog, scan_comps, ah, al, huff, restart_interval):
    pred = {c.cid: 0 for c in scan_comps}
    n_units = 0

    def unit(c, by, bx):
        blk = prog.coef[c.cid][by, bx]
        if ah == 0:  # first pass: Huffman diffs in the >>al domain
            t = _huff_decode(reader, huff[(0, c.td)])
            pred[c.cid] += _extend(reader.receive(t), t)
            blk[0] = pred[c.cid] << al
        else:  # refinement: one correction bit per block
            if reader.receive(1):
                blk[0] |= 1 << al

    if len(scan_comps) > 1:  # interleaved: MCU order
        for my in range(prog.mcuy):
            for mx in range(prog.mcux):
                if restart_interval and n_units and n_units % restart_interval == 0:
                    reader.restart()
                    pred.update((c.cid, 0) for c in scan_comps)
                n_units += 1
                for c in scan_comps:
                    for by in range(c.v):
                        for bx in range(c.h):
                            unit(c, my * c.v + by, mx * c.h + bx)
    else:  # non-interleaved: the component's own block grid
        c = scan_comps[0]
        bh, bw = prog.nblocks[c.cid]
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and n_units and n_units % restart_interval == 0:
                    reader.restart()
                    pred[c.cid] = 0
                n_units += 1
                unit(c, by, bx)


def _scan_ac(reader, prog, c, ss, se, ah, al, huff, restart_interval):
    table = huff[(1, c.ta)]
    bh, bw = prog.nblocks[c.cid]
    eobrun = 0
    n_units = 0
    p1 = 1 << al
    m1 = -1 << al
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and n_units and n_units % restart_interval == 0:
                reader.restart()
                eobrun = 0
            n_units += 1
            blk = prog.coef[c.cid][by, bx]
            if ah == 0:  # first pass (G.1.2.2)
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(reader, table)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past band end")
                    blk[k] = _extend(reader.receive(s), s) << al
                    k += 1
            else:  # refinement pass (G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff_decode(reader, table)
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r < 15:
                                # unlike the first pass, the run COUNTS
                                # the current block: its band tail still
                                # needs correction bits, so it is
                                # processed under the eobrun branch
                                # below and decremented there
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.receive(r)
                                break
                            # r == 15: skip 16 zero-history positions
                        else:
                            if s != 1:
                                raise ValueError(
                                    "AC refinement magnitude must be 1"
                                )
                            newval = p1 if reader.receive(1) else m1
                        # advance past r zero-history coefficients,
                        # emitting correction bits for nonzero ones
                        while k <= se:
                            if blk[k]:
                                if reader.receive(1) and not (blk[k] & p1):
                                    blk[k] += p1 if blk[k] > 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            blk[k] = newval
                        k += 1
                if eobrun:
                    # EOB: correction bits only, for the band remainder
                    while k <= se:
                        if blk[k]:
                            if reader.receive(1) and not (blk[k] & p1):
                                blk[k] += p1 if blk[k] > 0 else m1
                        k += 1
                    eobrun -= 1


def _reconstruct_progressive(prog, comps, qt, width, height):
    """Dequantize + IDCT every accumulated block (one vectorized einsum
    per component) and hand the planes to the shared assembly tail."""
    mt = _DCT_M
    planes = {}
    for c in comps:
        coef = prog.coef[c.cid].astype(np.float64)  # (bh, bw, 64) zigzag
        bh, bw = coef.shape[:2]
        blocks = np.zeros((bh, bw, 64), dtype=np.float64)
        blocks[:, :, ZIGZAG] = coef
        blocks = blocks.reshape(bh, bw, 8, 8) * qt[c.tq]
        pix = np.einsum("ij,yxjk,kl->yxil", mt.T, blocks, mt) + 128.0
        planes[c.cid] = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _planes_to_pixels(comps, planes, prog.hmax, prog.vmax, width, height)


# --------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, Annex K tables) — fixture/thumbnail writer.
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode raw 8-bit pixels (RGB or grayscale, row-major) as a
    baseline 4:4:4 JFIF JPEG with the T.81 Annex K example tables."""
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels == 3:
        rf, gf, bf = (arr[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        planes = [y, cb, cr]
        qids = [0, 1, 1]
        hids = [0, 1, 1]
    elif channels == 1:
        planes = [arr[..., 0].astype(np.float64)]
        qids = [0]
        hids = [0]
    else:
        raise ValueError(f"channels must be 1 or 3, got {channels}")

    q_raster = []
    for zz in (K1_LUMA, K1_CHROMA)[: max(qids) + 1]:
        r = np.zeros(64, dtype=np.int32)
        r[ZIGZAG] = zz
        q_raster.append(r.reshape(8, 8))
    dc_tabs = [
        _HuffTable(*K3_DC_LUMA, build_lut=False),
        _HuffTable(*K3_DC_CHROMA, build_lut=False),
    ]
    ac_tabs = [
        _HuffTable(*K3_AC_LUMA, build_lut=False),
        _HuffTable(*K3_AC_CHROMA, build_lut=False),
    ]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for i, zz in enumerate((K1_LUMA, K1_CHROMA)[: max(qids) + 1]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([i]) + bytes(int(x) for x in zz)
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x11, qids[i]])
    for i, (bits, vals) in enumerate((K3_DC_LUMA, K3_DC_CHROMA)[: max(hids) + 1]):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([i]) + bytes(bits) + bytes(vals)
    for i, (bits, vals) in enumerate((K3_AC_LUMA, K3_AC_CHROMA)[: max(hids) + 1]):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([0x10 | i]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, (hids[i] << 4) | hids[i]])
    out += b"\x00\x3f\x00"

    w = _BitWriter()
    mt = _DCT_M
    by_max = -(-height // 8)
    bx_max = -(-width // 8)
    pred = [0] * ncomp
    for by in range(by_max):
        for bx in range(bx_max):
            for ci, plane in enumerate(planes):
                blk = np.full((8, 8), 128.0)
                ys = min(8, height - by * 8)
                xs = min(8, width - bx * 8)
                blk[:ys, :xs] = plane[by * 8 : by * 8 + ys, bx * 8 : bx * 8 + xs]
                # edge replicate so padded blocks don't ring
                if ys < 8:
                    blk[ys:, :xs] = blk[ys - 1, :xs]
                if xs < 8:
                    blk[:, xs:] = blk[:, xs - 1 : xs]
                coeffs = mt @ (blk - 128.0) @ mt.T
                qz = np.round(coeffs / q_raster[qids[ci]]).astype(np.int32)
                zz = qz.reshape(-1)[ZIGZAG]
                dc_tab, ac_tab = dc_tabs[hids[ci]], ac_tabs[hids[ci]]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = _csize(diff)
                code, length = dc_tab.enc[t]
                w.write(code, length)
                if t:
                    w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                last_nz = np.nonzero(zz[1:])[0]
                last = int(last_nz[-1]) + 1 if len(last_nz) else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_tab.enc[0xF0]  # ZRL
                        w.write(code, length)
                        run -= 16
                    s = _csize(v)
                    code, length = ac_tab.enc[(run << 4) | s]
                    w.write(code, length)
                    w.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    code, length = ac_tab.enc[0x00]  # EOB
                    w.write(code, length)
    w.flush()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)
