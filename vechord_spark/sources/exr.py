"""OpenEXR scanline decoder — dependency-free, from the public OpenEXR
file-format documentation (openexr.com "Technical Introduction" and
the ILM format spec).

Round-10 scope: single-part scanline images, channel types half/
float/uint, compressions NONE, RLE, ZIPS (1 line) and ZIP (16 lines)
— the formats a crawl corpus's EXRs overwhelmingly use and everything
CPython's imghdrdata file needs. Tiled, deep, multi-part, PIZ/PXR24/
B44/DWA stay honestly gated with named NotImplementedErrors (wavelet/
DCT codecs are real DSP work).

Output contract: ``decode_exr`` maps to the engine's 8-bit
``(w, h, channels, bytes)`` tuple with a documented CLAMP-LINEAR
transfer (clip [0, 1], scale 255 — EXR is linear-light HDR; no tone
mapping is invented here). ``decode_exr_planes`` exposes the raw
float32 planes for pipeline stages that want real values.

Hostile-input posture matches the other codecs: bounds-checked reads,
MAX_PIXELS dimension cap, attribute/channel-count caps, ValueError
(never IndexError/struct.error) on malformed streams. Validation:
spec-side writers for every supported compression in
tests/test_exr.py, plus CPython's real python.exr — whose alpha
channel is cross-checked bit-exactly against the SAME logo's alpha
decoded by the independent VP8L/ALPH path from python.webp.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from vechord_spark.sources.rasters import check_dims

MAGIC = 0x01312F76

_PIXEL_TYPES = {0: ("uint", 4), 1: ("half", 2), 2: ("float", 4)}
_NP_DTYPES = {0: "<u4", 1: "<f2", 2: "<f4"}

_MAX_ATTRS = 256
_MAX_CHANNELS = 64


def _cstr(data: bytes, pos: int, what: str) -> tuple[str, int]:
    end = data.find(b"\0", pos)
    if end < 0 or end - pos > 255:
        raise ValueError(f"unterminated EXR {what} name")
    return data[pos:end].decode("latin-1"), end + 1


def _parse_header(data: bytes):
    if len(data) < 12:
        raise ValueError("truncated EXR stream")
    magic, version = struct.unpack("<II", data[:8])
    if magic != MAGIC:
        raise ValueError("not an EXR stream")
    if version & 0xFF != 2:
        raise ValueError(f"unsupported EXR version {version & 0xFF}")
    if version & 0x200:
        raise NotImplementedError("tiled EXR unsupported (scanline only)")
    if version & 0x800 or version & 0x1000:
        raise NotImplementedError("deep/multi-part EXR unsupported")
    pos = 8
    channels: list[tuple[str, int]] = []
    data_window = None
    compression = None
    line_order = 0
    for _ in range(_MAX_ATTRS):
        if pos >= len(data):
            raise ValueError("EXR header without terminator")
        if data[pos] == 0:
            pos += 1
            break
        name, pos = _cstr(data, pos, "attribute")
        atype, pos = _cstr(data, pos, "attribute type")
        if pos + 4 > len(data):
            raise ValueError("truncated EXR attribute")
        (size,) = struct.unpack("<I", data[pos : pos + 4])
        pos += 4
        val = data[pos : pos + size]
        if len(val) < size:
            raise ValueError("truncated EXR attribute value")
        pos += size
        if name == "channels" and atype == "chlist":
            q = 0
            while q < len(val) and val[q] != 0:
                cname, q = _cstr(val, q, "channel")
                if q + 16 > len(val):
                    raise ValueError("truncated EXR channel entry")
                (ptype,) = struct.unpack("<I", val[q : q + 4])
                if ptype not in _PIXEL_TYPES:
                    raise ValueError(f"bad EXR pixel type {ptype}")
                q += 16  # type + pLinear/reserved + xSampling + ySampling
                xs, ys = struct.unpack("<ii", val[q - 8 : q])
                if xs != 1 or ys != 1:
                    raise NotImplementedError("subsampled EXR channels unsupported")
                channels.append((cname, ptype))
                if len(channels) > _MAX_CHANNELS:
                    raise ValueError("too many EXR channels")
        elif name == "dataWindow" and atype == "box2i":
            if len(val) != 16:
                raise ValueError("bad EXR dataWindow size")
            data_window = struct.unpack("<4i", val)
        elif name == "compression" and atype == "compression":
            if not val:
                raise ValueError("empty EXR compression attribute")
            compression = val[0]
        elif name == "lineOrder" and atype == "lineOrder":
            if not val:
                raise ValueError("empty EXR lineOrder attribute")
            line_order = val[0]
    else:
        raise ValueError("EXR header attribute bomb")
    if not channels or data_window is None or compression is None:
        raise ValueError("EXR header missing channels/dataWindow/compression")
    return channels, data_window, compression, line_order, pos


def _postprocess(raw: bytes) -> bytes:
    """The ZIP/RLE byte transform: delta reconstruction then two-half
    interleave (OpenEXR ImfZip: predictor across the whole buffer,
    first half of the buffer supplies even bytes, second half odd)."""
    buf = np.frombuffer(raw, np.uint8).astype(np.int64)
    # recurrence d[i] += d[i-1] - 128 in closed form:
    # d'[i] = sum(d[0..i]) - 128*i  (mod 256)
    buf = ((np.cumsum(buf - 128) + 128) % 256).astype(np.uint8)
    out = np.empty(len(buf), np.uint8)
    half = (len(buf) + 1) // 2
    out[0::2] = buf[:half]
    out[1::2] = buf[half:]
    return out.tobytes()


def _rle_decode(raw: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw) and len(out) < expected + 256:
        c = raw[i]
        i += 1
        if c > 127:  # negative int8: literal run of 256-c bytes
            n = 256 - c
            out += raw[i : i + n]
            i += n
        else:  # repeat next byte c+1 times
            if i >= len(raw):
                raise ValueError("truncated EXR RLE stream")
            out += bytes([raw[i]]) * (c + 1)
            i += 1
    if len(out) < expected:
        raise ValueError("EXR RLE stream shorter than expected")
    return bytes(out[:expected])


def decode_exr_planes(data: bytes) -> tuple[int, int, dict[str, np.ndarray]]:
    """Raw decode: ``(width, height, {channel: float32 (or uint32)
    array of shape (h*w,)})``."""
    channels, dw, compression, line_order, pos = _parse_header(data)
    xmin, ymin, xmax, ymax = dw
    w, h = xmax - xmin + 1, ymax - ymin + 1
    if w <= 0 or h <= 0:
        raise ValueError("empty EXR data window")
    check_dims(w, h, "EXR")
    if compression in (0, 1, 2):  # NONE, RLE, ZIPS
        lines_per_block = 1
    elif compression == 3:  # ZIP
        lines_per_block = 16
    else:
        raise NotImplementedError(
            f"EXR compression {compression} unsupported (NONE/RLE/ZIPS/ZIP only)"
        )
    n_blocks = (h + lines_per_block - 1) // lines_per_block
    pos += 8 * n_blocks  # line-offset table; blocks walked sequentially
    bytes_per_px = {name: _PIXEL_TYPES[t][1] for name, t in channels}
    line_bytes = sum(w * b for b in bytes_per_px.values())
    planes = {
        name: np.zeros(h * w, dtype=np.float32 if t != 0 else np.uint32)
        for name, t in channels
    }
    seen_rows = 0
    for _ in range(n_blocks):
        if pos + 8 > len(data):
            raise ValueError("truncated EXR scanline block")
        y, size = struct.unpack("<iI", data[pos : pos + 8])
        pos += 8
        block = data[pos : pos + size]
        if len(block) < size:
            raise ValueError("truncated EXR block data")
        pos += size
        rows = min(lines_per_block, ymax - y + 1)
        expected = line_bytes * rows
        if compression == 0 or size >= expected:
            raw = block[:expected]
            if len(raw) < expected:
                raise ValueError("EXR uncompressed block shorter than expected")
        elif compression == 1:
            raw = _postprocess(_rle_decode(block, expected))
        else:  # ZIPS / ZIP
            try:
                raw = zlib.decompress(block)
            except zlib.error as exc:
                raise ValueError(f"bad EXR zlib stream: {exc}") from exc
            if len(raw) != expected:
                raise ValueError("EXR zlib block size mismatch")
            raw = _postprocess(raw)
        off = 0
        for r in range(rows):
            row_y = y + r - ymin
            if not 0 <= row_y < h:
                raise ValueError("EXR scanline outside data window")
            for name, t in channels:  # chlist order within each line
                nb = w * _PIXEL_TYPES[t][1]
                seg = np.frombuffer(raw, _NP_DTYPES[t], count=w, offset=off)
                if t == 0:
                    planes[name][row_y * w : (row_y + 1) * w] = seg
                else:
                    planes[name][row_y * w : (row_y + 1) * w] = seg.astype(
                        np.float32
                    )
                off += nb
        seen_rows += rows
    if seen_rows < h:
        raise ValueError("EXR stream ends before the data window is filled")
    return w, h, planes


def decode_exr(data: bytes) -> tuple[int, int, int, bytes]:
    """8-bit view of an EXR: clamp the linear-light values to [0, 1]
    and scale to 255 (documented clamp-linear transfer — no tone
    mapping; HDR highlights clip). R/G/B (+A when present) compose
    RGB/RGBA; a lone Y channel decodes as grayscale."""
    w, h, planes = decode_exr_planes(data)

    def to8(name: str) -> np.ndarray:
        v = planes[name]
        if v.dtype == np.uint32:
            v = v.astype(np.float32) / np.float32(2**32 - 1)
        return np.clip(np.rint(np.clip(v, 0.0, 1.0) * 255.0), 0, 255).astype(
            np.uint8
        )

    if all(c in planes for c in "RGB"):
        chans = [to8("R"), to8("G"), to8("B")]
        if "A" in planes:
            chans.append(to8("A"))
        out = np.stack(chans, axis=-1)
        return w, h, out.shape[-1], out.tobytes()
    if "Y" in planes:
        return w, h, 1, to8("Y").tobytes()
    raise ValueError(
        f"EXR without RGB or Y channels (found {sorted(planes)})"
    )
