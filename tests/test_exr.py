"""OpenEXR scanline decoder vs spec-side writers (NONE/RLE/ZIPS/ZIP,
half/float/uint channels) plus CPython's real python.exr — whose alpha
plane cross-checks BIT-EXACTLY against the same logo's alpha decoded
by the independent VP8L/ALPH path from python.webp."""

import struct
import zlib
from pathlib import Path

import numpy as np
import pytest

from vechord_spark.sources.exr import decode_exr, decode_exr_planes


# ---------------------------------------------------------------------------
# spec-side writer
# ---------------------------------------------------------------------------


def attr(name: bytes, atype: bytes, val: bytes) -> bytes:
    return name + b"\0" + atype + b"\0" + struct.pack("<I", len(val)) + val


def chlist(channels) -> bytes:
    out = b""
    for name, ptype in channels:
        out += name.encode() + b"\0" + struct.pack("<iiii", ptype, 0, 1, 1)
    return out + b"\0"


def forward_postprocess(raw: bytes) -> bytes:
    """The ENCODE side of the ZIP/RLE byte transform, written
    independently of the decoder: de-interleave (even positions into
    the first half, odd into the second), then delta-encode
    d[i] = s[i] - s[i-1] + 128 (mod 256) over the split buffer."""
    b = np.frombuffer(raw, np.uint8).astype(np.int64)
    half = (len(b) + 1) // 2
    split = np.empty(len(b), np.int64)
    split[:half] = b[0::2]
    split[half:] = b[1::2]
    out = split.copy()
    out[1:] = (split[1:] - split[:-1] + 128) % 256
    return out.astype(np.uint8).tobytes()


def rle_encode(raw: bytes) -> bytes:
    """Simple valid EXR RLE: runs of equal bytes as (count-1, byte),
    literals as (256-n, bytes)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        run = 1
        while i + run < len(raw) and raw[i + run] == raw[i] and run < 127:
            run += 1
        if run >= 3:
            out += bytes([run - 1, raw[i]])
            i += run
        else:
            j = i
            lit = bytearray()
            while j < len(raw) and len(lit) < 127:
                nrun = 1
                while j + nrun < len(raw) and raw[j + nrun] == raw[j] and nrun < 127:
                    nrun += 1
                if nrun >= 3:
                    break
                lit += raw[j : j + nrun]
                j += nrun
            out += bytes([256 - len(lit)]) + bytes(lit)
            i = j
    return bytes(out)


def write_exr(w, h, channels, planes, compression):
    """channels: [(name, ptype)] in file (chlist) order; planes:
    {name: list of w*h python floats/ints}."""
    hdr = struct.pack("<II", 0x01312F76, 2)
    hdr += attr(b"channels", b"chlist", chlist(channels))
    hdr += attr(b"compression", b"compression", bytes([compression]))
    hdr += attr(b"dataWindow", b"box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    hdr += attr(b"displayWindow", b"box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    hdr += attr(b"lineOrder", b"lineOrder", b"\x00")
    hdr += attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    hdr += attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
    hdr += attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    hdr += b"\0"
    lines_per_block = 16 if compression == 3 else 1
    n_blocks = (h + lines_per_block - 1) // lines_per_block
    dts = {0: "<u4", 1: "<f2", 2: "<f4"}
    blocks = []
    for bi in range(n_blocks):
        y0 = bi * lines_per_block
        rows = min(lines_per_block, h - y0)
        raw = b""
        for r in range(rows):
            for name, pt in channels:
                seg = np.asarray(
                    planes[name][(y0 + r) * w : (y0 + r + 1) * w], dtype=dts[pt]
                )
                raw += seg.tobytes()
        if compression == 0:
            payload = raw
        elif compression == 1:
            payload = rle_encode(forward_postprocess(raw))
        else:
            payload = zlib.compress(forward_postprocess(raw))
        if compression != 0 and len(payload) >= len(raw):
            payload = raw  # the incompressible-block raw fallback
        blocks.append(struct.pack("<iI", y0, len(payload)) + payload)
    # line offset table (the decoder walks sequentially but the table
    # must exist and be the right SIZE)
    base = len(hdr) + 8 * n_blocks
    offsets = []
    pos = base
    for b in blocks:
        offsets.append(pos)
        pos += len(b)
    table = b"".join(struct.pack("<Q", o) for o in offsets)
    return hdr + table + b"".join(blocks)


def _ramp_planes(w, h):
    r = [x / (w - 1) for y in range(h) for x in range(w)]
    g = [y / (h - 1) for y in range(h) for x in range(w)]
    b = [0.25] * (w * h)
    a = [1.0 if (x + y) % 2 == 0 else 0.0 for y in range(h) for x in range(w)]
    return {"R": r, "G": g, "B": b, "A": a}


CH_HALF = [("A", 1), ("B", 1), ("G", 1), ("R", 1)]


@pytest.mark.parametrize("compression", [0, 1, 2, 3])
def test_roundtrip_half_rgba(compression):
    w, h = 8, 20  # >16 rows exercises multiple ZIP blocks + a short tail
    planes = _ramp_planes(w, h)
    data = write_exr(w, h, CH_HALF, planes, compression)
    ww, hh, ch, pix = decode_exr(data)
    assert (ww, hh, ch) == (w, h, 4)
    arr = np.frombuffer(pix, np.uint8).reshape(h, w, 4)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            # expectations through float16 storage, computed by hand
            want = [
                round(float(np.float16(planes[c][i])) * 255)
                for c in ("R", "G", "B", "A")
            ]
            assert list(arr[y, x]) == want, (x, y)


def test_float_and_uint_channels():
    w, h = 5, 3
    planes = {
        "R": [0.5] * 15, "G": [2.0] * 15, "B": [-1.0] * 15,  # clip both ways
    }
    data = write_exr(w, h, [("B", 2), ("G", 2), ("R", 2)], planes, 0)
    ww, hh, ch, pix = decode_exr(data)
    assert ch == 3
    assert pix[:3] == bytes([128, 255, 0])
    # uint gray
    y = {"Y": [0, 2**31, 2**32 - 1] * 5}
    d2 = write_exr(w, h, [("Y", 0)], y, 0)
    ww, hh, ch2, pix2 = decode_exr(d2)
    assert ch2 == 1 and pix2[:3] == bytes([0, 128, 255])


def test_raw_planes_expose_hdr_values():
    w, h = 4, 2
    planes = {"R": [3.5] * 8, "G": [0.0] * 8, "B": [0.125] * 8}
    data = write_exr(w, h, [("B", 2), ("G", 2), ("R", 2)], planes, 2)
    ww, hh, out = decode_exr_planes(data)
    assert float(out["R"][0]) == 3.5  # HDR value intact pre-clamp
    assert float(out["B"][0]) == 0.125


def test_python_exr_real_file_and_cross_codec_alpha():
    """CPython's python.exr (uncompressed half ABGR) — and the
    STRONGEST validation in the suite: its alpha plane must equal,
    BIT FOR BIT, the alpha of python.webp decoded by the totally
    independent VP8L/ALPH path. Two real encoders, two unrelated
    formats, one source logo."""
    candidates = sorted(
        Path("/root/.pyenv/versions").glob("*/lib/python3.*/test/imghdrdata/")
    )
    if not candidates:
        pytest.skip("imghdrdata corpus not present")
    base = candidates[0]
    w, h, ch, pix = decode_exr((base / "python.exr").read_bytes())
    assert (w, h, ch) == (16, 16, 4)
    exr_alpha = bytes(np.frombuffer(pix, np.uint8).reshape(h, w, 4)[:, :, 3].reshape(-1))
    from vechord_spark.sources.vp8l import decode_webp_alpha

    ww, wh, webp_alpha = decode_webp_alpha((base / "python.webp").read_bytes())
    assert (ww, wh) == (16, 16)
    assert exr_alpha == webp_alpha


def test_decode_image_dispatches_exr():
    from vechord_spark.sources.multimodal import decode_image

    data = write_exr(4, 2, [("B", 1), ("G", 1), ("R", 1)],
                     {"R": [1.0] * 8, "G": [0.0] * 8, "B": [0.5] * 8}, 2)
    img = decode_image(data)
    assert (img.width, img.height, img.channels) == (4, 2, 3)
    assert img.pixels[:3] == bytes([255, 0, 128])


def test_unsupported_exr_variants_gate_honestly():
    w, h = 2, 2
    planes = {"R": [0] * 4, "G": [0] * 4, "B": [0] * 4}
    good = write_exr(w, h, [("B", 1), ("G", 1), ("R", 1)], planes, 0)
    # PIZ compression byte
    piz = good.replace(b"compression\0compression\0\x01\x00\x00\x00\x00",
                       b"compression\0compression\0\x01\x00\x00\x00\x04")
    with pytest.raises(NotImplementedError):
        decode_exr(piz)
    # tiled flag
    tiled = good[:4] + struct.pack("<I", 2 | 0x200) + good[8:]
    with pytest.raises(NotImplementedError):
        decode_exr(tiled)


def test_hostile_exr_never_crashes():
    import random

    rng = random.Random(13)
    good = write_exr(8, 8, CH_HALF, _ramp_planes(8, 8), 3)
    for _ in range(300):
        blob = bytearray(good)
        for _ in range(rng.randrange(1, 6)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            decode_exr(bytes(blob))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(0, len(good), 23):
        try:
            decode_exr(good[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_dimension_bomb_rejected():
    hdr = struct.pack("<II", 0x01312F76, 2)
    hdr += attr(b"channels", b"chlist", chlist([("R", 1)]))
    hdr += attr(b"compression", b"compression", b"\x00")
    hdr += attr(b"dataWindow", b"box2i", struct.pack("<4i", 0, 0, 10**6, 10**6))
    hdr += b"\0"
    with pytest.raises(ValueError):
        decode_exr(hdr)


def test_decreasing_line_order_decodes_by_block_y():
    """lineOrder=DECREASING_Y writes blocks bottom-up; the decoder
    places rows by each block's own y field, so the pixels land
    correctly either way."""
    w, h = 4, 3
    planes = {"R": [i / 16 for i in range(12)], "G": [0.0] * 12, "B": [0.0] * 12}
    data = write_exr(w, h, [("B", 1), ("G", 1), ("R", 1)], planes, 0)
    # reorder the three single-line blocks bottom-up and flip lineOrder
    hdr_end = data.index(b"screenWindowWidth")
    hdr_end = data.index(struct.pack("<f", 1.0), hdr_end) + 4 + 1  # + terminator
    table = data[hdr_end : hdr_end + 24]
    blocks = []
    pos = hdr_end + 24
    for _ in range(3):
        y, size = struct.unpack("<iI", data[pos : pos + 8])
        blocks.append(data[pos : pos + 8 + size])
        pos += 8 + size
    flipped = (
        data[:hdr_end].replace(b"lineOrder\0lineOrder\0\x01\x00\x00\x00\x00",
                               b"lineOrder\0lineOrder\0\x01\x00\x00\x00\x01")
        + table
        + b"".join(reversed(blocks))
    )
    assert decode_exr(flipped) == decode_exr(data)
