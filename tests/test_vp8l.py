"""VP8L (WebP lossless) decoder vs spec-side hand-written bitstreams.

Ground truth strategy (same as the GIF/TIFF/JPEG suites): the writer
below emits bitstreams straight from the "WebP Lossless Bitstream
Specification" text — LSB-first value packing, MSB-first canonical
prefix-code bits, DEFLATE-style canonical assignment computed with the
independent next_code algorithm — and every expected pixel buffer is
computed by hand in the test, never by running the decoder on itself.
No libwebp/Pillow anywhere.
"""

import struct

import numpy as np
import pytest

from vechord_spark.sources.vp8l import (
    DISTANCE_MAP,
    BitReader,
    PrefixCode,
    _plane_distance,
    decode_vp8l,
    decode_webp_lossless,
)


# ---------------------------------------------------------------------------
# spec-side writer
# ---------------------------------------------------------------------------


class W:
    """LSB-first bit writer; wcode() writes prefix-code bits MSB first
    (spec §4)."""

    def __init__(self):
        self.bits = []

    def w(self, val, n):
        for i in range(n):
            self.bits.append((val >> i) & 1)
        return self

    def wcode(self, code, n):
        for i in reversed(range(n)):
            self.bits.append((code >> i) & 1)
        return self

    def tobytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def canonical(lengths):
    """symbol -> (code, len) via the DEFLATE next_code construction —
    an implementation independent of the decoder's sorted-iteration
    assignment."""
    maxlen = max(lengths.values())
    bl_count = [0] * (maxlen + 1)
    for l in lengths.values():
        bl_count[l] += 1
    next_code = [0] * (maxlen + 2)
    code = 0
    for l in range(1, maxlen + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for sym in sorted(lengths):
        l = lengths[sym]
        out[sym] = (next_code[l], l)
        next_code[l] += 1
    return out


def header(w, width, height, alpha_hint=0):
    w.w(0x2F, 8).w(width - 1, 14).w(height - 1, 14).w(alpha_hint, 1).w(0, 3)


def simple_code(w, *symbols):
    """Write a 1- or 2-symbol simple prefix code (symbols ascending)."""
    w.w(1, 1)  # simple
    w.w(len(symbols) - 1, 1)
    if symbols[0] > 1:
        w.w(1, 1).w(symbols[0], 8)
    else:
        w.w(0, 1).w(symbols[0], 1)
    if len(symbols) == 2:
        w.w(symbols[1], 8)


# code-length-code order per the spec (16 sits at position 8 — a
# mirrored writer/reader bug here round-tripped fine and was only
# caught by decoding a REAL libwebp-encoded stream, so this constant
# is imported from the decoder and its value pinned in a test against
# the spec text instead of being redeclared)
from vechord_spark.sources.vp8l import CODE_LENGTH_ORDER as K_ORDER


def normal_code(w, lengths, alphabet):
    """Write a normal (code-length-coded) prefix code for the given
    symbol->length mapping. The code-length code itself is built from
    the tokens actually needed (literal lengths + 17/18 zero-runs)."""
    # token stream: literal length per symbol, zero-runs compressed
    tokens = []  # (token, extra_value, extra_bits)
    sym = 0
    syms = sorted(lengths)
    for s in syms:
        gap = s - sym
        while gap > 0:
            if gap >= 11:
                run = min(gap, 138)
                tokens.append((18, run - 11, 7))
                gap -= run
            elif gap >= 3:
                tokens.append((17, gap - 3, 3))
                gap = 0
            else:
                tokens.append((0, None, 0))
                gap -= 1
        tokens.append((lengths[s], None, 0))
        sym = s + 1
    # trailing zeros are NOT implicit without a max_symbol cap — the
    # reader consumes tokens until the alphabet fills
    gap = alphabet - sym
    while gap > 0:
        if gap >= 11:
            run = min(gap, 138)
            tokens.append((18, run - 11, 7))
            gap -= run
        elif gap >= 3:
            tokens.append((17, gap - 3, 3))
            gap = 0
        else:
            tokens.append((0, None, 0))
            gap -= 1
    used = sorted({t for t, _, _ in tokens})
    # build a complete code over the used tokens: 1 token -> len 1
    # handled by the simple path of the CODE-LENGTH code? The spec's
    # code-length code has no simple form, so give 2^k tokens equal
    # lengths and pad with a dummy if needed.
    k = max(1, (len(used) - 1).bit_length())
    if len(used) < (1 << k):
        dummy = next(t for t in range(19) if t not in used)
        used.append(dummy)
        used.sort()
    cl_lens = {t: k for t in used}
    num_codes = max(K_ORDER.index(t) for t in used) + 1
    num_codes = max(num_codes, 4)
    w.w(0, 1)  # not simple
    w.w(num_codes - 4, 4)
    for i in range(num_codes):
        w.w(cl_lens.get(K_ORDER[i], 0), 3)
    table = canonical(cl_lens)
    w.w(0, 1)  # no max_symbol cap
    for t, extra, nbits in tokens:
        c, l = table[t]
        w.wcode(c, l)
        if nbits:
            w.w(extra, nbits)
    return canonical(lengths)


def no_extras(w):
    """No transforms, no color cache, no meta prefix."""
    w.w(0, 1)  # end of transforms
    w.w(0, 1)  # no color cache
    w.w(0, 1)  # no meta prefix


def trivial_ARBD(w, red, blue, alpha):
    """Single-symbol (0-bit) red/blue/alpha/distance codes."""
    simple_code(w, red)
    simple_code(w, blue)
    simple_code(w, alpha)
    simple_code(w, 0)  # distance, never used


# ---------------------------------------------------------------------------
# prefix-code primitives
# ---------------------------------------------------------------------------


def test_bit_reader_lsb_first():
    br = BitReader(bytes([0b10110010, 0xFF]))
    assert br.read(3) == 0b010
    assert br.read_bit() == 0
    assert br.read(4) == 0b1011
    assert br.read(8) == 0xFF
    with pytest.raises(ValueError):
        br.read(1)


def test_canonical_prefix_code_roundtrip():
    lengths = [0] * 10
    lengths[1], lengths[4], lengths[7], lengths[9] = 1, 2, 3, 3
    code = PrefixCode(lengths)
    table = canonical({1: 1, 4: 2, 7: 3, 9: 3})
    w = W()
    for sym in (9, 1, 4, 7, 1):
        w.wcode(*table[sym])
    br = BitReader(w.tobytes())
    assert [code.decode(br) for _ in range(5)] == [9, 1, 4, 7, 1]


def test_incomplete_prefix_code_rejected():
    lengths = [2, 2, 2] + [0] * 5  # kraft-short
    with pytest.raises(ValueError):
        PrefixCode(lengths)


def test_distance_map_head_pinned():
    # first spec rows, verbatim
    assert DISTANCE_MAP[:8] == (
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    )
    assert len(DISTANCE_MAP) == 120
    assert _plane_distance(1, 10) == 10   # pixel above
    assert _plane_distance(2, 10) == 1    # pixel left
    assert _plane_distance(4, 10) == 9    # (-1, 1)
    assert _plane_distance(121, 10) == 1  # plain distances resume
    assert _plane_distance(130, 10) == 10


# ---------------------------------------------------------------------------
# end-to-end decodes
# ---------------------------------------------------------------------------


def test_two_color_literal_image():
    """4x4 checkerboard, greens {60, 200}, constant r/b/a — greens ride
    a 2-symbol code (1 bit/pixel), the other channels are 0-bit."""
    w = W()
    header(w, 4, 4)
    no_extras(w)
    simple_code(w, 60, 200)  # green: 60 -> code 0, 200 -> code 1
    trivial_ARBD(w, red=10, blue=30, alpha=255)
    for y in range(4):
        for x in range(4):
            w.w((x + y) % 2, 1)  # 60 on even parity, 200 on odd
    ww, hh, ch, pix = decode_vp8l(w.tobytes())
    assert (ww, hh, ch) == (4, 4, 3)
    arr = np.frombuffer(pix, np.uint8).reshape(4, 4, 3)
    for y in range(4):
        for x in range(4):
            g = 60 if (x + y) % 2 == 0 else 200
            assert tuple(arr[y, x]) == (10, g, 30)


def test_lz77_backward_reference_and_normal_code():
    """1x8 image: two literals then copy(length=6, distance=2) — the
    green code is a NORMAL (code-length-coded) code carrying a length
    prefix symbol; the distance symbol rides a 0-bit simple code."""
    G_A, G_B = 5, 9
    LEN_SYM = 256 + 4  # lz77 length prefix 4 -> value 5 + extra bit
    w = W()
    header(w, 8, 1)
    no_extras(w)
    table = normal_code(w, {G_A: 1, G_B: 2, LEN_SYM: 2}, 256 + 24)
    simple_code(w, 77)   # red
    simple_code(w, 88)   # blue
    simple_code(w, 255)  # alpha
    simple_code(w, 13)   # distance prefix 13 -> value 97 + read(5)
    w.wcode(*table[G_A])
    w.wcode(*table[G_B])
    w.wcode(*table[LEN_SYM])
    w.w(1, 1)    # length extra bit: 4 + 1 + 1 = 6
    # distance symbol is 0-bit; extra: 96 + x + 1 = 122 -> x = 25
    w.w(25, 5)   # distance value 122 -> plane code > 120 -> dist 2
    ww, hh, ch, pix = decode_vp8l(w.tobytes())
    assert (ww, hh, ch) == (8, 1, 3)
    arr = np.frombuffer(pix, np.uint8).reshape(8, 3)
    greens = [G_A, G_B] * 4
    for x in range(8):
        assert tuple(arr[x]) == (77, greens[x], 88)


def test_color_cache_hits():
    """1x4: literal A, literal B, cache(A), cache(B) with a 6-bit
    cache; indices computed with the spec hash in the test itself."""
    bits = 6

    def pix32(r, g, b):
        return (255 << 24) | (r << 16) | (g << 8) | b

    A = pix32(1, 2, 3)
    B = pix32(200, 150, 100)
    iA = (0x1E35A7BD * A & 0xFFFFFFFF) >> (32 - bits)
    iB = (0x1E35A7BD * B & 0xFFFFFFFF) >> (32 - bits)
    assert iA != iB
    CA, CB = 280 + iA, 280 + iB
    w = W()
    header(w, 4, 1)
    w.w(0, 1)        # no transforms
    w.w(1, 1).w(bits, 4)  # color cache
    w.w(0, 1)        # no meta
    table = normal_code(w, {2: 2, 150: 2, CA: 2, CB: 2}, 256 + 24 + (1 << bits))
    rt = normal_code(w, {1: 1, 200: 1}, 256)
    bt = normal_code(w, {3: 1, 100: 1}, 256)
    simple_code(w, 255)  # alpha
    simple_code(w, 0)  # distance
    # pixel stream: green(A)=2, [red 1, blue 3], green(B)=150,
    # [red 200, blue 100], cache(A), cache(B)
    w.wcode(*table[2])
    w.wcode(*rt[1])
    w.wcode(*bt[3])
    w.wcode(*table[150])
    w.wcode(*rt[200])
    w.wcode(*bt[100])
    w.wcode(*table[CA])
    w.wcode(*table[CB])
    ww, hh, ch, pix = decode_vp8l(w.tobytes())
    assert (ww, hh, ch) == (4, 1, 3)
    arr = np.frombuffer(pix, np.uint8).reshape(4, 3)
    assert tuple(arr[0]) == (1, 2, 3)
    assert tuple(arr[1]) == (200, 150, 100)
    assert tuple(arr[2]) == (1, 2, 3)
    assert tuple(arr[3]) == (200, 150, 100)


def test_subtract_green_transform():
    """2x1 with SUBTRACT_GREEN: stored residuals r-g, b-g mod 256."""
    w = W()
    header(w, 2, 1)
    w.w(1, 1).w(2, 2)  # transform present: SUBTRACT_GREEN
    w.w(0, 1)          # end of transforms
    w.w(0, 1).w(0, 1)  # no cache, no meta
    # final pixels wanted: (r=100, g=90, b=20) and (r=100, g=10, b=20)
    # residuals: r' = (r - g) & 255, b' = (b - g) & 255
    # canonical codes go by SYMBOL VALUE: smaller symbol -> code 0
    simple_code(w, 10, 90)    # greens: 10 -> 0, 90 -> 1
    simple_code(w, 10, 90)    # red residuals (100-90, 100-10 sorted)
    simple_code(w, 10, 186)   # blue residuals (20-10, (20-90)&255 sorted)
    simple_code(w, 255)
    simple_code(w, 0)
    # pixel 0: g=90 -> code 1; red residual (100-90)=10 -> code 0;
    # blue residual (20-90)&255=186 -> code 1
    w.w(1, 1)
    w.w(0, 1)
    w.w(1, 1)
    # pixel 1: g=10 -> code 0; red residual 90 -> code 1; blue 10 -> 0
    w.w(0, 1)
    w.w(1, 1)
    w.w(0, 1)
    ww, hh, ch, pix = decode_vp8l(w.tobytes())
    arr = np.frombuffer(pix, np.uint8).reshape(2, 3)
    assert tuple(arr[0]) == (100, 90, 20)
    assert tuple(arr[1]) == (100, 10, 20)


def _sub_image_single_mode(w, mode):
    """Entropy-coded 1x1 sub-image whose green channel is ``mode``."""
    w.w(0, 1)  # no cache
    simple_code(w, mode)  # green
    trivial_ARBD(w, red=0, blue=0, alpha=0)


def test_predictor_transform_T_mode():
    """2x2, predictor blocks of 4 -> one block with mode 2 (Top).
    Expected pixels computed by hand: (0,0) += 0xff000000; (1,0) += L;
    row 1 += T."""
    w = W()
    header(w, 2, 2)
    w.w(1, 1).w(0, 2)  # PREDICTOR transform
    w.w(0, 3)          # size_bits = 0 + 2 = 2 -> 4x4 blocks -> 1x1 sub
    _sub_image_single_mode(w, 2)
    w.w(0, 1)          # end of transforms
    w.w(0, 1).w(0, 1)  # no cache, no meta
    # residual image: choose residual greens {4, 7}; reds/blues/alpha 0
    # except alpha residual for (0,0) must make alpha 255: black
    # predictor contributes a=255 at (0,0); L/T propagate it.
    simple_code(w, 4, 7)  # green residuals
    trivial_ARBD(w, red=0, blue=0, alpha=0)
    # residual greens per pixel: (0,0)=4 (0 bits? two-symbol -> 1 bit)
    for g in (0, 1, 1, 0):  # codes: 4,7,7,4
        w.w(g, 1)
    ww, hh, ch, pix = decode_vp8l(w.tobytes())
    arr = np.frombuffer(pix, np.uint8).reshape(2, 2, 3)
    # hand computation:
    # (0,0): res g4 + black -> g=4, a=255
    # (1,0): y==0 -> L: g = 7 + 4 = 11
    # (0,1): x==0 -> T: g = 7 + 4 = 11
    # (1,1): mode T: g = 4 + 11 = 15
    assert arr[0, 0, 1] == 4
    assert arr[0, 1, 1] == 11
    assert arr[1, 0, 1] == 11
    assert arr[1, 1, 1] == 15
    assert ch == 3  # alpha everywhere 255 via propagation


def test_color_transform_deltas():
    """1x1 with a COLOR transform: signed 3.5 fixed-point deltas added
    to red/blue from green (and new red), per spec §3.3."""
    g2r, g2b, r2b = 0x40, 0xE0, 0x10  # +64, -32, +16 as int8
    elem_red, elem_green, elem_blue = r2b, g2b, g2r
    w = W()
    header(w, 1, 1)
    w.w(1, 1).w(1, 2)  # COLOR transform
    w.w(0, 3)          # size_bits 2
    # sub-image pixel: argb with red=r2b, green=g2b, blue=g2r
    w.w(0, 1)  # no cache
    simple_code(w, elem_green)  # green channel of element
    simple_code(w, elem_red)    # red
    simple_code(w, elem_blue)   # blue
    simple_code(w, 0)           # alpha
    simple_code(w, 0)           # distance
    w.w(0, 1)          # end of transforms
    w.w(0, 1).w(0, 1)
    # stored pixel: green 100, red residual 10, blue residual 20
    simple_code(w, 100)
    simple_code(w, 10)
    simple_code(w, 20)
    simple_code(w, 255)
    simple_code(w, 0)
    ww, hh, ch, pix = decode_vp8l(w.tobytes())
    arr = np.frombuffer(pix, np.uint8).reshape(1, 3)

    def d(t, c):
        ts = t - 256 if t >= 128 else t
        cs = c - 256 if c >= 128 else c
        return (ts * cs) >> 5

    red = (10 + d(g2r, 100)) & 255
    blue = (20 + d(g2b, 100) + d(r2b, red)) & 255
    assert tuple(arr[0]) == (red, 100, blue)


def test_palette_transform_packed_indices():
    """4x1, 4-color palette -> width_bits 2, one packed green byte
    holding four 2-bit indices LSB-first; palette entries delta-coded."""
    pal = [
        (255, 10, 20, 30),
        (255, 10, 21, 31),
        (255, 10, 22, 32),
        (255, 10, 23, 33),
    ]  # (a, r, g, b); each channel's delta stream has <= 2 symbols

    def delta(cur, prev):
        return tuple((c - p) & 255 for c, p in zip(cur, prev))

    deltas = [pal[0]] + [delta(pal[i], pal[i - 1]) for i in range(1, 4)]
    w = W()
    header(w, 4, 1)
    w.w(1, 1).w(3, 2)  # COLOR_INDEXING
    w.w(3, 8)          # palette size - 1
    # palette sub-image: 4x1 of deltas; per-channel symbol sets
    w.w(0, 1)  # no cache
    gs = sorted({d[2] for d in deltas})
    rs = sorted({d[1] for d in deltas})
    bs = sorted({d[3] for d in deltas})
    as_ = sorted({d[0] for d in deltas})
    for syms in (gs, rs, bs, as_):
        simple_code(w, *syms)
    simple_code(w, 0)  # distance
    for d_ in deltas:
        if len(gs) == 2:
            w.w(gs.index(d_[2]), 1)
        if len(rs) == 2:
            w.w(rs.index(d_[1]), 1)
        if len(bs) == 2:
            w.w(bs.index(d_[3]), 1)
        if len(as_) == 2:
            w.w(as_.index(d_[0]), 1)
    w.w(0, 1)          # end of transforms
    # packed image (1x1): green byte = 0 | 1<<2 | 2<<4 | 3<<6
    w.w(0, 1).w(0, 1)  # no cache, no meta
    packed = 0 | (1 << 2) | (2 << 4) | (3 << 6)
    simple_code(w, packed)
    trivial_ARBD(w, red=0, blue=0, alpha=0)
    ww, hh, ch, pix = decode_vp8l(w.tobytes())
    assert (ww, hh, ch) == (4, 1, 3)
    arr = np.frombuffer(pix, np.uint8).reshape(4, 3)
    for x in range(4):
        a, r, g, b = pal[x]
        assert tuple(arr[x]) == (r, g, b)


def test_rgba_when_alpha_present():
    w = W()
    header(w, 1, 1, alpha_hint=1)
    no_extras(w)
    simple_code(w, 7)
    simple_code(w, 8)
    simple_code(w, 9)
    simple_code(w, 128)  # alpha != 255
    simple_code(w, 0)
    ww, hh, ch, pix = decode_vp8l(w.tobytes())
    assert (ww, hh, ch, pix) == (1, 1, 4, bytes([8, 7, 9, 128]))


def test_riff_container_dispatch():
    w = W()
    header(w, 1, 1)
    no_extras(w)
    simple_code(w, 1)
    simple_code(w, 2)
    simple_code(w, 3)
    simple_code(w, 255)
    simple_code(w, 0)
    payload = w.tobytes()
    riff = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(payload))
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + payload
    )
    assert decode_webp_lossless(riff) == (1, 1, 3, bytes([2, 1, 3]))


def test_lossy_vp8_is_env_gated():
    riff = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError):
        decode_webp_lossless(riff)


def test_python_webp_is_lossy_and_gated():
    """CPython's imghdrdata python.webp is a VP8X+ALPH+VP8 (LOSSY)
    file — the honest outcome for it is the documented env-gate, while
    probe_image still reports its dimensions."""
    import sys
    from pathlib import Path

    p = Path(
        f"/root/.pyenv/versions/{sys.version_info.major}."
        f"{sys.version_info.minor}.{sys.version_info.micro}"
    )
    candidates = list(Path("/root/.pyenv/versions").glob("*/lib/python3.*/test/imghdrdata/python.webp"))
    if not candidates:
        pytest.skip("imghdrdata corpus not present")
    data = candidates[0].read_bytes()
    from vechord_spark.sources.multimodal import probe_image

    kind, w, h = probe_image(data)
    assert kind == "webp" and w > 0 and h > 0
    with pytest.raises((NotImplementedError, ValueError)):
        decode_webp_lossless(data)


# ---------------------------------------------------------------------------
# hostile inputs
# ---------------------------------------------------------------------------


def test_truncated_stream_raises_valueerror():
    w = W()
    header(w, 4, 4)
    no_extras(w)
    simple_code(w, 60, 200)
    trivial_ARBD(w, red=10, blue=30, alpha=255)
    full = W()
    header(full, 4, 4)
    data = w.tobytes()
    for cut in (1, 3, len(data) // 2, len(data) - 1):
        with pytest.raises(ValueError):
            decode_vp8l(data[:cut])


def test_hostile_dimensions_rejected():
    w = W()
    w.w(0x2F, 8).w((1 << 14) - 1, 14).w((1 << 14) - 1, 14).w(0, 1).w(0, 3)
    with pytest.raises(ValueError):
        decode_vp8l(w.tobytes() + b"\x00" * 16)


def test_bad_signature_and_version():
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00\x00\x00\x00\x00")
    w = W()
    w.w(0x2F, 8).w(0, 14).w(0, 14).w(0, 1).w(5, 3)  # version 5
    with pytest.raises(ValueError):
        decode_vp8l(w.tobytes() + b"\x00" * 8)


def test_backward_reference_before_start_rejected():
    """A copy whose distance reaches before pixel 0 must raise."""
    w = W()
    header(w, 8, 1)
    no_extras(w)
    table = normal_code(w, {5: 1, 256 + 4: 2, 9: 2}, 256 + 24)
    simple_code(w, 77)
    simple_code(w, 88)
    simple_code(w, 255)
    simple_code(w, 13)
    w.wcode(*table[5])       # one literal only
    w.wcode(*table[256 + 4])
    w.w(1, 1)                # length 6
    w.w(25, 5)               # distance 122 -> 2 > pos 1
    with pytest.raises(ValueError):
        decode_vp8l(w.tobytes())


def test_fuzz_random_payloads_never_crash():
    """Random bytes after a valid header must raise ValueError (or
    decode), never IndexError/struct.error — the dirty-corpus
    contract shared with the other codecs."""
    import random

    rng = random.Random(10)
    for _ in range(300):
        w = W()
        header(w, 1 + rng.randrange(8), 1 + rng.randrange(8))
        blob = w.tobytes() + bytes(rng.randrange(256) for _ in range(rng.randrange(40)))
        try:
            decode_vp8l(blob)
        except ValueError:
            pass
        except NotImplementedError:
            pass


def test_meta_prefix_groups():
    """8x1 with a meta entropy image (block bits 2): pixels 0-3 decode
    through group 0, pixels 4-7 through group 1 — each group's green
    code is a different single symbol, so the output proves which
    group decoded which block."""
    w = W()
    header(w, 8, 1)
    w.w(0, 1)  # no transforms
    w.w(0, 1)  # no color cache
    w.w(1, 1).w(0, 3)  # meta prefix, bits = 0 + 2 = 2 -> 2x1 meta image
    # meta image (NOT top level): green = group id, red = high byte 0
    w.w(0, 1)  # meta image: no cache
    simple_code(w, 0, 1)  # greens 0/1
    trivial_ARBD(w, red=0, blue=0, alpha=0)
    w.w(0, 1)  # meta pixel 0 -> group 0
    w.w(1, 1)  # meta pixel 1 -> group 1
    # group 0 codes
    simple_code(w, 42)
    trivial_ARBD(w, red=1, blue=2, alpha=255)
    # group 1 codes
    simple_code(w, 99)
    trivial_ARBD(w, red=3, blue=4, alpha=255)
    # all five codes in both groups are 0-bit -> no pixel bits at all
    ww, hh, ch, pix = decode_vp8l(w.tobytes())
    arr = np.frombuffer(pix, np.uint8).reshape(8, 3)
    for x in range(8):
        want = (1, 42, 2) if x < 4 else (3, 99, 4)
        assert tuple(arr[x]) == want, x


def test_lz77_2d_distance_code_copies_from_row_above():
    """4x2: distance code 1 maps to neighbor (0, 1) -> dist = width,
    i.e. the pixel directly above (the most common 2D reference)."""
    G = [30, 40, 50, 60]
    LEN3 = 256 + 2  # prefix 2 -> length 3, no extra bits
    w = W()
    header(w, 4, 2)
    no_extras(w)
    table = normal_code(
        w, {30: 3, 40: 3, 50: 3, 60: 3, 70: 3, LEN3: 3, 99: 3, 98: 3},
        256 + 24,
    )
    simple_code(w, 7)    # red
    simple_code(w, 9)    # blue
    simple_code(w, 255)  # alpha
    simple_code(w, 0)    # distance: prefix 0 -> value 1 -> map (0,1)
    for g in G:          # row 0: four literals
        w.wcode(*table[g])
    w.wcode(*table[70])  # row 1 x0: literal
    w.wcode(*table[LEN3])  # copy 3 pixels from distance 4 (above)
    ww, hh, ch, pix = decode_vp8l(w.tobytes())
    arr = np.frombuffer(pix, np.uint8).reshape(2, 4, 3)
    assert [p[1] for p in arr[0]] == G
    assert [p[1] for p in arr[1]] == [70, 40, 50, 60]


def test_code_length_order_pinned_to_spec():
    """The spec-printed kCodeLengthCodeOrder, verbatim — 16 between 5
    and 6. (A writer/reader pair sharing a wrong order round-trips
    fine; only a real encoder's stream catches it.)"""
    assert K_ORDER == (
        17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    )


# ---------------------------------------------------------------------------
# ALPH: the alpha plane of a lossy (VP8X) WebP
# ---------------------------------------------------------------------------

from vechord_spark.sources.vp8l import decode_alph, decode_webp_alpha  # noqa: E402


def test_alph_raw_and_filters():
    """Raw (method 0) ALPH payloads under each filter method, inverse
    computed by hand: row 0 predicts LEFT, column 0 predicts TOP,
    interior per method."""
    # 2x2 target alpha plane
    want = [10, 30, 50, 90]
    # method 0 filter 0: stored = target
    assert decode_alph(bytes([0]) + bytes(want), 2, 2) == bytes(want)
    # filter 1 (horizontal): residuals r[0,0]=10, r[0,1]=30-10=20,
    # r[1,0]=50-10=40 (col 0 predicts TOP), r[1,1]=90-50=40
    pay = bytes([0 | (1 << 2)]) + bytes([10, 20, 40, 40])
    assert decode_alph(pay, 2, 2) == bytes(want)
    # filter 2 (vertical): r[0,1]=20 (row 0 predicts LEFT), r[1,0]=40,
    # r[1,1]=90-30=60
    pay = bytes([0 | (2 << 2)]) + bytes([10, 20, 40, 60])
    assert decode_alph(pay, 2, 2) == bytes(want)
    # filter 3 (gradient): interior pred = clamp(50+30-10)=70 -> r=20
    pay = bytes([0 | (3 << 2)]) + bytes([10, 20, 40, 20])
    assert decode_alph(pay, 2, 2) == bytes(want)


def test_alph_vp8l_compressed():
    """Method 1: a headerless VP8L stream whose green channel carries
    alpha — written by the spec-side writer (2-symbol green code)."""
    w = W()
    no_extras(w)
    simple_code(w, 64, 192)  # greens = alpha values
    trivial_ARBD(w, red=0, blue=0, alpha=255)
    for bit in (0, 1, 1, 0, 1, 0):  # 3x2 plane
        w.w(bit, 1)
    payload = bytes([1]) + w.tobytes()  # method 1, filter 0
    assert decode_alph(payload, 3, 2) == bytes([64, 192, 192, 64, 192, 64])


def test_python_webp_alpha_decodes_for_real():
    """CPython's python.webp (VP8X + ALPH + lossy VP8): the alpha
    plane is VP8L-coded by the REAL libwebp encoder — the one stream
    in this environment not produced by our own writer, so it pins
    the decoder against the actual wire format (it is what caught the
    kCodeLengthCodeOrder transposition). RGB stays env-gated; the
    expectations here are structural (palette-sized distinct count,
    logo-shaped coverage) plus a regression hash."""
    import hashlib
    from pathlib import Path

    candidates = sorted(
        Path("/root/.pyenv/versions").glob(
            "*/lib/python3.*/test/imghdrdata/python.webp"
        )
    )
    if not candidates:
        pytest.skip("imghdrdata corpus not present")
    w, h, alpha = decode_webp_alpha(candidates[0].read_bytes())
    assert (w, h) == (16, 16)
    a = np.frombuffer(alpha, np.uint8)
    assert a.min() == 0 and a.max() == 255
    assert len(set(alpha)) == 69  # == the stream's palette size
    assert 0.3 < float((a > 128).mean()) < 0.8  # logo coverage band
    assert hashlib.sha256(alpha).hexdigest().startswith("00d64fd72159f0e2")


def test_predictor_mode13_truncates_toward_zero():
    """ClampAddSubtractHalf's (a - b) / 2 is C integer division —
    TRUNCATION toward zero. With L/T averaging to 7 and TL = 20 the
    delta is -13: C gives pred 7 + (-6) = 1; floor division would give
    0. Hand-computed: g00=20, g01=(20+241)&255=5, g10=(20+245)&255=9,
    ave=(9+5)>>1=7, pred=1, g11=(100+1)&255=101."""
    w = W()
    header(w, 2, 2)
    w.w(1, 1).w(0, 2)  # PREDICTOR
    w.w(0, 3)          # size_bits 2 -> one block
    _sub_image_single_mode(w, 13)
    w.w(0, 1)          # end of transforms
    w.w(0, 1).w(0, 1)  # no cache, no meta
    table = normal_code(w, {20: 2, 100: 2, 241: 2, 245: 2}, 256 + 24)
    trivial_ARBD(w, red=0, blue=0, alpha=0)
    for g in (20, 241, 245, 100):
        w.wcode(*table[g])
    ww, hh, ch, pix = decode_vp8l(w.tobytes())
    arr = np.frombuffer(pix, np.uint8).reshape(2, 2, 3)
    assert arr[0, 0, 1] == 20
    assert arr[0, 1, 1] == 5
    assert arr[1, 0, 1] == 9
    assert arr[1, 1, 1] == 101  # 100 + pred 1 (would be 100 under floor)
