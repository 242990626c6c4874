"""WebP-lossless (VP8L) decoder — dependency-free, from the public
"WebP Lossless Bitstream Specification" (Google, 2012-2023).

Round-10 addition closing the last commonly-crawled raster format that
was env-gated behind Pillow (reference stores crawl payloads as opaque
bytes; this engine's multimodal columns decode them in mapInPandas
stages — see sources/multimodal.py, reference vechord/spec.py:193-219
for the typed-bytes column contract).

Scope — the full lossless feature set:

- LSB-first bit reader over the VP8L chunk payload
- canonical prefix codes, both the "simple" (1-2 symbol) and the
  normal (code-length-coded) variants, incl. the max_symbol cap and
  16/17/18 repeat tokens
- color cache (hash 0x1e35a7bd, 1..11 bits)
- meta prefix codes (entropy image) for the top-level ARGB image
- LZ77 backward references with the 40-symbol distance alphabet and
  the 120-entry 2D distance-to-plane-code neighbor map
- all four transforms, inverted in reverse bitstream order:
  PREDICTOR (14 modes), COLOR (signed 3.5 fixed-point deltas),
  SUBTRACT_GREEN, COLOR_INDEXING (incl. sub-byte packed indices for
  palettes of <= 16 colors)

The VP8X ALPH chunk (the alpha plane of a LOSSY file, which is
VP8L-coded) also decodes here — ``decode_webp_alpha`` — including the
three alpha row filters; it is validated against a REAL libwebp-
encoded stream (CPython's imghdrdata python.webp), which is what
caught the kCodeLengthCodeOrder transposition a self-round-tripping
writer can never catch. Lossy VP8 COLOR stays honestly env-gated in
sources/multimodal.py — a DCT/bool-coder DSP is out of scope here.

Hostile-input posture matches sources/rasters.py: dimensions are
bounds-checked against MAX_PIXELS before any allocation, every read is
length-checked (truncation raises ValueError, never IndexError), and
malformed prefix codes / overlong repeats / out-of-range cache or
distance references raise ValueError with a stable message shape.

Validation: tests/test_vp8l.py round-trips bitstreams produced by its
own spec-side encoder (same strategy as the GIF/TIFF/JPEG writers —
built from the spec text, not from libwebp) and pins hand-computed
pixel values; the first rows of the distance neighbor map are pinned
against the table printed in the spec.
"""

from __future__ import annotations

import struct

import numpy as np

from vechord_spark.sources.rasters import check_dims

# ---------------------------------------------------------------------------
# bit reader
# ---------------------------------------------------------------------------


class BitReader:
    """LSB-first bit reader (spec §4: values are little-endian packed,
    prefix-code bits arrive through the same stream)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > 8 * len(self.data):
            raise ValueError("truncated VP8L stream")
        v = 0
        pos = self.pos
        for i in range(n):
            byte = self.data[(pos + i) >> 3]
            v |= ((byte >> ((pos + i) & 7)) & 1) << i
        self.pos = end
        return v

    def read_bit(self) -> int:
        if self.pos >= 8 * len(self.data):
            raise ValueError("truncated VP8L stream")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

# spec §5.2.2: order in which code-length code lengths are stored —
# note the repeat-previous token 16 sits at position 8, BETWEEN 5 and
# 6 (caught decoding a real libwebp-encoded stream: with 16 misplaced
# at the end, a 9-entry header assigns its short code to literal 6 and
# every repeat downstream misparses)
CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

MAX_CODE_LENGTH = 15


class PrefixCode:
    """Canonical prefix code decoded bit-by-bit (codes are read MSB
    first; DEFLATE-style canonical assignment per the spec)."""

    __slots__ = ("table", "single")

    def __init__(self, code_lengths) -> None:
        nz = [(l, s) for s, l in enumerate(code_lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L prefix code with no symbols")
        if len(nz) == 1:
            # single-symbol code: zero bits per symbol
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        # Kraft check: a usable code must be complete (sum 2^-l == 1);
        # over-subscribed codes are ambiguous, incomplete ones can hang
        kraft = sum(1 << (MAX_CODE_LENGTH - l) for l, _ in nz)
        if kraft != 1 << MAX_CODE_LENGTH:
            raise ValueError("invalid VP8L prefix code (not complete)")
        table: dict[tuple[int, int], int] = {}
        code = 0
        for length in range(1, MAX_CODE_LENGTH + 1):
            for l, sym in sorted(nz):
                if l == length:
                    table[(length, code)] = sym
                    code += 1
            code <<= 1
        self.table = table

    def decode(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, MAX_CODE_LENGTH + 1):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code bits")


def _read_code_lengths(br: BitReader, lens_code: PrefixCode, alphabet: int) -> list[int]:
    """spec §5.2.2 ReadHuffmanCodeLengths: symbol code lengths through
    the code-length code, with 16/17/18 repeats and the optional
    max_symbol cap."""
    if br.read_bit():  # use length
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    symbol = 0
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = lens_code.decode(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev = code_len
        else:
            if code_len == 16:
                repeat, value = 3 + br.read(2), prev
            elif code_len == 17:
                repeat, value = 3 + br.read(3), 0
            else:  # 18
                repeat, value = 11 + br.read(7), 0
            if symbol + repeat > alphabet:
                raise ValueError("VP8L code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = value
                symbol += 1
    return lengths


def read_prefix_code(br: BitReader, alphabet: int) -> PrefixCode:
    """spec §5.2.1/§5.2.2: one prefix code, simple or normal form."""
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = [0] * alphabet
        if sym0 >= alphabet:
            raise ValueError("VP8L simple-code symbol outside alphabet")
        if num_symbols == 1:
            lengths[sym0] = 1  # PrefixCode turns 1-symbol into 0-bit
        else:
            sym1 = br.read(8)
            if sym1 >= alphabet or sym1 == sym0:
                raise ValueError("VP8L simple-code symbol outside alphabet")
            lengths[sym0] = lengths[sym1] = 1
        return PrefixCode(lengths)
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.read(3)
    lens_code = PrefixCode(cl_lengths)
    return PrefixCode(_read_code_lengths(br, lens_code, alphabet))


# ---------------------------------------------------------------------------
# LZ77 prefix values + distance neighbor map
# ---------------------------------------------------------------------------


def _lz77_value(br: BitReader, prefix: int) -> int:
    """spec §4.2.2: prefix-coded length/distance value."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


# spec §4.2.2: codes 1..120 map to 2D neighbors (xoffset, yoffset) of
# the current pixel. The table is GENERATIVE (the byte-packed form in
# the reference decoder encodes y in a 0..7 nibble and x in a -7..8
# nibble, excluding the y==0, x<=0 positions that cannot point
# backward — exactly 120 cells), ordered by squared Euclidean distance
# ascending, ties by y descending, positive x before negative. The
# first three spec-printed rows are pinned verbatim in the tests as
# the independent check of this construction.
DISTANCE_MAP = tuple(
    sorted(
        (
            (x, y)
            for y in range(8)
            for x in range(-7, 9)
            if y > 0 or x > 0
        ),
        key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0),
    )
)
if len(DISTANCE_MAP) != 120:  # pragma: no cover - construction invariant
    raise AssertionError("VP8L distance map must have exactly 120 entries")


def _plane_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    xoff, yoff = DISTANCE_MAP[code - 1]
    return max(1, yoff * xsize + xoff)


# ---------------------------------------------------------------------------
# entropy-coded ARGB image (spec §5)
# ---------------------------------------------------------------------------

_GREEN_LITERALS = 256
_LENGTH_CODES = 24
_DISTANCE_ALPHABET = 40


def _decode_entropy_image(
    br: BitReader, w: int, h: int, top_level: bool
) -> np.ndarray:
    """One spatially-coded image: returns uint32 ARGB of shape (h*w,).
    ``top_level`` enables the meta-prefix (entropy image) read — the
    transform/palette sub-images never carry one (spec §5.2.3)."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid VP8L color-cache size")
    meta = None
    meta_bits = 0
    n_groups = 1
    if top_level and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        # meta prefix-code id = (red << 8) | green
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alphabet = _GREEN_LITERALS + _LENGTH_CODES + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                read_prefix_code(br, green_alphabet),
                read_prefix_code(br, 256),  # red
                read_prefix_code(br, 256),  # blue
                read_prefix_code(br, 256),  # alpha
                read_prefix_code(br, _DISTANCE_ALPHABET),
            )
        )
    cache = [0] * cache_size
    out = np.zeros(w * h, dtype=np.uint32)
    npix = w * h
    pos = 0
    if meta is not None:
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
    g = groups[0]
    while pos < npix:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[int(meta[(y >> meta_bits) * mw + (x >> meta_bits)])]
        sym = g[0].decode(br)
        if sym < _GREEN_LITERALS:
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            pix = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[pos] = pix
            if cache_size:
                cache[(0x1E35A7BD * pix & 0xFFFFFFFF) >> (32 - cache_bits)] = pix
            pos += 1
        elif sym < _GREEN_LITERALS + _LENGTH_CODES:
            length = _lz77_value(br, sym - _GREEN_LITERALS)
            dist_code = _lz77_value(br, g[4].decode(br))
            dist = _plane_distance(dist_code, w)
            if dist > pos:
                raise ValueError("VP8L backward reference before image start")
            if pos + length > npix:
                raise ValueError("VP8L backward reference overruns image")
            for _ in range(length):
                pix = int(out[pos - dist])
                out[pos] = pix
                if cache_size:
                    cache[(0x1E35A7BD * pix & 0xFFFFFFFF) >> (32 - cache_bits)] = pix
                pos += 1
        else:
            idx = sym - _GREEN_LITERALS - _LENGTH_CODES
            out[pos] = cache[idx]
            pos += 1
    return out


# ---------------------------------------------------------------------------
# transforms (spec §3), inverse application
# ---------------------------------------------------------------------------


def _argb_planes(img: np.ndarray):
    return (
        (img >> 24) & 0xFF,
        (img >> 16) & 0xFF,
        (img >> 8) & 0xFF,
        img & 0xFF,
    )


def _pack(a, r, g, b) -> np.ndarray:
    return (
        (a.astype(np.uint32) << 24)
        | ((r.astype(np.uint32) & 0xFF) << 16)
        | ((g.astype(np.uint32) & 0xFF) << 8)
        | (b.astype(np.uint32) & 0xFF)
    )


def _avg2(a: int, b: int) -> int:
    # per-channel average packed in uint32 (no cross-channel carry)
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _sub_pixels(a: int, b: int):
    return [((a >> s) & 0xFF, (b >> s) & 0xFF) for s in (24, 16, 8, 0)]


def _select(l: int, t: int, tl: int) -> int:
    p_l = 0
    p_t = 0
    for s in (24, 16, 8, 0):
        lc, tc, tlc = (l >> s) & 0xFF, (t >> s) & 0xFF, (tl >> s) & 0xFF
        p = lc + tc - tlc
        p_l += abs(p - lc)
        p_t += abs(p - tc)
    return l if p_l < p_t else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for s in (24, 16, 8, 0):
        c = ((l >> s) & 0xFF) + ((t >> s) & 0xFF) - ((tl >> s) & 0xFF)
        out |= max(0, min(255, c)) << s
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for s in (24, 16, 8, 0):
        a = (ave >> s) & 0xFF
        b = (tl >> s) & 0xFF
        d = a - b
        # the spec's (a - b) / 2 is C int division: TRUNCATES toward
        # zero — Python's // floors, which differs for negative odd
        # deltas (-3/2 is -1 in C, -2 under //)
        c = a + (abs(d) // 2 if d >= 0 else -(abs(d) // 2))
        out |= max(0, min(255, c)) << s
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def _add_pixels(a: int, b: int) -> int:
    out = 0
    for s in (24, 16, 8, 0):
        out |= (((a >> s) + (b >> s)) & 0xFF) << s
    return out


def _inv_predictor(img: np.ndarray, w: int, h: int, bits: int, modes: np.ndarray) -> np.ndarray:
    """spec §3.2: residuals -> pixels. modes is the sub-image's green
    channel, shape (mh*mw,). Scalar loop — predictor rows carry a
    serial dependency; the test images are small and crawl-side decode
    happens inside Arrow-batched workers where per-image latency, not
    throughput of one giant image, is the budget."""
    mw = (w + (1 << bits) - 1) >> bits
    out = img.astype(np.int64).copy()
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[pos - 1])  # L
            elif x == 0:
                pred = int(out[pos - w])  # T
            else:
                mode = int(modes[(y >> bits) * mw + (x >> bits)]) & 0xFF
                l = int(out[pos - 1])
                t = int(out[pos - w])
                tl = int(out[pos - w - 1])
                # top-right of the rightmost column is the first pixel
                # of the CURRENT row (contiguous-buffer rule the spec
                # inherited from the reference decoder: one past the
                # end of row y-1 IS (0, y), already decoded)
                tr = int(out[pos - w + 1]) if x + 1 < w else int(out[y * w])
                pred = _predict(mode, l, t, tr, tl)
            out[pos] = _add_pixels(int(out[pos]), pred)
    return out.astype(np.uint32)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """signed 3.5 fixed-point color-transform delta: int8(t)*int8(c)>>5
    (arithmetic shift)."""
    ts = t.astype(np.int64)
    ts = np.where(ts >= 128, ts - 256, ts)
    cs = c.astype(np.int64)
    cs = np.where(cs >= 128, cs - 256, cs)
    return (ts * cs) >> 5


def _inv_color_transform(img: np.ndarray, w: int, h: int, bits: int, elems: np.ndarray) -> np.ndarray:
    mw = (w + (1 << bits) - 1) >> bits
    ys, xs = np.divmod(np.arange(w * h, dtype=np.int64), w)
    eidx = (ys >> bits) * mw + (xs >> bits)
    e = elems[eidx]
    # element packing: green_to_red in the BLUE byte, green_to_blue in
    # the GREEN byte, red_to_blue in the RED byte (spec §3.3)
    g2r = e & 0xFF
    g2b = (e >> 8) & 0xFF
    r2b = (e >> 16) & 0xFF
    a, r, g, b = _argb_planes(img)
    r = (r + _ct_delta(g2r, g)) & 0xFF
    b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
    return _pack(a, r, g, b)


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    a, r, g, b = _argb_planes(img)
    return _pack(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _read_palette(br: BitReader, size: int) -> np.ndarray:
    deltas = _decode_entropy_image(br, size, 1, False)
    # entries are component-wise deltas off the previous entry
    pal = np.zeros(size, dtype=np.uint32)
    prev = 0
    for i in range(size):
        prev = _add_pixels(prev, int(deltas[i]))
        pal[i] = prev
    return pal


def _inv_palette(img: np.ndarray, w: int, h: int, packed_w: int, pal: np.ndarray, width_bits: int) -> np.ndarray:
    """spec §3.4: indices live in the GREEN channel; palettes of <= 16
    colors pack multiple indices per green byte, LSB first."""
    greens = ((img >> 8) & 0xFF).astype(np.int64).reshape(h, packed_w)
    if width_bits:
        per = 1 << width_bits
        ibits = 8 >> width_bits
        mask = (1 << ibits) - 1
        cols = np.arange(w, dtype=np.int64)
        idx = (greens[:, cols >> width_bits] >> ((cols % per) * ibits)) & mask
    else:
        idx = greens[:, :w]
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("VP8L palette index outside palette")
    return pal[idx.reshape(-1)]


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------

_PREDICTOR, _COLOR, _SUBTRACT_GREEN, _COLOR_INDEXING = 0, 1, 2, 3


def decode_vp8l(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a VP8L chunk payload to ``(width, height, channels,
    rgb/rgba bytes)``. channels is 4 when the stream carries any
    non-255 alpha, else 3 (matching the other rasters decoders'
    contract in sources/rasters.py)."""
    if len(payload) < 5 or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = BitReader(payload)
    br.read(8)  # signature
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha hint (informative)
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    check_dims(w, h, "VP8L")
    img = _decode_argb_stream(br, w, h)
    a, r, g, b = _argb_planes(img)
    if bool((a != 255).any()):
        rgba = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
        return w, h, 4, rgba.tobytes()
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


def _decode_argb_stream(br: BitReader, w: int, h: int) -> np.ndarray:
    """The headerless VP8L image stream (transforms + spatially-coded
    image + inverse transforms) — shared by the VP8L chunk body and
    the ALPH chunk's compressed alpha plane (which is this exact
    stream without the signature/size header; WebP container spec
    "Alpha", compression method 1)."""
    transforms = []  # (type, payload...) in read order
    seen = set()
    xsize = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == _PREDICTOR or ttype == _COLOR:
            bits = br.read(3) + 2
            mw = (xsize + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, mw, mh, False)
            transforms.append((ttype, bits, sub))
        elif ttype == _SUBTRACT_GREEN:
            transforms.append((ttype,))
        else:  # COLOR_INDEXING
            size = br.read(8) + 1
            pal = _read_palette(br, size)
            if size <= 2:
                width_bits = 3
            elif size <= 4:
                width_bits = 2
            elif size <= 16:
                width_bits = 1
            else:
                width_bits = 0
            packed_w = (xsize + (1 << width_bits) - 1) >> width_bits
            transforms.append((ttype, pal, width_bits, xsize))
            xsize = packed_w  # the coded image is the packed width

    img = _decode_entropy_image(br, xsize, h, True)

    for t in reversed(transforms):
        if t[0] == _COLOR_INDEXING:
            _, pal, width_bits, real_w = t
            img = _inv_palette(img, real_w, h, xsize, pal, width_bits)
            xsize = real_w
        elif t[0] == _SUBTRACT_GREEN:
            img = _inv_subtract_green(img)
        elif t[0] == _COLOR:
            _, bits, sub = t
            img = _inv_color_transform(img, xsize, h, bits, sub)
        else:  # predictor
            _, bits, sub = t
            modes = (sub >> 8) & 0xFF
            img = _inv_predictor(img, xsize, h, bits, modes)
    return img


# ---------------------------------------------------------------------------
# ALPH chunk: the alpha plane of a lossy (VP8X + VP8) WebP
# ---------------------------------------------------------------------------


def _inv_alpha_filter(plane: np.ndarray, w: int, h: int, method: int) -> np.ndarray:
    """WebP container spec "Alpha filtering": invert the per-pixel
    predictor. Borders: (0,0) predicts 0; the rest of row 0 predicts
    LEFT; the rest of column 0 predicts TOP; interior predicts by
    method (1 horizontal = left, 2 vertical = top, 3 gradient =
    clamp(left + top - topleft))."""
    if method == 0:
        return plane
    if method not in (1, 2, 3):
        raise ValueError(f"unknown ALPH filter method {method}")
    out = plane.astype(np.int64).reshape(h, w)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            elif method == 1:
                pred = out[y, x - 1]
            elif method == 2:
                pred = out[y - 1, x]
            else:
                g = out[y, x - 1] + out[y - 1, x] - out[y - 1, x - 1]
                pred = min(255, max(0, g))
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8).reshape(-1)


def decode_alph(payload: bytes, w: int, h: int) -> bytes:
    """Decode an ALPH chunk to ``h*w`` alpha bytes. Header byte:
    compression (bits 0-1: 0 raw, 1 VP8L), filtering (bits 2-3),
    pre-processing (bits 4-5, encode-side level reduction — nothing to
    invert). Compressed payloads are a headerless VP8L stream whose
    GREEN channel carries the alpha values."""
    if not payload:
        raise ValueError("empty ALPH chunk")
    check_dims(w, h, "ALPH")
    head = payload[0]
    method = head & 0x03
    filt = (head >> 2) & 0x03
    if method == 0:
        raw = payload[1 : 1 + w * h]
        if len(raw) < w * h:
            raise ValueError("truncated raw ALPH payload")
        plane = np.frombuffer(raw, np.uint8)
    elif method == 1:
        br = BitReader(payload[1:])
        img = _decode_argb_stream(br, w, h)
        plane = ((img >> 8) & 0xFF).astype(np.uint8)
    else:
        raise ValueError(f"unknown ALPH compression method {method}")
    return _inv_alpha_filter(plane, w, h, filt).tobytes()


def decode_webp_alpha(data: bytes) -> tuple[int, int, bytes]:
    """Extract the alpha plane of an extended (VP8X) WebP whose color
    is lossy VP8: ``(width, height, alpha bytes)``. The RGB plane
    stays env-gated (it needs a VP8 DSP), but the alpha plane is
    VP8L-coded and decodes here for real — e.g. CPython's
    imghdrdata python.webp."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP stream")
    pos = 12
    dims = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WEBP chunk")
        if tag == b"VP8X":
            if size < 10:
                raise ValueError("short VP8X chunk")
            w = 1 + int.from_bytes(body[4:7], "little")
            h = 1 + int.from_bytes(body[7:10], "little")
            dims = (w, h)
        elif tag == b"ALPH":
            if dims is None:
                raise ValueError("ALPH chunk before VP8X dimensions")
            return dims[0], dims[1], decode_alph(body, dims[0], dims[1])
        elif tag == b"VP8L":
            # lossless files carry alpha inline, not in ALPH
            w, h, ch, pix = decode_vp8l(body)
            plane = (
                pix[3::4] if ch == 4 else bytes([255]) * (w * h)
            )
            return w, h, bytes(plane)
        pos += 8 + size + (size & 1)
    raise ValueError("WEBP container without an alpha source")


def decode_webp_lossless(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a standalone lossless .webp file (RIFF container with a
    VP8L chunk — the simple lossless layout; VP8X-extended lossless
    also resolves if its image chunk is VP8L). Lossy VP8 payloads
    raise NotImplementedError naming the gate, matching the
    multimodal env-gate contract."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP stream")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WEBP chunk")
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 decode requires an external codec (install "
                "Pillow with libwebp); only VP8L lossless decodes here"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WEBP container without an image chunk")
