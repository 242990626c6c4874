"""Progressive JPEG (T.81 Annex G) decode tests.

Strategy: this file carries a minimal progressive ENCODER — the other
direction of the same spec sections the decoder implements (spectral
selection, successive approximation, EOB runs, refinement correction
bits). Both a sequential and a progressive stream are written from the
SAME quantized coefficients; the sequential decode path is already
cross-validated against libjpeg output (test_jpeg.py), so decode
equality pins the progressive path to ground truth. A second test
feeds real pixel data through encode_jpeg's exact coefficient
computation so the comparison also runs on photographic statistics.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vechord_spark.sources.jpeg import (
    K1_CHROMA,
    K1_LUMA,
    K3_DC_CHROMA,
    K3_DC_LUMA,
    ZIGZAG,
    _BitWriter,
    _csize,
    _DCT_M,
    _HuffTable,
    decode_jpeg,
)

# ---------------------------------------------------------------------------
# Writers (test-side): emit sequential and progressive streams from a
# dict {cid: int32 array (bh_pad, bw_pad, 64)} of zigzag coefficients.
# ---------------------------------------------------------------------------

_DC_TABS = [_HuffTable(*K3_DC_LUMA), _HuffTable(*K3_DC_CHROMA)]
# The K3 baseline AC tables carry no EOBn (r<<4, r>0) symbols —
# progressive streams ship their own Huffman tables. A flat canonical
# table over all 256 run/size symbols (128 at 8 bits, 128 at 9) keeps
# the writer trivial and is a legal DHT.
_AC_BITS = [0] * 7 + [128, 128] + [0] * 7
_AC_VALS = list(range(256))
_AC_TABS = [_HuffTable(_AC_BITS, _AC_VALS), _HuffTable(_AC_BITS, _AC_VALS)]


def _headers(width, height, comps, sof_marker, restart_interval=0):
    """SOI + DQT(K1 luma/chroma) + SOFn + all four DHT tables.

    ``comps``: list of (cid, h, v, tq, hid)."""
    out = bytearray(b"\xff\xd8")
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for i, zz in enumerate((K1_LUMA, K1_CHROMA)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([i])
        out += bytes(int(x) for x in zz)
    ncomp = len(comps)
    out += sof_marker + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for cid, h, v, tq, _hid in comps:
        out += bytes([cid, (h << 4) | v, tq])
    for i, (bits, vals) in enumerate((K3_DC_LUMA, K3_DC_CHROMA)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([i])
        out += bytes(bits) + bytes(vals)
    for i in range(2):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(_AC_VALS))
        out += bytes([0x10 | i]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    return out


def _sos(selectors, ss, se, ah, al):
    ns = len(selectors)
    out = bytearray(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns))
    for cid, td, ta in selectors:
        out += bytes([cid, (td << 4) | ta])
    out += bytes([ss, se, (ah << 4) | al])
    return out


def _geometry(width, height, comps):
    hmax = max(h for _, h, _, _, _ in comps)
    vmax = max(v for _, _, v, _, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    nblocks = {}
    for cid, h, v, _tq, _hid in comps:
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        nblocks[cid] = (-(-ch // 8), -(-cw // 8))
    return hmax, vmax, mcux, mcuy, nblocks


def _emit_amplitude(w, v, s):
    w.write(v if v >= 0 else v + (1 << s) - 1, s)


def write_sequential(width, height, comps, coefs):
    """Interleaved baseline scan from given zigzag coefficients."""
    _, _, mcux, mcuy, _ = _geometry(width, height, comps)
    out = _headers(width, height, comps, b"\xff\xc0")
    out += _sos([(cid, hid, hid) for cid, _, _, _, hid in comps], 0, 63, 0, 0)
    w = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, h, v, _tq, hid in comps:
                for by in range(v):
                    for bx in range(h):
                        zz = coefs[cid][my * v + by, mx * h + bx]
                        diff = int(zz[0]) - pred[cid]
                        pred[cid] = int(zz[0])
                        t = _csize(diff)
                        code, length = _DC_TABS[hid].enc[t]
                        w.write(code, length)
                        if t:
                            _emit_amplitude(w, diff, t)
                        nz = np.nonzero(zz[1:])[0]
                        last = int(nz[-1]) + 1 if len(nz) else 0
                        run = 0
                        for k in range(1, last + 1):
                            val = int(zz[k])
                            if val == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, length = _AC_TABS[hid].enc[0xF0]
                                w.write(code, length)
                                run -= 16
                            s = _csize(val)
                            code, length = _AC_TABS[hid].enc[(run << 4) | s]
                            w.write(code, length)
                            _emit_amplitude(w, val, s)
                            run = 0
                        if last < 63:
                            code, length = _AC_TABS[hid].enc[0x00]
                            w.write(code, length)
    w.flush()
    out += w.out + b"\xff\xd9"
    return bytes(out)


def _dc_first(w, width, height, comps, scan, coefs, al, rst=None):
    _, _, mcux, mcuy, nblocks = _geometry(width, height, comps)
    pred = {cid: 0 for cid, *_ in scan}
    if len(scan) > 1:
        # one restart unit per MCU: group blocks and tick per group
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                units.append(
                    [
                        (cid, my * v + by, mx * h + bx, hid)
                        for cid, h, v, _tq, hid in scan
                        for by in range(v)
                        for bx in range(h)
                    ]
                )
    else:
        cid, _h, _v, _tq, hid = scan[0]
        bh, bw = nblocks[cid]
        units = [[(cid, by, bx, hid)] for by in range(bh) for bx in range(bw)]
    for unit in units:
        if rst is not None:
            rst.on_reset = lambda: pred.update((c, 0) for c in pred)
            rst.tick()
        for cid, by, bx, hid in unit:
            val = int(coefs[cid][by, bx, 0]) >> al  # arithmetic shift (A.4)
            diff = val - pred[cid]
            pred[cid] = val
            t = _csize(diff)
            code, length = _DC_TABS[hid].enc[t]
            w.write(code, length)
            if t:
                _emit_amplitude(w, diff, t)


def _dc_refine(w, width, height, comps, scan, coefs, al, rst=None):
    _, _, mcux, mcuy, nblocks = _geometry(width, height, comps)
    if len(scan) > 1:
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                units.append(
                    [
                        (cid, my * v + by, mx * h + bx)
                        for cid, h, v, _tq, _hid in scan
                        for by in range(v)
                        for bx in range(h)
                    ]
                )
    else:
        cid = scan[0][0]
        bh, bw = nblocks[cid]
        units = [[(cid, by, bx)] for by in range(bh) for bx in range(bw)]
    for unit in units:
        if rst is not None:
            rst.on_reset = None  # refine bits carry no predictor state
            rst.tick()
        for cid, by, bx in unit:
            w.write((int(coefs[cid][by, bx, 0]) >> al) & 1, 1)


def _point(v, al):
    """AC point transform: magnitude shift, truncation toward zero."""
    return -((-v) >> al) if v < 0 else v >> al


def _flush_eobrun(w, ac, state):
    n = state["eobrun"]
    if n == 0:
        return
    r = n.bit_length() - 1
    code, length = ac.enc[r << 4]
    w.write(code, length)
    if r:
        w.write(n - (1 << r), r)
    for bit in state["bits"]:
        w.write(bit, 1)
    state["eobrun"] = 0
    state["bits"] = []


def _ac_first(w, width, height, comps, comp, coefs, ss, se, al, rst=None):
    cid, _h, _v, _tq, hid = comp
    ac = _AC_TABS[hid]
    _, _, _, _, nblocks = _geometry(width, height, comps)
    bh, bw = nblocks[cid]
    state = {"eobrun": 0, "bits": []}
    for by in range(bh):
        for bx in range(bw):
            if rst is not None:
                rst.on_reset = lambda: _flush_eobrun(w, ac, state)
                rst.tick()
            zz = coefs[cid][by, bx]
            band = [_point(int(zz[k]), al) for k in range(ss, se + 1)]
            nz = [i for i, v in enumerate(band) if v]
            if not nz:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    _flush_eobrun(w, ac, state)
                continue
            _flush_eobrun(w, ac, state)
            run = 0
            for i in range(nz[-1] + 1):
                v = band[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac.enc[0xF0]
                    w.write(code, length)
                    run -= 16
                s = _csize(v)
                code, length = ac.enc[(run << 4) | s]
                w.write(code, length)
                _emit_amplitude(w, v, s)
                run = 0
            if nz[-1] < len(band) - 1:
                state["eobrun"] += 1
    _flush_eobrun(w, ac, state)


def _ac_refine(w, width, height, comps, comp, coefs, ss, se, al, rst=None):
    """Encoder side of G.1.2.3 (the shape of libjpeg's
    encode_mcu_AC_refine): newly-nonzero coefficients emit (run, 1) +
    sign; already-nonzero ones buffer their Al-th magnitude bit, and
    the buffered bits flush after the symbol that ends their region
    (next emitted coefficient, ZRL, or the EOB-run flush)."""
    cid, _h, _v, _tq, hid = comp
    ac = _AC_TABS[hid]
    _, _, _, _, nblocks = _geometry(width, height, comps)
    bh, bw = nblocks[cid]
    state = {"eobrun": 0, "bits": []}
    for by in range(bh):
        for bx in range(bw):
            if rst is not None:
                rst.on_reset = lambda: _flush_eobrun(w, ac, state)
                rst.tick()
            zz = coefs[cid][by, bx]
            absval = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob = 0  # index AFTER the last newly-nonzero coefficient
            for i, v in enumerate(absval):
                if v == 1:
                    eob = i + 1
            run = 0
            pending: list[int] = []  # correction bits since last symbol
            for i, v in enumerate(absval):
                if v == 0:
                    run += 1
                    continue
                while run > 15 and i < eob:
                    _flush_eobrun(w, ac, state)
                    code, length = ac.enc[0xF0]
                    w.write(code, length)
                    run -= 16
                    for bit in pending:
                        w.write(bit, 1)
                    pending = []
                if v > 1:  # history coefficient: correction bit
                    pending.append(v & 1)
                    continue
                _flush_eobrun(w, ac, state)
                code, length = ac.enc[(run << 4) | 1]
                w.write(code, length)
                w.write(1 if int(zz[ss + i]) > 0 else 0, 1)
                for bit in pending:
                    w.write(bit, 1)
                pending = []
                run = 0
            if run > 0 or pending:
                state["eobrun"] += 1
                state["bits"].extend(pending)
                if state["eobrun"] == 0x7FFF:
                    _flush_eobrun(w, ac, state)
    _flush_eobrun(w, ac, state)


class _Restarter:
    """Unit counter that injects byte-aligned RSTn markers every
    ``interval`` units and runs the scan-state reset hook."""

    def __init__(self, w, interval):
        self.w = w
        self.interval = interval
        self.n = 0
        self.m = 0
        self.on_reset = None

    def tick(self):
        if self.interval and self.n and self.n % self.interval == 0:
            if self.on_reset:
                self.on_reset()
            self.w.flush()
            self.w.out += bytes([0xFF, 0xD0 + self.m])
            self.m = (self.m + 1) % 8
        self.n += 1


def write_progressive(width, height, comps, coefs, script, restart_interval=0):
    """``script``: list of (cids, ss, se, ah, al) scans."""
    out = _headers(width, height, comps, b"\xff\xc2", restart_interval)
    by_cid = {c[0]: c for c in comps}
    for cids, ss, se, ah, al in script:
        scan = [by_cid[cid] for cid in cids]
        out += _sos([(c[0], c[4], c[4]) for c in scan], ss, se, ah, al)
        w = _BitWriter()
        rst = _Restarter(w, restart_interval)
        if ss == 0:
            if ah == 0:
                _dc_first(w, width, height, comps, scan, coefs, al, rst)
            else:
                _dc_refine(w, width, height, comps, scan, coefs, al, rst)
        else:
            assert len(scan) == 1
            if ah == 0:
                _ac_first(w, width, height, comps, scan[0], coefs, ss, se, al, rst)
            else:
                _ac_refine(w, width, height, comps, scan[0], coefs, ss, se, al, rst)
        w.flush()
        out += w.out
    return bytes(out) + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Coefficient sources
# ---------------------------------------------------------------------------


def _random_coefs(width, height, comps, seed, dense=False):
    """Plausible quantized-DCT statistics: dense DC, sparse AC with
    occasional large magnitudes (exercises ZRL, multi-bit refinement,
    and long EOB runs)."""
    rng = np.random.default_rng(seed)
    _, _, mcux, mcuy, _ = _geometry(width, height, comps)
    coefs = {}
    for cid, h, v, _tq, _hid in comps:
        shape = (mcuy * v, mcux * h, 64)
        c = np.zeros(shape, dtype=np.int32)
        p_nz = 0.5 if dense else 0.12
        mask = rng.random(shape) < p_nz
        mask[..., 0] = False
        mag = rng.integers(1, 30, shape)
        big = rng.random(shape) < 0.02
        # cap below 1024: the K3 AC tables encode sizes 1..10 only
        mag = np.where(big, mag * 30, mag)
        sign = np.where(rng.random(shape) < 0.5, -1, 1)
        c = np.where(mask, mag * sign, c).astype(np.int32)
        c[..., 0] = rng.integers(-200, 200, shape[:2])
        coefs[cid] = c
    return coefs


_SCRIPT_FULL = [
    # cjpeg-like script: DC first (interleaved) at Al=1, luma AC split
    # into two spectral bands at Al=2, chroma AC at Al=1, then every
    # refinement pass down to Al=0, DC refine last
    ([1, 2, 3], 0, 0, 0, 1),
    ([1], 1, 5, 0, 2),
    ([3], 1, 63, 0, 1),
    ([2], 1, 63, 0, 1),
    ([1], 6, 63, 0, 2),
    ([1], 1, 63, 2, 1),
    ([1, 2, 3], 0, 0, 1, 0),
    ([3], 1, 63, 1, 0),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
]

_COMPS_444 = [(1, 1, 1, 0, 0), (2, 1, 1, 1, 1), (3, 1, 1, 1, 1)]
_COMPS_420 = [(1, 2, 2, 0, 0), (2, 1, 1, 1, 1), (3, 1, 1, 1, 1)]
_COMPS_GRAY = [(1, 1, 1, 0, 0)]


@pytest.mark.parametrize(
    ("comps", "width", "height", "seed"),
    [
        (_COMPS_444, 48, 32, 1),
        (_COMPS_444, 41, 27, 2),  # partial edge MCUs
        (_COMPS_420, 48, 32, 3),  # subsampled: MCU grid != block grid
        (_COMPS_420, 37, 22, 4),
        (_COMPS_GRAY, 24, 24, 5),
    ],
)
def test_progressive_matches_sequential(comps, width, height, seed):
    coefs = _random_coefs(width, height, comps, seed)
    seq = decode_jpeg(write_sequential(width, height, comps, coefs))
    cids = {c[0] for c in comps}
    script = [
        ([c for c in scan_cids if c in cids], ss, se, ah, al)
        for scan_cids, ss, se, ah, al in _SCRIPT_FULL
        if any(c in cids for c in scan_cids)
    ]
    prog = decode_jpeg(write_progressive(width, height, comps, coefs, script))
    assert prog == seq


def test_progressive_dense_refinement_paths():
    """Dense coefficients push the refinement scans through the
    correction-bit and ZRL-inside-refine branches."""
    comps = _COMPS_444
    coefs = _random_coefs(40, 24, comps, 9, dense=True)
    seq = decode_jpeg(write_sequential(40, 24, comps, coefs))
    prog = decode_jpeg(write_progressive(40, 24, comps, coefs, _SCRIPT_FULL))
    assert prog == seq


def test_progressive_deep_approximation():
    """Three successive-approximation levels on one band."""
    comps = _COMPS_GRAY
    coefs = _random_coefs(32, 16, comps, 11)
    script = [
        ([1], 0, 0, 0, 2),
        ([1], 1, 63, 0, 3),
        ([1], 1, 63, 3, 2),
        ([1], 1, 63, 2, 1),
        ([1], 0, 0, 2, 1),
        ([1], 0, 0, 1, 0),
        ([1], 1, 63, 1, 0),
    ]
    seq = decode_jpeg(write_sequential(32, 16, comps, coefs))
    prog = decode_jpeg(write_progressive(32, 16, comps, coefs, script))
    assert prog == seq


def test_progressive_real_image_roundtrip():
    """Photographic-statistics path: compute the encoder's own
    quantized coefficients for a synthetic gradient+texture image and
    compare the progressive decode to the baseline decode of
    encode_jpeg's output for the SAME image (coefficient computation
    replicated bit-for-bit from encode_jpeg)."""
    from vechord_spark.sources.jpeg import encode_jpeg

    h = w = 40
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 / w),
            (yy * 255 / h),
            128 + 90 * np.sin(xx / 3.0) * np.cos(yy / 5.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    seq = decode_jpeg(encode_jpeg(w, h, 3, img.tobytes()))

    # replicate encode_jpeg's coefficient computation (4:4:4, K1)
    rf, gf, bf = (img[..., i].astype(np.float64) for i in range(3))
    planes = [
        0.299 * rf + 0.587 * gf + 0.114 * bf,
        -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0,
        0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0,
    ]
    q_raster = []
    for zz in (K1_LUMA, K1_CHROMA):
        r = np.zeros(64, dtype=np.int32)
        r[ZIGZAG] = zz
        q_raster.append(r.reshape(8, 8))
    mt = _DCT_M
    comps = _COMPS_444
    coefs = {cid: np.zeros((h // 8, w // 8, 64), np.int32) for cid, *_ in comps}
    for ci, (cid, _h, _v, tq, _hid) in enumerate(comps):
        for by in range(h // 8):
            for bx in range(w // 8):
                blk = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                qz = np.round((mt @ (blk - 128.0) @ mt.T) / q_raster[tq])
                coefs[cid][by, bx] = qz.astype(np.int32).reshape(-1)[ZIGZAG]
    prog = decode_jpeg(write_progressive(w, h, comps, coefs, _SCRIPT_FULL))
    assert prog == seq


def test_progressive_with_restart_markers():
    """RSTn inside progressive scans: DC predictor and EOB-run state
    reset at every restart interval (decoder resets both)."""
    comps = _COMPS_444
    coefs = _random_coefs(48, 40, comps, 21)
    seq = decode_jpeg(write_sequential(48, 40, comps, coefs))
    prog = decode_jpeg(
        write_progressive(48, 40, comps, coefs, _SCRIPT_FULL, restart_interval=3)
    )
    assert prog == seq


def test_decode_image_routes_progressive():
    """The multimodal decode path serves progressive JPEG through the
    spec codec — no Pillow fallback needed."""
    from vechord_spark.sources.multimodal import decode_image

    comps = _COMPS_444
    coefs = _random_coefs(24, 16, comps, 33)
    data = write_progressive(24, 16, comps, coefs, _SCRIPT_FULL)
    img = decode_image(data)
    w, h, ch, raw = decode_jpeg(data)
    assert (img.width, img.height, img.channels) == (w, h, ch)
    assert img.pixels == raw
