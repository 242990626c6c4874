"""Baseline JPEG codec (sources/jpeg.py): spec pins, encoder/decoder
round-trips, real-file cross-validation, multimodal integration."""

import os

import numpy as np
import pytest

from vechord_spark.sources.jpeg import (
    ZIGZAG,
    _dct_matrix,
    _extend,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0**2 / max(mse, 1e-9))


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 / max(w - 1, 1)), (yy * 255 / max(h - 1, 1)), ((xx + yy) % 32) * 8],
        axis=-1,
    ).astype(np.uint8)


def test_zigzag_spec_pin():
    # T.81 Figure A.6: first and last diagonal walks
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(ZIGZAG[-4:]) == [47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_dct_matrix_orthonormal():
    m = _dct_matrix()
    assert np.allclose(m @ m.T, np.eye(8), atol=1e-12)


def test_extend_spec_examples():
    # T.81 F.12: low half of a t-bit magnitude is negative
    assert _extend(0, 0) == 0
    assert _extend(0, 1) == -1
    assert _extend(1, 1) == 1
    assert _extend(0b011, 3) == -4
    assert _extend(0b100, 3) == 4
    assert _extend(0b111, 3) == 7


def test_roundtrip_rgb_gradient():
    img = _gradient(40, 56)
    data = encode_jpeg(56, 40, 3, img.tobytes())
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    w, h, ch, raw = decode_jpeg(data)
    assert (w, h, ch) == (56, 40, 3)
    out = np.frombuffer(raw, dtype=np.uint8).reshape(40, 56, 3)
    assert _psnr(out, img) >= 26.0


def test_roundtrip_grayscale():
    yy, xx = np.mgrid[0:24, 0:24]
    g = ((xx * 7 + yy * 5) % 256).astype(np.uint8)
    data = encode_jpeg(24, 24, 1, g.tobytes())
    w, h, ch, raw = decode_jpeg(data)
    assert (w, h, ch) == (24, 24, 1)
    out = np.frombuffer(raw, dtype=np.uint8).reshape(24, 24)
    assert _psnr(out, g) >= 20.0


def test_roundtrip_odd_dimensions():
    """Non-multiple-of-8 sizes exercise the padded partial blocks."""
    img = _gradient(9, 13)
    data = encode_jpeg(13, 9, 3, img.tobytes())
    w, h, ch, raw = decode_jpeg(data)
    assert (w, h, ch) == (13, 9, 3)
    out = np.frombuffer(raw, dtype=np.uint8).reshape(9, 13, 3)
    assert _psnr(out, img) >= 22.0


def test_flat_color_is_near_exact():
    img = np.full((16, 16, 3), (200, 30, 90), dtype=np.uint8)
    data = encode_jpeg(16, 16, 3, img.tobytes())
    _, _, _, raw = decode_jpeg(data)
    out = np.frombuffer(raw, dtype=np.uint8).reshape(16, 16, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_decode_errors():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # a progressive SOF2 header with no scan is truncated, not garbled
    # (full progressive decode is covered by test_jpeg_progressive.py)
    import struct

    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
    )
    with pytest.raises(ValueError):
        decode_jpeg(sof2)
    # arithmetic-coded (SOF9) stays an explicit NotImplementedError
    sof9 = (
        b"\xff\xd8"
        + b"\xff\xc9"
        + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(sof9)


# CPython's own test-image corpus (Lib/test/imghdrdata in the source
# tree): python.jpg is libjpeg-encoded and python.png is its lossless
# twin — an independent-encoder ground truth shipped with the
# interpreter when the test package is installed.
import sys as _sys

_IMGHDR = (
    f"{_sys.base_prefix}/lib/python{_sys.version_info[0]}."
    f"{_sys.version_info[1]}/test/imghdrdata"
)


@pytest.mark.skipif(
    not os.path.exists(f"{_IMGHDR}/python.jpg"), reason="reference images absent"
)
def test_decodes_real_libjpeg_file_against_png_truth():
    """Cross-validation against an INDEPENDENT encoder: a libjpeg-made
    file whose lossless PNG twin ships alongside it — our JPEG decode
    must land within lossy-compression distance of the PNG pixels
    (a broken IDCT/Huffman path lands at single-digit PSNR)."""
    from vechord_spark.sources.multimodal import _png_decode

    jpg = open(f"{_IMGHDR}/python.jpg", "rb").read()
    png = open(f"{_IMGHDR}/python.png", "rb").read()
    w, h, ch, raw = decode_jpeg(jpg)
    ref = _png_decode(png)
    assert (w, h) == (ref.width, ref.height)
    a = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)
    b = np.frombuffer(ref.pixels, dtype=np.uint8).reshape(
        ref.height, ref.width, ref.channels
    )[..., :3]
    assert _psnr(a, b) >= 18.0


def test_multimodal_decode_image_takes_jpeg():
    from vechord_spark.sources.multimodal import decode_image, resize_image

    img = _gradient(32, 32)
    data = encode_jpeg(32, 32, 3, img.tobytes())
    dec = decode_image(data)
    assert (dec.width, dec.height, dec.channels) == (32, 32, 3)
    # resize path: JPEG in -> PNG bytes out
    png = resize_image(data, 8, 8)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_12bit_precision_raises_not_silently_garbles():
    import struct

    sof1_12bit = (
        b"\xff\xd8"
        + b"\xff\xc1"
        + struct.pack(">HBHHB", 11, 12, 8, 8, 1)
        + bytes([1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(sof1_12bit)


def test_review_pass_validations():
    """Round-9b review findings: zero sampling factors, 4-component
    frames, FF fill bytes, and multi-scan sequential files."""
    import struct

    import numpy as np

    from vechord_spark.sources.jpeg import encode_jpeg

    good = encode_jpeg(8, 8, 3, bytes(8 * 8 * 3))

    # hv = 0x00 must be a decode ERROR (was ZeroDivisionError)
    sof = good.index(b"\xff\xc0")
    bad = bytearray(good)
    bad[sof + 11] = 0x00  # first component's h/v byte
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))

    # 4-component SOF -> NotImplementedError (Pillow territory)
    cmyk = (
        b"\xff\xd8"
        + b"\xff\xc0"
        + struct.pack(">HBHHB", 14, 8, 8, 8, 4)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])[:9]
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(cmyk)

    # T.81 B.1.1.2 fill bytes before markers are legal padding
    padded = good.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    assert decode_jpeg(padded) == decode_jpeg(good)

    # grayscale with declared 2x2 sampling factors: the factors are
    # irrelevant for a one-plane image and must not distort geometry
    gray = bytearray(encode_jpeg(12, 10, 1, bytes(range(120))))
    gsof = gray.index(b"\xff\xc0")
    gray[gsof + 11] = 0x22
    w, h, ch, px = decode_jpeg(bytes(gray))
    assert (w, h, ch) == (12, 10, 1)
    assert px == decode_jpeg(encode_jpeg(12, 10, 1, bytes(range(120))))[3]
