"""EXIF walker vs spec-side fixture writers (TIFF 6.0 / EXIF 2.32 IFD
layouts written by hand — the same ground-truth strategy as the
GIF/TIFF/JPEG/MP4 suites)."""

import struct

import pytest

from vechord_spark.sources.exif import exif_meta


def _build_tiff_exif(
    orientation=6,
    datetime="2024:01:02 03:04:05",
    datetime_original="2023:12:31 23:59:58",
    make="ACME",
    model="CamPro 9",
    width=640,
    height=480,
    gps=True,
    bo="<",
):
    """Hand-assembled EXIF TIFF block: IFD0 (+ Exif sub-IFD + GPS
    pointer), values >4 bytes deferred to a patched value area."""

    def entry(tag, typ, cnt, payload_or_inline):
        return (tag, typ, cnt, payload_or_inline)

    def ascii_v(s):
        return s.encode("ascii") + b"\x00"

    # (tag, type, count, value) — value bytes placed inline if <=4
    exif_entries = [
        entry(0x9003, 2, len(ascii_v(datetime_original)), ascii_v(datetime_original)),
        entry(0xA002, 4, 1, struct.pack(bo + "I", width)),
        entry(0xA003, 4, 1, struct.pack(bo + "I", height)),
    ]

    def build_ifd(entries, base_off):
        """Returns (ifd_bytes, value_area) with offsets relative to
        the TIFF origin; value area starts right after the IFD."""
        n = len(entries)
        ifd_size = 2 + 12 * n + 4
        value_area = b""
        out = struct.pack(bo + "H", n)
        for tag, typ, cnt, payload in sorted(entries):
            head = struct.pack(bo + "HHI", tag, typ, cnt)
            if len(payload) <= 4:
                out += head + payload.ljust(4, b"\x00")
            else:
                voff = base_off + ifd_size + len(value_area)
                out += head + struct.pack(bo + "I", voff)
                value_area += payload
        out += struct.pack(bo + "I", 0)  # next IFD
        return out + value_area

    # IFD0 goes at offset 8; the Exif sub-IFD follows IFD0's block.
    # Build the Exif IFD first at a guessed offset, then IFD0 with the
    # real pointer (two-pass because IFD0's size is fixed once its
    # entry list is known).
    ifd0_entries = [
        entry(0x010F, 2, len(ascii_v(make)), ascii_v(make)),
        entry(0x0110, 2, len(ascii_v(model)), ascii_v(model)),
        entry(0x0112, 3, 1, struct.pack(bo + "H", orientation)),
        entry(0x0132, 2, len(ascii_v(datetime)), ascii_v(datetime)),
    ]
    if gps:
        # GPS IFD pointer: presence is what the walker reports; point
        # it at a minimal empty IFD appended at the very end
        ifd0_entries.append(entry(0x8825, 4, 1, b"\x00\x00\x00\x00"))
    ifd0_entries.append(entry(0x8769, 4, 1, b"\x00\x00\x00\x00"))

    # sizes: ifd block = 2 + 12n + 4 plus deferred values
    def block_len(entries):
        return 2 + 12 * len(entries) + 4 + sum(
            len(p) for _, _, _, p in entries if len(p) > 4
        )

    ifd0_off = 8
    exif_off = ifd0_off + block_len(ifd0_entries)
    gps_off = exif_off + block_len(exif_entries)
    patched = []
    for tag, typ, cnt, payload in ifd0_entries:
        if tag == 0x8769:
            payload = struct.pack(bo + "I", exif_off)
        if tag == 0x8825:
            payload = struct.pack(bo + "I", gps_off)
        patched.append((tag, typ, cnt, payload))
    body = build_ifd(patched, ifd0_off) + build_ifd(exif_entries, exif_off)
    if gps:
        body += struct.pack(bo + "H", 0) + struct.pack(bo + "I", 0)
    order = b"II" if bo == "<" else b"MM"
    return order + struct.pack(bo + "H", 42) + struct.pack(bo + "I", 8) + body


def _jpeg_with_exif(tiff_block):
    from vechord_spark.sources.jpeg import encode_jpeg

    import numpy as np

    jpg = encode_jpeg(8, 8, 3, np.full((8, 8, 3), 128, np.uint8).tobytes())
    payload = b"Exif\x00\x00" + tiff_block
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    return jpg[:2] + app1 + jpg[2:]


def test_exif_from_jpeg_app1():
    meta = exif_meta(_jpeg_with_exif(_build_tiff_exif()))
    assert meta["orientation"] == 6
    assert meta["datetime"] == "2024:01:02 03:04:05"
    assert meta["datetime_original"] == "2023:12:31 23:59:58"
    assert meta["make"] == "ACME"
    assert meta["model"] == "CamPro 9"
    assert (meta["exif_width"], meta["exif_height"]) == (640, 480)
    assert meta["has_gps"] is True


def test_exif_big_endian_and_no_gps():
    meta = exif_meta(_build_tiff_exif(gps=False, bo=">", orientation=1))
    assert meta["orientation"] == 1
    assert meta["has_gps"] is False
    assert meta["make"] == "ACME"


def test_jpeg_without_exif_is_all_none():
    import numpy as np

    from vechord_spark.sources.jpeg import encode_jpeg

    meta = exif_meta(encode_jpeg(8, 8, 3, np.zeros((8, 8, 3), np.uint8).tobytes()))
    assert meta["orientation"] is None
    assert meta["has_gps"] is False
    assert meta["make"] is None


def test_non_image_rejected():
    with pytest.raises(ValueError):
        exif_meta(b"plain text, not an image")
    with pytest.raises(ValueError):
        exif_meta(b"")


def test_hostile_exif_never_crashes():
    import random

    rng = random.Random(31)
    good = _jpeg_with_exif(_build_tiff_exif())
    for _ in range(300):
        blob = bytearray(good)
        for _ in range(rng.randrange(1, 6)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            exif_meta(bytes(blob))
        except ValueError:
            pass
    for cut in range(0, len(good), 13):
        try:
            exif_meta(good[:cut])
        except ValueError:
            pass


def test_entry_bomb_rejected():
    # IFD declaring 60k entries must be refused before any scan
    bo = "<"
    blob = (
        b"II" + struct.pack(bo + "H", 42) + struct.pack(bo + "I", 8)
        + struct.pack(bo + "H", 60000)
    )
    with pytest.raises(ValueError, match="declares"):
        exif_meta(blob)


def test_attach_exif_spark(spark):
    from vechord_spark.sources.exif import attach_exif

    rows = [
        (1, _jpeg_with_exif(_build_tiff_exif())),
        (2, b"not an image"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id int, blob binary")
    got = {r["id"]: r["exif"] for r in attach_exif(df, "blob").collect()}
    assert got[1]["orientation"] == 6 and got[1]["err"] is None
    assert got[1]["has_gps"] is True
    assert got[2]["err"] is not None and got[2]["orientation"] is None
    assert got[3]["err"] is not None  # empty bytes are not a JPEG
