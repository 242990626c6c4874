"""EXIF metadata extraction — dependency-free, from the public EXIF
2.32 / TIFF 6.0 specifications.

A crawl pipeline wants camera metadata long before it decodes pixels:
orientation feeds the resize/thumbnail stage (a 90°-rotated photo
thumbnails wrong without tag 0x0112), capture timestamps and camera
make/model feed near-dup heuristics and provenance filters, and GPS
PRESENCE is a PII flag a privacy scrub keys on (the flag alone — this
module deliberately does not parse coordinates). EXIF is a TIFF
structure: either the file IS a TIFF, or a JPEG carries it in an APP1
segment tagged ``Exif\\0\\0``. The walk below reads IFD0 plus the
Exif and GPS sub-IFD pointers — two levels, no recursion beyond them.

Hostile-input posture matches the other codecs (sources/rasters.py,
mp4.py): every read is bounds-checked, ASCII values are length-capped,
and malformed structures raise ValueError with stable messages —
never IndexError/struct.error. Files WITHOUT EXIF return the all-None
record (absence is data, not an error).

Reference surface parity: the reference stores media as opaque typed
bytes (vechord/spec.py:193-219); this module is part of the
multimodal-column plumbing the driver mandates beyond it.
"""

from __future__ import annotations

import struct

import pandas as pd  # module-top: pandas-UDF string type hints resolve here

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_MAX_ENTRIES = 512  # a real IFD holds dozens; a bomb declares millions
_MAX_ASCII = 256

_EMPTY: dict = {
    "orientation": None,
    "datetime": None,
    "datetime_original": None,
    "make": None,
    "model": None,
    "exif_width": None,
    "exif_height": None,
    "has_gps": False,
}


def _u16(data: bytes, off: int, bo: str) -> int:
    if off + 2 > len(data):
        raise ValueError("truncated EXIF structure")
    return struct.unpack(bo + "H", data[off : off + 2])[0]


def _u32(data: bytes, off: int, bo: str) -> int:
    if off + 4 > len(data):
        raise ValueError("truncated EXIF structure")
    return struct.unpack(bo + "I", data[off : off + 4])[0]


def _entry_value(data: bytes, bo: str, off: int):
    """One IFD entry -> (tag, python value): ints for SHORT/LONG/BYTE,
    str for ASCII, None for types this walk has no use for."""
    tag = _u16(data, off, bo)
    typ = _u16(data, off + 2, bo)
    cnt = _u32(data, off + 4, bo)
    size = _TYPE_SIZE.get(typ, 1) * cnt
    if size <= 4:
        raw = data[off + 8 : off + 8 + max(size, 0)]
    else:
        voff = _u32(data, off + 8, bo)
        if voff + size > len(data):
            raise ValueError("EXIF value offset out of bounds")
        raw = data[voff : voff + size]
    if typ == 2:  # ASCII, NUL-terminated
        if cnt > _MAX_ASCII:
            raw = raw[:_MAX_ASCII]
        return tag, raw.split(b"\x00", 1)[0].decode("ascii", "replace").strip()
    if typ in (1, 3, 4) and cnt >= 1:
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        width = _TYPE_SIZE[typ]
        if len(raw) < width:
            raise ValueError("truncated EXIF value")
        return tag, struct.unpack(bo + fmt, raw[:width])[0]
    return tag, None


def _walk_ifd(data: bytes, bo: str, off: int) -> dict[int, object]:
    n = _u16(data, off, bo)
    if n > _MAX_ENTRIES:
        raise ValueError(f"EXIF IFD declares {n} entries (> {_MAX_ENTRIES})")
    if off + 2 + 12 * n > len(data):
        raise ValueError("EXIF IFD exceeds the file")
    out: dict[int, object] = {}
    for i in range(n):
        tag, val = _entry_value(data, bo, off + 2 + 12 * i)
        out[tag] = val
    return out


def _parse_tiff_exif(data: bytes) -> dict:
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF/EXIF structure")
    bo = "<" if data[:2] == b"II" else ">"
    if _u16(data, 2, bo) != 42:
        raise ValueError("bad TIFF magic in EXIF structure")
    ifd0 = _walk_ifd(data, bo, _u32(data, 4, bo))
    out = dict(_EMPTY)
    out["orientation"] = ifd0.get(0x0112)
    out["datetime"] = ifd0.get(0x0132)
    out["make"] = ifd0.get(0x010F)
    out["model"] = ifd0.get(0x0110)
    out["has_gps"] = 0x8825 in ifd0
    sub = ifd0.get(0x8769)
    if isinstance(sub, int) and 0 < sub < len(data):
        exif_ifd = _walk_ifd(data, bo, sub)
        out["datetime_original"] = exif_ifd.get(0x9003)
        out["exif_width"] = exif_ifd.get(0xA002)
        out["exif_height"] = exif_ifd.get(0xA003)
    return out


def exif_meta(data: bytes) -> dict:
    """EXIF record for a JPEG or TIFF byte string:
    ``{orientation, datetime, datetime_original, make, model,
    exif_width, exif_height, has_gps}``.

    A JPEG without an APP1 Exif segment (or a TIFF without the tags)
    returns the all-None record — absence is data. Anything that is
    neither JPEG nor TIFF, or carries a malformed EXIF structure,
    raises ValueError (the per-row error contract callers over dirty
    corpora wrap, same as decode_image/probe_image)."""
    if len(data) >= 4 and data[:2] in (b"II", b"MM"):
        return _parse_tiff_exif(bytes(data))
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("EXIF extraction expects a JPEG or TIFF stream")
    data = bytes(data)
    off = 2
    # walk JPEG segments until SOS; EXIF lives in APP1 "Exif\0\0"
    while off + 4 <= len(data):
        if data[off] != 0xFF:
            raise ValueError("malformed JPEG segment stream")
        marker = data[off + 1]
        if marker == 0xDA:  # start of scan: no EXIF past here
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            off += 2
            continue
        seglen = struct.unpack(">H", data[off + 2 : off + 4])[0]
        if seglen < 2 or off + 2 + seglen > len(data):
            raise ValueError("JPEG segment length out of bounds")
        if marker == 0xE1 and data[off + 4 : off + 10] == b"Exif\x00\x00":
            return _parse_tiff_exif(data[off + 10 : off + 2 + seglen])
        off += 2 + seglen
    return dict(_EMPTY)


_EXIF_SCHEMA = (
    "orientation int, datetime string, datetime_original string, "
    "make string, model string, exif_width int, exif_height int, "
    "has_gps boolean, err string"
)


def attach_exif(df, bytes_col: str, out_col: str = "exif"):
    """Attach an ``exif`` struct column to a binary media frame — one
    Arrow-batched pass, embarrassingly parallel (the metadata stage a
    media pipeline runs over EVERYTHING; pixels decode later, for the
    filtered subset only). Corrupt rows carry the message in
    ``err`` instead of failing the stage — the per-row error contract
    of the other media stages (multimodal.py)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_EXIF_SCHEMA)
    def _exif(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            try:
                rec = exif_meta(b or b"")
                rec["err"] = None
            except ValueError as exc:
                rec = dict(_EMPTY)
                rec["err"] = str(exc)[:200]
            rows.append(rec)
        return pd.DataFrame(
            rows,
            columns=[
                "orientation", "datetime", "datetime_original", "make",
                "model", "exif_width", "exif_height", "has_gps", "err",
            ],
        )

    return df.withColumn(out_col, _exif(F.col(bytes_col)))
