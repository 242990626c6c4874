"""Self-contained MessagePack codec (spec subset) for the service's
content negotiation.

The reference service speaks JSON + msgpack via falcon's media
handlers (reference service.py:132-138); this container has no msgpack
wheel and the engine must not grow hard dependencies, so the subset
the service actually exchanges — nil, bool, int, float64, str, bin,
array, map — is implemented directly against the public MessagePack
spec (https://github.com/msgpack/msgpack/blob/master/spec.md). If a
real ``msgpack`` package is importable it is preferred transparently
(same packb/unpackb names), so installing one upgrades the codec
without code changes.

Encoding choices match the canonical encoders: smallest-width integer
family, float64 for all floats (0xcb), UTF-8 str family for ``str``,
bin family for ``bytes``. Decoding accepts every width of each family
regardless of how the peer chose to pack."""

from __future__ import annotations

import struct
from typing import Any

try:  # pragma: no cover - exercised only when a wheel is present
    from msgpack import packb as _ext_packb, unpackb as _ext_unpackb

    def packb(obj: Any) -> bytes:
        return _ext_packb(obj, use_bin_type=True)

    def unpackb(data: bytes) -> Any:
        return _ext_unpackb(data, raw=False, strict_map_key=False)

except ImportError:

    def packb(obj: Any) -> bytes:
        """Serialize ``obj`` (None/bool/int/float/str/bytes/list/tuple/
        dict, nested) to MessagePack bytes."""
        out = bytearray()
        _pack_into(out, obj)
        return bytes(out)

    def unpackb(data: bytes) -> Any:
        """Deserialize one MessagePack object; trailing bytes are an
        error (the service exchanges exactly one document per body)."""
        obj, pos = _unpack_from(memoryview(data), 0)
        if pos != len(data):
            raise ValueError(f"trailing bytes after msgpack object at {pos}")
        return obj


def _pack_into(out: bytearray, obj: Any) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(out, obj)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 0x1F:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes((0xD9, n))
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        n = len(b)
        if n <= 0xFF:
            out += bytes((0xC4, n))
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 0x0F:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for item in obj:
            _pack_into(out, item)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 0x0F:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in obj.items():
            _pack_into(out, k)
            _pack_into(out, v)
    else:
        raise TypeError(f"msgpack_lite cannot serialize {type(obj).__name__}")


def _pack_int(out: bytearray, v: int) -> None:
    if 0 <= v <= 0x7F:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)  # negative fixint 111xxxxx
    elif 0 <= v <= 0xFF:
        out += bytes((0xCC, v))
    elif 0 <= v <= 0xFFFF:
        out.append(0xCD)
        out += struct.pack(">H", v)
    elif 0 <= v <= 0xFFFFFFFF:
        out.append(0xCE)
        out += struct.pack(">I", v)
    elif 0 <= v <= 0xFFFFFFFFFFFFFFFF:
        out.append(0xCF)
        out += struct.pack(">Q", v)
    elif -0x80 <= v < 0:
        out.append(0xD0)
        out += struct.pack(">b", v)
    elif -0x8000 <= v < 0:
        out.append(0xD1)
        out += struct.pack(">h", v)
    elif -0x80000000 <= v < 0:
        out.append(0xD2)
        out += struct.pack(">i", v)
    elif -0x8000000000000000 <= v < 0:
        out.append(0xD3)
        out += struct.pack(">q", v)
    else:
        raise OverflowError(f"int out of msgpack 64-bit range: {v}")


_MAX_DEPTH = 128


def _unpack_from(buf: memoryview, pos: int, depth: int = 0) -> tuple[Any, int]:
    if depth > _MAX_DEPTH:
        # 128 levels is far beyond any real document, and SMALL enough
        # that the cap fires before CPython's own ~1000-frame recursion
        # limit (each level costs two frames here, and the service may
        # already be several frames deep): a ~1 KB body of nested
        # fixarray headers would otherwise drive
        # Python past its recursion limit — RecursionError escapes the
        # transcode boundary's ValueError handler and kills the request
        # thread (ADVICE r9). Depth-capped, it is a plain 422.
        raise ValueError(f"msgpack nesting exceeds {_MAX_DEPTH} levels")
    if pos >= len(buf):
        raise ValueError("truncated msgpack data")
    b = buf[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0xA0 <= b <= 0xBF:  # fixstr
        return _take_str(buf, pos, b & 0x1F)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _take_array(buf, pos, b & 0x0F, depth)
    if 0x80 <= b <= 0x8F:  # fixmap
        return _take_map(buf, pos, b & 0x0F, depth)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:
        return _take_bin(buf, pos + 1, _u8(buf, pos))
    if b == 0xC5:
        return _take_bin(buf, pos + 2, _u(buf, pos, ">H"))
    if b == 0xC6:
        return _take_bin(buf, pos + 4, _u(buf, pos, ">I"))
    if b == 0xCA:
        return _u(buf, pos, ">f"), pos + 4
    if b == 0xCB:
        return _u(buf, pos, ">d"), pos + 8
    if b == 0xCC:
        return _u8(buf, pos), pos + 1
    if b == 0xCD:
        return _u(buf, pos, ">H"), pos + 2
    if b == 0xCE:
        return _u(buf, pos, ">I"), pos + 4
    if b == 0xCF:
        return _u(buf, pos, ">Q"), pos + 8
    if b == 0xD0:
        return _u(buf, pos, ">b"), pos + 1
    if b == 0xD1:
        return _u(buf, pos, ">h"), pos + 2
    if b == 0xD2:
        return _u(buf, pos, ">i"), pos + 4
    if b == 0xD3:
        return _u(buf, pos, ">q"), pos + 8
    if b == 0xD9:
        return _take_str(buf, pos + 1, _u8(buf, pos))
    if b == 0xDA:
        return _take_str(buf, pos + 2, _u(buf, pos, ">H"))
    if b == 0xDB:
        return _take_str(buf, pos + 4, _u(buf, pos, ">I"))
    if b == 0xDC:
        return _take_array(buf, pos + 2, _u(buf, pos, ">H"), depth)
    if b == 0xDD:
        return _take_array(buf, pos + 4, _u(buf, pos, ">I"), depth)
    if b == 0xDE:
        return _take_map(buf, pos + 2, _u(buf, pos, ">H"), depth)
    if b == 0xDF:
        return _take_map(buf, pos + 4, _u(buf, pos, ">I"), depth)
    raise ValueError(f"unsupported msgpack type byte 0x{b:02x}")


def _u8(buf: memoryview, pos: int) -> int:
    """One length-prefix byte, ValueError (not IndexError) past EOF —
    the service's 422 contract depends on truncated input raising
    ValueError everywhere."""
    if pos >= len(buf):
        raise ValueError("truncated msgpack data")
    return buf[pos]


def _u(buf: memoryview, pos: int, fmt: str):
    size = struct.calcsize(fmt)
    if pos + size > len(buf):
        raise ValueError("truncated msgpack data")
    return struct.unpack_from(fmt, buf, pos)[0]


def _take_str(buf: memoryview, pos: int, n: int) -> tuple[str, int]:
    if pos + n > len(buf):
        raise ValueError("truncated msgpack str")
    return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n


def _take_bin(buf: memoryview, pos: int, n: int) -> tuple[bytes, int]:
    if pos + n > len(buf):
        raise ValueError("truncated msgpack bin")
    return bytes(buf[pos : pos + n]), pos + n


def _take_array(buf: memoryview, pos: int, n: int, depth: int = 0) -> tuple[list, int]:
    out = []
    for _ in range(n):
        item, pos = _unpack_from(buf, pos, depth + 1)
        out.append(item)
    return out, pos


def _take_map(buf: memoryview, pos: int, n: int, depth: int = 0) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, pos = _unpack_from(buf, pos, depth + 1)
        v, pos = _unpack_from(buf, pos, depth + 1)
        out[k] = v
    return out, pos
