"""MP4 / ISO Base Media File Format (ISO 14496-12) metadata probe and
sample-table walk — dependency-free, from the public spec.

Round-10 scope decision: a crawl pipeline needs MP4 METADATA (duration,
resolution, codec fourcc, frame count, keyframe positions) to filter
and shard video corpora long before anything decodes — and the sample
TABLE (offset/size/timestamp/keyframe per sample) is what a sampling
stage uses to slice out raw access units for a downstream decoder.
Both are pure box arithmetic and are implemented here for real, with
spec-side fixture writers in tests/test_mp4.py. Only the H.264/H.265/
VP9 bitstream DECODE stays env-gated (sources/multimodal.py
sample_video_frames) — that is genuinely ffmpeg territory.

Reference surface parity: the reference stores media as opaque typed
bytes (vechord/spec.py:193-219); this module is part of the
multimodal-column plumbing the driver mandates beyond it.

Hostile-input posture matches the other codecs: every read is
bounds-checked, box recursion is depth-capped, 64-bit largesize and
size-to-end boxes are handled, and malformed structures raise
ValueError with stable messages — never IndexError/struct.error.
"""

from __future__ import annotations

import struct
from typing import Iterator

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf",
    b"mvex", b"moof", b"traf",
}
_MAX_DEPTH = 16
# sample-table size guard: a hostile header can declare billions of
# samples; cap what the walk will materialize (a real crawl clip is
# thousands of samples; long-form video tables are still << this)
MAX_SAMPLES = 4_000_000


def _u32(data: bytes, off: int) -> int:
    if off + 4 > len(data):
        raise ValueError("truncated MP4 box")
    return struct.unpack(">I", data[off : off + 4])[0]


def _u64(data: bytes, off: int) -> int:
    if off + 8 > len(data):
        raise ValueError("truncated MP4 box")
    return struct.unpack(">Q", data[off : off + 8])[0]


def _boxes(data: bytes, start: int, end: int, depth: int = 0) -> Iterator[tuple[bytes, int, int]]:
    """Yield ``(type, body_start, body_end)`` for each box in
    [start, end); handles size==1 (64-bit largesize) and size==0
    (box extends to the end of the enclosing scope)."""
    if depth > _MAX_DEPTH:
        raise ValueError("MP4 box nesting too deep")
    off = start
    while off + 8 <= end:
        size = _u32(data, off)
        btype = data[off + 4 : off + 8]
        body = off + 8
        if size == 1:
            size = _u64(data, off + 8)
            body = off + 16
        elif size == 0:
            size = end - off
        if size < body - off or off + size > end:
            raise ValueError("MP4 box size out of bounds")
        yield btype, body, off + size
        off += size


def _find(data: bytes, start: int, end: int, path: tuple[bytes, ...], depth: int = 0):
    """All body ranges matching a box path like (b"moov", b"trak")."""
    head, rest = path[0], path[1:]
    for btype, b, e in _boxes(data, start, end, depth):
        if btype != head:
            continue
        if not rest:
            yield b, e
        else:
            yield from _find(data, b, e, rest, depth + 1)


def _full_box(data: bytes, body: int) -> tuple[int, int]:
    """(version, content offset past version/flags)."""
    if body + 4 > len(data):
        raise ValueError("truncated MP4 full box")
    return data[body], body + 4


def probe_mp4(data: bytes) -> dict:
    """Container metadata without touching any media bitstream:
    ``{brand, duration_ms, tracks: [{kind, codec, width, height,
    n_samples, duration_ms, timescale}]}``.

    Durations come from mvhd/mdhd (v0 and v1 layouts); video
    dimensions prefer the stsd sample entry (coded size) and fall back
    to tkhd's 16.16 fixed-point presentation size."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) stream")
    brand = data[8:12].decode("latin-1")
    out: dict = {"brand": brand, "duration_ms": None, "tracks": []}
    moov = list(_find(data, 0, len(data), (b"moov",)))
    if not moov:
        raise ValueError("MP4 without a moov box (streaming-only fragment?)")
    mb, me = moov[0]
    for ver_body in _find(data, mb, me, (b"mvhd",)):
        ver, c = _full_box(data, ver_body[0])
        if ver == 1:
            timescale = _u32(data, c + 16)
            duration = _u64(data, c + 20)
        else:
            timescale = _u32(data, c + 8)
            duration = _u32(data, c + 12)
        if timescale:
            out["duration_ms"] = int(duration * 1000 // timescale)
    for tb, te in _find(data, mb, me, (b"trak",)):
        tr: dict = {
            "kind": None, "codec": None, "width": None, "height": None,
            "n_samples": None, "duration_ms": None, "timescale": None,
        }
        for hb, he in _find(data, tb, te, (b"tkhd",)):
            ver, c = _full_box(data, hb)
            # width/height are the LAST 8 bytes of the box, 16.16 fixed
            if he - 8 >= c:
                w = _u32(data, he - 8) >> 16
                h = _u32(data, he - 4) >> 16
                if w and h:
                    tr["width"], tr["height"] = w, h
        for hb, he in _find(data, tb, te, (b"mdia", b"mdhd")):
            ver, c = _full_box(data, hb)
            if ver == 1:
                ts = _u32(data, c + 16)
                dur = _u64(data, c + 20)
            else:
                ts = _u32(data, c + 8)
                dur = _u32(data, c + 12)
            tr["timescale"] = ts
            if ts:
                tr["duration_ms"] = int(dur * 1000 // ts)
        for hb, he in _find(data, tb, te, (b"mdia", b"hdlr")):
            _, c = _full_box(data, hb)
            handler = data[c + 4 : c + 8]
            tr["kind"] = {b"vide": "video", b"soun": "audio"}.get(
                handler, handler.decode("latin-1", "replace")
            )
        for hb, he in _find(data, tb, te, (b"mdia", b"minf", b"stbl", b"stsd")):
            _, c = _full_box(data, hb)
            n_entries = _u32(data, c)
            if n_entries >= 1 and c + 16 <= he:
                entry_size = _u32(data, c + 4)
                fourcc = data[c + 8 : c + 12]
                tr["codec"] = fourcc.decode("latin-1", "replace")
                # video sample entry: width/height at +24/+26 past the
                # 8-byte entry header (6 reserved + 2 dataref + 16 pre)
                eb = c + 12
                if tr["kind"] == "video" and eb + 28 <= he and entry_size >= 36:
                    w = struct.unpack(">H", data[eb + 24 : eb + 26])[0]
                    h = struct.unpack(">H", data[eb + 26 : eb + 28])[0]
                    if w and h:
                        tr["width"], tr["height"] = w, h
        for hb, he in _find(data, tb, te, (b"mdia", b"minf", b"stbl", b"stsz")):
            _, c = _full_box(data, hb)
            tr["n_samples"] = _u32(data, c + 4)
        out["tracks"].append(tr)
    return out


def mp4_sample_table(data: bytes, track: int = 0) -> list[tuple[int, int, int, bool]]:
    """Per-sample ``(file_offset, size, timestamp_ms, is_keyframe)``
    for one track — the slice map a frame-sampling stage works from
    (stts x stsz x stsc x stco/co64 x stss arithmetic, ISO 14496-12
    §8.6-8.7). Raw sample bytes are ``data[off:off+size]``; decoding
    them is the downstream codec's job."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) stream")
    moov = list(_find(data, 0, len(data), (b"moov",)))
    if not moov:
        raise ValueError("MP4 without a moov box")
    traks = list(_find(data, moov[0][0], moov[0][1], (b"trak",)))
    if track >= len(traks):
        raise ValueError(f"MP4 has {len(traks)} tracks, wanted index {track}")
    tb, te = traks[track]
    stbl = list(_find(data, tb, te, (b"mdia", b"minf", b"stbl")))
    if not stbl:
        raise ValueError("MP4 track without a sample table")
    sb, se = stbl[0]
    timescale = 0
    for hb, he in _find(data, tb, te, (b"mdia", b"mdhd")):
        ver, c = _full_box(data, hb)
        timescale = _u32(data, c + 16 if ver == 1 else c + 8)

    def _one(name: bytes):
        found = list(_find(data, sb, se, (name,)))
        return found[0] if found else None

    stsz = _one(b"stsz")
    stts = _one(b"stts")
    stsc = _one(b"stsc")
    stco = _one(b"stco")
    is64 = False
    if stco is None:
        stco = _one(b"co64")
        is64 = True
    if not (stsz and stts and stsc and stco):
        raise ValueError("MP4 sample table missing stsz/stts/stsc/stco")
    # sizes
    _, c = _full_box(data, stsz[0])
    fixed_size = _u32(data, c)
    n = _u32(data, c + 4)
    if n > MAX_SAMPLES:
        raise ValueError(f"MP4 declares {n} samples (> {MAX_SAMPLES} cap)")
    if fixed_size:
        sizes = [fixed_size] * n
    else:
        if c + 8 + 4 * n > stsz[1]:
            raise ValueError("truncated stsz")
        sizes = list(struct.unpack(f">{n}I", data[c + 8 : c + 8 + 4 * n]))
    # decode timestamps from stts runs
    _, c = _full_box(data, stts[0])
    n_runs = _u32(data, c)
    ts_list: list[int] = []
    t = 0
    off = c + 4
    for _ in range(n_runs):
        cnt, delta = _u32(data, off), _u32(data, off + 4)
        off += 8
        if len(ts_list) + cnt > n:
            cnt = n - len(ts_list)
        for _ in range(cnt):
            ts_list.append(t)
            t += delta
        if len(ts_list) >= n:
            break
    while len(ts_list) < n:
        ts_list.append(t)
    # chunk offsets
    _, c = _full_box(data, stco[0])
    n_chunks = _u32(data, c)
    if is64:
        chunk_offs = [_u64(data, c + 4 + 8 * i) for i in range(n_chunks)]
    else:
        chunk_offs = [_u32(data, c + 4 + 4 * i) for i in range(n_chunks)]
    # sample->chunk runs
    _, c = _full_box(data, stsc[0])
    n_sc = _u32(data, c)
    sc = [
        (_u32(data, c + 4 + 12 * i), _u32(data, c + 8 + 12 * i))
        for i in range(n_sc)
    ]  # (first_chunk 1-based, samples_per_chunk)
    # keyframes
    keys: set[int] | None = None
    stss = _one(b"stss")
    if stss:
        _, c = _full_box(data, stss[0])
        kn = _u32(data, c)
        keys = {_u32(data, c + 4 + 4 * i) for i in range(kn)}
    out: list[tuple[int, int, int, bool]] = []
    sample = 0  # 0-based
    for ci in range(n_chunks):
        per = 0
        for first, cnt in sc:
            if first <= ci + 1:
                per = cnt
        pos = chunk_offs[ci]
        for _ in range(per):
            if sample >= n:
                break
            ts_ms = ts_list[sample] * 1000 // timescale if timescale else 0
            is_key = keys is None or (sample + 1) in keys
            out.append((pos, sizes[sample], ts_ms, is_key))
            pos += sizes[sample]
            sample += 1
    if sample < n:
        raise ValueError("MP4 chunk map covers fewer samples than stsz declares")
    return out


def mp4_sample_payloads(
    data: bytes, every_ms: int, track: int = 0, keyframes_only: bool = True
) -> list[tuple[int, bytes]]:
    """The sampling stage over raw access units: at most one sample per
    ``every_ms`` (all when <= 0), keyframes only by default — returns
    ``(timestamp_ms, raw_sample_bytes)``. This is the real slice
    plumbing; turning an H.264 access unit into pixels is the
    env-gated step."""
    table = mp4_sample_table(data, track)
    out: list[tuple[int, bytes]] = []
    next_keep = 0.0
    for off, size, ts_ms, is_key in table:
        if keyframes_only and not is_key:
            continue
        if every_ms > 0 and ts_ms < next_keep:
            continue
        if off + size > len(data):
            raise ValueError("MP4 sample extends past end of file")
        out.append((ts_ms, bytes(data[off : off + size])))
        next_keep = ts_ms + every_ms
    return out
