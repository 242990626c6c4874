"""MP4/ISO-BMFF probe + sample table vs spec-side fixture writers
(ISO 14496-12 box layouts written by hand, expectations hand-computed
— the same ground-truth strategy as the GIF/TIFF/JPEG/VP8L suites)."""

import struct

import pytest

from vechord_spark.sources.mp4 import (
    mp4_sample_payloads,
    mp4_sample_table,
    probe_mp4,
)


def box(btype: bytes, *payload: bytes) -> bytes:
    body = b"".join(payload)
    return struct.pack(">I", 8 + len(body)) + btype + body


def full(btype: bytes, version: int, *payload: bytes) -> bytes:
    return box(btype, bytes([version, 0, 0, 0]), *payload)


def u32(*vals) -> bytes:
    return struct.pack(f">{len(vals)}I", *vals)


def u16(*vals) -> bytes:
    return struct.pack(f">{len(vals)}H", *vals)


def mvhd(timescale, duration, version=0):
    if version == 1:
        return full(b"mvhd", 1, struct.pack(">QQIQ", 0, 0, timescale, duration))
    return full(b"mvhd", 0, u32(0, 0, timescale, duration))


def tkhd(width, height):
    # v0: ctime mtime id rsvd duration + 8 rsvd + layer/alt/volume/rsvd
    # + 36 matrix + 16.16 width/height
    return full(
        b"tkhd", 0,
        u32(0, 0, 1, 0, 0),
        b"\x00" * 8, u16(0, 0, 0, 0), b"\x00" * 36,
        u32(width << 16, height << 16),
    )


def mdhd(timescale, duration):
    return full(b"mdhd", 0, u32(0, 0, timescale, duration), u16(0x55C4, 0))


def hdlr(kind: bytes):
    return full(b"hdlr", 0, u32(0), kind, u32(0, 0, 0), b"name\x00")


def stsd_video(fourcc: bytes, w, h):
    entry = (
        fourcc
        + b"\x00" * 6 + u16(1)          # reserved + data_ref_index
        + b"\x00" * 16                   # pre_defined / reserved
        + u16(w, h)
        + u32(0x00480000, 0x00480000)    # dpi
        + u32(0) + u16(1)                # frame_count
        + b"\x00" * 32 + u16(0x18) + struct.pack(">h", -1)
    )
    entry = struct.pack(">I", 8 + len(entry) - 4) + entry  # entry size incl. header
    return full(b"stsd", 0, u32(1), entry)


def stts(runs):
    return full(b"stts", 0, u32(len(runs)), *[u32(c, d) for c, d in runs])


def stsz(sizes):
    return full(b"stsz", 0, u32(0, len(sizes)), *[u32(s) for s in sizes])


def stsc(runs):
    return full(b"stsc", 0, u32(len(runs)), *[u32(f, n, 1) for f, n in runs])


def stco(offs):
    return full(b"stco", 0, u32(len(offs)), *[u32(o) for o in offs])


def stss(keys):
    return full(b"stss", 0, u32(len(keys)), *[u32(k) for k in keys])


def make_mp4(samples: list[bytes], timescale=1000, delta=40, keys=(1,), fourcc=b"avc1"):
    """A minimal progressive MP4: ftyp + mdat(samples) + moov with a
    full sample table. Two samples per chunk."""
    ftyp = box(b"ftyp", b"isom", u32(0x200), b"isomiso2avc1")
    mdat_body = b"".join(samples)
    mdat = box(b"mdat", mdat_body)
    mdat_start = len(ftyp) + 8
    sizes = [len(s) for s in samples]
    # chunks of 2 samples
    chunk_offs = []
    pos = mdat_start
    for i in range(0, len(samples), 2):
        chunk_offs.append(pos)
        pos += sum(sizes[i : i + 2])
    n = len(samples)
    duration = n * delta
    stbl = box(
        b"stbl",
        stsd_video(fourcc, 64, 48),
        stts([(n, delta)]),
        stsc([(1, 2)]),
        stsz(sizes),
        stco(chunk_offs),
        stss(list(keys)),
    )
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd(timescale, duration), hdlr(b"vide"), minf)
    trak = box(b"trak", tkhd(64, 48), mdia)
    moov = box(b"moov", mvhd(timescale, duration), trak)
    return ftyp + mdat + moov


SAMPLES = [b"K0" * 5, b"d1" * 3, b"d2" * 4, b"K3" * 6, b"d4" * 2, b"d5" * 3]


def test_probe_mp4_metadata():
    data = make_mp4(SAMPLES, timescale=1000, delta=40, keys=(1, 4))
    meta = probe_mp4(data)
    assert meta["brand"] == "isom"
    assert meta["duration_ms"] == 6 * 40
    (tr,) = meta["tracks"]
    assert tr["kind"] == "video"
    assert tr["codec"] == "avc1"
    assert (tr["width"], tr["height"]) == (64, 48)
    assert tr["n_samples"] == 6
    assert tr["duration_ms"] == 240
    assert tr["timescale"] == 1000


def test_probe_mp4_v1_mvhd_and_audio_track():
    ftyp = box(b"ftyp", b"isom", u32(0))
    mdia = box(b"mdia", mdhd(48000, 96000), hdlr(b"soun"), box(b"minf"))
    trak = box(b"trak", tkhd(0, 0), mdia)
    moov = box(b"moov", mvhd(90000, 180000, version=1), trak)
    meta = probe_mp4(ftyp + moov)
    assert meta["duration_ms"] == 2000
    assert meta["tracks"][0]["kind"] == "audio"
    assert meta["tracks"][0]["duration_ms"] == 2000


def test_sample_table_offsets_sizes_timestamps_keys():
    data = make_mp4(SAMPLES, timescale=1000, delta=40, keys=(1, 4))
    table = mp4_sample_table(data)
    assert len(table) == 6
    # hand-computed layout: mdat body starts right after its header;
    # chunks hold two samples each
    mdat_start = data.index(b"mdat") + 4
    sizes = [len(s) for s in SAMPLES]
    pos = mdat_start
    eo = []
    for i in range(0, 6, 2):
        c = pos
        eo.append(c)
        eo.append(c + sizes[i])
        pos = c + sizes[i] + sizes[i + 1]
    for i, (off, size, ts, key) in enumerate(table):
        assert size == sizes[i]
        assert off == eo[i]
        assert ts == i * 40
        assert key == (i in (0, 3))
        # the slice really is the sample payload
        assert data[off : off + size] == SAMPLES[i]


def test_sample_payload_extraction_every_ms():
    data = make_mp4(SAMPLES, timescale=1000, delta=40, keys=(1, 4))
    # keyframes only (default): t=0 and t=120
    kept = mp4_sample_payloads(data, every_ms=100)
    assert [(t, p) for t, p in kept] == [(0, SAMPLES[0]), (120, SAMPLES[3])]
    # all samples, at most one per 80ms: t=0, 80, 160
    kept = mp4_sample_payloads(data, every_ms=80, keyframes_only=False)
    assert [t for t, _ in kept] == [0, 80, 160]
    # every_ms<=0 keeps all (non-key included when asked)
    kept = mp4_sample_payloads(data, every_ms=0, keyframes_only=False)
    assert len(kept) == 6


def test_no_stss_means_all_sync_samples():
    ftyp = box(b"ftyp", b"isom", u32(0))
    payload = b"ab" * 4
    mdat = box(b"mdat", payload)
    start = len(ftyp) + 8
    stbl = box(
        b"stbl", stsd_video(b"avc1", 8, 8),
        stts([(2, 10)]), stsc([(1, 2)]), stsz([4, 4]), stco([start]),
    )
    mdia = box(b"mdia", mdhd(100, 20), hdlr(b"vide"), box(b"minf", stbl))
    moov = box(b"moov", mvhd(100, 20), box(b"trak", tkhd(8, 8), mdia))
    table = mp4_sample_table(ftyp + mdat + moov)
    assert all(key for _, _, _, key in table)


def test_hostile_mp4_never_crashes():
    import random

    rng = random.Random(7)
    good = make_mp4(SAMPLES)
    for _ in range(300):
        blob = bytearray(good)
        for _ in range(rng.randrange(1, 6)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        for fn in (probe_mp4, mp4_sample_table):
            try:
                fn(bytes(blob))
            except ValueError:
                pass
    # truncations
    for cut in range(0, len(good), 37):
        try:
            probe_mp4(good[:cut])
            mp4_sample_table(good[:cut])
        except ValueError:
            pass


def test_declared_sample_bomb_rejected():
    ftyp = box(b"ftyp", b"isom", u32(0))
    stbl = box(
        b"stbl", stsd_video(b"avc1", 8, 8),
        stts([(1, 1)]), stsc([(1, 1)]),
        full(b"stsz", 0, u32(0, 2_000_000_000)),  # 2e9 declared samples
        stco([0]),
    )
    mdia = box(b"mdia", mdhd(100, 1), hdlr(b"vide"), box(b"minf", stbl))
    moov = box(b"moov", mvhd(100, 1), box(b"trak", tkhd(8, 8), mdia))
    with pytest.raises(ValueError):
        mp4_sample_table(ftyp + moov)


def test_non_mp4_rejected():
    with pytest.raises(ValueError):
        probe_mp4(b"RIFF....WEBP")
    with pytest.raises(ValueError):
        probe_mp4(box(b"ftyp", b"isom"))  # no moov


def test_mjpeg_in_mp4_frames_decode():
    """Motion-JPEG MP4 (fourcc 'jpeg', every sample a complete JPEG)
    decodes through sample_video_frames: stts timestamps drive the
    every_ms clock, frames round-trip the in-repo JPEG codec."""
    import numpy as np

    from vechord_spark.sources.jpeg import decode_jpeg, encode_jpeg
    from vechord_spark.sources.multimodal import sample_video_frames

    frames = []
    for i in range(6):
        img = np.full((16, 16, 3), i * 30, dtype=np.uint8)
        img[:, :, 0] = 255 - i * 30
        frames.append(encode_jpeg(16, 16, 3, img.tobytes()))
    mp4 = make_mp4(frames, timescale=1000, delta=40, fourcc=b"jpeg")  # 25 fps

    got = sample_video_frames(mp4, every_ms=0)
    assert got == frames  # every sample, byte-identical slices

    # 80 ms clock over 40 ms frames -> every other frame
    kept = sample_video_frames(mp4, every_ms=80)
    assert kept == frames[::2]
    w, h, ch, raw = decode_jpeg(kept[1])
    assert (w, h, ch) == (16, 16, 3)


def test_mjpeg_in_mp4_sparse_stss_still_decodes_all():
    """MJPEG frames are all intra-coded: a sparse sync table must not
    hide frames (the bridge ignores stss for the SOI-gated path)."""
    import numpy as np

    from vechord_spark.sources.jpeg import encode_jpeg
    from vechord_spark.sources.multimodal import sample_video_frames

    frames = [
        encode_jpeg(8, 8, 3, np.full((8, 8, 3), i * 40, np.uint8).tobytes())
        for i in range(4)
    ]
    mp4 = make_mp4(frames, delta=40, keys=(1,), fourcc=b"jpeg")
    assert sample_video_frames(mp4, every_ms=0) == frames


def test_non_mjpeg_mp4_still_gated():
    """avc1 samples are not JPEGs -> the honest NotImplementedError
    stays (H.264 decode is ffmpeg territory)."""
    import pytest as _pytest

    from vechord_spark.sources.multimodal import sample_video_frames

    mp4 = make_mp4(SAMPLES)  # avc1, payloads lack SOI
    with _pytest.raises(NotImplementedError, match="Motion-JPEG"):
        sample_video_frames(mp4, every_ms=0)
