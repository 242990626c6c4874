"""Multimodal corpus preparation, end to end: probe -> decode gate ->
feature extraction -> near-dup candidates, plus MJPEG video frame
sampling — all on opaque binary columns with the repo's spec codecs
(PNG/JPEG incl. progressive/GIF/BMP/netpbm, WAV, MJPEG-AVI; zero
optional dependencies).

The 100 TB shape: heavy bytes stay in parquet binary columns and only
cross an executor boundary inside Arrow-batched mapInPandas stages
(cap ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads
are MB-sized); metadata (format, dimensions, decode-ok) comes out as
narrow columns that drive filtering and partitioning without touching
the payloads again.

    python examples/media_pipeline.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pyspark.sql import functions as F


def synthesize_media(spark, n_per_format: int = 8):
    """A small mixed-media table from the repo's own encoders (the
    encoders exist for fixtures/thumbnails; a real ingest reads
    binaryFile)."""
    from vechord_spark.sources.jpeg import encode_jpeg
    from vechord_spark.sources.multimodal import DecodedImage, _png_encode

    rng = np.random.default_rng(11)
    rows = []
    for i in range(n_per_format):
        w, h = 16 + i, 12 + i
        pix = rng.integers(0, 256, w * h * 3).astype(np.uint8).tobytes()
        rows.append((f"jpg{i}", "image", bytearray(encode_jpeg(w, h, 3, pix))))
        rows.append(
            (f"png{i}", "image", bytearray(_png_encode(DecodedImage(w, h, 3, pix))))
        )
        rows.append(
            (f"ppm{i}", "image", bytearray(f"P6\n{w} {h}\n255\n".encode() + pix))
        )
    # an MJPEG clip: 12 frames at 25 fps
    frames = [
        encode_jpeg(16, 16, 3, np.full((16, 16, 3), 10 * i, np.uint8).tobytes())
        for i in range(12)
    ]
    rows.append(("clip0", "video", bytearray(_mjpeg_avi(frames, 40_000))))
    rows.append(("junk0", "image", bytearray(b"not an image")))
    return spark.createDataFrame(rows, "media_id string, kind string, data binary")


def _mjpeg_avi(jpeg_frames, us_per_frame):
    import struct

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = chunk(b"avih", struct.pack("<I", us_per_frame) + b"\x00" * 52)
    hdrl = chunk(b"LIST", b"hdrl" + avih)
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def main(argv):
    from vechord_spark.session import get_spark
    from vechord_spark.sources.multimodal import extract_media_features, probe_media

    spark = get_spark("media-pipeline")
    media = synthesize_media(spark).cache()

    # 1. header-only probe: format + dimensions, NULLs for junk
    probed = probe_media(media.filter(F.col("kind") == "image"))
    print("probe report:")
    for r in probed.orderBy("media_id").collect():
        print("  ", tuple(r))

    # 2. decode gate: keep only payloads that fully decode (dirty-
    #    corpus contract — per-row errors become a boolean, not a crash)
    import pandas as pd

    def _gate(batches):
        from vechord_spark.sources.multimodal import decode_image

        for pdf in batches:
            ok = []
            for d in pdf["data"]:
                try:
                    decode_image(bytes(d))
                    ok.append(True)
                except (ValueError, NotImplementedError):
                    ok.append(False)
            yield pd.DataFrame({"media_id": pdf["media_id"], "decodes": ok})

    gate = (
        media.filter(F.col("kind") == "image")
        .select("media_id", "data")
        .mapInPandas(_gate, "media_id string, decodes boolean")
    )
    kept = media.join(gate.filter("decodes"), "media_id", "left_semi")
    print("decode gate kept:", kept.count(), "of", media.count())

    # 3. deterministic features for the kept set (the ANN/near-dup input)
    feats = extract_media_features(kept)
    print("feature rows:", feats.count())

    # 4. video: sample one frame each 160 ms, decode each frame
    def _frames(batches):
        from vechord_spark.sources.jpeg import decode_jpeg
        from vechord_spark.sources.multimodal import sample_video_frames

        for pdf in batches:
            n, ok = [], []
            for d in pdf["data"]:
                fs = sample_video_frames(bytes(d), 160)
                n.append(len(fs))
                ok.append(all(decode_jpeg(f)[2] == 3 for f in fs))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "n_frames": n, "all_decode": ok}
            )

    vids = (
        media.filter(F.col("kind") == "video")
        .select("media_id", "data")
        .mapInPandas(_frames, "media_id string, n_frames int, all_decode boolean")
    )
    for r in vids.collect():
        print("video:", tuple(r))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
