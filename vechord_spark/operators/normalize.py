"""Mojibake repair — undo UTF-8-bytes-read-as-latin-1/cp1252 damage
(the ftfy `fix_text` core, reimplemented from the public description
of the technique; no ftfy dependency).

The single most common text corruption in crawl corpora: a document
was WRITTEN as UTF-8 but somewhere in its life a system re-decoded
those bytes as latin-1 or windows-1252, turning every non-ASCII
character into a 2-4 character litter sequence ("é" -> "Ã©",
"№" -> "â„–"); sometimes twice (double mojibake). The repair is the
inverse round trip: if the text's characters all map back to single
bytes under cp1252/latin-1 AND those bytes decode as valid UTF-8
producing a SHORTER string, the text almost certainly was mojibake —
valid UTF-8 by accident is vanishingly unlikely for natural text
(every multi-byte sequence must hit the exact continuation-byte
ranges). Applied iteratively for the double-encoded case.

Scale shape: pure per-row string function, one Arrow-batched pass,
embarrassingly parallel, zero shuffles — run it right after extract
and before tokenization so every downstream signal (shingles,
quality, LM scores) sees clean text.
"""

from __future__ import annotations

import pandas as pd  # module-top: pandas-UDF string type hints resolve here

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undo_once(s: str) -> str | None:
    """One inverse round trip, or None when ``s`` does not look like
    mojibake. cp1252 first (the common Windows pipeline), strict
    latin-1 second (recovers bytes cp1252 has no character for,
    e.g. U+0083)."""
    for enc in ("cp1252", "latin-1"):
        try:
            b = s.encode(enc)
        except UnicodeEncodeError:
            continue
        try:
            t = b.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if t != s and len(t) < len(s):
            return t
    return None


def fix_mojibake(s: str, max_passes: int = 3) -> tuple[str, int]:
    """``(repaired_text, passes_applied)``. Clean text (including
    legitimately non-ASCII text — "café" encodes to cp1252 bytes that
    are NOT valid UTF-8, so the round trip refuses it) comes back
    unchanged with 0 passes; single mojibake repairs in 1, double in
    2. ``max_passes`` bounds pathological inputs."""
    passes = 0
    while passes < max_passes:
        t = _undo_once(s)
        if t is None:
            break
        s = t
        passes += 1
    return s, passes


def scrub_mojibake(
    df: DataFrame, id_col: str, text_col: str, max_passes: int = 3
) -> DataFrame:
    """Corpus mojibake scrub: ``(id, text, mojibake_passes)`` with
    ``text`` repaired in place — one Arrow-batched pass, NULL text
    rides through as NULL with 0 passes."""

    @F.pandas_udf("text string, mojibake_passes int")
    def _fix(texts: pd.Series) -> pd.DataFrame:
        out, np_ = [], []
        for t in texts:
            if t is None:
                out.append(None)
                np_.append(0)
                continue
            fixed, n = fix_mojibake(t, max_passes)
            out.append(fixed)
            np_.append(n)
        return pd.DataFrame({"text": out, "mojibake_passes": np_})

    return df.select(
        F.col(id_col), _fix(F.col(text_col)).alias("__m")
    ).select(
        id_col,
        F.col("__m.text").alias(text_col),
        F.col("__m.mojibake_passes").alias("mojibake_passes"),
    )
