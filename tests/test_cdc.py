"""Content-defined chunking: the Gear rolling hash is pinned against a
from-the-definition byte-loop, the resynchronization property is
tested directly (the reason CDC exists), and the Spark pair operator
is exercised end-to-end."""

import hashlib

import numpy as np
import pytest

from vechord_spark.operators.cdc import (
    _GEAR,
    cdc_boundaries,
    cdc_chunk_hashes,
    cdc_chunks,
    gear_hashes,
    shared_chunk_pairs,
)


def naive_gear(data: bytes) -> list[int]:
    """h_i = (h_{i-1} << 1) + GEAR[b_i]  (mod 2^64), from the definition."""
    out, h = [], 0
    for b in data:
        h = ((h << 1) + int(_GEAR[b])) & 0xFFFFFFFFFFFFFFFF
        out.append(h)
    return out


def _rand_text(seed: int, n: int) -> str:
    rng = np.random.default_rng(seed)
    return "".join(chr(97 + int(c)) for c in rng.integers(0, 26, n))


def test_gear_matches_naive():
    for seed, n in [(0, 1), (1, 63), (2, 64), (3, 65), (4, 500)]:
        data = bytes(np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8))
        assert gear_hashes(data).tolist() == naive_gear(data), (seed, n)


def test_boundary_density_near_expected():
    text = _rand_text(7, 8192)
    ends = cdc_boundaries(text.encode(), mask_bits=6)
    avg = 8192 / len(ends)
    assert 32 < avg < 128  # expected 64, generous band


def test_chunks_reassemble_and_are_deterministic():
    text = _rand_text(9, 3000)
    data = text.encode()
    ends = cdc_boundaries(data)
    assert ends[-1] == len(data)
    assert ends == sorted(set(ends))
    chunks = cdc_chunks(text)
    assert chunks == cdc_chunks(text)
    # offsets + hashes cover the text exactly
    start = 0
    for (off, hx), end in zip(chunks, ends):
        assert off == start
        assert hx == hashlib.md5(data[start:end]).hexdigest()
        start = end
    assert cdc_chunks("") == []


def test_resynchronization_after_prefix_edit():
    """THE CDC property: an edit changes only chunks within ~window of
    it — every other chunk fingerprint survives."""
    text = _rand_text(11, 4096)
    base = set(h for _, h in cdc_chunks(text))
    for prefix in ("x", "hello world ", "p" * 300):
        edited = set(h for _, h in cdc_chunks(prefix + text))
        assert len(base & edited) >= len(base) - 2, len(base & edited)
    # and a mid-document splice resynchronizes on both sides
    mid = len(text) // 2
    spliced = set(h for _, h in cdc_chunks(text[:mid] + "INSERTED" + text[mid:]))
    assert len(base & spliced) >= len(base) - 3


def test_shared_chunk_pairs_spark(spark):
    passage = _rand_text(21, 1500)
    rows = []
    for d in range(6):
        affix = _rand_text(100 + d, 200)
        # docs 0-3 share the passage wrapped in unique affixes; 4-5 unique
        text = (
            affix[:100] + passage + affix[100:]
            if d < 4
            else _rand_text(500 + d, 1900)
        )
        rows.append((d, text))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = cdc_chunk_hashes(df)
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_chunks"]
        for r in shared_chunk_pairs(chunks, min_shared=2).collect()
    }
    assert set(pairs) == {(a, b) for a in range(4) for b in range(4) if a < b}
    assert len(set(pairs.values())) == 1  # same interior chunk count per pair


def test_mega_bucket_cap_drops_boilerplate(spark):
    # one chunk shared by every doc (boilerplate) is dropped by the cap
    passage = _rand_text(31, 800)
    rows = [(d, _rand_text(600 + d, 150) + passage) for d in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = cdc_chunk_hashes(df)
    n_all = shared_chunk_pairs(chunks, min_shared=1, max_bucket=256).count()
    n_capped = shared_chunk_pairs(chunks, min_shared=1, max_bucket=4).count()
    assert n_all == 28  # all 8C2 pairs share the passage
    assert n_capped == 0  # every shared chunk sits in an 8-doc bucket


def test_duplicate_chunk_within_doc_counts_once(spark):
    passage = _rand_text(41, 1200)
    rows = [(0, passage + passage), (1, passage)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = cdc_chunk_hashes(df)
    from vechord_spark.operators.cdc import cdc_chunks_with_len

    [row] = shared_chunk_pairs(chunks, min_shared=1).collect()
    interior = len(
        set(h for _, ln, h in cdc_chunks_with_len(passage) if ln >= 16)
        & set(
            h
            for _, ln, h in cdc_chunks_with_len(passage + passage)
            if ln >= 16
        )
    )
    assert (row["id_a"], row["id_b"]) == (0, 1)
    assert row["shared_chunks"] == interior
