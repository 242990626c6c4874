"""Bloom-filter prefiltered anti-join — shuffle-free "is this new?"
at corpus scale.

The incremental-crawl primitive (reference has no analog; this is the
driver-mandated training-pipeline extension next to
``operators/dedup.incremental_new_docs``): with a billion-key seen-set,
a plain ``left_anti`` join shuffles the ENTIRE new batch on the join
key. A Bloom filter inverts the cost: rows the filter rejects are
*definitely* unseen and keep flowing map-only; only the small "maybe
seen" fraction (true dupes + ``fpp`` of the rest) pays the exact
anti-join confirm. The result is EXACT — the bloom has no false
negatives, so the confirm join restores set semantics — which is why
``bloom_anti_join`` can carry a plain SQL oracle.

Design notes for exactness and scale:

- The k hash positions are computed JVM-side (``xxhash64(key, seed)``,
  ``pmod`` m) with the SAME Column expressions on the build and probe
  sides — no Python reimplementation of Spark's hash to drift.
- The bitset is built distributedly: explode positions -> group by
  64-bit word index -> ``bit_or`` of the shifted masks. Only m/64
  longs ever reach the driver (1.8 MB per 10M expected keys at 1%
  fpp: m ≈ 9.6 bits/key). Seen-sets around ~100M keys broadcast
  comfortably (~120 MB); beyond that, partition the seen-set and run
  per-partition blooms, or raise fpp.
- Probe-side Python is bit-lookup only (numpy gather over the
  broadcast words), Arrow-batched.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


@dataclass
class BloomFilter:
    """m-bit filter as packed little-endian 64-bit words + params.

    The word array is broadcast AT MOST ONCE per filter (lazily, on the
    first probe) and reused by every subsequent ``might_contain`` call
    — repeated incremental runs in a long-lived session would otherwise
    accumulate one orphaned broadcast block per probe. ``unpersist()``
    releases the executor copies when the filter is retired."""

    words: np.ndarray  # uint64[m // 64]
    m: int
    k: int
    n_build: int
    _broadcast: object = field(default=None, repr=False, compare=False)

    @property
    def size_bytes(self) -> int:
        return int(self.words.nbytes)

    def broadcast_words(self, sc):
        """The (cached) Spark broadcast of the packed word array."""
        if self._broadcast is None:
            self._broadcast = sc.broadcast(self.words)
        return self._broadcast

    def unpersist(self) -> None:
        """Release the cached broadcast (no-op if never probed)."""
        if self._broadcast is not None:
            self._broadcast.unpersist()
            self._broadcast = None


def write_bloom(bloom: BloomFilter, path) -> None:
    """Persist the filter as raw little-endian words + a params sidecar
    — the day-1 curation artifact ``bloom_anti_join`` reloads on day 2
    (see plans/artifacts.py). Bytes, not pickle: the layout stays
    readable across Python/numpy versions."""
    import json
    from pathlib import Path

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "words.bin").write_bytes(
        np.ascontiguousarray(bloom.words, dtype="<u8").tobytes()
    )
    (path / "bloom.json").write_text(
        json.dumps({"m": bloom.m, "k": bloom.k, "n_build": bloom.n_build})
    )


def read_bloom(path) -> BloomFilter:
    """Load a ``write_bloom`` layout (words are copied out of the
    read-only buffer so broadcast pickling sees a plain owned array)."""
    import json
    from pathlib import Path

    path = Path(path)
    meta = json.loads((path / "bloom.json").read_text())
    words = np.frombuffer((path / "words.bin").read_bytes(), dtype="<u8").copy()
    if words.size != meta["m"] // 64:
        raise ValueError(
            f"bloom words length {words.size} != m/64 = {meta['m'] // 64}"
        )
    return BloomFilter(
        words=words, m=meta["m"], k=meta["k"], n_build=meta["n_build"]
    )


def _params(expected_n: int, fpp: float) -> tuple[int, int]:
    """Standard sizing: m = -n ln p / ln²2 bits (rounded up to whole
    words), k = (m/n) ln 2 hashes, capped at 16."""
    n = max(1, expected_n)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _positions(key: Column, m: int, k: int) -> Column:
    """Array of k bit positions for ``key`` — pure JVM expressions, so
    build and probe sides hash identically by construction."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda s: F.pmod(F.xxhash64(key, s), F.lit(m)),
    )


def build_bloom(
    df: DataFrame,
    key_col: str,
    expected_n: int | None = None,
    fpp: float = 0.01,
) -> BloomFilter:
    """One scan of ``df``: explode the k positions per key, OR the bit
    masks per 64-bit word. The driver receives at most m/64 rows."""
    if expected_n is None:
        expected_n = df.count()
    m, k = _params(expected_n, fpp)
    key = F.col(key_col)
    words = (
        df.select(F.explode(_positions(key, m, k)).alias("pos"))
        .select(
            F.shiftright("pos", 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    arr = np.zeros(m // 64, dtype=np.uint64)
    for r in words:
        arr[r["w"]] = np.uint64(r["bits"] % (1 << 64))
    return BloomFilter(words=arr, m=m, k=k, n_build=expected_n)


# Bit masks 1<<0 .. 1<<63 as SIGNED longs (1<<63 wraps negative): a
# literal lookup array because pyspark's shiftleft() only takes a
# literal shift count, while element_at() happily takes a computed
# index — same bits either way.
_POW2 = [(1 << b) - ((1 << 64) if b == 63 else 0) for b in range(64)]

# Filters up to this many 64-bit words (256 KiB of bits ≈ 180k keys at
# 1% fpp) are probed by a PURE-JVM literal-array expression instead of
# the pandas-UDF broadcast path: the words become a plan literal and
# the bit test stays inside whole-stage codegen — no Python worker
# spin-up, no Arrow hop. Larger filters fall back to the broadcast UDF
# (a multi-MB plan literal would bloat codegen and the plan cache).
_LITERAL_WORDS_MAX = 32768


def _might_contain_literal(key: Column, bloom: BloomFilter) -> Column:
    """JVM-only probe: unrolled AND over the k bit tests, each an
    element_at into the literal word array. Signed reinterpretation of
    the uint64 words preserves every bit."""
    words_lit = F.lit(
        [int(w) - ((1 << 64) if int(w) >= (1 << 63) else 0) for w in bloom.words]
    )
    pow2_lit = F.lit(_POW2)
    return F.forall(
        _positions(key, bloom.m, bloom.k),
        lambda p: F.element_at(words_lit, F.shiftright(p, 6).cast("int") + F.lit(1))
        .bitwiseAND(
            F.element_at(pow2_lit, p.bitwiseAND(F.lit(63)).cast("int") + F.lit(1))
        )
        != F.lit(0),
    )


def might_contain(df: DataFrame, key_col: str, bloom: BloomFilter) -> Column:
    """Boolean probe Column: True = maybe in the build set, False =
    DEFINITELY not. Positions come from the same JVM expressions as
    the build; small filters are probed entirely JVM-side (literal
    word array, whole-stage codegen), large ones gather bits from the
    broadcast words in an Arrow-batched pandas UDF."""
    if bloom.words.size <= _LITERAL_WORDS_MAX:
        return _might_contain_literal(F.col(key_col), bloom)
    words_b = bloom.broadcast_words(df.sparkSession.sparkContext)

    @pandas_udf("boolean")
    def _probe(pos: pd.Series) -> pd.Series:
        bits = words_b.value
        out = np.empty(len(pos), dtype=bool)
        for i, p in enumerate(pos):
            idx = np.asarray(p, dtype=np.int64)
            w = bits[idx >> 6]
            out[i] = bool(
                np.all((w >> (idx & 63).astype(np.uint64)) & np.uint64(1))
            )
        return pd.Series(out)

    return _probe(_positions(F.col(key_col), bloom.m, bloom.k))


def bloom_anti_join(
    new: DataFrame,
    seen: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    expected_n: int | None = None,
    bloom: BloomFilter | None = None,
) -> DataFrame:
    """EXACT ``new LEFT ANTI JOIN seen ON key`` with bloom-pruned
    shuffle: definitely-unseen rows (bloom says no) never shuffle;
    only the maybe-seen candidates are confirmed by the real anti-join.

    At 1% fpp the shuffled fraction is (true-dupe rate + 1%) of the
    new batch instead of 100% — on an incremental crawl where most
    content is new, that is the difference between re-shuffling the
    whole day's data and shuffling a percent of it.

    ``bloom``: pass the PERSISTED filter of the seen set (built once at
    curation time, ``build_bloom``) to skip the seen-side scan — the
    per-batch cost is then O(new batch + confirm join). EXACTNESS
    CONTRACT: the bloom must have been built from a SUPERSET of
    ``seen``'s keys. A bloom has no false negatives only for keys it
    was built with — probing a STALE bloom (seen grew since the build)
    routes the new keys' duplicates to the definitely-new path and the
    confirm join never sees them. Rebuild (or extend) the filter
    whenever the seen set grows.
    """
    if bloom is None:
        bloom = build_bloom(seen.select(key_col), key_col, expected_n, fpp)
    flagged = new.withColumn("__maybe_seen", might_contain(new, key_col, bloom))
    definite = flagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    candidates = flagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    confirmed = candidates.join(
        seen.select(key_col).distinct(), key_col, "left_anti"
    )
    return definite.unionByName(confirmed)
