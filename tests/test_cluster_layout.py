"""compact(order_by=...) / compact(zorder_by=...) — OPTIMIZE layout
clustering. The win is parquet footer min/max (zone maps): a range
predicate skips whole files/row groups, so the assertions read the
actual footer statistics with pyarrow rather than trusting the sort.
"""

import random

import pyarrow.parquet as pq
import pytest

from pathlib import Path

from vechord_spark.registry import VechordRegistry
from vechord_spark.spec import Column, TableSpec


def _registry(spark, tmp_path, ns):
    r = VechordRegistry(ns, str(tmp_path), spark)
    r.register(
        TableSpec(
            "pts",
            [
                Column("uid", "int", primary_key=True),
                Column("x", "int"),
                Column("y", "int"),
            ],
        )
    )
    return r


def _file_ranges(table_dir: Path, col: str) -> list[tuple[int, int]]:
    """(min, max) of ``col`` per live parquet file, from the footer
    statistics — exactly what a zone-map-pruning reader consults."""
    out = []
    for p in sorted(table_dir.glob("*.parquet")):
        md = pq.ParquetFile(p).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def _fill(r, n=4000, seed=7):
    rng = random.Random(seed)
    rows = [
        {"uid": i, "x": rng.randrange(10_000), "y": rng.randrange(10_000)}
        for i in range(n)
    ]
    # several appends -> several unsorted file sets
    for lo in range(0, n, 1000):
        r.insert_rows("pts", rows[lo : lo + 1000])
    return rows


def _live_files(r) -> Path:
    return Path(r.table_path("pts"))


def test_compact_order_by_makes_files_disjoint(spark, tmp_path):
    r = _registry(spark, tmp_path, "clus_ob")
    rows = _fill(r)
    stats = r.compact("pts", target_file_bytes=8192, order_by=["x"])
    assert stats["files_after"] >= 3
    ranges = sorted(_file_ranges(_live_files(r), "x"))
    # every file covers a DISJOINT slice of the sort key: file N's max
    # is below file N+1's min -> a range predicate skips all but the
    # overlapping files on footer stats alone
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo
    # pure layout change: the row set is untouched
    got = sorted(
        (x["uid"], x["x"], x["y"]) for x in r.load("pts").collect()
    )
    assert got == sorted((w["uid"], w["x"], w["y"]) for w in rows)


def test_compact_zorder_narrows_both_columns(spark, tmp_path):
    r = _registry(spark, tmp_path, "clus_zo")
    _fill(r, seed=11)

    def mean_span(col):
        spans = [hi - lo for lo, hi in _file_ranges(_live_files(r), col)]
        return sum(spans) / len(spans)

    # baseline: shuffled compact -> every file spans ~the full domain
    r.compact("pts", target_file_bytes=8192, shuffle=True)
    base_x, base_y = mean_span("x"), mean_span("y")
    assert base_x > 8000 and base_y > 8000

    r.compact("pts", target_file_bytes=8192, zorder_by=["x", "y"])
    n_files = len(list(_live_files(r).glob("*.parquet")))
    assert n_files >= 3
    zx, zy = mean_span("x"), mean_span("y")
    # the Z-curve keeps BOTH columns' per-file ranges narrow at once —
    # an ORDER BY x layout would leave y at ~the full domain
    assert zx < base_x * 0.7 and zy < base_y * 0.7, (zx, zy, base_x, base_y)
    assert r.load("pts").count() == 4000


def test_compact_order_by_survives_reads_and_validates(spark, tmp_path):
    r = _registry(spark, tmp_path, "clus_v")
    _fill(r, n=1000)
    with pytest.raises(ValueError, match="not both"):
        r.compact("pts", order_by=["x"], zorder_by=["x", "y"])
    with pytest.raises(ValueError, match=">= 2"):
        r.compact("pts", zorder_by=["x"])
    # optimistic-concurrency registries cluster through the manifest
    # commit path too
    ro = VechordRegistry(
        "clus_occ", str(tmp_path), spark, concurrency="optimistic"
    )
    ro.register(
        TableSpec(
            "pts",
            [
                Column("uid", "int", primary_key=True),
                Column("x", "int"),
                Column("y", "int"),
            ],
        )
    )
    rng = random.Random(3)
    for lo in range(0, 3000, 1000):
        ro.insert_rows(
            "pts",
            [
                {"uid": i, "x": rng.randrange(10_000), "y": 0}
                for i in range(lo, lo + 1000)
            ],
        )
    ro.compact("pts", target_file_bytes=8192, order_by=["x"])
    live = Path(ro.table_path("pts"))
    snap = ro._ensure_log("pts").snapshot()
    # footer ranges over the COMMITTED snapshot files only
    committed = []
    for fname in snap.files:
        md = pq.ParquetFile(live / fname).metadata
        idx = md.schema.to_arrow_schema().get_field_index("x")
        lo_hi = [
            md.row_group(rg).column(idx).statistics for rg in range(md.num_row_groups)
        ]
        committed.append(
            (min(s.min for s in lo_hi), max(s.max for s in lo_hi))
        )
    committed.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(committed, committed[1:]):
        assert a_hi <= b_lo
    assert ro.load("pts").count() == 3000
