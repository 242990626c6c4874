"""Generate synthetic testdata at a larger scale factor for scale sweeps.

The driver's testdata (/root/testdata/sf{0.001,0.01,0.1}) is read-only and
tops out at sf0.1, where the bench suite is scheduler-floor-bound (round-13
close: 785 warm jobs x ~84 ms/job IS the warm wall).  Per the round-14
verdict, scale evidence needs a bigger SF.  This script reproduces the same
star schema with the same dtypes and (measured) marginal distributions at an
arbitrary scale factor, deterministically (seed fixed per table), so that
per-query sf1/sf0.1 wall ratios measure plan scaling, not data drift.

Distribution provenance (measured from /root/testdata/sf0.1):
  - part.p_retailprice == 900 + (p_partkey % 1000) * 0.1 (exact law)
  - documents.source == f"src{doc_id % 20}" (exact law); n_chars == len(text)
  - text: 10-100 words uniform from the 31-word vocab; ~0.16% exact dup docs
  - lang ~ {en: .41, zh/es/fr/de: ~.1475}
  - embeddings: 64-dim unit-norm float32, weak label structure
    (mean cos to own label centroid 0.071, to others ~0.0)
  - lineitem.l_shipdate: independent uniform 1995-01-02..2001-11-04
    (NOT orderdate-relative; measured deltas span -2399..+2496 days)
  - events.ts: sorted, ~exponential inter-arrival over 30 days of 2024-01;
    value ~ Exp(mean 50) rounded to cents; props = {"k": U(0,99)}
  - nation/region are fixed dimension tables, copied verbatim from sf0.1.

Usage:
    python benchmarks/gen_testdata.py --sf 1 --out /root/testdata_gen/sf1
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_DIR = Path("/root/testdata/sf0.1")
REF_SF = 0.1

# rows at sf0.1 (measured); everything scales linearly in sf except the
# fixed dimension tables
BASE_ROWS = {
    "customer": 15_000,
    "documents": 5_000,
    "embeddings": 2_000,
    "events": 100_000,
    "lineitem": 600_000,
    "orders": 150_000,
    "part": 20_000,
    "supplier": 1_000,
}

DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PART_ADJ = ["large", "hot", "blue", "old", "new", "red", "small", "cold"]
PART_NOUN = ["ring", "bolt", "gear", "plate", "rod", "widget", "anvil", "gizmo"]
PART_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]


def _days(lo: str, hi: str) -> tuple[np.datetime64, int]:
    a = np.datetime64(lo)
    return a, int((np.datetime64(hi) - a).astype(int)) + 1


def gen(sf: float, out: Path) -> None:
    out.mkdir(parents=True, exist_ok=True)
    n = {t: max(1, int(round(r * sf / REF_SF))) for t, r in BASE_ROWS.items()}

    # fixed dimension tables: copy verbatim
    for t in ("nation", "region"):
        shutil.copyfile(REF_DIR / f"{t}.parquet", out / f"{t}.parquet")

    # --- customer ---
    rng = np.random.default_rng(4201)
    k = np.arange(n["customer"], dtype=np.int64)
    tbl = pa.table(
        {
            "c_custkey": k,
            "c_name": pa.array([f"Customer#{i:09d}" for i in k], pa.string()),
            "c_nationkey": rng.integers(0, 25, n["customer"]).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n["customer"]), 2),
            "c_mktsegment": pa.array(
                np.array(SEGMENTS)[rng.integers(0, 5, n["customer"])], pa.string()
            ),
        }
    )
    pq.write_table(tbl, out / "customer.parquet")

    # --- supplier ---
    rng = np.random.default_rng(4202)
    k = np.arange(n["supplier"], dtype=np.int64)
    tbl = pa.table(
        {
            "s_suppkey": k,
            "s_name": pa.array([f"Supplier#{i:09d}" for i in k], pa.string()),
            "s_nationkey": rng.integers(0, 25, n["supplier"]).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n["supplier"]), 2),
        }
    )
    pq.write_table(tbl, out / "supplier.parquet")

    # --- part ---
    rng = np.random.default_rng(4203)
    k = np.arange(n["part"], dtype=np.int64)
    names = [
        f"{PART_ADJ[i]} {PART_NOUN[j]}"
        for i, j in zip(rng.integers(0, 8, n["part"]), rng.integers(0, 8, n["part"]))
    ]
    tbl = pa.table(
        {
            "p_partkey": k,
            "p_name": pa.array(names, pa.string()),
            "p_brand": pa.array(
                [f"Brand#{b}" for b in rng.integers(1, 26, n["part"])], pa.string()
            ),
            "p_type": pa.array(
                np.array(PART_TYPES)[rng.integers(0, 6, n["part"])], pa.string()
            ),
            "p_size": rng.integers(1, 51, n["part"]).astype(np.int32),
            "p_retailprice": 900.0 + (k % 1000) * 0.1,
        }
    )
    pq.write_table(tbl, out / "part.parquet")

    # --- orders ---
    rng = np.random.default_rng(4204)
    k = np.arange(n["orders"], dtype=np.int64)
    d0, span = _days("1995-01-01", "2001-08-01")
    tbl = pa.table(
        {
            "o_orderkey": k,
            "o_custkey": rng.integers(0, n["customer"], n["orders"]).astype(np.int64),
            "o_orderstatus": pa.array(
                np.array(["O", "F", "P"])[rng.integers(0, 3, n["orders"])], pa.string()
            ),
            "o_totalprice": np.round(rng.uniform(1000, 500000, n["orders"]), 2),
            "o_orderdate": pa.array(
                (d0 + rng.integers(0, span, n["orders"]).astype("timedelta64[D]"))
                .astype("datetime64[us]")
            ),
            "o_orderpriority": pa.array(
                np.array(PRIORITIES)[rng.integers(0, 5, n["orders"])], pa.string()
            ),
        }
    )
    pq.write_table(tbl, out / "orders.parquet")

    # --- lineitem ---
    rng = np.random.default_rng(4205)
    m = n["lineitem"]
    d0, span = _days("1995-01-02", "2001-11-04")
    tbl = pa.table(
        {
            "l_orderkey": rng.integers(0, n["orders"], m).astype(np.int64),
            "l_partkey": rng.integers(0, n["part"], m).astype(np.int64),
            "l_suppkey": rng.integers(0, n["supplier"], m).astype(np.int64),
            "l_linenumber": rng.integers(1, 8, m).astype(np.int32),
            "l_quantity": rng.integers(1, 51, m).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, m), 2),
            "l_discount": rng.integers(0, 11, m) * 0.01,
            "l_tax": rng.integers(0, 9, m) * 0.01,
            "l_returnflag": pa.array(
                np.array(["N", "R", "A"])[rng.integers(0, 3, m)], pa.string()
            ),
            "l_linestatus": pa.array(
                np.array(["O", "F"])[rng.integers(0, 2, m)], pa.string()
            ),
            "l_shipdate": pa.array(
                (d0 + rng.integers(0, span, m).astype("timedelta64[D]"))
                .astype("datetime64[us]")
            ),
        }
    )
    pq.write_table(tbl, out / "lineitem.parquet")

    # --- documents ---
    rng = np.random.default_rng(4206)
    nd = n["documents"]
    lens = rng.integers(10, 101, nd)
    vocab = np.array(DOC_VOCAB)
    words = vocab[rng.integers(0, len(vocab), int(lens.sum()))]
    texts: list[str] = []
    pos = 0
    for ln in lens:
        texts.append(" ".join(words[pos : pos + ln]))
        pos += ln
    # inject ~0.16% exact duplicates (dedup queries need work to do)
    n_dup = max(1, int(nd * 0.0016))
    dup_at = rng.choice(np.arange(1, nd), size=n_dup, replace=False)
    for i in dup_at:
        texts[int(i)] = texts[int(rng.integers(0, i))]
    tbl = pa.table(
        {
            "doc_id": np.arange(nd, dtype=np.int64),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                np.array(LANGS)[rng.choice(5, nd, p=LANG_P)], pa.string()
            ),
            "source": pa.array([f"src{i % 20}" for i in range(nd)], pa.string()),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, out / "documents.parquet")

    # --- embeddings ---
    rng = np.random.default_rng(4207)
    ne = n["embeddings"]
    cents = rng.standard_normal((10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    lab = rng.integers(0, 10, ne).astype(np.int32)
    v = rng.standard_normal((ne, 64)) + 0.565 * cents[lab]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v32 = v.astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(pa.array(v32.ravel()), 64).cast(
        pa.list_(pa.float32())
    )
    tbl = pa.table(
        {"vec_id": np.arange(ne, dtype=np.int64), "embedding": emb, "label": lab}
    )
    pq.write_table(tbl, out / "embeddings.parquet")

    # --- events ---
    rng = np.random.default_rng(4208)
    nev = n["events"]
    gaps = rng.exponential(1.0, nev)
    ts_f = np.cumsum(gaps)
    ts_f *= (30 * 86400 - 120) / ts_f[-1]  # span ~30 days of 2024-01
    ts = np.datetime64("2024-01-01") + (ts_f * 1e6).astype("timedelta64[us]")
    n_users = max(1, n["customer"] // 10)
    tbl = pa.table(
        {
            "event_id": np.arange(nev, dtype=np.int64),
            "ts": pa.array(ts),
            "user_id": rng.integers(0, n_users, nev).astype(np.int64),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.integers(0, 5, nev)], pa.string()
            ),
            "value": np.round(rng.exponential(50.0, nev), 2),
            "props": pa.array(
                [json.dumps({"k": int(x)}) for x in rng.integers(0, 100, nev)],
                pa.string(),
            ),
        }
    )
    pq.write_table(tbl, out / "events.parquet")

    for f in sorted(out.iterdir()):
        print(f.name, pq.read_metadata(f).num_rows, "rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", type=Path, required=True)
    a = ap.parse_args()
    gen(a.sf, a.out)
