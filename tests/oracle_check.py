"""Local oracle-parity harness: run every suite query on Spark AND its
DuckDB oracle, compare row sets exactly (mimics the driver's
row-count + schema + value-hash gate).

Usage:  python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows, columns):
    """Sort columns by name, then rows — order-insensitive compare."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [columns[i] for i in order], out


def main() -> int:
    import vechord_spark as vs
    from vechord_spark.suite import ORACLES, QUERIES

    spark = vs.get_spark("oracle-check", shuffle_partitions=8)
    con = duck_con(SF_DIR)
    failures = 0
    for name, fn in QUERIES.items():
        if ONLY and name not in ONLY:
            continue
        sdf = fn(spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        if name not in ORACLES:
            print(f"{name:28s} rows={len(srows):6d}  (no oracle — rows-only)")
            continue
        cur = con.execute(ORACLES[name])
        dcols = [d[0] for d in cur.description]
        drows = [tuple(r) for r in cur.fetchall()]
        sc, sn = normalize(srows, scols)
        dc, dn = normalize(drows, dcols)
        status = "OK"
        detail = ""
        if sc != dc:
            status, detail = "SCHEMA-MISMATCH", f"spark={sc} duck={dc}"
        elif len(sn) != len(dn):
            status, detail = "COUNT-MISMATCH", f"spark={len(sn)} duck={len(dn)}"
        elif sn != dn:
            status = "VALUE-MISMATCH"
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            detail = f"first diffs: {diffs}"
        if status != "OK":
            failures += 1
        print(f"{name:28s} rows={len(sn):6d}  {status} {detail[:300]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
