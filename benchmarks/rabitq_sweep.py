"""RaBitQ 10x sweep: build/search/recall economics of the bit layout
vs plain IVF and PQ at two corpus sizes.

The 100 TB claims under test (operators/rabitq.py):
- BUILD: RaBitQ has nothing codebook-shaped to fit — build cost is the
  IVF fit + one encode pass, so it undercuts PQ's extra KMeans fits
  and never stales on extend.
- SEARCH: the estimate pass reads D/8-byte codes + two scalars per row
  instead of 4·D-byte floats (dim=64 -> 32x column-bytes cut), then
  exact-refines ``refine`` survivors. Walls should track PQ's
  two-phase shape, and the 10x corpus should scale the estimate
  sublinearly in wall (probe pruning) with recall holding.
- RECALL: corrected-estimator ordering keeps recall@10 at or above PQ
  at the same (probes, refine) budget.

Run:  python benchmarks/rabitq_sweep.py
      SWEEP_BASE_N=20000 python benchmarks/rabitq_sweep.py
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE_N = int(os.environ.get("SWEEP_BASE_N", "20000"))
DIM = 64
LISTS = 64
PROBES = 4
REFINE = 100
K = 10
REPS = 3


def _dir_bytes(path: Path) -> int:
    return sum(p.stat().st_size for p in path.rglob("*.parquet") if p.is_file())


def main() -> None:
    import numpy as np

    import vechord_spark as vs
    from vechord_spark.registry import VechordRegistry
    from vechord_spark.spec import Column, TableSpec, Vector

    load0 = [round(x, 2) for x in os.getloadavg()]
    spark = vs.get_spark("rabitq-sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict] = {}
    for label, n in (("base", BASE_N), ("10x", BASE_N * 10)):
        rng = np.random.default_rng(7)
        # clustered blobs (RaBitQ/PQ earn their keep on clustered data)
        n_blobs = 32
        centers = rng.standard_normal((n_blobs, DIM)) * 3.0
        ids = np.arange(n)
        blob = ids % n_blobs
        vecs = centers[blob] + rng.standard_normal((n, DIM)) * 0.6
        pdf_rows = [
            {"uid": int(i), "v": [float(x) for x in vecs[i]]} for i in range(n)
        ]
        out: dict[str, dict] = {}
        queries = [list(map(float, vecs[rng.integers(0, n)])) for _ in range(8)]

        def exact_ids(reg, q):
            return [
                r.uid for r in reg.search_by_vector("t", q, topk=K).collect()
            ]

        for kind in ("ivf", "pq", "rabitq"):
            tmp = tempfile.mkdtemp(prefix=f"rq_{label}_{kind}_")
            reg = VechordRegistry(f"rq{kind}", tmp, spark)
            reg.register(
                TableSpec(
                    "t",
                    [
                        Column("uid", "long", primary_key=True),
                        Column("v", Vector(DIM)),
                    ],
                )
            )
            reg.insert_rows("t", pdf_rows)
            t0 = time.perf_counter()
            if kind == "ivf":
                reg.build_vector_index("t", lists=LISTS)
            elif kind == "pq":
                reg.build_vector_index("t", lists=LISTS, pq_m=8, pq_ksub=256)
            else:
                reg.build_vector_index("t", lists=LISTS, rabitq=True)
            build_s = time.perf_counter() - t0
            kw = {} if kind == "ivf" else {"refine": REFINE}
            # warm once, then time REPS rounds of the 8-query loop
            for q in queries:
                reg.search_by_vector("t", q, topk=K, probes=PROBES, **kw).collect()
            t0 = time.perf_counter()
            for _ in range(REPS):
                for q in queries:
                    reg.search_by_vector(
                        "t", q, topk=K, probes=PROBES, **kw
                    ).collect()
            search_s = (time.perf_counter() - t0) / (REPS * len(queries))
            hits = 0
            for q in queries:
                got = {
                    r.uid
                    for r in reg.search_by_vector(
                        "t", q, topk=K, probes=PROBES, **kw
                    ).collect()
                }
                hits += len(got & set(exact_ids(reg, q)))
            out[kind] = {
                "build_s": round(build_s, 2),
                "search_s_per_q": round(search_s, 4),
                "recall_at_10": round(hits / (K * len(queries)), 3),
                "layout_mb": round(
                    _dir_bytes(reg._index_path("t") / "data") / 1e6, 1
                ),
            }
        results[label] = {"n": n, **out}
        print(f"# {label}: {json.dumps(results[label])}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "rabitq_sweep",
                "base_n": BASE_N,
                "dim": DIM,
                "lists": LISTS,
                "probes": PROBES,
                "refine": REFINE,
                "loadavg_pre": load0,
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
