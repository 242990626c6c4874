"""maintain() end-to-end 10x sweep (round-12 verdict ask #7).

The composed auto-policy's scale claim: a HEALTHY layout is a cheap
no-op (stats reads only), and healing cost scales with the DAMAGE, not
the corpus. This sweep pins both: two corpora (base and a 10x clone)
receive the SAME absolute damage — a drift append, a delete sweep, and
small-file fragmentation — then one maintain() heals each and a second
maintain() confirms the no-op. If the policy were corpus-bound, the
10x heal would read ~10x; damage-bound, it stays ~flat.

Run:  python benchmarks/maintain_sweep.py
      SWEEP_BASE_N=2000 SWEEP_DAMAGE=200 python benchmarks/maintain_sweep.py
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

BASE_N = int(os.environ.get("SWEEP_BASE_N", "2000"))
DAMAGE = int(os.environ.get("SWEEP_DAMAGE", "200"))
DIM = 16


def _rows(rng: random.Random, ids, center):
    return [
        {
            "uid": i,
            "v": [c + rng.uniform(-0.5, 0.5) for c in center],
        }
        for i in ids
    ]


def main() -> None:
    import vechord_spark as vs
    from vechord_spark.registry import VechordRegistry
    from vechord_spark.spec import AnyOf, Column, TableSpec, Vector

    load0 = [round(x, 2) for x in os.getloadavg()]
    spark = vs.get_spark("maintain-sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict] = {}
    for label, n in (("base", BASE_N), ("10x", BASE_N * 10)):
        rng = random.Random(11)
        tmp = tempfile.mkdtemp(prefix=f"maintain_{label}_")
        reg = VechordRegistry("mt", tmp, spark)
        reg.register(
            TableSpec(
                "t",
                [Column("uid", "long", primary_key=True), Column("v", Vector(DIM))],
            )
        )
        # clustered corpus: 8 gaussian-ish blobs
        centers = [[rng.uniform(-4, 4) for _ in range(DIM)] for _ in range(8)]
        reg.insert_rows(
            "t",
            [
                r
                for i in range(n)
                for r in _rows(rng, [i], centers[i % 8])
            ],
        )
        reg.build_vector_index("t", lists=max(8, int(n**0.5) // 2))

        # SAME absolute damage at both sizes:
        # (a) drift append into a brand-new region (coverage + skew)
        far = [9.0] * DIM
        for lo in range(0, DAMAGE, DAMAGE // 4):  # 4 small appends -> frag
            reg.insert_rows(
                "t", _rows(rng, range(n + lo, n + lo + DAMAGE // 4), far)
            )
        # (b) delete sweep (ghost rows in the clustered copy)
        reg.remove_by("t", {"uid": AnyOf(list(range(0, DAMAGE)))})

        t0 = time.perf_counter()
        rep = reg.maintain("t")
        heal = time.perf_counter() - t0
        t0 = time.perf_counter()
        rep2 = reg.maintain("t")
        noop = time.perf_counter() - t0
        assert rep2["actions"] == [], rep2["actions"]
        results[label] = {
            "n": n,
            "damage": DAMAGE,
            "heal_s": round(heal, 3),
            "noop_s": round(noop, 3),
            "heal_actions": [a["op"] for a in rep["actions"]],
        }
        print(
            f"# {label} (n={n}): heal {heal:.3f}s "
            f"({[a['op'] for a in rep['actions']]}), no-op {noop:.3f}s",
            file=sys.stderr,
        )

    out = {
        "base_n": BASE_N,
        "damage": DAMAGE,
        "loadavg": load0,
        "results": results,
        "heal_ratio_10x_over_base": round(
            results["10x"]["heal_s"] / max(results["base"]["heal_s"], 1e-9), 2
        ),
        "noop_ratio_10x_over_base": round(
            results["10x"]["noop_s"] / max(results["base"]["noop_s"], 1e-9), 2
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
