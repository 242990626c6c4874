"""Registry-level RaBitQ layouts: the reference's vchordrq
quantization (vechord/spec.py:437-444) as a persisted, MAINTAINABLE
layout — `build_vector_index(rabitq=True)` or a declared
`VectorIndex(rabitq=True)`.

Like residual PQ (test_residual_registry.py), RaBitQ codes pin their
base to the owning centroid, so the same re-encode-on-move contract
applies across the lifecycle; UNLIKE PQ there is no codebook, so
extend can never stale trained state. The load-bearing invariant: the
persisted ``__rq_code``/``__rq_norm``/``__rq_dot`` columns always
equal a fresh re-encode of each row against the CURRENT centroids.
"""

import random

import numpy as np
import pytest

from vechord_spark.errors import SchemaError
from vechord_spark.registry import VechordRegistry
from vechord_spark.spec import AnyOf, Column, TableSpec, Vector

DIM = 8


def _registry(spark, tmp_path, ns):
    r = VechordRegistry(ns, str(tmp_path), spark)
    r.register(
        TableSpec(
            "t",
            [Column("uid", "long", primary_key=True), Column("v", Vector(DIM))],
        )
    )
    return r


def _blob_rows(rng, ids, center, spread=0.4):
    return [
        {"uid": i, "v": [c + rng.uniform(-spread, spread) for c in center]}
        for i in ids
    ]


def _assert_codes_fresh(reg, name="t"):
    """No-stale-codes: stored (__rq_code, __rq_norm, __rq_dot) ==
    re-encode of the stored vector against the CURRENT centroid of
    its CURRENT cell, under the persisted rotation."""
    from vechord_spark.operators.rabitq import encode_rabitq

    ipath = reg._index_path(name)
    rot = reg._load_rabitq_rotation(ipath)
    assert rot is not None
    sph = bool(reg._vector_index_meta(ipath).get("spherical"))
    cents = np.array(
        [
            r.vec
            for r in reg.spark.read.parquet(str(ipath / "centroids"))
            .orderBy("centroid_id")
            .collect()
        ]
    )
    data = reg.spark.read.parquet(str(ipath / "data"))
    expect = encode_rabitq(
        data.drop("__rq_code", "__rq_norm", "__rq_dot"), "v", cents, rot,
        normalize=sph,
    ).select("uid", "centroid_id", "__rq_code", "__rq_norm", "__rq_dot")
    got = data.select("uid", "centroid_id", "__rq_code", "__rq_norm", "__rq_dot")

    def key(rows):
        return {
            (r["uid"], r["centroid_id"]): (
                bytes(r["__rq_code"]),
                round(r["__rq_norm"], 9),
                round(r["__rq_dot"], 9),
            )
            for r in rows
        }

    g, e = key(got.collect()), key(expect.collect())
    assert g == e, "stale rabitq codes found"
    return len(g)


def test_rabitq_build_validations(spark, tmp_path):
    r = _registry(spark, tmp_path, "rqv")
    rng = random.Random(1)
    r.insert_rows("t", _blob_rows(rng, range(16), [0.0] * DIM))
    with pytest.raises(SchemaError, match="excludes"):
        r.build_vector_index("t", lists=2, rabitq=True, pq_m=4)
    with pytest.raises(SchemaError, match="excludes"):
        r.build_vector_index("t", lists=2, rabitq=True, residual=True, pq_m=4)
    with pytest.raises(SchemaError, match="excludes"):
        r.build_vector_index("t", lists=2, rabitq=True, pq_m=4, opq=True)


def test_spherical_rabitq_layout(spark, tmp_path):
    """rabitq composes with spherical (the reference's
    spherical_centroids + residual_quantization pair): rows normalize
    before encoding, cos search under full refine equals brute force,
    and extend keeps codes fresh in the normalized geometry."""
    rng = random.Random(13)
    r = _registry(spark, tmp_path, "rqsph")
    # direction clusters with WILD magnitude spread — the shape raw-L2
    # cells split by magnitude and cosine search cannot see
    dirs = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(3)]
    rows = []
    for b, d in enumerate(dirs):
        nrm = np.linalg.norm(d)
        for i in range(b * 50, b * 50 + 50):
            scale = rng.uniform(0.1, 50.0) / nrm
            rows.append(
                {
                    "uid": i,
                    "v": [
                        x * scale + rng.uniform(-0.02, 0.02) for x in d
                    ],
                }
            )
    r.insert_rows("t", rows)
    r.build_vector_index("t", lists=3, rabitq=True, spherical=True)
    st = r.index_stats("t")["ivf"]
    assert st["rabitq"] and st["spherical"]
    _assert_codes_fresh(r)

    q = [x * 2.0 for x in dirs[1]]
    got = [
        (x.uid, round(x.distance, 6))
        for x in r.search_by_vector(
            "t", q, topk=5, probes=3, refine=10_000, distance="cos"
        ).collect()
    ]
    exact = [
        (x.uid, round(x.distance, 6))
        for x in r.search_by_vector("t", q, topk=5, distance="cos").collect()
    ]
    assert got == exact
    # and at a bounded budget the spherical cells keep recall: the
    # top-5 all come from the queried direction cluster
    tight = [
        x.uid
        for x in r.search_by_vector(
            "t", q, topk=5, probes=1, refine=20, distance="cos"
        ).collect()
    ]
    assert set(tight) <= set(range(50, 100))

    r.insert_rows(
        "t",
        [
            {"uid": 500 + i, "v": [x * rng.uniform(5, 9) for x in dirs[0]]}
            for i in range(20)
        ],
    )
    assert r.extend_vector_index("t") == 20
    _assert_codes_fresh(r)


def test_rabitq_layout_searches_exactly_under_full_refine(spark, tmp_path):
    """refine >= corpus makes the two-phase search exhaustive — must
    equal brute force; stats carry the rabitq flag; conditions
    pre-filter the quantized path (same contract as PQ)."""
    rng = random.Random(3)
    r = _registry(spark, tmp_path, "rqq")
    centers = [[rng.uniform(-3, 3) for _ in range(DIM)] for _ in range(4)]
    for b, c in enumerate(centers):
        r.insert_rows("t", _blob_rows(rng, range(b * 50, b * 50 + 50), c))
    r.build_vector_index("t", lists=4, rabitq=True)
    st = r.index_stats("t")["ivf"]
    assert st["rabitq"] and not st["pq"] and not st["residual"]
    _assert_codes_fresh(r)

    q = [c + 0.05 for c in centers[1]]
    approx = [
        (x.uid, round(x.distance, 6))
        for x in r.search_by_vector(
            "t", q, topk=5, probes=4, refine=10_000
        ).collect()
    ]
    exact = [
        (x.uid, round(x.distance, 6))
        for x in r.search_by_vector("t", q, topk=5).collect()
    ]
    assert approx == exact
    # pre-filter semantics on the bit path: exactly k true matches,
    # equal to filtered brute force under full probes + refine
    even = AnyOf([i for i in range(200) if i % 2 == 0])
    got = [
        x.uid
        for x in r.search_by_vector(
            "t", q, topk=5, probes=4, refine=10_000,
            conditions={"uid": even},
        ).collect()
    ]
    want = [
        x.uid
        for x in r.search_by_vector("t", q, topk=200).collect()
        if x.uid % 2 == 0
    ][:5]
    assert got == want
    # ...but an ALTER-added column still refuses on the quantized path
    # (the layout copy may predate the ALTER or a backfill) — same
    # contract as the plain index path
    r.alter_table_add_column("t", "lang", "string", insert_default="en")
    with pytest.raises(SchemaError, match="ALTER-added"):
        r.search_by_vector(
            "t", q, topk=5, probes=4, conditions={"lang": "en"}
        )


def test_rabitq_batch_matches_singles(spark, tmp_path):
    rng = random.Random(9)
    r = _registry(spark, tmp_path, "rqb")
    centers = [[rng.uniform(-3, 3) for _ in range(DIM)] for _ in range(3)]
    for b, c in enumerate(centers):
        r.insert_rows("t", _blob_rows(rng, range(b * 40, b * 40 + 40), c))
    r.build_vector_index("t", lists=3, rabitq=True)
    queries = [[c + 0.02 for c in ctr] for ctr in centers]
    batch = r.search_by_vector_batch(
        "t", queries, topk=4, probes=2, refine=50
    ).collect()
    by_q = {}
    for row in batch:
        by_q.setdefault(row["query_id"], []).append(row["uid"])
    for qi, q in enumerate(queries):
        single = [
            x.uid
            for x in r.search_by_vector(
                "t", q, topk=4, probes=2, refine=50
            ).collect()
        ]
        assert by_q[qi] == single, f"query {qi}"


def test_rabitq_codes_stay_fresh_across_lifecycle(spark, tmp_path):
    """build -> extend (drift) -> recluster -> delete -> prune ->
    merge -> compact_index: stored codes re-derive exactly from the
    current centroids after every step, and the surviving merge
    centroid never moves."""
    rng = random.Random(7)
    r = _registry(spark, tmp_path, "rqlc")
    centers = [[rng.uniform(-3, 3) for _ in range(DIM)] for _ in range(4)]
    for b, c in enumerate(centers):
        r.insert_rows("t", _blob_rows(rng, range(b * 40, b * 40 + 40), c))
    r.build_vector_index("t", lists=4, rabitq=True)
    assert _assert_codes_fresh(r) == 160

    far = [6.0] * DIM
    r.insert_rows("t", _blob_rows(rng, range(1000, 1080), far, spread=0.2))
    assert r.extend_vector_index("t") == 80
    _assert_codes_fresh(r)

    rep = r.recluster_vector_index("t", max_cell_factor=1.5)
    assert rep["split_cells"] >= 1 and rep["moved_rows"] > 0
    _assert_codes_fresh(r)

    r.remove_by("t", {"uid": AnyOf([i for i in range(0, 40) if i % 40 > 2])})
    assert r.prune_vector_index("t")["pruned_rows"] > 0
    _assert_codes_fresh(r)
    ipath = r._index_path("t")
    cents_before = [
        list(r2.vec)
        for r2 in r.spark.read.parquet(str(ipath / "centroids")).collect()
    ]
    fold = r.merge_vector_index("t", min_cell_factor=2.0)
    assert fold["merged_cells"] >= 1
    _assert_codes_fresh(r)
    cents_after = [
        list(r2.vec)
        for r2 in r.spark.read.parquet(str(ipath / "centroids")).collect()
    ]
    for v in cents_after:
        assert any(np.allclose(v, b) for b in cents_before)

    r.compact_index("t")
    _assert_codes_fresh(r)

    q = [c + 0.01 for c in far]
    hits = [
        x.uid
        for x in r.search_by_vector(
            "t", q, topk=5, probes=8, refine=10_000
        ).collect()
    ]
    assert set(hits) <= set(range(1000, 1080))
    exact = [x.uid for x in r.search_by_vector("t", q, topk=5).collect()]
    assert hits == exact


def test_maintain_composes_on_rabitq_layout(spark, tmp_path):
    rng = random.Random(11)
    r = _registry(spark, tmp_path, "rqmt")
    centers = [[rng.uniform(-3, 3) for _ in range(DIM)] for _ in range(4)]
    for b, c in enumerate(centers):
        r.insert_rows("t", _blob_rows(rng, range(b * 40, b * 40 + 40), c))
    r.build_vector_index("t", lists=4, rabitq=True)
    r.insert_rows("t", _blob_rows(rng, range(1000, 1100), [6.0] * DIM, 0.2))
    r.remove_by("t", {"uid": AnyOf(list(range(0, 35)))})
    rep = r.maintain("t")
    ops = [a["op"] for a in rep["actions"]]
    assert "extend" in ops and "prune" in ops
    _assert_codes_fresh(r)
    assert r.maintain("t")["actions"] == []


def test_probe_filter_is_partition_pruning_on_quantized_layouts(spark, tmp_path):
    """The 100 TB claims behind the clustered quantized layout, read
    from the actual plans (RaBitQ and PQ alike):

    - phase 1 (estimate_topk) scans ONLY key+codes of the PROBED
      partitions — PartitionFilters on centroid_id, and the float
      column absent from ReadSchema (the D/8-vs-4·D bandwidth cut);
    - phase 2 (the frame search_by_vector returns) re-reads floats
      under BOTH the partition filter and a pushed pk IN filter, so
      only the refine survivors' row groups are touched."""
    rng = random.Random(23)
    for kind, opts in (("rq", {"rabitq": True}), ("pq", {"pq_m": 4})):
        r = VechordRegistry(f"prune{kind}", str(tmp_path), spark)
        r.register(
            TableSpec(
                "t",
                [
                    Column("uid", "long", primary_key=True),
                    Column("v", Vector(DIM)),
                ],
            )
        )
        centers = [[rng.uniform(-3, 3) for _ in range(DIM)] for _ in range(4)]
        for b, c in enumerate(centers):
            r.insert_rows("t", _blob_rows(rng, range(b * 30, b * 30 + 30), c))
        r.build_vector_index("t", lists=4, **opts)

        est = r._load_vector_index("t").estimate_topk(
            centers[0], "uid", probes=1, refine=20
        )
        p1 = est._jdf.queryExecution().executedPlan().toString()
        scan1 = p1[p1.index("FileScan") :]
        assert "PartitionFilters" in scan1 and "centroid_id" in scan1.split(
            "PartitionFilters"
        )[1][:200], f"{kind}: phase-1 probe missed PartitionFilters"
        assert "v:array" not in scan1.split("ReadSchema")[1][:300], (
            f"{kind}: phase-1 estimate scan reads the float column"
        )

        out = r.search_by_vector("t", centers[0], topk=3, probes=1, refine=20)
        p2 = out._jdf.queryExecution().executedPlan().toString()
        tail2 = p2.split("PartitionFilters")[1][:200]
        assert "centroid_id" in tail2, (
            f"{kind}: phase-2 lost the partition filter"
        )
        assert "In(uid" in p2.split("PushedFilters")[1][:400], (
            f"{kind}: phase-2 pk filter not pushed to the scan"
        )


def test_stream_ingest_keeps_rabitq_codes_fresh(spark, tmp_path):
    """stream_to_registry(maintain_every=1) into a RaBitQ-indexed
    table: each micro-batch's extend bit-encodes the delta, so after
    the stream drains the ledger is current, codes re-derive exactly,
    and probe search serves the streamed rows."""
    import random

    from vechord_spark.streaming.ingest import stream_to_registry

    rng = random.Random(17)
    r = VechordRegistry("rqstream", str(tmp_path / "store"), spark)
    r.register(
        TableSpec(
            "t",
            [Column("uid", "long", primary_key=True), Column("v", Vector(DIM))],
        )
    )
    r.insert_rows(
        "t",
        [
            {"uid": i, "v": [rng.uniform(-1, 1) for _ in range(DIM)]}
            for i in range(40)
        ],
    )
    r.build_vector_index("t", lists=4, rabitq=True)

    src = str(tmp_path / "src")
    for b, lo in enumerate(range(100, 140, 20)):
        spark.createDataFrame(
            [(i, [5.0] * DIM) for i in range(lo, lo + 20)],
            "uid long, v array<float>",
        ).write.parquet(f"{src}/b{b}")
    stream = (
        spark.readStream.schema("uid long, v array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = stream_to_registry(
        stream, r, "t", str(tmp_path / "ckpt"), maintain_every=1
    )
    q.processAllAvailable()
    q.stop()

    st = r.index_stats("t")["ivf"]
    assert st["files_behind"] == 0 and st["ledger_fresh"] and st["rabitq"]
    _assert_codes_fresh(r)
    hits = {
        x.uid
        for x in r.search_by_vector(
            "t", [5.0] * DIM, topk=10, probes=4, refine=100
        ).collect()
    }
    assert hits <= set(range(100, 140)) and len(hits) == 10


def test_declared_rabitq_index_drives_build(spark, tmp_path):
    """VectorIndex(rabitq=True) in the declared schema: a bare
    build_vector_index(name) builds the bit layout, and the spec
    validation rejects mixing quantization families."""
    from vechord_spark.spec import VectorIndex

    with pytest.raises(SchemaError, match="own quantization"):
        VectorIndex(rabitq=True, pq_m=4)
    with pytest.raises(SchemaError, match="own quantization"):
        VectorIndex(rabitq=True, pq_m=4, opq=True)

    rng = random.Random(5)
    r = VechordRegistry("rqdecl", str(tmp_path), spark)
    r.register(
        TableSpec(
            "t",
            [
                Column("uid", "long", primary_key=True),
                Column(
                    "v",
                    Vector(DIM),
                    index=VectorIndex(distance="l2", lists=4, rabitq=True),
                ),
            ],
        )
    )
    centers = [[rng.uniform(-3, 3) for _ in range(DIM)] for _ in range(4)]
    for b, c in enumerate(centers):
        r.insert_rows("t", _blob_rows(rng, range(b * 30, b * 30 + 30), c))
    r.build_vector_index("t")  # no args: the declaration decides
    st = r.index_stats("t")["ivf"]
    assert st["rabitq"] and not st["pq"] and st["lists"] == 4
    _assert_codes_fresh(r)
