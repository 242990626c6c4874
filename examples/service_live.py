"""Drive a LIVE vechord_spark service end-to-end over HTTP.

The Spark rendition of how the reference's examples/beir.py drives a
running service (boot, ingest a corpus through the API, search it):
boot ``serve()`` on a local port, POST each document to ``/api/run``
with a chunk -> hash-embed -> BM25 pipeline, then POST a search and
print the RRF-fused results (vector ∪ keyword legs,
operators/fusion.rrf_topk). Run with:

    python examples/service_live.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vechord_spark.registry import VechordRegistry
from vechord_spark.service import create_web_app, serve
from vechord_spark.session import get_spark
from vechord_spark.spec import Column, TableSpec

DOCS = [
    "spark is a distributed engine for large scale data processing",
    "the zeppelin floats above the harbor in the morning fog",
    "ducks are birds that swim in the park pond every spring",
    "bm25 ranks documents by term frequency and inverse document frequency",
]

STEPS = [
    {"kind": "chunker", "provider": "regex", "args": {"size": 60, "overlap": 10}},
    {"kind": "embedder", "provider": "hash", "args": {"dim": 32}},
    {"kind": "keyword", "provider": "bm25"},
]


def main() -> None:
    spark = get_spark("service-live-example")
    registry = VechordRegistry("svc_live", tempfile.mkdtemp(), spark)
    registry.register(
        TableSpec("document", [Column("uid", "long", primary_key=True)])
    )
    server = serve(create_web_app(registry), host="127.0.0.1", port=0)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"

    def post(path: str, payload: dict) -> dict:
        req = urllib.request.Request(
            base + path,
            data=json.dumps(payload).encode(),
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    try:
        for text in DOCS:
            ack = post(
                "/api/run",
                {"name": "demo", "data": text,
                 "steps": STEPS + [{"kind": "index", "provider": "local"}]},
            )
            print(f"indexed uid={ack['uid']} chunks={ack['chunk']}")
        res = post(
            "/api/run",
            {"name": "demo", "data": "zeppelin above the harbor",
             "steps": STEPS
             + [{"kind": "search", "provider": "local", "args": {"topk": 3}}]},
        )
        print("fused top-k (RRF):")
        for c in res["chunks"]:
            print(f"  rank={c['rank']} rrf_score={c['rrf_score']:.6f} uid={c['uid']}")
    finally:
        server.shutdown()
        spark.stop()


if __name__ == "__main__":
    main()
