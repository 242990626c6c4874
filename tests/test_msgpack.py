"""msgpack_lite codec: spec-pinned bytes, roundtrip property, and the
service's content negotiation (reference service.py:132-138 speaks
JSON + msgpack via falcon media handlers)."""

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vechord_spark.msgpack_lite import packb, unpackb

# ---------------------------------------------------------------- codec

# Byte-exact pins from the public MessagePack spec examples.
SPEC_CASES = [
    (None, b"\xc0"),
    (False, b"\xc2"),
    (True, b"\xc3"),
    (0, b"\x00"),
    (127, b"\x7f"),
    (-1, b"\xff"),
    (-32, b"\xe0"),
    (128, b"\xcc\x80"),
    (256, b"\xcd\x01\x00"),
    (65536, b"\xce\x00\x01\x00\x00"),
    (-33, b"\xd0\xdf"),
    (-129, b"\xd1\xff\x7f"),
    (1.5, b"\xcb\x3f\xf8\x00\x00\x00\x00\x00\x00"),
    ("", b"\xa0"),
    ("abc", b"\xa3abc"),
    ("a" * 32, b"\xd9\x20" + b"a" * 32),
    (b"\x01\x02", b"\xc4\x02\x01\x02"),
    ([], b"\x90"),
    ([1, "a"], b"\x92\x01\xa1a"),
    ({}, b"\x80"),
    ({"k": 7}, b"\x81\xa1k\x07"),
]


@pytest.mark.parametrize("obj,encoded", SPEC_CASES)
def test_spec_bytes(obj, encoded):
    assert packb(obj) == encoded
    assert unpackb(encoded) == obj


def test_wide_widths_roundtrip():
    for v in (2**16, 2**32, 2**63 - 1, -(2**15) - 1, -(2**31) - 1, -(2**63)):
        assert unpackb(packb(v)) == v
    big_list = list(range(70000))  # array32
    assert unpackb(packb(big_list)) == big_list
    big_map = {f"k{i}": i for i in range(70000)}  # map32
    assert unpackb(packb(big_map)) == big_map
    long_str = "x" * 70000  # str32
    assert unpackb(packb(long_str)) == long_str


def test_errors():
    with pytest.raises(ValueError):
        unpackb(b"\xa5ab")  # truncated str
    with pytest.raises(ValueError):
        unpackb(packb(1) + b"\x00")  # trailing bytes
    with pytest.raises(ValueError):
        unpackb(b"\xc1")  # never-used type byte
    with pytest.raises(TypeError):
        packb(object())
    with pytest.raises(OverflowError):
        packb(1 << 64)


_JSONISH = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**63), max_value=2**64 - 1)
    | st.floats(allow_nan=False)
    | st.text(max_size=40)
    | st.binary(max_size=40),
    lambda inner: st.lists(inner, max_size=6)
    | st.dictionaries(st.text(max_size=10), inner, max_size=6),
    max_leaves=25,
)


@settings(max_examples=200, deadline=None)
@given(_JSONISH)
def test_roundtrip_property(obj):
    assert unpackb(packb(obj)) == obj


# ----------------------------------------------------- service negotiation


@pytest.fixture()
def svc(spark, tmp_path):
    from vechord_spark.registry import VechordRegistry
    from vechord_spark.service import create_web_app
    from vechord_spark.spec import Column, TableSpec

    reg = VechordRegistry("mp", str(tmp_path), spark)
    reg.register(
        TableSpec(
            "document",
            [
                Column("uid", "long", primary_key=True),
                Column("title", "string"),
                Column("score", "double"),
            ],
        )
    )
    return create_web_app(reg)


MP = {"Content-Type": "application/msgpack", "Accept": "application/msgpack"}


def test_msgpack_insert_and_select_roundtrip(svc):
    row = {"uid": 1, "title": "alpha", "score": 0.5}
    status, ctype, body = svc.handle(
        "POST", "/api/table/document", body=packb(row), headers=MP
    )
    assert (status, ctype) == (201, "application/msgpack")
    assert unpackb(body) == {"inserted": 1}
    # msgpack response mirrors the JSON response value-for-value
    status, ctype, body = svc.handle(
        "GET", "/api/table/document", {"uid": "1"}, headers={"Accept": "application/x-msgpack"}
    )
    assert (status, ctype) == (200, "application/msgpack")
    sj, cj, bj = svc.handle("GET", "/api/table/document", {"uid": "1"})
    assert (sj, cj) == (200, "application/json")
    assert unpackb(body) == json.loads(bj)


def test_json_default_unchanged(svc):
    """No headers, or Accept preferring JSON -> the JSON-only surface."""
    status, ctype, body = svc.handle(
        "POST", "/api/table/document",
        body=json.dumps({"uid": 2, "title": "b", "score": 1.0}).encode(),
    )
    assert (status, ctype) == (201, "application/json")
    for accept in ("application/json", "*/*", "application/json, application/msgpack"):
        _, ctype, _ = svc.handle(
            "GET", "/api/table/document", {"uid": "2"}, headers={"Accept": accept}
        )
        assert ctype == "application/json"


def test_malformed_msgpack_body_is_422(svc):
    status, _, body = svc.handle(
        "POST", "/api/table/document", body=b"\xc1\x00",
        headers={"Content-Type": "application/msgpack"},
    )
    assert status == 422 and b"msgpack" in body.lower()


def test_msgpack_run_search_over_socket(svc):
    """Negotiation over a REAL socket: ingest + search /api/run with
    msgpack request and response bodies, mirroring the JSON live test."""
    import urllib.request

    from vechord_spark.service import serve

    server = serve(svc, host="127.0.0.1", port=0)
    try:
        port = server.server_address[1]

        def post_mp(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/run",
                data=packb(payload),
                method="POST",
                headers=MP,
            )
            with urllib.request.urlopen(req) as resp:
                assert resp.headers["Content-Type"] == "application/msgpack"
                return unpackb(resp.read())

        steps = [
            {"kind": "chunker", "provider": "regex", "args": {"size": 40, "overlap": 10}},
            {"kind": "embedder", "provider": "hash", "args": {"dim": 16}},
        ]
        ack = post_mp(
            {"name": "mp1", "data": "spark engines scale out. ducks swim.",
             "steps": steps + [{"kind": "index", "provider": "local"}]}
        )
        assert ack["type"] == "ingest" and ack["chunk"] >= 1
        res = post_mp(
            {"name": "mp1", "data": "spark engine",
             "steps": steps
             + [{"kind": "search", "provider": "local", "args": {"topk": 3}}]}
        )
        assert res["type"] == "search" and len(res["chunks"]) >= 1
    finally:
        server.shutdown()


def test_truncated_length_prefixes_raise_valueerror():
    """bin8/uint8/str8 cut off right after the type byte must raise
    ValueError (the 422 contract), never IndexError."""
    for payload in (b"\xc4", b"\xcc", b"\xd9"):
        with pytest.raises(ValueError):
            unpackb(payload)


def test_accept_q_zero_excludes_msgpack(svc):
    """RFC 9110: q=0 means 'not acceptable' — a client excluding
    msgpack keeps JSON even when msgpack is listed first."""
    svc.handle(
        "POST", "/api/table/document",
        body=json.dumps({"uid": 9, "title": "q", "score": 0.0}).encode(),
    )
    _, ctype, _ = svc.handle(
        "GET", "/api/table/document", {"uid": "9"},
        headers={"Accept": "application/msgpack;q=0, application/json"},
    )
    assert ctype == "application/json"
    # msgpack at q=0.9 LOSES to json's default q=1.0 (round 10: q-value
    # comparison replaced listing-order precedence, ADVICE r9)
    _, ctype, _ = svc.handle(
        "GET", "/api/table/document", {"uid": "9"},
        headers={"Accept": "application/msgpack;q=0.9, application/json"},
    )
    assert ctype == "application/json"


def test_accept_q_values_not_listing_order(svc):
    """RFC 9110 precedence is the q-value, not listing order: JSON
    listed first at q=0.1 with msgpack at default q=1 must return
    msgpack (ADVICE r9); equal q ties break toward JSON."""
    svc.handle(
        "POST", "/api/table/document",
        body=json.dumps({"uid": 11, "title": "qv", "score": 0.0}).encode(),
    )
    cases = [
        ("application/json;q=0.1, application/msgpack", "application/msgpack"),
        ("application/msgpack;q=0.2, application/json;q=0.9", "application/json"),
        ("application/msgpack;q=0.5, */*;q=0.1", "application/msgpack"),
        # equal q -> JSON tie-break
        ("application/msgpack, application/json", "application/json"),
        ("*/*;q=0.3, application/x-msgpack;q=0.3", "application/json"),
    ]
    for accept, want in cases:
        _, ctype, _ = svc.handle(
            "GET", "/api/table/document", {"uid": "11"},
            headers={"Accept": accept},
        )
        assert ctype == want, (accept, ctype)


def test_deeply_nested_msgpack_body_is_422_not_thread_death(svc):
    """A ~1 KB body of nested fixarray headers must come back as a 422
    (depth-capped ValueError), never a RecursionError escaping the
    transcode boundary (ADVICE r9)."""
    bomb = b"\x91" * 1000 + b"\xc0"
    status, _, body = svc.handle(
        "POST", "/api/table/document", body=bomb,
        headers={"Content-Type": "application/msgpack"},
    )
    assert status == 422 and b"msgpack" in body.lower()


def test_depth_cap_allows_realistic_nesting():
    """Round-trip at depth 100 still works — the cap only exists to
    stay under the interpreter's recursion limit."""
    v = None
    for _ in range(100):
        v = [v]
    assert unpackb(packb(v)) == v
