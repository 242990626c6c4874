"""ArtifactStore: build-once / load-in-any-session layouts with a
source+params ledger (plans/artifacts.py), and the incremental
funnel's seen-side artifacts riding on it (suite._inc_seen)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from vechord_spark.operators.bloom import (
    build_bloom,
    might_contain,
    read_bloom,
    write_bloom,
)
from vechord_spark.plans.artifacts import ArtifactStore, source_ledger

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def store(spark, tmp_path):
    return ArtifactStore(spark, tmp_path)


def _src(tmp_path, content=b"x" * 64):
    d = tmp_path / "src"
    d.mkdir(exist_ok=True)
    (d / "part-0.parquet").write_bytes(content)
    return d


def test_builds_once_then_loads(store, tmp_path):
    src = _src(tmp_path)
    calls = []

    def build(p):
        calls.append(1)
        (p / "payload.txt").write_text("v1")

    p1 = store.load_or_build("art", [src], {"v": 1}, build)
    p2 = store.load_or_build("art", [src], {"v": 1}, build)
    assert p1 == p2
    assert len(calls) == 1
    assert (p1 / "payload.txt").read_text() == "v1"


def test_rebuild_on_source_change(store, tmp_path):
    src = _src(tmp_path)
    calls = []

    def build(p):
        calls.append(1)
        (p / "payload.txt").write_text(f"v{len(calls)}")

    store.load_or_build("art", [src], {"v": 1}, build)
    # same size, different mtime -> must invalidate (a rewritten file)
    f = src / "part-0.parquet"
    st = f.stat()
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    p = store.load_or_build("art", [src], {"v": 1}, build)
    assert len(calls) == 2
    assert (p / "payload.txt").read_text() == "v2"


def test_rebuild_on_params_change(store, tmp_path):
    src = _src(tmp_path)
    calls = []

    def build(p):
        calls.append(1)
        (p / "payload.txt").write_text("x")

    store.load_or_build("art", [src], {"v": 1}, build)
    store.load_or_build("art", [src], {"v": 2}, build)
    assert len(calls) == 2


def test_crashed_build_never_validates(store, tmp_path):
    src = _src(tmp_path)

    def crash(p):
        (p / "half.txt").write_text("partial")
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        store.load_or_build("art", [src], {"v": 1}, crash)
    # no meta.json was published, so the next call builds cleanly
    ok = []
    store.load_or_build("art", [src], {"v": 1}, lambda p: ok.append(1))
    assert ok == [1]
    assert not list(store.root.glob("art.tmp.*"))


def test_source_ledger_skips_markers(tmp_path):
    d = _src(tmp_path)
    (d / "_SUCCESS").write_text("")
    led = source_ledger([d])
    assert len(led) == 1
    (d / "_SUCCESS").touch()
    assert source_ledger([d]) == led  # marker churn is identity-neutral


def test_bloom_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(f"k{i}",) for i in range(200)], "key string")
    bloom = build_bloom(df, "key")
    write_bloom(bloom, tmp_path / "bloom")
    loaded = read_bloom(tmp_path / "bloom")
    assert (loaded.m, loaded.k, loaded.n_build) == (bloom.m, bloom.k, bloom.n_build)
    # no false negatives through the serialized copy
    probe = df.withColumn("hit", might_contain(df, "key", loaded))
    assert probe.filter(~F.col("hit")).count() == 0
    loaded.unpersist()
    bloom.unpersist()


def test_inc_seen_second_session_reuses_layout(spark, monkeypatch, tmp_path):
    """The VERDICT round-8 'done' pin: a second session (simulated by
    clearing the in-process memo) must LOAD the day-1 layout, not
    rebuild it — the meta.json ledger stays byte-identical and no
    banding/fingerprint job re-runs (detected via layout mtimes)."""
    import vechord_spark.suite as suite

    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path))
    monkeypatch.setattr(
        "vechord_spark.plans.artifacts.warehouse_root", lambda s: tmp_path
    )
    suite._INC_SEEN_CACHE.clear()
    fps1, bands1, bloom1 = suite._inc_seen(spark, SF_DIR)
    layout = tmp_path / "inc_seen_root_testdata_sf0_001_m3"
    assert layout.is_dir()
    meta1 = (layout / "meta.json").read_text()
    stamps1 = {
        str(p): p.stat().st_mtime_ns for p in sorted(layout.rglob("*")) if p.is_file()
    }
    n_fps1, n_bands1 = fps1.count(), bands1.count()

    # "new session": drop the memo so the disk path is exercised again
    suite._INC_SEEN_CACHE.clear()
    fps2, bands2, bloom2 = suite._inc_seen(spark, SF_DIR)
    stamps2 = {
        str(p): p.stat().st_mtime_ns for p in sorted(layout.rglob("*")) if p.is_file()
    }
    assert stamps2 == stamps1  # nothing rewritten -> loaded, not rebuilt
    assert (layout / "meta.json").read_text() == meta1
    assert (fps2.count(), bands2.count()) == (n_fps1, n_bands1)
    assert (bloom2.m, bloom2.k) == (bloom1.m, bloom1.k)
    # the artifacts match a fresh derivation of the same seen corpus
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    seen = docs.filter(F.col("doc_id") % 3 != 0)
    from vechord_spark.operators import dedup as DD

    fresh_bands = DD.minhash_bands(seen, "doc_id", "text")
    assert bands2.exceptAll(fresh_bands).count() == 0
    assert fresh_bands.exceptAll(bands2).count() == 0
    for df in (fps1, bands1, fps2, bands2):
        df.unpersist()
    suite._INC_SEEN_CACHE.clear()
    bloom1.unpersist()
    bloom2.unpersist()


def test_stale_layout_is_replaced_wholesale(store, tmp_path):
    """A pre-existing final dir (stale prior build, or a winner that
    landed before our exists() check) is swapped out atomically —
    last-writer-wins, never a merge of two layouts."""
    import json as _json

    src = _src(tmp_path)
    ledger = source_ledger([src])

    def build_with_preexisting_final(p):
        (p / "payload.txt").write_text("ours")
        final = store.path("art")
        final.mkdir(parents=True)
        (final / "payload.txt").write_text("theirs")
        (final / "extra.bin").write_text("leftover")
        (final / "meta.json").write_text(
            _json.dumps({"sources": ledger, "params": {"v": 1}})
        )

    out = store.load_or_build("art", [src], {"v": 1}, build_with_preexisting_final)
    assert (out / "payload.txt").read_text() == "ours"
    assert not (out / "extra.bin").exists()  # no layout merging
    assert not list(store.root.glob("art.tmp.*"))
    assert not list(store.root.glob("art.stale.*"))


def test_lost_publish_race_returns_winner(store, tmp_path, monkeypatch):
    """The ENOTEMPTY race, forced deterministically: the winner's
    layout lands between our exists() check and our os.replace. The
    loser must return the winner's valid layout, not crash (the
    documented loser-is-discarded outcome)."""
    import errno
    import json as _json

    src = _src(tmp_path)
    ledger = source_ledger([src])
    winner = store.path("art")
    real_replace = os.replace
    raced = {}

    def racy_replace(a, b):
        if str(b) == str(winner) and "x" not in raced:
            raced["x"] = True
            winner.mkdir(parents=True)
            (winner / "payload.txt").write_text("winner")
            (winner / "meta.json").write_text(
                _json.dumps({"sources": ledger, "params": {"v": 1}})
            )
            raise OSError(errno.ENOTEMPTY, "Directory not empty")
        return real_replace(a, b)

    monkeypatch.setattr(os, "replace", racy_replace)
    out = store.load_or_build(
        "art", [src], {"v": 1}, lambda p: (p / "payload.txt").write_text("loser")
    )
    assert raced == {"x": True}
    assert (out / "payload.txt").read_text() == "winner"
    assert not list(store.root.glob("art.tmp.*"))


def test_orphaned_stale_and_tmp_of_dead_pid_are_swept(store, tmp_path):
    """A builder that crashed between its two publish os.replace calls
    leaves a .stale.{pid} (and possibly .tmp.{pid}) sibling only that
    pid would clean. load_or_build sweeps them once the owner is dead
    (ADVICE r9) — the warehouse never accumulates corpses."""
    src = _src(tmp_path)
    dead = 2**22 + 12345  # beyond pid_max defaults; ensure not alive
    while True:
        try:
            os.kill(dead, 0)
            dead += 1
        except ProcessLookupError:
            break
        except PermissionError:
            dead += 1
    for suffix in (f"art.stale.{dead}", f"art.tmp.{dead}"):
        d = store.root / suffix
        d.mkdir(parents=True)
        (d / "corpse.txt").write_text("x")
    out = store.load_or_build(
        "art", [src], {"v": 1}, lambda p: (p / "payload.txt").write_text("v1")
    )
    assert (out / "payload.txt").read_text() == "v1"
    assert not list(store.root.glob("art.stale.*"))
    assert not list(store.root.glob("art.tmp.*"))


def test_inflight_tmp_of_live_pid_survives_sweep(store, tmp_path):
    """The sweep must never rip a LIVE concurrent builder's tmp dir out
    from under it — only dead pids are cleaned."""
    import subprocess
    import sys

    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)"])
    try:
        live = store.root / f"art.tmp.{child.pid}"
        live.mkdir(parents=True)
        (live / "half-built.txt").write_text("in flight")
        store._sweep_orphans("art")
        assert live.exists()
    finally:
        child.kill()
        child.wait()


def test_two_sessions_same_root_build_once(spark, tmp_path):
    """The cross-session contract (round 10): a second SparkSession
    pointed at the same warehouse root loads the first session's
    layout from disk — zero rebuilds, byte-identical payload."""
    src = _src(tmp_path)
    calls = []

    def build(p):
        calls.append(1)
        (p / "payload.txt").write_text("from-session-1")

    s1 = ArtifactStore(spark, tmp_path / "wh")
    p1 = s1.load_or_build("art", [src], {"v": 1}, build)
    other = spark.newSession()
    s2 = ArtifactStore(other, tmp_path / "wh")
    p2 = s2.load_or_build("art", [src], {"v": 1}, build)
    assert p1 == p2
    assert len(calls) == 1
    assert (p2 / "payload.txt").read_text() == "from-session-1"


def test_two_sessions_interleaved_publish_no_corruption(spark, tmp_path):
    """Two registries / sessions racing on the same artifact name: the
    second session publishes a complete valid layout WHILE the first is
    mid-build. The first's later publish must resolve to exactly one
    winner with a valid ledger — never a merge, never a half-layout,
    no orphan dirs — and a third call from either session loads
    without rebuilding."""
    src = _src(tmp_path)
    s1 = ArtifactStore(spark, tmp_path / "wh")
    s2 = ArtifactStore(spark.newSession(), tmp_path / "wh")

    def build_b(p):
        (p / "payload.txt").write_text("session-2")

    def build_a(p):
        # session 2 wins the race while session 1 is still building
        s2.load_or_build("art", [src], {"v": 1}, build_b)
        (p / "payload.txt").write_text("session-1")

    out = s1.load_or_build("art", [src], {"v": 1}, build_a)
    # one winner, wholesale (either is acceptable; never a merge)
    assert (out / "payload.txt").read_text() in ("session-1", "session-2")
    assert s1.is_valid("art", source_ledger([src]), {"v": 1})
    assert not list(s1.root.glob("art.tmp.*"))
    assert not list(s1.root.glob("art.stale.*"))
    calls = []
    again = s2.load_or_build(
        "art", [src], {"v": 1}, lambda p: calls.append(1)
    )
    assert calls == [] and again == out
