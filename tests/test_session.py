"""Unit tests for session-level configuration helpers (no Spark)."""

from __future__ import annotations

import os

import pytest

from vechord_spark.session import _default_local_dir


@pytest.fixture
def clean_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    monkeypatch.delenv("SPARK_LOCAL_DIRS", raising=False)


def test_explicit_override_wins(clean_env, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "/nvme/scratch")
    assert _default_local_dir("local[32]") == "/nvme/scratch"
    # even for cluster masters: explicit means explicit
    assert _default_local_dir("yarn") == "/nvme/scratch"


def test_spark_local_dirs_is_never_fought(clean_env, monkeypatch):
    monkeypatch.setenv("SPARK_LOCAL_DIRS", "/disk1,/disk2")
    assert _default_local_dir("local[32]") is None


def test_cluster_master_untouched(clean_env):
    assert _default_local_dir("yarn") is None
    assert _default_local_dir("spark://host:7077") is None
    assert _default_local_dir("k8s://https://host") is None


def test_local_mode_prefers_shm_when_writable(clean_env):
    expected = (
        os.path.join(
            "/dev/shm", f"spark-local-{getattr(os, 'getuid', lambda: 'nt')()}"
        )
        if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)
        else None
    )
    assert _default_local_dir("local[4]") == expected
    assert _default_local_dir("local[*]") == expected
