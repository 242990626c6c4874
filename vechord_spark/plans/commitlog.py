"""Optimistic-concurrency commit log for registry tables.

The reference engine gets multi-writer safety for free from PostgreSQL
— MVCC snapshots, sequences, unique indexes (vechord/registry.py binds
tables to Postgres storage; vechord/client.py:240-266 relies on them on
every insert/copy). A parquet lake has none of those, so this module
supplies the coordination layer the way Delta Lake / Iceberg do:

- Each table owns an append-only log directory ``<table>/_log`` of
  numbered manifest entries ``00000000.json``, ``00000001.json``, ...
  Entry N describes the transition from snapshot N-1 to snapshot N as
  file-level actions: ``{"add": [...], "remove": [...]}``.
- The CURRENT table state is the replay of all entries: the set of data
  files still live. Readers list the log, replay it, and scan exactly
  those files — a reader never sees a half-committed write, because
  uncommitted data files are simply not referenced yet.
- A writer commits by materializing its entry to a temp file and
  HARD-LINKING it into the next version slot. ``link(2)`` is atomic and
  fails with ``EEXIST`` if the slot is taken, so exactly one writer
  wins each version; losers re-validate against the delta and retry.
  (Spark's underscore convention hides ``_log`` from directory scans,
  so legacy whole-directory reads of the same table keep working.)

Because a rewrite (DELETE / compaction) is now ONE atomic commit that
adds the survivor files and removes the old ones, there is no publish
window at all — strictly stronger than the rename-based intent journal
in ``VechordRegistry._rewrite`` (kept for single-writer tables).

Old files stay on disk until :meth:`TableLog.vacuum`, which is what
makes ``snapshot(version=...)`` time travel work — again the Delta
semantics: vacuum trades history for space.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable, Sequence

LOG_DIR = "_log"
_ENTRY_WIDTH = 8


class CommitConflict(Exception):
    """Another writer claimed the version this commit targeted."""


@dataclass(frozen=True)
class Snapshot:
    """A consistent view of a table: the data files live at ``version``."""

    version: int
    files: tuple[str, ...]


class TableLog:
    """Append-only manifest log for one table directory."""

    def __init__(self, table_dir: str | Path) -> None:
        self.table_dir = Path(table_dir)
        self.log_dir = self.table_dir / LOG_DIR

    # ---------------------------------------------------------------- state
    def exists(self) -> bool:
        return self.log_dir.is_dir() and any(self._entry_paths())

    def _entry_paths(self) -> list[Path]:
        if not self.log_dir.is_dir():
            return []
        out = []
        for p in self.log_dir.iterdir():
            stem = p.name[: -len(".json")] if p.name.endswith(".json") else ""
            if len(stem) == _ENTRY_WIDTH and stem.isdigit():
                out.append(p)
        return sorted(out)

    def current_version(self) -> int:
        """Latest committed version, or -1 for an empty log."""
        paths = self._entry_paths()
        return int(paths[-1].stem) if paths else -1

    def entries(self) -> list[dict]:
        """All committed entries in version order (for ``history``)."""
        out = []
        for p in self._entry_paths():
            entry = json.loads(p.read_text())
            entry["version"] = int(p.stem)
            out.append(entry)
        return out

    def snapshot(self, version: int | None = None) -> Snapshot:
        """Replay the log up to ``version`` (default: latest).

        Replay is a driver-side set fold over manifest entries — O(log
        length), independent of data size; at 100 TB the log holds a few
        thousand small JSON files while the data spans millions of
        parquet files the reader never has to list.
        """
        live: dict[str, None] = {}  # insertion-ordered set
        latest = -1
        for p in self._entry_paths():
            v = int(p.stem)
            if version is not None and v > version:
                break
            latest = v
            entry = json.loads(p.read_text())
            for f in entry.get("remove", ()):
                live.pop(f, None)
            for f in entry.get("add", ()):
                live[f] = None
        if version is not None and latest < version:
            raise ValueError(
                f"version {version} not committed (latest is {latest})"
            )
        return Snapshot(version=latest, files=tuple(live))

    # --------------------------------------------------------------- commit
    def try_commit(
        self,
        version: int,
        add: Sequence[str] = (),
        remove: Sequence[str] = (),
        op: str = "append",
    ) -> bool:
        """Atomically claim ``version``; False if another writer did.

        The entry is fully written to a temp file first, then hard-linked
        into the version slot, so a concurrent reader either sees no
        entry or a complete one — never a partial JSON.
        """
        if version != self.current_version() + 1:
            return False  # stale without touching the filesystem
        self.log_dir.mkdir(parents=True, exist_ok=True)
        dest = self.log_dir / f"{version:0{_ENTRY_WIDTH}d}.json"
        tmp = self.log_dir / f".tmp-{uuid.uuid4().hex}"
        tmp.write_text(
            json.dumps({"op": op, "add": list(add), "remove": list(remove)})
        )
        try:
            os.link(tmp, dest)
        except FileExistsError:
            return False
        finally:
            tmp.unlink(missing_ok=True)
        return True

    def bootstrap(self, data_files: Iterable[str]) -> Snapshot:
        """Adopt a legacy (directory-listed) table as version 0.

        Racing bootstrappers funnel through the same atomic version-0
        commit; the loser just reads the winner's snapshot.
        """
        if not self.exists():
            self.try_commit(0, add=sorted(data_files), op="bootstrap")
        return self.snapshot()

    # --------------------------------------------------------------- vacuum
    def vacuum(self, older_than_s: float = 0.0) -> list[str]:
        """Delete data files no longer referenced by the CURRENT snapshot.

        Removes rewrite history (time travel to pre-vacuum versions stops
        resolving) and any orphans left by crashed writers. The mtime
        guard keeps files younger than ``older_than_s`` so an in-flight
        writer's staged-but-uncommitted files survive.
        """
        import time

        live = set(self.snapshot().files)
        cutoff = time.time() - older_than_s
        deleted = []
        for p in self.table_dir.iterdir():
            if p.name.startswith(("_", ".")) or not p.is_file():
                continue
            if p.name in live:
                continue
            try:
                if p.stat().st_mtime <= cutoff:
                    p.unlink()
                    deleted.append(p.name)
            except OSError:
                continue  # concurrently vacuumed
        return sorted(deleted)
