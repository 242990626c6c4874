"""Pipeline runtime: staged writes + atomic publish.

Reference semantics (vechord/registry.py:28-62 ``VechordPipeline.run``):
all steps share ONE Postgres transaction; intermediate rows are visible
only inside the transaction (``WHERE xmin = pg_current_xact_id()``,
vechord/client.py:221-222); any failure rolls back every step
(tests/test_table.py:261-298).

Spark has no MVCC, and doesn't need it: a stage's output DataFrame *is*
"only this run's rows" — lineage replaces the xmin trick (SURVEY §3.2).
What remains is atomic multi-table publish:

1. Each stage is a pure ``DataFrame -> DataFrame`` function.
2. Stage outputs destined for tables are written to a staging dir
   ``{table}/.staging/{run_id}`` (real files, so downstream stages can
   re-read if they want, and nothing is recomputed twice).
3. ``commit`` moves every staged directory's files into the live table
   path; failure anywhere discards all staging. Parquet-level
   rename-publish — Delta's multi-table txn is the drop-in upgrade.

The ``inject``-style stage wrapper (reference vechord/registry.py:353-442)
maps a Python row function over an input table via mapInPandas.
"""

from __future__ import annotations

import shutil
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from vechord_spark.registry import VechordRegistry


@dataclass
class PipelineRun:
    """One transactional pipeline execution."""

    registry: VechordRegistry
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex)
    _staged: list[tuple[str, Path]] = field(default_factory=list)

    def staging_path(self, table: str) -> Path:
        return (
            Path(self.registry.table_path(table)).parent
            / ".staging"
            / self.run_id
            / table
        )

    def stage(self, table: str, df: DataFrame) -> DataFrame:
        """Write a stage output for ``table`` into this run's staging
        area and return a DataFrame reading it back (so downstream
        stages reuse materialized files instead of recomputing the
        upstream plan)."""
        spec = self.registry.tables[table]
        aligned = df.select(*spec.field_names)
        path = self.staging_path(table)
        aligned.write.mode("overwrite").parquet(str(path))
        self._staged.append((table, path))
        return self.registry.spark.read.schema(spec.struct_type()).parquet(str(path))

    def _manifest_path(self) -> Path:
        return Path(self.registry.base_path) / ".staging" / self.run_id / "COMMIT.json"

    def commit(self) -> None:
        """Publish every staged output into its live table directory.

        File-move publish: parquet part files are renamed (same
        filesystem) with run-id-unique names, so a reader never sees a
        half-written file. On any error, abort() removes both staged
        and already-moved files of this run (files are identifiable by
        the run_id prefix) — all-or-nothing like the reference's
        transaction rollback (tests/test_table.py:261-298).

        Crash safety: the full target list is journaled to COMMIT.json
        BEFORE any file moves and deleted only after the last move, so
        a process death mid-publish leaves a manifest naming exactly
        the files that may be half-published;
        ``recover_incomplete_runs`` rolls such runs back to the pre-run
        state. A manifest-free crash state needs no recovery.
        """
        import json

        plan: list[tuple[str, Path, Path]] = []
        for table, path in self._staged:
            live = Path(self.registry.table_path(table))
            for i, part in enumerate(sorted(path.glob("part-*"))):
                target = live / f"part-{self.run_id}-{i}{''.join(part.suffixes)}"
                plan.append((table, part, target))
        manifest = self._manifest_path()
        manifest.parent.mkdir(parents=True, exist_ok=True)
        manifest.write_text(
            json.dumps(
                {"run_id": self.run_id, "targets": [str(t) for _, _, t in plan]}
            )
        )
        moved: list[Path] = []
        try:
            for table, part, target in plan:
                target.parent.mkdir(parents=True, exist_ok=True)
                shutil.move(str(part), str(target))
                moved.append(target)
        except Exception:
            for m in moved:
                m.unlink(missing_ok=True)
            self.abort()
            raise
        manifest.unlink(missing_ok=True)
        self._cleanup()

    def abort(self) -> None:
        """Discard all staged output (rollback)."""
        for table, _ in self._staged:
            live = Path(self.registry.table_path(table))
            if live.exists():
                for leaked in live.glob(f"part-{self.run_id}-*"):
                    leaked.unlink(missing_ok=True)
        self._cleanup()

    def _cleanup(self) -> None:
        root = Path(self.registry.base_path) / ".staging" / self.run_id
        if root.exists():
            shutil.rmtree(root)
        self._staged.clear()


def recover_incomplete_runs(registry: VechordRegistry) -> list[str]:
    """Roll back pipeline runs that died mid-publish.

    Scans staging for leftover COMMIT.json manifests (a completed
    commit deletes its manifest as the last step); for each, removes
    any target part files the dead run managed to publish and sweeps
    its staging dir — tables return to their pre-run state, matching
    abort() semantics. Returns the recovered run ids.
    """
    import json

    recovered: list[str] = []
    staging_root = Path(registry.base_path) / ".staging"
    for manifest in sorted(staging_root.glob("*/COMMIT.json")):
        try:
            info = json.loads(manifest.read_text())
        except (OSError, ValueError):
            continue
        for target in info.get("targets", []):
            Path(target).unlink(missing_ok=True)
        shutil.rmtree(manifest.parent, ignore_errors=True)
        recovered.append(info.get("run_id", manifest.parent.name))
    return recovered


class VechordPipeline:
    """Composable multi-stage pipeline with all-or-nothing publish.

    Stages are ``fn(run: PipelineRun, upstream: DataFrame|None) ->
    DataFrame | None``; a stage persists its output to a table by
    calling ``run.stage(table, df)`` and returns what the next stage
    should see. Mirrors the reference's create_pipeline([...]).run()
    (vechord/registry.py:28-62) without the MVCC machinery.
    """

    def __init__(self, registry: VechordRegistry, stages: Sequence[Callable]) -> None:
        self.registry = registry
        self.stages = list(stages)

    def run(self, upstream: DataFrame | None = None) -> PipelineRun:
        run = PipelineRun(self.registry)
        try:
            for stage_fn in self.stages:
                upstream = stage_fn(run, upstream)
        except Exception:
            run.abort()
            raise
        run.commit()
        return run


def inject_stage(
    fn: Callable[[dict], list[dict]],
    output_schema: T.StructType,
    input_fields: Sequence[str] | None = None,
):
    """Reference ``@vr.inject`` equivalent (vechord/registry.py:353-442):
    wrap a per-row Python function (row dict -> list of output row
    dicts) as a DataFrame -> DataFrame transform via mapInPandas.

    The reference calls fn per row inside one process; here rows are
    Arrow batches across executors, and one input row may fan out to
    many output rows (the chunker pattern).
    """
    import pandas as pd

    cols = [f.name for f in output_schema.fields]

    def transform(df: DataFrame) -> DataFrame:
        src = df.select(*input_fields) if input_fields else df

        def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out_rows: list[dict] = []
                for row in pdf.to_dict("records"):
                    out_rows.extend(fn(row))
                yield pd.DataFrame(out_rows, columns=cols)

        return src.mapInPandas(_apply, output_schema)

    return transform
