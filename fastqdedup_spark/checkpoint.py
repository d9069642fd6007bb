"""Stage checkpointing + metrics lineage (SURVEY.md M8).

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". Every pipeline stage can be materialized to
`<checkpoint_dir>/<config_hash>/<stage>` as parquet with Spark's
`_SUCCESS` marker as the completion sentinel; a rerun with the same
config hash reads the stage back instead of recomputing (idempotent
resume — kill at stage k, rerun, byte-identical outputs). A production
deployment would target Iceberg tables; the Iceberg runtime jars are
not in this image, so the same keyed-stage contract is implemented on
parquet (swap `_write`/`_read` to `writeTo(...)` when the catalog
exists).

Metrics: each stage appends rows (stage, metric, value) — the analog of
the reference's trie stats / per-stage timing
(/root/reference/src/fastqdedup/__init__.py:133-157, 410-412).
"""

from __future__ import annotations

import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from fastqdedup_spark.config import DedupConfig


class MetricsCollector:
    def __init__(self) -> None:
        self.rows: list[tuple[str, str, float]] = []
        self._lazy: list[tuple[str, str, Callable[[], float | None]]] = []

    def add(self, stage: str, metric: str, value: float) -> None:
        self.rows.append((stage, metric, float(value)))

    def add_lazy(
        self, stage: str, metric: str, resolve: Callable[[], float | None]
    ) -> None:
        """Metric whose value rides a NOT-YET-RUN job (Dataset.observe):
        `resolve` is called when the metrics are read and must return
        None (skip, job never ran) or the value — it must NOT block.
        This is how per-stage counters cost zero extra Spark jobs."""
        self._lazy.append((stage, metric, resolve))

    def add_row(self, stage: str, row: dict) -> None:
        for k, v in row.items():
            if v is not None:
                self.add(stage, k, v)

    def _resolved(self) -> list[tuple[str, str, float]]:
        out = list(self.rows)
        for stage, metric, fn in self._lazy:
            try:
                v = fn()
            except Exception:
                v = None
            if v is not None:
                out.append((stage, metric, float(v)))
        return out

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            self._resolved(), "stage string, metric string, value double"
        )

    def as_dict(self) -> dict:
        return {f"{s}.{m}": v for s, m, v in self._resolved()}


class StageCheckpointer:
    """Keys every materialized stage by (config_hash, stage_name)."""

    def __init__(self, spark: SparkSession, cfg: DedupConfig) -> None:
        self.spark = spark
        self.cfg = cfg
        self.base = (
            os.path.join(cfg.checkpoint_dir, cfg.config_hash())
            if cfg.checkpoint_dir
            else ""
        )
        self.metrics = MetricsCollector()
        self._persisted: dict[str, list[tuple[str, float]]] | None = None

    def _path(self, stage: str) -> str:
        return os.path.join(self.base, stage)

    def _persisted_stage_metrics(self, stage: str) -> list[tuple[str, float]]:
        """Metrics persisted by a PREVIOUS run's write_metrics. Observed
        counters (Dataset.observe + add_lazy) never fire on a resumed
        stage — the observed plan is replaced by a parquet scan — so
        without this reload the CLI's fallback-cluster warning would be
        silently absent on resumed runs. Loaded once per checkpointer;
        absent/partial _metrics (run killed before write_metrics) just
        yields nothing."""
        if self._persisted is None:
            self._persisted = {}
            mpath = os.path.join(self.base, "_metrics")
            if self.base and os.path.exists(os.path.join(mpath, "_SUCCESS")):
                try:
                    for r in self.spark.read.parquet(mpath).collect():
                        self._persisted.setdefault(r["stage"], []).append(
                            (r["metric"], r["value"])
                        )
                except Exception:
                    pass
        return self._persisted.get(stage, [])

    def has(self, stage: str) -> bool:
        return bool(self.base) and os.path.exists(
            os.path.join(self._path(stage), "_SUCCESS")
        )

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        fuse: bool = False,
        reload_metrics: tuple[str, ...] = (),
    ) -> DataFrame:
        """Build-or-load. Materialized by default: parquet when a
        checkpoint dir is configured (durable resume), eager
        localCheckpoint otherwise (plan truncation + reuse — without
        this, every downstream action recomputes the whole upstream
        DAG). `fuse=True` marks a stage consumed by exactly ONE
        downstream stage: with no durable dir it stays lazy and fuses
        into its consumer (one fewer pipeline barrier); with a durable
        dir it still persists for resume."""
        t0 = time.monotonic()
        if self.has(name):
            df = self.spark.read.parquet(self._path(name))
            self.metrics.add(name, "resumed", 1)
            # `reload_metrics` names metric-stages whose counters were
            # observed while BUILDING this stage (e.g. "dissect" rides
            # the "survivors" build) — they never fire on resume.
            for mstage in (name, *reload_metrics):
                for metric, value in self._persisted_stage_metrics(mstage):
                    if metric not in ("seconds", "resumed"):
                        self.metrics.add(mstage, metric, value)
            return df
        df = build()
        if self.base:
            df.write.mode("overwrite").parquet(self._path(name))
            df = self.spark.read.parquet(self._path(name))
        elif not fuse:
            df = df.localCheckpoint(eager=True)
        self.metrics.add(name, "seconds", time.monotonic() - t0)
        return df

    def write_metrics(self) -> None:
        if self.base:
            self.metrics.to_df(self.spark).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.base, "_metrics")
            )
