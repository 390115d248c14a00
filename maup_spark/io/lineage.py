"""Checkpoint-resumable stage execution with per-partition lineage.

north_rule contract: every stage writes (a) its output as parquet (an
Iceberg table in production — same layout, the sandbox has no Iceberg
runtime) and (b) a ``_metrics`` sidecar with one row per output
partition: (run_id, stage, partition_id, rows, wall_ms, inputs).
Re-running the same pipeline skips stages whose ``_SUCCESS`` marker
exists — resume-from-checkpoint for free, because stage identity is the
(run_dir, stage-name) pair and stage outputs are deterministic.

The reference has no execution engine at all (every maup call is eager
in-memory, /root/reference/maup — no persistence anywhere); this module
is the scale-out replacement for "just keep the GeoDataFrame around".
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageRunner:
    def __init__(self, spark: SparkSession, run_dir: str, run_id: str = "run"):
        self.spark = spark
        self.run_dir = run_dir
        self.run_id = run_id
        os.makedirs(run_dir, exist_ok=True)
        self._manifest_path = os.path.join(run_dir, "_manifest.jsonl")

    def _stage_path(self, name: str) -> str:
        return os.path.join(self.run_dir, name)

    def is_done(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._stage_path(name), "_SUCCESS"))

    def _success_mtime(self, name: str) -> float | None:
        p = os.path.join(self._stage_path(name), "_SUCCESS")
        return os.path.getmtime(p) if os.path.exists(p) else None

    def is_stale(self, name: str, inputs: list[str] | None) -> bool:
        """A completed stage is STALE when any declared input stage's
        checkpoint is newer — re-running an upstream stage cascades
        recomputation through every declared consumer (without this,
        invalidating one mid-pipeline checkpoint leaves downstream
        stages silently serving stale data)."""
        my = self._success_mtime(name)
        if my is None:
            return False
        for dep in inputs or []:
            dep_m = self._success_mtime(dep)
            if dep_m is not None and dep_m > my:
                return True
        return False

    def run_stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        inputs: list[str] | None = None,
    ) -> DataFrame:
        """Materialize ``build()`` at the stage path unless already
        complete AND fresh w.r.t. its declared inputs; always returns
        the stage output as a fresh scan (so downstream stages read the
        checkpoint, not the lineage)."""
        path = self._stage_path(name)
        if self.is_done(name) and not self.is_stale(name, inputs):
            self._log(name, "skipped (checkpoint hit)", 0, inputs)
            return self.spark.read.parquet(path)
        t0 = time.perf_counter()
        df = build()
        df.write.mode("overwrite").parquet(path)
        wall_ms = int((time.perf_counter() - t0) * 1000)

        out = self.spark.read.parquet(path)
        per_part = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("stage", F.lit(name))
            .withColumn("wall_ms", F.lit(wall_ms))
            .withColumn("inputs", F.lit(",".join(inputs or [])))
        )
        per_part.write.mode("overwrite").parquet(
            os.path.join(self.run_dir, "_metrics", name)
        )
        self._log(name, "completed", wall_ms, inputs)
        return out

    def _log(self, stage: str, status: str, wall_ms: int, inputs) -> None:
        with open(self._manifest_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "run_id": self.run_id,
                        "stage": stage,
                        "status": status,
                        "wall_ms": wall_ms,
                        "inputs": inputs or [],
                        "ts": time.time(),
                    }
                )
                + "\n"
            )

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.run_dir, "_metrics", "*"))


def assign_prorate_pipeline(
    spark: SparkSession, sf_dir: str, run_dir: str
) -> DataFrame:
    """The flagship e2e pipeline as checkpointed stages:
    points → assignment → pieces → prorated district totals.
    Killing the job at any stage boundary and re-running resumes from
    the last completed checkpoint."""
    from .. import datagen as D
    from ..operators.assign import assign_points
    from ..operators.intersections import intersections

    runner = StageRunner(spark, run_dir)

    pts = runner.run_stage("points", lambda: D.points(spark, sf_dir))
    assignment = runner.run_stage(
        "assignment",
        lambda: assign_points(
            pts,
            D.districts(spark),
            point_id="entity_id",
            target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
        ),
        inputs=["points"],
    )
    pieces = runner.run_stage(
        "pieces",
        lambda: intersections(
            D.source_rects(spark, sf_dir).select(
                "entity_id", "geometry", "x0", "y0", "x1", "y1"
            ),
            D.districts(spark),
            source_id="entity_id",
            target_id="district_id",
            source_bounds=("x0", "y0", "x1", "y1"),
            target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
        ).drop("geometry"),
        inputs=["points"],
    )
    prorated = runner.run_stage(
        "prorated",
        lambda: (
            pieces.withColumn("weight", F.col("area") / F.lit(6.0))
            .join(
                runner.spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
                    "doc_id", "n_chars"
                ).join(
                    pts.select("entity_id", "doc_id"), "doc_id"
                ).select("entity_id", "n_chars"),
                "entity_id",
            )
            .withColumn(
                "term", F.round(F.col("n_chars") * F.col("weight"), 9).cast("decimal(38,12)")
            )
            .groupBy("district_id")
            .agg(F.sum("term").cast("double").alias("n_chars_sum"))
        ),
        inputs=["pieces", "points"],
    )
    return prorated
