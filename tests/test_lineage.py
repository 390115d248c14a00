"""Checkpoint-resume + per-partition lineage metrics (north_rule)."""

import json
import os


def test_pipeline_checkpoints_and_resumes(spark, sf_dir, tmp_path):
    from maup_spark.io.lineage import StageRunner, assign_prorate_pipeline

    run_dir = str(tmp_path / "run1")
    out1 = assign_prorate_pipeline(spark, sf_dir, run_dir)
    rows1 = {r["district_id"]: r["n_chars_sum"] for r in out1.collect()}
    assert len(rows1) > 100

    # all four stages materialized with _SUCCESS markers
    for stage in ("points", "assignment", "pieces", "prorated"):
        assert os.path.exists(os.path.join(run_dir, stage, "_SUCCESS"))

    # per-partition metrics exist and cover every stage
    runner = StageRunner(spark, run_dir)
    m = runner.metrics()
    stages = {r["stage"] for r in m.select("stage").distinct().collect()}
    assert stages == {"points", "assignment", "pieces", "prorated"}
    totals = {
        r["stage"]: r["rows"]
        for r in m.groupBy("stage").sum("rows").withColumnRenamed("sum(rows)", "rows").collect()
    }
    assert totals["points"] == totals["assignment"]  # one row per entity

    # second run skips everything (checkpoint resume) and matches
    out2 = assign_prorate_pipeline(spark, sf_dir, run_dir)
    rows2 = {r["district_id"]: r["n_chars_sum"] for r in out2.collect()}
    assert rows1 == rows2
    manifest = [
        json.loads(line)
        for line in open(os.path.join(run_dir, "_manifest.jsonl"))
    ]
    statuses = [e["status"] for e in manifest]
    assert statuses.count("completed") == 4
    assert statuses.count("skipped (checkpoint hit)") == 4


def test_partial_resume(spark, sf_dir, tmp_path):
    """Deleting one stage's marker re-runs only that stage."""
    import shutil

    from maup_spark.io.lineage import assign_prorate_pipeline

    run_dir = str(tmp_path / "run2")
    assign_prorate_pipeline(spark, sf_dir, run_dir)
    shutil.rmtree(os.path.join(run_dir, "prorated"))
    assign_prorate_pipeline(spark, sf_dir, run_dir)
    manifest = [
        json.loads(line)
        for line in open(os.path.join(run_dir, "_manifest.jsonl"))
    ]
    second = manifest[4:]
    by_stage = {e["stage"]: e["status"] for e in second}
    assert by_stage["points"].startswith("skipped")
    assert by_stage["pieces"].startswith("skipped")
    assert by_stage["prorated"] == "completed"


def test_table_io_parquet_fallback_and_iceberg_gate(spark, sf_dir, tmp_path):
    """write_table/read_table: parquet fallback round-trips with day
    partitioning; Iceberg catalog targets error clearly when no catalog
    is configured (this sandbox has no Iceberg runtime)."""
    import pytest
    from pyspark.sql import functions as F

    from maup_spark.io.table import iceberg_available, read_table, write_table

    assert iceberg_available(spark) is False  # sandbox: no jars/catalog

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(200)
    target = str(tmp_path / "events_tbl")
    write_table(ev, target, partition_col="ts")
    back = read_table(spark, target)
    assert back.count() == 200
    assert set(back.columns) == set(ev.columns)  # __day stripped
    # day partitioning actually materialized on disk
    import os

    assert any(d.startswith("__day=") for d in os.listdir(target))

    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        write_table(ev, "lake.db.events")
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        read_table(spark, "lake.db.events")
