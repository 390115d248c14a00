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
