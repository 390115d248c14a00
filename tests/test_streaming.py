"""Streaming ingest parity: the availableNow streaming pipeline must
produce exactly the batch answer (it reuses the batch operator per
microbatch)."""

import shutil


def test_streaming_assign_matches_batch(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from maup_spark import datagen as D
    from maup_spark.operators.assign import assign_points
    from maup_spark.streaming.assign_stream import streaming_assign_counts

    src = str(tmp_path / "landing")
    shutil.copytree(sf_dir, src, ignore=shutil.ignore_patterns("*"))
    # stage the documents file into the landing zone
    shutil.copy(f"{sf_dir}/documents.parquet", f"{src}/part-0.parquet")

    districts = D.districts(spark)
    q = streaming_assign_counts(
        spark,
        src,
        districts,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_dir=str(tmp_path / "out"),
        target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
    )
    q.awaitTermination(240)

    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .groupBy("district_id")
        .agg(F.sum("n_points").alias("n_points"))
    )
    want = (
        assign_points(
            D.points(spark, sf_dir),
            districts,
            point_id="entity_id",
            target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
        )
        .groupBy("district_id")
        .agg(F.count("*").alias("n_points"))
    )
    g = {r["district_id"]: r["n_points"] for r in got.collect()}
    w = {r["district_id"]: r["n_points"] for r in want.collect()}
    assert g == w
