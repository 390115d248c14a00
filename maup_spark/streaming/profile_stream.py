"""Streaming QA profiles — per-micro-batch HLL sketch profiles, merged
at read time.

The cross-day story of ``functions.profile`` (per-batch profiles merge
via sketch union, SURVEY §8.2), pushed to the ingestion edge: each
micro-batch appends ONE sketch-profile row set (a few KiB) to a
profile log; ``read_merged_profile`` unions the log into the
corpus-level profile.  Row/null counts add exactly, distinct counts
union through the HLL sketches — nothing ever rescans the ingested
data, and the profile log is itself a tiny parquet table a QA system
can diff between any two points in time (each row carries its
``batch_id``).

State: none in the streaming engine (the profile is a per-batch
aggregate; ``foreachBatch`` writes are idempotent per ``batch_id``, so
checkpoint replays overwrite rather than double-count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_profile(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    profile_dir: str,
    schema: str = "doc_id bigint, ts timestamp, text string",
    columns: list | None = None,
    max_files_per_trigger: int = 1,
):
    """availableNow stream: append each micro-batch's sketch profile to
    ``profile_dir`` (partitioned by batch_id for idempotent replay)."""
    from ..functions.profile import profile_table_sketch

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def emit(batch: DataFrame, batch_id: int) -> None:
        prof = profile_table_sketch(batch, columns=columns).withColumn(
            "batch_id", F.lit(batch_id)
        )
        # dynamic partition overwrite per batch_id: a checkpoint replay
        # of the same micro-batch overwrites its own rows (idempotent)
        prof.write.mode("overwrite").partitionBy("batch_id").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(profile_dir)

    return (
        stream.writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_merged_profile(spark: SparkSession, profile_dir: str) -> DataFrame:
    """Union the per-batch profile log into the corpus-level profile
    (counts add, sketches union) — never touches the ingested data."""
    from ..functions.profile import merge_profiles

    return merge_profiles(spark.read.parquet(profile_dir))
