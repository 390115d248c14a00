"""Streaming PII redaction — the ingestion-side twin of
functions.webtext.pii_scrub.

The scrub is a pure stateless projection (regexp counts + chained
replaces), so unlike the dedup twins it needs NO foreachBatch, no
state store, and no watermark: the batch operator composes directly
onto the streaming DataFrame and rides the parquet sink with
exactly-once file commits from the checkpoint.  This is the ideal
Structured Streaming operator class — per-row, engine-planned,
byte-identical to the batch path by construction.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.webtext import pii_scrub


def streaming_pii_scrub(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str = "doc_id bigint, text string",
    text_col: str = "text",
):
    """availableNow streaming redaction: emit every doc with its
    redacted text and per-class PII match counts."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    scrubbed = pii_scrub(stream, text_col=text_col).select(
        "doc_id",
        F.col("clean_text").alias(text_col),
        "n_email",
        "n_phone",
        "n_ipv4",
    )
    return (
        scrubbed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
