"""Streaming HTML→text extraction — the ingestion-side twin of
functions.webtext.extract_text.

Extraction is a pure stateless projection (decode + regexp_replace
chain), so like the PII twin it needs NO foreachBatch, no state store,
and no watermark: the batch operator composes directly onto the
streaming DataFrame and rides the parquet sink with exactly-once file
commits from the checkpoint.  This is the crawl front door at scale —
WARC-derived page files land continuously, each micro-batch extracts
text byte-identically to the batch path by construction (same plan).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..functions.webtext import extract_text

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def streaming_extract_text(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str = PAGES_SCHEMA,
    html_col: str = "html",
):
    """availableNow streaming extraction over page files: emit
    (url, warc_ts, lang, text_extracted) per page."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    extracted = extract_text(stream, html_col=html_col).select(
        "url", "warc_ts", "lang", "text_extracted"
    )
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
