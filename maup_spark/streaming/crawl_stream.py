"""Streaming crawl dedup — the ingestion-side twin of
functions.webtext.url_dedup.

A live crawl frontier re-fetches the same logical page continuously
(utm-tagged links, www/non-www, trailing slashes); the batch dedup's
full-corpus aggregation is the wrong shape for an unbounded ingest.
Canonicalization runs per-row (stateless, codegen), then
``dropDuplicatesWithinWatermark`` keeps canonical-URL state only for
the watermark horizon: a recrawl arriving within the horizon is
dropped, state is evicted as event time advances, and exactly-once
delivery comes from the checkpoint — state stays O(distinct canonical
URLs per horizon), never O(frontier).

Batch/stream parity: the surviving canonical-URL set equals
``url_dedup``'s (which representative row survives is arrival-order
business in the stream, ts-order in batch — the parity gate compares
canonical sets, the same contract as streaming exact dedup).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..functions.webtext import canonicalize_url


def streaming_crawl_dedup(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str = "url string, warc_ts timestamp, html binary",
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
):
    """availableNow streaming crawl dedup: emit each canonical URL's
    first arrival, drop recrawls within the watermark horizon."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    deduped = (
        canonicalize_url(stream)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["canon_url"])
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
