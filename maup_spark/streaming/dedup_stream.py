"""Streaming exact dedup — the ingestion-side twin of
functions.dedup.exact_dedup.

A Common-Crawl-style ingest sees the same page repeatedly (recrawls,
mirrors); the batch dedup's full-corpus hash-agg is the wrong shape for
an unbounded stream.  ``dropDuplicatesWithinWatermark`` keeps the
content-hash state only for the watermark horizon: a duplicate arriving
within the horizon is dropped exactly once per fingerprint, state is
evicted as event time advances, and exactly-once delivery comes from the
checkpoint — state stays O(distinct fingerprints per horizon), never
O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fingerprinted(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint column shared by the batch and stream twins."""
    return docs.withColumn("fingerprint", F.md5(F.col(text_col)))


def dedup_batch(
    docs: DataFrame, text_col: str = "text", strategy: str = "agg"
) -> DataFrame:
    """Batch twin: first row (smallest ts, then doc_id) per fingerprint —
    the exact set the stream emits when every duplicate arrives within
    the watermark horizon.

    ``strategy="agg"`` (default) finds each fingerprint's winner with a
    hash aggregation (``min(struct(ts, doc_id))`` — mutable buffer,
    map-side partial combine) and joins the winner keys back: a
    boilerplate page duplicated 10^7× across a web crawl combines
    map-side instead of funneling every copy into one window task (the
    same hot-key class fixed in substring_dedup/novelty; AQE can split
    skewed join partitions but never window partitions).
    ``strategy="window"`` keeps the ROW_NUMBER shape (one exchange,
    faster when fingerprints are near-distinct); parity-tested."""
    fp = fingerprinted(docs, text_col)
    if strategy == "window":
        from pyspark.sql import Window

        w = Window.partitionBy("fingerprint").orderBy("ts", "doc_id")
        return (
            fp.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if strategy != "agg":
        raise ValueError(f"unknown strategy {strategy!r}")
    winners = fp.groupBy("fingerprint").agg(
        F.min(F.struct("ts", "doc_id")).alias("__w")
    )
    return (
        fp.join(winners, "fingerprint")
        .filter((F.col("ts") == F.col("__w.ts")) & (F.col("doc_id") == F.col("__w.doc_id")))
        .drop("__w")
        .select(*fp.columns)
    )


def streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str = "doc_id bigint, ts timestamp, text string",
    watermark: str = "1 hour",
    text_col: str = "text",
):
    """availableNow streaming dedup: emit each fingerprint's first
    arrival, drop duplicates within the watermark horizon."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    deduped = (
        fingerprinted(stream, text_col)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
