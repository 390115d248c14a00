"""Streaming benchmark-decontamination — the ingestion-side twin of
functions.webtext.contamination_check.

The benchmark gram set is STATIC relative to the stream (an eval suite
changes by release, not by micro-batch), so the filter is stateless:
each micro-batch scores its docs against the precomputed benchmark
grams in ``foreachBatch`` (reusing the exact batch operator — a doc's
grams live entirely inside its own row, so no cross-batch state is
needed, unlike dedup) and writes the clean rows.  Exactly-once comes
from the checkpoint; the benchmark table is read once and reused every
batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.webtext import benchmark_grams, contamination_check


def streaming_decontaminate(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    bench_docs: DataFrame,
    schema: str = "doc_id bigint, ts timestamp, text string",
    tau: float = 0.5,
    n: int = 8,
    text_col: str = "text",
):
    """availableNow streaming decontamination: drop docs whose distinct
    n-gram overlap with ``bench_docs`` reaches ``tau``; pass the rest
    through unchanged."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    # the gram aggregation runs ONCE; every micro-batch broadcasts the
    # persisted result instead of re-aggregating the benchmark
    grams = benchmark_grams(bench_docs, text_col=text_col, n=n).persist()

    def emit(batch: DataFrame, batch_id: int) -> None:
        leaked = (
            contamination_check(batch, bench_grams=grams, text_col=text_col, n=n)
            .filter(F.col("contamination") >= tau)
            .select("doc_id")
        )
        clean = batch.join(leaked, "doc_id", "left_anti")
        clean.write.mode("append").parquet(output_dir)

    return (
        stream.writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
