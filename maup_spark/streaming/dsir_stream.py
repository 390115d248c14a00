"""Streaming DSIR selection — the ingestion-side twin of
functions.dsir.dsir_score.

The (target, raw) hashed-gram models are STATIC relative to the stream
(they are fit on reference corpora, not on the arriving batch), so the
filter is stateless: each micro-batch scores its documents against the
precomputed broadcast ratio table in ``foreachBatch`` (reusing the
exact batch operator — a doc's grams live entirely inside its own row,
so no cross-batch state is needed) and keeps the docs whose integer
importance score clears ``min_score``.  Exactly-once comes from the
checkpoint; the ratio table is computed once and reused every batch.

Note the streaming twin thresholds on the ABSOLUTE score (a per-batch
top-K would make survival depend on batch boundaries); pick
``min_score`` from a batch ``dsir_select`` run on a sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dsir import DEFAULT_BUCKETS, dsir_score


def streaming_dsir_filter(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    ratio: DataFrame,
    min_score: int,
    n_buckets: int = DEFAULT_BUCKETS,
    schema: str = "doc_id bigint, ts timestamp, text string",
    text_col: str = "text",
):
    """availableNow streaming DSIR filter: keep docs whose integer
    importance score (vs the static ``dsir_ratio`` table, same
    ``n_buckets``) is >= ``min_score``; drop the rest."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    # the ratio table is bounded (<= n_buckets rows): persist once,
    # broadcast every micro-batch instead of recomputing
    ratio = ratio.persist()

    def emit(batch: DataFrame, batch_id: int) -> None:
        keep = (
            dsir_score(batch, ratio, n_buckets=n_buckets, text_col=text_col)
            .filter(F.col("score") >= min_score)
            .select("doc_id")
        )
        batch.join(keep, "doc_id", "left_semi").write.mode("append").parquet(
            output_dir
        )

    return (
        stream.writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
