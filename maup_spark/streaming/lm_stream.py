"""Streaming corpus-frequency LM filter — the ingestion-side twin of
functions.lm.lm_score (the CCNet keep-head/middle perplexity rule).

The vocabulary table is STATIC relative to the stream (it is trained on
a reference corpus, refreshed by release, not by micro-batch), so the
filter is stateless: each micro-batch scores its documents against the
broadcast vocab in ``foreachBatch`` (reusing the exact batch operator —
a doc's tokens live entirely inside its own row, so no cross-batch
state is needed) and keeps the docs whose familiarity bucket is in
``keep_buckets``.  Exactly-once comes from the checkpoint; the vocab
is persisted once and reused every batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lm import lm_score


def streaming_lm_filter(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    lm: DataFrame,
    keep_buckets: tuple = ("head", "middle"),
    schema: str = "doc_id bigint, ts timestamp, text string",
    text_col: str = "text",
):
    """availableNow streaming LM filter: keep docs whose integer
    familiarity bucket (vs the static ``lm_train`` table) is in
    ``keep_buckets`` — the CCNet rule drops the tail (OOV/rare-token
    junk and non-target-language pages)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    # the vocab is bounded (<= max_vocab rows): persist once, broadcast
    # every micro-batch instead of recomputing
    lm = lm.persist()

    def emit(batch: DataFrame, batch_id: int) -> None:
        keep = (
            lm_score(batch, lm, text_col=text_col)
            .filter(F.col("bucket").isin(*keep_buckets))
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
