"""Multimodal column plumbing: the pages table (input_hint schema) and
opaque binary media columns with typed metadata.

The pages table carries (url, warc_ts, html binary, text, lang) per the
driver input_hint; ``extract_text`` is the engine's HTML→text stage and
must reproduce the stored ``text`` byte-identically per url (the
determinism gate).  Decode for image/audio/video is STUBBED (the
container has no codec libraries): ``decode_media`` raises
NotImplementedError by design, while ``media_features`` computes real
Spark-side plumbing (schema, batching, partitioning) over a
deterministic fake payload.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the Common-Crawl-style pages table from documents
    (deterministic; schema = input_hint).  Delegates to
    datagen.web_pages — the single synthesis source of truth (escaped
    text inside realistic boilerplate: head/script/style/title/
    comments/attributed mixed-case tags)."""
    from ..datagen import web_pages

    n_part = spark.sparkContext.defaultParallelism
    return web_pages(spark, sf_dir).repartition(n_part)


def extract_text(pages_df: DataFrame) -> DataFrame:
    """HTML→text extraction; by construction the output must equal the
    stored ``text`` byte-for-byte per url (the determinism gate).

    Delegates to functions.webtext.extract_text — a pure JVM
    regexp_replace projection chain (whole-stage codegen, zero shuffle,
    ZERO Python; this replaced a mapInPandas prefix-stripper, removing
    the only Python stage from the pipeline ingest path)."""
    from .webtext import extract_text as _extract

    return _extract(pages_df).select(
        "url", F.col("text_extracted").alias("extracted_text")
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary media column + typed metadata, synthesized
    deterministically (payload = utf8(md5(media_id) × (id%5+1)))."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    return docs.repartition(n_part).select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.repeat(F.md5(F.col("doc_id").cast("string")), (F.col("doc_id") % 5 + 1).cast("int")),
            "UTF-8",
        ).alias("payload"),
        F.struct(
            (F.col("doc_id") % 1920).alias("width"),
            (F.col("doc_id") % 1080).alias("height"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, kind: str):
    """Real decode requires codec libs absent from this container."""
    raise NotImplementedError(
        f"media decode for kind={kind!r} is stubbed: no image/audio codecs "
        "in this environment; the Spark-side plumbing (schema, batching, "
        "partitioning) around it is real and tested"
    )


def frame_sample(
    media: DataFrame, every_nth: int = 2, max_frames: int = 8
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (media_id, frame_idx, frame binary, width, height).

    The frame-count/index fan-out and the batch plumbing are the real
    production shape (JVM ``sequence`` explode — the sampler never
    touches Python until the decode); the DECODE itself is the declared
    stub (no codecs in this container), so frame bytes are a
    deterministic fake: utf8(md5(media_id '#' frame_idx)).  Swapping in
    a real decoder replaces ONE pandas UDF; schema, partitioning and
    fan-out stay identical."""
    vids = (
        media.filter(F.col("kind") == "video")
        .withColumn(
            # deterministic per-video frame count: payload length / 8 frames
            "__n_frames",
            F.least(
                F.lit(max_frames),
                (F.length("payload") / F.lit(8)).cast("int"),
            ),
        )
        # a sub-8-byte payload would yield sequence(0, -1) and throw at
        # runtime ("Illegal sequence boundaries"); such a video has no
        # sampleable frame, so drop it before the explode
        .filter(F.col("__n_frames") >= 1)
    )
    frames = vids.withColumn(
        "frame_idx",
        F.explode(
            F.sequence(
                F.lit(0), F.col("__n_frames") - 1, F.lit(int(every_nth))
            )
        ),
    )
    fake_frame = F.encode(
        F.md5(
            F.concat(
                F.col("media_id").cast("string"),
                F.lit("#"),
                F.col("frame_idx").cast("string"),
            )
        ),
        "UTF-8",
    )
    return frames.select(
        "media_id",
        "frame_idx",
        fake_frame.alias("frame"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def media_features(media: DataFrame) -> DataFrame:
    """Feature extraction over the opaque payload via mapInPandas —
    the decode step is a deterministic fake (byte stats), the batch
    shape/schema/partitioning are the real production plumbing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = [len(b) for b in pdf["payload"]]
            first = [b[0] if len(b) else 0 for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "first_byte": first,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema="media_id bigint, kind string, n_bytes int, first_byte int"
    )
