"""Table profiling — the data-validation twin of the geometry layer's
``doctor``: per-column null counts, exact distinct counts and min/max,
in ONE pass over the table (Spark plans the multi-distinct as a single
scan with an Expand — C× row amplification through the aggregation,
the standard profiling trade; swap ``exact_distinct=False`` for HLL
sketches when a ±2% answer is enough at 100 TB).

Output is long-format (one row per column) so the profile of any table
has one stable schema — the shape a lineage/QA system stores per
ingest batch and diffs across days.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """DataFrame[column, n_rows, n_nulls, n_distinct, min_str, max_str].

    min/max are emitted as strings via each value's native CAST — for
    integer and string columns the representation is engine-portable
    (the driver oracle runs the same casts); float columns profile fine
    but their string forms are engine-specific (scientific-notation
    thresholds differ), so keep them out of cross-engine comparisons.
    """
    cols = list(columns or df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        # df[c] resolves the exact column name — no SQL-string
        # interpolation, so quotes/backquotes/dots in names are safe
        aggs.append(F.sum(df[c].isNull().cast("long")).alias(f"__nn{i}"))
        if exact_distinct:
            aggs.append(F.countDistinct(df[c]).alias(f"__nd{i}"))
        else:
            aggs.append(F.approx_count_distinct(df[c]).alias(f"__nd{i}"))
        aggs.append(F.min(df[c]).cast("string").alias(f"__mn{i}"))
        aggs.append(F.max(df[c]).cast("string").alias(f"__mx{i}"))
    wide = df.agg(*aggs)
    # long format via explode over an array of structs (the stack()
    # equivalent without building SQL text from column names)
    row = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn{i}").alias("n_nulls"),
                F.col(f"__nd{i}").alias("n_distinct"),
                F.col(f"__mn{i}").alias("min_str"),
                F.col(f"__mx{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ])
    ).alias("__r")
    return wide.select(row, F.col("__n").alias("n_rows")).select(
        "__r.column",
        "n_rows",
        F.coalesce(F.col("__r.n_nulls"), F.lit(0)).alias("n_nulls"),
        F.coalesce(F.col("__r.n_distinct"), F.lit(0)).alias("n_distinct"),
        "__r.min_str",
        "__r.max_str",
    )


def profile_table_sketch(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    lgk: int = 12,
) -> DataFrame:
    """Mergeable per-batch profile: like ``profile_table`` but the
    distinct count is carried as an Apache DataSketches HLL sketch
    (Spark-native ``hll_sketch_agg``, JVM-side) next to its point
    estimate — the shape an ingest pipeline writes per batch so a QA
    system can diff AND MERGE profiles across days without rescanning
    (SURVEY §8.2: cross-batch distincts are not additive; sketches
    union losslessly).

    One pass over the table; values are sketched via their string cast
    so every column type shares one merge-compatible representation.
    Returns DataFrame[column, n_rows, n_nulls, n_distinct_est,
    nd_sketch(binary), min_str, max_str]; feed any union of these
    (e.g. read back from per-day parquet) to ``merge_profiles``.
    ``lgk`` is the HLL log2(k) accuracy knob (12 -> ~2.5% rel. error,
    4 KiB per sketch)."""
    cols = list(columns or df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(df[c].isNull().cast("long")).alias(f"__nn{i}"),
            F.hll_sketch_agg(df[c].cast("string"), F.lit(lgk)).alias(f"__sk{i}"),
            F.min(df[c]).cast("string").alias(f"__mn{i}"),
            F.max(df[c]).cast("string").alias(f"__mx{i}"),
        ]
    wide = df.agg(*aggs)
    row = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn{i}").alias("n_nulls"),
                F.col(f"__sk{i}").alias("nd_sketch"),
                F.col(f"__mn{i}").alias("min_str"),
                F.col(f"__mx{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ])
    ).alias("__r")
    return wide.select(row, F.col("__n").alias("n_rows")).select(
        "__r.column",
        "n_rows",
        # zero rows -> NULL sum / NULL sketch -> well-defined zeros
        F.coalesce(F.col("__r.n_nulls"), F.lit(0)).alias("n_nulls"),
        F.coalesce(F.hll_sketch_estimate("__r.nd_sketch"), F.lit(0))
        .alias("n_distinct_est"),
        "__r.nd_sketch",
        "__r.min_str",
        "__r.max_str",
    )


def merge_profiles(profiles: DataFrame) -> DataFrame:
    """Merge a union of per-batch sketch profiles (rows from
    ``profile_table_sketch``, e.g. K days read back from parquet) into
    one corpus-level profile per column: row/null counts add, distinct
    sketches union (``hll_union_agg`` — exact w.r.t. the sketch, no
    rescan).  min_str/max_str are intentionally NOT merged: they are
    string casts, and lexicographic min over e.g. '10'/'9' would be
    numerically wrong — recompute from data if a merged min/max is
    needed.  Returns DataFrame[column, n_rows, n_nulls, n_distinct_est,
    nd_sketch] (still mergeable: feed outputs back in)."""
    merged = profiles.groupBy("column").agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("n_nulls").cast("bigint").alias("n_nulls"),
        F.hll_union_agg("nd_sketch").alias("nd_sketch"),
    )
    return merged.select(
        "column",
        "n_rows",
        "n_nulls",
        F.coalesce(F.hll_sketch_estimate("nd_sketch"), F.lit(0))
        .alias("n_distinct_est"),
        "nd_sketch",
    )


def corpus_doctor(
    df: DataFrame,
    text_col: str = "text",
    max_dup_frac: float = 0.05,
    min_mean_tokens: float = 5.0,
) -> DataFrame:
    """The document-table twin of the geometry layer's ``doctor``: one
    boolean health check over a corpus batch, with the evidence columns
    a QA gate alerts on.  ONE hash aggregation, all JVM:

    - ``n_docs`` / ``n_empty`` (NULL or empty text),
    - ``n_dup_docs`` = rows beyond the first per content fingerprint
      (exact-duplicate mass; > ``max_dup_frac`` of the corpus fails),
    - ``mean_tokens_e3`` (mean whitespace tokens ×1e3 as BIGINT — the
      scaled-integer idiom keeps it engine-portable),
    - ``healthy`` = no empties AND dup mass under the bar AND mean
      length over ``min_mean_tokens``.

    Returns a single row; run per ingest batch next to
    ``profile_table_sketch`` and fail the pipeline stage on
    ``healthy = false``."""
    toks = F.size(F.split(F.col(text_col), " "))
    empty = F.col(text_col).isNull() | (F.col(text_col) == "")
    agg = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(empty.cast("long")).alias("n_empty"),
        # NULL text gets its own fingerprint: countDistinct drops NULLs,
        # which would count every null-text row beyond the first as a dup
        (
            F.count(F.lit(1))
            - F.countDistinct(
                F.coalesce(F.md5(F.col(text_col)), F.lit("__null__"))
            )
        ).alias("n_dup_docs"),
        F.round(F.avg(toks.cast("double")) * 1e3).cast("bigint")
        .alias("mean_tokens_e3"),
    )
    return agg.select(
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        F.coalesce("n_empty", F.lit(0)).alias("n_empty"),
        F.coalesce("n_dup_docs", F.lit(0)).alias("n_dup_docs"),
        F.coalesce("mean_tokens_e3", F.lit(0)).alias("mean_tokens_e3"),
        (
            (F.coalesce("n_empty", F.lit(0)) == 0)
            & (
                F.coalesce("n_dup_docs", F.lit(0)).cast("double")
                <= F.lit(max_dup_frac) * F.coalesce("n_docs", F.lit(0)).cast("double")
            )
            & (F.coalesce("mean_tokens_e3", F.lit(0)) >= F.lit(min_mean_tokens * 1e3))
        ).alias("healthy"),
    )
