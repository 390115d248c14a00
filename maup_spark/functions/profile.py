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
        "__r.column", "n_rows", "__r.n_nulls", "__r.n_distinct",
        "__r.min_str", "__r.max_str",
    )
