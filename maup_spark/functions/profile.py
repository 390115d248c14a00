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
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nn{i}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__nd{i}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx{i}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __nn{i}, __nd{i}, __mn{i}, __mx{i}" for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack})"
        " AS (column, n_nulls, n_distinct, min_str, max_str)",
        "__n AS n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")
