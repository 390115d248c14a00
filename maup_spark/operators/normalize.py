"""``normalize`` — weight / sum-of-weights within a key.

Reference: /root/reference/maup/normalize.py:4-11 (NaN→0 via fillna).
Spark plan: a single window sum partitioned by the level key — one
shuffle, none at all if the relationship is already hash-partitioned on
that key from the intersections join that produced it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize(
    weights: DataFrame,
    level: str = "source_id",
    weight_col: str = "weight",
    out_col: str | None = None,
) -> DataFrame:
    """Divide each weight by the sum of weights sharing ``level``.

    0/0 (and anything non-finite) maps to 0.0 like the reference's
    ``fillna(0)``.
    """
    out_col = out_col or weight_col
    w = Window.partitionBy(level)
    denom = F.sum(weight_col).over(w)
    ratio = F.when(denom != 0, F.col(weight_col) / denom).otherwise(F.lit(0.0))
    return weights.withColumn(out_col, ratio)
