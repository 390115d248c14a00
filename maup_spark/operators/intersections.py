"""``intersections`` and ``prorate`` — the area-weighting workhorses.

Reference semantics (/root/reference/maup/intersections.py:9-99):

- ``intersections(sources, targets)`` → every nonempty pairwise
  intersection geometry, keyed (source, target); optional strict
  ``area > area_cutoff`` filter.
- ``prorate(relationship, data, weights)`` → disaggregate source data
  over relationship rows by weight, then sum (or other agg) per target.

Spark plan: exploded-cell equi-join (polygon targets broadcast) →
pair dedup → exact pairwise overlay in one Arrow-batched struct UDF →
filters pushed on the computed ``area`` column.  ``prorate`` is two
equi-joins plus a hash aggregation — no geometry at all, fully
codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    StructField,
    StructType,
)

from ..geom import vector as V
from ..index.cells import CellGrid
from .spatial import DEFAULT_GRID, candidate_pairs

_IX_SCHEMA = StructType(
    [
        StructField("wkb", BinaryType()),
        StructField("area", DoubleType()),
        StructField("length", DoubleType()),
        StructField("is_empty", BooleanType()),
    ]
)


def _intersection_batch(a, b):
    return V.batch_intersection(a, b)


# asNondeterministic stops CollapseProject from cloning the Python call
# once per struct-field reference (verified via .explain)
_intersection_udf = F.pandas_udf(_intersection_batch, _IX_SCHEMA).asNondeterministic()


def intersections(
    sources: DataFrame,
    targets: DataFrame,
    source_id: str = "source_id",
    target_id: str = "target_id",
    area_cutoff: float | None = None,
    grid: CellGrid = DEFAULT_GRID,
    broadcast_targets: bool = True,
    source_bounds: tuple | None = None,
    target_bounds: tuple | None = None,
) -> DataFrame:
    """All nonempty pairwise intersections.

    Returns ``DataFrame[source_id, target_id, geometry, area, length]``.
    Mixed-dimension results (shared edges → lines, corner touches →
    points) are kept, as the reference keeps every nonempty geometry
    (/root/reference/maup/indexed_geometries.py:31-34); ``area_cutoff``
    applies the strict ``area > cutoff`` filter of
    /root/reference/maup/intersections.py:48-51.
    """
    src = sources.select(
        F.col(source_id).alias("__sid"),
        F.col("geometry").alias("__sgeom"),
        *(source_bounds or ()),
    )
    tgt = targets.select(
        F.col(target_id).alias("__tid"),
        F.col("geometry").alias("__tgeom"),
        *(target_bounds or ()),
    )
    cand = candidate_pairs(
        src,
        tgt,
        grid,
        "__sgeom",
        "__tgeom",
        broadcast_targets=broadcast_targets,
        source_bounds=source_bounds,
        target_bounds=target_bounds,
    )
    out = (
        cand.withColumn("__ix", _intersection_udf(F.col("__sgeom"), F.col("__tgeom")))
        .filter(~F.col("__ix.is_empty"))
        .select(
            F.col("__sid").alias(source_id),
            F.col("__tid").alias(target_id),
            F.col("__ix.wkb").alias("geometry"),
            F.col("__ix.area").alias("area"),
            F.col("__ix.length").alias("length"),
        )
    )
    if area_cutoff is not None:
        out = out.filter(F.col("area") > F.lit(float(area_cutoff)))
    return out


def prorate(
    relationship: DataFrame,
    data: DataFrame,
    weights_col: str = "weight",
    columns: list[str] | None = None,
    source_id: str = "source_id",
    target_id: str = "target_id",
    aggregate_by: str = "sum",
) -> DataFrame:
    """Move ``columns`` of ``data`` (keyed by source) onto targets using
    per-(source,target) weights in ``relationship``.

    relationship: DataFrame[source_id, target_id, weights_col]
    data:         DataFrame[source_id, columns...]
    Returns       DataFrame[target_id, columns...] aggregated.
    """
    columns = columns or [
        c for c in data.columns if c != source_id
    ]
    joined = relationship.join(data, source_id)
    disagg = joined.select(
        target_id,
        *[
            (F.col(c) * F.col(weights_col)).alias(c)
            for c in columns
        ],
    )
    agg_fn = getattr(F, aggregate_by)
    return disagg.groupBy(target_id).agg(
        *[agg_fn(c).alias(c) for c in columns]
    )
