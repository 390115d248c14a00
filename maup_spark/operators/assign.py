"""Distributed ``assign``: the flagship operator.

Semantics mirror /root/reference/maup/assign.py:13-54 exactly:

1. *assign by covering* — a source fully covered by a target gets that
   target; sources covered by more than one target (overlapping targets)
   are dropped back to phase 2 (/root/reference/maup/indexed_geometries.py:58-71);
2. *assign by area* — remaining sources go to the target with the
   largest positive intersection area; ties break to the smallest target
   id (pandas ``idxmax`` takes the first occurrence of the (source,
   target)-sorted pieces, /root/reference/maup/assign.py:49-50 +
   /root/reference/maup/intersections.py:43-46);
3. anything still unmatched stays ``NULL`` (the reference's NaN +
   ``AssigmentWarning``).

Physical plan: exploded-cell broadcast hash join → vectorized exact
refine (PIP / covers / intersection area) → window ``row_number`` top-1.
The only shuffles are the window on ``source`` and the final union; the
candidate join itself is broadcast (polygon layers are the small side).
A kNN fallback (cell-ring-dilated join + exact point-to-boundary
distance) is available for points that land outside every target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..geom import vector as V
from ..index.cells import CellGrid
from .spatial import (
    DEFAULT_GRID,
    candidate_pairs,
    covers_udf,
    pip_udf,
    point_cell_col,
    with_cell_cover,
)


def assign_points(
    points: DataFrame,
    targets: DataFrame,
    point_id: str = "doc_id",
    target_id: str = "district_id",
    x: str = "lon",
    y: str = "lat",
    grid: CellGrid = DEFAULT_GRID,
    knn_fallback: bool = False,
    knn_max_ring: int = 12,
) -> DataFrame:
    """Point-in-polygon assignment of points to a polygon layer.

    Returns ``DataFrame[point_id, target_id, method]`` with one row per
    input point; ``target_id`` NULL = unassigned (maup's NaN).  The
    point side never leaves the JVM until the PIP refine; its cell id is
    a codegen'd expression.
    """
    pts = points.select(point_id, x, y).withColumn(
        "cell_id", point_cell_col(grid, x, y)
    )
    tgt = with_cell_cover(
        targets.select(
            F.col(target_id).alias("__tid"), F.col("geometry").alias("__tgeom")
        ),
        grid,
        geom_col="__tgeom",
    )
    cand = pts.join(F.broadcast(tgt), "cell_id")
    hits = (
        cand.filter(pip_udf(F.col(x), F.col(y), F.col("__tgeom")))
        .select(point_id, F.col("__tid"))
        .dropDuplicates([point_id, "__tid"])
    )
    # a point interior to 2+ overlapping targets falls through (reference
    # drops multi-covered sources, /root/reference/maup/indexed_geometries.py:58-71)
    uniq = (
        hits.groupBy(point_id)
        .agg(F.min("__tid").alias("__tid"), F.count("*").alias("__n"))
        .filter(F.col("__n") == 1)
        .select(point_id, F.col("__tid").alias(target_id))
        .withColumn("method", F.lit("covering"))
    )

    out = points.select(point_id, x, y).join(uniq, point_id, "left")

    if knn_fallback:
        unmatched = out.filter(F.col(target_id).isNull()).select(point_id, x, y)
        near = _knn_points(
            unmatched, targets, point_id, target_id, x, y, grid, knn_max_ring
        ).withColumnRenamed(target_id, "__knn_tid")
        out = (
            out.join(near, point_id, "left")
            .withColumn(
                "method",
                F.when(F.col(target_id).isNotNull(), F.col("method")).when(
                    F.col("__knn_tid").isNotNull(), F.lit("knn")
                ),
            )
            .withColumn(target_id, F.coalesce(F.col(target_id), F.col("__knn_tid")))
            .drop("__knn_tid")
        )
    return out.select(point_id, target_id, "method")


def _knn_points(
    unmatched: DataFrame,
    targets: DataFrame,
    point_id: str,
    target_id: str,
    x: str,
    y: str,
    grid: CellGrid,
    max_ring: int,
) -> DataFrame:
    """Nearest-target fallback: join unmatched points against targets
    whose cell cover, dilated by ``max_ring`` rings, reaches the point's
    cell; exact point→boundary distance picks the winner."""

    @F.pandas_udf(DoubleType())
    def dist_udf(xs, ys, wkbs):
        import numpy as np
        import pandas as pd

        from ..geom.base import Geometry
        from ..geom.arrangement import _point_seg_dist  # noqa: internal reuse

        cache = {}
        out = np.empty(len(xs))
        for i, (px, py, b) in enumerate(zip(xs, ys, wkbs)):
            segs = cache.get(b)
            if segs is None:
                g = Geometry.from_wkb(b)
                arrs = []
                for rings in g.polygons():
                    for r in rings:
                        arrs.append(
                            np.column_stack([r[:-1], r[1:]])
                        )
                segs = (
                    np.vstack(arrs) if arrs else np.empty((0, 4))
                )
                cache[b] = segs
            out[i] = _point_seg_dist(px, py, segs).min() if len(segs) else np.inf
        return pd.Series(out)

    pts = unmatched.withColumn("cell_id", point_cell_col(grid, x, y))
    tgt = with_cell_cover(
        targets.select(
            F.col(target_id).alias("__tid"), F.col("geometry").alias("__tgeom")
        ),
        grid,
        geom_col="__tgeom",
        dilate=max_ring,
    )
    cand = pts.join(F.broadcast(tgt), "cell_id").dropDuplicates([point_id, "__tid"])
    w = Window.partitionBy(point_id).orderBy("__dist", "__tid")
    return (
        cand.withColumn("__dist", dist_udf(F.col(x), F.col(y), F.col("__tgeom")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(point_id, F.col("__tid").alias(target_id))
    )


def assign(
    sources: DataFrame,
    targets: DataFrame,
    source_id: str = "source_id",
    target_id: str = "target_id",
    grid: CellGrid = DEFAULT_GRID,
) -> DataFrame:
    """Polygon→polygon assignment (reference semantics above).

    Returns ``DataFrame[source_id, target_id, method]``, one row per
    source; NULL target = unassigned.
    """
    src = sources.select(
        F.col(source_id).alias("__sid"), F.col("geometry").alias("__sgeom")
    )
    tgt = targets.select(
        F.col(target_id).alias("__tid"), F.col("geometry").alias("__tgeom")
    )
    cand = candidate_pairs(
        src, tgt, grid, "__sgeom", "__tgeom", dedup_keys=["__sid", "__tid"]
    )
    covered = (
        cand.filter(covers_udf(F.col("__tgeom"), F.col("__sgeom")))
        .groupBy("__sid")
        .agg(F.min("__tid").alias("__tid"), F.count("*").alias("__n"))
        .filter(F.col("__n") == 1)
        .select("__sid", "__tid")
    )

    unassigned = src.join(covered.select("__sid"), "__sid", "left_anti")
    by_area = assign_by_area(
        unassigned.select(F.col("__sid").alias(source_id), F.col("__sgeom").alias("geometry")),
        tgt.select(F.col("__tid").alias(target_id), F.col("__tgeom").alias("geometry")),
        source_id,
        target_id,
        grid,
    )

    phase1 = covered.select(
        F.col("__sid").alias(source_id),
        F.col("__tid").alias(target_id),
        F.lit("covering").alias("method"),
    )
    phase2 = by_area.withColumn("method", F.lit("area"))
    assigned = phase1.unionByName(phase2)
    return (
        sources.select(source_id)
        .join(assigned, source_id, "left")
        .select(source_id, target_id, "method")
    )


def assign_by_area(
    sources: DataFrame,
    targets: DataFrame,
    source_id: str = "source_id",
    target_id: str = "target_id",
    grid: CellGrid = DEFAULT_GRID,
) -> DataFrame:
    """argmax_t area(source ∩ target) over strictly-positive-area pairs
    (/root/reference/maup/assign.py:45-46)."""
    from ..geom import vector as V  # noqa: F401

    @F.pandas_udf(DoubleType())
    def ia_udf(a, b):
        return V.batch_intersection_area(a, b)

    src = sources.select(
        F.col(source_id).alias("__sid"), F.col("geometry").alias("__sgeom")
    )
    tgt = targets.select(
        F.col(target_id).alias("__tid"), F.col("geometry").alias("__tgeom")
    )
    cand = candidate_pairs(
        src, tgt, grid, "__sgeom", "__tgeom", dedup_keys=["__sid", "__tid"]
    )
    pairs = cand.withColumn("__area", ia_udf(F.col("__sgeom"), F.col("__tgeom")))
    pairs = pairs.filter(F.col("__area") > 0)
    return assign_to_max(
        pairs.select(
            F.col("__sid").alias(source_id),
            F.col("__tid").alias(target_id),
            F.col("__area").alias("weight"),
        ),
        source_id,
        target_id,
    )


def assign_to_max(
    weights: DataFrame,
    source_id: str = "source_id",
    target_id: str = "target_id",
    weight: str = "weight",
) -> DataFrame:
    """Per-source argmax over a (source, target, weight) relationship —
    the reference's groupby-idxmax (/root/reference/maup/assign.py:49-54).
    Tie-break: smallest target id (pandas idxmax first-occurrence over
    (source,target)-sorted input)."""
    w = Window.partitionBy(source_id).orderBy(
        F.desc(weight), F.asc(target_id)
    )
    return (
        weights.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(source_id, target_id)
    )
