"""Raster-tile ↔ vector reconciliation (north_star requirement).

The scale-out version of the reference's coverage checks
(/root/reference/maup/repair.py:311-365 computes global unions and
counts — infeasible as a single reduction at 10^12 rows): rasterize the
polygon layer onto the cell grid by computing each (cell, polygon)
exact intersection area, then aggregate **per cell**:

- ``coverage``  = Σ polygon∩cell area / cell area
- coverage >  1 + eps → overlapping polygons inside that tile
- coverage <  1 - eps (within the layer's hull cover) → gap candidates

Per-polygon roll-up of the same table reconciles rasterized area with
the vector truth: Σ_cells area(p ∩ cell) must equal area(p) exactly
(cells partition the plane), a telescoping invariant that localizes any
indexing/refinement bug to a tile.  Everything is one cell-join +
hash aggregation — the doctor check becomes embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.cells import CellGrid
from .spatial import DEFAULT_GRID, geom_broadcast, with_cell_cover


def rasterize_coverage(
    geoms: DataFrame,
    id_col: str = "id",
    grid: CellGrid = DEFAULT_GRID,
    bounds_cols: tuple | None = None,
    geoms_are_rects: bool = False,
) -> DataFrame:
    """Per-(cell, polygon) exact intersection areas.

    Returns DataFrame[cell_id, id, cell_frac, inter_area]; rect layers
    compute areas with codegen'd arithmetic (cell rects are implicit in
    the cell id), general polygons via the exact overlay against the
    broadcast geometry.
    """
    covered = with_cell_cover(
        geoms.selectExpr(f"{id_col} AS __gid", "geometry AS __g", *(bounds_cols or ())),
        grid,
        geom_col="__g",
        bounds_cols=bounds_cols,
    )
    n = F.lit(grid.n)
    cx0 = F.lit(grid.x0) + (F.col("cell_id") % n).cast("double") * F.lit(grid.wx)
    cy0 = F.lit(grid.y0) + F.floor(F.col("cell_id") / n).cast("double") * F.lit(grid.wy)
    cx1 = cx0 + F.lit(grid.wx)
    cy1 = cy0 + F.lit(grid.wy)
    if geoms_are_rects and bounds_cols:
        bx0, by0, bx1, by1 = (F.col(c) for c in bounds_cols)
        w = F.least(bx1, cx1) - F.greatest(bx0, cx0)
        h = F.least(by1, cy1) - F.greatest(by0, cy0)
        inter = F.when((w > 0) & (h > 0), w * h).otherwise(F.lit(0.0))
        out = covered.withColumn("inter_area", inter)
    else:
        from ..geom import vector as V
        import pandas as pd

        bc = geom_broadcast(
            geoms.selectExpr(f"{id_col} AS __gid", "geometry AS __g"), "__gid", "__g"
        )

        def batch(gids, x0s, y0s, x1s, y1s):
            a = pd.Series([bc.value[g] for g in gids])
            b = V.batch_rect_wkb(
                x0s.to_numpy(), y0s.to_numpy(), x1s.to_numpy(), y1s.to_numpy()
            )
            return V.batch_intersection_area(a, b)

        area_udf = F.pandas_udf(batch, "double")
        out = covered.drop("__g").withColumn(
            "inter_area", area_udf(F.col("__gid"), cx0, cy0, cx1, cy1)
        )
    cell_area = grid.wx * grid.wy
    return out.select(
        "cell_id",
        F.col("__gid").alias(id_col),
        (F.col("inter_area") / F.lit(cell_area)).alias("cell_frac"),
        "inter_area",
    ).filter(F.col("inter_area") > 0)


def reconcile(
    geoms: DataFrame,
    id_col: str = "id",
    grid: CellGrid = DEFAULT_GRID,
    bounds_cols: tuple | None = None,
    geoms_are_rects: bool = False,
    eps: float = 1e-9,
) -> dict:
    """Tile-level doctor: returns {overlap_cells, vector_raster_mismatches,
    per_cell: DataFrame, per_geom: DataFrame}."""
    cov = rasterize_coverage(geoms, id_col, grid, bounds_cols, geoms_are_rects)
    per_cell = cov.groupBy("cell_id").agg(
        F.sum("cell_frac").alias("coverage"),
        F.count("*").alias("n_geoms"),
    )
    overlap_cells = per_cell.filter(F.col("coverage") > 1.0 + eps).count()

    from ..geom import vector as V

    area_udf = F.pandas_udf(V.batch_area, "double")
    vec = geoms.select(
        F.col(id_col), area_udf(F.col("geometry")).alias("vector_area")
    )
    per_geom = (
        cov.groupBy(id_col)
        .agg(F.sum("inter_area").alias("raster_area"))
        .join(vec, id_col)
        .withColumn("abs_err", F.abs(F.col("raster_area") - F.col("vector_area")))
    )
    mismatches = per_geom.filter(F.col("abs_err") > 1e-6).count()
    return {
        "overlap_cells": overlap_cells,
        "vector_raster_mismatches": mismatches,
        "per_cell": per_cell,
        "per_geom": per_geom,
    }
