"""Shared spatial-join plumbing: cell-cover explode + candidate joins.

The pattern everywhere: explode geometry bbox covers into a ``cell_id``
column, hash equi-join on it (broadcast when the polygon side is small),
``dropDuplicates`` the candidate pairs (a pair can meet in many cells —
the distributed twin of the reference's ``set(...ravel())`` dedup at
/root/reference/maup/indexed_geometries.py:26-27), then refine with an
exact vectorized kernel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType

from ..geom import vector as V
from ..index.cells import CellGrid

DEFAULT_GRID = CellGrid(res=7)  # 128×128 world cells ≈ 2.8° — fits 10° districts


def point_cell_col(grid: CellGrid, x: str = "lon", y: str = "lat") -> Column:
    """Cell id of a point as a built-in (codegen'd) expression — no UDF."""
    ix = F.floor((F.col(x) - F.lit(grid.x0)) / F.lit(grid.wx)).cast("long")
    iy = F.floor((F.col(y) - F.lit(grid.y0)) / F.lit(grid.wy)).cast("long")
    n = F.lit(grid.n)
    ix = F.greatest(F.lit(0), F.least(ix, n - 1))
    iy = F.greatest(F.lit(0), F.least(iy, n - 1))
    return (iy * n + ix).alias("cell_id")


def with_cell_cover(
    df: DataFrame,
    grid: CellGrid,
    geom_col: str = "geometry",
    dilate: int = 0,
) -> DataFrame:
    """Explode each geometry to the cells its bbox touches (+``dilate``
    rings, for kNN fallback joins). Adds ``cell_id``."""

    @F.pandas_udf(ArrayType(LongType()))
    def cover_udf(wkbs):
        import pandas as pd

        if not dilate:
            return V.batch_cover_cells(wkbs, grid)
        # ring-dilated cover == cover of the bbox expanded by `dilate` cells
        from ..geom.base import Geometry

        out = []
        for b in wkbs:
            if b is None:
                out.append([])
                continue
            xmin, ymin, xmax, ymax = Geometry.from_wkb(b).bounds
            out.append(
                grid.cover_bbox(
                    xmin - dilate * grid.wx,
                    ymin - dilate * grid.wy,
                    xmax + dilate * grid.wx,
                    ymax + dilate * grid.wy,
                ).tolist()
            )
        return pd.Series(out)

    return df.withColumn("cell_id", F.explode(cover_udf(F.col(geom_col))))


@F.pandas_udf(BooleanType())
def pip_udf(xs, ys, wkbs):
    return V.batch_points_in_polygon(xs, ys, wkbs)


@F.pandas_udf(BooleanType())
def covers_udf(a_wkbs, b_wkbs):
    return V.batch_covers(a_wkbs, b_wkbs)


def candidate_pairs(
    sources: DataFrame,
    targets: DataFrame,
    grid: CellGrid,
    source_geom: str = "geometry",
    target_geom: str = "geometry",
    broadcast_targets: bool = True,
    dedup_keys: list[str] | None = None,
) -> DataFrame:
    """Cell-join candidate (source, target) pairs, deduped on the pair
    keys only (never shuffling geometry payloads as dedup keys).

    Column name collisions between the two sides must be resolved by the
    caller (alias geometry columns before calling).
    """
    s = with_cell_cover(sources, grid, source_geom)
    t = with_cell_cover(targets, grid, target_geom)
    if broadcast_targets:
        t = F.broadcast(t)
    joined = s.join(t, "cell_id").drop("cell_id")
    if dedup_keys:
        joined = joined.dropDuplicates(dedup_keys)
    return joined
