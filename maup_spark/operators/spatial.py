"""Shared spatial-join plumbing: cell-cover explode + candidate joins.

The pattern everywhere: explode geometry bbox covers into a ``cell_id``
column, hash equi-join on it (broadcast when the polygon side is small),
then refine with an exact vectorized kernel.

Physical notes (these made a 3-5× difference, verified by
``.explain("formatted")``):

- The cell cover is generated **JVM-side** with
  ``explode(sequence(ix0, ix1)) × explode(sequence(iy0, iy1))`` from
  bbox bounds columns, staying inside whole-stage codegen.  When a
  layer doesn't carry bounds columns, a single Arrow-batch UDF extracts
  them; it is marked ``asNondeterministic`` so CollapseProject cannot
  clone the Python call per referencing expression (otherwise each
  struct-field access re-runs the UDF — observed in plans).
- Candidate-pair *dedup* (a pair meets in many cells — the reference
  dedups with ``set(...ravel())``, /root/reference/maup/indexed_geometries.py:26-27)
  uses the **reference-point rule**, not a shuffle: a pair is kept only
  in the cell containing the lower-left corner of its bbox overlap.
  That corner lies in both covers whenever the bboxes intersect, so
  exactly one copy survives — a codegen'd filter on the join output,
  no ``dropDuplicates`` exchange of geometry payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..geom import vector as V
from ..index.cells import CellGrid

DEFAULT_GRID = CellGrid(res=7)  # 128×128 world cells (2.8125° × 1.40625°)

BOUNDS = ("xmin", "ymin", "xmax", "ymax")


def point_cell_col(grid: CellGrid, x: str = "lon", y: str = "lat") -> Column:
    """Cell id of a point as a built-in (codegen'd) expression — no UDF."""
    return _cell_of(grid, F.col(x), F.col(y)).alias("cell_id")


def _cell_of(grid: CellGrid, x: Column, y: Column) -> Column:
    return _iy_of(grid, y) * F.lit(grid.n) + _ix_of(grid, x)


def _ix_of(grid: CellGrid, x: Column) -> Column:
    ix = F.floor((x - F.lit(grid.x0)) / F.lit(grid.wx)).cast("long")
    return F.greatest(F.lit(0), F.least(ix, F.lit(grid.n - 1)))


def _iy_of(grid: CellGrid, y: Column) -> Column:
    iy = F.floor((y - F.lit(grid.y0)) / F.lit(grid.wy)).cast("long")
    return F.greatest(F.lit(0), F.least(iy, F.lit(grid.n - 1)))


def _bounds_udf():
    def batch(wkbs):
        return V.batch_bounds(wkbs)

    return F.pandas_udf(
        batch, "xmin double, ymin double, xmax double, ymax double"
    ).asNondeterministic()


def with_bounds(
    df: DataFrame, geom_col: str = "geometry", prefix: str = "__b_"
) -> DataFrame:
    """Attach bbox columns {prefix}xmin…ymax (one UDF evaluation)."""
    out = df.withColumn("__bstruct", _bounds_udf()(F.col(geom_col)))
    keep = [F.col(c) for c in df.columns] + [
        F.col(f"__bstruct.{b}").alias(f"{prefix}{b}") for b in BOUNDS
    ]
    return out.select(*keep)


def with_cell_cover(
    df: DataFrame,
    grid: CellGrid,
    geom_col: str = "geometry",
    dilate: int = 0,
    bounds_prefix: str = "__b_",
    bounds_cols: tuple[str, str, str, str] | None = None,
) -> DataFrame:
    """Explode each geometry to the cells its bbox touches (+``dilate``
    cells each side).  Adds ``cell_id`` plus bbox columns
    ``{bounds_prefix}xmin…ymax``.

    The explode itself is pure JVM ``sequence``; Python only runs (once)
    if the layer has no bounds columns.
    """
    if bounds_cols is not None:
        ren = df
        for b, c in zip(BOUNDS, bounds_cols):
            ren = ren.withColumn(f"{bounds_prefix}{b}", F.col(c))
        df = ren
    else:
        df = with_bounds(df, geom_col, bounds_prefix)
    xmin, ymin, xmax, ymax = (F.col(f"{bounds_prefix}{b}") for b in BOUNDS)
    d = F.lit(float(dilate))
    ix0 = _ix_of(grid, xmin - d * F.lit(grid.wx))
    ix1 = _ix_of(grid, xmax + d * F.lit(grid.wx))
    iy0 = _iy_of(grid, ymin - d * F.lit(grid.wy))
    iy1 = _iy_of(grid, ymax + d * F.lit(grid.wy))
    return (
        df.withColumn("__cix", F.explode(F.sequence(ix0, ix1)))
        .withColumn("__ciy", F.explode(F.sequence(iy0, iy1)))
        .withColumn("cell_id", F.col("__ciy") * F.lit(grid.n) + F.col("__cix"))
        .drop("__cix", "__ciy")
    )


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
    source_bounds: tuple[str, str, str, str] | None = None,
    target_bounds: tuple[str, str, str, str] | None = None,
) -> DataFrame:
    """Cell-join candidate (source, target) pairs — exactly one row per
    pair via the reference-point rule (module docstring), no shuffle.

    Column name collisions between the two sides must be resolved by the
    caller (alias geometry columns before calling).
    """
    s = with_cell_cover(
        sources, grid, source_geom, bounds_prefix="__s_", bounds_cols=source_bounds
    )
    t = with_cell_cover(
        targets, grid, target_geom, bounds_prefix="__t_", bounds_cols=target_bounds
    )
    if broadcast_targets:
        t = F.broadcast(t)
    joined = s.join(t, "cell_id")
    ref_cell = _cell_of(
        grid,
        F.greatest("__s_xmin", "__t_xmin"),
        F.greatest("__s_ymin", "__t_ymin"),
    )
    joined = joined.filter(ref_cell == F.col("cell_id"))
    drop = ["cell_id"] + [f"{p}{b}" for p in ("__s_", "__t_") for b in BOUNDS]
    return joined.drop(*drop)
