"""Raster↔vector reconciliation (north_star coverage checks)."""

from maup_spark import CellGrid
from maup_spark.operators.raster import rasterize_coverage, reconcile
from tests.conftest import sq_wkb

GRID = CellGrid(x0=0, y0=0, x1=8, y1=8, res=3)  # 8×8 unit cells


def test_rasterize_clean_grid(spark, grid4_layer=None):
    rows = [
        (0, sq_wkb(0, 0, 1, 1), 0.0, 0.0, 1.0, 1.0),
        (1, sq_wkb(1, 0, 2, 1), 1.0, 0.0, 2.0, 1.0),
        (2, sq_wkb(0, 1, 1, 2), 0.0, 1.0, 1.0, 2.0),
        (3, sq_wkb(1, 1, 2, 2), 1.0, 1.0, 2.0, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, geometry binary, x0 double, y0 double, x1 double, y1 double"
    )
    stats = reconcile(
        df, grid=GRID, bounds_cols=("x0", "y0", "x1", "y1"), geoms_are_rects=True
    )
    assert stats["overlap_cells"] == 0
    assert stats["vector_raster_mismatches"] == 0
    per_cell = {r["cell_id"]: r["coverage"] for r in stats["per_cell"].collect()}
    assert all(abs(v - 1.0) < 1e-12 for v in per_cell.values())
    assert len(per_cell) == 4


def test_rasterize_detects_overlap_and_general_geoms(spark):
    # overlapping 3-square and 2-square, general (non-bounds) path
    rows = [(0, sq_wkb(0, 0, 3, 3)), (1, sq_wkb(2, 0, 4, 2))]
    df = spark.createDataFrame(rows, "id bigint, geometry binary")
    stats = reconcile(df, grid=GRID)
    assert stats["overlap_cells"] == 2  # cells (2,0) and (2,1) double-covered
    assert stats["vector_raster_mismatches"] == 0
    per_geom = {r["id"]: r["raster_area"] for r in stats["per_geom"].collect()}
    assert abs(per_geom[0] - 9.0) < 1e-9
    assert abs(per_geom[1] - 4.0) < 1e-9
