"""Reference warning contracts + per-geometry holes() + WKB error path."""

import struct
import warnings

import pytest

import maup_spark as M
from maup_spark.geom.base import Geometry
from maup_spark import CellGrid
from tests.conftest import sq_wkb

GRID = CellGrid(x0=-10, y0=-10, x1=10, y1=10, res=4)


def test_adjacency_stats_warns_overlaps_and_islands(spark):
    rows = [
        (0, sq_wkb(0, 0, 1.2, 1.2)),   # overlaps 1
        (1, sq_wkb(1, 0, 2, 1)),
        (2, sq_wkb(5, 5, 6, 6)),       # island
    ]
    df = spark.createDataFrame(rows, "id bigint, geometry binary")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        stats = M.adjacency_stats(df, id_col="id", grid=GRID)
    cats = {x.category for x in w}
    assert M.OverlapWarning in cats and M.IslandWarning in cats
    assert stats["n_overlaps"] == 1 and stats["n_islands"] == 1
    assert stats["n_pairs"] == 1


def test_assign_warn_unassigned(spark):
    src = spark.createDataFrame(
        [(0, sq_wkb(0, 0, 1, 1)), (1, sq_wkb(8, 8, 9, 9))],
        "source_id bigint, geometry binary",
    )
    tgt = spark.createDataFrame(
        [(7, sq_wkb(-1, -1, 2, 2))], "target_id bigint, geometry binary"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = M.assign(src, tgt, grid=GRID, warn_unassigned=True)
        rows = {r["source_id"]: r["target_id"] for r in out.collect()}
    assert rows == {0: 7, 1: None}
    assert any(x.category is M.AssignmentWarning for x in w)


def test_crop_to_warns_zero_area(spark):
    src = spark.createDataFrame(
        [(0, sq_wkb(0, 0, 1, 1)), (1, sq_wkb(8, 8, 9, 9))],
        "id bigint, geometry binary",
    )
    tgt = spark.createDataFrame([(0, sq_wkb(-1, -1, 2, 2))], "id bigint, geometry binary")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        M.crop_to(src, tgt, id_col="id", grid=GRID, warn_zero_area=True).collect()
    assert any(x.category is M.AreaCroppingWarning for x in w)


def test_per_geometry_holes(spark):
    donut = Geometry(
        "Polygon",
        [
            Geometry.polygon([(0, 0), (4, 0), (4, 4), (0, 4)]).data[0],
            Geometry.polygon([(1, 1), (3, 1), (3, 3), (1, 3)]).data[0],
        ],
    )
    solid = Geometry.polygon([(10, 10), (11, 10), (11, 11), (10, 11)])
    df = spark.createDataFrame(
        [(0, donut.wkb), (1, solid.wkb)], "id bigint, geometry binary"
    )
    rows = M.holes(df, id_col="id").collect()
    assert len(rows) == 1
    assert rows[0]["id"] == 0 and abs(rows[0]["area"] - 4.0) < 1e-12


def test_holes_raises_for_non_polygon(spark):
    from maup_spark.geom import wkb as W

    pt = W.dumps_point((1.0, 2.0))
    df = spark.createDataFrame([(0, pt)], "id bigint, geometry binary")
    with pytest.raises(Exception) as ei:
        M.holes(df, id_col="id").collect()
    assert "polygonal" in str(ei.value)


def test_malformed_wkb_clear_error():
    bad = b"\x01" + struct.pack("<I", 3)  # polygon header, no body
    with pytest.raises(ValueError, match="malformed WKB"):
        Geometry.from_wkb(bad)


def test_smart_repair_snap_precision_large_coords(spark):
    """Extent-relative snapping: the 1.2-overlap lattice shifted to 1e7
    magnitude still repairs overlap-free (raw 1e-9 arrangement snapping
    is below double resolution at that magnitude)."""
    from maup_spark.operators.adjacencies import count_overlaps

    OFF = 10_000_000.0
    rows = [
        (k, sq_wkb(OFF + k % 2, OFF + k // 2, OFF + k % 2 + 1.2, OFF + k // 2 + 1.2))
        for k in range(4)
    ]
    big_grid = CellGrid(x0=OFF - 10, y0=OFF - 10, x1=OFF + 10, y1=OFF + 10, res=4)
    df = spark.createDataFrame(rows, "id bigint, geometry binary")
    rep = M.smart_repair(df, id_col="id", grid=big_grid)
    out = rep.collect()
    assert len(out) == 4
    rep_df = spark.createDataFrame(out, "id bigint, geometry binary")
    assert count_overlaps(rep_df, id_col="id", grid=big_grid) == 0
