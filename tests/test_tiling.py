"""Tiled reductions: union areas and stitched hole counting must equal
the exact answers without ever building a global union."""

import pytest

from maup_spark.operators.tiling import (
    count_holes_tiled,
    hole_components_tiled,
    overlay_areas_tiled,
    union_area_tiled,
)
from tests.conftest import sq_wkb


def frame_df(spark, x0, y0, x1, y1, hx0, hy0, hx1, hy1):
    """Square annulus: outer [x0,x1]×[y0,y1] minus hole [hx0,hx1]×[hy0,hy1],
    built from 4 rectangles (bottom/top bands + left/right middle)."""
    rows = [
        (0, sq_wkb(x0, y0, x1, hy0)),
        (1, sq_wkb(x0, hy1, x1, y1)),
        (2, sq_wkb(x0, hy0, hx0, hy1)),
        (3, sq_wkb(hx1, hy0, x1, hy1)),
    ]
    return spark.createDataFrame(rows, "id bigint, geometry binary")


def test_union_area_tiled_exact(spark):
    # overlapping pair: union area 1.2^2 + 1 - 0.2 = 2.24
    df = spark.createDataFrame(
        [(0, sq_wkb(0, 0, 1.2, 1.2)), (1, sq_wkb(1, 0, 2, 1))],
        "id bigint, geometry binary",
    )
    assert union_area_tiled(df, tile_res=2) == pytest.approx(2.24, abs=1e-9)


def test_overlay_areas_and_symdiff(spark):
    a = spark.createDataFrame([(0, sq_wkb(0, 0, 2, 2))], "id bigint, geometry binary")
    b = spark.createDataFrame([(0, sq_wkb(1, 0, 3, 2))], "id bigint, geometry binary")
    out = overlay_areas_tiled(a, b, tile_res=2)
    assert out["source"] == pytest.approx(4.0, abs=1e-9)
    assert out["target"] == pytest.approx(4.0, abs=1e-9)
    assert out["both"] == pytest.approx(2.0, abs=1e-9)  # strip [1,2]x[0,2]
    sym = out["source"] + out["target"] - 2 * out["both"]
    assert sym == pytest.approx(4.0, abs=1e-9)


def test_count_holes_tiled_multi_tile_hole(spark):
    # hole [4,6]^2 spans several res-2 tiles of the [0,10]^2 bbox
    df = frame_df(spark, 0, 0, 10, 10, 4, 4, 6, 6)
    assert count_holes_tiled(df, tile_res=2) == 1
    comps = hole_components_tiled(df, tile_res=2).collect()
    assert comps[0]["area"] == pytest.approx(4.0, abs=1e-9)
    assert comps[0]["n_pieces"] > 1  # genuinely stitched across tiles


def test_count_holes_tiled_hole_spanning_empty_tiles(spark):
    # hole [2,8]^2 (area 36) strictly contains whole res-3 tiles
    # (tile width 10/8 = 1.25): connectivity must survive geometry-free
    # tiles via the all-tiles enumeration
    df = frame_df(spark, 0, 0, 10, 10, 2, 2, 8, 8)
    comps = hole_components_tiled(df, tile_res=3).collect()
    assert len(comps) == 1
    assert comps[0]["area"] == pytest.approx(36.0, abs=1e-9)


def test_count_holes_tiled_no_holes_and_two_holes(spark):
    solid = spark.createDataFrame(
        [(0, sq_wkb(0, 0, 5, 5))], "id bigint, geometry binary"
    )
    assert count_holes_tiled(solid, tile_res=2) == 0

    # one frame with TWO separate holes: split the annulus middle band
    # with a divider wall between the holes
    rows = [
        (0, sq_wkb(0, 0, 10, 2)),
        (1, sq_wkb(0, 8, 10, 10)),
        (2, sq_wkb(0, 2, 1, 8)),
        (3, sq_wkb(9, 2, 10, 8)),
        (4, sq_wkb(4.5, 2, 5.5, 8)),  # divider
    ]
    df = spark.createDataFrame(rows, "id bigint, geometry binary")
    comps = sorted(r["area"] for r in hole_components_tiled(df, tile_res=2).collect())
    assert len(comps) == 2
    assert comps[0] == pytest.approx(3.5 * 6.0, abs=1e-9)
    assert comps[1] == pytest.approx(3.5 * 6.0, abs=1e-9)


def test_doctor_symmetric_difference_tiled(spark):
    from maup_spark.operators.repair import doctor

    src = spark.createDataFrame(
        [(0, sq_wkb(0, 0, 2, 2)), (1, sq_wkb(2, 0, 4, 2))],
        "id bigint, geometry binary",
    )
    same = spark.createDataFrame(
        [(9, sq_wkb(0, 0, 4, 2))], "id bigint, geometry binary"
    )
    stats = doctor(src, same, id_col="id")
    assert stats["symmetric_difference_area"] == pytest.approx(0.0, abs=1e-9)

    shifted = spark.createDataFrame(
        [(9, sq_wkb(1, 0, 5, 2))], "id bigint, geometry binary"
    )
    stats2 = doctor(src, shifted, id_col="id")
    assert stats2["symmetric_difference_area"] == pytest.approx(4.0, abs=1e-9)
    assert stats2["healthy"] is False


def test_holes_of_union_tiled_geometry_stitch(spark):
    """Stitched hole GEOMETRY: a hole spanning multiple tiles must come
    back as one polygon matching the tree-union path exactly."""
    from maup_spark.geom.base import Geometry
    from maup_spark.operators.repair import holes_of_union
    from maup_spark.operators.tiling import holes_of_union_tiled

    # [0,10]² annulus with hole [3,7]² — the hole crosses tile lines at
    # res=2 (tiles of 2.5); bands overlap 2-D at the corners
    rows = [
        (0, sq_wkb(0, 0, 10, 3)),
        (1, sq_wkb(0, 7, 10, 10)),
        (2, sq_wkb(0, 2, 3, 8)),
        (3, sq_wkb(7, 2, 10, 8)),
    ]
    df = spark.createDataFrame(rows, "id bigint, geometry binary")
    tiled = holes_of_union_tiled(df, tile_res=2).collect()
    assert len(tiled) == 1
    g = Geometry.from_wkb(tiled[0]["geometry"])
    assert tiled[0]["area"] == pytest.approx(16.0, abs=1e-7)
    assert g.area == pytest.approx(16.0, abs=1e-7)
    x0, y0, x1, y1 = g.bounds
    assert (x0, y0, x1, y1) == pytest.approx((3, 3, 7, 7), abs=1e-7)

    tree = holes_of_union(df, method="tree").collect()
    assert len(tree) == 1
    assert tree[0]["area"] == pytest.approx(tiled[0]["area"], abs=1e-7)


def test_holes_of_union_tiled_island_fill(spark):
    """Reference semantics: a hole is the FULL ring disk — an island
    floating inside the gap is covered by the emitted hole polygon."""
    from maup_spark.geom.base import Geometry
    from maup_spark.operators.tiling import holes_of_union_tiled

    big = Geometry.polygon(
        [(0, 0), (6, 0), (6, 6), (0, 6)],
        holes=[[(1, 1), (1, 5), (5, 5), (5, 1)]],
    ).wkb
    island = sq_wkb(2, 2, 4, 4)
    df = spark.createDataFrame(
        [(0, big), (1, island)], "id bigint, geometry binary"
    )
    out = holes_of_union_tiled(df, tile_res=2).collect()
    assert len(out) == 1
    # full ring disk 4x4 = 16, NOT 16 - 4 (free space excludes the island)
    assert out[0]["area"] == pytest.approx(16.0, abs=1e-7)
