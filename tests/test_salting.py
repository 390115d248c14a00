"""Skew handling: hot-cell detection + two-level salted join must give
identical results to the broadcast path."""

from pyspark.sql import functions as F

from maup_spark import CellGrid
from maup_spark.operators.intersections import intersections
from maup_spark.operators.spatial import hot_cells, point_cell_col, salted_join
from tests.conftest import sq_wkb

GRID = CellGrid(x0=-10, y0=-10, x1=10, y1=10, res=4)


def test_hot_cell_detection(spark):
    # 1000 rows in one cell, 1 row each in 20 others
    rows = [(i, 0) for i in range(1000)] + [(1000 + c, c) for c in range(1, 21)]
    df = spark.createDataFrame(rows, "id bigint, cell_id bigint")
    hs = hot_cells(df)
    assert 0 in hs and hs[0] > 1
    assert all(c not in hs for c in range(1, 21))


def test_salted_join_matches_plain(spark):
    rows = [(i, i % 3) for i in range(300)]
    big = spark.createDataFrame(rows, "id bigint, cell_id bigint")
    small = spark.createDataFrame(
        [(10, 0), (11, 0), (12, 1), (13, 2)], "tid bigint, cell_id bigint"
    )
    plain = {(r["id"], r["tid"]) for r in big.join(small, "cell_id").collect()}
    salted = {
        (r["id"], r["tid"])
        for r in salted_join(big, small, {0: 4, 1: 2}).collect()
    }
    assert plain == salted


def test_intersections_shuffle_path_matches_broadcast(spark, four_square_grid_df, inner_squares_df):
    src = inner_squares_df.select("id", "geometry")
    tgt = four_square_grid_df.selectExpr("ID AS tid", "geometry")
    kw = dict(source_id="id", target_id="tid", grid=GRID)
    bc = intersections(src, tgt, broadcast_targets=True, **kw)
    sh = intersections(src, tgt, broadcast_targets=False, **kw)
    key = lambda r: (r["id"], r["tid"], round(r["area"], 9))
    assert sorted(map(key, bc.collect())) == sorted(map(key, sh.collect()))


def test_intersections_shuffle_path_forced_hot_cell(spark):
    """VERDICT gate: non-broadcast refine under a FORCED hot cell — 300
    source rects piled into one grid cell (a dense urban tile) must give
    byte-identical pairs to the broadcast path, through the salted join."""
    # all sources inside cell around (0.3, 0.3); a few elsewhere
    rows = [
        (i, sq_wkb(0.30 + (i % 10) * 0.001, 0.30 + (i // 10) * 0.001,
                   0.35 + (i % 10) * 0.001, 0.35 + (i // 10) * 0.001))
        for i in range(300)
    ] + [(1000 + k, sq_wkb(-8 + k, -8, -7.5 + k, -7.5)) for k in range(5)]
    src = spark.createDataFrame(rows, "id bigint, geometry binary")
    tgt = spark.createDataFrame(
        [(0, sq_wkb(0, 0, 1, 1)), (1, sq_wkb(0.33, 0.33, 0.66, 0.66)),
         (2, sq_wkb(-9, -9, 0, 0))],
        "tid bigint, geometry binary",
    )
    kw = dict(source_id="id", target_id="tid", grid=GRID)
    bc = intersections(src, tgt, broadcast_targets=True, **kw)
    sh = intersections(src, tgt, broadcast_targets=False, **kw)
    key = lambda r: (r["id"], r["tid"], round(r["area"], 12))
    a, b = sorted(map(key, bc.collect())), sorted(map(key, sh.collect()))
    assert a == b
    assert len(a) > 300  # the hot cell really fanned out


def test_adjacencies_shuffle_path_matches_broadcast(spark):
    from maup_spark.operators.adjacencies import adjacencies

    rows = [(k, sq_wkb(k % 5, k // 5, k % 5 + 1.2, k // 5 + 1.2)) for k in range(25)]
    df = spark.createDataFrame(rows, "id bigint, geometry binary")
    kw = dict(id_col="id", adjacency_type="queen", grid=GRID)
    bc = adjacencies(df, broadcast=True, broadcast_geoms=True, **kw)
    sh = adjacencies(df, broadcast=False, broadcast_geoms=False, **kw)
    key = lambda r: (r["id_i"], r["id_j"], round(r["area"], 12), round(r["length"], 12))
    assert sorted(map(key, bc.collect())) == sorted(map(key, sh.collect()))


def test_assign_shuffle_path_matches_broadcast(spark, four_square_grid_df, inner_squares_df):
    from maup_spark.operators.assign import assign

    src = inner_squares_df.select(F.col("id").alias("source_id"), "geometry")
    tgt = four_square_grid_df.selectExpr("ID AS target_id", "geometry")
    kw = dict(source_id="source_id", target_id="target_id", grid=GRID)
    a = {(r["source_id"], r["target_id"]) for r in assign(src, tgt, broadcast_targets=True, **kw).collect()}
    b = {(r["source_id"], r["target_id"]) for r in assign(src, tgt, broadcast_targets=False, **kw).collect()}
    assert a == b and len(a) > 0


def test_assign_points_shuffle_path_matches_broadcast(spark):
    from maup_spark.geom.base import Geometry
    from maup_spark.operators.assign import assign_points

    # non-rect targets: two triangles + points inside/outside
    t1 = Geometry.polygon([(0, 0), (4, 0), (0, 4)])
    t2 = Geometry.polygon([(5, 5), (9, 5), (5, 9)])
    tgt = spark.createDataFrame(
        [(0, t1.wkb), (1, t2.wkb)], "district_id bigint, geometry binary"
    )
    pts = spark.createDataFrame(
        [(0, 1.0, 1.0), (1, 6.0, 5.5), (2, 3.9, 3.9), (3, -5.0, -5.0)],
        "entity_id bigint, lon double, lat double",
    )
    kw = dict(point_id="entity_id", grid=GRID)
    a = {(r["entity_id"], r["district_id"])
         for r in assign_points(pts, tgt, broadcast_targets=True, **kw).collect()}
    b = {(r["entity_id"], r["district_id"])
         for r in assign_points(pts, tgt, broadcast_targets=False, **kw).collect()}
    assert a == b
    assert a == {(0, 0), (1, 1), (2, None), (3, None)}


def test_general_intersections_shuffle_path_triangles(spark):
    """Arrangement kernel + non-broadcast refine combined: triangles x
    rects through the general overlay must be identical on both join
    paths."""
    from maup_spark.geom.base import Geometry

    pts = [(-3.0, -2.0), (0.25, 0.5), (2.0, 1.75), (-1.5, 3.0), (4.0, -4.0)]
    tris = [
        (i, Geometry.polygon([(x, y), (x + 2.5, y), (x, y + 2.5)]).wkb)
        for i, (x, y) in enumerate(pts)
    ]
    src = spark.createDataFrame(tris, "id bigint, geometry binary")
    cells = [
        (j, sq_wkb(cx, cy, cx + 2, cy + 2))
        for j, (cx, cy) in enumerate(
            (x, y) for x in (-4, -2, 0, 2, 4) for y in (-4, -2, 0, 2, 4)
        )
    ]
    tgt = spark.createDataFrame(cells, "tid bigint, geometry binary")
    kw = dict(source_id="id", target_id="tid", grid=GRID, area_cutoff=0.0)
    a = intersections(src, tgt, broadcast_targets=True, **kw)
    b = intersections(src, tgt, broadcast_targets=False, **kw)
    key = lambda r: (r["id"], r["tid"], round(r["area"], 12))
    ka, kb = sorted(map(key, a.collect())), sorted(map(key, b.collect()))
    assert ka == kb and len(ka) > 10


def test_adaptive_grid_bounds_hot_cells_across_scales(spark):
    """Density-adaptive resolution: a skewed layer (half the points in
    1% of the extent) keeps its max per-cell count bounded as the layer
    grows 8x, while the fixed world grid's hot cell grows linearly."""
    from pyspark.sql import functions as F

    from maup_spark.operators.spatial import (
        DEFAULT_GRID,
        adaptive_grid_for,
        point_cell_col,
    )

    def skewed(n):
        # half the rows in a ~1×1 city box, half over a ~10×5 country —
        # the realistic shape: the LAYER is tiny relative to the world,
        # so a fixed world grid sees it with a handful of coarse cells
        return spark.range(n).selectExpr(
            "CAST(CASE WHEN id % 2 = 0 THEN 10.0 + (id % 997) * 0.001 "
            "     ELSE 5.0 + (id % 3571) * 0.0028 END AS DOUBLE) AS lon",
            "CAST(CASE WHEN id % 2 = 0 THEN 45.0 + (id % 991) * 0.001 "
            "     ELSE 42.0 + (id % 1783) * 0.0028 END AS DOUBLE) AS lat",
        )

    def max_cell(df, grid):
        return (
            df.select(point_cell_col(grid, "lon", "lat"))
            .groupBy("cell_id")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )

    small, big = skewed(20_000), skewed(160_000)
    g_small = adaptive_grid_for(small, x_col="lon", y_col="lat")
    g_big = adaptive_grid_for(big, x_col="lon", y_col="lat")
    assert g_big.res > g_small.res  # resolution followed the row count

    m_small, m_big = max_cell(small, g_small), max_cell(big, g_big)
    # adaptive: hot-cell growth is sublinear (bounded by ~2x over an 8x
    # data growth here)
    assert m_big <= 4 * m_small
    # and at the big scale the adaptive grid's hot cell is a fraction of
    # the fixed world grid's — the 100 TB failure mode being designed out
    f_big = max_cell(big, DEFAULT_GRID)
    assert m_big * 2 <= f_big
