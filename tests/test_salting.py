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
