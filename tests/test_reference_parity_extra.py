"""Additional reference-test ports.

- brute-force pairwise-intersection oracle (the reference's
  manually_compute_intersections idiom,
  /root/reference/tests/test_intersections.py:40-49,67-80);
- proration conservation (prorated == target areas,
  /root/reference/tests/test_prorate.py:18-24) and the trivial
  self-proration identity (:108-115);
- crop_to monotonicity (/root/reference/tests/test_repair.py:59-107).
"""

import random

import pytest
from pyspark.sql import functions as F

from maup_spark import CellGrid, Geometry, crop_to, intersections, normalize, prorate
from maup_spark.geom.arrangement import intersection_area
from tests.conftest import sq_wkb

GRID = CellGrid(x0=-10, y0=-10, x1=10, y1=10, res=4)


def _random_layer(seed, n, span=8.0):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        x0 = rng.uniform(0, span)
        y0 = rng.uniform(0, span)
        w = rng.uniform(0.5, 2.5)
        h = rng.uniform(0.5, 2.5)
        # jittered quadrilateral (not axis-aligned -> exercises the
        # arrangement kernel, not the rect fast path)
        j = lambda: rng.uniform(-0.2, 0.2)
        rows.append(
            (
                i,
                Geometry.polygon(
                    [
                        (x0 + j(), y0 + j()),
                        (x0 + w + j(), y0 + j()),
                        (x0 + w + j(), y0 + h + j()),
                        (x0 + j(), y0 + h + j()),
                    ]
                ),
            )
        )
    return rows


def test_intersections_vs_bruteforce(spark):
    """Distributed intersections == O(n²) driver-side double loop."""
    src_rows = _random_layer(7, 18)
    tgt_rows = _random_layer(11, 9)
    src = spark.createDataFrame(
        [(i, g.wkb) for i, g in src_rows], "sid bigint, geometry binary"
    )
    tgt = spark.createDataFrame(
        [(i, g.wkb) for i, g in tgt_rows], "tid bigint, geometry binary"
    )
    got = {
        (r["sid"], r["tid"]): r["area"]
        for r in intersections(
            src, tgt, source_id="sid", target_id="tid", grid=GRID
        ).collect()
    }
    want = {}
    for i, a in src_rows:
        for j, b in tgt_rows:
            g = a.intersection(b)
            if not g.is_empty:
                want[(i, j)] = g.area
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-7, k


def test_prorate_conserves_source_totals(spark, four_square_grid_df, inner_squares_df):
    """Normalized piece weights conserve each source's data exactly
    (the 1e-9 conservation budget of the north_star; exceeded here —
    decimal-free double math on 4 rows is exact to ~1e-15)."""
    pieces = intersections(
        inner_squares_df.select("id", "geometry"),
        four_square_grid_df.selectExpr("ID AS tid", "geometry"),
        source_id="id",
        target_id="tid",
        area_cutoff=0,
        grid=GRID,
    )
    weights = normalize(
        pieces.select("id", "tid", F.col("area").alias("weight")),
        level="id",
    )
    out = prorate(
        weights.select("id", "tid", "weight"),
        inner_squares_df.select("id", "data"),
        weights_col="weight",
        columns=["data"],
        source_id="id",
        target_id="tid",
    )
    total = out.agg(F.sum("data")).collect()[0][0]
    # every inner square is fully covered -> all 4 data units conserved
    assert abs(total - 4.0) < 1e-9


def test_self_proration_identity(spark, four_square_grid_df):
    """Prorating a layer onto itself with weight 1 is the identity
    (/root/reference/tests/test_prorate.py:108-115)."""
    grid_data = four_square_grid_df.selectExpr("ID AS tid").withColumn(
        "val", F.lit(2.5)
    )
    rel = grid_data.selectExpr("tid AS sid", "tid").withColumn("weight", F.lit(1.0))
    out = prorate(
        rel,
        grid_data.selectExpr("tid AS sid", "val"),
        weights_col="weight",
        columns=["val"],
        source_id="sid",
        target_id="tid",
    )
    assert {r["tid"]: r["val"] for r in out.collect()} == {
        "a": 2.5, "b": 2.5, "c": 2.5, "d": 2.5
    }


def test_crop_to_monotone(spark):
    """Cropped geometries never grow, and are no larger than the crop
    region (/root/reference/tests/test_repair.py:59-107 semantics)."""
    src_rows = _random_layer(3, 10, span=4.0)
    src = spark.createDataFrame(
        [(i, g.wkb) for i, g in src_rows], "id bigint, geometry binary"
    )
    window = spark.createDataFrame(
        [(0, sq_wkb(0, 0, 3, 3))], "id bigint, geometry binary"
    )
    cropped = {r["id"]: r["geometry"] for r in crop_to(src, window).collect()}
    win = Geometry.from_wkb(sq_wkb(0, 0, 3, 3))
    for i, g in src_rows:
        c = cropped[i]
        ca = Geometry.from_wkb(c).area if c is not None else 0.0
        assert ca <= g.area + 1e-9
        assert ca <= win.area + 1e-9
        assert abs(ca - intersection_area(g, win)) < 1e-7


def test_prorate_exact_values_top_left_square(spark, four_square_grid_df):
    """Exact-value port of /root/reference/tests/test_prorate.py:18-24:
    pieces weighted by area/source-area prorate source areas onto the
    square_mostly_in_top_left target, reproducing target.area exactly."""
    tgt = spark.createDataFrame(
        [("t", sq_wkb(0.5, 0.5, 1.5, 1.5))], "tid string, geometry binary"
    )
    src = four_square_grid_df.selectExpr("ID AS source_id", "geometry")
    pieces = intersections(
        src, tgt, source_id="source_id", target_id="tid",
        grid=GRID, area_cutoff=0,
    )
    # weight = piece area / source area (all sources are unit squares)
    rel = pieces.select("source_id", "tid", F.col("area").alias("weight"))
    data = src.selectExpr("source_id", "1.0 AS sarea")
    out = prorate(rel, data, weights_col="weight", columns=["sarea"],
                  source_id="source_id", target_id="tid")
    rows = out.collect()
    assert len(rows) == 1 and abs(rows[0]["sarea"] - 1.0) < 1e-12  # = target.area


def test_intersections_area_cutoff(spark, four_square_grid_df):
    """/root/reference/tests/test_intersections.py:56-58: a strict
    area cutoff drops degenerate (shared-edge) intersections."""
    src = four_square_grid_df.selectExpr("ID AS source_id", "geometry")
    tgt = four_square_grid_df.selectExpr("ID AS tid", "geometry")
    all_pairs = intersections(
        src, tgt, source_id="source_id", target_id="tid", grid=GRID
    )
    pos_pairs = intersections(
        src, tgt, source_id="source_id", target_id="tid", grid=GRID, area_cutoff=0
    )
    # self-join of the 2x2 grid: 4 self-overlaps (area 1) survive the
    # cutoff; shared edges / corner touches do not
    assert pos_pairs.count() == 4
    assert all_pairs.count() > pos_pairs.count()


def test_covers_diamond_bounds_not_covered(spark):
    """/root/reference/tests/test_indexed_geometries.py diamond case:
    a polygon inside the DIAMOND'S BBOX but outside the diamond must
    not be assigned to it (bbox containment is not coverage)."""
    from maup_spark import assign

    diamond = Geometry.polygon([(100, 0), (0, 100), (-100, 0), (0, -100)])
    inside_bounds = sq_wkb(90, 90, 91, 91)   # bbox yes, diamond no
    inside_real = sq_wkb(-1, -1, 1, 1)       # genuinely inside
    big = CellGrid(x0=-200, y0=-200, x1=200, y1=200, res=4)
    src = spark.createDataFrame(
        [(0, inside_bounds), (1, inside_real)], "source_id bigint, geometry binary"
    )
    tgt = spark.createDataFrame([(7, diamond.wkb)], "target_id bigint, geometry binary")
    rows = {r["source_id"]: r["target_id"] for r in assign(src, tgt, grid=big).collect()}
    assert rows == {0: None, 1: 7}
