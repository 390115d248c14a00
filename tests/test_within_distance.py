"""Range spatial join (within_distance): closed-form semantics, pair
uniqueness at any parallelism, and the sentinel path for oversized
targets.

Reference scope note: mggg/maup has no distance join; this is the
ST_DWithin-style operator of the graft's spatial surface, built on the
same candidate_pairs machinery as assign/intersections
(/root/reference/maup/indexed_geometries.py indexes for containment
queries only)."""

import math

from pyspark.sql import functions as F

from maup_spark.index.cells import CellGrid
from maup_spark.operators.spatial import within_distance


def _targets(spark, rows):
    return spark.createDataFrame(
        rows, "tid bigint, xmin double, ymin double, xmax double, ymax double"
    )


def _points(spark, rows):
    return spark.createDataFrame(rows, "pid bigint, lon double, lat double")


def test_within_distance_closed_form(spark):
    """Hand-checked distances: inside (0), edge-near, corner (diagonal),
    and out-of-range points against one unit box."""
    tgt = _targets(spark, [(1, 0.0, 0.0, 1.0, 1.0)])
    pts = _points(
        spark,
        [
            (10, 0.5, 0.5),   # inside -> 0
            (11, 1.5, 0.5),   # right edge -> 0.5
            (12, 2.0, 2.0),   # corner -> sqrt(2)
            (13, 5.0, 0.5),   # 4.0 away -> excluded at d=2
        ],
    )
    got = {
        r.pid: r.dist
        for r in within_distance(
            pts, tgt, 2.0, point_id="pid", target_id="tid",
            grid=CellGrid(res=5),
        ).collect()
    }
    assert set(got) == {10, 11, 12}
    assert got[10] == 0.0
    assert abs(got[11] - 0.5) < 1e-12
    assert abs(got[12] - math.sqrt(2.0)) < 1e-12


def test_pair_uniqueness_across_parallelism(spark):
    """A point whose dilated boxes overlap several targets yields exactly
    one row per qualifying pair, independent of partitioning."""
    tgt = _targets(
        spark,
        [(t, float(t), 0.0, float(t) + 1.0, 1.0) for t in range(8)],
    )
    pts = _points(spark, [(p, p * 0.9, 0.5) for p in range(20)])
    base = within_distance(
        pts, tgt, 1.5, point_id="pid", target_id="tid", grid=CellGrid(res=6)
    )
    rows = base.groupBy("pid", "tid").count().filter("count > 1").count()
    assert rows == 0
    n1 = base.count()
    n2 = within_distance(
        pts.repartition(7), tgt, 1.5, point_id="pid", target_id="tid",
        grid=CellGrid(res=6),
    ).count()
    assert n1 == n2 > 0


def test_oversized_target_sentinel_parity(spark):
    """A continent-sized target must produce the same pairs capped
    (sentinel path) and uncapped, without the fine-cover explosion."""
    tgt = _targets(
        spark,
        [(1, -170.0, -80.0, 170.0, 80.0), (2, 0.0, 0.0, 1.0, 1.0)],
    )
    pts = _points(spark, [(p, -175.0 + p * 17.0, -85.0 + p * 8.0) for p in range(21)])
    grid = CellGrid(res=9)
    kw = dict(point_id="pid", target_id="tid", grid=grid)
    capped = within_distance(pts, tgt, 4.0, max_cells=64, **kw)
    uncapped = within_distance(pts, tgt, 4.0, max_cells=None, **kw)
    a = sorted((r.pid, r.tid, round(r.dist, 9)) for r in capped.collect())
    b = sorted((r.pid, r.tid, round(r.dist, 9)) for r in uncapped.collect())
    assert a == b and len(a) > 0
