"""Adjacency + repair parity vs the reference's fixtures
(/root/reference/tests/test_adjacencies.py, tests/test_holes.py)."""

import pytest
from pyspark.sql import functions as F

from maup_spark import CellGrid, Geometry
from maup_spark.operators.adjacencies import adjacencies, count_overlaps, islands
from maup_spark.operators.repair import (
    close_gaps,
    crop_to,
    doctor,
    expand_to,
    holes_of_union,
    make_valid_df,
    quick_repair,
    remove_repeated_vertices,
    resolve_overlaps,
    snap_to_grid,
    union_all_df,
)
from tests.conftest import sq_wkb

GRID = CellGrid(x0=-10, y0=-10, x1=10, y1=10, res=4)


@pytest.fixture(scope="module")
def grid4_idx(spark):
    """four_square_grid with integer ids 0..3 = a,b,c,d (reference
    adjacency tests use positional ids)."""
    rows = [
        (0, sq_wkb(0, 0, 1, 1)),
        (1, sq_wkb(0, 1, 1, 2)),
        (2, sq_wkb(1, 0, 2, 1)),
        (3, sq_wkb(1, 1, 2, 2)),
    ]
    return spark.createDataFrame(rows, "id bigint, geometry binary")


def test_rook_adjacencies(spark, grid4_idx):
    adjs = adjacencies(grid4_idx, grid=GRID)
    pairs = {(r["id_i"], r["id_j"]) for r in adjs.collect()}
    # /root/reference/tests/test_adjacencies.py:9-11
    assert pairs == {(0, 1), (1, 3), (2, 3), (0, 2)}
    for r in adjs.collect():
        assert r["area"] == 0.0
        assert abs(r["length"] - 1.0) < 1e-12


def test_queen_adjacencies(spark, grid4_idx):
    adjs = adjacencies(grid4_idx, adjacency_type="queen", grid=GRID)
    pairs = {(r["id_i"], r["id_j"]) for r in adjs.collect()}
    # /root/reference/tests/test_adjacencies.py:13-15
    assert pairs == {(0, 1), (1, 3), (2, 3), (0, 2), (1, 2), (0, 3)}


def test_adjacencies_invalid_type(grid4_idx):
    with pytest.raises(ValueError):
        adjacencies(grid4_idx, adjacency_type="knight", grid=GRID)


def test_islands(spark, grid4_idx):
    sub = grid4_idx.filter(F.col("id").isin([0, 3]))  # a and d touch at corner
    adjs = adjacencies(sub, grid=GRID)  # rook: corner only -> no pairs
    isl = {r["id"] for r in islands(sub, adjs).collect()}
    assert isl == {0, 3}


def test_union_and_holes_pacman(spark):
    pac = Geometry.polygon(
        [(0, 0), (0, 3), (2, 3), (2, 2), (1, 2), (1, 1), (2, 1), (2, 0)]
    ).wkb
    df = spark.createDataFrame(
        [(0, pac), (1, sq_wkb(2, 0, 3, 3))], "id bigint, geometry binary"
    )
    u = union_all_df(df)
    assert abs(u.area - 8.0) < 1e-9
    gaps = holes_of_union(df)
    rows = gaps.collect()
    assert len(rows) == 1
    assert abs(rows[0]["area"] - 1.0) < 1e-12


def test_close_gaps_pacman(spark):
    """/root/reference/tests/test_holes.py:105-141: gap goes to pacman
    (max shared perimeter), bar unchanged; threshold variants."""
    pac = Geometry.polygon(
        [(0, 0), (0, 3), (2, 3), (2, 2), (1, 2), (1, 1), (2, 1), (2, 0)]
    ).wkb
    df = spark.createDataFrame(
        [(0, pac), (1, sq_wkb(2, 0, 3, 3))], "id bigint, geometry binary"
    )
    fixed = {r["id"]: Geometry.from_wkb(r["geometry"])
             for r in close_gaps(df, relative_threshold=None, grid=GRID).collect()}
    assert abs(fixed[0].area - 6.0) < 1e-9  # pacman + mouth
    assert fixed[0].bounds == (0.0, 0.0, 2.0, 3.0)
    assert abs(fixed[1].area - 3.0) < 1e-9  # bar unchanged

    # gap is 1/8 of pacman area -> 1% threshold leaves it open
    fixed2 = {r["id"]: Geometry.from_wkb(r["geometry"])
              for r in close_gaps(df, relative_threshold=0.01, grid=GRID).collect()}
    assert abs(fixed2[0].area - 5.0) < 1e-9
    # 50% threshold closes it
    fixed3 = {r["id"]: Geometry.from_wkb(r["geometry"])
              for r in close_gaps(df, relative_threshold=0.5, grid=GRID).collect()}
    assert abs(fixed3[0].area - 6.0) < 1e-9


def test_resolve_overlaps_max_shared_perimeter(spark):
    """/root/reference/tests/test_holes.py:179-196: 3-square + 2-square
    overlapping; overlap goes to the big square."""
    df = spark.createDataFrame(
        [(0, sq_wkb(0, 0, 3, 3)), (1, sq_wkb(2, 0, 4, 2))],
        "id bigint, geometry binary",
    )
    out = {r["id"]: Geometry.from_wkb(r["geometry"])
           for r in resolve_overlaps(df, relative_threshold=None, grid=GRID).collect()}
    assert abs(out[0].area - 9.0) < 1e-9
    assert out[0].bounds == (0.0, 0.0, 3.0, 3.0)
    assert abs(out[1].area - 2.0) < 1e-9
    assert out[1].bounds == (3.0, 0.0, 4.0, 2.0)
    # no overlaps remain
    spark_df = spark.createDataFrame(
        [(k, g.wkb) for k, g in out.items()], "id bigint, geometry binary"
    )
    assert count_overlaps(spark_df, grid=GRID) == 0


def test_resolve_overlaps_threshold(spark):
    df = spark.createDataFrame(
        [(0, sq_wkb(0, 0, 3, 3)), (1, sq_wkb(2, 0, 4, 2))],
        "id bigint, geometry binary",
    )
    # overlap area 2 vs areas 9/4: 2/9=0.22, 2/4=0.5 -> 0.0001 leaves both
    out = {r["id"]: Geometry.from_wkb(r["geometry"])
           for r in resolve_overlaps(df, relative_threshold=0.0001, grid=GRID).collect()}
    assert abs(out[0].area - 9.0) < 1e-9 and abs(out[1].area - 4.0) < 1e-9
    # 0.4: under for square1 (0.22) but not square2 (0.5) -> unchanged
    out2 = {r["id"]: Geometry.from_wkb(r["geometry"])
            for r in resolve_overlaps(df, relative_threshold=0.4, grid=GRID).collect()}
    assert abs(out2[0].area - 9.0) < 1e-9 and abs(out2[1].area - 4.0) < 1e-9


def test_quick_repair_grid(spark, grid4_idx):
    out = quick_repair(grid4_idx, grid=GRID)
    got = {r["id"]: Geometry.from_wkb(r["geometry"]) for r in out.collect()}
    for k, g in got.items():
        assert abs(g.area - 1.0) < 1e-9


def test_snap_and_dedup(spark):
    g = Geometry.polygon([(0, 0), (0, 0), (1.00000004, 0), (1, 1), (0, 1)]).wkb
    df = spark.createDataFrame([(0, g)], "id bigint, geometry binary")
    snapped = Geometry.from_wkb(snap_to_grid(df, n=-7).collect()[0]["geometry"])
    assert snapped.bounds[2] == 1.0
    deduped = Geometry.from_wkb(remove_repeated_vertices(df).collect()[0]["geometry"])
    assert len(deduped.data[0]) == 5  # closed ring of 4 distinct vertices


def test_crop_and_expand(spark, grid4_idx):
    big = spark.createDataFrame([(0, sq_wkb(0, 0, 2, 2))], "id bigint, geometry binary")
    # crop big square to left half (a+b)
    left = grid4_idx.filter(F.col("id").isin([0, 1]))
    cropped = Geometry.from_wkb(crop_to(big, left).collect()[0]["geometry"])
    assert abs(cropped.area - 2.0) < 1e-9
    # expand left half to the big square: each leftover square absorbed
    expanded = expand_to(left, big, grid=GRID)
    total = sum(
        Geometry.from_wkb(r["geometry"]).area for r in expanded.collect()
    )
    assert abs(total - 4.0) < 1e-9


def test_doctor(spark, grid4_idx):
    stats = doctor(grid4_idx, grid=GRID)
    assert stats["healthy"] is True
    assert stats["source_overlaps"] == 0
    assert stats["source_holes"] == 0

    # overlapping layer is unhealthy
    bad = spark.createDataFrame(
        [(0, sq_wkb(0, 0, 3, 3)), (1, sq_wkb(2, 0, 4, 2))],
        "id bigint, geometry binary",
    )
    stats2 = doctor(bad, grid=GRID)
    assert stats2["healthy"] is False and stats2["source_overlaps"] == 1

    # source vs target union equality
    big = spark.createDataFrame([(0, sq_wkb(0, 0, 2, 2))], "id bigint, geometry binary")
    stats3 = doctor(grid4_idx, big, grid=GRID)
    assert stats3["healthy"] is True
    assert abs(stats3["symmetric_difference_area"]) < 1e-12


def test_make_valid_bowtie_df(spark):
    import numpy as np

    bow = Geometry(
        "Polygon",
        [np.array([(0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0), (0.0, 0.0)])],
    ).wkb
    df = spark.createDataFrame([(0, bow)], "id bigint, geometry binary")
    fixed = Geometry.from_wkb(make_valid_df(df).collect()[0]["geometry"])
    assert abs(fixed.area - 2.0) < 1e-9
