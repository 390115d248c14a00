"""smart_repair parity: the reference's toy-precinct fixture
(/root/reference/tests/test_smart_repair.py:12-41, random.seed(2023))
must come out doctor-healthy; region nesting must hold."""

import random

import pytest
from pyspark.sql import functions as F

from maup_spark import CellGrid, Geometry
from maup_spark.operators.repair import doctor
from maup_spark.operators.smart_repair import repair_items, smart_repair
from tests.conftest import sq_wkb

GRID = CellGrid(x0=-10, y0=-10, x1=10, y1=10, res=4)


def toy_precinct_polys():
    # verbatim construction of the reference fixture
    random.seed(2023)
    polys = []
    for i in range(4):
        for j in range(4):
            pts = (
                [(0.5 * i + 0.1 * k, 0.5 * j + (random.random() - 0.5) / 12) for k in range(6)]
                + [(0.5 * (i + 1) + (random.random() - 0.5) / 12, 0.5 * j + 0.1 * k) for k in range(1, 6)]
                + [(0.5 * (i + 1) - 0.1 * k, 0.5 * (j + 1) + (random.random() - 0.5) / 12) for k in range(1, 6)]
                + [(0.5 * i + (random.random() - 0.5) / 12, 0.5 * (j + 1) - 0.1 * k) for k in range(1, 5)]
            )
            polys.append(Geometry.polygon(pts))
    return polys


@pytest.fixture(scope="module")
def toy_precincts_df(spark):
    rows = [(k, g.wkb) for k, g in enumerate(toy_precinct_polys())]
    return spark.createDataFrame(rows, "id bigint, geometry binary")


def test_kernel_repairs_overlap_pair():
    a = Geometry.polygon([(0, 0), (3, 0), (3, 3), (0, 3)])
    b = Geometry.polygon([(2, 0), (4, 0), (4, 2), (2, 2)])
    rep = repair_items([(0, a), (1, b)])
    assert abs(rep[0].area + rep[1].area - 11.0) < 1e-9  # footprint conserved
    from maup_spark.geom.arrangement import intersection_area

    assert intersection_area(rep[0], rep[1]) < 1e-12


def test_smart_repair_toy_precincts(spark, toy_precincts_df):
    """doctor(repaired) is True (/root/reference/tests/test_smart_repair.py:89-97)."""
    before = doctor(toy_precincts_df, grid=GRID)
    assert before["healthy"] is False  # fixture is intentionally dirty

    repaired = smart_repair(toy_precincts_df, grid=GRID)
    rows = repaired.collect()
    assert len(rows) == 16
    rep_df = spark.createDataFrame(rows, "id bigint, geometry binary")
    after = doctor(rep_df, grid=GRID)
    assert after["source_overlaps"] == 0
    assert after["source_holes"] == 0
    assert after["healthy"] is True

    # footprint accounting: repaired union = original union + filled gaps
    from maup_spark.operators.repair import holes_of_union, union_all_df

    a0 = union_all_df(toy_precincts_df).area
    gap_area = sum(
        r["area"] for r in holes_of_union(toy_precincts_df).collect()
    )
    a1 = union_all_df(rep_df).area
    assert abs(a1 - (a0 + gap_area)) < 1e-6


def test_smart_repair_nest_within_regions(spark, toy_precincts_df):
    """Each repaired precinct stays inside its county
    (/root/reference/tests/test_smart_repair.py:99-109)."""
    counties = spark.createDataFrame(
        [
            (0, sq_wkb(0, 0, 1, 1)),
            (1, sq_wkb(1, 0, 2, 1)),
            (2, sq_wkb(0, 1, 1, 2)),
            (3, sq_wkb(1, 1, 2, 2)),
        ],
        "region_id bigint, geometry binary",
    )
    repaired = smart_repair(toy_precincts_df, regions=counties, grid=GRID)
    county_geoms = {
        r["region_id"]: Geometry.from_wkb(r["geometry"]) for r in counties.collect()
    }
    from maup_spark.geom.arrangement import intersection_area

    for r in repaired.collect():
        if r["geometry"] is None:
            continue
        g = Geometry.from_wkb(r["geometry"])
        covered = any(
            intersection_area(c, g) >= g.area - 1e-9 for c in county_geoms.values()
        )
        assert covered, f"precinct {r['id']} not nested in any county"


def test_building_blocks(spark):
    """Piece table: 3×3 square + overlapping 2×2 square -> exclusive
    pieces (deg 1), one overlap piece (deg 2)."""
    from maup_spark.operators.smart_repair import building_blocks

    df = spark.createDataFrame(
        [(0, sq_wkb(0, 0, 3, 3)), (1, sq_wkb(2, 0, 4, 2))],
        "id bigint, geometry binary",
    )
    pieces = building_blocks(df).collect()
    by_degree = {}
    for r in pieces:
        by_degree.setdefault(r["degree"], []).append(r)
    assert len(by_degree[2]) == 1
    assert abs(by_degree[2][0]["area"] - 2.0) < 1e-9
    assert set(by_degree[2][0]["owners"]) == {"0", "1"}
    assert abs(sum(r["area"] for r in by_degree[1]) - (7.0 + 2.0)) < 1e-9
    assert 0 not in by_degree  # no gaps in this layout


def test_building_blocks_with_gap(spark):
    from maup_spark.geom.base import Geometry
    from maup_spark.operators.smart_repair import building_blocks

    pac = Geometry.polygon(
        [(0, 0), (0, 3), (2, 3), (2, 2), (1, 2), (1, 1), (2, 1), (2, 0)]
    ).wkb
    df = spark.createDataFrame(
        [(0, pac), (1, sq_wkb(2, 0, 3, 3))], "id bigint, geometry binary"
    )
    pieces = building_blocks(df).collect()
    gaps = [r for r in pieces if r["degree"] == 0]
    assert len(gaps) == 1 and abs(gaps[0]["area"] - 1.0) < 1e-9


def test_reattach_fragments():
    """A tiny detached fragment moves to the neighbor sharing boundary."""
    from maup_spark.operators.smart_repair import reattach_fragments

    import numpy as np

    main = [np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])]
    # detached sliver of geometry 0, sitting on b's FAR side
    frag = [np.array([(2.0, 0.4), (2.001, 0.4), (2.001, 0.6), (2.0, 0.6), (2.0, 0.4)])]
    a = Geometry("MultiPolygon", [main, frag])
    b = Geometry.polygon([(1.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0)])
    out = reattach_fragments({0: a, 1: b}, disconnection_threshold=0.01)
    # the fragment (2e-4 < 1% of a's area) leaves 0 and joins b, whose
    # right edge it borders; a keeps exactly its main square
    assert abs(out[0].area - 1.0) < 1e-12
    assert out[0].gtype == "Polygon"
    assert abs(out[1].area - 1.0002) < 1e-9


def test_small_rook_to_queen(spark, toy_precincts_df):
    """/root/reference/tests/test_smart_repair.py:111-118: basic repair
    leaves sub-0.05 rook edges; min_rook_length=0.05 eliminates them."""
    from maup_spark.operators.adjacencies import adjacencies
    from maup_spark.operators.smart_repair import smart_repair

    basic = smart_repair(toy_precincts_df, grid=GRID)
    basic_df = spark.createDataFrame(basic.collect(), "id bigint, geometry binary")
    lens = [r["length"] for r in adjacencies(basic_df, grid=GRID).collect()]
    assert min(lens) < 0.05  # the jittered fixture produces short edges

    srtq = smart_repair(toy_precincts_df, min_rook_length=0.05, grid=GRID)
    srtq_df = spark.createDataFrame(srtq.collect(), "id bigint, geometry binary")
    lens2 = [r["length"] for r in adjacencies(srtq_df, grid=GRID).collect()]
    assert min(lens2) > 0.05, f"min rook length still {min(lens2)}"
    # still a clean partition
    after = doctor(srtq_df, grid=GRID)
    assert after["source_overlaps"] == 0


def test_connected_components_operator(spark):
    from maup_spark.operators.components import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "node bigint")
    # two chains {0-1-2-3}, {5-6-7}; 4 isolated
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6), (6, 7)], "src bigint, dst bigint"
    )
    comp = {r["node"]: r["comp"] for r in connected_components(nodes, edges).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 5}


def test_smart_repair_two_clusters_parallel(spark):
    """VERDICT done-gate: a 2-cluster layer must repair as 2 independent
    groups (not one F.lit(0) task) and still come out clean."""
    from maup_spark.operators.adjacencies import adjacencies
    from maup_spark.operators.components import connected_components

    # cluster A: overlapping pair near origin; cluster B: overlapping pair
    # far away — no contact between clusters
    rows = [
        (0, sq_wkb(0, 0, 1.2, 1.2)),
        (1, sq_wkb(1, 0, 2, 1)),
        (10, sq_wkb(6, 6, 7.2, 7.2)),
        (11, sq_wkb(7, 6, 8, 7)),
    ]
    df = spark.createDataFrame(rows, "id bigint, geometry binary")

    pairs = adjacencies(df, id_col="id", adjacency_type="queen", grid=GRID).select(
        F.col("id_i").alias("src"), F.col("id_j").alias("dst")
    )
    comp = connected_components(df.select(F.col("id").alias("node")), pairs)
    groups = {r["comp"] for r in comp.collect()}
    assert groups == {0, 10}  # two independent repair tasks

    repaired = smart_repair(df, id_col="id", grid=GRID)
    out = repaired.collect()
    assert len(out) == 4
    rep_df = spark.createDataFrame(out, "id bigint, geometry binary")
    after = doctor(rep_df, grid=GRID, accept_holes=True)
    assert after["source_overlaps"] == 0
    # footprint conserved per cluster: union area 1.2^2 + 1x1 - strip
    from maup_spark.geom import vector as V

    areas = {
        r["id"]: r["a"]
        for r in rep_df.select(
            "id", F.pandas_udf(V.batch_area, "double")(F.col("geometry")).alias("a")
        ).collect()
    }
    assert abs(areas[0] + areas[1] - (1.2 * 1.2 + 1.0 - 0.2 * 1.0)) < 1e-9
    assert abs(areas[10] + areas[11] - (1.2 * 1.2 + 1.0 - 0.2 * 1.0)) < 1e-9


def test_triangle_gap_splits_at_incenter():
    """Reference parity (/root/reference/maup/smart_repair.py:1097-1113):
    a triangular gap touching 3 geometries splits into 3 triangles at
    the INCENTER, one per adjacent geometry."""
    import math

    # triangle gap (0,0)(4,0)(0,4); A borders the bottom leg, B the left
    # leg, C the hypotenuse; corners are 2D-covered (edge contacts, not
    # pinch points) so the triangle is a genuine hole of the union
    A = Geometry.polygon([(0, -1), (5, -1), (5, 0), (0, 0)])
    B = Geometry.polygon([(-1, -1), (0, -1), (0, 5), (-1, 5)])
    C = Geometry.polygon([(4, 0), (0, 4), (0, 5), (5, 5), (5, 0)])
    rep = repair_items([(0, A), (1, B), (2, C)], fill_gaps=True, fill_gaps_threshold=None)

    # incenter of right triangle with legs 4, 4, hyp 4*sqrt(2):
    a, b, c = 4 * math.sqrt(2), 4.0, 4.0  # sides opposite (0,0),(4,0),(0,4)
    s = a + b + c
    ix = (a * 0 + b * 4 + c * 0) / s
    iy = (a * 0 + b * 0 + c * 4) / s
    tri = lambda p, q: abs((q[0] - p[0]) * (iy - p[1]) - (q[1] - p[1]) * (ix - p[0])) / 2
    exp = {
        0: A.area + tri((0, 0), (4, 0)),   # bottom-leg sector
        1: B.area + tri((0, 4), (0, 0)),   # left-leg sector
        2: C.area + tri((4, 0), (0, 4)),   # hypotenuse sector
    }
    for k in range(3):
        # 1e-7: the arrangement snaps vertices to the 1e-9 grid, so the
        # incenter lands up to ~1e-9 off the closed form per coordinate
        assert abs(rep[k].area - exp[k]) < 1e-7, (k, rep[k].area, exp[k])
    # gap fully filled, nothing double-counted
    assert abs(sum(g.area for g in rep.values()) - (A.area + B.area + C.area + 8.0)) < 1e-9

    from maup_spark.geom.arrangement import intersection_area

    for i in range(3):
        for j in range(i + 1, 3):
            assert intersection_area(rep[i], rep[j]) < 1e-12


def test_two_neighbor_gap_is_shared_not_winner_takes_all():
    """A 2-neighbor rectangular gap splits between both neighbors via the
    centroid star split (each keeps the half bounded by its own arc)."""
    # gap [0,2]x[0,1]; top/bot bands extend past the corners so the gap
    # is fully enclosed (no pinch corners)
    L = Geometry.polygon([(-1, 0), (0, 0), (0, 1), (-1, 1)])
    R = Geometry.polygon([(2, 0), (3, 0), (3, 1), (2, 1)])
    top = Geometry.polygon([(-1, 1), (3, 1), (3, 2), (-1, 2)])
    bot = Geometry.polygon([(-1, -1), (3, -1), (3, 0), (-1, 0)])
    rep = repair_items(
        [(0, L), (1, R), (2, top), (3, bot)], fill_gaps=True, fill_gaps_threshold=None
    )
    total_before = L.area + R.area + top.area + bot.area
    assert abs(sum(g.area for g in rep.values()) - (total_before + 2.0)) < 1e-9
    # every neighbor with positive shared arc gains a sector: nobody
    # swallows the whole 2.0 gap
    gains = {k: rep[k].area for k in rep}
    assert gains[0] - L.area > 1e-6 and gains[1] - R.area > 1e-6
    assert gains[2] - top.area > 1e-6 and gains[3] - bot.area > 1e-6
    assert all(g < 2.0 - 1e-6 for g in (gains[0] - L.area, gains[1] - R.area))


def test_non_star_gap_staged_subdivision():
    """Non-star bump gap: convexify -> closest-pair bridge -> incenter
    triangles (the reference's staged rules), verified against the
    sqrt-exact closed form (see q_smart_repair_bump_gap)."""
    import math

    from maup_spark.geom.base import Geometry
    from maup_spark.operators.smart_repair import split_hole_among_neighbors

    def rect(x0, y0, x1, y1):
        return Geometry.polygon([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])

    hole = Geometry.polygon(
        [(0, 0), (1, 0), (1.5, 2.5), (2, 0), (3, 0), (3, 3), (0, 3)]
    )
    neighbors = {
        0: rect(-1, -1, 0, 4),  # A left
        1: Geometry.polygon(  # B bottom with the bump
            [(0, -1), (3, -1), (3, 0), (2, 0), (1.5, 2.5), (1, 0), (0, 0)]
        ),
        2: rect(0, 3, 4, 4),  # D top
        3: rect(3, -1, 4, 3),  # E right
    }
    split = split_hole_among_neighbors(hole, neighbors)
    assert split is not None

    s = 3 + math.sqrt(8.5) + math.sqrt(2.5)
    ix, iy = 4.5 / s, (7.5 + 3 * math.sqrt(8.5)) / s
    sec_b = 0.5 * abs(1.5 * iy - 2.5 * ix)
    sec_d = 0.5 * abs(1.5 * (3 - iy) - 0.5 * ix)
    expect = {
        0: 1.5 * ix,
        1: 2.5 + 2 * sec_b,
        2: 0.75 + 2 * sec_d,
        3: 1.5 * ix,
    }
    assert set(split) == set(expect)
    for k, v in expect.items():
        assert abs(split[k].area - v) < 1e-7, k
    assert abs(sum(g.area for g in split.values()) - hole.area) < 1e-9
