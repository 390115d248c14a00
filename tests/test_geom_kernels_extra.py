"""§2.2 helper kernels: triangulation, in-polygon shortest path,
component counting, mutual containment, incenter."""

import math

import pytest

from maup_spark.geom.base import Geometry
from maup_spark.geom.kernels import (
    contain_each_other,
    incenter,
    num_components,
    segments,
    shortest_path_in_polygon,
    triangulate_polygon,
)


def poly(pts):
    return Geometry.polygon(pts)


L_SHAPE = poly([(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4)])


def test_num_components_and_segments():
    assert num_components(poly([(0, 0), (1, 0), (0, 1)])) == 1
    assert num_components(Geometry.empty()) == 0
    mp = Geometry(
        "MultiPolygon",
        [poly([(0, 0), (1, 0), (0, 1)]).data, poly([(5, 5), (6, 5), (5, 6)]).data],
    )
    assert num_components(mp) == 2
    segs = segments(poly([(0, 0), (2, 0), (2, 2), (0, 2)]))
    assert len(segs) == 4
    assert ((0.0, 0.0), (2.0, 0.0)) in segs


def test_contain_each_other():
    a = poly([(0, 0), (2, 0), (2, 2), (0, 2)])
    b = poly([(0, 0), (2, 0), (2, 2), (0, 2)])
    c = poly([(0, 0), (1, 0), (1, 1), (0, 1)])
    assert contain_each_other(a, b)
    assert not contain_each_other(a, c)


def test_incenter_equilateral_and_right():
    eq = poly([(0, 0), (2, 0), (1, math.sqrt(3))])
    ix, iy = incenter(eq)
    assert abs(ix - 1.0) < 1e-12 and abs(iy - 1 / math.sqrt(3)) < 1e-12
    with pytest.raises(TypeError):
        incenter(poly([(0, 0), (1, 0), (1, 1), (0, 1)]))


@pytest.mark.parametrize(
    "shape",
    [
        poly([(0, 0), (3, 0), (3, 3), (0, 3)]),
        L_SHAPE,
        poly([(0, 0), (4, 0), (4, 4), (2, 1.5), (0, 4)]),  # reflex "M"
        poly([(0, 0), (6, 0), (6, 1), (1, 1), (1, 2), (6, 2), (6, 3), (0, 3)]),  # comb
    ],
)
def test_triangulation_tiles_polygon(shape):
    tris = triangulate_polygon(shape)
    assert all(len(t.data[0]) == 4 for t in tris)
    assert abs(sum(abs(t.area) for t in tris) - abs(shape.area)) < 1e-9
    # pairwise interiors disjoint
    from maup_spark.geom.arrangement import intersection_area

    for i in range(len(tris)):
        for j in range(i + 1, len(tris)):
            assert intersection_area(tris[i], tris[j]) < 1e-12


def test_shortest_path_straight_and_around_corner():
    sq = poly([(0, 0), (3, 0), (3, 3), (0, 3)])
    assert shortest_path_in_polygon(sq, (0, 0), (3, 3)) == [(0, 0), (3, 3)]

    # L-shape: (4,0) -> (0,4) must route via the reflex corner (1,1)
    path = shortest_path_in_polygon(L_SHAPE, (4.0, 0.0), (0.0, 4.0))
    assert path == [(4.0, 0.0), (1.0, 1.0), (0.0, 4.0)]
    plen = sum(
        math.hypot(path[k + 1][0] - path[k][0], path[k + 1][1] - path[k][1])
        for k in range(len(path) - 1)
    )
    assert abs(plen - (math.hypot(3, 1) + math.hypot(1, 3))) < 1e-12

    with pytest.raises(TypeError):
        shortest_path_in_polygon(sq, (0.5, 0.5), (3, 3))
