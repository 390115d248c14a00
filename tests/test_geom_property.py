"""Property-based tests for the geometry kernel (hypothesis).

Invariants that hold for ANY pair of valid polygons:
  area(A∪B) = area(A) + area(B) − area(A∩B)   (inclusion–exclusion)
  area(A−B) = area(A) − area(A∩B)
  A covers A∩B pieces; WKB round-trips exactly.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from maup_spark.geom import (
    Geometry,
    difference,
    intersection,
    intersection_area,
    union_all,
)

# coordinates on a modest grid to exercise collinear/degenerate cases hard
coord = st.integers(min_value=0, max_value=12).map(float)


@st.composite
def rects(draw):
    x0, x1 = sorted((draw(coord), draw(coord)))
    y0, y1 = sorted((draw(coord), draw(coord)))
    if x0 == x1:
        x1 += 1
    if y0 == y1:
        y1 += 1
    return Geometry.polygon([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


@st.composite
def convex_polys(draw):
    pts = draw(
        st.lists(st.tuples(coord, coord), min_size=3, max_size=8, unique=True)
    )
    arr = np.array(pts, dtype=float)
    # convex hull via numpy (gift wrapping on few points)
    hull = _hull(arr)
    if len(hull) < 3:
        return Geometry.polygon([(0, 0), (4, 0), (0, 4)])
    g = Geometry.polygon(hull)
    if g.area <= 0:
        return Geometry.polygon([(0, 0), (4, 0), (0, 4)])
    return g


def _hull(points: np.ndarray):
    pts = sorted(map(tuple, points))
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


@settings(max_examples=60, deadline=None)
@given(rects(), rects())
def test_rect_pair_inclusion_exclusion(a, b):
    inter = intersection_area(a, b)
    u = union_all([a, b])
    assert abs(u.area - (a.area + b.area - inter)) < 1e-7
    d = difference(a, b)
    assert abs(d.area - (a.area - inter)) < 1e-7


@settings(max_examples=40, deadline=None)
@given(convex_polys(), convex_polys())
def test_convex_pair_inclusion_exclusion(a, b):
    inter = intersection_area(a, b)
    assert -1e-7 <= inter <= min(a.area, b.area) + 1e-7
    u = union_all([a, b])
    assert abs(u.area - (a.area + b.area - inter)) < 1e-7
    d = difference(a, b)
    assert abs(d.area - (a.area - inter)) < 1e-7


@settings(max_examples=40, deadline=None)
@given(convex_polys(), convex_polys())
def test_intersection_geometry_consistent(a, b):
    g = intersection(a, b)
    assert abs(g.area - intersection_area(a, b)) < 1e-7
    if g.area > 1e-6:
        # convex∩convex is convex: the vertex mean is strictly interior
        for rings in g.polygons():
            if abs(Geometry("Polygon", rings).area) < 1e-6:
                continue
            x = float(rings[0][:-1, 0].mean())
            y = float(rings[0][:-1, 1].mean())
            assert a.contains_point(x, y) and b.contains_point(x, y)


@settings(max_examples=40, deadline=None)
@given(convex_polys())
def test_wkb_roundtrip_property(g):
    g2 = Geometry.from_wkb(g.wkb)
    assert abs(g2.area - g.area) < 1e-12
    assert g2.bounds == g.bounds


@settings(max_examples=25, deadline=None)
@given(st.lists(rects(), min_size=1, max_size=5))
def test_union_monotone(polys):
    u = union_all(polys)
    total = sum(p.area for p in polys)
    assert u.area <= total + 1e-7
    assert u.area >= max(p.area for p in polys) - 1e-7
