"""Lightweight numpy-backed geometry object model.

From-scratch replacement for the shapely object surface the reference
leans on (area/length/bounds/intersection/difference/union/covers; see
e.g. /root/reference/maup/indexed_geometries.py:31-44 and
/root/reference/maup/repair.py:74-175).  Exact boolean operations are
implemented via a planar-arrangement overlay (``maup_spark.geom
.arrangement``), not ported GEOS code.

Only 2-D geometry is supported.  All shapes round-trip through WKB so
they can live in Spark ``binary`` columns.
"""

from __future__ import annotations

import math

import numpy as np

from . import wkb as _wkb

_EPS = 1e-12


def _close_ring(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


def signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of a closed ring (CCW positive).

    Rings with fewer than 8 cross terms take a scalar loop: numpy's sum
    is a plain sequential accumulation below 8 elements (pairwise
    blocking starts at 8), so the scalar path adds the SAME products in
    the SAME order — bit-identical — while skipping four array
    allocations per call.  Larger rings keep np.sum so the historical
    pairwise-summed values (hashed by the oracles) are unchanged."""
    n = len(ring) - 1
    if n < 8:
        pts = ring.tolist()
        s = 0.0
        for i in range(n):
            s += pts[i][0] * pts[i + 1][1] - pts[i + 1][0] * pts[i][1]
        return 0.5 * s
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def ring_length(ring: np.ndarray) -> float:
    d = np.diff(ring, axis=0)
    return float(np.sum(np.hypot(d[:, 0], d[:, 1])))


def point_in_ring(x: float, y: float, ring: np.ndarray) -> bool:
    """Even-odd crossing test against one closed ring.

    Small rings take a scalar-float loop (numpy's per-call overhead
    dominates below ~64 vertices); the expressions are the same IEEE
    double ops as the array path, so the boolean is identical."""
    n = len(ring) - 1
    if n <= 64:
        pts = ring.tolist()
        inside = False
        x = float(x)
        y = float(y)
        for i in range(n):
            xs, ys = pts[i]
            xe, ye = pts[i + 1]
            if (ys > y) != (ye > y):
                if x < xs + (y - ys) * (xe - xs) / (ye - ys):
                    inside = not inside
        return inside
    xs, ys = ring[:-1, 0], ring[:-1, 1]
    xe, ye = ring[1:, 0], ring[1:, 1]
    cond = (ys > y) != (ye > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = xs + (y - ys) * (xe - xs) / (ye - ys)
    return bool(np.count_nonzero(cond & (x < xint)) % 2)


def points_in_rings(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Vectorized even-odd test of many points vs a polygon's rings."""
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        xs, ys = ring[:-1, 0], ring[:-1, 1]
        xe, ye = ring[1:, 0], ring[1:, 1]
        dy = ye - ys
        keep = dy != 0
        xs, ys, xe, ye, dy = xs[keep], ys[keep], xe[keep], ye[keep], dy[keep]
        for i in range(len(px)):
            x, y = px[i], py[i]
            cond = (ys > y) != (ye > y)
            if not cond.any():
                continue
            xint = xs[cond] + (y - ys[cond]) * (xe[cond] - xs[cond]) / dy[cond]
            if np.count_nonzero(x < xint) % 2:
                inside[i] = not inside[i]
    return inside


class Geometry:
    """Immutable 2-D geometry. ``gtype`` mirrors shapely's geom_type names."""

    __slots__ = ("gtype", "data")

    def __init__(self, gtype: str, data):
        self.gtype = gtype
        self.data = data

    # ------------------------------------------------------------- builders
    @staticmethod
    def empty() -> "Geometry":
        return Geometry("GeometryCollection", [])

    @staticmethod
    def point(x, y) -> "Geometry":
        return Geometry("Point", np.array([x, y], dtype=np.float64))

    @staticmethod
    def linestring(coords) -> "Geometry":
        return Geometry("LineString", np.asarray(coords, dtype=np.float64))

    @staticmethod
    def polygon(shell, holes=()) -> "Geometry":
        rings = [_close_ring(shell)] + [_close_ring(h) for h in holes]
        return Geometry("Polygon", rings)

    @staticmethod
    def multipolygon(polys) -> "Geometry":
        """polys: iterable of ring-lists or of Polygon Geometry objects."""
        out = []
        for p in polys:
            if isinstance(p, Geometry):
                if p.gtype == "Polygon":
                    out.append(p.data)
                elif p.gtype == "MultiPolygon":
                    out.extend(p.data)
            else:
                out.append([_close_ring(r) for r in p])
        if len(out) == 1:
            return Geometry("Polygon", out[0])
        return Geometry("MultiPolygon", out)

    @staticmethod
    def multilinestring(lines) -> "Geometry":
        arrs = [np.asarray(l, dtype=np.float64) for l in lines]
        if len(arrs) == 1:
            return Geometry("LineString", arrs[0])
        return Geometry("MultiLineString", arrs)

    @staticmethod
    def collection(geoms) -> "Geometry":
        geoms = [g for g in geoms if not g.is_empty]
        if not geoms:
            return Geometry.empty()
        if len(geoms) == 1:
            return geoms[0]
        return Geometry("GeometryCollection", geoms)

    @staticmethod
    def from_wkb(buf: bytes) -> "Geometry":
        code, payload = _wkb.loads(buf)
        return Geometry._from_parsed(code, payload)

    @staticmethod
    def _from_parsed(code, payload) -> "Geometry":
        name = _wkb._TYPE_NAMES[code]
        if code == _wkb.WKB_GEOMETRYCOLLECTION:
            return Geometry(name, [Geometry._from_parsed(c, p) for c, p in payload])
        if code == _wkb.WKB_POLYGON:
            return Geometry(name, [_close_ring(r) for r in payload])
        if code == _wkb.WKB_MULTIPOLYGON:
            return Geometry(name, [[_close_ring(r) for r in rings] for rings in payload])
        return Geometry(name, payload)

    # ---------------------------------------------------------------- wkb
    @property
    def wkb(self) -> bytes:
        t = self.gtype
        if t == "Point":
            return _wkb.dumps_point(self.data)
        if t == "LineString":
            return _wkb.dumps_linestring(self.data)
        if t == "Polygon":
            return _wkb.dumps_polygon(self.data)
        if t == "MultiPoint":
            return _wkb.dumps_multipoint(self.data)
        if t == "MultiLineString":
            return _wkb.dumps_multilinestring(self.data)
        if t == "MultiPolygon":
            return _wkb.dumps_multipolygon(self.data)
        return _wkb.dumps_geometrycollection([g.wkb for g in self.data])

    # ------------------------------------------------------------ iterate
    def polygons(self):
        """Yield each polygonal part as a list of closed rings."""
        t = self.gtype
        if t == "Polygon":
            yield self.data
        elif t == "MultiPolygon":
            yield from self.data
        elif t == "GeometryCollection":
            for g in self.data:
                yield from g.polygons()

    def lines(self):
        t = self.gtype
        if t == "LineString":
            yield self.data
        elif t == "MultiLineString":
            yield from self.data
        elif t == "GeometryCollection":
            for g in self.data:
                yield from g.lines()

    def points(self):
        t = self.gtype
        if t == "Point":
            yield self.data
        elif t == "MultiPoint":
            yield from self.data
        elif t == "GeometryCollection":
            for g in self.data:
                yield from g.points()

    # ------------------------------------------------------------ measures
    @property
    def is_empty(self) -> bool:
        t = self.gtype
        if t in ("Point",):
            return self.data is None or len(self.data) == 0
        return len(self.data) == 0

    @property
    def area(self) -> float:
        total = 0.0
        for rings in self.polygons():
            total += abs(signed_area(rings[0]))
            for h in rings[1:]:
                total -= abs(signed_area(h))
        return total

    @property
    def length(self) -> float:
        total = 0.0
        for rings in self.polygons():
            for r in rings:
                total += ring_length(r)
        for line in self.lines():
            total += ring_length(line)
        return total

    @property
    def bounds(self):
        xs, ys = [], []
        for rings in self.polygons():
            for r in rings:
                xs.append((r[:, 0].min(), r[:, 0].max()))
                ys.append((r[:, 1].min(), r[:, 1].max()))
        for line in self.lines():
            xs.append((line[:, 0].min(), line[:, 0].max()))
            ys.append((line[:, 1].min(), line[:, 1].max()))
        for p in self.points():
            xs.append((p[0], p[0]))
            ys.append((p[1], p[1]))
        if not xs:
            return (math.nan,) * 4
        return (
            min(a for a, _ in xs),
            min(a for a, _ in ys),
            max(b for _, b in xs),
            max(b for _, b in ys),
        )

    @property
    def num_interior_rings(self) -> int:
        return sum(len(rings) - 1 for rings in self.polygons())

    # ---------------------------------------------------------- predicates
    def contains_point(self, x: float, y: float) -> bool:
        """Even-odd interior test over all polygonal parts (boundary excluded
        up to floating fuzz — callers use strictly-interior probe points)."""
        for rings in self.polygons():
            inside = False
            for ring in rings:
                if point_in_ring(x, y, ring):
                    inside = not inside
            if inside:
                return True
        return False

    def covers(self, other: "Geometry", eps: float = 1e-9) -> bool:
        """True if ``other`` lies within this geometry (area tolerance
        ``eps`` relative to other's area). Mirrors the prepared-``covers``
        refine of the reference (/root/reference/maup/indexed_geometries.py:36-44)
        via measure comparison: area(other ∩ self) == area(other)."""
        oa = other.area
        if oa <= _EPS:
            if other.gtype == "Point":
                x, y = other.data
                return self.contains_point(x, y) or self._on_boundary(x, y)
            return False
        sb, ob = self.bounds, other.bounds
        if ob[0] < sb[0] - eps or ob[1] < sb[1] - eps or ob[2] > sb[2] + eps or ob[3] > sb[3] + eps:
            return False
        from .arrangement import intersection_area

        # purely RELATIVE tolerance: an additive eps term would go
        # negative for areas < eps, making empty intersections "cover"
        # arbitrarily tiny slivers (disjoint-but-in-bbox false positives)
        return intersection_area(self, other) >= oa * (1.0 - 1e-9)

    def _on_boundary(self, x: float, y: float, eps: float = 1e-12) -> bool:
        for rings in self.polygons():
            for ring in rings:
                if _point_on_path(x, y, ring, eps):
                    return True
        for line in self.lines():
            if _point_on_path(x, y, line, eps):
                return True
        return False

    # ------------------------------------------------------------ booleans
    def intersection(self, other: "Geometry") -> "Geometry":
        from .arrangement import intersection as _ix

        return _ix(self, other)

    def union(self, other: "Geometry") -> "Geometry":
        from .arrangement import union_all as _ua

        return _ua([self, other])

    def difference(self, other: "Geometry") -> "Geometry":
        from .arrangement import difference as _diff

        return _diff(self, other)

    def buffer0(self) -> "Geometry":
        """make_valid-style cleanup: re-polygonize own boundary and keep
        interior faces (mirrors shapely ``make_valid`` usage at
        /root/reference/maup/repair.py:47-57)."""
        from .arrangement import make_valid as _mv

        return _mv(self)

    def __repr__(self):
        return f"<Geometry {self.gtype} area={self.area:.6g}>"


def _point_on_path(x: float, y: float, path: np.ndarray, eps: float) -> bool:
    xs, ys = path[:-1, 0], path[:-1, 1]
    xe, ye = path[1:, 0], path[1:, 1]
    dx, dy = xe - xs, ye - ys
    ln2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip(((x - xs) * dx + (y - ys) * dy) / np.where(ln2 == 0, 1, ln2), 0, 1)
    px, py = xs + t * dx, ys + t * dy
    return bool(np.any((px - x) ** 2 + (py - y) ** 2 <= eps))
