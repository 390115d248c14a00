"""Small geometry kernels completing §2.2 parity with the reference's
internal helpers (/root/reference/maup/smart_repair.py:504-521,
2268-2595).  All from scratch; ``shortest_path_in_polygon`` uses a
visibility-graph Dijkstra instead of the reference's triangulation
"sleeve"+funnel — same shortest path, simpler invariants.
"""

from __future__ import annotations

import math

from .base import Geometry


def num_components(geom: Geometry) -> int:
    """Connected components (reference :504-511)."""
    if geom.is_empty:
        return 0
    n = len(list(geom.polygons())) + len(list(geom.lines()))
    if geom.gtype == "Point":
        return 1
    if geom.gtype == "MultiPoint":
        return len(geom.data)
    return n


def segments(geom_or_ring) -> list:
    """Individual boundary segments as ((x0,y0),(x1,y1)) tuples
    (reference :514-516 returns LineStrings; tuples here — the engine
    has no LineString object type)."""
    if isinstance(geom_or_ring, Geometry):
        out = []
        for rings in geom_or_ring.polygons():
            for ring in rings:
                out.extend(segments(ring))
        for line in geom_or_ring.lines():
            out.extend(segments(line))
        return out
    ring = geom_or_ring
    return [
        (tuple(ring[i]), tuple(ring[i + 1]))
        for i in range(len(ring) - 1)
        if tuple(ring[i]) != tuple(ring[i + 1])
    ]


def contain_each_other(a: Geometry, b: Geometry) -> bool:
    """Mutual containment (measure equality; reference :519-521)."""
    return a.covers(b) and b.covers(a)


def incenter(tri: Geometry) -> tuple:
    """Incenter of a triangle (reference :2268-2310)."""
    rings = list(tri.polygons())
    if len(rings) != 1 or len(rings[0]) != 1 or len(rings[0][0]) != 4:
        raise TypeError("incenter: input must be a triangle")
    from ..operators.smart_repair import _incenter_pt

    return _incenter_pt([tuple(p) for p in rings[0][0][:-1]])


def _shoelace(pts) -> float:
    s = 0.0
    for k in range(len(pts)):
        x0, y0 = pts[k]
        x1, y1 = pts[(k + 1) % len(pts)]
        s += x0 * y1 - x1 * y0
    return 0.5 * s


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri_closed(p, a, b, c, eps=1e-12) -> bool:
    d1, d2, d3 = _cross(a, b, p), _cross(b, c, p), _cross(c, a, p)
    return (d1 >= -eps and d2 >= -eps and d3 >= -eps) or (
        d1 <= eps and d2 <= eps and d3 <= eps
    )


def triangulate_polygon(geom: Geometry) -> list[Geometry]:
    """Ear-clipping triangulation of a simple polygon (no holes) —
    reference :2312-2346.  Returns triangles whose areas sum exactly to
    the polygon area."""
    rings = list(geom.polygons())
    if len(rings) != 1 or len(rings[0]) != 1:
        raise TypeError("triangulate_polygon: simple polygon (no holes) required")
    pts = [tuple(p) for p in rings[0][0][:-1]]
    if _shoelace(pts) < 0:
        pts.reverse()
    idx = list(range(len(pts)))
    tris: list[Geometry] = []
    guard = 0
    while len(idx) > 3:
        guard += 1
        if guard > 10 * len(pts):
            raise ValueError("triangulate_polygon: no ear found (non-simple input?)")
        n = len(idx)
        clipped = False
        for i in range(n):
            ia, ib, ic = idx[i - 1], idx[i], idx[(i + 1) % n]
            a, b, c = pts[ia], pts[ib], pts[ic]
            turn = _cross(a, b, c)
            if abs(turn) <= 1e-15:  # collinear: drop the degenerate vertex
                idx.pop(i)
                clipped = True
                break
            if turn < 0:
                continue  # reflex
            if any(
                _point_in_tri_closed(pts[j], a, b, c)
                for j in idx
                if j not in (ia, ib, ic)
            ):
                continue
            tris.append(Geometry.polygon([a, b, c]))
            idx.pop(i)
            clipped = True
            break
        if not clipped:
            raise ValueError("triangulate_polygon: no ear found (non-simple input?)")
    if len(idx) == 3:
        tris.append(Geometry.polygon([pts[j] for j in idx]))
    return tris


def _visible(u, v, ring_pts, boundary_segs, geom: Geometry) -> bool:
    """Segment u-v stays inside the closed polygon: split it at every
    boundary crossing and require each sub-interval midpoint to be
    interior or on the boundary."""
    if u == v:
        return True
    dx, dy = v[0] - u[0], v[1] - u[1]
    params = {0.0, 1.0}
    for p, q in boundary_segs:
        ex, ey = q[0] - p[0], q[1] - p[1]
        denom = dx * ey - dy * ex
        rx, ry = p[0] - u[0], p[1] - u[1]
        if abs(denom) < 1e-15:
            if abs(rx * dy - ry * dx) > 1e-12:
                continue  # parallel, not collinear
            ll = dx * dx + dy * dy
            for w in (p, q):
                t = ((w[0] - u[0]) * dx + (w[1] - u[1]) * dy) / ll
                if 0 < t < 1:
                    params.add(t)
            continue
        t = (rx * ey - ry * ex) / denom
        s = (rx * dy - ry * dx) / denom
        if -1e-12 <= s <= 1 + 1e-12 and 1e-12 < t < 1 - 1e-12:
            params.add(t)
    for t0, t1 in zip(*(lambda ps: (ps[:-1], ps[1:]))(sorted(params))):
        tm = 0.5 * (t0 + t1)
        mx, my = u[0] + tm * dx, u[1] + tm * dy
        if not (geom.contains_point(mx, my) or geom._on_boundary(mx, my, 1e-9)):
            return False
    return True


def shortest_path_in_polygon(geom: Geometry, start: tuple, end: tuple) -> list:
    """Shortest path between two polygon VERTICES staying inside the
    polygon (reference :2348-2595's role).  Visibility-graph Dijkstra:
    nodes are polygon vertices, edges where the connecting segment lies
    in the closed polygon."""
    rings = list(geom.polygons())
    if len(rings) != 1 or len(rings[0]) != 1:
        raise TypeError("shortest_path_in_polygon: simple polygon required")
    pts = [tuple(p) for p in rings[0][0][:-1]]
    start, end = tuple(start), tuple(end)
    if start not in pts or end not in pts:
        raise TypeError(
            "shortest_path_in_polygon: start and end must be polygon vertices"
        )
    if start == end:
        return [start]
    segs = segments(rings[0][0])
    if _visible(start, end, pts, segs, geom):
        return [start, end]
    import heapq

    dist = {start: 0.0}
    prev: dict = {}
    heap = [(0.0, start)]
    done = set()
    while heap:
        d, u = heapq.heappop(heap)
        if u in done:
            continue
        done.add(u)
        if u == end:
            break
        for v in pts:
            if v in done or v == u:
                continue
            if not _visible(u, v, pts, segs, geom):
                continue
            nd = d + math.hypot(v[0] - u[0], v[1] - u[1])
            if nd < dist.get(v, math.inf) - 1e-15:
                dist[v] = nd
                prev[v] = u
                heapq.heappush(heap, (nd, v))
    if end not in prev and end != start:
        raise ValueError("shortest_path_in_polygon: no path found")
    path = [end]
    while path[-1] != start:
        path.append(prev[path[-1]])
    return path[::-1]
