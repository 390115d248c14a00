"""Planar-arrangement overlay: the exact-geometry kernel of the engine.

One algorithm powers every boolean operation the reference gets from
GEOS (intersection/union/difference/make_valid, used at e.g.
/root/reference/maup/adjacencies.py:23, /root/reference/maup/repair.py:84,
:166-168, :266) *and* the node+polygonize machinery its smart_repair
stage uses (/root/reference/maup/smart_repair.py:523-748):

1. collect boundary segments of every input, tagged by input index;
2. snap coordinates, node all segments (split at crossings and at
   collinear-overlap endpoints);
3. trace boundary cycles of the noded planar graph (next edge =
   clockwise-most turn, so every bounded face is traced CCW once and
   each hole/outer boundary CW once);
4. classify the face left of each cycle by even-odd point-in-polygon of
   a sample point offset just inside the cycle's longest edge;
5. assemble the requested output from covered cycles / tagged edges.
   Face area identity used throughout: for any predicate P on faces,
   area(P) = Σ over cycles c of signed_area(c)·[P(face(c))], because a
   face's area is exactly the sum of its (one positive, k negative)
   boundary-cycle signed areas and every cycle bounds one face.

This runs per geometry pair (or per tile for n-ary unions) inside
vectorized pandas UDFs on executors — never on the driver for bulk data.
Inputs per call are small (district/precinct polygons, gap pieces), so
the bucketed noding cost is dominated by numpy, not Python.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from .base import Geometry, point_in_ring, signed_area

SNAP_DECIMALS = 9
_EPS = 1e-12


def _snap(v: float) -> float:
    return round(float(v), SNAP_DECIMALS)


def _segments_of(geom: Geometry, tag: int):
    """(p, q, tag) boundary segments (polygon rings + lines)."""
    out = []
    for rings in geom.polygons():
        for ring in rings:
            for i in range(len(ring) - 1):
                p = (_snap(ring[i, 0]), _snap(ring[i, 1]))
                q = (_snap(ring[i + 1, 0]), _snap(ring[i + 1, 1]))
                if p != q:
                    out.append((p, q, tag))
    for line in geom.lines():
        for i in range(len(line) - 1):
            p = (_snap(line[i, 0]), _snap(line[i, 1]))
            q = (_snap(line[i + 1, 0]), _snap(line[i + 1, 1]))
            if p != q:
                out.append((p, q, tag))
    return out


def _cross(ax, ay, bx, by):
    return ax * by - ay * bx


def _node(segments):
    """Split segments at every pairwise crossing / collinear overlap.

    Returns dict {(p, q) canonically ordered: set(tags)}.
    """
    n = len(segments)
    if not n:
        return {}
    cuts = [set() for _ in range(n)]
    allx0 = min(min(s[0][0], s[1][0]) for s in segments)
    allx1 = max(max(s[0][0], s[1][0]) for s in segments)
    ally0 = min(min(s[0][1], s[1][1]) for s in segments)
    ally1 = max(max(s[0][1], s[1][1]) for s in segments)
    span = max(allx1 - allx0, ally1 - ally0, 1e-9)
    cell = span / max(1, int(math.sqrt(n)))

    buckets = defaultdict(list)
    for i, (p, q, _t) in enumerate(segments):
        x0, x1 = sorted((p[0], q[0]))
        y0, y1 = sorted((p[1], q[1]))
        for cx in range(int((x0 - allx0) // cell), int((x1 - allx0) // cell) + 1):
            for cy in range(int((y0 - ally0) // cell), int((y1 - ally0) // cell) + 1):
                buckets[(cx, cy)].append(i)

    seen = set()
    for idxs in buckets.values():
        for a in range(len(idxs)):
            for b in range(a + 1, len(idxs)):
                i, j = (idxs[a], idxs[b]) if idxs[a] < idxs[b] else (idxs[b], idxs[a])
                if i == j or (i, j) in seen:
                    continue
                seen.add((i, j))
                _intersect_pair(segments[i], segments[j], cuts[i], cuts[j])

    # collect every vertex the noded graph will contain (segment
    # endpoints + cut points), then WELD near-duplicates: two inputs
    # can carry coordinates that straddle a 1e-9 snap boundary (e.g.
    # ...195 vs ...196), and without welding the stray 1e-9 micro-edge
    # breaks the face walk — a sliver face then silently vanishes from
    # unions/differences.
    seg_pts = []
    for i, (p, q, tag) in enumerate(segments):
        ts = sorted(cuts[i] | {0.0, 1.0})
        px, py = p
        dx, dy = q[0] - px, q[1] - py
        pts = [(_snap(px + t * dx), _snap(py + t * dy)) for t in ts]
        seg_pts.append(pts)
    weld = _weld_map(pt for pts in seg_pts for pt in pts)

    edges = {}
    for i, (_p, _q, tag) in enumerate(segments):
        pts = [weld[pt] for pt in seg_pts[i]]
        for k in range(len(pts) - 1):
            u, v = pts[k], pts[k + 1]
            if u == v:
                continue
            key = (u, v) if u < v else (v, u)
            edges.setdefault(key, set()).add(tag)
    return edges


_WELD_TOL = 2e-9


def _weld_map(pts_iter) -> dict:
    """{vertex: canonical vertex} merging vertices within ~2e-9 of each
    other (lexicographic-min representative via union-find).  Grid
    buckets keep it near-linear."""
    pts = set(pts_iter)
    parent: dict = {}

    def find(a):
        root = a
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(a, a) != a:
            parent[a], a = root, parent[a]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra

    inv = 1.0 / (2.0 * _WELD_TOL)
    buckets: dict = defaultdict(list)
    for p in pts:
        buckets[(int(p[0] * inv), int(p[1] * inv))].append(p)
    for (bx, by), members in buckets.items():
        for dx in (0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy < 0:
                    continue  # each unordered bucket pair visited once
                other = members if (dx, dy) == (0, 0) else buckets.get(
                    (bx + dx, by + dy)
                )
                if not other:
                    continue
                for p in members:
                    for q in other:
                        if p is q:
                            continue
                        if (
                            abs(p[0] - q[0]) <= _WELD_TOL
                            and abs(p[1] - q[1]) <= _WELD_TOL
                        ):
                            union(p, q)
    return {p: find(p) for p in pts}


def _intersect_pair(s1, s2, cuts1, cuts2):
    (p1, q1, _), (p2, q2, _) = s1, s2
    d1x, d1y = q1[0] - p1[0], q1[1] - p1[1]
    d2x, d2y = q2[0] - p2[0], q2[1] - p2[1]
    ex, ey = p2[0] - p1[0], p2[1] - p1[1]
    denom = _cross(d1x, d1y, d2x, d2y)
    ln1 = math.hypot(d1x, d1y)
    ln2 = math.hypot(d2x, d2y)
    if abs(denom) <= 1e-13 * ln1 * ln2:
        if abs(_cross(d1x, d1y, ex, ey)) > 1e-12 * max(ln1, 1.0) * max(ln2, 1.0):
            return  # parallel, not collinear
        ll = d1x * d1x + d1y * d1y
        for pt in (p2, q2):
            t = ((pt[0] - p1[0]) * d1x + (pt[1] - p1[1]) * d1y) / ll
            if 1e-12 < t < 1 - 1e-12:
                cuts1.add(t)
        mm = d2x * d2x + d2y * d2y
        for pt in (p1, q1):
            u = ((pt[0] - p2[0]) * d2x + (pt[1] - p2[1]) * d2y) / mm
            if 1e-12 < u < 1 - 1e-12:
                cuts2.add(u)
        return
    t = _cross(ex, ey, d2x, d2y) / denom
    u = _cross(ex, ey, d1x, d1y) / denom
    if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
        if 1e-12 < t < 1 - 1e-12:
            cuts1.add(t)
        if 1e-12 < u < 1 - 1e-12:
            cuts2.add(u)


def _cycles(edges):
    """Trace each directed edge into exactly one closed walk.

    Returns (cycles, dir_cycle): cycles[i] = (vertex ndarray closed walk,
    signed area); dir_cycle maps directed edge -> cycle index.  Bounded
    faces are traced CCW (positive), hole/outer boundaries CW (negative).
    """
    nbrs = defaultdict(set)
    for (u, v) in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    order = {}
    for v, outs in nbrs.items():
        outs_sorted = sorted(outs, key=lambda w: math.atan2(w[1] - v[1], w[0] - v[0]))
        order[v] = {w: k for k, w in enumerate(outs_sorted)}
        nbrs[v] = outs_sorted

    visited = set()
    cycles = []
    dir_cycle = {}
    for (u0, v0) in list(edges):
        for (a, b) in ((u0, v0), (v0, u0)):
            if (a, b) in visited:
                continue
            walk = [a]
            u, v = a, b
            while True:
                visited.add((u, v))
                walk.append(v)
                dir_cycle[(u, v)] = len(cycles)
                outs = nbrs[v]
                k = order[v][u]
                w = outs[(k - 1) % len(outs)]
                u, v = v, w
                if (u, v) == (a, b):
                    break
            arr = np.array(walk, dtype=np.float64)
            cycles.append((arr, signed_area(arr)))
    return cycles, dir_cycle


def _cycle_sample(walk: np.ndarray, all_edges_arr: np.ndarray | None):
    """A point strictly inside the face to the LEFT of the cycle walk.

    Offsets from the midpoint of the walk's longest edge by a distance
    safely below the gap to the nearest non-incident arrangement edge.
    Small walks run on scalar floats (numpy per-call overhead dominates
    at arrangement-of-one-pair sizes)."""
    pts = walk.tolist()
    m = len(pts) - 1
    best_i, best_l2 = 0, -1.0
    for i in range(m):
        dx = pts[i + 1][0] - pts[i][0]
        dy = pts[i + 1][1] - pts[i][1]
        l2 = dx * dx + dy * dy
        if l2 > best_l2:
            best_i, best_l2 = i, l2
    i = best_i
    ln = math.hypot(pts[i + 1][0] - pts[i][0], pts[i + 1][1] - pts[i][1])
    if ln <= 0:
        return (float(walk[0, 0]), float(walk[0, 1]))
    sx = pts[i + 1][0] - pts[i][0]
    sy = pts[i + 1][1] - pts[i][1]
    mx = 0.5 * (pts[i][0] + pts[i + 1][0])
    my = 0.5 * (pts[i][1] + pts[i + 1][1])
    nx, ny = -sy / ln, sx / ln  # left normal
    eps = 0.25 * ln
    if all_edges_arr is not None and len(all_edges_arr):
        dmin = _point_seg_dist_min(mx, my, all_edges_arr)
        if dmin is not None:
            eps = min(eps, 0.45 * dmin)
    eps = max(eps, 1e-12)
    return (mx + eps * nx, my + eps * ny)


def _point_seg_dist(px, py, segs: np.ndarray):
    """Vectorized distance from (px,py) to segments array (N,4)=(x1,y1,x2,y2)."""
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x2 - x1, y2 - y1
    ll = dx * dx + dy * dy
    # ll==0 rows are where-guarded before the divide; no errstate needed
    t = np.clip(((px - x1) * dx + (py - y1) * dy) / np.where(ll == 0, 1, ll), 0, 1)
    qx, qy = x1 + t * dx, y1 + t * dy
    return np.hypot(qx - px, qy - py)


def _point_seg_dist_min(px, py, segs: np.ndarray):
    """min distance from (px,py) to segments, ignoring incident (~0)
    distances; None when every segment is incident.  Scalar loop below
    ~48 segments (the one-pair arrangement size), vectorized above."""
    if len(segs) <= 48:
        best = None
        for x1, y1, x2, y2 in segs.tolist():
            dx, dy = x2 - x1, y2 - y1
            ll = dx * dx + dy * dy
            if ll == 0:
                ll = 1.0
            t = ((px - x1) * dx + (py - y1) * dy) / ll
            if t < 0.0:
                t = 0.0
            elif t > 1.0:
                t = 1.0
            d = math.hypot(x1 + t * dx - px, y1 + t * dy - py)
            if d > 1e-13 and (best is None or d < best):
                best = d
        return best
    d = _point_seg_dist(px, py, segs)
    d = d[d > 1e-13]
    return float(d.min()) if len(d) else None


class Cycle:
    __slots__ = ("walk", "area", "rep", "cover")

    def __init__(self, walk, area, rep):
        self.walk = walk
        self.area = area
        self.rep = rep
        self.cover = frozenset()


class Arrangement:
    __slots__ = ("cycles", "edges", "dir_cycle", "inputs")

    def __init__(self, cycles, edges, dir_cycle, inputs):
        self.cycles = cycles  # list[Cycle]
        self.edges = edges  # {(p,q): set(tags)}
        self.dir_cycle = dir_cycle
        self.inputs = inputs

    def covered_area(self, pred) -> float:
        """Σ signed_area(c) over cycles whose face satisfies ``pred(cover)``."""
        return sum(c.area for c in self.cycles if pred(c.cover))


def build_arrangement(geoms) -> Arrangement:
    segments = []
    for i, g in enumerate(geoms):
        segments.extend(_segments_of(g, i))
    edges = _node(segments)
    raw, dir_cycle = _cycles(edges)
    edges_arr = (
        np.array([[u[0], u[1], v[0], v[1]] for (u, v) in edges], dtype=np.float64)
        if edges
        else None
    )
    bbs = [g.bounds for g in geoms]
    cycles = []
    for walk, area in raw:
        rep = _cycle_sample(walk, edges_arr)
        c = Cycle(walk, area, rep)
        x, y = rep
        cov = set()
        for i, g in enumerate(geoms):
            b = bbs[i]
            if not (
                b[0] - _EPS <= x <= b[2] + _EPS and b[1] - _EPS <= y <= b[3] + _EPS
            ):
                continue
            if g.contains_point(x, y):
                cov.add(i)
        c.cover = frozenset(cov)
        cycles.append(c)
    return Arrangement(cycles, edges, dir_cycle, list(geoms))


def _assemble_from_boundary(boundary_edges, classify) -> Geometry:
    """Polygonize boundary edges of a region; keep shells/holes whose
    kept-side (left of walk) satisfies ``classify(x, y)``.

    ``boundary_edges`` must separate kept from unkept everywhere.
    """
    if not boundary_edges:
        return Geometry.empty()
    cycles, _ = _cycles({k: {0} for k in boundary_edges})
    edges_arr = np.array(
        [[u[0], u[1], v[0], v[1]] for (u, v) in boundary_edges], dtype=np.float64
    )
    shells, holes = [], []
    for walk, area in cycles:
        rep = _cycle_sample(walk, edges_arr)
        kept = classify(rep[0], rep[1])
        if area > _EPS and kept:
            shells.append(walk)
        elif area < -_EPS and kept:
            holes.append(walk)
    polys = []
    shells_sorted = sorted(shells, key=lambda w: abs(signed_area(w)))
    for sh in shells:
        polys.append([sh])
    for hw in holes:
        attached = False
        ha = abs(signed_area(hw))
        for sh_idx, sh in sorted(
            enumerate(shells), key=lambda t: abs(signed_area(t[1]))
        ):
            if abs(signed_area(sh)) < ha - _EPS:
                continue
            if _ring_in_ring(hw, sh):
                polys[sh_idx].append(hw)
                attached = True
                break
        if not attached and polys:
            polys[0].append(hw)  # degenerate fallback
    if not polys:
        return Geometry.empty()
    if len(polys) == 1:
        return Geometry("Polygon", polys[0])
    return Geometry("MultiPolygon", polys)


def _ring_in_ring(inner: np.ndarray, outer: np.ndarray) -> bool:
    """True if ring ``inner`` lies strictly inside ring ``outer`` (rings from
    a common noded arrangement: edges never cross, may coincide)."""
    for i in range(len(inner) - 1):
        mx = 0.5 * (inner[i, 0] + inner[i + 1, 0])
        my = 0.5 * (inner[i, 1] + inner[i + 1, 1])
        on = False
        for j in range(len(outer) - 1):
            if _on_segment(mx, my, outer[j], outer[j + 1]):
                on = True
                break
        if not on:
            return point_in_ring(mx, my, outer)
    return False  # all edges coincide with outer: same ring, not "inside"


def _on_segment(px, py, a, b, eps=1e-11):
    cx = (b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])
    if abs(cx) > eps * max(1.0, abs(b[0] - a[0]) + abs(b[1] - a[1])):
        return False
    return (
        min(a[0], b[0]) - eps <= px <= max(a[0], b[0]) + eps
        and min(a[1], b[1]) - eps <= py <= max(a[1], b[1]) + eps
    )


def _dissolve(arr: Arrangement, keep_pred, classify) -> Geometry:
    """Assemble the region of faces with keep_pred(cover) as polygons."""
    kept_cycle = [keep_pred(c.cover) for c in arr.cycles]
    boundary = {}
    for key in arr.edges:
        u, v = key
        c1 = arr.dir_cycle.get((u, v))
        c2 = arr.dir_cycle.get((v, u))
        k1 = kept_cycle[c1] if c1 is not None else False
        k2 = kept_cycle[c2] if c2 is not None else False
        if k1 != k2:
            boundary[key] = True
    return _assemble_from_boundary(boundary, classify)


# --------------------------------------------------------------------------
# public operations
# --------------------------------------------------------------------------


def _is_rect(geom: Geometry):
    """Fast-path: a single axis-aligned rectangular ring -> (x0,y0,x1,y1)."""
    if geom.gtype != "Polygon" or len(geom.data) != 1:
        return None
    r = geom.data[0]
    if len(r) != 5:
        return None
    for i in range(4):
        if r[i + 1, 0] != r[i, 0] and r[i + 1, 1] != r[i, 1]:
            return None
    xs, ys = set(r[:, 0]), set(r[:, 1])
    if len(xs) != 2 or len(ys) != 2:
        return None
    return (min(xs), min(ys), max(xs), max(ys))


def _bbox_disjoint(a: Geometry, b: Geometry) -> bool:
    ab, bb = a.bounds, b.bounds
    return (
        math.isnan(ab[0])
        or math.isnan(bb[0])
        or ab[2] < bb[0]
        or bb[2] < ab[0]
        or ab[3] < bb[1]
        or bb[3] < ab[1]
    )


def intersection_area(a: Geometry, b: Geometry) -> float:
    ra, rb = _is_rect(a), _is_rect(b)
    if ra and rb:
        w = min(ra[2], rb[2]) - max(ra[0], rb[0])
        h = min(ra[3], rb[3]) - max(ra[1], rb[1])
        return max(0.0, w) * max(0.0, h)
    if _bbox_disjoint(a, b):
        return 0.0
    arr = build_arrangement([a, b])
    return arr.covered_area(lambda cov: cov >= {0, 1})


def intersection(a: Geometry, b: Geometry) -> Geometry:
    """Mixed-dimension intersection: areal faces covered by both inputs,
    plus shared boundary lines and isolated touch points (rook/queen
    adjacency semantics, /root/reference/maup/adjacencies.py:68-69)."""
    if _bbox_disjoint(a, b):
        return Geometry.empty()
    ra, rb = _is_rect(a), _is_rect(b)
    if ra and rb:
        x0, y0 = max(ra[0], rb[0]), max(ra[1], rb[1])
        x1, y1 = min(ra[2], rb[2]), min(ra[3], rb[3])
        if x1 > x0 and y1 > y0:
            return Geometry.polygon([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])
        if x1 == x0 and y1 > y0:
            return Geometry.linestring([(x0, y0), (x0, y1)])
        if y1 == y0 and x1 > x0:
            return Geometry.linestring([(x0, y0), (x1, y0)])
        if x1 == x0 and y1 == y0:
            return Geometry.point(x0, y0)
        return Geometry.empty()
    arr = build_arrangement([a, b])
    kept = lambda cov: cov >= {0, 1}
    poly = _dissolve(
        arr, kept, lambda x, y: a.contains_point(x, y) and b.contains_point(x, y)
    )

    kept_cycle = [kept(c.cover) for c in arr.cycles]
    lines = []
    line_vertices = set()
    for key, tags in arr.edges.items():
        if tags >= {0, 1}:
            u, v = key
            c1 = arr.dir_cycle.get((u, v))
            c2 = arr.dir_cycle.get((v, u))
            k1 = kept_cycle[c1] if c1 is not None else False
            k2 = kept_cycle[c2] if c2 is not None else False
            if not k1 and not k2:
                lines.append(key)
                line_vertices.add(u)
                line_vertices.add(v)

    # vertices adjacent to any areal-kept face are not isolated touches
    area_vertices = set()
    for ci, c in enumerate(arr.cycles):
        if kept_cycle[ci]:
            for p in c.walk[:-1]:
                area_vertices.add((_snap(p[0]), _snap(p[1])))

    va, vb = set(), set()
    for key, tags in arr.edges.items():
        for s, vs in ((0, va), (1, vb)):
            if s in tags:
                vs.add(key[0])
                vs.add(key[1])
    pts = sorted((va & vb) - line_vertices - area_vertices)

    parts = []
    if not poly.is_empty:
        parts.append(poly)
    if lines:
        parts.append(
            Geometry.multilinestring(_merge_lines(lines))
        )
    if pts:
        if len(pts) == 1:
            parts.append(Geometry.point(*pts[0]))
        else:
            parts.append(Geometry("MultiPoint", np.array(pts, dtype=np.float64)))
    return Geometry.collection(parts)


def _merge_lines(segs):
    """Merge unit segments into maximal paths (linemerge-lite)."""
    nbrs = defaultdict(list)
    for (u, v) in segs:
        nbrs[u].append(v)
        nbrs[v].append(u)
    unused = set()
    for (u, v) in segs:
        unused.add((u, v))
        unused.add((v, u))
    paths = []
    starts = [v for v, ns in nbrs.items() if len(ns) != 2] or list(nbrs)
    for s in starts:
        for t in list(nbrs[s]):
            if (s, t) not in unused:
                continue
            path = [s, t]
            unused.discard((s, t))
            unused.discard((t, s))
            u, v = s, t
            while len(nbrs[v]) == 2:
                w = nbrs[v][0] if nbrs[v][0] != u else nbrs[v][1]
                if (v, w) not in unused:
                    break
                path.append(w)
                unused.discard((v, w))
                unused.discard((w, v))
                u, v = v, w
            paths.append(np.array(path, dtype=np.float64))
    return paths


def union_all(geoms) -> Geometry:
    """n-ary union (analog of shapely.union_all at
    /root/reference/maup/repair.py:84,266,294).  For very large n, callers
    pre-group per tile; this kernel handles one group."""
    geoms = [g for g in geoms if isinstance(g, Geometry) and not g.is_empty]
    if not geoms:
        return Geometry.empty()
    if len(geoms) == 1 and geoms[0].gtype == "Polygon":
        return geoms[0]
    arr = build_arrangement(geoms)
    return _dissolve(
        arr,
        lambda cov: len(cov) > 0,
        lambda x, y: any(g.contains_point(x, y) for g in geoms),
    )


def difference(a: Geometry, b: Geometry) -> Geometry:
    if _bbox_disjoint(a, b):
        return a
    arr = build_arrangement([a, b])
    return _dissolve(
        arr,
        lambda cov: 0 in cov and 1 not in cov,
        lambda x, y: a.contains_point(x, y) and not b.contains_point(x, y),
    )


def make_valid(geom: Geometry) -> Geometry:
    """Even-odd re-polygonization of a possibly self-intersecting polygon
    (the shapely ``make_valid`` role at /root/reference/maup/repair.py:47-57)."""
    if not any(True for _ in geom.polygons()):
        return geom
    arr = build_arrangement([geom])
    return _dissolve(
        arr, lambda cov: len(cov) > 0, lambda x, y: geom.contains_point(x, y)
    )


def shared_boundary_length(a: Geometry, b: Geometry) -> float:
    """Total length of the collinear overlap between the boundaries of
    ``a`` and ``b`` (the max-shared-perimeter weight of
    /root/reference/maup/repair.py:478 without materializing geometry)."""
    segs = _segments_of(a, 0) + _segments_of(b, 1)
    edges = _node(segs)
    total = 0.0
    for (u, v), tags in edges.items():
        if tags >= {0, 1}:
            total += math.hypot(v[0] - u[0], v[1] - u[1])
    return total


def holes_of_union_geom(geoms):
    """Interior rings of union(geoms), each as its own Polygon — mirrors
    holes()/holes_of_union (/root/reference/maup/repair.py:74-103)."""
    u = union_all(geoms)
    out = []
    for rings in u.polygons():
        for hole in rings[1:]:
            out.append(Geometry("Polygon", [hole]))
    return out
