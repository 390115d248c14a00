"""``smart_repair`` — topology-preserving repair of a polygon layer.

Outcome contract of the reference (/root/reference/maup/smart_repair.py:49-496,
acceptance: ``doctor(repaired)`` is True,
/root/reference/tests/test_smart_repair.py:89-97): after repair the
layer has no overlaps, no gaps (when ``fill_gaps``), every piece of the
original footprint belongs to exactly one geometry, and with region
nesting each geometry stays inside its region.

This build re-derives the algorithm on the engine's planar-arrangement
kernel instead of porting the reference's 2,787-line queue machinery:

1. make_valid every input; build ONE arrangement of all boundaries
   (the reference's node+polygonize "building blocks",
   /root/reference/maup/smart_repair.py:523-748);
2. faces covered by exactly one input stay with it; faces covered by
   k ≥ 2 inputs (the "overlap tower") go to the covering input sharing
   the longest boundary with the face (the reconstruct rule at
   /root/reference/maup/smart_repair.py:907-912), ties to the smallest id;
3. holes of the union are filled into the neighbor sharing the longest
   boundary unless hole area exceeds ``fill_gaps_threshold`` × the
   largest adjoining geometry (drop_bad_holes,
   /root/reference/maup/smart_repair.py:972-1029).

Distribution: groups are independent — one Spark task per region (with
``regions``) or per connected cluster; inside a group the kernel is
pure-Python geometry (smart_repair is inherently sequential within a
component, /root/reference/maup/smart_repair.py:751-969 — the reference
concedes the same).  Also covered: the disconnected-fragment pass
(``reattach_fragments``) and ``small_rook_to_queen`` (iterated disk
reassignment).  Not ported: the queue-internal sub-kernels
(convexify/funnel shortest paths) the arrangement formulation makes
unnecessary.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.arrangement import (
    build_arrangement,
    _dissolve,
    holes_of_union_geom,
    make_valid,
    shared_boundary_length,
    union_all,
)
from ..geom.base import Geometry
from ..index.cells import CellGrid
from .spatial import DEFAULT_GRID


def reattach_fragments(
    repaired: dict, disconnection_threshold: float = 1e-4
) -> dict:
    """Post-pass: a geometry that came out disconnected keeps its main
    component; small fragments (area < threshold × geometry area) move
    to the neighbor sharing the most boundary (the reference's
    disconnected-fragment cleanup, /root/reference/maup/smart_repair.py:330-485).
    """
    moves = []
    for i, g in repaired.items():
        polys = list(g.polygons())
        if len(polys) <= 1:
            continue
        areas = [abs(Geometry("Polygon", rings).area) for rings in polys]
        main = max(range(len(polys)), key=lambda k: areas[k])
        total = sum(areas)
        keep = [polys[main]]
        for k, rings in enumerate(polys):
            if k == main:
                continue
            if areas[k] < disconnection_threshold * total:
                moves.append((i, Geometry("Polygon", rings)))
            else:
                keep.append(rings)
        repaired[i] = (
            Geometry("Polygon", keep[0])
            if len(keep) == 1
            else Geometry("MultiPolygon", keep)
        )
    for src_id, frag in moves:
        best, best_len = None, 0.0
        for j, g in repaired.items():
            if j == src_id or g.is_empty:
                continue
            L = shared_boundary_length(frag, g)
            if L > best_len or (L == best_len and best is not None and j < best):
                best, best_len = j, L
        if best is None or best_len <= 0:
            best = src_id  # nothing adjacent: keep with the original
        repaired[best] = union_all([repaired[best], frag])
    return repaired


def _incenter_pt(pts):
    """Incenter of a triangle — the reference's split point for
    3-neighbor triangular gaps (/root/reference/maup/smart_repair.py:1097-1113,
    2268-2310: 'more natural than the centroid for long skinny
    triangles')."""
    import math as _m

    (ax, ay), (bx, by), (cx, cy) = pts
    a = _m.hypot(cx - bx, cy - by)
    b = _m.hypot(ax - cx, ay - cy)
    c = _m.hypot(bx - ax, by - ay)
    s = a + b + c
    return ((a * ax + b * bx + c * cx) / s, (a * ay + b * by + c * cy) / s)


def _centroid_pt(ring):
    sx = sy = aa = 0.0
    for k in range(len(ring) - 1):
        x0, y0 = ring[k]
        x1, y1 = ring[k + 1]
        w = x0 * y1 - x1 * y0
        aa += w
        sx += (x0 + x1) * w
        sy += (y0 + y1) * w
    if abs(aa) < 1e-30:
        return (float(ring[0, 0]), float(ring[0, 1]))
    return (sx / (3.0 * aa), sy / (3.0 * aa))


def _simplify_collinear(ring):
    """Drop vertices lying on the segment between their neighbors."""
    pts = [tuple(p) for p in ring[:-1]]
    out = []
    n = len(pts)
    for k in range(n):
        (px, py), (qx, qy), (rx, ry) = pts[k - 1], pts[k], pts[(k + 1) % n]
        if abs((qx - px) * (ry - py) - (qy - py) * (rx - px)) > 1e-12:
            out.append(pts[k])
    return out


def split_hole_among_neighbors(hole: Geometry, neighbors: dict, _depth: int = 0):
    """Split a multi-neighbor gap among its neighbors, reference-style
    (/root/reference/maup/smart_repair.py:1032-1145 outcome semantics):
    each boundary arc of the gap belongs to the geometry it coincides
    with; sectors from each arc to an interior split point go to that
    arc's owner.  Triangular 3-owner gaps use the INCENTER (exact
    reference rule); general gaps use the centroid star split.

    NON-STAR gaps fall through to the reference's convexify/funnel
    subdivision (/root/reference/maup/smart_repair.py:2598-2787): each
    arc's owner is "filled in" up to the SHORTEST PATH inside the gap
    between the arc's endpoints (visibility-graph Dijkstra,
    geom/kernels.shortest_path_in_polygon), and the convexified
    remainder re-enters this function recursively.

    Returns {owner_id: piece Geometry} or None when the gap is
    single-owner or every strategy failed — callers then fall back to
    wholesale max-shared-perimeter absorption, preserving the doctor
    contract (gap fully filled)."""
    from ..geom.arrangement import _node, _segments_of, _snap, intersection_area

    rings = list(hole.polygons())
    if len(rings) != 1 or len(rings[0]) != 1:
        return None
    ring = rings[0][0]
    ids = sorted(neighbors)
    segs = _segments_of(hole, -1)
    for t, i in enumerate(ids):
        segs += _segments_of(neighbors[i], t)
    edges = _node(segs)

    ordered = []  # (start_pt, end_pt, owner) along the ring
    for k in range(len(ring) - 1):
        p = (_snap(ring[k, 0]), _snap(ring[k, 1]))
        q = (_snap(ring[k + 1, 0]), _snap(ring[k + 1, 1]))
        if p == q:
            continue
        dx, dy = q[0] - p[0], q[1] - p[1]
        ll = dx * dx + dy * dy
        subs = []
        for (u, v), tags in edges.items():
            if -1 not in tags:
                continue
            cu = abs((u[0] - p[0]) * dy - (u[1] - p[1]) * dx)
            cv = abs((v[0] - p[0]) * dy - (v[1] - p[1]) * dx)
            if cu > 1e-9 * max(1.0, ll) or cv > 1e-9 * max(1.0, ll):
                continue
            tu = ((u[0] - p[0]) * dx + (u[1] - p[1]) * dy) / ll
            tv = ((v[0] - p[0]) * dx + (v[1] - p[1]) * dy) / ll
            if min(tu, tv) < -1e-9 or max(tu, tv) > 1 + 1e-9:
                continue
            owner_tags = [t for t in tags if t >= 0]
            if not owner_tags:
                return None  # hole edge matched no neighbor boundary
            owner = ids[min(owner_tags)]
            if tu <= tv:
                subs.append((tu, u, v, owner))
            else:
                subs.append((tv, v, u, owner))
        subs.sort(key=lambda s: s[0])
        ordered.extend((a, b, o) for _, a, b, o in subs)
    if not ordered:
        return None

    arcs = []  # [owner, [pts...]]
    for a, b, owner in ordered:
        if arcs and arcs[-1][0] == owner and arcs[-1][1][-1] == a:
            arcs[-1][1].append(b)
        else:
            arcs.append([owner, [a, b]])
    if len(arcs) > 1 and arcs[0][0] == arcs[-1][0] and arcs[-1][1][-1] == arcs[0][1][0]:
        arcs[0][1] = arcs[-1][1][:-1] + arcs[0][1]
        arcs.pop()
    if len({o for o, _ in arcs}) <= 1:
        return None

    simple = _simplify_collinear(ring)
    if len(simple) == 3 and len({o for o, _ in arcs}) == 3:
        center = _incenter_pt(simple)
    else:
        center = _centroid_pt(ring)

    hole_area = abs(hole.area)
    pieces: dict = {}
    total = 0.0
    star_ok = True
    for owner, pts in arcs:
        if pts[0] == pts[-1]:
            continue  # arc spans the whole ring — single owner, bail
        piece = Geometry.polygon(list(pts) + [center])
        pa = abs(piece.area)
        if pa <= 1e-15:
            continue
        # star-shape validation: every sector must lie inside the gap
        if intersection_area(piece, hole) < pa * (1.0 - 1e-9):
            star_ok = False
            break
        total += pa
        pieces[owner] = (
            union_all([pieces[owner], piece]) if owner in pieces else piece
        )
    if (
        star_ok
        and pieces
        and abs(total - hole_area) <= 1e-9 * max(1.0, hole_area)
    ):
        return pieces
    res = _convexify_split(hole, ordered, arcs, neighbors, _depth)
    if res is not None:
        return res
    return _bridge_split(hole, ordered, arcs, neighbors, _depth)


def _convexify_split(
    hole: Geometry, ordered: list, arcs: list, neighbors: dict, depth: int
):
    """Reference convexify/funnel subdivision for non-star gaps
    (/root/reference/maup/smart_repair.py:2598-2787 + the shortest-path
    split at :1446-1916): for each boundary arc, the piece between the
    arc and the SHORTEST PATH inside the gap between its endpoints fills
    into the arc's owner; the remainder (whose boundaries are now
    shortest paths, i.e. convexified) recurses through
    split_hole_among_neighbors with the grown neighbors, absorbing
    wholesale only if it still resists.  Pieces are clipped to the
    not-yet-assigned remainder (first arc wins where shortest paths
    cross), so the result is always a PARTITION of the gap.
    """
    from ..geom.kernels import shortest_path_in_polygon

    if depth >= 4:
        return None
    hole_area = abs(hole.area)
    # ring enriched with the noded arc endpoints, so every arc endpoint
    # is a vertex of the polygon handed to the shortest-path kernel
    enriched = [a for a, _b, _o in ordered]
    if len(enriched) < 3:
        return None
    hole_e = make_valid(Geometry.polygon(enriched))
    if hole_e.is_empty or abs(abs(hole_e.area) - hole_area) > 1e-9 * max(
        1.0, hole_area
    ):
        return None

    remaining = hole_e
    pieces: dict = {}
    progressed = False
    for owner, pts in arcs:
        if remaining.is_empty:
            break
        if pts[0] == pts[-1]:
            return None
        try:
            sp = shortest_path_in_polygon(hole_e, tuple(pts[0]), tuple(pts[-1]))
        except (TypeError, ValueError):
            return None
        ring_pts = [tuple(p) for p in pts] + [tuple(p) for p in sp[::-1][1:-1]]
        if len(ring_pts) < 3:
            continue
        piece = make_valid(Geometry.polygon(ring_pts))
        if piece.is_empty or abs(piece.area) <= 1e-12 * max(1.0, hole_area):
            continue
        piece = piece.intersection(remaining)
        if piece.is_empty or piece.area <= 0:
            continue
        progressed = True
        pieces[owner] = (
            union_all([pieces[owner], piece]) if owner in pieces else piece
        )
        remaining = remaining.difference(piece)
    if not progressed:
        return None

    grown = {
        i: (union_all([g, pieces[i]]) if i in pieces else g)
        for i, g in neighbors.items()
    }
    for rings in remaining.polygons():
        sub_hole = Geometry("Polygon", [rings[0]])
        if abs(sub_hole.area) <= 1e-12 * max(1.0, hole_area):
            continue
        sub_neigh = {
            i: g
            for i, g in grown.items()
            if shared_boundary_length(sub_hole, g) > 0
        }
        sub = None
        if len(sub_neigh) >= 2:
            sub = split_hole_among_neighbors(sub_hole, sub_neigh, depth + 1)
        if sub is None:
            if not sub_neigh:
                return None
            lengths = {
                i: shared_boundary_length(sub_hole, g)
                for i, g in sub_neigh.items()
            }
            best = min(sorted(lengths), key=lambda i: (-lengths[i], i))
            sub = {best: sub_hole}
        for i, p in sub.items():
            pieces[i] = union_all([pieces[i], p]) if i in pieces else p

    total = sum(abs(p.area) for p in pieces.values())
    if abs(total - hole_area) > 1e-9 * max(1.0, hole_area) or not pieces:
        return None
    return pieces


def _seg_dist(p, q, r, s):
    """Min distance between segments pq and rs."""
    import math as _m

    def pt_seg(a, b, c):
        bx, by = c[0] - b[0], c[1] - b[1]
        ll = bx * bx + by * by
        if ll <= 0:
            return _m.hypot(a[0] - b[0], a[1] - b[1])
        t = max(0.0, min(1.0, ((a[0] - b[0]) * bx + (a[1] - b[1]) * by) / ll))
        return _m.hypot(a[0] - b[0] - t * bx, a[1] - b[1] - t * by)

    d1 = (q[0] - p[0], q[1] - p[1])
    d2 = (s[0] - r[0], s[1] - r[1])
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(denom) > 1e-15:
        rx, ry = r[0] - p[0], r[1] - p[1]
        t = (rx * d2[1] - ry * d2[0]) / denom
        u = (rx * d1[1] - ry * d1[0]) / denom
        if 0 <= t <= 1 and 0 <= u <= 1:
            return 0.0
    return min(
        pt_seg(p, r, s), pt_seg(q, r, s), pt_seg(r, p, q), pt_seg(s, p, q)
    )


def _polyline_distance(a_pts, b_pts) -> float:
    best = float("inf")
    for k in range(len(a_pts) - 1):
        for m in range(len(b_pts) - 1):
            best = min(
                best, _seg_dist(a_pts[k], a_pts[k + 1], b_pts[m], b_pts[m + 1])
            )
    return best


def _first_crossing(path1, path2):
    """First intersection point of path1 with path2 walking from
    path1[0]; returns (X, k1, k2) — X lies on path1 segment k1 and
    path2 segment k2 — or None."""
    best = None
    for k in range(len(path1) - 1):
        p, q = path1[k], path1[k + 1]
        dx, dy = q[0] - p[0], q[1] - p[1]
        for m in range(len(path2) - 1):
            r, s = path2[m], path2[m + 1]
            ex, ey = s[0] - r[0], s[1] - r[1]
            denom = dx * ey - dy * ex
            cand_t = None
            if abs(denom) > 1e-15:
                rx, ry = r[0] - p[0], r[1] - p[1]
                t = (rx * ey - ry * ex) / denom
                u = (rx * dy - ry * dx) / denom
                if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
                    cand_t = min(max(t, 0.0), 1.0)
            else:
                # parallel: shared endpoints count as crossings
                for w in (r, s):
                    if abs(w[0] - p[0]) < 1e-12 and abs(w[1] - p[1]) < 1e-12:
                        cand_t = 0.0
                    elif abs(w[0] - q[0]) < 1e-12 and abs(w[1] - q[1]) < 1e-12:
                        cand_t = cand_t if cand_t is not None else 1.0
            if cand_t is not None:
                key = (k, cand_t)
                if best is None or key < best[0]:
                    X = (p[0] + cand_t * dx, p[1] + cand_t * dy)
                    best = (key, X, k, m)
    if best is None:
        return None
    return best[1], best[2], best[3]


def _path_portion(path, start_is_first: bool, X, seg_idx):
    """Vertices of ``path`` from its first (or last) point up to X,
    which lies on segment ``seg_idx``."""
    import math as _m

    def near(a, b):
        return _m.hypot(a[0] - b[0], a[1] - b[1]) < 1e-12

    if start_is_first:
        out = list(path[: seg_idx + 1])
        if not near(out[-1], X):
            out.append(X)
        return out
    out = list(path[seg_idx + 1:])[::-1]
    if not near(out[-1], X):
        out.append(X)
    return out


def _bridge_split(
    hole: Geometry, ordered: list, arcs: list, neighbors: dict, depth: int
):
    """The reference's ≥4-boundary gap reduction
    (/root/reference/maup/smart_repair.py:1446-1916): connect the
    CLOSEST non-adjacent pair of boundary arcs by crossing shortest
    paths (start→start, end→end), adjoin the "triangle" between each
    arc and the paths to that arc's owner, and recurse on the 1-2
    smaller gaps that remain (each with strictly fewer boundaries).
    Pair order is deterministic: (distance, ring positions); a pair is
    accepted only when the reference's strong-mutual-visibility test
    (disjoint start→end / end→start path vertex sets) passes and at
    least one carved piece has positive area."""
    from ..geom.kernels import shortest_path_in_polygon

    if depth >= 6 or len(arcs) < 3:
        return None
    hole_area = abs(hole.area)
    enriched = [a for a, _b, _o in ordered]
    if len(enriched) < 3:
        return None
    hole_e = make_valid(Geometry.polygon(enriched))
    if hole_e.is_empty:
        return None

    n = len(arcs)
    cand_pairs = []
    for i in range(n):
        for j in range(i + 1, n):
            if (j - i) % n in (1, n - 1):
                continue  # ring-adjacent arcs share an endpoint
            d = _polyline_distance(
                [tuple(p) for p in arcs[i][1]], [tuple(p) for p in arcs[j][1]]
            )
            if d > 0:
                cand_pairs.append((d, i, j))
    cand_pairs.sort()

    def sp(a, b):
        return [
            tuple(p)
            for p in shortest_path_in_polygon(hole_e, tuple(a), tuple(b))
        ]

    for _d, i, j in cand_pairs:
        own1, b1 = arcs[i][0], [tuple(p) for p in arcs[i][1]]
        own2, b2 = arcs[j][0], [tuple(p) for p in arcs[j][1]]
        try:
            test1 = sp(b1[0], b2[-1])
            test2 = sp(b1[-1], b2[0])
        except (TypeError, ValueError):
            continue
        if set(test1) & set(test2):
            continue  # not strongly mutually visible — next pair
        if own1 == own2:
            path1, path2 = test1, test2  # non-crossing, single piece
        else:
            try:
                path1 = sp(b1[0], b2[0])
                path2 = sp(b1[-1], b2[-1])
            except (TypeError, ValueError):
                continue
        cross = _first_crossing(path1, path2)
        pieces: dict = {}
        remaining = hole_e
        if own1 == own2:
            ring = b1 + path2 + b2 + path1[::-1]
            polys = [(own1, ring)]
        elif cross is None:
            continue
        else:
            X, k1, k2 = cross
            # triangle against b1: b1, then path2 from its start (= b1's
            # end) to X, then path1 from X back to b1's start
            ring1 = b1 + _path_portion(path2, True, X, k2)[1:]
            ring1 += _path_portion(path1, True, X, k1)[::-1][1:]
            # triangle against b2: b2, then path2 from b2's end back to
            # X, then path1 from X to b2's start
            ring2 = b2 + _path_portion(path2, False, X, k2)[1:]
            ring2 += _path_portion(path1, False, X, k1)[::-1][1:]
            polys = [(own1, ring1), (own2, ring2)]
        progressed = False
        for owner, ring in polys:
            ring = [p for q, p in enumerate(ring) if q == 0 or p != ring[q - 1]]
            if len(ring) < 3:
                continue
            piece = make_valid(Geometry.polygon(ring))
            if piece.is_empty or abs(piece.area) <= 1e-12 * max(1.0, hole_area):
                continue
            piece = piece.intersection(remaining)
            if piece.is_empty or piece.area <= 0:
                continue
            progressed = True
            pieces[owner] = (
                union_all([pieces[owner], piece]) if owner in pieces else piece
            )
            remaining = remaining.difference(piece)
        if not progressed:
            continue

        grown = {
            k: (union_all([g, pieces[k]]) if k in pieces else g)
            for k, g in neighbors.items()
        }
        ok = True
        for rings in remaining.polygons():
            sub_hole = Geometry("Polygon", [rings[0]])
            if abs(sub_hole.area) <= 1e-12 * max(1.0, hole_area):
                continue
            sub_neigh = {
                k: g
                for k, g in grown.items()
                if shared_boundary_length(sub_hole, g) > 0
            }
            sub = None
            if len(sub_neigh) >= 2:
                sub = split_hole_among_neighbors(sub_hole, sub_neigh, depth + 1)
            if sub is None:
                if not sub_neigh:
                    ok = False
                    break
                lengths = {
                    k: shared_boundary_length(sub_hole, g)
                    for k, g in sub_neigh.items()
                }
                best = min(sorted(lengths), key=lambda k: (-lengths[k], k))
                sub = {best: sub_hole}
            for k, p in sub.items():
                pieces[k] = union_all([pieces[k], p]) if k in pieces else p
        if not ok:
            continue
        total = sum(abs(p.area) for p in pieces.values())
        if abs(total - hole_area) > 1e-9 * max(1.0, hole_area) or not pieces:
            continue
        return pieces
    return None


def repair_items(
    items: list[tuple],
    fill_gaps: bool = True,
    fill_gaps_threshold: float | None = 0.1,
    min_rook_length: float | None = None,
) -> dict:
    """Repair one group: items = [(id, Geometry)]; returns {id: Geometry}."""
    # order-independence: tie-breaks resolve on the item INDEX, so the
    # index order must be the id order no matter how Spark delivered the
    # rows (partition/join order is not deterministic)
    items = sorted(items, key=lambda t: t[0])
    ids = [i for i, _ in items]
    geoms = [make_valid(g) for _, g in items]
    arr = build_arrangement(geoms)

    def cover_of(x: float, y: float) -> frozenset:
        return frozenset(k for k, g in enumerate(geoms) if g.contains_point(x, y))

    parts: dict[int, list[Geometry]] = defaultdict(list)
    for k in range(len(geoms)):
        excl = _dissolve(
            arr,
            lambda cov, k=k: cov == frozenset([k]),
            lambda x, y, k=k: cover_of(x, y) == frozenset([k]),
        )
        if not excl.is_empty:
            parts[k].append(excl)

    overlap_sets = {c.cover for c in arr.cycles if len(c.cover) >= 2}
    for S in overlap_sets:
        region = _dissolve(
            arr, lambda cov, S=S: cov == S, lambda x, y, S=S: cover_of(x, y) == S
        )
        for rings in region.polygons():
            piece = Geometry("Polygon", rings)
            best = min(
                sorted(S),
                key=lambda k: (-shared_boundary_length(piece, geoms[k]), k),
            )
            parts[best].append(piece)

    repaired = {
        ids[k]: union_all(parts[k]) if parts[k] else Geometry.empty()
        for k in range(len(geoms))
    }

    if fill_gaps:
        for hole in holes_of_union_geom([g for g in repaired.values() if not g.is_empty]):
            lengths = {
                i: shared_boundary_length(hole, g)
                for i, g in repaired.items()
                if not g.is_empty
            }
            neighbors = {i: L for i, L in lengths.items() if L > 0}
            if not neighbors:
                continue
            if fill_gaps_threshold is not None:
                max_adj = max(repaired[i].area for i in neighbors)
                if hole.area > fill_gaps_threshold * max_adj:
                    continue
            if len(neighbors) >= 2:
                # reference smart_close_gaps semantics: a multi-neighbor
                # gap is SPLIT among its neighbors (incenter rule for
                # triangles), not absorbed winner-takes-all
                split = split_hole_among_neighbors(
                    hole, {i: repaired[i] for i in neighbors}
                )
                if split is not None:
                    for i, piece in split.items():
                        repaired[i] = union_all([repaired[i], piece])
                    continue
            best = min(sorted(neighbors), key=lambda i: (-neighbors[i], i))
            repaired[best] = union_all([repaired[best], hole])
    repaired = reattach_fragments(repaired)
    if min_rook_length is not None:
        repaired = small_rook_to_queen(repaired, min_rook_length)
    return repaired


def building_blocks_items(items: list[tuple]) -> list[tuple]:
    """Planar partition of one group: atomic pieces tagged with the ids
    of the covering inputs and their overlap degree (the reference's
    building_blocks + overlap tower,
    /root/reference/maup/smart_repair.py:523-748; degree 0 = gap).

    Returns [(geometry, owner_ids, degree, area)] sorted by (degree,
    owners) for deterministic piece ids downstream.
    """
    items = sorted(items, key=lambda t: t[0])  # row-order independence
    ids = [i for i, _ in items]
    geoms = [make_valid(g) for _, g in items]
    arr = build_arrangement(geoms)

    def cover_of(x: float, y: float) -> frozenset:
        return frozenset(k for k, g in enumerate(geoms) if g.contains_point(x, y))

    out = []
    cover_sets = {c.cover for c in arr.cycles if c.cover}
    for S in cover_sets:
        region = _dissolve(
            arr, lambda cov, S=S: cov == S, lambda x, y, S=S: cover_of(x, y) == S
        )
        owners = sorted(ids[k] for k in S)
        for rings in region.polygons():
            piece = Geometry("Polygon", rings)
            out.append((piece, owners, len(S), piece.area))
    for hole in holes_of_union_geom(geoms):
        out.append((hole, [], 0, hole.area))
    out.sort(key=lambda t: (t[2], t[1], -t[3]))
    return out


def building_blocks(
    geoms: DataFrame,
    id_col: str = "id",
    group_col: str | None = None,
) -> DataFrame:
    """Distributed piece table: one row per atomic planar piece.

    Returns DataFrame[group, piece_id, geometry, owners array, degree,
    area]; ``group_col`` partitions the work (per region/tile at scale;
    one group otherwise)."""
    work = geoms.select(id_col, "geometry").withColumn(
        "__grp", F.col(group_col) if group_col else F.lit(0)
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        items = [
            (i, Geometry.from_wkb(b)) for i, b in zip(pdf[id_col], pdf["geometry"])
        ]
        pieces = building_blocks_items(items)
        return pd.DataFrame(
            {
                "group": [pdf["__grp"].iloc[0]] * len(pieces),
                "piece_id": list(range(len(pieces))),
                "geometry": [p.wkb for p, *_ in pieces],
                "owners": [[str(o) for o in owners] for _, owners, _, _ in pieces],
                "degree": [d for _, _, d, _ in pieces],
                "area": [a for _, _, _, a in pieces],
            }
        )

    return work.groupBy("__grp").applyInPandas(
        run,
        schema=(
            "group bigint, piece_id bigint, geometry binary, "
            "owners array<string>, degree int, area double"
        ),
    )


def _regular_ngon(cx: float, cy: float, r: float, n: int = 16) -> Geometry:
    import math as _m

    pts = [
        (cx + r * _m.cos(2 * _m.pi * k / n), cy + r * _m.sin(2 * _m.pi * k / n))
        for k in range(n)
    ]
    return Geometry.polygon(pts)


def _shared_arc_midpoint(a: Geometry, b: Geometry):
    """Midpoint of the longest collinear boundary overlap between a and b
    (None if boundaries don't overlap)."""
    from ..geom.arrangement import _node, _segments_of
    import math as _m

    segs = _segments_of(a, 0) + _segments_of(b, 1)
    edges = _node(segs)
    best, best_len = None, 0.0
    for (u, v), tags in edges.items():
        if tags >= {0, 1}:
            L = _m.hypot(v[0] - u[0], v[1] - u[1])
            if L > best_len:
                best, best_len = (0.5 * (u[0] + v[0]), 0.5 * (u[1] + v[1])), L
    return best


def small_rook_to_queen(
    repaired: dict, min_rook_length: float, max_rounds: int = 6
) -> dict:
    """Iterate the disk pass to a fixed point: each round can itself
    create new short contacts where a disk boundary lands near an
    existing junction (the reference's queue machinery re-processes
    for the same reason)."""
    for _ in range(max_rounds):
        before = _short_pairs(repaired, min_rook_length)
        if not before:
            return repaired
        repaired = _small_rook_round(repaired, min_rook_length)
        after = _short_pairs(repaired, min_rook_length)
        if not after:
            return repaired
    return repaired


def _short_pairs(repaired: dict, min_rook_length: float) -> list:
    ids = sorted(repaired)
    out = []
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            i, j = ids[ai], ids[bi]
            gi, gj = repaired[i], repaired[j]
            if gi.is_empty or gj.is_empty:
                continue
            L = shared_boundary_length(gi, gj)
            if 0.0 < L < min_rook_length:
                out.append((i, j, L))
    return out


def _small_rook_round(repaired: dict, min_rook_length: float) -> dict:
    """Eliminate sub-threshold rook adjacencies (simplified variant of
    /root/reference/maup/smart_repair.py:1920-2155): cover each short
    shared arc with a 16-gon "disk" (radius 0.55×threshold² padded to
    clear the arc), give the disk∩footprint to the neighbor sharing the
    most boundary with it, subtract it from everyone else.  The old
    short contact becomes an arc of length ~πr > threshold, so one pass
    suffices; the partition property (no gaps/overlaps) is preserved
    because the disk region moves atomically."""
    ids = sorted(repaired)
    # find short rook arcs
    disks = []
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            i, j = ids[ai], ids[bi]
            gi, gj = repaired[i], repaired[j]
            if gi.is_empty or gj.is_empty:
                continue
            L = shared_boundary_length(gi, gj)
            if 0.0 < L < min_rook_length:
                mid = _shared_arc_midpoint(gi, gj)
                if mid is not None:
                    r = max(0.6 * L, 0.55 * min_rook_length)
                    disks.append(_regular_ngon(mid[0], mid[1], r))
    if not disks:
        return repaired
    # merge overlapping disks into blobs
    blob_union = union_all(disks)
    blobs = [Geometry("Polygon", rings) for rings in blob_union.polygons()]
    for blob in blobs:
        # the blob's share of the current footprint
        pieces = [
            (i, repaired[i].intersection(blob))
            for i in ids
            if not repaired[i].is_empty
        ]
        pieces = [(i, p) for i, p in pieces if p.area > 0]
        if not pieces:
            continue
        # owner: geometry sharing the most boundary with the blob ring
        owner = min(
            (i for i, _ in pieces),
            key=lambda i: (-shared_boundary_length(repaired[i], blob), i),
        )
        moved = union_all([p for _, p in pieces])
        for i, _ in pieces:
            if i != owner:
                repaired[i] = repaired[i].difference(blob)
        repaired[owner] = union_all([repaired[owner], moved])
    return repaired


def _snap_items(items: list[tuple], snap_precision: int | None, snapped: bool):
    """Extent-relative vertex snap (reference smart_repair(snapped=,
    snap_precision=), /root/reference/maup/smart_repair.py:49-62,162-220):
    large coordinate magnitudes get a coarser grid so the arrangement's
    fixed 1e-9 snap cannot mis-snap.  ``snap_precision`` = decimal
    places; default derives from the group extent (9 - digits-before-
    the-point, floored at 0).  No-op when the derived grid is finer than
    the kernel's own snap."""
    import math as _m

    import numpy as np

    if not snapped and snap_precision is None:
        return items
    if snap_precision is None:
        extent = max(
            (max(abs(v) for v in (*g.bounds,)) for _, g in items if not g.is_empty),
            default=1.0,
        )
        snap_precision = max(0, 9 - max(0, int(_m.floor(_m.log10(max(extent, 1.0))))))
    if snap_precision >= 9:
        return items  # the arrangement already snaps at 1e-9

    def snap_g(g: Geometry) -> Geometry:
        if g.gtype == "Polygon":
            return Geometry("Polygon", [np.round(r, snap_precision) for r in g.data])
        if g.gtype == "MultiPolygon":
            return Geometry(
                "MultiPolygon",
                [[np.round(r, snap_precision) for r in rings] for rings in g.data],
            )
        return g

    return [(i, snap_g(g)) for i, g in items]


def smart_repair(
    geoms: DataFrame,
    id_col: str = "id",
    regions: DataFrame | None = None,
    region_id: str = "region_id",
    fill_gaps: bool = True,
    fill_gaps_threshold: float | None = 0.1,
    min_rook_length: float | None = None,
    grid: CellGrid = DEFAULT_GRID,
    snapped: bool = True,
    snap_precision: int | None = None,
    method: str = "component",
    tile_res: int = 3,
) -> DataFrame:
    """Distributed smart_repair.

    With ``regions``, each geometry is assigned to the region of maximal
    overlap, cropped to it, and repaired *within* the region — one task
    per region, guaranteeing nesting
    (/root/reference/maup/smart_repair.py:261-328 semantics).  Without
    regions the layer is grouped by CONNECTED COMPONENT of the
    touches/overlaps graph (queen adjacencies → distributed label
    propagation) and each component repairs as an independent task.
    This is exact, not an approximation: overlap-tower faces, union
    holes, and sub-threshold rook contacts all live strictly inside one
    component (two geometries in different components share no boundary
    by definition), so per-component repair composes to the global
    answer.

    ``method="tiled"`` (regions=None only) switches to the PLANE-tiled
    path (operators.smart_repair_tiled): per-tile arrangements with a
    cross-tile face stitch, so even ONE giant connected component (a
    statewide all-touching precinct map) repairs across many tasks.
    Use it when the layer has no useful region nesting and its touch
    graph is one component; ``min_rook_length`` runs as the distributed
    blob pass (smart_repair_tiled.small_rook_to_queen_df).
    """
    if method == "tiled":
        if regions is not None:
            raise ValueError("method='tiled' does not take regions")
        from .smart_repair_tiled import smart_repair_tiled

        return smart_repair_tiled(
            geoms,
            id_col=id_col,
            fill_gaps=fill_gaps,
            fill_gaps_threshold=fill_gaps_threshold,
            tile_res=tile_res,
            snapped=snapped,
            snap_precision=snap_precision,
            min_rook_length=min_rook_length,
            grid=grid,
        )
    if method != "component":
        raise ValueError(f"unknown smart_repair method {method!r}")
    tid_type = dict(geoms.dtypes)[id_col]
    if regions is not None:
        from .assign import assign

        assignment = assign(
            geoms,
            regions,
            source_id=id_col,
            target_id=region_id,
            grid=grid,
        ).select(id_col, region_id)
        # broadcast, not closure capture: a captured dict is pickled into
        # EVERY task; the broadcast ships once per executor (spatial.py
        # geom_broadcast idiom) — matters at 10^5 regions x many stages
        from .spatial import geom_broadcast

        region_bc = geom_broadcast(regions, region_id)
        work = geoms.select(id_col, "geometry").join(assignment, id_col)

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            region_geoms = region_bc.value
            rid = pdf[region_id].iloc[0]
            clip = (
                Geometry.from_wkb(region_geoms[rid])
                if rid is not None and rid in region_geoms
                else None
            )
            items = []
            for i, b in zip(pdf[id_col], pdf["geometry"]):
                g = Geometry.from_wkb(b)
                if clip is not None:
                    g = g.intersection(clip)
                    g = union_all([Geometry("Polygon", r) for r in g.polygons()])
                items.append((i, g))
            items = _snap_items(items, snap_precision, snapped)
            rep = repair_items(items, fill_gaps, fill_gaps_threshold, min_rook_length)
            return pd.DataFrame(
                {
                    id_col: list(rep),
                    "geometry": [g.wkb if not g.is_empty else None for g in rep.values()],
                }
            )

        return work.groupBy(region_id).applyInPandas(
            run_group, schema=f"{id_col} {tid_type}, geometry binary"
        )

    def run_all(pdf: pd.DataFrame) -> pd.DataFrame:
        items = [
            (i, Geometry.from_wkb(b)) for i, b in zip(pdf[id_col], pdf["geometry"])
        ]
        items = _snap_items(items, snap_precision, snapped)
        rep = repair_items(items, fill_gaps, fill_gaps_threshold, min_rook_length)
        return pd.DataFrame(
            {
                id_col: list(rep),
                "geometry": [g.wkb if not g.is_empty else None for g in rep.values()],
            }
        )

    from .adjacencies import adjacencies
    from .components import connected_components

    pairs = adjacencies(
        geoms, id_col=id_col, adjacency_type="queen", grid=grid
    ).select(F.col("id_i").alias("src"), F.col("id_j").alias("dst"))
    comp = connected_components(
        geoms.select(F.col(id_col).alias("node")), pairs
    ).withColumnRenamed("node", id_col)
    work = geoms.select(id_col, "geometry").join(comp, id_col)
    return work.groupBy("comp").applyInPandas(
        run_all, schema=f"{id_col} {tid_type}, geometry binary"
    )
