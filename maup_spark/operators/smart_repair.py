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


def split_hole_among_neighbors(hole: Geometry, neighbors: dict):
    """Split a multi-neighbor gap among its neighbors, reference-style
    (/root/reference/maup/smart_repair.py:1032-1145 outcome semantics):
    each boundary arc of the gap belongs to the geometry it coincides
    with; sectors from each arc to an interior split point go to that
    arc's owner.  Triangular 3-owner gaps use the INCENTER (exact
    reference rule); general gaps use the centroid star split.  Returns
    {owner_id: piece Geometry} or None when the gap is single-owner or
    the star split is invalid (non-star-shaped gap) — callers fall back
    to wholesale max-shared-perimeter absorption.  Not ported: the
    reference's convexify/funnel subdivision for non-star gaps; the
    fallback keeps the doctor contract (gap fully filled) with a
    documented shape deviation for that rare case."""
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
    for owner, pts in arcs:
        if pts[0] == pts[-1]:
            continue  # arc spans the whole ring — single owner, bail
        piece = Geometry.polygon(list(pts) + [center])
        pa = abs(piece.area)
        if pa <= 1e-15:
            continue
        # star-shape validation: every sector must lie inside the gap
        if intersection_area(piece, hole) < pa * (1.0 - 1e-9):
            return None
        total += pa
        pieces[owner] = (
            union_all([pieces[owner], piece]) if owner in pieces else piece
        )
    if abs(total - hole_area) > 1e-9 * max(1.0, hole_area) or not pieces:
        return None
    return pieces


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
    graph is one component; ``min_rook_length`` is not supported there.
    """
    if method == "tiled":
        if regions is not None:
            raise ValueError("method='tiled' does not take regions")
        if min_rook_length is not None:
            raise NotImplementedError(
                "min_rook_length under method='tiled' is not implemented; "
                "use the per-component path or regions"
            )
        from .smart_repair_tiled import smart_repair_tiled

        return smart_repair_tiled(
            geoms,
            id_col=id_col,
            fill_gaps=fill_gaps,
            fill_gaps_threshold=fill_gaps_threshold,
            tile_res=tile_res,
            snapped=snapped,
            snap_precision=snap_precision,
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
        region_geoms = {
            r[region_id]: bytes(r["geometry"])
            for r in regions.select(region_id, "geometry").collect()
        }
        work = geoms.select(id_col, "geometry").join(assignment, id_col)

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
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
