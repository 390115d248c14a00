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


def smart_repair(
    geoms: DataFrame,
    id_col: str = "id",
    regions: DataFrame | None = None,
    region_id: str = "region_id",
    fill_gaps: bool = True,
    fill_gaps_threshold: float | None = 0.1,
    min_rook_length: float | None = None,
    grid: CellGrid = DEFAULT_GRID,
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
    answer.  A single all-connected layer (one statewide precinct map)
    still serializes — that is what ``regions`` is for.
    """
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
