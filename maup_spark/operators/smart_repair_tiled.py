"""Tiled ``smart_repair`` — parallelizes ONE giant connected component.

The per-component path (operators.smart_repair) is exact but a single
all-touching layer (a statewide precinct map) is one group and
serializes.  This module removes that last serialization point by
tiling the PLANE instead of the touches graph, the idiom of the
reference's owner-tile deduplication
(/root/reference/maup/smart_repair.py:625-665): every piece of the
planar arrangement is computed by the tile(s) it intersects and owned
exactly once.

Pipeline (every stage a cell join, a grouped Arrow task over
anomaly-sized groups, or an embarrassingly parallel map):

1. *clean*: make_valid + extent-relative vertex snap, per geometry.
2. *per-tile arrangement*: clip each candidate geometry to its tile and
   build the tile-local planar arrangement.  A face of the GLOBAL
   arrangement restricted to a tile keeps its cover set (cover is
   pointwise), so tile-local faces are global faces cut by tile lines.
   Faces covered by exactly one input need no coordination — they are
   emitted straight to their owner.  Only CONFLICT pieces (cover ≥ 2)
   and FREE pieces (cover ∅, gap candidates) enter the stitcher, so the
   cross-tile graph is anomaly-sized even when the layer is not.
3. *stitch*: pieces in adjacent tiles connect iff they share a
   positive-length interval on the shared tile edge AND the same cover
   set (an input boundary running exactly along a tile line correctly
   separates the faces).  Distributed connected components label the
   global faces.
4. *decide*: an overlap face goes to the covering input sharing the
   longest boundary with it, ties to the smallest id — the reference's
   reconstruct rule (/root/reference/maup/smart_repair.py:907-912),
   same rule as repair_items.  Free components touching the layer-bbox
   boundary are the outside and are dropped.
5. *assemble*: per-input union of its exclusive pieces + won faces.
6. *fill gaps*: hole faces (free components not touching the outer
   boundary, exterior-ring filled to the reference's full ring disk)
   join their cell-candidate repaired neighbors; each hole task applies
   the threshold rule and the multi-neighbor split
   (smart_repair.split_hole_among_neighbors), falling back to wholesale
   max-shared-perimeter absorption.
7. *reattach fragments*: geometries that came out disconnected keep
   their main part; small fragments are absorbed by shared perimeter
   (absorb_by_shared_perimeter — already distributed).

Deviations from the sequential path, both documented and bounded:
- the gap threshold compares against PRE-FILL neighbor areas (the
  sequential loop lets an earlier fill grow a neighbor before a later
  hole tests it — an order dependence the distributed form drops);
- ``min_rook_length`` runs as a distributed blob pass
  (``small_rook_to_queen_df``): within a round, blob moves use the
  round-START state instead of the sequential pass's evolving dict —
  identical unless two blobs nearly touch, in which case they merge
  into one blob here anyway.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.arrangement import (
    _dissolve,
    build_arrangement,
    intersection,
    make_valid,
    shared_boundary_length,
    union_all,
)
from ..geom.base import Geometry
from .tiling import _MIN_OVERLAP, _edge_intervals, _tile_rect, tile_grid_for

_MAX_PIECES = 1 << 20


def _snap_precision_for(extent: float) -> int:
    return max(0, 9 - max(0, int(math.floor(math.log10(max(extent, 1.0))))))


def _clean_layer(
    geoms: DataFrame,
    id_col: str,
    snapped: bool,
    snap_precision: int | None,
) -> DataFrame:
    """make_valid + extent-relative snap, as one Arrow map stage.
    Mirrors smart_repair._snap_items but derives the precision from the
    LAYER extent (one agg job) instead of per group."""
    import numpy as np

    from .tiling import layer_bounds

    if snapped and snap_precision is None:
        x0, y0, x1, y1 = layer_bounds(geoms)
        extent = max(abs(v) for v in (x0, y0, x1, y1))
        snap_precision = _snap_precision_for(extent)
    ndigits = snap_precision if (snapped or snap_precision is not None) else None
    if ndigits is not None and ndigits >= 9:
        ndigits = None  # the arrangement kernel already snaps at 1e-9

    def batch(b: pd.Series) -> pd.Series:
        out = []
        for x in b:
            if x is None:
                out.append(None)
                continue
            g = make_valid(Geometry.from_wkb(x))
            if ndigits is not None and g.gtype in ("Polygon", "MultiPolygon"):
                if g.gtype == "Polygon":
                    g = Geometry(
                        "Polygon", [np.round(r, ndigits) for r in g.data]
                    )
                else:
                    g = Geometry(
                        "MultiPolygon",
                        [[np.round(r, ndigits) for r in rs] for rs in g.data],
                    )
            out.append(g.wkb)
        return pd.Series(out)

    udf = F.pandas_udf(batch, "binary")
    return geoms.select(id_col, udf(F.col("geometry")).alias("geometry"))


def arrangement_pieces_tiled(
    cleaned: DataFrame, id_col: str, tile_res: int = 3
) -> tuple[DataFrame, object]:
    """(pieces, grid).  One row per (piece, tile-edge interval):

    piece_key, cell_id, kind ('solo'|'ovl'|'free'), owner (solo only),
    owners_key (sorted ids joined by ','), degree, area, touches_outer,
    wkb (first row of each piece only), edge_key, lo, hi.

    Solo pieces carry no intervals (they never need stitching — the
    per-owner union downstream reassembles them).
    """
    from .spatial import with_cell_cover

    spark = cleaned.sparkSession
    grid = tile_grid_for(cleaned, tile_res)
    n = grid.n
    covered = with_cell_cover(
        cleaned.select(F.col(id_col).alias("__i"), F.col("geometry").alias("__g")),
        grid,
        geom_col="__g",
    ).select("cell_id", "__i", "__g")
    all_tiles = spark.range(n * n).select(F.col("id").alias("cell_id"))
    work = covered.join(all_tiles, "cell_id", "right")

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf["cell_id"].iloc[0])
        tile = _tile_rect(grid, cell)
        tx0, ty0, tx1, ty1 = grid.cell_bounds(cell)
        iy, ix = divmod(cell, n)
        clips = []
        for i, b in zip(pdf["__i"], pdf["__g"]):
            if b is None:
                continue
            c = intersection(Geometry.from_wkb(b), tile)
            if not c.is_empty and c.area > 0:
                clips.append((i, c))
        clips.sort(key=lambda t: str(t[0]))  # row-order independence

        rows = {
            k: []
            for k in (
                "piece_key", "cell_id", "kind", "owner", "owners_key",
                "degree", "area", "touches_outer", "wkb", "edge_key",
                "lo", "hi",
            )
        }
        next_idx = [0]

        def emit(piece: Geometry, kind: str, owners: list, with_ivs: bool):
            if piece.area <= 0:
                return
            # keys are cell-strided: overflowing into the next tile's
            # key space would silently corrupt the cross-tile stitch
            assert next_idx[0] < _MAX_PIECES, (
                f"tile {cell} emitted >= {_MAX_PIECES} pieces; raise "
                "_MAX_PIECES or the tile resolution")
            key = cell * _MAX_PIECES + next_idx[0]
            next_idx[0] += 1
            okey = ",".join(str(o) for o in owners)
            ext = next(iter(piece.polygons()))[0]
            ivs = _edge_intervals(ext, tx0, ty0, tx1, ty1) if with_ivs else []
            outer = any(
                (s == "L" and ix == 0)
                or (s == "R" and ix == n - 1)
                or (s == "B" and iy == 0)
                or (s == "T" and iy == n - 1)
                for s, _, _ in ivs
            )
            stitched = []
            for s, lo, hi in ivs:
                if s == "L" and ix > 0:
                    ek = f"v:{ix}:{iy}"
                elif s == "R" and ix < n - 1:
                    ek = f"v:{ix + 1}:{iy}"
                elif s == "B" and iy > 0:
                    ek = f"h:{ix}:{iy}"
                elif s == "T" and iy < n - 1:
                    ek = f"h:{ix}:{iy + 1}"
                else:
                    continue
                stitched.append((ek, lo, hi))
            base = dict(
                piece_key=key, cell_id=cell, kind=kind,
                owner=str(owners[0]) if kind == "solo" else None,
                owners_key=okey, degree=len(owners), area=piece.area,
                touches_outer=outer,
            )
            if not stitched:
                stitched = [(None, 0.0, 0.0)]
            for j, (ek, lo, hi) in enumerate(stitched):
                for k, v in base.items():
                    rows[k].append(v)
                rows["wkb"].append(piece.wkb if j == 0 else None)
                rows["edge_key"].append(ek)
                rows["lo"].append(lo)
                rows["hi"].append(hi)

        if clips:
            geoms = [g for _, g in clips]
            ids = [i for i, _ in clips]
            arr = build_arrangement(geoms)

            def cover_of(x: float, y: float) -> frozenset:
                return frozenset(
                    k for k, g in enumerate(geoms) if g.contains_point(x, y)
                )

            for S in {c.cover for c in arr.cycles if c.cover}:
                region = _dissolve(
                    arr,
                    lambda cov, S=S: cov == S,
                    lambda x, y, S=S: cover_of(x, y) == S,
                )
                owners = sorted((ids[k] for k in S), key=str)
                kind = "solo" if len(S) == 1 else "ovl"
                for rings in region.polygons():
                    emit(Geometry("Polygon", rings), kind, owners, kind != "solo")
            free = tile.difference(union_all(geoms))
        else:
            free = tile
        for rings in free.polygons():
            emit(Geometry("Polygon", rings), "free", [], True)
        return pd.DataFrame(rows)

    flat = work.groupBy("cell_id").applyInPandas(
        per_tile,
        schema=(
            "piece_key bigint, cell_id bigint, kind string, owner string, "
            "owners_key string, degree int, area double, "
            "touches_outer boolean, wkb binary, edge_key string, "
            "lo double, hi double"
        ),
    )
    return flat.localCheckpoint(eager=False), grid


def _stitch_faces(flat: DataFrame) -> DataFrame:
    """Label conflict (ovl) and free pieces with their global face id.
    DataFrame[piece_key, comp, kind, owners_key, degree, area,
    touches_outer, wkb] — solo pieces are NOT here (they skip
    coordination entirely)."""
    from .components import connected_components

    todo = flat.filter(F.col("kind") != "solo")
    pieces = todo.groupBy("piece_key").agg(
        F.first("kind").alias("kind"),
        F.first("owners_key").alias("owners_key"),
        F.first("degree").alias("degree"),
        F.first("area").alias("area"),
        F.first("touches_outer").alias("touches_outer"),
        F.first("wkb", ignorenulls=True).alias("wkb"),
    )
    ivs = todo.filter(F.col("edge_key").isNotNull()).select(
        "piece_key", "owners_key", "edge_key", "lo", "hi"
    )
    a = ivs.select(
        F.col("piece_key").alias("pa"), "owners_key", "edge_key",
        F.col("lo").alias("lo_a"), F.col("hi").alias("hi_a"),
    )
    b = ivs.select(
        F.col("piece_key").alias("pb"), "owners_key", "edge_key",
        F.col("lo").alias("lo_b"), F.col("hi").alias("hi_b"),
    )
    edges = (
        a.join(b, ["edge_key", "owners_key"])
        .filter(F.col("pa") < F.col("pb"))
        .filter(
            F.least("hi_a", "hi_b") - F.greatest("lo_a", "lo_b")
            > F.lit(_MIN_OVERLAP)
        )
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    comp = connected_components(
        pieces.select(F.col("piece_key").alias("node")), edges
    )
    return pieces.join(comp.withColumnRenamed("node", "piece_key"), "piece_key")


def _assemble_faces(labeled: DataFrame, fill_exterior: bool) -> DataFrame:
    """Union each global face's pieces.  DataFrame[face_id, owners_key,
    degree, geometry, area].  ``fill_exterior`` emits the full ring disk
    (reference hole semantics); otherwise interior rings are kept."""

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        u = union_all([Geometry.from_wkb(b) for b in pdf["wkb"]])
        okey = pdf["owners_key"].iloc[0]
        deg = int(pdf["degree"].iloc[0])
        ids, oks, degs, wkbs, areas = [], [], [], [], []
        for k, rings in enumerate(u.polygons()):
            g = Geometry("Polygon", [rings[0]] if fill_exterior else rings)
            # comp labels are min piece_keys (often consecutive): a >=64-
            # part union would collide with component comp+1's id space
            assert k < 64, "stitched component unioned into >=64 polygons"
            ids.append(int(pdf["comp"].iloc[0]) * 64 + k)
            oks.append(okey)
            degs.append(deg)
            wkbs.append(g.wkb)
            areas.append(g.area)
        return pd.DataFrame(
            {
                "face_id": ids, "owners_key": oks, "degree": degs,
                "geometry": wkbs, "area": areas,
            }
        )

    return labeled.groupBy("comp").applyInPandas(
        assemble,
        schema=(
            "face_id bigint, owners_key string, degree int, "
            "geometry binary, area double"
        ),
    )


def _decide_overlap_faces(
    faces: DataFrame, cleaned: DataFrame, id_col: str
) -> DataFrame:
    """Assign each overlap face to the covering input sharing the most
    boundary (ties → smallest id).  DataFrame[owner string, geometry]."""
    exploded = faces.select(
        "face_id",
        "geometry",
        F.explode(F.split("owners_key", ",")).alias("__owner"),
    )
    # carry the NATIVE id alongside the string key: ties must break on
    # the original id ordering (5 < 10), not lexicographic ("10" < "5")
    # — the component path's rule (smart_repair.repair_items)
    withg = exploded.join(
        cleaned.select(
            F.col(id_col).cast("string").alias("__owner"),
            F.col(id_col).alias("__oid"),
            F.col("geometry").alias("__og"),
        ),
        "__owner",
    )

    def decide(pdf: pd.DataFrame) -> pd.DataFrame:
        face = Geometry.from_wkb(pdf["geometry"].iloc[0])
        best = min(
            zip(pdf["__oid"], pdf["__owner"], pdf["__og"]),
            key=lambda t: (
                -shared_boundary_length(face, Geometry.from_wkb(t[2])),
                t[0],
            ),
        )
        return pd.DataFrame({"owner": [best[1]], "geometry": [face.wkb]})

    return withg.groupBy("face_id").applyInPandas(
        decide, schema="owner string, geometry binary"
    )


def _fill_gaps(
    holes: DataFrame,
    repaired0: DataFrame,
    id_col: str,
    id_type: str,
    fill_gaps_threshold: float | None,
    grid,
) -> DataFrame:
    """Gap assignment rows [owner <id_type>, geometry]: per hole apply
    the threshold rule, the multi-neighbor split, or wholesale
    absorption — neighbors come from a cell-candidate join against the
    PRE-FILL repaired layer (see module docstring for the
    order-dependence note).  Owner ids stay NATIVE throughout so ties
    break like the component path's (5 < 10, not "10" < "5")."""
    from .smart_repair import split_hole_among_neighbors
    from .spatial import with_cell_cover

    h = with_cell_cover(
        holes.select(F.col("face_id").alias("__h"), F.col("geometry").alias("__hg")),
        grid,
        geom_col="__hg",
    ).select("cell_id", "__h", "__hg")
    r = with_cell_cover(
        repaired0.select(
            F.col(id_col).alias("__i"),
            F.col("geometry").alias("__rg"),
        ),
        grid,
        geom_col="__rg",
    ).select("cell_id", "__i", "__rg")
    cand = h.join(r, "cell_id").dropDuplicates(["__h", "__i"])

    thr = fill_gaps_threshold

    def per_hole(pdf: pd.DataFrame) -> pd.DataFrame:
        hole = Geometry.from_wkb(pdf["__hg"].iloc[0])
        neigh = {}
        for i, b in zip(pdf["__i"], pdf["__rg"]):
            if b is None:
                continue
            g = Geometry.from_wkb(b)
            L = shared_boundary_length(hole, g)
            if L > 0:
                neigh[i] = (L, g)
        out_owner, out_wkb = [], []
        if neigh:
            ok = True
            if thr is not None:
                max_adj = max(g.area for _, g in neigh.values())
                ok = hole.area <= thr * max_adj
            if ok:
                split = None
                if len(neigh) >= 2:
                    split = split_hole_among_neighbors(
                        hole, {i: g for i, (_, g) in neigh.items()}
                    )
                if split is not None:
                    for i, piece in split.items():
                        out_owner.append(i)
                        out_wkb.append(piece.wkb)
                else:
                    best = min(
                        sorted(neigh), key=lambda i: (-neigh[i][0], i)
                    )
                    out_owner.append(best)
                    out_wkb.append(hole.wkb)
        return pd.DataFrame({"owner": out_owner, "geometry": out_wkb})

    return cand.groupBy("__h").applyInPandas(
        per_hole, schema=f"owner {id_type}, geometry binary"
    )


def _reattach_fragments_df(
    repaired: DataFrame,
    id_col: str,
    disconnection_threshold: float,
    grid,
) -> DataFrame:
    """Distributed reattach_fragments: keep each geometry's main parts,
    route small fragments to the neighbor sharing the most boundary
    (absorb_by_shared_perimeter), back to the source when isolated."""
    from .repair import absorb_by_shared_perimeter

    def split_parts(batches):
        for pdf in batches:
            ids, kinds, wkbs = [], [], []
            for i, b in zip(pdf[id_col], pdf["geometry"]):
                if b is None:
                    ids.append(i)
                    kinds.append("keep")
                    wkbs.append(None)
                    continue
                g = Geometry.from_wkb(b)
                polys = list(g.polygons())
                if len(polys) <= 1:
                    ids.append(i)
                    kinds.append("keep")
                    wkbs.append(b)
                    continue
                areas = [abs(Geometry("Polygon", r).area) for r in polys]
                main = max(range(len(polys)), key=lambda k: areas[k])
                total = sum(areas)
                keep = [polys[main]]
                for k, rings in enumerate(polys):
                    if k == main:
                        continue
                    if areas[k] < disconnection_threshold * total:
                        ids.append(i)
                        kinds.append("frag")
                        wkbs.append(Geometry("Polygon", rings).wkb)
                    else:
                        keep.append(rings)
                kept = (
                    Geometry("Polygon", keep[0])
                    if len(keep) == 1
                    else Geometry("MultiPolygon", keep)
                )
                ids.append(i)
                kinds.append("keep")
                wkbs.append(kept.wkb)
            if ids:
                yield pd.DataFrame(
                    {id_col: ids, "kind": kinds, "geometry": wkbs}
                )

    id_type = dict(repaired.dtypes)[id_col]
    parts = repaired.mapInPandas(
        split_parts, schema=f"{id_col} {id_type}, kind string, geometry binary"
    ).localCheckpoint(eager=False)
    frags = parts.filter(F.col("kind") == "frag").select(
        F.monotonically_increasing_id().alias("__fid"),
        F.col(id_col).alias("__src"),
        "geometry",
    )
    kept = parts.filter(F.col("kind") == "keep").select(id_col, "geometry")
    if frags.isEmpty():
        return kept
    frags = frags.localCheckpoint(eager=True)  # stable __fid across uses
    absorbed = absorb_by_shared_perimeter(
        frags.select(F.col("__fid").alias("source_id"), "geometry"),
        kept,
        source_id="source_id",
        target_id=id_col,
        relative_threshold=None,
        grid=grid,
    )
    # absorb_by_shared_perimeter absorbs every fragment that intersects
    # ANY target; isolated ones simply vanish from its output, so add
    # them back onto their source id here (the component path's rule).
    lost = frags.join(
        _fragment_hits(frags, kept, id_col, grid), "__fid", "left_anti"
    )
    if lost.isEmpty():
        return absorbed
    extra = lost.select(F.col("__src").alias(id_col), "geometry")
    merged = absorbed.unionByName(extra)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        gs = [Geometry.from_wkb(b) for b in pdf["geometry"] if b is not None]
        u = union_all(gs) if gs else Geometry.empty()
        return pd.DataFrame(
            {
                id_col: [pdf[id_col].iloc[0]],
                "geometry": [u.wkb if not u.is_empty else None],
            }
        )

    return merged.groupBy(id_col).applyInPandas(
        merge, schema=f"{id_col} {id_type}, geometry binary"
    )


def _fragment_hits(frags: DataFrame, kept: DataFrame, id_col: str, grid):
    """__fid of fragments sharing any boundary/area with any kept
    geometry (cell-candidate join + length test)."""
    from .intersections import intersections

    ix = intersections(
        frags.select(F.col("__fid").alias("source_id"), "geometry"),
        kept.select(F.col(id_col).alias("target_id"), "geometry"),
        source_id="source_id",
        target_id="target_id",
        grid=grid,
        keep_geometry=False,
    )
    return (
        ix.filter((F.col("length") > 0) | (F.col("area") > 0))
        .select(F.col("source_id").alias("__fid"))
        .distinct()
    )


def small_rook_to_queen_df(
    repaired: DataFrame,
    id_col: str,
    min_rook_length: float,
    grid=None,
    max_rounds: int = 6,
) -> DataFrame:
    """Distributed ``small_rook_to_queen`` (component-path semantics,
    operators/smart_repair.py:_small_rook_round): per round,

    1. sub-threshold rook contacts come from the distributed
       ``adjacencies`` length column;
    2. each short pair's shared-arc midpoint gets a 16-gon disk; disks
       merge into blobs (cell-candidate bbox graph → connected
       components → per-group union → polygon explode);
    3. each blob task moves the blob's footprint share to the geometry
       sharing the most boundary with the blob (smallest id on ties) and
       subtracts the blob from every other toucher;
    4. updates apply per geometry in one grouped pass — blobs are
       disjoint so update order is immaterial (the sequential path's
       within-round evolution only matters for nearly-touching disks,
       which merge into one blob here).

    Rounds iterate to a fixed point like the sequential pass (a disk
    boundary can land near an existing junction and create a new short
    contact)."""
    from .adjacencies import adjacencies
    from .components import connected_components
    from .smart_repair import _regular_ngon, _shared_arc_midpoint
    from .spatial import DEFAULT_GRID, with_cell_cover

    grid = grid or DEFAULT_GRID
    id_type = dict(repaired.dtypes)[id_col]
    for _ in range(max_rounds):
        repaired = repaired.localCheckpoint(eager=False)
        adjs = adjacencies(
            repaired.filter(F.col("geometry").isNotNull()),
            id_col=id_col,
            adjacency_type="rook",
            grid=grid,
        )
        short = adjs.filter(
            (F.col("length") > 0) & (F.col("length") < float(min_rook_length))
        ).select("id_i", "id_j")
        if short.isEmpty():
            return repaired

        g = repaired.select(
            F.col(id_col).alias("__i"), F.col("geometry").alias("__gi")
        )
        pairs = short.join(
            g.withColumnRenamed("__i", "id_i").withColumnRenamed("__gi", "__a"),
            "id_i",
        ).join(
            g.withColumnRenamed("__i", "id_j").withColumnRenamed("__gi", "__b"),
            "id_j",
        )

        mrl = float(min_rook_length)

        def make_disks(batches):
            for pdf in batches:
                out = []
                for a, b in zip(pdf["__a"], pdf["__b"]):
                    ga, gb = Geometry.from_wkb(a), Geometry.from_wkb(b)
                    mid = _shared_arc_midpoint(ga, gb)
                    if mid is None:
                        continue
                    L = shared_boundary_length(ga, gb)
                    r = max(0.6 * L, 0.55 * mrl)
                    out.append(_regular_ngon(mid[0], mid[1], r).wkb)
                if out:
                    yield pd.DataFrame({"geometry": out})

        disks = pairs.mapInPandas(
            make_disks, schema="geometry binary"
        ).withColumn("__did", F.monotonically_increasing_id())
        disks = disks.localCheckpoint(eager=True)  # stable __did
        # blob = connected group of bbox-overlapping disks (coarser than
        # geometric overlap; the union + polygon explode below re-splits
        # disjoint groups, so the result matches the sequential union)
        dcov = with_cell_cover(disks, grid).select(
            "cell_id", "__did", "__b_xmin", "__b_ymin", "__b_xmax", "__b_ymax"
        )
        a = dcov.select(
            F.col("__did").alias("da"), "cell_id",
            F.col("__b_xmin").alias("ax0"), F.col("__b_ymin").alias("ay0"),
            F.col("__b_xmax").alias("ax1"), F.col("__b_ymax").alias("ay1"),
        )
        b = dcov.select(
            F.col("__did").alias("db"), "cell_id",
            F.col("__b_xmin").alias("bx0"), F.col("__b_ymin").alias("by0"),
            F.col("__b_xmax").alias("bx1"), F.col("__b_ymax").alias("by1"),
        )
        edges = (
            a.join(b, "cell_id")
            .filter(F.col("da") < F.col("db"))
            .filter(
                (F.least("ax1", "bx1") >= F.greatest("ax0", "bx0"))
                & (F.least("ay1", "by1") >= F.greatest("ay0", "by0"))
            )
            .select(F.col("da").alias("src"), F.col("db").alias("dst"))
            .distinct()
        )
        comp = connected_components(
            disks.select(F.col("__did").alias("node")), edges
        )

        def union_blob(pdf: pd.DataFrame) -> pd.DataFrame:
            u = union_all([Geometry.from_wkb(x) for x in pdf["geometry"]])
            out = []
            for k, rings in enumerate(u.polygons()):
                assert k < 64, "disk blob unioned into >=64 polygons"
                out.append(Geometry("Polygon", rings).wkb)
            return pd.DataFrame(
                {
                    "blob_id": [
                        int(pdf["comp"].iloc[0]) * 64 + k
                        for k in range(len(out))
                    ],
                    "geometry": out,
                }
            )

        blobs = (
            disks.join(comp.withColumnRenamed("node", "__did"), "__did")
            .groupBy("comp")
            .applyInPandas(union_blob, schema="blob_id bigint, geometry binary")
        )

        # blob ↔ candidate geometries (bbox cell join), one task per blob
        bcov = with_cell_cover(
            blobs.select("blob_id", F.col("geometry").alias("__blob")), grid,
            geom_col="__blob",
        ).select("cell_id", "blob_id", "__blob")
        gcov = with_cell_cover(
            repaired.filter(F.col("geometry").isNotNull()).select(
                F.col(id_col).alias("__i"), F.col("geometry").alias("__gi")
            ),
            grid,
            geom_col="__gi",
        ).select("cell_id", "__i", "__gi")
        cand = bcov.join(gcov, "cell_id").dropDuplicates(["blob_id", "__i"])

        def per_blob(pdf: pd.DataFrame) -> pd.DataFrame:
            blob = Geometry.from_wkb(pdf["__blob"].iloc[0])
            pieces = []
            for i, x in zip(pdf["__i"], pdf["__gi"]):
                gi = Geometry.from_wkb(x)
                p = gi.intersection(blob)
                if not p.is_empty and p.area > 0:
                    pieces.append((i, gi, p))
            ids_out, roles, wkbs = [], [], []
            if pieces:
                owner = min(
                    pieces,
                    key=lambda t: (-shared_boundary_length(t[1], blob), t[0]),
                )[0]
                moved = union_all([p for _, _, p in pieces])
                for i, _gi, _p in pieces:
                    if i == owner:
                        ids_out.append(i)
                        roles.append("win")
                        wkbs.append(moved.wkb)
                    else:
                        ids_out.append(i)
                        roles.append("lose")
                        wkbs.append(blob.wkb)
            return pd.DataFrame(
                {id_col: ids_out, "role": roles, "geometry": wkbs}
            )

        updates = cand.groupBy("blob_id").applyInPandas(
            per_blob, schema=f"{id_col} {id_type}, role string, geometry binary"
        )

        def apply_updates(pdf: pd.DataFrame) -> pd.DataFrame:
            base = next(
                (x for r, x in zip(pdf["role"], pdf["geometry"]) if r == "base"),
                None,
            )
            g0 = Geometry.from_wkb(base) if base is not None else Geometry.empty()
            for r, x in zip(pdf["role"], pdf["geometry"]):
                if r == "lose":
                    g0 = g0.difference(Geometry.from_wkb(x))
            wins = [
                Geometry.from_wkb(x)
                for r, x in zip(pdf["role"], pdf["geometry"])
                if r == "win"
            ]
            if wins:
                g0 = union_all([g0] + wins)
            return pd.DataFrame(
                {
                    id_col: [pdf[id_col].iloc[0]],
                    "geometry": [g0.wkb if not g0.is_empty else None],
                }
            )

        tagged = repaired.select(
            id_col, F.lit("base").alias("role"), "geometry"
        ).unionByName(updates)
        repaired = tagged.groupBy(id_col).applyInPandas(
            apply_updates, schema=f"{id_col} {id_type}, geometry binary"
        )
    return repaired


def smart_repair_tiled(
    geoms: DataFrame,
    id_col: str = "id",
    fill_gaps: bool = True,
    fill_gaps_threshold: float | None = 0.1,
    tile_res: int = 3,
    snapped: bool = True,
    snap_precision: int | None = None,
    disconnection_threshold: float = 1e-4,
    min_rook_length: float | None = None,
    grid=None,
) -> DataFrame:
    """smart_repair with plane tiling instead of component grouping —
    the path for a layer that is ONE giant connected component (the
    per-component path's documented serialization,
    operators/smart_repair.py ``run_all``).

    Returns DataFrame[id, geometry] (geometry NULL when an input was
    entirely swallowed by overlaps, matching the component path's empty
    output)."""
    from .spatial import DEFAULT_GRID

    grid = grid or DEFAULT_GRID
    id_type = dict(geoms.dtypes)[id_col]
    cleaned = _clean_layer(geoms, id_col, snapped, snap_precision)
    cleaned = cleaned.localCheckpoint(eager=False)

    flat, tgrid = arrangement_pieces_tiled(cleaned, id_col, tile_res)

    solo = flat.filter(
        (F.col("kind") == "solo") & F.col("wkb").isNotNull()
    ).select(F.col("owner"), F.col("wkb").alias("geometry"))

    labeled = _stitch_faces(flat)
    ovl_faces = _assemble_faces(
        labeled.filter(F.col("kind") == "ovl"), fill_exterior=False
    )
    won = _decide_overlap_faces(ovl_faces, cleaned, id_col)

    assigned = solo.unionByName(won.select("owner", "geometry"))

    def union_group(pdf: pd.DataFrame) -> pd.DataFrame:
        u = union_all([Geometry.from_wkb(b) for b in pdf["geometry"]])
        return pd.DataFrame(
            {"owner": [pdf["owner"].iloc[0]], "geometry": [u.wkb]}
        )

    repaired0 = assigned.groupBy("owner").applyInPandas(
        union_group, schema="owner string, geometry binary"
    )
    repaired0 = repaired0.select(
        F.col("owner").cast(id_type).alias(id_col), "geometry"
    ).localCheckpoint(eager=False)

    if fill_gaps:
        free_labeled = labeled.filter(F.col("kind") == "free")
        outer_comps = (
            free_labeled.filter(F.col("touches_outer"))
            .select("comp")
            .distinct()
        )
        hole_pieces = free_labeled.join(outer_comps, "comp", "left_anti")
        holes = _assemble_faces(hole_pieces, fill_exterior=True)
        gap_rows = _fill_gaps(
            holes, repaired0, id_col, id_type, fill_gaps_threshold, grid
        ).select(F.col("owner").alias(id_col), "geometry")
        both = repaired0.unionByName(gap_rows)

        def merge(pdf: pd.DataFrame) -> pd.DataFrame:
            u = union_all([Geometry.from_wkb(b) for b in pdf["geometry"]])
            return pd.DataFrame(
                {id_col: [pdf[id_col].iloc[0]], "geometry": [u.wkb]}
            )

        repaired = both.groupBy(id_col).applyInPandas(
            merge, schema=f"{id_col} {id_type}, geometry binary"
        )
    else:
        repaired = repaired0

    repaired = _reattach_fragments_df(
        repaired, id_col, disconnection_threshold, grid
    )
    if min_rook_length is not None:
        repaired = small_rook_to_queen_df(
            repaired, id_col, min_rook_length, grid
        )
    # inputs swallowed entirely (no exclusive face, lost every overlap)
    missing = geoms.select(id_col).join(
        repaired.select(id_col), id_col, "left_anti"
    ).withColumn("geometry", F.lit(None).cast("binary"))
    return repaired.unionByName(missing)
