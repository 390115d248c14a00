"""Repair suite: holes/gaps/overlaps/doctor and geometry cleanup maps.

Reference semantics: /root/reference/maup/repair.py —
``holes_of_union`` (:74-103), ``close_gaps`` (:106-127),
``resolve_overlaps`` (:130-175), ``quick_repair``/``autorepair``
(:178-239), ``remove_repeated_vertices`` (:242-249), ``snap_to_grid``
(:252-258), ``crop_to`` (:261-280), ``expand_to`` (:283-308),
``doctor`` (:311-365), ``absorb_by_shared_perimeter`` (:463-510).

Physical shapes:

- *map stages* (snap, dedup-vertices, make_valid, crop, difference) are
  embarrassingly parallel Arrow-batch UDFs;
- *global unions* run as per-partition partial unions (map-side
  combine) followed by one final union of the partials — the treeReduce
  shape; at 100 TB the partial stage would group by coarse tile with
  boundary stitching, which the same kernel supports (the arrangement
  union is exact on any grouping);
- *absorb* is an intersections join (weight = shared boundary length) →
  window top-1 → grouped-map union per target.

Overlap/gap layers are anomaly-sized (≪ input), so broadcasting their
union back to the big layer is the scalable plan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.arrangement import union_all as _union_all
from ..geom.base import Geometry
from ..index.cells import CellGrid
from .assign import assign_to_max
from .intersections import intersections
from .spatial import DEFAULT_GRID


# ----------------------------------------------------------- global union


def union_all_df(geoms: DataFrame, geom_col: str = "geometry") -> Geometry:
    """Distributed n-ary union: per-partition partial unions, then one
    exact final union of the partials (shapely.union_all analog,
    /root/reference/maup/repair.py:84,266,294)."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        geoms_acc = []
        for pdf in batches:
            geoms_acc.extend(
                Geometry.from_wkb(b) for b in pdf[geom_col] if b is not None
            )
        if geoms_acc:
            yield pd.DataFrame({"geometry": [_union_all(geoms_acc).wkb]})

    partials = (
        geoms.select(geom_col)
        .mapInPandas(partial, schema="geometry binary")
        .collect()
    )
    return _union_all([Geometry.from_wkb(r["geometry"]) for r in partials])


def holes_of_union(geoms: DataFrame, geom_col: str = "geometry") -> DataFrame:
    """Interior rings of union(geoms) as rows (hole_id, geometry, area)."""
    u = union_all_df(geoms, geom_col)
    holes = []
    for rings in u.polygons():
        for hole in rings[1:]:
            holes.append(Geometry("Polygon", [hole]))
    spark = geoms.sparkSession
    rows = [(i, h.wkb, h.area) for i, h in enumerate(holes)]
    return spark.createDataFrame(rows, "hole_id bigint, geometry binary, area double")


def count_holes(geoms: DataFrame, geom_col: str = "geometry") -> int:
    return holes_of_union(geoms, geom_col).count()


# ----------------------------------------------------------------- absorb


def absorb_by_shared_perimeter(
    sources: DataFrame,
    targets: DataFrame,
    source_id: str = "source_id",
    target_id: str = "target_id",
    relative_threshold: float | None = None,
    grid: CellGrid = DEFAULT_GRID,
) -> DataFrame:
    """Merge each source into the target sharing the most boundary
    length (/root/reference/maup/repair.py:463-510).  Returns the full
    target layer with absorbed geometry.
    """
    if sources.isEmpty():
        return targets
    if targets.isEmpty():
        raise IndexError("targets must be nonempty")

    inters = intersections(
        sources, targets, source_id=source_id, target_id=target_id, grid=grid
    )
    assignment = assign_to_max(
        inters.select(source_id, target_id, F.col("length").alias("weight")),
        source_id,
        target_id,
    )

    if relative_threshold is not None:
        s_area = _with_area(sources, source_id)
        t_area = _with_area(targets, target_id)
        assignment = (
            assignment.join(s_area, source_id)
            .join(t_area.withColumnRenamed("__area", "__t_area"), target_id)
            .filter(F.col("__area") / F.col("__t_area") < F.lit(relative_threshold))
            .select(source_id, target_id)
        )

    grouped = assignment.join(
        sources.select(source_id, F.col("geometry").alias("__sgeom")), source_id
    ).join(
        targets.select(target_id, F.col("geometry").alias("__tgeom")), target_id
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [Geometry.from_wkb(b) for b in pdf["__sgeom"]]
        geoms.append(Geometry.from_wkb(pdf["__tgeom"].iloc[0]))
        return pd.DataFrame(
            {target_id: [pdf[target_id].iloc[0]], "geometry": [_union_all(geoms).wkb]}
        )

    tid_type = dict(targets.dtypes)[target_id]
    absorbed = grouped.groupBy(target_id).applyInPandas(
        merge_group, schema=f"{target_id} {tid_type}, geometry binary"
    )
    untouched = targets.join(absorbed.select(target_id), target_id, "left_anti")
    return untouched.select(target_id, "geometry").unionByName(absorbed)


def _with_area(df: DataFrame, id_col: str) -> DataFrame:
    from ..geom import vector as V

    area_udf = F.pandas_udf(V.batch_area, "double")
    return df.select(id_col, area_udf(F.col("geometry")).alias("__area"))


# ------------------------------------------------------- gaps & overlaps


def close_gaps(
    geoms: DataFrame,
    id_col: str = "id",
    relative_threshold: float | None = 0.1,
    grid: CellGrid = DEFAULT_GRID,
) -> DataFrame:
    """Absorb union-holes into the neighbor sharing the most perimeter
    (/root/reference/maup/repair.py:106-127)."""
    gaps = holes_of_union(geoms)
    if gaps.isEmpty():
        return geoms.select(id_col, "geometry")
    return absorb_by_shared_perimeter(
        gaps.select(F.col("hole_id").alias("source_id"), "geometry"),
        geoms.select(F.col(id_col).alias(id_col), "geometry"),
        source_id="source_id",
        target_id=id_col,
        relative_threshold=relative_threshold,
        grid=grid,
    )


def resolve_overlaps(
    geoms: DataFrame,
    id_col: str = "id",
    relative_threshold: float | None = 0.1,
    grid: CellGrid = DEFAULT_GRID,
) -> DataFrame:
    """Subtract pairwise overlaps, then re-absorb each overlap into the
    owner sharing the most perimeter (/root/reference/maup/repair.py:130-175).
    """
    from .adjacencies import adjacencies

    adjs = adjacencies(geoms, id_col=id_col, adjacency_type="queen", grid=grid)
    overlaps = adjs.filter(F.col("area") > 0)

    if relative_threshold is not None:
        areas = _with_area(geoms, id_col)
        overlaps = (
            overlaps.join(
                areas.withColumnRenamed("__area", "__ai").withColumnRenamed(
                    id_col, "id_i"
                ),
                "id_i",
            )
            .join(
                areas.withColumnRenamed("__area", "__aj").withColumnRenamed(
                    id_col, "id_j"
                ),
                "id_j",
            )
            .filter(
                (F.col("area") / F.col("__ai") < relative_threshold)
                & (F.col("area") / F.col("__aj") < relative_threshold)
            )
            .select("id_i", "id_j", "geometry", "area", "length")
        )

    overlap_rows = overlaps.select("id_i", "id_j", "geometry").collect()
    if not overlap_rows:
        return geoms.select(id_col, "geometry")

    # overlaps are anomaly-sized: union once, broadcast, subtract everywhere
    # (the reference subtracts union(to_remove) from every geometry,
    # /root/reference/maup/repair.py:163-168)
    overlap_union_wkb = _union_all(
        [Geometry.from_wkb(r["geometry"]) for r in overlap_rows]
    ).wkb

    def subtract(batch: pd.Series) -> pd.Series:
        cut = Geometry.from_wkb(overlap_union_wkb)
        return pd.Series(
            [
                Geometry.from_wkb(b).difference(cut).wkb if b is not None else None
                for b in batch
            ]
        )

    subtract_udf = F.pandas_udf(subtract, "binary")
    trimmed = geoms.select(
        id_col, subtract_udf(F.col("geometry")).alias("geometry")
    )

    spark = geoms.sparkSession
    pieces = spark.createDataFrame(
        [(i, r["geometry"]) for i, r in enumerate(overlap_rows)],
        "source_id bigint, geometry binary",
    )
    return absorb_by_shared_perimeter(
        pieces,
        trimmed,
        source_id="source_id",
        target_id=id_col,
        relative_threshold=None,
        grid=grid,
    )


def quick_repair(
    geoms: DataFrame,
    id_col: str = "id",
    relative_threshold: float | None = 0.1,
    grid: CellGrid = DEFAULT_GRID,
) -> DataFrame:
    """remove_repeated_vertices → make_valid → resolve_overlaps →
    close_gaps (/root/reference/maup/repair.py:178-239)."""
    cleaned = make_valid_df(remove_repeated_vertices(geoms, id_col), id_col)
    no_overlap = make_valid_df(
        resolve_overlaps(cleaned, id_col, relative_threshold, grid), id_col
    )
    return make_valid_df(
        close_gaps(no_overlap, id_col, relative_threshold, grid), id_col
    )


# ------------------------------------------------------------- map stages


def _map_geom(df: DataFrame, id_col: str, fn) -> DataFrame:
    def batch(b: pd.Series) -> pd.Series:
        return pd.Series(
            [fn(Geometry.from_wkb(x)).wkb if x is not None else None for x in b]
        )

    udf = F.pandas_udf(batch, "binary")
    return df.select(id_col, udf(F.col("geometry")).alias("geometry"))


def snap_to_grid(df: DataFrame, id_col: str = "id", n: int = -7) -> DataFrame:
    """Round every vertex to 10^n (/root/reference/maup/repair.py:252-258)."""
    import numpy as np

    def snap(g: Geometry) -> Geometry:
        def rnd(rings):
            return [np.round(r, -n) for r in rings]

        if g.gtype == "Polygon":
            return Geometry("Polygon", rnd(g.data))
        if g.gtype == "MultiPolygon":
            return Geometry("MultiPolygon", [rnd(r) for r in g.data])
        return g

    return _map_geom(df, id_col, snap)


def remove_repeated_vertices(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Drop consecutive duplicate vertices
    (/root/reference/maup/repair.py:242-249,397-424)."""
    import numpy as np

    def dedup_ring(r):
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]).any(axis=1)
        out = r[keep]
        if len(out) and (out[0] != out[-1]).any():
            out = np.vstack([out, out[:1]])
        return out

    def dedup(g: Geometry) -> Geometry:
        if g.gtype == "Polygon":
            return Geometry("Polygon", [dedup_ring(r) for r in g.data])
        if g.gtype == "MultiPolygon":
            return Geometry(
                "MultiPolygon", [[dedup_ring(r) for r in rings] for rings in g.data]
            )
        return g

    return _map_geom(df, id_col, dedup)


def make_valid_df(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Even-odd re-polygonization (shapely make_valid role,
    /root/reference/maup/repair.py:47-57)."""
    return _map_geom(df, id_col, lambda g: g.buffer0())


def crop_to(
    source: DataFrame,
    target: DataFrame,
    id_col: str = "id",
) -> DataFrame:
    """Intersect every source with union(targets)
    (/root/reference/maup/repair.py:261-280).  The target union is
    computed once and broadcast into a map stage."""
    cut_wkb = union_all_df(target).wkb

    def crop(g: Geometry) -> Geometry:
        return g.intersection(Geometry.from_wkb(cut_wkb))

    return _map_geom(source, id_col, crop)


def expand_to(
    source: DataFrame,
    target: DataFrame,
    id_col: str = "id",
    grid: CellGrid = DEFAULT_GRID,
) -> DataFrame:
    """Absorb target-minus-union(sources) leftovers into sources by
    shared perimeter (/root/reference/maup/repair.py:283-308)."""
    src_union_wkb = union_all_df(source).wkb

    def leftover_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cut = Geometry.from_wkb(src_union_wkb)
        for pdf in batches:
            parts = []
            for b in pdf["geometry"]:
                if b is None:
                    continue
                diff = Geometry.from_wkb(b).difference(cut)
                for rings in diff.polygons():
                    parts.append(Geometry("Polygon", rings).wkb)
            if parts:
                yield pd.DataFrame({"geometry": parts})

    leftovers = (
        target.select("geometry")
        .mapInPandas(leftover_iter, schema="geometry binary")
        .withColumn("source_id", F.monotonically_increasing_id())
    )
    if leftovers.isEmpty():
        return source.select(id_col, "geometry")
    return absorb_by_shared_perimeter(
        leftovers.select("source_id", "geometry"),
        source.select(id_col, "geometry"),
        source_id="source_id",
        target_id=id_col,
        relative_threshold=None,
        grid=grid,
    )


# ----------------------------------------------------------------- doctor


def is_valid_geom(g: Geometry) -> bool:
    """Validity proxy: polygonal, positive area, and self-noding the
    boundary introduces no cuts (catches bowties/self-intersections —
    the role of shp.is_valid at /root/reference/maup/repair.py:360)."""
    from ..geom.arrangement import _node, _segments_of

    polys = list(g.polygons())
    if not polys:
        return False
    if g.area <= 0:
        return False
    segs = _segments_of(g, 0)
    edges = _node(segs)
    return len(edges) == len(segs) == len({(min(p, q), max(p, q)) for p, q, _ in segs})


def doctor(
    source: DataFrame,
    target: DataFrame | None = None,
    id_col: str = "id",
    accept_holes: bool = False,
    grid: CellGrid = DEFAULT_GRID,
) -> dict:
    """Health check (/root/reference/maup/repair.py:311-365).

    Returns a stats dict with ``healthy: bool`` plus the individual
    counts, so callers (and tests) can see *why* a layer fails.
    """
    from .adjacencies import count_overlaps

    def invalid_count(df: DataFrame) -> int:
        def batch(b: pd.Series) -> pd.Series:
            return pd.Series(
                [not is_valid_geom(Geometry.from_wkb(x)) if x is not None else True for x in b]
            )

        udf = F.pandas_udf(batch, "boolean")
        return df.select(udf(F.col("geometry")).alias("bad")).filter("bad").count()

    stats: dict = {"healthy": True}
    shapefiles = [("source", source)]
    if target is not None:
        shapefiles.append(("target", target))
        su = union_all_df(source)
        tu = union_all_df(target)
        from ..geom.arrangement import build_arrangement

        arr = build_arrangement([su, tu])
        sym_area = arr.covered_area(lambda cov: len(cov) == 1)
        stats["symmetric_difference_area"] = sym_area
        if abs(sym_area) > 1e-9:
            stats["healthy"] = False

    for name, df in shapefiles:
        ov = count_overlaps(df, id_col=id_col, grid=grid)
        nh = count_holes(df)
        iv = invalid_count(df)
        stats[f"{name}_overlaps"] = ov
        stats[f"{name}_holes"] = nh
        stats[f"{name}_invalid"] = iv
        if ov or iv or (nh and not accept_holes):
            stats["healthy"] = False
    return stats
