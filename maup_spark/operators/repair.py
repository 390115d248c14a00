"""Repair suite: holes/gaps/overlaps/doctor and geometry cleanup maps.

Reference semantics: /root/reference/maup/repair.py —
``holes_of_union`` (:74-103), ``close_gaps`` (:106-127),
``resolve_overlaps`` (:130-175), ``quick_repair``/``autorepair``
(:178-239), ``remove_repeated_vertices`` (:242-249), ``snap_to_grid``
(:252-258), ``crop_to`` (:261-280), ``expand_to`` (:283-308),
``doctor`` (:311-365), ``absorb_by_shared_perimeter`` (:463-510).

Physical shapes:

- *map stages* (snap, dedup-vertices, make_valid) are embarrassingly
  parallel Arrow-batch UDFs;
- *localized reductions*: crop_to / expand_to / resolve_overlaps never
  build a global union — each geometry joins only its cell-candidate
  counterparts and clips/subtracts the LOCAL union inside one grouped
  Arrow task (s ∩ ∪T == s ∩ ∪candidates(T), exactly);
- *diagnostics* (doctor overlay areas, hole counting) run per-coarse-
  tile with boundary stitching (operators.tiling) — no union of the
  layer exists anywhere, driver or executor;
- *holes_of_union* (when hole GEOMETRY is needed, e.g. close_gaps)
  stitches per-tile free-space pieces into hole components and unions
  only the anomaly-sized pieces of each hole (operators.tiling) — no
  union of the layer exists anywhere, not even as one final task
  (``method="tree"`` keeps the old executor-side tree union);
- *absorb* is an intersections join (weight = shared boundary length) →
  window top-1 → grouped-map union per target.
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


def _partial_union_iter(geom_col: str):
    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        geoms_acc = []
        for pdf in batches:
            geoms_acc.extend(
                Geometry.from_wkb(b) for b in pdf[geom_col] if b is not None
            )
        if geoms_acc:
            yield pd.DataFrame({geom_col: [_union_all(geoms_acc).wkb]})

    return partial


def union_tree_df(
    geoms: DataFrame, geom_col: str = "geometry", fanin: int = 8
) -> DataFrame:
    """Exact n-ary union as a TREE of executor stages: per-partition
    partials → ``fanin`` partials → one final task.  Returns a 1-row
    DataFrame — the union never touches the driver (the round-1 pattern
    of collecting partials to the driver is gone).  The final task's
    input is ``fanin`` pre-unioned geometries, not the raw layer; for
    layers whose union itself is too big for one task, use the tiled
    reductions in ``operators.tiling`` instead of materializing a union
    at all."""
    partial = _partial_union_iter(geom_col)
    lvl1 = geoms.select(geom_col).mapInPandas(partial, f"{geom_col} binary")
    lvl2 = lvl1.repartition(fanin).mapInPandas(partial, f"{geom_col} binary")
    return lvl2.repartition(1).mapInPandas(partial, f"{geom_col} binary")


def union_all_df(geoms: DataFrame, geom_col: str = "geometry") -> Geometry:
    """Union as a driver-side Geometry object (shapely.union_all analog,
    /root/reference/maup/repair.py:84,266,294).  The union itself is
    computed on executors (``union_tree_df``); only the single final
    geometry crosses to the driver.  Convenience/API surface — hot paths
    (doctor, crop_to, expand_to, holes_of_union) do NOT call this."""
    rows = union_tree_df(geoms, geom_col).collect()
    if not rows:
        return Geometry.empty()
    return Geometry.from_wkb(rows[0][geom_col])


def holes_of_union(
    geoms: DataFrame,
    geom_col: str = "geometry",
    tile_res: int = 2,
    method: str = "tiled",
) -> DataFrame:
    """Interior rings of union(geoms) as rows (hole_id, geometry, area)
    (/root/reference/maup/repair.py:74-103).

    Default path is the TILED stitcher (operators.tiling
    ``holes_of_union_tiled``): per-tile free pieces → cross-tile
    component stitch → one grouped union per hole.  No union of the
    layer exists anywhere — not on the driver, not in a single final
    task; the only grouped work is per-HOLE, and holes are
    anomaly-sized by assumption even when the layer is not.

    ``method="tree"`` keeps the executor-side tree union (partials →
    fan-in → ONE final task extracting the rings).  Exact and
    driver-free, but the final task unions the partials of the whole
    layer — use only when the layer union itself is known to be small.
    """
    if method == "tiled":
        from .tiling import holes_of_union_tiled

        return holes_of_union_tiled(geoms, geom_col, tile_res).select(
            "hole_id", "geometry", "area"
        )
    if method != "tree":
        raise ValueError(f"unknown holes_of_union method {method!r}")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        geoms_acc = []
        for pdf in batches:
            geoms_acc.extend(
                Geometry.from_wkb(b) for b in pdf[geom_col] if b is not None
            )
        if not geoms_acc:
            return
        u = _union_all(geoms_acc)
        rows_w, rows_a = [], []
        for rings in u.polygons():
            for hole in rings[1:]:
                h = Geometry("Polygon", [hole])
                rows_w.append(h.wkb)
                rows_a.append(h.area)
        if rows_w:
            yield pd.DataFrame({"geometry": rows_w, "area": rows_a})

    partial = _partial_union_iter(geom_col)
    lvl1 = geoms.select(geom_col).mapInPandas(partial, f"{geom_col} binary")
    lvl2 = lvl1.repartition(8).mapInPandas(partial, f"{geom_col} binary")
    holes = lvl2.repartition(1).mapInPandas(extract, "geometry binary, area double")
    return holes.withColumn("hole_id", F.monotonically_increasing_id()).select(
        "hole_id", "geometry", "area"
    )


def holes(
    geoms: DataFrame, id_col: str = "id", geom_col: str = "geometry"
) -> DataFrame:
    """Interior rings per GEOMETRY (/root/reference/maup/repair.py:74-81)
    — DataFrame[id, hole_idx, geometry, area], embarrassingly parallel.
    Non-polygonal rows raise TypeError, matching the reference."""
    id_type = dict(geoms.dtypes)[id_col]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, wkbs, areas = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[geom_col]):
                if b is None:
                    continue
                g = Geometry.from_wkb(b)
                if g.gtype not in ("Polygon", "MultiPolygon"):
                    raise TypeError(
                        "holes() requires polygonal geometries "
                        f"(got {g.gtype})"
                    )
                k = 0
                for rings in g.polygons():
                    for hole_ring in rings[1:]:
                        h = Geometry("Polygon", [hole_ring])
                        ids.append(i)
                        idxs.append(k)
                        wkbs.append(h.wkb)
                        areas.append(abs(h.area))
                        k += 1
            if ids:
                yield pd.DataFrame(
                    {id_col: ids, "hole_idx": idxs, "geometry": wkbs, "area": areas}
                )

    return geoms.select(id_col, geom_col).mapInPandas(
        extract,
        schema=f"{id_col} {id_type}, hole_idx bigint, geometry binary, area double",
    )


def count_holes(
    geoms: DataFrame, geom_col: str = "geometry", tile_res: int = 2
) -> int:
    """Number of holes of union(geoms), via the TILED free-space
    component count (operators.tiling) — no global union anywhere."""
    from .tiling import count_holes_tiled

    return count_holes_tiled(geoms, geom_col, tile_res)


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

    if overlaps.isEmpty():
        return geoms.select(id_col, "geometry")

    # deterministic piece ids from the owning pair — no driver round-trip
    pieces = overlaps.select(
        F.concat_ws(
            "_", F.col("id_i").cast("string"), F.col("id_j").cast("string")
        ).alias("__pid"),
        "geometry",
    )

    # Distributed subtract (the reference subtracts union(to_remove) from
    # every geometry, /root/reference/maup/repair.py:163-168): a geometry
    # only changes where an overlap piece actually intersects it, so a
    # cell-candidate join + per-geometry grouped subtract of the LOCAL
    # piece union is exact — and nothing is ever materialized on the
    # driver.  Overlap layers are anomaly-sized (<< input), so the piece
    # side broadcasts; at 10^8 dirty rows flip broadcast_targets off in
    # candidate_pairs and the same plan runs as a salted shuffle join.
    from .spatial import candidate_pairs

    cand = candidate_pairs(
        geoms.select(id_col, F.col("geometry").alias("__g")),
        pieces.select("__pid", F.col("geometry").alias("__og")),
        grid,
        source_geom="__g",
        target_geom="__og",
    )

    def subtract_group(pdf: pd.DataFrame) -> pd.DataFrame:
        g = Geometry.from_wkb(pdf["__g"].iloc[0])
        cut = _union_all([Geometry.from_wkb(b) for b in pdf["__og"]])
        return pd.DataFrame(
            {
                id_col: [pdf[id_col].iloc[0]],
                "geometry": [g.difference(cut).wkb],
            }
        )

    gid_type = dict(geoms.dtypes)[id_col]
    touched = cand.groupBy(id_col).applyInPandas(
        subtract_group, schema=f"{id_col} {gid_type}, geometry binary"
    )
    untouched = geoms.select(id_col, "geometry").join(
        touched.select(id_col), id_col, "left_anti"
    )
    trimmed = untouched.unionByName(touched)

    return absorb_by_shared_perimeter(
        pieces.withColumnRenamed("__pid", "source_id"),
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


# deprecated alias kept by the reference for backwards compatibility
# (/root/reference/maup/repair.py:178) — expose both names here too
autorepair = quick_repair


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
    grid: CellGrid = DEFAULT_GRID,
    warn_zero_area: bool = False,
) -> DataFrame:
    """Intersect every source with union(targets)
    (/root/reference/maup/repair.py:261-280).

    Distributed form: a source only overlaps the targets whose bboxes
    share a cell with it, and s ∩ (∪T) == s ∩ (∪ candidate T) — so a
    cell-candidate join + per-source grouped clip against the LOCAL
    candidate union is exact.  No global union, nothing on the driver;
    the per-group geometry count is bounded by local overlap fan-out,
    not layer size."""
    from .spatial import candidate_pairs

    cand = candidate_pairs(
        source.select(id_col, F.col("geometry").alias("__g")),
        target.select(F.col("geometry").alias("__t")),
        grid,
        source_geom="__g",
        target_geom="__t",
    )

    def clip_group(pdf: pd.DataFrame) -> pd.DataFrame:
        g = Geometry.from_wkb(pdf["__g"].iloc[0])
        cut = _union_all([Geometry.from_wkb(b) for b in pdf["__t"]])
        return pd.DataFrame(
            {id_col: [pdf[id_col].iloc[0]], "geometry": [g.intersection(cut).wkb]}
        )

    sid_type = dict(source.dtypes)[id_col]
    touched = cand.groupBy(id_col).applyInPandas(
        clip_group, schema=f"{id_col} {sid_type}, geometry binary"
    )
    untouched = (
        source.select(id_col)
        .join(touched.select(id_col), id_col, "left_anti")
        .withColumn("geometry", F.lit(Geometry.empty().wkb))
    )
    out = touched.unionByName(untouched)
    if warn_zero_area:
        # reference contract (/root/reference/maup/repair.py:271-278);
        # OPT-IN here because the count is an extra Spark job
        import warnings as _w

        from ..warnings_ import AreaCroppingWarning

        out = out.persist()
        n_zero = (
            _with_area(out, id_col)
            .filter((F.col("__area") <= 0) | F.col("__area").isNull())
            .count()
        )
        if n_zero:
            _w.warn(
                f"{n_zero} cropped geometries have zero area, likely due to "
                "large differences in the union of the geometries in your "
                "source and target shapefiles.",
                AreaCroppingWarning,
            )
    return out


def expand_to(
    source: DataFrame,
    target: DataFrame,
    id_col: str = "id",
    grid: CellGrid = DEFAULT_GRID,
) -> DataFrame:
    """Absorb target-minus-union(sources) leftovers into sources by
    shared perimeter (/root/reference/maup/repair.py:283-308).

    Distributed form: t − (∪S) == t − (∪ candidate S), so each target
    subtracts only the LOCAL union of its cell-candidate sources; a
    target with no candidates is leftover wholesale.  No global source
    union is ever built."""
    from pyspark.sql import Window

    from .spatial import candidate_pairs

    # real per-row key, not a bare geometry hash: a 64-bit collision (or
    # duplicate identical target rows) must NOT merge two targets into one
    # grouped-subtract group.  row_number within the hash bucket makes the
    # key unique and stays deterministic across re-evaluation (buckets are
    # ~1 row; ties are byte-identical rows, interchangeable by value).
    hash_bucket = Window.partitionBy(F.xxhash64("geometry")).orderBy(
        "geometry"
    )
    tgt = target.select(
        F.concat_ws(
            "#",
            F.xxhash64("geometry").cast("string"),
            F.row_number().over(hash_bucket).cast("string"),
        ).alias("__tkey"),
        F.col("geometry").alias("__t"),
    )
    cand = candidate_pairs(
        tgt,
        source.select(F.col("geometry").alias("__s")),
        grid,
        source_geom="__t",
        target_geom="__s",
    )

    def leftover_group(pdf: pd.DataFrame) -> pd.DataFrame:
        t = Geometry.from_wkb(pdf["__t"].iloc[0])
        cut = _union_all([Geometry.from_wkb(b) for b in pdf["__s"]])
        parts = [
            Geometry("Polygon", rings).wkb
            for rings in t.difference(cut).polygons()
        ]
        return pd.DataFrame({"geometry": parts})

    touched = cand.groupBy("__tkey").applyInPandas(
        leftover_group, schema="geometry binary"
    )

    def split_polys(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts = []
            for b in pdf["__t"]:
                for rings in Geometry.from_wkb(b).polygons():
                    parts.append(Geometry("Polygon", rings).wkb)
            if parts:
                yield pd.DataFrame({"geometry": parts})

    untouched = (
        tgt.join(cand.select("__tkey").distinct(), "__tkey", "left_anti")
        .select("__t")
        .mapInPandas(split_polys, schema="geometry binary")
    )
    leftovers = touched.unionByName(untouched).withColumn(
        "source_id", F.monotonically_increasing_id()
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
        # tiled overlay: area(∪S △ ∪T) = s + t − 2·area(∪S ∩ ∪T), each
        # term a per-tile clip+union sum — no global union anywhere
        from .tiling import overlay_areas_tiled

        areas = overlay_areas_tiled(source, target)
        sym_area = areas["source"] + areas["target"] - 2.0 * areas["both"]
        stats["source_union_area"] = areas["source"]
        stats["target_union_area"] = areas["target"]
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
