"""Plane-tiled smart_repair (operators/smart_repair_tiled.py): the
one-giant-connected-component path.

- exact parity with the per-component kernel on the dirty 5×5 lattice
  (areas AND the tie-break pattern: 5 < 10, not "10" < "5");
- a single-component lattice spreads across ≥ 8 tiles and conserves the
  union footprint exactly (no overlaps, no holes afterwards);
- gap fill through the stitcher matches the component path on the
  pacman fixture.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import sq_wkb


def _lattice(spark, n):
    from maup_spark.geom import vector as V

    def rect_batch(x0, y0, x1, y1):
        return V.batch_rect_wkb(
            x0.to_numpy(), y0.to_numpy(), x1.to_numpy(), y1.to_numpy()
        )

    rect_udf = F.pandas_udf(rect_batch, "binary").asNondeterministic()
    return (
        spark.range(n * n)
        .selectExpr(
            "id AS gid",
            f"CAST(id % {n} AS DOUBLE) AS x0",
            f"CAST(id DIV {n} AS DOUBLE) AS y0",
            f"CAST(id % {n} AS DOUBLE) + 1.2e0 AS x1",
            f"CAST(id DIV {n} AS DOUBLE) + 1.2e0 AS y1",
        )
        .withColumn("geometry", rect_udf("x0", "y0", "x1", "y1"))
        .select("gid", "geometry")
    )


def _areas(rows, id_col="gid"):
    from maup_spark.geom.base import Geometry

    return {
        r[id_col]: (
            Geometry.from_wkb(r["geometry"]).area if r["geometry"] else 0.0
        )
        for r in rows
    }


def test_tiled_matches_component_on_dirty_lattice(spark):
    from maup_spark.operators.smart_repair import smart_repair

    layer = _lattice(spark, 5)
    ref = _areas(smart_repair(layer, id_col="gid").collect())
    til = _areas(smart_repair(layer, id_col="gid", method="tiled").collect())
    assert set(ref) == set(til)
    for i in ref:
        assert til[i] == pytest.approx(ref[i], abs=1e-7), i
    # the closed form itself (catches a tie-break that merely agrees
    # with a wrong component result): corner 1.44, edges 1.2, interior 1
    for i, a in til.items():
        gx, gy = i % 5, i // 5
        expect = (1.2 if gx == 0 else 1.0) * (1.2 if gy == 0 else 1.0)
        assert a == pytest.approx(expect, abs=1e-7), i


def test_tiled_giant_component_spreads_and_conserves(spark):
    """One 256-polygon connected component: the component path would be
    ONE task; the tiled path must compute pieces in ≥ 8 tiles and
    conserve the union footprint exactly."""
    from maup_spark.operators.smart_repair_tiled import (
        _clean_layer,
        arrangement_pieces_tiled,
        smart_repair_tiled,
    )
    from maup_spark.operators.repair import count_holes
    from maup_spark.operators.adjacencies import count_overlaps

    n = 16
    layer = _lattice(spark, n)
    cleaned = _clean_layer(layer, "gid", True, None)
    flat, grid = arrangement_pieces_tiled(cleaned, "gid", tile_res=3)
    n_tiles = flat.select("cell_id").distinct().count()
    assert n_tiles >= 8  # the parallelism evidence: many tasks, one component

    rep = smart_repair_tiled(layer, id_col="gid", tile_res=3)
    rep = rep.localCheckpoint(eager=True)
    areas = _areas(rep.collect())
    assert len(areas) == n * n
    assert sum(areas.values()) == pytest.approx((n - 1 + 1.2) ** 2, abs=1e-6)
    # the repaired layer is a partition: no overlaps, no holes
    assert count_overlaps(rep.filter(F.col("geometry").isNotNull()), id_col="gid") == 0
    assert count_holes(rep.filter(F.col("geometry").isNotNull())) == 0


def test_tiled_gap_fill_matches_component_pacman(spark):
    from maup_spark.geom.base import Geometry
    from maup_spark.operators.smart_repair import smart_repair

    pac = Geometry.polygon(
        [(0, 0), (0, 3), (2, 3), (2, 2), (1, 2), (1, 1), (2, 1), (2, 0)]
    ).wkb
    df = spark.createDataFrame(
        [(0, pac), (1, sq_wkb(2, 0, 3, 3))], "id bigint, geometry binary"
    )
    ref = _areas(
        smart_repair(df, id_col="id", fill_gaps_threshold=None).collect(), "id"
    )
    til = _areas(
        smart_repair(
            df, id_col="id", fill_gaps_threshold=None, method="tiled"
        ).collect(),
        "id",
    )
    assert til == {k: pytest.approx(v, abs=1e-7) for k, v in ref.items()}
    # smart_repair SPLITS a multi-neighbor gap (unlike close_gaps'
    # winner-take-all): centroid star split of the unit mouth gives the
    # pacman its 3 arcs' sectors (0.75) and the bar its right arc (0.25)
    assert til[0] == pytest.approx(5.75, abs=1e-7)
    assert til[1] == pytest.approx(3.25, abs=1e-7)


def test_tiled_rejects_unsupported_combinations(spark):
    from maup_spark.operators.smart_repair import smart_repair

    layer = _lattice(spark, 2)
    with pytest.raises(ValueError):
        smart_repair(layer, id_col="gid", method="nope")
    with pytest.raises(ValueError):
        smart_repair(
            layer,
            id_col="gid",
            method="tiled",
            regions=layer.select(F.col("gid").alias("region_id"), "geometry"),
        )


def test_tiled_small_rook_to_queen(spark):
    """The distributed blob pass: the jittered toy-precinct fixture
    repaired through the TILED path with min_rook_length=0.05 must have
    no sub-0.05 rook edge and stay overlap-free — the same gate as the
    component path's srtq test."""
    import random

    from maup_spark.geom.base import Geometry
    from maup_spark.index.cells import CellGrid
    from maup_spark.operators.adjacencies import adjacencies
    from maup_spark.operators.repair import doctor
    from maup_spark.operators.smart_repair import smart_repair

    random.seed(2023)
    rows = []
    for i in range(3):
        for j in range(3):
            pts = (
                [(0.5 * i + 0.1 * k, 0.5 * j + (random.random() - 0.5) / 12) for k in range(6)]
                + [(0.5 * (i + 1) + (random.random() - 0.5) / 12, 0.5 * j + 0.1 * k) for k in range(1, 6)]
                + [(0.5 * (i + 1) - 0.1 * k, 0.5 * (j + 1) + (random.random() - 0.5) / 12) for k in range(1, 6)]
                + [(0.5 * i + (random.random() - 0.5) / 12, 0.5 * (j + 1) - 0.1 * k) for k in range(1, 5)]
            )
            rows.append((len(rows), Geometry.polygon(pts).wkb))
    layer = spark.createDataFrame(rows, "id bigint, geometry binary")
    grid = CellGrid(x0=-1, y0=-1, x1=3, y1=3, res=4)

    srtq = smart_repair(
        layer, id_col="id", method="tiled", min_rook_length=0.05, grid=grid
    )
    srtq_df = spark.createDataFrame(
        srtq.collect(), "id bigint, geometry binary"
    )
    lens = [r["length"] for r in adjacencies(srtq_df, grid=grid).collect()]
    assert min(lens) > 0.05, f"min rook length still {min(lens)}"
    after = doctor(srtq_df, grid=grid)
    assert after["source_overlaps"] == 0
