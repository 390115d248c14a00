"""Named engine queries + their DuckDB oracle SQL.

Each entry in ``QUERIES`` is (callable(spark, sf_dir) -> DataFrame,
oracle_sql | None).  The Spark side exercises the real operators
(cell-index joins, vectorized refine, windows); the oracle re-derives
the same answer in closed-form ANSI SQL over the same parquet tables.
Geometry layers are grid-derived (maup_spark.datagen) precisely so the
oracles stay SQL-expressible; cross-engine float determinism notes are
inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import datagen as D
from .operators.assign import assign_points, assign_to_max
from .operators.intersections import intersections, prorate
from .operators.normalize import normalize
from .operators.spatial import DEFAULT_GRID, point_cell_col

# ---------------------------------------------------------------- helpers

_DISTRICT_OF_POINT = (
    "CASE WHEN (CAST(FLOOR((lon + 180.0e0) / 10.0e0) AS BIGINT) "
    "+ CAST(FLOOR((lat + 90.0e0) / 10.0e0) AS BIGINT)) % 7 <> 0 "
    "THEN CAST(FLOOR((lat + 90.0e0) / 10.0e0) AS BIGINT) * 36 "
    "+ CAST(FLOOR((lon + 180.0e0) / 10.0e0) AS BIGINT) END"
)

_PIECES_CTE = f"""
pts AS ({D.points_oracle_cte()}),
src AS (SELECT entity_id, lon - 1.5e0 AS x0, lat - 1.0e0 AS y0,
               lon + 1.5e0 AS x1, lat + 1.0e0 AS y1, n_chars FROM pts),
d AS ({D.districts_oracle_cte()}),
pieces AS (
  SELECT s.entity_id, d.district_id,
         (LEAST(s.x1, d.x1) - GREATEST(s.x0, d.x0))
       * (LEAST(s.y1, d.y1) - GREATEST(s.y0, d.y0)) AS area
  FROM src s JOIN d
    ON LEAST(s.x1, d.x1) > GREATEST(s.x0, d.x0)
   AND LEAST(s.y1, d.y1) > GREATEST(s.y0, d.y0)
)
"""


# ----------------------------------------------------------- query bodies


def q_assign_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship PIP assignment: documents' geotagged points → districts."""
    return assign_points(
        D.points(spark, sf_dir),
        D.districts(spark),
        point_id="entity_id",
        target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
    ).select("entity_id", "district_id")


def q_assign_points_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign_points(
        D.points(spark, sf_dir),
        D.districts(spark),
        point_id="entity_id",
        target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
        knn_fallback=True,
    ).select("entity_id", "district_id")


def q_point_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell index of each point — JVM-side arithmetic only."""
    return D.points(spark, sf_dir).select(
        "entity_id", point_cell_col(DEFAULT_GRID)
    )


def q_intersections_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon×polygon intersections (source rects × district grid)."""
    ix = intersections(
        D.source_rects(spark, sf_dir).select(
            "entity_id", "geometry", "x0", "y0", "x1", "y1"
        ),
        D.districts(spark),
        source_id="entity_id",
        target_id="district_id",
        source_bounds=("x0", "y0", "x1", "y1"),
        target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
    )
    return ix.select("entity_id", "district_id", "area")


def q_prorate_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end disaggregate→reaggregate: rect pieces weighted by
    area/source-area, n_chars prorated onto districts.  Sums go through
    DECIMAL(38,12) so they are order-invariant (distributed float sums
    are not)."""
    rects = D.source_rects(spark, sf_dir)
    pieces = intersections(
        rects.select("entity_id", "geometry", "x0", "y0", "x1", "y1"),
        D.districts(spark),
        source_id="entity_id",
        target_id="district_id",
        source_bounds=("x0", "y0", "x1", "y1"),
        target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
    )
    rect_area = float((2 * D.RX) * (2 * D.RY))
    weighted = pieces.withColumn("weight", F.col("area") / F.lit(rect_area))
    joined = weighted.join(rects.select("entity_id", "n_chars"), "entity_id")
    return (
        joined.withColumn(
            "term",
            F.round(F.col("n_chars") * F.col("weight"), 9).cast("decimal(38,12)"),
        )
        .groupBy("district_id")
        .agg(F.sum("term").cast("double").alias("n_chars_sum"))
    )


def q_normalize_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalize() on a relational weights table (integer-valued doubles
    → order-exact window sums)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("weight")
    )
    return normalize(li, level="l_orderkey", weight_col="weight", out_col="wnorm").select(
        "l_orderkey", "l_linenumber", "wnorm"
    )


def q_assign_to_max_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """assign_to_max() window top-1 with the reference tie-break."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("source_id"),
        F.col("l_linenumber").cast("bigint").alias("target_id"),
        F.col("l_quantity").alias("weight"),
    )
    return assign_to_max(li).selectExpr(
        "source_id AS l_orderkey", "target_id AS l_linenumber"
    )


# ------------------------------------------------------------- oracle SQL

ORACLES: dict[str, str] = {
    "assign_points": f"""
WITH pts AS ({D.points_oracle_cte()})
SELECT entity_id, {_DISTRICT_OF_POINT} AS district_id FROM pts
""",
    "assign_points_knn": f"""
WITH pts AS ({D.points_oracle_cte()}),
d AS ({D.districts_oracle_cte()}),
direct AS (SELECT entity_id, lon, lat, {_DISTRICT_OF_POINT} AS district_id FROM pts),
un AS (SELECT entity_id, lon, lat FROM direct WHERE district_id IS NULL),
cand AS (
  SELECT u.entity_id, d.district_id,
         SQRT(POWER(GREATEST(d.x0 - u.lon, u.lon - d.x1, 0.0e0), 2)
            + POWER(GREATEST(d.y0 - u.lat, u.lat - d.y1, 0.0e0), 2)) AS dist,
         ROW_NUMBER() OVER (
           PARTITION BY u.entity_id
           ORDER BY SQRT(POWER(GREATEST(d.x0 - u.lon, u.lon - d.x1, 0.0e0), 2)
                       + POWER(GREATEST(d.y0 - u.lat, u.lat - d.y1, 0.0e0), 2)),
                    d.district_id) AS rn
  FROM un u JOIN d
    ON GREATEST(d.x0 - u.lon, u.lon - d.x1, 0.0e0) < 11.25e0
   AND GREATEST(d.y0 - u.lat, u.lat - d.y1, 0.0e0) < 11.25e0
)
SELECT entity_id, district_id FROM direct WHERE district_id IS NOT NULL
UNION ALL
SELECT entity_id, district_id FROM cand WHERE rn = 1
""",
    "point_cells": f"""
WITH pts AS ({D.points_oracle_cte()})
SELECT entity_id, {DEFAULT_GRID.point_cell_sql('lon', 'lat')} AS cell_id FROM pts
""",
    "intersections_rects": f"""
WITH {_PIECES_CTE}
SELECT entity_id, district_id, area FROM pieces
""",
    "prorate_nchars": f"""
WITH {_PIECES_CTE}
SELECT p.district_id,
       CAST(SUM(CAST(ROUND(s.n_chars * (p.area / 6.0e0), 9) AS DECIMAL(38,12))) AS DOUBLE)
         AS n_chars_sum
FROM pieces p JOIN src s USING (entity_id)
GROUP BY p.district_id
""",
    "normalize_lineitem": """
SELECT l_orderkey, l_linenumber,
       CASE WHEN SUM(l_quantity) OVER (PARTITION BY l_orderkey) <> 0
            THEN l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey)
            ELSE 0.0e0 END AS wnorm
FROM lineitem
""",
    "assign_to_max_lineitem": """
SELECT l_orderkey, l_linenumber FROM (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_quantity DESC, l_linenumber ASC) AS rn
  FROM lineitem
) WHERE rn = 1
""",
}

QUERIES = {
    "assign_points": q_assign_points,
    "assign_points_knn": q_assign_points_knn,
    "point_cells": q_point_cells,
    "intersections_rects": q_intersections_rects,
    "prorate_nchars": q_prorate_nchars,
    "normalize_lineitem": q_normalize_lineitem,
    "assign_to_max_lineitem": q_assign_to_max_lineitem,
}
