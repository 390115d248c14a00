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
from .index.cells import CellGrid
from .operators.spatial import DEFAULT_GRID, point_cell_col

# Cell grid for the RECT-overlay queries (3°×2° source rects ×
# 10°×10° districts): res 5 makes one cell (11.25° × 5.625°) larger
# than a source bbox, so the cover explode emits ≤ 4 rows per source
# instead of ~6 at the world default (res 7) — the explode Generate,
# not the candidate filter, is the bottleneck of these fully-codegen
# plans (measured on the 327.7M-row scaling workload: 9.4 s → ~5.5 s
# at local[32]).  Candidate pairs after the reference-point dedup are
# grid-INVARIANT (exactly one row per bbox-overlapping pair at any
# res), so results are identical; point queries keep the finer
# DEFAULT_GRID (a point covers one cell at any res — finer only
# shrinks its candidate fan-in).
_RECT_GRID = CellGrid(res=5)

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
        targets_are_rects=True,
    ).select("entity_id", "district_id")


def q_assign_points_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign_points(
        D.points(spark, sf_dir),
        D.districts(spark),
        point_id="entity_id",
        target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
        targets_are_rects=True,
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
        D.points(spark, sf_dir).selectExpr(
            "entity_id",
            "lon - 1.5e0 AS x0", "lat - 1.0e0 AS y0",
            "lon + 1.5e0 AS x1", "lat + 1.0e0 AS y1",
        ),
        D.districts(spark),
        source_id="entity_id",
        target_id="district_id",
        source_bounds=("x0", "y0", "x1", "y1"),
        target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
        rect_layers=True,
        keep_geometry=False,
        grid=_RECT_GRID,
    )
    return ix.select("entity_id", "district_id", "area")


def q_prorate_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end disaggregate→reaggregate: rect pieces weighted by
    area/source-area, n_chars prorated onto districts.  Sums go through
    DECIMAL(38,12) so they are order-invariant (distributed float sums
    are not)."""
    rects = D.points(spark, sf_dir).selectExpr(
        "entity_id",
        "lon - 1.5e0 AS x0", "lat - 1.0e0 AS y0",
        "lon + 1.5e0 AS x1", "lat + 1.0e0 AS y1",
        "n_chars",
    )
    pieces = intersections(
        rects.select("entity_id", "x0", "y0", "x1", "y1", "n_chars"),
        D.districts(spark),
        source_id="entity_id",
        target_id="district_id",
        source_bounds=("x0", "y0", "x1", "y1"),
        target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
        rect_layers=True,
        keep_geometry=False,
        carry_source_cols=("n_chars",),
        grid=_RECT_GRID,
    )
    rect_area = float((2 * D.RX) * (2 * D.RY))
    joined = pieces.withColumn("weight", F.col("area") / F.lit(rect_area))
    return (
        joined.withColumn(
            # canonical scaled-integer grid: ROUND(x*1e9) is the same
            # HALF-AWAY-FROM-ZERO op in Spark and DuckDB on the same
            # double, and BIGINT sums are order-invariant AND hash
            # identically everywhere (DECIMAL(38,9) values were exactly
            # equal cross-engine but hashed differently in the driver)
            "term_e9",
            F.round(F.col("n_chars") * F.col("weight") * F.lit(1.0e9)).cast("bigint"),
        )
        .groupBy("district_id")
        .agg(F.sum("term_e9").alias("n_chars_sum_e9"))
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
    # the kNN candidate set replicates the ENGINE's coarse ±1-cell ring
    # exactly (assign._knn_points: 16×16 coarse grid, 22.5° × 11.25°
    # cells, point ring unclamped-then-filtered, target covers clamped)
    # rather than approximating it with a radius — so the parity gate
    # holds for ANY target layer, not just ones with small gaps.
    "assign_points_knn": f"""
WITH pts AS ({D.points_oracle_cte()}),
d AS ({D.districts_oracle_cte()}),
direct AS (SELECT entity_id, lon, lat, {_DISTRICT_OF_POINT} AS district_id FROM pts),
un AS (
  SELECT entity_id, lon, lat,
         CAST(FLOOR((lon - (-180.0e0)) / 22.5e0) AS BIGINT) AS ix,
         CAST(FLOOR((lat - (-90.0e0)) / 11.25e0) AS BIGINT) AS iy
  FROM direct WHERE district_id IS NULL
),
dcov AS (
  SELECT district_id, x0, y0, x1, y1,
         LEAST(GREATEST(CAST(FLOOR((x0 - (-180.0e0)) / 22.5e0) AS BIGINT), 0), 15) AS tix0,
         LEAST(GREATEST(CAST(FLOOR((x1 - (-180.0e0)) / 22.5e0) AS BIGINT), 0), 15) AS tix1,
         LEAST(GREATEST(CAST(FLOOR((y0 - (-90.0e0)) / 11.25e0) AS BIGINT), 0), 15) AS tiy0,
         LEAST(GREATEST(CAST(FLOOR((y1 - (-90.0e0)) / 11.25e0) AS BIGINT), 0), 15) AS tiy1
  FROM d
),
cand AS (
  SELECT u.entity_id, c.district_id,
         SQRT(GREATEST(c.x0 - u.lon, u.lon - c.x1, 0.0e0)
            * GREATEST(c.x0 - u.lon, u.lon - c.x1, 0.0e0)
            + GREATEST(c.y0 - u.lat, u.lat - c.y1, 0.0e0)
            * GREATEST(c.y0 - u.lat, u.lat - c.y1, 0.0e0)) AS dist
  FROM un u JOIN dcov c
    ON c.tix0 <= u.ix + 1 AND c.tix1 >= u.ix - 1
   AND c.tiy0 <= u.iy + 1 AND c.tiy1 >= u.iy - 1
),
best AS (
  SELECT entity_id, district_id,
         ROW_NUMBER() OVER (PARTITION BY entity_id
                            ORDER BY dist, district_id) AS rn
  FROM cand
)
SELECT entity_id, district_id FROM direct WHERE district_id IS NOT NULL
UNION ALL
SELECT entity_id, district_id FROM best WHERE rn = 1
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
       CAST(SUM(CAST(ROUND(s.n_chars * (p.area / 6.0e0) * 1.0e9) AS BIGINT)) AS BIGINT)
         AS n_chars_sum_e9
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


# ------------------------------------------------- training-data pipeline

_CORPUS_SPARK = None  # built per call in _corpus


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthetic NEAR-duplicates (every 10th doc copied with
    a 3-token suffix) + EXACT duplicates (every 7th doc copied verbatim)
    so both the minhash/jaccard and the exact-dedup operators have real
    positives."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    docs = docs.repartition(n_part).select("doc_id", "text")
    # offsets far above any real doc_id: at 10^6+ documents the old
    # +1e6/+2e6 offsets collided with genuine ids and aliased unrelated
    # docs as duplicates (caught by scripts/bench_scale.py)
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra suffix token")).alias("text"),
    )
    exact = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(20_000_000_000_000)).alias("doc_id"), "text"
    )
    return docs.unionByName(near).unionByName(exact)


_CORPUS_CTE = """corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000000000 AS doc_id, text || ' extra suffix token' AS text
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 20000000000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
)"""

_SHINGLE_CTE = """tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w,
         UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM corpus
),
sh AS (
  SELECT doc_id,
         w || ' ' || LEAD(w, 1) OVER win || ' ' || LEAD(w, 2) OVER win AS shingle
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
),
shn AS (SELECT doc_id, shingle FROM sh WHERE shingle IS NOT NULL)"""

# numeric 32-bit md5-substring minhashes (mirrors functions.dedup —
# permutation i = hex digits [8*(i%4)+1 .. +8] of md5(shingle#(i//4));
# numeric mins keep Spark in HashAggregate; '0x' cast is the DuckDB
# twin of Spark's conv(substr(md5,..,8),16,10))
_MINHASH_CTE = (
    "mh AS (SELECT doc_id, "
    + ", ".join(
        f"MIN(CAST(concat('0x', substr(md5(shingle || '#{i // 4}'), {8 * (i % 4) + 1}, 8)) AS BIGINT)) AS m{i}"
        for i in range(8)
    )
    + " FROM shn GROUP BY doc_id),\nbands AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"CAST(m{2*b} AS VARCHAR) || '_' || CAST(m{2*b+1} AS VARCHAR) AS key FROM mh"
        for b in range(4)
    )
    + "),\ncand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b"
    " FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key"
    " AND a.doc_id < b.doc_id)"
)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import text_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = text_stats(docs)
    return out.select(
        "doc_id",
        F.col("len_chars").cast("long").alias("len_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_spaces").cast("long").alias("n_spaces"),
        "avg_token_len",
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import lang_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lang_id(docs).select(
        "doc_id", F.col("stopword_hits").cast("long").alias("stopword_hits"), "lang_pred"
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import quality_score

    return quality_score(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import doc_fingerprint

    return doc_fingerprint(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.dedup import exact_dedup

    return exact_dedup(_corpus(spark, sf_dir))


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_corpus(spark, sf_dir))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.dedup import ngram_jaccard

    return ngram_jaccard(_corpus(spark, sf_dir))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.dedup import simhash_signatures

    return simhash_signatures(_corpus(spark, sf_dir))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_part = spark.sparkContext.defaultParallelism
    out = cosine_topk(emb.repartition(n_part))
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim"
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.similarity import ann_lsh_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_part = spark.sparkContext.defaultParallelism
    return ann_lsh_pairs(emb.repartition(n_part))


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_part = spark.sparkContext.defaultParallelism
    out = ivf_topk(emb.repartition(n_part))
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim"
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.dedup import simhash_pairs

    return simhash_pairs(_corpus(spark, sf_dir))


def q_disaggregate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """disaggregate_by_weight under the gate: split each order's
    o_totalprice down to its lineitems proportionally to l_quantity
    (window share + one join; scaled-BIGINT output)."""
    from .operators.aggregate import disaggregate_by_weight

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "l_orderkey * 100 + l_linenumber AS source_id",
        "l_orderkey AS target_id",
        "l_quantity AS w",
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_orderkey AS target_id", "o_totalprice AS price"
    )
    out = disaggregate_by_weight(orders, li, ["price"], weight_col="w")
    return out.select(
        "source_id",
        "target_id",
        F.round(F.col("price_part") * 1e3).cast("bigint").alias("price_part_e3"),
    )


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import bpe_token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    out = bpe_token_count(docs.repartition(n_part))
    return out.select(
        "doc_id",
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
    )


def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the data-validation doctor): one-pass per-column
    nulls/distincts/min/max over the int+string columns of documents."""
    from .functions.profile import profile_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    return profile_table(
        docs.repartition(n_part), ["doc_id", "lang", "source", "n_chars"]
    )


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixture sampling: per-language keep fractions
    via a 60-bit md5 uniform — a pure filter, identical output at any
    parallelism (consistent hashing keeps prior samples stable as the
    corpus grows)."""
    from .functions.text import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    out = stratified_sample(
        docs.repartition(n_part),
        {"en": 0.5, "de": 1.0, "zh": 0.25},
        default_fraction=0.1,
    )
    return out.select("doc_id", "lang")


def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import repetition_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    return repetition_score(docs.repartition(n_part))


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate line removal: wrap every doc with a
    corpus-wide header and a 1-in-5 footer (synthetic boilerplate), run
    the corpus-level line-frequency dedup, and expect exactly the
    original text back."""
    from .functions.text import line_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    wrapped = docs.repartition(n_part).selectExpr(
        "doc_id",
        "concat('SHARED HEADER LINE\\n', text, '\\nFOOTER ',"
        " CAST(doc_id % 5 AS STRING)) AS text",
    )
    return line_dedup(wrapped, max_doc_freq=2)


def q_aggregate_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference README idiom (`sources[cols].groupby(assign(...))
    .sum()`) as one operator over the rect fixtures: covering-first
    assignment, max-area fallback (smallest-id ties), then one
    partial-aggregating shuffle of n_chars per district."""
    from .operators.aggregate import aggregate_by_assignment

    return aggregate_by_assignment(
        D.source_rects(spark, sf_dir),
        D.districts(spark),
        ["n_chars"],
        source_id="entity_id",
        target_id="district_id",
        source_bounds=("x0", "y0", "x1", "y1"),
        target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
        layers_are_rects=True,  # round 4: zero-Python codegen refine
        grid=_RECT_GRID,
    )


def q_novelty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming MinHash novelty filter under the
    gate (arrival order := doc_id): a doc survives iff it is the first
    arrival of EVERY one of its LSH band keys — i.e. it shares no band
    with any earlier doc.  The stream twin is byte-parity-tested
    against this in tests/test_streaming.py."""
    from .streaming.novelty import novelty_batch

    docs = _corpus(spark, sf_dir).withColumn("ts", F.col("doc_id"))
    return novelty_batch(docs).select("doc_id")


def _emb_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings + synthetic near-duplicate vectors: every 10th vector
    with coordinate 0 nudged (+0.05), every 20th additionally with
    coordinate 1 nudged — so clusters of size 2 and 3 exist (the size-3
    ones exercise label-propagation transitivity).  All math in DOUBLE
    on both engines; duplicate cosines ≈0.999 vs random-pair <0.5, so
    the 0.9 threshold has a huge float-portability margin."""
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_part = spark.sparkContext.defaultParallelism
    base = base.repartition(n_part)
    nudge0 = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(10_000_000_000_000)).alias("vec_id"),
        F.expr(
            "concat(array(embedding[0] + 0.05D),"
            " slice(embedding, 2, size(embedding) - 1))"
        ).alias("embedding"),
    )
    nudge1 = base.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + F.lit(20_000_000_000_000)).alias("vec_id"),
        F.expr(
            "concat(slice(embedding, 1, 1), array(embedding[1] + 0.05D),"
            " slice(embedding, 3, size(embedding) - 2))"
        ).alias("embedding"),
    )
    return base.unionByName(nudge0).unionByName(nudge1)


def q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (brute-force) variant under the gate — same split as
    ivf_topk's stride-vs-kmeans: the oracle-checkable baseline here,
    the LSH-candidate scale path recall-tested in pytest."""
    from .functions.similarity import embedding_dedup

    return embedding_dedup(_emb_corpus(spark, sf_dir), threshold=0.9, method="exact")


def q_pages_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Determinism gate: extracted text must be byte-identical per url."""
    from .functions.multimodal import extract_text, pages

    return extract_text(pages(spark, sf_dir))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.multimodal import media_features, media_table

    out = media_features(media_table(spark, sf_dir))
    return out.select(
        "media_id", "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("first_byte").cast("int").alias("first_byte"),
    )


def q_intersections_triangles(
    spark: SparkSession, sf_dir: str, broadcast_targets: bool = True,
    exact_kernel: str = "auto",
) -> DataFrame:
    """Triangle×lattice overlay oracle.  The broadcast variant runs the
    DEFAULT kernel tiering (round 4: convex interior-overlap pairs take
    the Sutherland–Hodgman fast clip; touches and non-convex fall to
    the arrangement); the ``_shuffle`` variant pins
    ``exact_kernel="arrangement"`` so the general planar-arrangement
    boolean kernel itself stays oracle-gated.

    Determinism design: triangle anchors snap to a quarter-degree
    lattice (``FLOOR(lon*4)/4`` — dyadic, bit-identical in Spark and
    DuckDB) and legs are 2.5 with slope -1 hypotenuses, so every
    intersection area is an exact multiple of 1/32; the kernel's
    float noise (~1e-12) disappears under ROUND(area*32).  The oracle
    integrates the clipped triangle in closed form (piecewise trapezoid
    under the hypotenuse).

    ``broadcast_targets=False`` drives the salted-shuffle path (WKB
    rides the join; SortMergeJoin/ShuffledHashJoin, no
    BroadcastExchange) — registered as its own driver query so the
    big-both-sides plan is oracle-gated, not just parity-tested.
    """
    from .geom import vector as V

    tri_udf = F.pandas_udf(
        lambda a, b: V.batch_tri_wkb(a.to_numpy(), b.to_numpy(), 2.5), "binary"
    ).asNondeterministic()
    rect_udf = F.pandas_udf(
        lambda a, b, c, d: V.batch_rect_wkb(
            a.to_numpy(), b.to_numpy(), c.to_numpy(), d.to_numpy()
        ),
        "binary",
    ).asNondeterministic()

    tri = (
        D.points(spark, sf_dir)
        .filter(F.col("entity_id") % 64 == 0)  # one triangle per document
        .selectExpr(
            "entity_id",
            "FLOOR(lon * 4.0e0) / 4.0e0 AS ax",
            "FLOOR(lat * 4.0e0) / 4.0e0 AS ay",
        )
        .withColumn("geometry", tri_udf("ax", "ay"))
        .selectExpr(
            "entity_id", "geometry",
            "ax AS sx0", "ay AS sy0", "ax + 2.5e0 AS sx1", "ay + 2.5e0 AS sy1",
        )
    )
    cells = (
        spark.range(180 * 90)
        .selectExpr(
            "id AS cell_id",
            "CAST((id % 180) * 2 - 180 AS DOUBLE) AS cx0",
            "CAST((id DIV 180) * 2 - 90 AS DOUBLE) AS cy0",
            "CAST((id % 180) * 2 - 178 AS DOUBLE) AS cx1",
            "CAST((id DIV 180) * 2 - 88 AS DOUBLE) AS cy1",
        )
        .withColumn("geometry", rect_udf("cx0", "cy0", "cx1", "cy1"))
    )
    # keep_geometry=False: this query consumes only the area, so the
    # kernel skips per-pair intersection-WKB construction + Arrow bytes
    # (area/length come from the same ring arithmetic — bit-identical)
    ix = intersections(
        tri,
        cells,
        source_id="entity_id",
        target_id="cell_id",
        source_bounds=("sx0", "sy0", "sx1", "sy1"),
        target_bounds=("cx0", "cy0", "cx1", "cy1"),
        rect_layers=False,
        keep_geometry=False,
        broadcast_targets=broadcast_targets,
        exact_kernel=exact_kernel,
    )
    return ix.select(
        "entity_id",
        "cell_id",
        F.round(F.col("area") * F.lit(32.0)).cast("bigint").alias("area_x32"),
    ).filter(F.col("area_x32") >= 1)


def q_intersections_triangles_shuffle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same overlay, forced down the non-broadcast path (salted shuffle
    join on cell id, WKB carried through the join — the 100 TB
    polygon×polygon plan) AND pinned to the general arrangement kernel
    so it stays oracle-gated (the broadcast twin exercises the convex
    fast clip)."""
    return q_intersections_triangles(
        spark, sf_dir, broadcast_targets=False, exact_kernel="arrangement"
    )


def q_intersections_triangles_shuffle_fast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION shuffle config: non-broadcast salted-shuffle join
    with the default kernel tiering (convex interior-overlap pairs take
    the Sutherland–Hodgman fast clip).  The pinned-arrangement
    ``_shuffle`` twin keeps the general kernel oracle-gated; this row
    proves the fast-clip tier engages on the shuffle path too —
    same oracle, identical results, measured separately in bench.py."""
    return q_intersections_triangles(
        spark, sf_dir, broadcast_targets=False, exact_kernel="auto"
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.multimodal import frame_sample, media_table

    out = frame_sample(media_table(spark, sf_dir))
    return out.select(
        "media_id",
        "frame_idx",
        F.col("frame").cast("string").alias("frame_hex"),
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
    )


def q_adjacencies_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.adjacencies import adjacencies

    grid_layer = D.nation_grid(spark, sf_dir)
    return adjacencies(
        grid_layer,
        id_col="nation_id",
        bounds_cols=("nxmin", "nymin", "nxmax", "nymax"),
    ).select("id_i", "id_j", "length")


QUERIES.update(
    {
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "doc_fingerprint": q_doc_fingerprint,
        "exact_dedup": q_exact_dedup,
        "minhash_lsh": q_minhash_lsh,
        "ngram_jaccard": q_ngram_jaccard,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "novelty_docs": q_novelty_docs,
        "aggregate_rects": q_aggregate_rects,
        "repetition_score": q_repetition_score,
        "mixture_sample": q_mixture_sample,
        "bpe_token_count": q_bpe_token_count,
        "profile_documents": q_profile_documents,
        "disaggregate_orders": q_disaggregate_orders,
        "line_dedup": q_line_dedup,
        "embedding_dedup": q_embedding_dedup,
        "cosine_topk": q_cosine_topk,
        "ann_lsh": q_ann_lsh,
        "ivf_topk": q_ivf_topk,
        "pages_extract": q_pages_extract,
        "media_features": q_media_features,
        "frame_sample": q_frame_sample,
        "adjacencies_nations": q_adjacencies_nations,
        "intersections_triangles": q_intersections_triangles,
        "intersections_triangles_shuffle": q_intersections_triangles_shuffle,
        "intersections_triangles_shuffle_fast": q_intersections_triangles_shuffle_fast,
    }
)

_STOPWORD_HITS = " + ".join(
    f"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
    for w in ("the", "and", "data", "table", "query")
)

_SIMHASH_SUMS = ", ".join(
    f"SUM(CASE WHEN substr(md5(w), {i + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{i}"
    for i in range(16)
)
_SIMHASH_BITS = " || ".join(
    f"CASE WHEN s{i} > 0 THEN '1' ELSE '0' END" for i in range(16)
)
# mirrors functions.dedup.simhash_pairs: 4 bands x 4 bits, 16-term
# character-wise Hamming (no conv()/integer-width asymmetries)
_SIMHASH_BAND_MATCH = " OR ".join(
    f"substr(a.s, {b * 4 + 1}, 4) = substr(b.s, {b * 4 + 1}, 4)" for b in range(4)
)
_SIMHASH_HAMMING = " + ".join(
    f"CASE WHEN substr(a.s, {i + 1}, 1) <> substr(b.s, {i + 1}, 1) THEN 1 ELSE 0 END"
    for i in range(16)
)

# 32 hyperplanes = 4 banded tables x 8 bits (must mirror
# functions.similarity.ann_lsh_pairs defaults)
_LSH_SIG = " || ".join(
    "CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
    f"list_transform(range(0, 64), k -> CAST((({j + 1}) * 31 + k * 17) % 13 - 6 AS DOUBLE))) >= 0 "
    "THEN '1' ELSE '0' END"
    for j in range(32)
)
_LSH_BAND_MATCH = " OR ".join(
    f"substr(a.s, {t * 8 + 1}, 8) = substr(b.s, {t * 8 + 1}, 8)" for t in range(4)
)

ORACLES.update(
    {
        "text_stats": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS len_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
       CAST(length(text) - (length(text) - length(replace(text, ' ', ''))) AS DOUBLE)
         / len(string_split(text, ' ')) AS avg_token_len
FROM documents
""",
        "lang_id": f"""
SELECT doc_id, ({_STOPWORD_HITS}) AS stopword_hits,
       CASE WHEN ({_STOPWORD_HITS}) > 0 THEN 'en' ELSE 'und' END AS lang_pred
FROM documents
""",
        "doc_fingerprint": """
SELECT doc_id, md5(text) AS fingerprint,
       md5(substr(text, 1, 64)) AS prefix_fingerprint
FROM documents
""",
        # same double-expression order as functions.text.quality_score so
        # the IEEE arithmetic is bit-identical before the 1e6 round
        "quality_score": f"""
WITH q AS (
  SELECT doc_id,
         ({" + ".join(f"(length(text) - length(replace(text, '{p}', '')))" for p in (".", ",", "!", "?", ";", ":"))}) AS n_punct,
         ({_STOPWORD_HITS}) AS n_stop,
         length(text) AS n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens
  FROM documents
)
SELECT doc_id, CAST(n_punct AS BIGINT) AS n_punct,
       CAST(ROUND((0.4e0 * (CASE WHEN n_chars >= 64 AND n_chars <= 100000
                                 THEN 1.0e0 ELSE 0.0e0 END)
                   + 0.3e0 * LEAST(1.0e0, 10.0e0 * (CAST(n_punct AS DOUBLE) / n_tokens))
                   + 0.3e0 * LEAST(1.0e0, 20.0e0 * (CAST(n_stop AS DOUBLE) / n_tokens)))
                  * 1.0e6) AS BIGINT) AS score_e6,
       CAST(ROUND((0.4e0 * (CASE WHEN n_chars >= 64 AND n_chars <= 100000
                                 THEN 1.0e0 ELSE 0.0e0 END)
                   + 0.3e0 * LEAST(1.0e0, 10.0e0 * (CAST(n_punct AS DOUBLE) / n_tokens))
                   + 0.3e0 * LEAST(1.0e0, 20.0e0 * (CAST(n_stop AS DOUBLE) / n_tokens)))
                  * 1.0e6) AS BIGINT) >= 500000 AS keep
FROM q
""",
        "exact_dedup": f"""
WITH {_CORPUS_CTE}
SELECT md5(text) AS fingerprint, MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_members
FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1
""",
        "minhash_lsh": f"""
WITH {_CORPUS_CTE}, {_SHINGLE_CTE}, {_MINHASH_CTE}
SELECT doc_a, doc_b FROM cand
""",
        "ngram_jaccard": f"""
WITH {_CORPUS_CTE}, {_SHINGLE_CTE}, {_MINHASH_CTE},
ssets AS (SELECT DISTINCT doc_id, shingle FROM shn),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ssets GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
  FROM cand c
  JOIN ssets sa ON sa.doc_id = c.doc_a
  JOIN ssets sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni), 6) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
""",
        "simhash": f"""
WITH {_CORPUS_CTE},
tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM corpus),
sums AS (SELECT doc_id, {_SIMHASH_SUMS} FROM tok GROUP BY doc_id)
SELECT doc_id, {_SIMHASH_BITS} AS simhash FROM sums
""",
        # per-column profile; long format, int+string columns only
        "profile_documents": """
SELECT 'doc_id' AS column, COUNT(*) AS n_rows, CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, COUNT(DISTINCT doc_id) AS n_distinct, CAST(MIN(doc_id) AS VARCHAR) AS min_str, CAST(MAX(doc_id) AS VARCHAR) AS max_str FROM documents
UNION ALL
SELECT 'lang' AS column, COUNT(*) AS n_rows, CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, COUNT(DISTINCT lang) AS n_distinct, CAST(MIN(lang) AS VARCHAR) AS min_str, CAST(MAX(lang) AS VARCHAR) AS max_str FROM documents
UNION ALL
SELECT 'source' AS column, COUNT(*) AS n_rows, CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, COUNT(DISTINCT source) AS n_distinct, CAST(MIN(source) AS VARCHAR) AS min_str, CAST(MAX(source) AS VARCHAR) AS max_str FROM documents
UNION ALL
SELECT 'n_chars' AS column, COUNT(*) AS n_rows, CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, COUNT(DISTINCT n_chars) AS n_distinct, CAST(MIN(n_chars) AS VARCHAR) AS min_str, CAST(MAX(n_chars) AS VARCHAR) AS max_str FROM documents
""",
        # same RE2-safe pretokenizer pattern verbatim in both engines
        "bpe_token_count": """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +'))
         AS n_bpe_tokens
FROM documents
""",
        # weight-share disaggregation (window share + join)
        "disaggregate_orders": """
WITH li AS (
  SELECT l_orderkey * 100 + l_linenumber AS source_id,
         l_orderkey AS target_id, l_quantity AS w
  FROM lineitem
),
sh AS (
  SELECT source_id, target_id,
         w / SUM(w) OVER (PARTITION BY target_id) AS share
  FROM li
)
SELECT s.source_id, s.target_id,
       CAST(ROUND(o.o_totalprice * s.share * 1e3) AS BIGINT) AS price_part_e3
FROM sh s JOIN orders o ON o.o_orderkey = s.target_id
""",
        # deterministic mixture sampling: same md5-uniform arithmetic
        "mixture_sample": """
SELECT doc_id, lang FROM documents
WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 15))
           AS BIGINT) / 1152921504606846976.0
    < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 WHEN 'zh' THEN 0.25
                ELSE 0.1 END
""",
        # Gopher-style repetition signals; <2-token docs keep 0 fracs
        "repetition_score": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
base AS (SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd, toks FROM t),
bgr AS (
  SELECT doc_id,
         UNNEST(CASE WHEN len(toks) >= 2
                THEN list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i + 1])
                ELSE [] END) AS bg
  FROM base
),
cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgr GROUP BY doc_id, bg),
agg AS (SELECT doc_id, MAX(c) AS maxbg, SUM(c) AS nbg FROM cnt GROUP BY doc_id)
SELECT b.doc_id,
       CAST(ROUND((1.0e0 - CAST(b.nd AS DOUBLE) / b.n) * 1e6) AS BIGINT)
         AS dup_token_frac_e6,
       CAST(ROUND(CASE WHEN COALESCE(a.nbg, 0) > 0
                  THEN CAST(a.maxbg AS DOUBLE) / a.nbg ELSE 0.0e0 END * 1e6)
            AS BIGINT) AS top_bigram_frac_e6
FROM base b LEFT JOIN agg a USING (doc_id)
""",
        # CCNet-style boilerplate line removal over the wrapped corpus
        "line_dedup": """
WITH w AS (
  SELECT doc_id,
         'SHARED HEADER LINE' || chr(10) || text || chr(10) ||
         'FOOTER ' || CAST(doc_id % 5 AS VARCHAR) AS text
  FROM documents
),
l AS (
  SELECT doc_id,
         UNNEST(string_split(text, chr(10))) AS line,
         UNNEST(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM w
),
freq AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM l GROUP BY line),
kept AS (SELECT doc_id, pos, line FROM l JOIN freq USING (line) WHERE df <= 2),
outt AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
         FROM kept GROUP BY doc_id)
SELECT d.doc_id, COALESCE(o.text, '') AS text
FROM (SELECT doc_id FROM documents) d LEFT JOIN outt o USING (doc_id)
""",
        # README-idiom aggregate: covering-first assign (exactly-one
        # cover), max-area fallback (area DESC, district_id ASC), sum
        "aggregate_rects": f"""
WITH src AS ({D.source_rects_oracle_cte()}),
d AS ({D.districts_oracle_cte()}),
cov AS (
  SELECT s.entity_id, MIN(d.district_id) AS district_id
  FROM src s JOIN d
    ON d.x0 <= s.x0 AND s.x1 <= d.x1 AND d.y0 <= s.y0 AND s.y1 <= d.y1
  GROUP BY s.entity_id HAVING COUNT(*) = 1
),
rest AS (
  SELECT s.* FROM src s LEFT JOIN cov USING (entity_id)
  WHERE cov.district_id IS NULL
),
area AS (
  SELECT r.entity_id, d.district_id,
         (LEAST(r.x1, d.x1) - GREATEST(r.x0, d.x0))
       * (LEAST(r.y1, d.y1) - GREATEST(r.y0, d.y0)) AS a
  FROM rest r JOIN d
    ON LEAST(r.x1, d.x1) > GREATEST(r.x0, d.x0)
   AND LEAST(r.y1, d.y1) > GREATEST(r.y0, d.y0)
),
best AS (
  SELECT entity_id, district_id FROM (
    SELECT entity_id, district_id,
           ROW_NUMBER() OVER (PARTITION BY entity_id
                              ORDER BY a DESC, district_id) AS rn
    FROM area) WHERE rn = 1
),
asg AS (SELECT * FROM cov UNION ALL SELECT * FROM best)
SELECT a.district_id, CAST(SUM(s.n_chars) AS BIGINT) AS n_chars_sum
FROM asg a JOIN src s USING (entity_id)
GROUP BY a.district_id
""",
        # streaming novelty filter's batch twin: first-arrival-of-every-
        # band rule over the same minhash band keys as minhash_lsh
        "novelty_docs": f"""
WITH {_CORPUS_CTE}, {_SHINGLE_CTE}, {_MINHASH_CTE},
rn AS (SELECT doc_id,
              ROW_NUMBER() OVER (PARTITION BY band, key ORDER BY doc_id) AS r
       FROM bands),
ok AS (SELECT doc_id FROM rn GROUP BY doc_id
       HAVING COUNT(*) = SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END)),
short AS (SELECT doc_id FROM corpus WHERE len(string_split(text, ' ')) < 3)
SELECT doc_id FROM ok UNION ALL SELECT doc_id FROM short
""",
        "simhash_pairs": f"""
WITH {_CORPUS_CTE},
tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM corpus),
sums AS (SELECT doc_id, {_SIMHASH_SUMS} FROM tok GROUP BY doc_id),
sig AS (SELECT doc_id, {_SIMHASH_BITS} AS s FROM sums)
SELECT doc_a, doc_b, hamming FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {_SIMHASH_HAMMING} AS hamming
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({_SIMHASH_BAND_MATCH})
) WHERE hamming <= 3
""",
        # brute-force cosine edges (0.9 threshold on 6dp-rounded DOUBLE
        # cosine) + recursive-CTE min-label connected components — the
        # SQL twin of connected_components' label propagation
        "embedding_dedup": """
WITH RECURSIVE
base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
emb AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 10000000000000 AS vec_id, [v[1] + 0.05] || v[2:] AS v
  FROM base WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id + 20000000000000 AS vec_id, v[1:1] || [v[2] + 0.05] || v[3:] AS v
  FROM base WHERE vec_id % 20 = 0
),
edges AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.9
),
und AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
reach AS (
  SELECT vec_id AS node, vec_id AS comp FROM emb
  UNION
  SELECT u.dst AS node, r.comp AS comp FROM reach r JOIN und u ON u.src = r.node
),
lab AS (SELECT node AS vec_id, MIN(comp) AS canonical_id FROM reach GROUP BY node)
SELECT l.vec_id, l.canonical_id, c.n_members
FROM lab l
JOIN (SELECT canonical_id, COUNT(*) AS n_members FROM lab GROUP BY canonical_id) c
USING (canonical_id)
""",
        "cosine_topk": """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
s AS (
  SELECT q.query_id, c.neighbor_id,
         ROUND(list_cosine_similarity(q.v, c.v), 6) AS sim
  FROM q JOIN c ON q.query_id <> c.neighbor_id
),
r AS (SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM s)
SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5
""",
        "ann_lsh": f"""
WITH sig AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {_LSH_SIG} AS s
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim
FROM sig a JOIN sig b ON a.vec_id < b.vec_id AND ({_LSH_BAND_MATCH})
WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.0e0
""",
        # IVF mirror: deterministic centroids (vec_id % 97 = 0), argmin
        # assignment on 6dp-rounded cosine (centroid-id tie-break),
        # nprobe=3 probe lists, exact top-5 within lists
        "ivf_topk": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 97 = 0),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                                       c.cid) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY ROUND(list_cosine_similarity(q.v, c.cv), 6) DESC,
                                       c.cid) AS rn
    FROM e q CROSS JOIN c WHERE q.vec_id % 50 = 0
  ) WHERE rn <= 3
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(q.v, n.v), 6) AS sim
  FROM probes p
  JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.query_id
  JOIN e q ON q.vec_id = p.query_id
  JOIN e n ON n.vec_id = a.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5
""",
        "pages_extract": """
SELECT 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
         AS url,
       text AS extracted_text
FROM documents
""",
        # frame fan-out mirror: payload = md5 hex x (id%5+1) repeats ->
        # 32*(id%5+1) bytes -> n_frames = min(8, len/8); sample step 2
        "frame_sample": """
WITH v AS (
  SELECT doc_id AS media_id,
         LEAST(8, 4 * CAST(doc_id % 5 + 1 AS INT)) AS nf,
         doc_id % 1920 AS width, doc_id % 1080 AS height
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id, UNNEST(RANGE(0, nf, 2)) AS frame_idx,
       md5(CAST(media_id AS VARCHAR) || '#' ||
           CAST(UNNEST(RANGE(0, nf, 2)) AS VARCHAR)) AS frame_hex,
       CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height
FROM v
""",
        "media_features": """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(32 * (doc_id % 5 + 1) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS INT) AS first_byte
FROM documents
""",
        "adjacencies_nations": """
WITH g AS (SELECT n_nationkey AS id, n_nationkey % 5 AS gx,
                  n_nationkey // 5 AS gy FROM nation)
SELECT a.id AS id_i, b.id AS id_j, 1.0e0 AS length
FROM g a JOIN g b
  ON a.id < b.id AND abs(a.gx - b.gx) + abs(a.gy - b.gy) = 1
""",
        # closed-form area of (lower-left right triangle ∩ axis rect):
        # integrate min(cy1, H - x) - yb over the x-overlap, split at the
        # hypotenuse crossings a = H - cy1, b = H - yb (clamped).  All
        # inputs are dyadic rationals (quarters), so every term — the
        # rect part, the trapezoid (H-yb)(b-a) - (b²-a²)/2 — is exact in
        # IEEE doubles and area*32 is an exact integer on both engines.
        "intersections_triangles": f"""
WITH pts AS ({D.points_oracle_cte()}),
tris AS (
  SELECT entity_id, FLOOR(lon * 4.0e0) / 4.0e0 AS ax,
         FLOOR(lat * 4.0e0) / 4.0e0 AS ay
  FROM pts WHERE entity_id % 64 = 0
),
cells AS (
  SELECT cy * 180 + cx AS cell_id,
         CAST(cx * 2 - 180 AS DOUBLE) AS cx0, CAST(cy * 2 - 90 AS DOUBLE) AS cy0,
         CAST(cx * 2 - 178 AS DOUBLE) AS cx1, CAST(cy * 2 - 88 AS DOUBLE) AS cy1
  FROM (SELECT UNNEST(RANGE(0, 180)) AS cx)
  CROSS JOIN (SELECT UNNEST(RANGE(0, 90)) AS cy)
),
pairs AS (
  SELECT t.entity_id, c.cell_id,
         GREATEST(c.cx0, t.ax) AS u0, LEAST(c.cx1, t.ax + 2.5e0) AS u1,
         GREATEST(c.cy0, t.ay) AS yb, c.cy1 AS yt,
         t.ax + t.ay + 2.5e0 AS H
  FROM tris t JOIN cells c
    ON c.cx1 > t.ax AND c.cx0 < t.ax + 2.5e0
   AND c.cy1 > t.ay AND c.cy0 < t.ay + 2.5e0
),
clipped AS (
  SELECT entity_id, cell_id, u0, u1, yb, yt, H,
         GREATEST(u0, LEAST(u1, H - yt)) AS a,
         GREATEST(u0, LEAST(u1, H - yb)) AS b
  FROM pairs WHERE u1 > u0 AND yt > yb
),
areas AS (
  SELECT entity_id, cell_id,
         CAST(ROUND(((a - u0) * (yt - yb)
                     + ((H - yb) * (b - a) - (b*b - a*a) / 2.0e0)) * 32.0e0)
              AS BIGINT) AS area_x32
  FROM clipped
)
SELECT entity_id, cell_id, area_x32 FROM areas WHERE area_x32 >= 1
""",
    }
)

# the shuffle-path variant computes the identical relation — same oracle
ORACLES["intersections_triangles_shuffle"] = ORACLES["intersections_triangles"]
ORACLES["intersections_triangles_shuffle_fast"] = ORACLES["intersections_triangles"]


# --------------------------------------------------------- repair queries


def _dirty_nation_layer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately-dirty layer: 1.2-side squares on a 1.0 lattice keyed
    by n_nationkey — every 8-neighborhood pair overlaps (repair fixtures).
    Generated distributed (JVM arithmetic + one vectorized WKB build),
    no driver collect."""
    from .geom import vector as V

    def rect_batch(x0, y0, x1, y1):
        return V.batch_rect_wkb(
            x0.to_numpy(), y0.to_numpy(), x1.to_numpy(), y1.to_numpy()
        )

    rect_udf = F.pandas_udf(rect_batch, "binary").asNondeterministic()
    return (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .selectExpr(
            "CAST(n_nationkey AS BIGINT) AS nation_id",
            "CAST(n_nationkey % 5 AS DOUBLE) AS __x0",
            "CAST(n_nationkey DIV 5 AS DOUBLE) AS __y0",
            "CAST(n_nationkey % 5 AS DOUBLE) + 1.2e0 AS __x1",
            "CAST(n_nationkey DIV 5 AS DOUBLE) + 1.2e0 AS __y1",
        )
        .withColumn("geometry", rect_udf("__x0", "__y0", "__x1", "__y1"))
        .select("nation_id", "geometry")
    )


def q_doctor_dirty_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doctor() counts over the dirty lattice — closed-form oracle."""
    from .operators.adjacencies import count_overlaps
    from .operators.repair import count_holes

    layer = _dirty_nation_layer(spark, sf_dir)
    ov = count_overlaps(layer, id_col="nation_id")
    nh = count_holes(layer)
    return spark.createDataFrame(
        [(ov, nh)], "n_overlaps bigint, n_holes bigint"
    )


def q_smart_repair_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """smart_repair over the dirty lattice: per-geometry repaired area
    on the 1e-6 integer grid (closed-form oracle below)."""
    from .operators.smart_repair import smart_repair
    from .geom import vector as V

    layer = _dirty_nation_layer(spark, sf_dir)
    repaired = smart_repair(layer, id_col="nation_id")
    area_udf = F.pandas_udf(V.batch_area, "double")
    return repaired.select(
        "nation_id",
        F.round(area_udf(F.col("geometry")) * F.lit(1.0e6))
        .cast("bigint")
        .alias("area_e6"),
    )


def q_smart_repair_tiled_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same dirty lattice through the PLANE-TILED smart_repair path
    (per-tile arrangements + cross-tile face stitch,
    operators/smart_repair_tiled.py) — the one-giant-component plan.
    Must reproduce the identical closed-form areas as the component
    path, so it shares smart_repair_nations' oracle."""
    from .operators.smart_repair import smart_repair
    from .geom import vector as V

    layer = _dirty_nation_layer(spark, sf_dir)
    repaired = smart_repair(layer, id_col="nation_id", method="tiled")
    area_udf = F.pandas_udf(V.batch_area, "double")
    return repaired.select(
        "nation_id",
        F.round(area_udf(F.col("geometry")) * F.lit(1.0e6))
        .cast("bigint")
        .alias("area_e6"),
    )


def q_resolve_overlaps_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resolve_overlaps over the dirty lattice (closed-form oracle)."""
    from .operators.repair import resolve_overlaps
    from .geom import vector as V

    layer = _dirty_nation_layer(spark, sf_dir)
    fixed = resolve_overlaps(layer, id_col="nation_id", relative_threshold=None)
    area_udf = F.pandas_udf(V.batch_area, "double")
    return fixed.select(
        "nation_id",
        F.round(area_udf(F.col("geometry")) * F.lit(1.0e6))
        .cast("bigint")
        .alias("area_e6"),
    )


def q_doctor_overlay_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-layer doctor through the TILED overlay (operators/tiling):
    symmetric difference between the dirty 1.2-lattice and the clean
    unit lattice.  Closed form: dirty union = [0,5.2]², clean = [0,5]²
    (clean ⊂ dirty) → sym = 5.2² − 5² = 2.04 exactly."""
    from .operators.tiling import overlay_areas_tiled

    dirty = _dirty_nation_layer(spark, sf_dir)
    clean = D.nation_grid(spark, sf_dir).select("nation_id", "geometry")
    a = overlay_areas_tiled(dirty, clean, tile_res=2)
    sym = a["source"] + a["target"] - 2.0 * a["both"]
    return spark.createDataFrame(
        [(int(round(sym * 1e6)),)], "sym_area_e6 bigint"
    )


def q_tiled_holes_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stitched hole counting through operators/tiling on a frame layer
    derived from the nation table: nations 0-3 become the four bands of
    a [0,10]² annulus with hole [3,7]² (area 16, spanning several
    tiles).  Closed form: one hole, area 16."""
    from .geom import vector as V
    from .operators.tiling import hole_components_tiled

    def rect_batch(x0, y0, x1, y1):
        return V.batch_rect_wkb(
            x0.to_numpy(), y0.to_numpy(), x1.to_numpy(), y1.to_numpy()
        )

    rect_udf = F.pandas_udf(rect_batch, "binary").asNondeterministic()
    frame = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter(F.col("n_nationkey") < 4)
        .selectExpr(
            "CAST(n_nationkey AS BIGINT) AS fid",
            # bands: 0=bottom [0,10]x[0,3], 1=top [0,10]x[7,10],
            #        2=left [0,3]x[3,7],   3=right [7,10]x[3,7]
            "CAST(CASE n_nationkey WHEN 0 THEN 0 WHEN 1 THEN 0 WHEN 2 THEN 0 ELSE 7 END AS DOUBLE) AS x0",
            "CAST(CASE n_nationkey WHEN 0 THEN 0 WHEN 1 THEN 7 WHEN 2 THEN 3 ELSE 3 END AS DOUBLE) AS y0",
            "CAST(CASE n_nationkey WHEN 0 THEN 10 WHEN 1 THEN 10 WHEN 2 THEN 3 ELSE 10 END AS DOUBLE) AS x1",
            "CAST(CASE n_nationkey WHEN 0 THEN 3 WHEN 1 THEN 10 WHEN 2 THEN 7 ELSE 7 END AS DOUBLE) AS y1",
        )
        .withColumn("geometry", rect_udf("x0", "y0", "x1", "y1"))
        .select("fid", "geometry")
    )
    comps = hole_components_tiled(frame, tile_res=2)
    return comps.select(
        F.round(F.col("area") * F.lit(1.0e6)).cast("bigint").alias("hole_area_e6")
    )


def q_close_gaps_pacman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """close_gaps on the reference's exact pacman fixture
    (/root/reference/tests/test_holes.py:105-121), keyed by nation rows:
    the mouth gap [1,2]×[1,2] absorbs into the pacman (max shared
    perimeter), the bar is untouched → areas exactly 6 and 3."""
    from .geom.base import Geometry
    from .geom import vector as V
    from .index.cells import CellGrid
    from .operators.repair import close_gaps
    import pandas as pd

    pac = Geometry.polygon(
        [(0, 0), (0, 3), (2, 3), (2, 2), (1, 2), (1, 1), (2, 1), (2, 0)]
    ).wkb
    bar = Geometry.polygon([(2, 0), (2, 3), (3, 3), (3, 0)]).wkb

    def build(ids):
        return pd.Series([pac if i == 0 else bar for i in ids])

    geom_udf = F.pandas_udf(build, "binary").asNondeterministic()
    layer = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter(F.col("n_nationkey") < 2)
        .select(F.col("n_nationkey").cast("bigint").alias("gid"))
        .withColumn("geometry", geom_udf("gid"))
    )
    grid = CellGrid(x0=-1, y0=-1, x1=4, y1=4, res=3)
    fixed = close_gaps(layer, id_col="gid", relative_threshold=None, grid=grid)
    area_udf = F.pandas_udf(V.batch_area, "double")
    return fixed.select(
        "gid",
        F.round(area_udf(F.col("geometry")) * F.lit(1.0e6))
        .cast("bigint")
        .alias("area_e6"),
    )


def _area_e6(df: DataFrame, id_col: str) -> DataFrame:
    from .geom import vector as V

    area_udf = F.pandas_udf(V.batch_area, "double")
    return df.select(
        id_col,
        F.round(area_udf(F.col("geometry")) * F.lit(1.0e6))
        .cast("bigint")
        .alias("area_e6"),
    )


def q_crop_to_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """crop_to: every dirty 1.2-square clipped to the union of the clean
    unit lattice ([0,5]²) — closed form: each square keeps its 1.2
    margin except in the last row/column, which clip back to 1.0."""
    from .operators.repair import crop_to

    dirty = _dirty_nation_layer(spark, sf_dir)
    clean = D.nation_grid(spark, sf_dir).select("nation_id", "geometry")
    return _area_e6(crop_to(dirty, clean, id_col="nation_id"), "nation_id")


def q_expand_to_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expand_to: the clean unit lattice expands to cover a target strip
    [0,5.5]×[0,1] — the leftover [5,5.5]×[0,1] shares positive boundary
    with exactly one cell (gx=4, gy=0 → nation 4), which absorbs it."""
    from .geom import vector as V
    from .operators.repair import expand_to

    clean = D.nation_grid(spark, sf_dir).select("nation_id", "geometry")

    def rect_batch(x0, y0, x1, y1):
        return V.batch_rect_wkb(
            x0.to_numpy(), y0.to_numpy(), x1.to_numpy(), y1.to_numpy()
        )

    rect_udf = F.pandas_udf(rect_batch, "binary").asNondeterministic()
    target = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter(F.col("n_nationkey") < 1)
        .selectExpr(
            "CAST(0.0 AS DOUBLE) AS x0", "CAST(0.0 AS DOUBLE) AS y0",
            "CAST(5.5 AS DOUBLE) AS x1", "CAST(1.0 AS DOUBLE) AS y1",
        )
        .withColumn("geometry", rect_udf("x0", "y0", "x1", "y1"))
        .select("geometry")
    )
    return _area_e6(expand_to(clean, target, id_col="nation_id"), "nation_id")


def q_quick_repair_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quick_repair (the reference's autorepair): remove-repeated →
    make_valid → resolve_overlaps → close_gaps over the dirty lattice.
    resolve_overlaps redistributes the overlap strips (closed form =
    resolve_overlaps_nations) and the union stays the solid [0,5.2]², so
    close_gaps is a no-op — this query shares resolve_overlaps' oracle."""
    from .operators.repair import quick_repair

    layer = _dirty_nation_layer(spark, sf_dir)
    return _area_e6(
        quick_repair(layer, id_col="nation_id", relative_threshold=None),
        "nation_id",
    )


def q_smart_repair_bump_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-star gap through the reference's staged subdivision
    (convexify → closest-pair bridge → incenter triangles;
    /root/reference/maup/smart_repair.py:2598-2787, 1446-1916,
    operators/smart_repair.py split_hole_among_neighbors): a frame of
    four edge-contacting blocks encloses a [0,3]² gap with a tall bump
    (apex (1.5, 2.5)) rising from the bottom block — the gap's centroid
    falls inside the bump, so the star split fails and the staged rules
    run.  The oracle computes the same subdivision in closed form:
    convexify gives the bottom block the two bump-side triangles (2.5);
    the bridge gives the top block the apex triangle (0.75); the two
    remaining side triangles split by INCENTER among their three
    owners (sqrt-exact sector areas)."""
    from .geom.base import Geometry
    from .geom import vector as V
    from .index.cells import CellGrid
    from .operators.smart_repair import smart_repair
    import pandas as pd

    frame = [
        Geometry.polygon([(-1, -1), (0, -1), (0, 4), (-1, 4)]).wkb,  # A left
        Geometry.polygon(  # B bottom with the bump
            [(0, -1), (3, -1), (3, 0), (2, 0), (1.5, 2.5), (1, 0), (0, 0)]
        ).wkb,
        Geometry.polygon([(0, 3), (4, 3), (4, 4), (0, 4)]).wkb,  # D top
        Geometry.polygon([(3, -1), (4, -1), (4, 3), (3, 3)]).wkb,  # E right
    ]

    def build(ids):
        return pd.Series([frame[i] for i in ids])

    geom_udf = F.pandas_udf(build, "binary").asNondeterministic()
    layer = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter(F.col("n_nationkey") < 4)
        .select(F.col("n_nationkey").cast("bigint").alias("gid"))
        .withColumn("geometry", geom_udf("gid"))
    )
    grid = CellGrid(x0=-2, y0=-2, x1=5, y1=5, res=3)
    fixed = smart_repair(
        layer, id_col="gid", fill_gaps_threshold=None, grid=grid
    )
    area_udf = F.pandas_udf(V.batch_area, "double")
    return fixed.select(
        "gid",
        F.round(area_udf(F.col("geometry")) * F.lit(1.0e6))
        .cast("bigint")
        .alias("area_e6"),
    )


QUERIES.update(
    {
        "doctor_dirty_nations": q_doctor_dirty_nations,
        "smart_repair_nations": q_smart_repair_nations,
        "smart_repair_bump_gap": q_smart_repair_bump_gap,
        "smart_repair_tiled_nations": q_smart_repair_tiled_nations,
        "crop_to_nations": q_crop_to_nations,
        "expand_to_nations": q_expand_to_nations,
        "quick_repair_nations": q_quick_repair_nations,
        "resolve_overlaps_nations": q_resolve_overlaps_nations,
        "doctor_overlay_nations": q_doctor_overlay_nations,
        "tiled_holes_nations": q_tiled_holes_nations,
        "close_gaps_pacman": q_close_gaps_pacman,
    }
)

ORACLES.update(
    {
        # every 8-neighbor pair of the 1.2-on-1.0 lattice overlaps with
        # positive area; the lattice tiles a solid square -> no holes
        "doctor_dirty_nations": """
WITH g AS (SELECT n_nationkey AS id, n_nationkey % 5 AS gx,
                  n_nationkey // 5 AS gy FROM nation)
SELECT (SELECT COUNT(*) FROM g a JOIN g b
         ON a.id < b.id AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1)
       AS n_overlaps,
       CAST(0 AS BIGINT) AS n_holes
""",
        # reference pacman fixture: mouth gap (area 1) absorbs into the
        # pacman (6), bar untouched (3)
        "close_gaps_pacman": """
SELECT CAST(n_nationkey AS BIGINT) AS gid,
       CAST(CASE WHEN n_nationkey = 0 THEN 6000000 ELSE 3000000 END AS BIGINT)
         AS area_e6
FROM nation WHERE n_nationkey < 2
""",
        # tiled two-layer overlay: dirty union [0,5.2]^2 strictly
        # contains the clean [0,5]^2 -> sym diff = 27.04 - 25 = 2.04
        "doctor_overlay_nations": """
SELECT CAST(2040000 AS BIGINT) AS sym_area_e6
""",
        # stitched hole counting: the 4-band annulus has exactly ONE
        # hole, [3,7]^2 = 16, regardless of how many tiles it spans
        "tiled_holes_nations": """
SELECT CAST(16000000 AS BIGINT) AS hole_area_e6
""",
        # closed-form repaired areas.  smart_repair assigns every overlap
        # piece between lattice cells to the piece's max-shared-boundary
        # owner; the 1.2-on-1.0 lattice makes every such contest a tie,
        # which the documented tie-break gives to the smaller id — so each
        # cell ends at exactly [gx, gx+1]×[gy, gy+1] except row/col 0,
        # which keep their un-contested 0.2 margins:
        #   area = (1.2 if gx=0 else 1.0) × (1.2 if gy=0 else 1.0).
        # Verified deterministic at local[3]/7-shuffle-partitions and
        # local[8]/32 (identical outputs).
        "smart_repair_nations": """
WITH g AS (SELECT CAST(n_nationkey AS BIGINT) AS nation_id,
                  n_nationkey % 5 AS gx, n_nationkey // 5 AS gy FROM nation)
SELECT nation_id,
       CAST(CASE WHEN gx = 0 AND gy = 0 THEN 1440000
                 WHEN gx = 0 OR gy = 0 THEN 1200000
                 ELSE 1000000 END AS BIGINT) AS area_e6
FROM g
""",
        # resolve_overlaps subtracts the union of all pairwise overlap
        # strips from every cell, then re-absorbs each pairwise strip into
        # the trimmed neighbor sharing the most perimeter.  On the lattice
        # that lands row/col-0 cells at 1.24 (1.44 at the origin), the
        # far corner at 1.00, far-row/col cells at 1.04, interior at 1.08.
        # Verified deterministic across parallelism levels as above.
        "resolve_overlaps_nations": """
WITH g AS (SELECT CAST(n_nationkey AS BIGINT) AS nation_id,
                  n_nationkey % 5 AS gx, n_nationkey // 5 AS gy FROM nation)
SELECT nation_id,
       CAST(CASE WHEN gx = 0 AND gy = 0 THEN 1440000
                 WHEN gx = 0 OR gy = 0 THEN 1240000
                 WHEN gx = 4 AND gy = 4 THEN 1000000
                 WHEN gx = 4 OR gy = 4 THEN 1040000
                 ELSE 1080000 END AS BIGINT) AS area_e6
FROM g
""",
    }
)

# the plane-tiled smart_repair path must reproduce the component path's
# closed-form areas exactly — same oracle
ORACLES["smart_repair_tiled_nations"] = ORACLES["smart_repair_nations"]

# crop_to: 1.2-squares clipped to [0,5]² — last row/column lose their
# 0.2 margin on that axis
ORACLES["crop_to_nations"] = """
SELECT CAST(n_nationkey AS BIGINT) AS nation_id,
       CAST(ROUND((CASE WHEN n_nationkey % 5 = 4 THEN 1.0 ELSE 1.2 END)
                * (CASE WHEN n_nationkey // 5 = 4 THEN 1.0 ELSE 1.2 END)
                * 1e6) AS BIGINT) AS area_e6
FROM nation
"""

# expand_to: leftover strip [5,5.5]×[0,1] absorbs into nation 4 (the
# only cell sharing positive-length boundary with it)
ORACLES["expand_to_nations"] = """
SELECT CAST(n_nationkey AS BIGINT) AS nation_id,
       CAST(CASE WHEN n_nationkey = 4 THEN 1500000 ELSE 1000000 END
            AS BIGINT) AS area_e6
FROM nation
"""

# quick_repair = resolve_overlaps (+ a no-op close_gaps on the solid
# lattice) — identical closed form
ORACLES["quick_repair_nations"] = ORACLES["resolve_overlaps_nations"]

# non-star bump gap: the staged subdivision in closed form (sqrt-exact).
# Derivation (see q_smart_repair_bump_gap docstring): convexify gives B
# the two bump-side triangles (area 2.5 total); the B–D bridge paths
# both route through the apex, carving the apex-top triangle (0.75) to
# D; the two remaining side triangles (0,0)-(1.5,2.5)-(0,3) and its
# mirror split by INCENTER among {B, D, side}: with s = 3 + √8.5 + √2.5,
# I = (4.5/s, (7.5+3√8.5)/s), the sector areas are
# sec_B = |1.5·Iy − 2.5·Ix|/2, sec_D = |1.5(3−Iy) − 0.5·Ix|/2,
# sec_side = 1.5·Ix.  Base areas: A=5, B=4.25, D=4, E=4.
ORACLES["smart_repair_bump_gap"] = """
WITH i AS (
  SELECT 4.5 / (3.0 + sqrt(8.5) + sqrt(2.5)) AS ix,
         (7.5 + 3.0 * sqrt(8.5)) / (3.0 + sqrt(8.5) + sqrt(2.5)) AS iy
),
sec AS (
  SELECT 0.5 * abs(1.5 * iy - 2.5 * ix) AS sec_b,
         0.5 * abs(1.5 * (3.0 - iy) - 0.5 * ix) AS sec_d,
         1.5 * ix AS sec_side
  FROM i
)
SELECT CAST(n_nationkey AS BIGINT) AS gid,
       CAST(ROUND(CASE n_nationkey
                    WHEN 0 THEN 5.0 + sec_side
                    WHEN 1 THEN 6.75 + 2.0 * sec_b
                    WHEN 2 THEN 4.75 + 2.0 * sec_d
                    WHEN 3 THEN 4.0 + sec_side
                  END * 1e6) AS BIGINT) AS area_e6
FROM nation CROSS JOIN sec WHERE n_nationkey < 4
"""


# ------------------------------------------------- relational aggregates


def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type (the engine's
    windowed-aggregation surface; exact decimal sums so distributed
    summation order cannot flip the hash)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.withColumn("win", F.date_trunc("hour", F.col("ts")))
        .groupBy("win", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # cents-grid BIGINT: order-invariant sum, hash-stable cross-engine
            F.sum(F.round(F.col("value") * F.lit(100.0)).cast("bigint")).alias(
                "value_sum_c"
            ),
        )
    )


def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + grouped rollup: revenue per market segment and status."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")).alias(
                "revenue_c"
            ),
        )
    )


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization (30-min gap) through the batch twin the
    streaming `applyInPandasWithState` operator is parity-tested
    against — this row anchors the streaming semantics to a
    driver-gated truth.  Values ride a cents grid (exact-in-double
    BIGINT-ish sums) so the hash is order-invariant cross-engine."""
    from .streaming.sessions import sessionize_batch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "ts",
        F.round(F.col("value") * F.lit(100.0)).alias("value"),
    )
    out = sessionize_batch(ev, gap_seconds=1800)
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.col("value_sum").cast("bigint").alias("value_sum_c"),
    )


def q_sessionize_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-boundary semantics gate: timestamps truncated to the minute
    with gap = exactly 120 s forces many pairs exactly AT the gap — an
    implementation that splits on `>= gap` instead of `> gap` (or
    mis-rounds the timeout boundary) diverges here, where the natural
    microsecond data never ties."""
    from .streaming.sessions import sessionize_batch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.date_trunc("minute", F.col("ts")).alias("ts"),
        F.lit(1.0).alias("value"),
    )
    out = sessionize_batch(ev, gap_seconds=120)
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.col("value_sum").cast("bigint").alias("n_sum"),
    )


QUERIES.update(
    {
        "events_windowed": q_events_windowed,
        "orders_rollup": q_orders_rollup,
        "sessionize_events": q_sessionize_events,
        "sessionize_boundary": q_sessionize_boundary,
    }
)

ORACLES.update(
    {
        "events_windowed": """
SELECT date_trunc('hour', ts) AS win, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100.0e0) AS BIGINT)) AS BIGINT) AS value_sum_c
FROM events GROUP BY 1, 2
""",
        "orders_rollup": """
SELECT c_mktsegment, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0e0) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
""",
        "sessionize_events": """
WITH flagged AS (
  SELECT user_id, ts, ROUND(value * 100.0e0) AS value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS newf
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts, value,
         SUM(newf) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(value) AS BIGINT) AS value_sum_c
FROM sess GROUP BY user_id, sid
""",
        "sessionize_boundary": """
WITH ev AS (
  SELECT user_id, date_trunc('minute', ts) AS ts FROM events
), flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 120
              THEN 1 ELSE 0 END AS newf
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         SUM(newf) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, CAST(COUNT(*) AS BIGINT) AS n_sum
FROM sess GROUP BY user_id, sid
""",
    }
)


def q_raster_reconcile_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster-tile↔vector reconciliation (north_star): per-cell coverage
    of the dirty 1.2-on-1.0 lattice on a unit-cell grid."""
    from .index.cells import CellGrid
    from .operators.raster import rasterize_coverage

    grid = CellGrid(x0=0, y0=0, x1=8, y1=8, res=3)
    layer = _dirty_nation_layer(spark, sf_dir).selectExpr(
        "nation_id",
        "geometry",
        "CAST(nation_id % 5 AS DOUBLE) AS bx0",
        "CAST(nation_id DIV 5 AS DOUBLE) AS by0",
        "CAST(nation_id % 5 AS DOUBLE) + 1.2e0 AS bx1",
        "CAST(nation_id DIV 5 AS DOUBLE) + 1.2e0 AS by1",
    )
    cov = rasterize_coverage(
        layer,
        id_col="nation_id",
        grid=grid,
        bounds_cols=("bx0", "by0", "bx1", "by1"),
        geoms_are_rects=True,
    )
    return cov.groupBy("cell_id").agg(
        F.round(F.sum("cell_frac"), 9).alias("coverage"),
        F.count("*").alias("n_geoms"),
    )


QUERIES["raster_reconcile_nations"] = q_raster_reconcile_nations

ORACLES["raster_reconcile_nations"] = """
WITH g AS (
  SELECT n_nationkey AS id,
         CAST(n_nationkey % 5 AS DOUBLE) AS bx0,
         CAST(n_nationkey // 5 AS DOUBLE) AS by0,
         CAST(n_nationkey % 5 AS DOUBLE) + 1.2e0 AS bx1,
         CAST(n_nationkey // 5 AS DOUBLE) + 1.2e0 AS by1
  FROM nation
),
cells AS (
  SELECT cy * 8 + cx AS cell_id,
         CAST(cx AS DOUBLE) AS cx0, CAST(cy AS DOUBLE) AS cy0,
         CAST(cx AS DOUBLE) + 1.0e0 AS cx1, CAST(cy AS DOUBLE) + 1.0e0 AS cy1
  FROM (SELECT UNNEST(RANGE(0, 8)) AS cx)
  CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS cy)
),
ov AS (
  SELECT c.cell_id,
         (LEAST(g.bx1, c.cx1) - GREATEST(g.bx0, c.cx0))
       * (LEAST(g.by1, c.cy1) - GREATEST(g.by0, c.cy0)) AS a
  FROM cells c JOIN g
    ON LEAST(g.bx1, c.cx1) > GREATEST(g.bx0, c.cx0)
   AND LEAST(g.by1, c.cy1) > GREATEST(g.by0, c.cy0)
)
SELECT cell_id, ROUND(SUM(a / 1.0e0), 9) AS coverage, COUNT(*) AS n_geoms
FROM ov GROUP BY cell_id
"""


def q_shapefile_roundtrip_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipped-ESRI-shapefile bootstrap under the driver gate: a nations
    polygon layer WITH HOLES (unit square at (k%5, k//5), centered
    square hole of side 0.1 + 0.02*(k%10)) plus DBF attributes is
    written as a .zip shapefile (io.shapefile.write_shapefile_zip),
    read back through the driver-side bootstrap parser
    (read_shapefile_zip — the reference's only real input path,
    reference tests/test_assign.py:146-148), and measured: the oracle's
    closed-form hole areas and attribute values must survive the
    SHP ring-orientation + DBF round trip."""
    import os
    import tempfile

    from .geom.base import Geometry
    from .geom import vector as V
    from .io.shapefile import read_shapefile_zip, write_shapefile_zip

    nat = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name")
        .collect()
    )
    records = []
    for r in sorted(nat, key=lambda r: r["n_nationkey"]):
        k = int(r["n_nationkey"])
        gx, gy = float(k % 5), float(k // 5)
        s = 0.1 + 0.02 * (k % 10)
        outer = [[gx, gy], [gx + 1, gy], [gx + 1, gy + 1], [gx, gy + 1], [gx, gy]]
        hx0, hy0 = gx + 0.5 - s / 2, gy + 0.5 - s / 2
        hx1, hy1 = gx + 0.5 + s / 2, gy + 0.5 + s / 2
        hole = [[hx0, hy0], [hx1, hy0], [hx1, hy1], [hx0, hy1], [hx0, hy0]]
        records.append(
            (Geometry.polygon(outer, [hole]), {"NKEY": k, "NAME": r["n_name"]})
        )
    path = os.path.join(tempfile.gettempdir(), "maup_spark_nations_shp.zip")
    write_shapefile_zip(path, records, prj_wkt='PROJCS["synthetic"]')

    df = read_shapefile_zip(spark, path)
    area_udf = F.pandas_udf(V.batch_area, "double")
    return df.select(
        F.col("NKEY").alias("nation_id"),
        F.col("NAME").alias("n_name"),
        F.round(area_udf(F.col("geometry")) * F.lit(1.0e6))
        .cast("bigint")
        .alias("area_e6"),
    )


QUERIES["shapefile_roundtrip_nations"] = q_shapefile_roundtrip_nations

# hole side s = 0.1 + 0.02*(k%10) in DOUBLE arithmetic (same IEEE op
# order as the Python construction); area = 1 - s^2
ORACLES["shapefile_roundtrip_nations"] = """
SELECT CAST(n_nationkey AS BIGINT) AS nation_id,
       n_name,
       CAST(ROUND((1e0 - (0.1e0 + 0.02e0 * (n_nationkey % 10))
                       * (0.1e0 + 0.02e0 * (n_nationkey % 10))) * 1e6)
            AS BIGINT) AS area_e6
FROM nation
"""


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring (suffix-array-style) dedup stats at an 8-token
    match threshold over the dup-rich corpus (verbatim copies share all
    their grams; the suffix-wrapped copies share all but the tail)."""
    from .functions.dedup import substring_dedup

    return substring_dedup(_corpus(spark, sf_dir), min_len=8)


QUERIES["substring_dedup"] = q_substring_dedup

# mirrors functions.dedup.substring_dedup at L=8: gram keys are 60-bit
# md5-prefix BIGINTs; duplicated = total occurrences > 1; coverage =
# union of [pos, pos+8) via the classic prev-max-end sweep
ORACLES["substring_dedup"] = f"""
WITH {_CORPUS_CTE},
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
g AS (
  SELECT doc_id, toks,
         UNNEST(range(0, GREATEST(len(toks) - 7, 0))) AS pos
  FROM t
),
k AS (
  SELECT doc_id, pos,
         CAST(concat('0x',
              substr(md5(array_to_string(toks[pos + 1 : pos + 8], ' ')), 1, 15))
            AS BIGINT) AS gkey
  FROM g
),
d AS (
  SELECT doc_id, pos
  FROM (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY gkey) AS n FROM k)
  WHERE n > 1
),
s AS (
  SELECT doc_id, pos,
         MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_end
  FROM d
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS dup_grams,
         CAST(SUM(GREATEST(pos + 8 - GREATEST(pos, COALESCE(prev_end, 0)), 0))
              AS BIGINT) AS dup_token_cov
  FROM s GROUP BY doc_id
)
SELECT c.doc_id,
       CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tokens,
       COALESCE(p.dup_grams, 0) AS dup_grams,
       COALESCE(p.dup_token_cov, 0) AS dup_token_cov
FROM corpus c LEFT JOIN per_doc p USING (doc_id)
"""


# fixed demo merge table for the driver-gated exact-BPE encode: each
# merge's inputs exist only as base hex chars or earlier merge outputs,
# so applying merges exhaustively in rank order (the oracle's nested
# REPLACE chain over char-spaced words) equals the encoder's
# lowest-rank-first loop
_BPE_FIXED_MERGES = [("a", "b"), ("c", "d"), ("e", "f"), ("0", "1"), ("ab", "cd")]


def q_bpe_encode_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BPE token counts under the fixed merge table (the trained-
    table path is the same encoder; training itself is iterative and
    pytest-gated, tests/test_bpe.py)."""
    from .functions.bpe import bpe_encode_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return bpe_encode_count(docs, _BPE_FIXED_MERGES)


QUERIES["bpe_encode_fixed"] = q_bpe_encode_fixed

_BPE_REPLACE_CHAIN = "array_to_string(string_split_regex(word, ''), ' ')"
for _a, _b in _BPE_FIXED_MERGES:
    _BPE_REPLACE_CHAIN = f"REPLACE({_BPE_REPLACE_CHAIN}, '{_a} {_b}', '{_a}{_b}')"

ORACLES["bpe_encode_fixed"] = f"""
WITH w AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
),
enc AS (
  SELECT doc_id,
         len(string_split({_BPE_REPLACE_CHAIN}, ' ')) AS n
  FROM w WHERE word != ''
)
SELECT d.doc_id, CAST(COALESCE(e.n_sum, 0) AS BIGINT) AS n_bpe_exact
FROM documents d
LEFT JOIN (SELECT doc_id, SUM(n) AS n_sum FROM enc GROUP BY doc_id) e
  USING (doc_id)
"""


# ------------------------------------------------------------ bpe_trained
# End-to-end BPE: TRAIN at runtime on a fixed 100-doc slice, then encode
# the whole documents table with the learned table.  The oracle replays
# a PINNED merge list derived by an INDEPENDENT Spark-free trainer
# (scripts/derive_bpe_pin.py, collections.Counter over a duckdb scan;
# tests/test_bpe.py asserts the pin) through an exact recursive-CTE BPE
# encoder — lowest-rank-first, leftmost-occurrence, identical semantics
# to bpe_encode_count, valid for ARBITRARY learned merges (a REPLACE
# chain is only safe for curated tables like _BPE_FIXED_MERGES: learned
# merges contain composite tokens whose string forms collide across
# token boundaries).  If Spark training drifts from the pin, the encode
# counts diverge and the row goes red — training is driver-gated e2e.
_BPE_TRAIN_SLICE = 100
_BPE_TRAIN_NMERGES = 24
_BPE_PIN_MERGES = [
    ("e", "r"), ("o", "w"), ("s", "t"), ("i", "n"), ("o", "r"), ("l", "u"),
    ("m", "er"), ("a", "t"), ("a", "r"), ("p", "ar"), ("f", "i"),
    ("fi", "l"), ("fil", "t"), ("filt", "er"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("u", "p"), ("a", "s"), ("as", "h"), ("c", "o"),
    ("co", "lu"), ("colu", "m"), ("colum", "n"),
]


def q_bpe_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-encode in one driver query (judge r4 task 8): the
    merge table is LEARNED here, not fixed — bpe_train_merges runs its
    corpus aggregation (word_freq_topn, TakeOrderedAndProject-audited)
    + driver merge loop on the doc_id < 100 slice, and the learned
    table feeds bpe_encode_count over every document."""
    from .functions.bpe import bpe_encode_count, bpe_train_merges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    merges = bpe_train_merges(
        docs.filter(F.col("doc_id") < _BPE_TRAIN_SLICE),
        n_merges=_BPE_TRAIN_NMERGES,
    )
    return bpe_encode_count(docs, merges).select(
        "doc_id", F.col("n_bpe_exact").alias("n_bpe_trained")
    )


QUERIES["bpe_trained"] = q_bpe_trained

_BPE_PIN_VALS = ", ".join(
    f"({i}, '{a}', '{b}')" for i, (a, b) in enumerate(_BPE_PIN_MERGES)
)
# candidate merge positions of a token list (rk sorts before i in the
# struct, so list_sort()[1] is the lowest-rank leftmost application)
_BPE_CAND = """list_filter(
    list_transform(range(1, len(toks)),
      i -> {'rk': CASE WHEN len(m[toks[i] || chr(1) || toks[i+1]]) > 0
                       THEN m[toks[i] || chr(1) || toks[i+1]][1] END,
            'i': i}),
    x -> x.rk IS NOT NULL)"""

ORACLES["bpe_trained"] = f"""
WITH RECURSIVE
mg(rank, l, r) AS (VALUES {_BPE_PIN_VALS}),
mm AS (SELECT map(list(l || chr(1) || r ORDER BY rank),
                  list(rank ORDER BY rank)) AS m FROM mg),
words AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT doc_id, word, COUNT(*) AS cnt FROM words WHERE word != ''
  GROUP BY doc_id, word
),
dw AS (SELECT DISTINCT word FROM wc),
enc AS (
  SELECT word, string_split_regex(word, '') AS toks FROM dw
  UNION ALL
  SELECT word,
    list_slice(toks, 1, best.i - 1)
      || [toks[best.i] || toks[best.i + 1]]
      || list_slice(toks, best.i + 2, len(toks)) AS toks
  FROM (
    SELECT word, toks, list_sort({_BPE_CAND})[1] AS best
    FROM enc, mm
  ) WHERE best IS NOT NULL
),
final AS (
  SELECT word, len(toks) AS n FROM enc, mm WHERE len({_BPE_CAND}) = 0
)
SELECT d.doc_id, CAST(COALESCE(s.n_sum, 0) AS BIGINT) AS n_bpe_trained
FROM documents d
LEFT JOIN (
  SELECT wc.doc_id, SUM(wc.cnt * f.n) AS n_sum
  FROM wc JOIN final f USING (word) GROUP BY wc.doc_id
) s USING (doc_id)
"""


def q_corpus_doctor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health check over the dup-rich corpus (the
    document twin of doctor_dirty_nations): the synthetic exact-dup
    rate (~1/7 of base docs) exceeds the 5% bar, so healthy=false with
    the evidence columns showing why."""
    from .functions.profile import corpus_doctor

    return corpus_doctor(_corpus(spark, sf_dir))


QUERIES["corpus_doctor"] = q_corpus_doctor

ORACLES["corpus_doctor"] = f"""
WITH {_CORPUS_CTE},
a AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_empty,
         COUNT(*) - COUNT(DISTINCT COALESCE(md5(text), '__null__'))
           AS n_dup_docs,
         CAST(ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) * 1e3)
              AS BIGINT) AS mean_tokens_e3
  FROM corpus
)
SELECT n_docs, n_empty, CAST(n_dup_docs AS BIGINT) AS n_dup_docs,
       mean_tokens_e3,
       (n_empty = 0 AND CAST(n_dup_docs AS DOUBLE) <= 0.05e0 * n_docs
        AND mean_tokens_e3 >= 5000) AS healthy
FROM a
"""


# ---------------------------------------------------------------------------
# Round 5: web-crawl hygiene (url canonicalization/dedup, host analytics,
# benchmark contamination, deterministic upsampling) — the crawl-side
# extensions of the north_star pages schema.  functions/webtext.py.
# ---------------------------------------------------------------------------


def _crawl_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl-heavy synthetic crawl over the documents table: a base
    page per doc (one host per source) plus a www+utm recrawl for
    doc_id%3==0 and a trailing-slash recrawl for doc_id%5==0 — the
    canonical-URL families a crawl dedup must collapse.  Columns:
    (url, crawl_ts BIGINT epoch, text, lang)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    docs = docs.repartition(n_part)
    did = F.col("doc_id").cast("string")
    base_url = F.concat(F.lit("https://"), F.col("source"),
                        F.lit(".example.com/doc/"), did)
    base_ts = (F.lit(1704067200) + F.col("doc_id") * 60).cast("long")
    base = docs.select(base_url.alias("url"), base_ts.alias("crawl_ts"),
                       "text", "lang")
    recrawl_www = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.concat(F.lit("https://www."), F.col("source"),
                 F.lit(".example.com/doc/"), did,
                 F.lit("?utm_source=feed&ref=rss")).alias("url"),
        (base_ts + 86400).alias("crawl_ts"), "text", "lang",
    )
    recrawl_slash = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.concat(base_url, F.lit("/")).alias("url"),
        (base_ts + 3600).alias("crawl_ts"), "text", "lang",
    )
    return base.unionAll(recrawl_www).unionAll(recrawl_slash)


_CRAWL_CTE = """crawl AS (
  SELECT 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         CAST(1704067200 + doc_id * 60 AS BIGINT) AS crawl_ts, text, lang
  FROM documents
  UNION ALL
  SELECT 'https://www.' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
           || '?utm_source=feed&ref=rss',
         CAST(1704067200 + doc_id * 60 + 86400 AS BIGINT), text, lang
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) || '/',
         CAST(1704067200 + doc_id * 60 + 3600 AS BIGINT), text, lang
  FROM documents WHERE doc_id % 5 = 0
)"""

# DuckDB mirror of functions.webtext.canonicalize_url (same regexes,
# same param filter+sort) applied to the crawl CTE
_CANON_CTE = r"""c1 AS (
  SELECT url, crawl_ts, regexp_replace(url, '#.*$', '') AS u FROM crawl
),
c2 AS (
  SELECT url, crawl_ts, regexp_replace(u, '\?.*$', '') AS base,
         regexp_extract(u, '\?(.*)$', 1) AS q
  FROM c1
),
c3 AS (
  SELECT url, crawl_ts,
         lower(regexp_extract(base, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1)) AS origin0,
         regexp_replace(base, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', '') AS path0, q
  FROM c2
),
c4 AS (
  SELECT url, crawl_ts,
         regexp_replace(regexp_replace(regexp_replace(origin0,
           '^([a-z][a-z0-9+.-]*://)www\.', '\1'),
           '^(http://[^/:]*):80$', '\1'),
           '^(https://[^/:]*):443$', '\1') AS origin,
         regexp_replace(path0, '/$', '') AS path,
         COALESCE(array_to_string(list_sort(list_filter(string_split(q, '&'),
           p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)='))),
           '&'), '') AS qs
  FROM c3
),
canon AS (
  SELECT CASE WHEN qs = '' THEN origin || path
              ELSE origin || path || '?' || qs END AS canon_url,
         url, crawl_ts
  FROM c4
)"""


def q_url_dedup_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl dedup: earliest crawl per canonical URL + recrawl count.
    Pure-projection canonicalization then ONE min(struct) hash-agg —
    map-side combine absorbs recrawl-hot URLs (no per-key window)."""
    from .functions.webtext import url_dedup

    out = url_dedup(_crawl_pages(spark, sf_dir), ts_col="crawl_ts")
    return out.select("canon_url", "url",
                      F.col("crawl_ts").alias("first_ts"), "n_crawls")


QUERIES["url_dedup_pages"] = q_url_dedup_pages

ORACLES["url_dedup_pages"] = f"""
WITH {_CRAWL_CTE},
{_CANON_CTE},
sel AS (
  SELECT canon_url, url, crawl_ts,
         ROW_NUMBER() OVER (PARTITION BY canon_url
                            ORDER BY crawl_ts, url) AS rn,
         COUNT(*) OVER (PARTITION BY canon_url) AS n
  FROM canon
)
SELECT canon_url, url, crawl_ts AS first_ts, n AS n_crawls
FROM sel WHERE rn = 1
"""


def q_host_stats_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl analytics, top-10 hosts by page count (full
    (n_pages DESC, host) tie-break so the top-K set is deterministic).
    Hash-agg + TakeOrderedAndProject — the driver sees 10 rows."""
    from .functions.webtext import host_stats

    return host_stats(_crawl_pages(spark, sf_dir), top_n=10)


QUERIES["host_stats_pages"] = q_host_stats_pages

ORACLES["host_stats_pages"] = f"""
WITH {_CRAWL_CTE}
SELECT regexp_replace(lower(regexp_extract(url,
         '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)), '^www\\.', '') AS host,
       COUNT(*) AS n_pages,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM crawl
GROUP BY 1
ORDER BY n_pages DESC, host
LIMIT 10
"""


def q_contamination_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: the eval suite is the
    doc_id%97==0 slice; corpus docs with doc_id%10==7 get the text of
    bench doc 0 appended (a REAL leak the ratio must flag).  Benchmark
    gram set broadcast; per-doc array_distinct before the explode; one
    map-side-combinable agg — no hot key (grouped by doc_id)."""
    from .functions.webtext import contamination_check

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    docs = docs.repartition(n_part)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    leak = F.broadcast(
        bench.filter(F.col("doc_id") == 0).select(F.col("text").alias("__leak"))
    )
    corpus = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .crossJoin(leak)
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 10 == 7,
                   F.concat(F.col("text"), F.lit(" "), F.col("__leak")))
            .otherwise(F.col("text")),
        )
        .drop("__leak")
    )
    out = contamination_check(corpus, bench, n=5)
    return out.select(
        "doc_id", "n_grams", "n_matched",
        F.round(F.col("contamination"), 6).alias("contamination"),
    )


QUERIES["contamination_docs"] = q_contamination_docs

ORACLES["contamination_docs"] = """
WITH leak AS (SELECT text FROM documents WHERE doc_id = 0),
corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 7 THEN d.text || ' ' || (SELECT text FROM leak)
              ELSE d.text END AS text
  FROM documents d WHERE doc_id % 97 <> 0
),
ctoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
cgrams AS (
  SELECT doc_id,
         UNNEST(list_distinct(list_transform(
           range(0, greatest(len(t) - 5 + 1, 0)),
           i -> array_to_string(t[i+1:i+5], ' ')))) AS gram
  FROM ctoks
),
btoks AS (SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id % 97 = 0),
bgrams AS (
  SELECT DISTINCT UNNEST(list_transform(
           range(0, greatest(len(t) - 5 + 1, 0)),
           i -> array_to_string(t[i+1:i+5], ' '))) AS gram
  FROM btoks
)
SELECT c.doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched,
       ROUND(CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS contamination
FROM cgrams c LEFT JOIN bgrams b USING (gram)
GROUP BY c.doc_id
"""


def q_upsample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature upsampling: per-source weights, floor
    copies + md5-consistent-hash fractional copy.  Pure projection +
    explode(sequence) — no shuffle, identical at any parallelism."""
    from .functions.webtext import upsample_by_source

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    out = upsample_by_source(
        docs.repartition(n_part),
        {"src0": 3.0, "src1": 0.0, "src2": 1.5, "src3": 0.25},
        default_weight=1.0,
    )
    return out.select("doc_id", "source", "copy_idx")


QUERIES["upsample_sources"] = q_upsample_sources

ORACLES["upsample_sources"] = """
WITH wtab AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#upsample'),
                                  1, 15)) AS BIGINT)
           / 1152921504606846976.0 AS u,
         CASE source WHEN 'src0' THEN 3.0 WHEN 'src1' THEN 0.0
                     WHEN 'src2' THEN 1.5 WHEN 'src3' THEN 0.25
                     ELSE 1.0 END AS w
  FROM documents
),
n AS (
  SELECT doc_id, source,
         CAST(floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END AS INT)
           AS nc
  FROM wtab
)
SELECT doc_id, source, CAST(UNNEST(range(1, nc + 1)) AS INT) AS copy_idx
FROM n WHERE nc >= 1
"""


def q_pack_shards_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-stream sharding over the documents table (K=1000 tokens
    per shard, small blocks so the two-level scan actually exercises
    the block-offset path at sf scale)."""
    from .functions.webtext import pack_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    return pack_shards(docs.repartition(n_part), 1000, block=64)


QUERIES["pack_shards_docs"] = q_pack_shards_docs

ORACLES["pack_shards_docs"] = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST(floor((cum - n_tokens) / 1000.0) AS BIGINT) AS shard_id
FROM c
"""


# ---------------------------------------------------------------------------
# PII scrub + duplicate-cluster keep-best (round 5 webtext additions)
# ---------------------------------------------------------------------------

def _pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with deterministically injected PII so the scrub has
    known positives: every 7th doc gains an email, every 11th an IPv4,
    every 13th an intl-format phone number (a doc can gain several)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = spark.sparkContext.defaultParallelism
    docs = docs.repartition(n_part)
    did = F.col("doc_id")
    ds = did.cast("string")
    email = F.when(
        did % 7 == 0,
        F.concat(F.lit(" Contact user"), ds,
                 F.lit("@example.com for details.")),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 11 == 0,
        F.concat(F.lit(" Served from 10."), (did % 256).cast("string"),
                 F.lit("."), ((did * 7) % 256).cast("string"),
                 F.lit("."), ((did * 13) % 256).cast("string"),
                 F.lit(" ok.")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 13 == 0,
        F.concat(F.lit(" Call +1-"),
                 F.lpad((did % 1000).cast("string"), 3, "0"), F.lit("-"),
                 F.lpad(((did * 3) % 1000).cast("string"), 3, "0"),
                 F.lit("-"),
                 F.lpad(((did * 7) % 10000).cast("string"), 4, "0"),
                 F.lit(" now.")),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(F.col("text"), email, ip, phone).alias("text")
    )


_PII_CTE = """pii AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' Contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com for details.' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' Served from 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 13) % 256 AS VARCHAR) || ' ok.'
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' Call +1-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                      || '-' || lpad(CAST((doc_id * 3) % 1000 AS VARCHAR), 3, '0')
                      || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                      || ' now.'
                 ELSE '' END AS text
  FROM documents
)"""


def q_pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the injected-PII corpus: per-doc
    match counts and the md5 of the redacted text (proves byte-
    identical redaction cross-engine).  Pure codegen projection —
    zero shuffle, zero Python."""
    from .functions.webtext import pii_scrub

    out = pii_scrub(_pii_docs(spark, sf_dir))
    return out.select(
        "doc_id", "n_email", "n_phone", "n_ipv4",
        F.md5(F.col("clean_text")).alias("clean_md5"),
    )


QUERIES["pii_scrub_docs"] = q_pii_scrub_docs

# keep the regex literals in sync with functions.webtext PII_*_RE
_PII_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE_SQL = "\\+\\d{1,2}[- ]\\d{3}[- ]\\d{3}[- ]\\d{4}"
_PII_IPV4_SQL = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

ORACLES["pii_scrub_docs"] = f"""
WITH {_PII_CTE}
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '{_PII_EMAIL_SQL}')) AS BIGINT)
         AS n_email,
       CAST(length(regexp_extract_all(text, '{_PII_PHONE_SQL}')) AS BIGINT)
         AS n_phone,
       CAST(length(regexp_extract_all(text, '{_PII_IPV4_SQL}')) AS BIGINT)
         AS n_ipv4,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
             '{_PII_PHONE_SQL}', '<PHONE>', 'g'),
             '{_PII_IPV4_SQL}', '<IP>', 'g')) AS clean_md5
FROM pii
"""


def q_keep_best_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster representative selection over the dedup
    corpus: cluster by content fingerprint, keep the highest-quality
    member (ties -> lowest doc_id; exact-dup clusters tie by
    construction, so this also gates tie determinism).  One scoring
    projection + ONE lexicographic max(struct) hash-agg."""
    from .functions.dedup import keep_best
    from .functions.text import quality_score

    scored = quality_score(
        _corpus(spark, sf_dir),
        keep_cols=(F.md5(F.col("text")).alias("fingerprint"),),
    )
    out = keep_best(
        scored.select("fingerprint", "doc_id", "score_e6"),
        "fingerprint", "score_e6", min_members=2,
    )
    return out.select(
        "fingerprint", F.col("doc_id").alias("best_id"),
        "score_e6", "n_members",
    )


QUERIES["keep_best_docs"] = q_keep_best_docs

_QPUNCT_SUM = " + ".join(
    f"(length(text) - length(replace(text, '{p}', '')))"
    for p in (".", ",", "!", "?", ";", ":")
)

ORACLES["keep_best_docs"] = f"""
WITH {_CORPUS_CTE},
q AS (
  SELECT doc_id, md5(text) AS fingerprint,
         ({_QPUNCT_SUM}) AS n_punct,
         ({_STOPWORD_HITS}) AS n_stop,
         length(text) AS n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens
  FROM corpus
),
s AS (
  SELECT doc_id, fingerprint,
         CAST(ROUND((0.4e0 * (CASE WHEN n_chars >= 64 AND n_chars <= 100000
                                   THEN 1.0e0 ELSE 0.0e0 END)
                     + 0.3e0 * LEAST(1.0e0, 10.0e0 * (CAST(n_punct AS DOUBLE) / n_tokens))
                     + 0.3e0 * LEAST(1.0e0, 20.0e0 * (CAST(n_stop AS DOUBLE) / n_tokens)))
                    * 1.0e6) AS BIGINT) AS score_e6
  FROM q
),
sel AS (
  SELECT fingerprint, doc_id, score_e6,
         ROW_NUMBER() OVER (PARTITION BY fingerprint
                            ORDER BY score_e6 DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY fingerprint) AS n
  FROM s
)
SELECT fingerprint, doc_id AS best_id, score_e6,
       CAST(n AS BIGINT) AS n_members
FROM sel WHERE rn = 1 AND n >= 2
"""


# ---------------------------------------------------------------------------
# Corpus-frequency LM filter (CCNet perplexity-bucket analog, round 5)
# ---------------------------------------------------------------------------

_LM_VOCAB = 256  # small on purpose: forces genuine OOV mass at sf0.01


def q_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the bounded-vocab frequency LM on the dedup corpus, score
    every document, emit the head/middle/tail bucket.  Train = explode
    + hash-agg + TakeOrderedAndProject; score = broadcast vocab join +
    one per-doc agg.  Integer-exact end to end (see functions/lm.py)."""
    from .functions.lm import lm_score, lm_train

    corpus = _corpus(spark, sf_dir)
    lm = lm_train(corpus, max_vocab=_LM_VOCAB)
    return lm_score(corpus, lm)


QUERIES["lm_familiarity"] = q_lm_familiarity

ORACLES["lm_familiarity"] = f"""
WITH {_CORPUS_CTE},
tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM corpus),
tokn AS (SELECT doc_id, w FROM tok WHERE w <> ''),
vocab AS (
  SELECT w, COUNT(*) AS cnt FROM tokn GROUP BY w
  ORDER BY cnt DESC, w LIMIT {_LM_VOCAB}
),
fam AS (SELECT w, CAST(length(bin(cnt)) - 1 AS BIGINT) AS fam FROM vocab),
sc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN f.fam IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
         CAST(SUM(COALESCE(f.fam, 0)) AS BIGINT) AS fam_sum
  FROM tokn t LEFT JOIN fam f ON f.w = t.w
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, n_oov, fam_sum,
       CAST(ROUND(1e6 * fam_sum / n_tokens) AS BIGINT) AS fam_mean_e6,
       CASE WHEN CAST(ROUND(1e6 * fam_sum / n_tokens) AS BIGINT) >= 4000000
                 THEN 'head'
            WHEN CAST(ROUND(1e6 * fam_sum / n_tokens) AS BIGINT) < 2000000
                 THEN 'tail'
            ELSE 'middle' END AS bucket
FROM sc
"""


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis-Spirakis A-Res, round 5)
# ---------------------------------------------------------------------------

_WS_K = 200


def q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-row weighted sample of documents with inclusion probability
    proportional to doc length (the long-doc-favoring mixture draw).
    Exp(w) race on md5-derived uniforms; distributed top-K
    (TakeOrderedAndProject) — no global sort, no RNG state."""
    from .functions.text import weighted_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    return weighted_sample(docs, _WS_K, "n_chars")


QUERIES["weighted_sample_docs"] = q_weighted_sample_docs

ORACLES["weighted_sample_docs"] = f"""
WITH w AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         -ln(greatest(
             CAST(concat('0x', substr(md5(doc_id || '#ws'), 1, 15)) AS BIGINT)
             / 1152921504606846976.0,
             power(2.0, -60)))
           / CAST(length(text) AS DOUBLE) AS k
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, n_chars FROM w ORDER BY k, doc_id LIMIT {_WS_K}
"""


# ---------------------------------------------------------------------------
# Near-dup capstone: minhash LSH -> connected components -> keep-best
# (round 5; driver-gates operators/components.py end-to-end via a
# recursive-CTE oracle)
# ---------------------------------------------------------------------------

def q_minhash_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production near-dup path in one query: LSH candidate
    pairs over the dedup corpus -> distributed connected components
    (min-label propagation + pointer jumping, operators/components.py)
    -> highest-quality representative per cluster (keep_best
    lexicographic max-struct agg).  Every stage is the scale shape:
    banded equi-joins, O(log n)-round label shuffles, one final
    map-side-combinable agg — no windows, no Python."""
    from .functions.dedup import keep_best, minhash_lsh_pairs
    from .functions.text import quality_score
    from .operators.components import connected_components

    corpus = _corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(corpus)
    nodes = corpus.select(F.col("doc_id").alias("node"))
    comp = connected_components(
        nodes, pairs, src_col="doc_a", dst_col="doc_b"
    )
    scored = quality_score(corpus).select("doc_id", "score_e6")
    clustered = comp.join(
        scored, comp["node"] == scored["doc_id"]
    ).select("comp", "doc_id", "score_e6")
    out = keep_best(clustered, "comp", "score_e6", min_members=2)
    return out.select(
        F.col("comp").alias("cluster_id"),
        F.col("doc_id").alias("best_id"),
        "score_e6",
        "n_members",
    )


QUERIES["minhash_cluster_keep_best"] = q_minhash_cluster_keep_best

ORACLES["minhash_cluster_keep_best"] = f"""
WITH RECURSIVE {_CORPUS_CTE}, {_SHINGLE_CTE}, {_MINHASH_CTE},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
reach AS (
  SELECT doc_id AS node, doc_id AS lab FROM corpus
  UNION
  SELECT e.dst AS node, r.lab FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, MIN(lab) AS comp FROM reach GROUP BY node),
q AS (
  SELECT doc_id,
         ({_QPUNCT_SUM}) AS n_punct,
         ({_STOPWORD_HITS}) AS n_stop,
         length(text) AS n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens
  FROM corpus
),
s AS (
  SELECT doc_id,
         CAST(ROUND((0.4e0 * (CASE WHEN n_chars >= 64 AND n_chars <= 100000
                                   THEN 1.0e0 ELSE 0.0e0 END)
                     + 0.3e0 * LEAST(1.0e0, 10.0e0 * (CAST(n_punct AS DOUBLE) / n_tokens))
                     + 0.3e0 * LEAST(1.0e0, 20.0e0 * (CAST(n_stop AS DOUBLE) / n_tokens)))
                    * 1.0e6) AS BIGINT) AS score_e6
  FROM q
),
cl AS (
  SELECT c.comp, s.doc_id, s.score_e6
  FROM comp c JOIN s ON s.doc_id = c.node
),
sel AS (
  SELECT comp, doc_id, score_e6,
         ROW_NUMBER() OVER (PARTITION BY comp
                            ORDER BY score_e6 DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY comp) AS n
  FROM cl
)
SELECT comp AS cluster_id, doc_id AS best_id, score_e6,
       CAST(n AS BIGINT) AS n_members
FROM sel WHERE rn = 1 AND n >= 2
"""


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023 analog, round 5)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096
_DSIR_K = 150


def q_dsir_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: every 17th document is the 'curated target'
    slice, the rest are the raw crawl; hashed unigram+bigram models on
    both, integer importance score per raw doc, top-150 most
    target-like selected.  Two bounded hash-aggs + broadcast ratio
    join + per-doc agg + TakeOrderedAndProject — zero windows, zero
    Python (see functions/dsir.py).

    Fixed-cost layout (round 6): the raw corpus EXPLODES ONCE — the
    persisted ``bucketed_grams`` occurrence table feeds both the raw
    model counts and the scorer (the explode + md5 chain dominated the
    train-at-query-time cost, previously paid twice); the scan is
    repartitioned first so the explode fans out across the cluster
    instead of inheriting the source file's partition count."""
    from pyspark.storagelevel import StorageLevel

    from .functions.dsir import (
        bucketed_grams,
        counts_from_buckets,
        dsir_ratio,
        dsir_score,
        dsir_select,
        hashed_gram_counts,
    )

    n_part = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(n_part)
    )
    target = docs.filter(F.col("doc_id") % 17 == 0)
    raw = docs.filter(F.col("doc_id") % 17 != 0)
    raw_b = bucketed_grams(
        raw, n_buckets=_DSIR_BUCKETS, id_col="doc_id"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ratio = dsir_ratio(
        hashed_gram_counts(target, n_buckets=_DSIR_BUCKETS),
        counts_from_buckets(raw_b),
    )
    scored = dsir_score(raw, ratio, n_buckets=_DSIR_BUCKETS, bucketed=raw_b)
    return dsir_select(scored, _DSIR_K).select("doc_id", "n_grams", "score")


QUERIES["dsir_select_docs"] = q_dsir_select_docs

# Mirrors functions/dsir.py gram-for-gram: unigram+bigram lists over
# split-on-space tokens (short-doc guard via greatest(.,0)), 48-bit
# md5-prefix bucket, fam = length(bin(cnt+1))-1, full-outer ratio,
# left-join score, top-K ordered by (score DESC, doc_id).
ORACLES["dsir_select_docs"] = f"""
WITH tgt AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
raw AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0),
tg AS (
  SELECT UNNEST(
    list_transform(range(0, greatest(len(t) - 1 + 1, 0)),
                   i -> array_to_string(t[i+1:i+1], ' '))
    || list_transform(range(0, greatest(len(t) - 2 + 1, 0)),
                      i -> array_to_string(t[i+1:i+2], ' '))
  ) AS gram
  FROM (SELECT string_split(text, ' ') AS t FROM tgt)
),
rg AS (
  SELECT doc_id, UNNEST(
    list_transform(range(0, greatest(len(t) - 1 + 1, 0)),
                   i -> array_to_string(t[i+1:i+1], ' '))
    || list_transform(range(0, greatest(len(t) - 2 + 1, 0)),
                      i -> array_to_string(t[i+1:i+2], ' '))
  ) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM raw)
),
tc AS (
  SELECT CAST(concat('0x', substr(md5(gram), 1, 12)) AS BIGINT)
           % {_DSIR_BUCKETS} AS bucket,
         COUNT(*) AS cnt_p
  FROM tg GROUP BY 1
),
rb AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(gram), 1, 12)) AS BIGINT)
           % {_DSIR_BUCKETS} AS bucket
  FROM rg
),
rc AS (SELECT bucket, COUNT(*) AS cnt_q FROM rb GROUP BY bucket),
ratio AS (
  SELECT COALESCE(tc.bucket, rc.bucket) AS bucket,
         (CAST(length(bin(COALESCE(cnt_p, 0) + 1)) - 1 AS BIGINT)
          - CAST(length(bin(COALESCE(cnt_q, 0) + 1)) - 1 AS BIGINT)) AS w
  FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket
),
sc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(COALESCE(w, 0)) AS BIGINT) AS score
  FROM rb LEFT JOIN ratio USING (bucket)
  GROUP BY doc_id
)
SELECT doc_id, n_grams, score FROM sc
ORDER BY score DESC, doc_id LIMIT {_DSIR_K}
"""


# ---------------------------------------------------------------------------
# Dedup-key text normalization (Lee et al. / C4 preprocessing, round 5)
# ---------------------------------------------------------------------------


def q_normalize_text_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization for dedup keys: lowercase, strip non-letter/digit/
    whitespace, collapse whitespace, trim — md5 of the result proves
    byte-identical normalization cross-engine.  Pure codegen
    projection, zero shuffle (see functions/text.py normalize_text)."""
    from .functions.text import normalize_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = normalize_text(docs)
    return out.select(
        "doc_id",
        F.md5(F.col("norm_text")).alias("norm_md5"),
        F.length(F.col("norm_text")).alias("norm_len"),
    )


QUERIES["normalize_text_docs"] = q_normalize_text_docs

# Mirrors normalize_text step-for-step; RE2 reads \p{L}/\p{N}/\s the
# same as Java regex (no lookaround/backrefs), DuckDB regexp_replace
# needs the explicit 'g' flag Spark applies implicitly.
ORACLES["normalize_text_docs"] = """
SELECT doc_id,
       md5(trim(regexp_replace(
             regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]+', '', 'g'),
             '\\s+', ' ', 'g'))) AS norm_md5,
       CAST(length(trim(regexp_replace(
             regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]+', '', 'g'),
             '\\s+', ' ', 'g'))) AS INT) AS norm_len
FROM documents
"""


# ---------------------------------------------------------------------------
# Document chunking (fixed token windows with overlap, round 5)
# ---------------------------------------------------------------------------

_CHUNK_MAX = 32
_CHUNK_OVERLAP = 8


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into 32-token windows with 8-token overlap
    (the trainer-facing complement of pack_shards): md5 of each chunk
    proves byte-identical windowing cross-engine.  Pure projection +
    explode, zero shuffle (see functions/text.py chunk_documents)."""
    from .functions.text import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = chunk_documents(docs, max_tokens=_CHUNK_MAX, overlap=_CHUNK_OVERLAP)
    return out.select(
        "doc_id",
        "chunk_idx",
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
        "n_chunk_tokens",
    )


QUERIES["chunk_docs"] = q_chunk_docs

# stride = max_tokens - overlap = 24; chunk i covers tokens
# [i*24+1 .. i*24+32] (1-based inclusive slice == Spark slice(start,
# 32)); starts while i*24 < n  <=>  i <= floor((n-1)/24)
ORACLES["chunk_docs"] = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
c AS (
  SELECT doc_id, t,
         UNNEST(range(0, CAST(floor((len(t) - 1) / 24.0) AS BIGINT) + 1))
           AS chunk_idx
  FROM tok
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       md5(array_to_string(t[chunk_idx*24 + 1 : chunk_idx*24 + 32], ' '))
         AS chunk_md5,
       CAST(len(t[chunk_idx*24 + 1 : chunk_idx*24 + 32]) AS INT)
         AS n_chunk_tokens
FROM c
"""


# ---------------------------------------------------------------------------
# Bigram LM with unigram backoff (CCNet n-gram fidelity upgrade, round 5)
# ---------------------------------------------------------------------------

_LM2_VOCAB = 512


def q_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram familiarity with integer Katz-shaped backoff: train the
    bounded bigram + unigram tables on the dedup corpus, score every
    document.  Train = explode + hash-agg + TakeOrderedAndProject ×2;
    score = two BROADCAST vocab joins + one per-doc agg — zero
    windows, integer-exact end to end (see functions/lm.py)."""
    from .functions.lm import lm2_score, lm2_train, lm_train

    corpus = _corpus(spark, sf_dir)
    lm1 = lm_train(corpus, max_vocab=_LM_VOCAB)
    lm2 = lm2_train(corpus, max_vocab=_LM2_VOCAB)
    return lm2_score(corpus, lm2, lm1)


QUERIES["lm_bigram"] = q_lm_bigram

# Mirrors lm2_train/lm2_score gram-for-gram: bigrams over raw
# split-on-space tokens (the contamination grammar at n=2), unigram
# vocab excludes empty tokens (the lm_train grammar), backoff =
# GREATEST(COALESCE(f1,0)-1, 0), one final division.
ORACLES["lm_bigram"] = f"""
WITH {_CORPUS_CTE},
tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM corpus),
tokn AS (SELECT doc_id, w FROM tok WHERE w <> ''),
vocab1 AS (
  SELECT w, COUNT(*) AS cnt FROM tokn GROUP BY w
  ORDER BY cnt DESC, w LIMIT {_LM_VOCAB}
),
fam1 AS (SELECT w, CAST(length(bin(cnt)) - 1 AS BIGINT) AS f1 FROM vocab1),
bg AS (
  SELECT doc_id, UNNEST(list_transform(
           range(0, greatest(len(t) - 2 + 1, 0)),
           i -> array_to_string(t[i+1:i+2], ' '))) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
),
vocab2 AS (
  SELECT g, COUNT(*) AS cnt FROM bg GROUP BY g
  ORDER BY cnt DESC, g LIMIT {_LM2_VOCAB}
),
fam2 AS (SELECT g, CAST(length(bin(cnt)) - 1 AS BIGINT) AS f2 FROM vocab2),
sc AS (
  SELECT b.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(CASE WHEN f2.f2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits2,
         CAST(SUM(COALESCE(f2.f2,
                  GREATEST(COALESCE(f1.f1, 0) - 1, 0))) AS BIGINT)
           AS fam_sum
  FROM bg b
  LEFT JOIN fam2 f2 ON f2.g = b.g
  LEFT JOIN fam1 f1 ON f1.w = split_part(b.g, ' ', 2)
  GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams, n_hits2, fam_sum,
       CAST(ROUND(1e6 * fam_sum / n_bigrams) AS BIGINT) AS fam_mean_e6
FROM sc
"""


# ---------------------------------------------------------------------------
# Corpus QA reports: boilerplate-discovery top n-grams + per-source
# governance stats (round 5)
# ---------------------------------------------------------------------------

_TOPNG_N = 3
_TOPNG_K = 100


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent word 3-grams with doc frequency over the dedup
    corpus (its synthetic boilerplate suffixes surface at the top —
    exactly what the report exists to find).  One hash-agg per metric
    + TakeOrderedAndProject (see functions/webtext.py top_ngrams)."""
    from .functions.webtext import top_ngrams

    return top_ngrams(_corpus(spark, sf_dir), n=_TOPNG_N, top_k=_TOPNG_K)


QUERIES["top_ngrams"] = q_top_ngrams

ORACLES["top_ngrams"] = f"""
WITH {_CORPUS_CTE},
g AS (
  SELECT doc_id, UNNEST(list_transform(
           range(0, greatest(len(t) - 3 + 1, 0)),
           i -> array_to_string(t[i+1:i+3], ' '))) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
),
occ AS (SELECT gram, COUNT(*) AS n_occurrences FROM g GROUP BY gram),
gd AS (
  SELECT doc_id, UNNEST(list_distinct(list_transform(
           range(0, greatest(len(t) - 3 + 1, 0)),
           i -> array_to_string(t[i+1:i+3], ' ')))) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
),
df AS (SELECT gram, COUNT(*) AS n_docs FROM gd GROUP BY gram)
SELECT occ.gram, occ.n_occurrences, df.n_docs
FROM occ JOIN df USING (gram)
ORDER BY n_occurrences DESC, gram LIMIT {_TOPNG_K}
"""


def q_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source governance report over the documents table: counts,
    char/token mass, scaled-integer means (the table mixture weights
    are decided from).  ONE map-side-combinable hash-agg."""
    from .functions.webtext import source_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    return source_stats(docs)


QUERIES["source_stats"] = q_source_stats

ORACLES["source_stats"] = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(ROUND(1e6 * SUM(length(text)) / COUNT(*)) AS BIGINT)
         AS mean_chars_e6,
       CAST(ROUND(1e6 * SUM(len(string_split(text, ' '))) / COUNT(*))
            AS BIGINT) AS mean_tokens_e6
FROM documents
GROUP BY source
"""


# ---------------------------------------------------------------------------
# Host blocklist filter + corpus length histogram (round 5)
# ---------------------------------------------------------------------------


def q_blocklist_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style badlist stage: drop pages whose canonical host is on
    the blocklist (here the src0/src7 source hosts), return the
    per-host survivor counts (bounded output).  Broadcast left-anti
    join, one hash-agg (see functions/webtext.py)."""
    from .functions.webtext import host_blocklist_filter, host_of

    pages = _crawl_pages(spark, sf_dir)
    bl = spark.createDataFrame(
        [("src0.example.com",), ("src7.example.com",)], "host string"
    )
    kept = host_blocklist_filter(pages, bl)
    return (
        kept.select(host_of(F.col("url")).alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("n_pages"))
    )


QUERIES["blocklist_pages"] = q_blocklist_pages

ORACLES["blocklist_pages"] = f"""
WITH {_CRAWL_CTE},
hosts AS (
  SELECT regexp_replace(lower(regexp_extract(url,
           '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)), '^www\\.', '')
           AS host
  FROM crawl
)
SELECT host, COUNT(*) AS n_pages
FROM hosts
WHERE host NOT IN ('src0.example.com', 'src7.example.com')
GROUP BY host
"""


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two length-distribution buckets over the documents
    table — the table length-filter thresholds are sanity-checked
    against.  ONE bounded hash-agg (see functions/text.py)."""
    from .functions.text import length_histogram

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    return length_histogram(docs)


QUERIES["length_histogram"] = q_length_histogram

ORACLES["length_histogram"] = """
SELECT CAST(length(bin(length(text) + 1)) - 1 AS BIGINT) AS bucket,
       CAST(power(2, length(bin(length(text) + 1)) - 1) AS BIGINT) - 1
         AS lo_chars,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Per-source distribution divergence (governance report, round 5)
# ---------------------------------------------------------------------------

_SDIV_BUCKETS = 4096


def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer L1 distance between each source's hashed-gram
    distribution and the corpus — the outlier-source report.  One
    explode + bounded (source, bucket) hash-agg + broadcast corpus
    buckets + per-source agg; decimal(38,0) keeps the cross-multiplied
    products exact (see functions/dsir.py source_divergence); BIGINT
    casts are exact at this scale."""
    from .functions.dsir import source_divergence

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "text"
    )
    out = source_divergence(docs, n_buckets=_SDIV_BUCKETS)
    return out.select(
        "source", "n_grams", F.col("l1_scaled").cast("long").alias("l1_scaled")
    )


QUERIES["source_divergence"] = q_source_divergence

ORACLES["source_divergence"] = f"""
WITH g AS (
  SELECT source, UNNEST(
    list_transform(range(0, greatest(len(t) - 1 + 1, 0)),
                   i -> array_to_string(t[i+1:i+1], ' '))
    || list_transform(range(0, greatest(len(t) - 2 + 1, 0)),
                      i -> array_to_string(t[i+1:i+2], ' '))
  ) AS gram
  FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
),
b AS (
  SELECT source,
         CAST(concat('0x', substr(md5(gram), 1, 12)) AS BIGINT)
           % {_SDIV_BUCKETS} AS bucket
  FROM g
),
sb AS (SELECT source, bucket, COUNT(*) AS c_sb FROM b GROUP BY 1, 2),
cb AS (SELECT bucket, SUM(c_sb) AS c_b FROM sb GROUP BY 1),
tot AS (SELECT SUM(c_b) AS T FROM cb),
ts AS (SELECT source, SUM(c_sb) AS T_s FROM sb GROUP BY 1),
term AS (
  SELECT sb.source,
         ABS(CAST(c_sb AS HUGEINT) * T - CAST(c_b AS HUGEINT) * T_s)
           - CAST(c_b AS HUGEINT) * T_s AS d,
         T_s, T
  FROM sb JOIN cb USING (bucket) JOIN ts USING (source) CROSS JOIN tot
)
SELECT source, CAST(T_s AS BIGINT) AS n_grams,
       CAST(CAST(T AS HUGEINT) * T_s + SUM(d) AS BIGINT) AS l1_scaled
FROM term GROUP BY source, T_s, T
"""


def q_extract_text_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction over the north_star pages table
    (url, warc_ts, html:binary, text, lang — datagen.web_pages).

    The oracle is the CLOSED FORM of the per-row invariant the
    north_star demands — "byte-identical extracted text per url": the
    hash compare passes iff extract_text inverts the boilerplate
    wrapper byte-for-byte on every row.  The whole query is one
    regexp_replace projection chain in whole-stage codegen (zero
    shuffle, zero Python; plan-audited)."""
    from .datagen import web_pages
    from .functions.webtext import extract_text

    pages = web_pages(spark, sf_dir)
    out = extract_text(pages, html_col="html", out_col="text_extracted")
    return out.select(
        "url",
        "lang",
        "text_extracted",
        F.length("text_extracted").alias("n_chars_extracted"),
        F.octet_length("html").alias("html_bytes"),
    )


QUERIES["extract_text_pages"] = q_extract_text_pages

ORACLES["extract_text_pages"] = """
SELECT 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
         AS url,
       lang,
       text AS text_extracted,
       length(text) AS n_chars_extracted,
       octet_length(encode(replace(replace(replace(text,
         '&', '&amp;'), '<', '&lt;'), '>', '&gt;')))
         + 444 + length(source) + length(CAST(doc_id + 1 AS VARCHAR))
         AS html_bytes
FROM documents
"""


def q_link_graph_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link graph from harvested outlinks: every page links
    to its same-host successor and to the global hub page, so the hub
    host's indegree equals the corpus size (the built-in hot key —
    absorbed by map-side partial counts, never a hot shuffle key).
    extract_links = projection + Generate; degrees = two hash-aggs +
    one host-level join + TakeOrderedAndProject."""
    from .datagen import web_pages
    from .functions.webtext import extract_links, host_degree_stats

    edges = extract_links(web_pages(spark, sf_dir))
    return host_degree_stats(edges, top_n=20)


QUERIES["link_graph_hosts"] = q_link_graph_hosts

ORACLES["link_graph_hosts"] = """
WITH per AS (
  SELECT source || '.example.com' AS host,
         COUNT(DISTINCT doc_id) AS n_pages,
         2 * COUNT(*) AS outdegree,
         COUNT(*) AS indegree
  FROM documents GROUP BY source
),
hub AS (
  SELECT 'hub.example.com' AS host, CAST(0 AS BIGINT) AS n_pages,
         CAST(0 AS BIGINT) AS outdegree, COUNT(*) AS indegree
  FROM documents
),
allh AS (SELECT * FROM per UNION ALL SELECT * FROM hub)
SELECT host, n_pages, outdegree, indegree
FROM allh ORDER BY indegree DESC, host LIMIT 20
"""


_WD_DIST = 3.0


def q_within_distance_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range spatial join (ST_DWithin): every (entity, district) pair
    within 3 degrees of point-to-bbox distance, exact scaled-BIGINT
    distance.  One broadcast equi-join on the distance-dilated cell
    cover + codegen clamp/sqrt refine — zero Python, zero windows; the
    point side emits exactly one join row per point.  Oracle = the full
    cross-join distance filter (exact same IEEE ops in the same
    order)."""
    from .operators.spatial import within_distance

    pairs = within_distance(
        D.points(spark, sf_dir).select("entity_id", "lon", "lat"),
        D.districts(spark),
        distance=_WD_DIST,
        point_id="entity_id",
        target_id="district_id",
        target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
    )
    return pairs.select(
        "entity_id",
        "district_id",
        F.round(F.col("dist") * 1e9).cast("long").alias("dist_e9"),
    )


QUERIES["within_distance_points"] = q_within_distance_points

ORACLES["within_distance_points"] = f"""
WITH pts AS ({{points_cte}}),
d AS ({{districts_cte}}),
cand AS (
  SELECT entity_id, district_id,
         GREATEST(d.x0 - lon, lon - d.x1, 0.0e0) AS ddx,
         GREATEST(d.y0 - lat, lat - d.y1, 0.0e0) AS ddy
  FROM pts CROSS JOIN d
)
SELECT entity_id, district_id,
       CAST(ROUND(sqrt(ddx * ddx + ddy * ddy) * 1e9) AS BIGINT) AS dist_e9
FROM cand
WHERE sqrt(ddx * ddx + ddy * ddy) <= {_WD_DIST}
""".format(points_cte=D.points_oracle_cte(), districts_cte=D.districts_oracle_cte())
