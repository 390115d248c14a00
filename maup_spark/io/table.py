"""Table-format abstraction: Iceberg in production, parquet fallback.

north_rule input is an ICEBERG table of Common-Crawl-style pages.  The
engine reads/writes through this module so the table format is a config
switch, not an engine change:

- when an Iceberg catalog is configured (``iceberg_available``), writes
  go through the DataFrameWriterV2 ``writeTo(...).using("iceberg")``
  path with ``days(warc_ts)`` partitioning and reads through
  ``spark.table`` — snapshot isolation, hidden partitioning, schema
  evolution all come from the format;
- this sandbox has no Iceberg runtime (no jars, no catalog), so the
  fallback writes identically-laid-out parquet (same partition column)
  and reads it back with the same API.  Every operator upstream sees a
  DataFrame either way.

``configure_iceberg`` documents the exact session config a cluster
needs; attempting the Iceberg path without it raises a clear error
instead of a java ClassNotFound buried in py4j.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_CONFS = {
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    ),
    "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.lake.type": "hadoop",
    # spark.sql.catalog.lake.warehouse = <warehouse path>  (per cluster)
}


def configure_iceberg(builder, warehouse: str):
    """Apply the Iceberg catalog config to a SparkSession.Builder (the
    jars ship via ``spark-submit --packages org.apache.iceberg:
    iceberg-spark-runtime-4.0_2.13:<ver>`` on the cluster)."""
    for k, v in _ICEBERG_CONFS.items():
        builder = builder.config(k, v)
    return builder.config("spark.sql.catalog.lake.warehouse", warehouse)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable in this session."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    return (
        spark.conf.get("spark.sql.catalog.lake", None) is not None
    )


def write_table(
    df: DataFrame,
    target: str,
    partition_col: str | None = None,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` as an Iceberg table (``lake.db.name`` target) when
    the catalog is configured, else as parquet at ``target`` (treated as
    a path) with the same partitioning.  Returns the target actually
    written."""
    spark = df.sparkSession
    if iceberg_available(spark):
        writer = df.writeTo(target).using("iceberg")
        if partition_col is not None:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(F.days(partition_col))
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return target
    if target.startswith("lake."):
        raise RuntimeError(
            f"write_table: target {target!r} names an Iceberg catalog table "
            "but no Iceberg catalog is configured in this session "
            "(configure_iceberg + --packages iceberg-spark-runtime); "
            "pass a filesystem path for the parquet fallback"
        )
    w = df.write.mode(mode)
    if partition_col is not None:
        from pyspark.sql import functions as F

        df2 = df.withColumn("__day", F.to_date(partition_col))
        w = df2.write.mode(mode).partitionBy("__day")
    w.parquet(target)
    return target


def read_table(
    spark: SparkSession,
    target: str,
    day_range: tuple[str, str] | None = None,
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Read an Iceberg catalog table or the parquet fallback path.

    ``day_range=("2024-01-01", "2024-01-07")`` restricts the read to a
    crawl-day slice WITH PARTITION PRUNING on both paths: Iceberg's
    hidden ``days(ts_col)`` partitioning prunes from the timestamp
    predicate itself; the parquet fallback applies the predicate to the
    physical ``__day`` partition column *before* it is dropped, so the
    scan lists only the matching day directories (PartitionFilters in
    the plan).  Filtering ``ts_col`` after a plain read skips row
    groups but still lists every partition — at 10^12 rows that is the
    difference between touching one day and touching every file's
    footer."""
    from pyspark.sql import functions as F

    if target.startswith("lake."):
        if not iceberg_available(spark):
            raise RuntimeError(
                f"read_table: {target!r} is an Iceberg catalog table but no "
                "Iceberg catalog is configured in this session"
            )
        df = spark.table(target)
        if day_range is not None:
            # raw timestamp range, not to_date(ts): a function-wrapped
            # predicate is not convertible to a DSv2 pushdown filter, so
            # the days(ts) hidden partitioning would not prune and the
            # scan would list every partition — the failure mode this
            # parameter exists to avoid.  [day0, day1 + 1 day) over the
            # bare column selects exactly the same rows and Iceberg
            # prunes it through the days() transform.
            day0 = F.to_timestamp(F.lit(day_range[0]))
            day1 = F.to_timestamp(
                F.date_add(F.to_date(F.lit(day_range[1])), 1)
            )
            df = df.filter(
                (F.col(ts_col) >= day0) & (F.col(ts_col) < day1)
            )
        return df
    df = spark.read.parquet(target)
    if "__day" in df.columns:
        if day_range is not None:
            df = df.filter(F.col("__day").between(day_range[0], day_range[1]))
        return df.drop("__day")
    if day_range is not None:
        df = df.filter(F.to_date(ts_col).between(day_range[0], day_range[1]))
    return df
