"""The Iceberg branch of io/table.py, exercised via a recording fake.

The sandbox has no Iceberg runtime (no jars, no network to fetch
iceberg-spark-runtime, no pip/apt), so ``createOrReplace``/``append``
cannot hit a real catalog here — documented in SURVEY §6.  These tests
execute every OTHER line of the Iceberg path: catalog detection, the
DataFrameWriterV2 call chain (using/partitionedBy days/createOrReplace
vs append), the catalog-table read dispatch, and the clear-error guards
that replace py4j ClassNotFound stacks.
"""

import pytest
from pyspark.sql import functions as F

from maup_spark.io.table import (configure_iceberg, iceberg_available,
                                 read_table, write_table)


class _FakeWriter:
    def __init__(self, log):
        self.log = log

    def using(self, fmt):
        self.log.append(("using", fmt))
        return self

    def partitionedBy(self, col):
        # F.days(col) is a Column; record its expression string
        self.log.append(("partitionedBy", str(col)))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace",))

    def append(self):
        self.log.append(("append",))


@pytest.fixture()
def events(spark):
    return spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-02 00:00:00")],
        "id bigint, warc_ts string",
    ).selectExpr("id", "CAST(warc_ts AS TIMESTAMP) AS warc_ts")


def test_iceberg_write_chain(events, monkeypatch):
    """write_table drives the DataFrameWriterV2 chain with days()
    hidden partitioning when the catalog reports available."""
    import maup_spark.io.table as T

    log = []
    monkeypatch.setattr(T, "iceberg_available", lambda s: True)
    monkeypatch.setattr(
        type(events), "writeTo", lambda self, t: log.append(("writeTo", t)) or _FakeWriter(log)
    )
    out = write_table(events, "lake.db.pages", partition_col="warc_ts")
    assert out == "lake.db.pages"
    assert log[0] == ("writeTo", "lake.db.pages")
    assert log[1] == ("using", "iceberg")
    assert log[2][0] == "partitionedBy" and "days(warc_ts)" in log[2][1]
    assert log[3] == ("createOrReplace",)

    log.clear()
    write_table(events, "lake.db.pages", mode="append")
    assert log == [("writeTo", "lake.db.pages"), ("using", "iceberg"), ("append",)]


def test_iceberg_read_dispatch(spark, events, monkeypatch):
    """read_table routes lake.* targets through spark.table."""
    import maup_spark.io.table as T

    monkeypatch.setattr(T, "iceberg_available", lambda s: True)
    seen = {}

    def fake_table(name):
        seen["name"] = name
        return events

    monkeypatch.setattr(type(spark), "table", lambda self, n: fake_table(n))
    df = read_table(spark, "lake.db.pages")
    assert seen["name"] == "lake.db.pages" and df.count() == 2


def test_catalog_table_without_catalog_raises(spark, events):
    """No catalog configured: lake.* targets fail with the documented
    clear error, never a buried py4j ClassNotFound."""
    assert not iceberg_available(spark)
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        write_table(events, "lake.db.pages")
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        read_table(spark, "lake.db.pages")


def test_parquet_fallback_roundtrip(spark, events, tmp_path):
    """The fallback writes the same partition layout (__day from the
    partition col) and reads back clean."""
    out = str(tmp_path / "pages")
    assert write_table(events, out, partition_col="warc_ts") == out
    back = read_table(spark, out)
    assert back.count() == 2 and "__day" not in back.columns


def test_configure_iceberg_builder_confs():
    """configure_iceberg applies the full catalog config (the exact
    session confs a real cluster needs alongside --packages)."""
    applied = {}

    class B:
        def config(self, k, v):
            applied[k] = v
            return self

    configure_iceberg(B(), "/warehouse")
    assert applied["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert applied["spark.sql.catalog.lake.type"] == "hadoop"
    assert applied["spark.sql.catalog.lake.warehouse"] == "/warehouse"
    assert "Iceberg" in applied["spark.sql.extensions"]


def test_iceberg_real_roundtrip(spark, events):
    """INTEGRATION (auto-skips without the runtime): when the session
    has a real Iceberg catalog (get_spark probes SPARK_GRAFT_ICEBERG_JARS
    and configures the `lake` hadoop catalog), write_table must create a
    real Iceberg table with days() hidden partitioning and read_table
    must round-trip it.  In an environment with
    iceberg-spark-runtime on the classpath this flips from skip to pass
    with no code change."""
    if not iceberg_available(spark):
        pytest.skip(
            "blocking artifact: iceberg-spark-runtime jar "
            "(org.apache.iceberg:iceberg-spark-runtime-3.5_2.13) is not on "
            "the classpath and no `lake` catalog is configured — set "
            "SPARK_GRAFT_ICEBERG_JARS=/path/to/iceberg-spark-runtime.jar "
            "(get_spark wires the catalog) and this test flips to PASS "
            "with no code change"
        )
    target = "lake.it.pages_roundtrip"
    write_table(events, target, partition_col="warc_ts")
    back = read_table(spark, target)
    assert sorted(r["id"] for r in back.collect()) == [1, 2]
    # snapshot metadata proves it's a real Iceberg table, not parquet
    assert spark.sql(f"SELECT COUNT(*) FROM {target}.snapshots").collect()[0][0] >= 1
    write_table(events, target, partition_col="warc_ts", mode="append")
    assert read_table(spark, target).count() == 4


def test_day_range_partition_pruning(spark, tmp_path):
    """A crawl-day slice must PRUNE partitions on the parquet fallback
    (PartitionFilters on __day, only matching day directories listed),
    not merely push a row-group filter — at 10^12 rows that is the
    difference between reading one day and stat-ing every file."""
    from maup_spark.datagen import web_pages

    pages = web_pages(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "pages")
    write_table(pages, out, partition_col="warc_ts")
    n_days = pages.selectExpr("to_date(warc_ts) AS d").distinct().count()
    assert n_days > 1

    sliced = read_table(spark, out, day_range=("2024-01-01", "2024-01-01"))
    want = pages.filter("to_date(warc_ts) = DATE '2024-01-01'").count()
    assert 0 < want < pages.count()
    assert sliced.count() == want
    assert "__day" not in sliced.columns

    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__day" in m.group(1), plan
    # the scan's file index kept only the matching day directory
    n_parts = (
        sliced.select(F.input_file_name().alias("f")).distinct().count()
    )
    all_parts = (
        read_table(spark, out)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert n_parts < all_parts
