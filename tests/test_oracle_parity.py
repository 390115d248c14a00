"""Local replica of the driver's correctness gate: every queries() entry
vs its DuckDB oracle at small scale — row count, schema-ish, and exact
sorted-row equality."""

import math

import duckdb
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v


def _key(row):
    return tuple(str(_norm(v)) for v in row)


def all_query_names():
    from maup_spark.queries import QUERIES

    return sorted(QUERIES)


def _compare(spark, sf_dir, ddb, name):
    from maup_spark.queries import ORACLES, QUERIES

    df = QUERIES[name](spark, sf_dir)
    cols = sorted(df.columns)
    spark_rows = sorted(_key([r[c] for c in cols]) for r in df.collect())

    if name not in ORACLES:
        pytest.skip(f"{name} has no oracle (rows-only check)")
    res = ddb.execute(ORACLES[name])
    ora_cols = [d[0] for d in res.description]
    assert sorted(c.lower() for c in ora_cols) == sorted(c.lower() for c in cols)
    order = [ora_cols.index(c) for c in sorted(ora_cols, key=str.lower)]
    ora_rows = sorted(_key([row[i] for i in order]) for row in res.fetchall())

    assert len(spark_rows) == len(ora_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(ora_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(spark_rows, ora_rows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    if name == "bpe_trained":
        # its oracle replays the merge table pinned to the DRIVER's
        # gate scale (sf0.01, scripts/derive_bpe_pin.py); training on
        # another SF's 100-doc slice learns different merges by design
        pytest.skip("bpe_trained oracle is pinned to sf0.01 — see dedicated test")
    _compare(spark, sf_dir, ddb, name)


def test_bpe_trained_matches_oracle_at_driver_scale(spark):
    """bpe_trained parity at the scale the driver actually gates."""
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("sf0.01 testdata not present")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    _compare(spark, sf, con, "bpe_trained")
