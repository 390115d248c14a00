"""Every oracle's DuckDB result types must be in the portable family set.

The driver's value hash is type-sensitive at the Arrow level: a bare
SUM(BIGINT) in a final projection types as HUGEINT -> decimal128(38,0)
and hash-mismatches a value-identical Spark BIGINT column (this exact
class cost 3 rows in round 1 and 2 rows in round 3). The local replica
now salts its hash with canonical type families; this test closes the
loop by failing fast -- no Spark session needed -- whenever any oracle
leaves a non-portable type in its final projection.
"""
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402
from maup_spark.typecanon import canon_arrow, PORTABLE  # noqa: E402

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", sorted(E.oracle_sql()))
def test_oracle_types_portable(con, name):
    sql = E.oracle_sql()[name]
    # LIMIT 0 wrap: types are data-independent, so skip the actual work
    tbl = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow()
    bad = {f.name: str(f.type) for f in tbl.schema
           if canon_arrow(f.type) not in PORTABLE}
    assert not bad, (
        f"oracle {name!r} yields non-portable DuckDB types {bad}; "
        f"CAST the offending expressions (e.g. CAST(SUM(x) AS BIGINT))")
