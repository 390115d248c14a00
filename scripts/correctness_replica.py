"""Driver-replica correctness gate: load __spark_entry__ the way the
driver does, run each query vs its DuckDB oracle at sf0.01, compare
rows + schema + order-insensitive value hash (columns sorted by name,
values stringified).

Usage: python scripts/correctness_replica.py [query ...]
(no args = the five round-2 focus queries; pass names for any subset;
MUST run from the repo root so Spark workers can import maup_spark)."""
import hashlib
import os
import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

import duckdb  # noqa: E402
from maup_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

names = sys.argv[1:] or [
    "prorate_nchars", "events_windowed", "orders_rollup",
    "smart_repair_nations", "resolve_overlaps_nations",
]
if names == ["ALL"]:
    names = None  # resolved to every registered query below

# REPLICA_MASTER=local[2] probes order-independence at a second
# parallelism (the historical failure mode: sum order / partition count)
spark = get_spark(
    "drive-entry", master=os.environ.get("REPLICA_MASTER", "local[8]")
)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

Q, O = E.queries(), E.oracle_sql()

# The driver's hash is TYPE-SENSITIVE (round-1/round-3 lesson: DuckDB
# HUGEINT/DECIMAL aggregates hash differently from Spark BIGINT even when
# value-identical). Canonicalize each side's Arrow-level type into a
# family and salt the hash with the (col, family) header, so an oracle
# that leaves a bare SUM() (HUGEINT -> decimal128) fails HERE, not only
# under the driver. Families live in maup_spark.typecanon (shared with
# tests/test_oracle_types.py).
from maup_spark.typecanon import PORTABLE, canon_arrow, canon_spark  # noqa: E402


def value_hash(rows, cols, fams):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    header = "|".join(f"{cols[i]}:{fams[i]}" for i in order)
    keys = sorted("|".join(str(r[i]) for i in order) for r in rows)
    return hashlib.md5((header + "\n" + "\n".join(keys)).encode()).hexdigest()


if names is None:
    names = sorted(Q)

ok = True
for name in names:
    if name not in O:
        # driver records a weaker rows-only check for non-SQL-expressible
        # queries; the replica mirrors that
        n = Q[name](spark, SF).count()
        print(f"{name}: rows {n} (no oracle — rows-only check)")
        continue
    df = Q[name](spark, SF)
    s_cols = [c.lower() for c in df.columns]
    s_fams = [canon_spark(t) for _, t in df.dtypes]
    s_rows = [tuple(r) for r in df.collect()]
    s_schema = sorted((c.lower(), t) for c, t in df.dtypes)
    tbl = con.execute(O[name]).arrow()
    o_cols = [c.lower() for c in tbl.schema.names]
    o_fams = [canon_arrow(f.type) for f in tbl.schema]
    o_rows = list(zip(*(col.to_pylist() for col in tbl.columns))) if tbl.num_columns else []
    rows_match = len(s_rows) == len(o_rows)
    schema = sorted(zip(o_cols, [str(f.type) for f in tbl.schema]))
    bad = sorted(set(f for f in o_fams + s_fams if f not in PORTABLE))
    h_s = value_hash(s_rows, s_cols, s_fams)
    h_o = value_hash(o_rows, o_cols, o_fams)
    print(f"{name}: rows {len(s_rows)}/{len(o_rows)} match={rows_match} "
          f"spark_schema={s_schema} oracle_schema={schema} "
          f"hash={'MATCH' if h_s == h_o else 'MISMATCH'}"
          + (f" TYPEFAIL(non-portable: {bad})" if bad else ""))
    if not rows_match or h_s != h_o or bad:
        ok = False
        for a, b in list(zip(sorted(s_rows, key=str), sorted(o_rows, key=str)))[:5]:
            if str(a) != str(b):
                print("  diff:", a, "vs", b)
print("OVERALL", "PASS" if ok else "FAIL")
