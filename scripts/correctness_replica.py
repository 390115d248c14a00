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

# REPLICA_MASTER=local[2] probes order-independence at a second
# parallelism (the historical failure mode: sum order / partition count)
spark = get_spark(
    "drive-entry", master=os.environ.get("REPLICA_MASTER", "local[8]")
)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

Q, O = E.queries(), E.oracle_sql()


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    keys = sorted("|".join(str(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(keys).encode()).hexdigest()


ok = True
for name in names:
    df = Q[name](spark, SF)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    s_schema = sorted((c.lower(), t) for c, t in df.dtypes)
    res = con.execute(O[name])
    o_cols = [d[0] for d in res.description]
    o_types = [str(d[1]) for d in res.description]
    o_rows = res.fetchall()
    rows_match = len(s_rows) == len(o_rows)
    schema = sorted(zip([c.lower() for c in o_cols], o_types))
    h_s = value_hash(s_rows, s_cols)
    h_o = value_hash(o_rows, o_cols)
    print(f"{name}: rows {len(s_rows)}/{len(o_rows)} match={rows_match} "
          f"spark_schema={s_schema} oracle_schema={schema} hash={'MATCH' if h_s == h_o else 'MISMATCH'}")
    if not rows_match or h_s != h_o:
        ok = False
        for a, b in list(zip(sorted(s_rows), sorted(o_rows)))[:5]:
            if str(a) != str(b):
                print("  diff:", a, "vs", b)
print("OVERALL", "PASS" if ok else "FAIL")
