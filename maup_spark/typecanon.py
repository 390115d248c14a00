"""Canonical cross-engine type families for the correctness gate.

The driver hashes query results type-sensitively at the Arrow level, so
a DuckDB HUGEINT (decimal128(38,0)) column hash-mismatches a
value-identical Spark BIGINT one. Both the local replica
(scripts/correctness_replica.py) and the oracle-type regression test
(tests/test_oracle_types.py) map engine types into these families;
anything outside PORTABLE is a red flag in an oracle's final projection.

Families deliberately merge integer widths and float widths: the driver
demonstrably passes queries where Spark emits int32 against DuckDB
int64, so width-level strictness would be a false local alarm.
"""

PORTABLE = {"int", "float", "str", "bool", "timestamp", "date", "binary"}


def canon_spark(dtype: str) -> str:
    """Spark simpleString dtype -> canonical family."""
    d = dtype.lower()
    if d in ("bigint", "int", "smallint", "tinyint"):
        return "int"
    if d in ("double", "float"):
        return "float"
    if d == "string":
        return "str"
    if d == "boolean":
        return "bool"
    if d.startswith("timestamp"):
        return "timestamp"
    if d == "date":
        return "date"
    if d == "binary":
        return "binary"
    return d  # decimal(p,s), array<...>, ... stay distinct


def canon_arrow(t) -> str:
    """pyarrow DataType -> canonical family."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)  # decimal128(38,0) etc. stay distinct
