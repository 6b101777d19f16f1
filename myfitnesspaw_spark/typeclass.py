"""Coarse cross-engine type classes for schema-parity checks.

The driver hashes query results THROUGH Arrow, so a DuckDB oracle
whose SUM silently degrades to float64 under Arrow export (HUGEINT —
the driver-hash hazard a ``fetchall`` comparison cannot see,
verify-skill r4 note) must fail locally as int-vs-float rather than
only in the driver run.  Both ``tests/conftest.py`` and
``scripts/driver_sim.py`` import from here (ADVICE r13: the runtime
simulator must not depend on the test suite being importable).
"""
from __future__ import annotations


def type_class(t) -> str:
    """Map a Spark DataType OR a pyarrow DataType onto one coarse
    vocabulary (int/float/decimal/bool/str/date/timestamp/binary/
    list/nested/null) so schemas from the two engines compare."""
    import pyarrow as pa
    from pyspark.sql import types as T

    if isinstance(t, T.DataType):
        return {
            T.ByteType: "int", T.ShortType: "int", T.IntegerType: "int",
            T.LongType: "int", T.FloatType: "float", T.DoubleType: "float",
            T.DecimalType: "decimal", T.BooleanType: "bool",
            T.StringType: "str", T.VarcharType: "str", T.CharType: "str",
            T.DateType: "date", T.TimestampType: "timestamp",
            T.TimestampNTZType: "timestamp", T.BinaryType: "binary",
            T.ArrayType: "list", T.MapType: "nested", T.StructType: "nested",
            T.NullType: "null",
        }.get(type(t), f"other:{type(t).__name__}")
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return "nested"
    if pa.types.is_null(t):
        return "null"
    return f"other:{t}"
