"""Beam Schema <-> Spark StructType mapping (SURVEY.md §1.2).

Beam's schema.proto (reference model/pipeline/.../schema.proto:95-251)
defines atomic types, Array/Iterable/Map/Row composites and logical types
(DECIMAL/DATE/TIMESTAMP/FIXED|VAR_CHAR...). The mapping to Spark is 1:1;
this module provides it for Python type hints / NamedTuples, mirroring
apache_beam.typehints.schemas (schemas.py:17-64: int->INT64, float->DOUBLE,
NamedTuple<->RowType, Sequence<->ArrayType, Mapping<->MapType).

Documented divergences:
* Beam TIMESTAMP logical type carries nanos; Spark TimestampType is micros.
* Beam IterableType (unordered) maps to ArrayType without an order promise.
* FIXED/VAR_CHAR map to StringType (length enforcement is caller-side).
"""

from __future__ import annotations

import datetime
import decimal
import typing

from pyspark.sql import types as T

_ATOMIC = {
    int: T.LongType(),          # Beam INT64 (schemas.py: int -> INT64)
    float: T.DoubleType(),      # Beam DOUBLE
    str: T.StringType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
    datetime.date: T.DateType(),            # Beam DATE logical type
    datetime.datetime: T.TimestampType(),   # Beam MICROS_INSTANT (micros)
    decimal.Decimal: T.DecimalType(38, 18),  # Beam DECIMAL logical type
}


def spark_type(hint) -> T.DataType:
    """Python type hint -> Spark DataType (Beam schema equivalent)."""
    if hint in _ATOMIC:
        return _ATOMIC[hint]
    origin = typing.get_origin(hint)
    args = typing.get_args(hint)
    if origin in (list, tuple, typing.Sequence, typing.Iterable):
        elem = args[0] if args else str
        return T.ArrayType(spark_type(elem))
    if origin in (dict, typing.Mapping):
        k = args[0] if args else str
        v = args[1] if len(args) > 1 else str
        return T.MapType(spark_type(k), spark_type(v))
    if origin is typing.Union:  # Optional[X] -> nullable X
        non_none = [a for a in args if a is not type(None)]
        if len(non_none) == 1:
            return spark_type(non_none[0])
    if hasattr(hint, "_fields"):  # NamedTuple -> RowType (nested StructType)
        return schema_from_namedtuple(hint)
    raise TypeError(f"no Spark mapping for type hint {hint!r}")


def schema_from_namedtuple(nt) -> T.StructType:
    """NamedTuple class -> StructType (Beam RowType inference,
    pvalue.py:646 / trivial_inference in core.py:3749)."""
    hints = typing.get_type_hints(nt)
    fields = []
    for name in nt._fields:
        hint = hints.get(name, str)
        nullable = typing.get_origin(hint) is typing.Union and type(None) in typing.get_args(hint)
        fields.append(T.StructField(name, spark_type(hint), nullable=True if nullable else True))
    return T.StructType(fields)


def schema_from_dict(d: dict) -> T.StructType:
    """{name: python type or DataType} -> StructType."""
    fields = []
    for name, hint in d.items():
        dt = hint if isinstance(hint, T.DataType) else spark_type(hint)
        fields.append(T.StructField(name, dt, nullable=True))
    return T.StructType(fields)
