"""Schema-mapping tests (SURVEY §1.2: Beam schema <-> StructType 1:1)."""

import datetime
import decimal
import typing

from pyspark.sql import types as T

from beam_spark.types import schema_from_dict, schema_from_namedtuple, spark_type


def test_atomic_mapping():
    assert spark_type(int) == T.LongType()          # Beam INT64
    assert spark_type(float) == T.DoubleType()      # Beam DOUBLE
    assert spark_type(str) == T.StringType()
    assert spark_type(bool) == T.BooleanType()
    assert spark_type(bytes) == T.BinaryType()
    assert spark_type(datetime.date) == T.DateType()
    assert spark_type(datetime.datetime) == T.TimestampType()
    assert isinstance(spark_type(decimal.Decimal), T.DecimalType)


def test_composite_mapping():
    assert spark_type(list[int]) == T.ArrayType(T.LongType())
    assert spark_type(dict[str, float]) == T.MapType(T.StringType(), T.DoubleType())
    assert spark_type(typing.Optional[str]) == T.StringType()


def test_namedtuple_row_type():
    class Order(typing.NamedTuple):
        id: int
        amount: float
        tags: list[str]

    st = schema_from_namedtuple(Order)
    assert st == T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("tags", T.ArrayType(T.StringType()))])


def test_nested_namedtuple():
    class Inner(typing.NamedTuple):
        a: int

    class Outer(typing.NamedTuple):
        inner: Inner
        name: str

    st = schema_from_namedtuple(Outer)
    assert isinstance(st["inner"].dataType, T.StructType)


def test_schema_from_dict_mixed():
    st = schema_from_dict({"a": int, "b": T.DecimalType(10, 2)})
    assert st["a"].dataType == T.LongType()
    assert st["b"].dataType == T.DecimalType(10, 2)


def test_roundtrip_through_spark(spark):
    class Ev(typing.NamedTuple):
        id: int
        score: float

    st = schema_from_namedtuple(Ev)
    df = spark.createDataFrame([(1, 0.5), (2, 1.5)], st)
    assert df.schema == st
    assert df.count() == 2
