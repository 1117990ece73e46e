"""Source/sink round-trips (SURVEY §2.8): built-in formats write->read
equality, partitioned (dynamic-destination) layout, schema'd reads."""

from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, Pipeline
from beam_spark.operators.core import Create
from beam_spark.sources import (ReadFromCsv, ReadFromJson, ReadFromOrc,
                                ReadFromParquet, ReadFromText, WriteToCsv,
                                WriteToJson, WriteToParquet, WriteToText)
from beam_spark.sources.io import ReadFromOrc as _Orc


ROWS = [{"k": "a", "v": 1, "x": 1.5}, {"k": "b", "v": 2, "x": 2.5}]


def _rt(spark, tmp_path, writer, reader, **read_kw):
    path = str(tmp_path / "data")
    pc = Pipeline(spark) | Create(ROWS)
    pc | writer(path)
    back = Pipeline(spark) | reader(path, **read_kw)
    got = sorted((r["k"], r["v"], r["x"]) for r in back.collect())
    assert got == [("a", 1, 1.5), ("b", 2, 2.5)]


def test_parquet_roundtrip(spark, tmp_path):
    _rt(spark, tmp_path, WriteToParquet, ReadFromParquet)


def test_csv_roundtrip(spark, tmp_path):
    _rt(spark, tmp_path, WriteToCsv, ReadFromCsv,
        schema="k string, v long, x double")


def test_json_roundtrip(spark, tmp_path):
    _rt(spark, tmp_path, WriteToJson, ReadFromJson,
        schema="k string, v long, x double")


def test_orc_roundtrip(spark, tmp_path):
    from beam_spark.sources.io import _Write

    class WriteToOrc(_Write):
        fmt = "orc"

    _rt(spark, tmp_path, WriteToOrc, ReadFromOrc)


def test_text_roundtrip(spark, tmp_path):
    path = str(tmp_path / "txt")
    pc = (Pipeline(spark) | Create([{"value": "hello"}, {"value": "world"}]))
    pc | WriteToText(path)
    back = Pipeline(spark) | ReadFromText(path)
    assert sorted(r["value"] for r in back.collect()) == ["hello", "world"]


def test_partitioned_write_dynamic_destinations(spark, tmp_path):
    """Beam WriteToFiles dynamic destinations -> hive-partitioned layout;
    partition pruning then skips other destinations at read time."""
    import os

    path = str(tmp_path / "part")
    pc = Pipeline(spark) | Create(ROWS)
    pc | WriteToParquet(path, partition_by="k")
    assert sorted(d for d in os.listdir(path) if d.startswith("k=")) == ["k=a", "k=b"]
    back = spark.read.parquet(path).filter("k = 'a'")
    assert back.count() == 1


def test_tfrecord_roundtrip_spark(spark, tmp_path):
    """TFRecord write -> read round-trip through Spark (crc-validated);
    crc32c known-answer is asserted in the module test below."""
    from pyspark.sql import functions as F
    from beam_spark.pcollection import Pipeline, PCollection
    from beam_spark.sources.tfrecord import ReadFromTFRecord, WriteToTFRecord

    df = spark.range(100).select(
        F.encode(F.concat(F.lit("rec-"), F.col("id").cast("string")), "utf-8")
        .alias("record"))
    out = PCollection(df.repartition(4)) | WriteToTFRecord(str(tmp_path / "trs"))
    shards = out.df.collect()
    assert sum(r["n_records"] for r in shards) == 100
    back = (Pipeline(spark)
            | ReadFromTFRecord(str(tmp_path / "trs") + "/*.tfrecord"))
    got = sorted(bytes(r["record"]).decode() for r in back.df.collect())
    assert got == sorted(f"rec-{i}" for i in range(100))


def test_tfrecord_crc_known_answer_and_corruption(tmp_path):
    from beam_spark.sources import tfrecord as t

    assert t._crc32c(b"123456789") == 0xE3069283  # public CRC-32C KAT
    p = str(tmp_path / "x.tfrecord")
    t.write_records(p, [b"abc", b"defg"])
    data = bytearray(open(p, "rb").read())
    data[13] ^= 0xFF  # flip a payload byte
    import pytest

    with pytest.raises(ValueError, match="crc mismatch"):
        list(t.parse_records(bytes(data)))


def test_kafka_reader_contract_without_jar(spark):
    """No spark-sql-kafka jar ships in this container: the reader must
    assemble the full plan (format, servers, subscription, offsets) and
    fail ONLY at the missing data-source lookup — proving the code path
    up to the jar boundary. With the jar on a cluster the same call
    streams; COVERAGE.md records this as interface+contract-test."""
    import pytest
    from pyspark.errors.exceptions.base import AnalysisException
    from beam_spark.pcollection import Pipeline
    from beam_spark.sources.io import ReadFromKafka

    with pytest.raises(Exception) as ei:
        (Pipeline(spark) | ReadFromKafka("localhost:9092", "events",
                                         starting_offsets="earliest")).df
    msg = str(ei.value)
    assert "kafka" in msg.lower()  # failed at format lookup, not before


def test_jdbc_reader_contract_without_driver(spark):
    """Same boundary contract for JDBC: the reader builds the partitioned
    read spec and fails at java.sql driver resolution."""
    import pytest
    from beam_spark.pcollection import Pipeline
    from beam_spark.sources.io import ReadFromJdbc

    with pytest.raises(Exception) as ei:
        (Pipeline(spark) | ReadFromJdbc(
            "jdbc:postgresql://localhost/db", "events",
            partition_column="event_id", lower_bound=0, upper_bound=100,
            num_partitions=4)).df
    assert "driver" in str(ei.value).lower() or "jdbc" in str(ei.value).lower()


def test_tfrecord_read_without_validation(spark, tmp_path):
    """validate=False skips crc checks (reads tolerant of foreign
    writers with nonstandard masks)."""
    from beam_spark.pcollection import Pipeline
    from beam_spark.sources import tfrecord as t

    p = str(tmp_path / "nv")
    import os
    os.makedirs(p)
    t.write_records(os.path.join(p, "a.tfrecord"), [b"x", b"yz"])
    data = bytearray(open(os.path.join(p, "a.tfrecord"), "rb").read())
    data[8] ^= 0xFF  # corrupt the length crc
    open(os.path.join(p, "a.tfrecord"), "wb").write(bytes(data))

    back = (Pipeline(spark)
            | t.ReadFromTFRecord(p + "/*.tfrecord", validate=False))
    got = sorted(bytes(r["record"]) for r in back.df.collect())
    assert got == [b"x", b"yz"]
