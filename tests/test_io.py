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


# --------------------------------------------------------------------------
# Avro: pure-python OCF codec (sources/avro.py) — spec known-answers,
# round-trips, Java-implementation interop, distributed Spark path.
# --------------------------------------------------------------------------

def test_avro_binary_known_answers():
    """Byte-exact encodings from the Avro 1.12 spec."""
    import io

    from beam_spark.sources import avro as A

    for n, expect in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                      (-64, b"\x7f"), (64, b"\x80\x01")]:
        b = io.BytesIO()
        A.write_long(b, n)
        assert b.getvalue() == expect, n
        got, _ = A.read_long(memoryview(b.getvalue()), 0)
        assert got == n
    # the spec's record example: {"a": 27, "b": "foo"} -> 36 06 66 6f 6f
    schema = {"type": "record", "name": "test",
              "fields": [{"name": "a", "type": "long"},
                         {"name": "b", "type": "string"}]}
    b = io.BytesIO()
    A.write_datum(b, schema, {"a": 27, "b": "foo"})
    assert b.getvalue().hex() == "3606666f6f"


def test_avro_container_roundtrip_all_types(tmp_path):
    import datetime
    import json

    from beam_spark.sources import avro as A

    sch = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map",
                                   "values": ["null", "long"]}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "score", "type": ["null", "double"]},
        {"name": "blob", "type": "bytes"},
        {"name": "flag", "type": "boolean"},
    ]}
    recs = [
        {"id": 1, "name": "x", "tags": ["a", "b"], "props": {"k": 1, "z": None},
         "ts": datetime.datetime(2024, 1, 1, 12, 30, 15, 123456),
         "d": datetime.date(2024, 2, 29), "score": 1.5,
         "blob": b"\x00\xff", "flag": True},
        {"id": 2, "name": None, "tags": [], "props": {},
         "ts": datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),  # pre-epoch
         "d": datetime.date(1969, 1, 1), "score": None,
         "blob": b"", "flag": False},
    ]
    for codec in ("deflate", "null"):
        p = str(tmp_path / f"t_{codec}.avro")
        assert A.write_container(p, json.dumps(sch), recs, codec=codec) == 2
        _, out = A.read_container(open(p, "rb").read())
        assert out == recs


def test_avro_java_interop_both_directions(spark, tmp_path):
    """Cross-implementation evidence: files written by the pure-python
    codec parse with org.apache.avro (the reference Java implementation,
    on Spark's classpath) and vice versa."""
    import json

    from beam_spark.sources import avro as A

    jvm = spark._jvm
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "score", "type": ["null", "double"]},
    ]}
    recs = [{"id": 1, "name": "x", "tags": ["a", "b"], "score": 1.5},
            {"id": 2, "name": None, "tags": [], "score": None}]

    # python write -> java read
    p = str(tmp_path / "py.avro")
    A.write_container(p, json.dumps(sch), recs, codec="deflate")
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader())
    out = []
    while reader.hasNext():
        rec = reader.next()
        name = rec.get("name")
        out.append((rec.get("id"), None if name is None else str(name),
                    rec.get("score")))
    reader.close()
    assert out == [(1, "x", 1.5), (2, None, None)]

    # java write -> python read
    schema_j = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(sch))
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema_j))
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    p2 = str(tmp_path / "java.avro")
    w.create(schema_j, jvm.java.io.File(p2))
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema_j)
    rec.put("id", 42)
    rec.put("name", "java")
    arr = jvm.java.util.ArrayList()
    arr.add("t1")
    arr.add("t2")
    rec.put("tags", arr)
    rec.put("score", 2.25)
    w.append(rec)
    w.close()
    _, out2 = A.read_container(open(p2, "rb").read())
    assert out2 == [{"id": 42, "name": "java", "tags": ["t1", "t2"],
                     "score": 2.25}]


def test_avro_spark_distributed_roundtrip(spark, sf_dir, tmp_path):
    """WriteToAvroFile (partition-parallel shards) -> ReadFromAvroFile
    (file-parallel binaryFile + mapInPandas decode) on a real table,
    value-equal to the parquet source."""
    from beam_spark.sources.avro import ReadFromAvroFile, WriteToAvroFile

    src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    out_dir = str(tmp_path / "orders_avro")
    shards = (PCollection(src.repartition(4))
              | WriteToAvroFile(out_dir)).df.collect()
    assert sum(r["n_records"] for r in shards) == src.count()
    assert len(shards) == 4

    back = (Pipeline(spark)
            | ReadFromAvroFile(out_dir + "/*.avro")).df
    assert back.schema.simpleString() == \
        "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," \
        "o_totalprice:double,o_orderpriority:string>"
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, src.collect()))
    assert a == b


def test_avro_reader_jar_fallback(spark, tmp_path):
    """ReadFromAvro/WriteToAvro: with no spark-avro jar in this container
    the native DataSource raises and the pure-python OCF path takes over
    transparently."""
    from beam_spark.sources import ReadFromAvro, WriteToAvro

    pc = Pipeline(spark) | Create(ROWS)
    path = str(tmp_path / "fallback")
    pc | WriteToAvro(path)
    back = Pipeline(spark) | ReadFromAvro(path + "/*.avro")
    got = sorted((r["k"], r["v"], r["x"]) for r in back.collect())
    assert got == [("a", 1, 1.5), ("b", 2, 2.5)]


def test_jdbc_real_roundtrip_embedded_derby(spark, tmp_path):
    """REAL executed JDBC path (not just the spec contract): Spark ships
    the embedded Derby engine (used for Hive metastores), so write
    through WriteToJdbc, read back with ReadFromJdbc incl. the
    partitioned parallel read — the same code path a cluster uses
    against server-mode databases."""
    from beam_spark.pcollection import Pipeline
    from beam_spark.operators.core import Create
    from beam_spark.sources.io import ReadFromJdbc, WriteToJdbc

    spark._jvm.java.lang.System.setProperty("derby.system.home",
                                            str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/testdb;create=true"
    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

    rows = [{"id": i, "name": f"n{i}", "val": float(i) / 2} for i in range(100)]
    pc = Pipeline(spark) | Create(rows)
    pc | WriteToJdbc(url, "people", mode="overwrite", driver=drv)

    back = (Pipeline(spark)
            | ReadFromJdbc(url, "people",
                           partition_column="id", lower_bound=0,
                           upper_bound=100, num_partitions=4, driver=drv))
    # partitioned read: 4 bound-ranged queries
    assert back.df.rdd.getNumPartitions() == 4
    got = sorted((r["id"], r["name"], r["val"]) for r in back.collect())
    assert got == [(i, f"n{i}", i / 2) for i in range(100)]


def test_match_files_and_read_matches(spark, tmp_path):
    """fileio analogs: MatchFiles lists metadata with the content column
    pruned out of the scan; ReadMatches yields (path, bytes)."""
    from beam_spark.pcollection import Pipeline
    from beam_spark.sources.io import MatchFiles, ReadMatches

    for name, data in [("a.bin", b"xx"), ("b.bin", b"yyyy")]:
        (tmp_path / name).write_bytes(data)

    meta = (Pipeline(spark) | MatchFiles(str(tmp_path) + "/*.bin")).df
    rows = {(r["path"].rsplit("/", 1)[-1], r["size_bytes"])
            for r in meta.collect()}
    assert rows == {("a.bin", 2), ("b.bin", 4)}
    # content really is pruned from the plan
    assert "content" not in meta.schema.simpleString()

    got = {(r["path"].rsplit("/", 1)[-1], bytes(r["content"]))
           for r in (Pipeline(spark)
                     | ReadMatches(str(tmp_path) + "/*.bin")).collect()}
    assert got == {("a.bin", b"xx"), ("b.bin", b"yyyy")}


def test_avro_schema_evolution(tmp_path):
    """Spec schema-resolution rules: dropped writer fields are skipped,
    added reader fields take defaults, numeric promotions apply, unions
    resolve by branch."""
    import json

    from beam_spark.sources import avro as A

    writer = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "int"},
        {"name": "legacy", "type": "string"},
        {"name": "score", "type": "float"},
        {"name": "maybe", "type": ["null", "int"]},
    ]}
    reader = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},                      # int -> long
        {"name": "score", "type": "double"},                 # float -> double
        {"name": "maybe", "type": ["null", "long"]},         # union promote
        {"name": "added", "type": "string", "default": "d"}, # new w/ default
        # "legacy" dropped -> skipped on read
    ]}
    recs = [{"id": 7, "legacy": "old", "score": 1.5, "maybe": 3},
            {"id": 8, "legacy": "x", "score": 2.0, "maybe": None}]
    p = str(tmp_path / "evo.avro")
    A.write_container(p, json.dumps(writer), recs)
    _, out = A.read_container(open(p, "rb").read(), reader_schema=reader)
    assert out == [
        {"id": 7, "score": 1.5, "maybe": 3, "added": "d"},
        {"id": 8, "score": 2.0, "maybe": None, "added": "d"}]
    assert isinstance(out[0]["id"], int)
    # no-default missing field errors
    bad = {"type": "record", "name": "r", "fields": [
        {"name": "nope", "type": "string"}]}
    import pytest

    with pytest.raises(TypeError, match="no default"):
        A.read_container(open(p, "rb").read(), reader_schema=bad)


def test_avro_spark_read_with_evolved_schema(spark, tmp_path):
    """ReadFromAvroFile(avro_schema=...) resolves older files through the
    reader schema — mixed-schema directories read uniformly."""
    import json

    from beam_spark.pcollection import Pipeline
    from beam_spark.sources import avro as A
    from beam_spark.sources.avro import ReadFromAvroFile

    old = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "int"}, {"name": "v", "type": "float"}]}
    new = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}, {"name": "v", "type": "double"},
        {"name": "tag", "type": "string", "default": "none"}]}
    d = tmp_path / "mixed"
    d.mkdir()
    A.write_container(str(d / "old.avro"), json.dumps(old),
                      [{"id": 1, "v": 0.5}])
    A.write_container(str(d / "new.avro"), json.dumps(new),
                      [{"id": 2, "v": 1.5, "tag": "t"}])
    back = (Pipeline(spark)
            | ReadFromAvroFile(str(d) + "/*.avro",
                               avro_schema=json.dumps(new))).df
    rows = sorted(map(tuple, back.collect()))
    assert rows == [(1, 0.5, "none"), (2, 1.5, "t")]
    assert back.schema["id"].dataType.simpleString() == "bigint"


def test_avro_corruption_detection(tmp_path):
    """Bad magic and sync-marker corruption raise pointed errors instead
    of decoding garbage."""
    import json

    import pytest

    from beam_spark.sources import avro as A

    sch = {"type": "record", "name": "r",
           "fields": [{"name": "x", "type": "long"}]}
    p = str(tmp_path / "c.avro")
    A.write_container(p, json.dumps(sch), [{"x": i} for i in range(10)],
                      codec="null")
    data = bytearray(open(p, "rb").read())

    with pytest.raises(ValueError, match="bad magic"):
        A.read_container(b"NOPE" + bytes(data[4:]))

    # flip a byte inside the trailing sync marker
    bad = bytearray(data)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        A.read_container(bytes(bad))


def test_avro_write_clears_stale_shards(spark, tmp_path):
    """A rewrite with fewer partitions must not leave stale shards that
    a glob read would union in (review finding)."""
    from beam_spark.pcollection import PCollection, Pipeline
    from beam_spark.sources.avro import ReadFromAvroFile, WriteToAvroFile

    out = str(tmp_path / "resh")
    df4 = spark.range(40).selectExpr("id AS x").repartition(4)
    (PCollection(df4) | WriteToAvroFile(out)).df.collect()
    df2 = spark.range(10).selectExpr("id AS x").repartition(2)
    (PCollection(df2) | WriteToAvroFile(out)).df.collect()
    back = (Pipeline(spark) | ReadFromAvroFile(out + "/*.avro")).df
    assert back.count() == 10  # not 10 + leftovers


def test_avro_write_mode_semantics(spark, tmp_path):
    """WriteToAvro fallback honors error/ignore/append modes instead of
    silently overwriting (review finding)."""
    import pytest

    from beam_spark.pcollection import Pipeline
    from beam_spark.operators.core import Create
    from beam_spark.sources import ReadFromAvro, WriteToAvro

    path = str(tmp_path / "modes")
    pc = Pipeline(spark) | Create([{"k": "a", "v": 1}])
    pc | WriteToAvro(path)

    with pytest.raises(FileExistsError):
        pc | WriteToAvro(path, mode="error")

    pc | WriteToAvro(path, mode="ignore")  # no-op, no error
    back = Pipeline(spark) | ReadFromAvro(path + "/*.avro")
    assert back.count() == 1

    pc | WriteToAvro(path, mode="append")
    back = Pipeline(spark) | ReadFromAvro(path + "/*.avro")
    assert back.count() == 2

    with pytest.raises(NotImplementedError):
        pc | WriteToAvro(str(tmp_path / "p2"), partition_by="k")


def test_avro_tz_aware_timestamp_anchor():
    """Aware non-UTC datetimes anchor at the UTC epoch: the epoch
    instant encodes as 0 whatever its zone (review finding)."""
    import datetime
    import io

    from beam_spark.sources import avro as A

    sch = {"type": "long", "logicalType": "timestamp-micros"}
    tz5 = datetime.timezone(datetime.timedelta(hours=5))
    b = io.BytesIO()
    A.write_datum(b, sch, datetime.datetime(1970, 1, 1, 5, 0, tzinfo=tz5))
    got, _ = A.read_long(memoryview(b.getvalue()), 0)
    assert got == 0


def test_avro_timestamps_are_utc_instants_in_non_utc_session(spark, tmp_path):
    """Avro timestamp-micros stores UTC instants. Written from a session
    with a non-UTC timezone (Arrow hands the writer LOCAL wall times),
    the on-disk micros must still be the UTC instant, and reading back
    in that session must return the same instant."""
    from beam_spark.sources.avro import (ReadFromAvroFile, WriteToAvroFile,
                                         read_container)

    us = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z
    ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    df = ny.range(1).selectExpr(
        "id", f"timestamp_micros({us}) AS ts")
    out_dir = str(tmp_path / "tz_avro")
    (PCollection(df) | WriteToAvroFile(out_dir)).df.collect()

    import glob

    shard = glob.glob(out_dir + "/part-*.avro")[0]
    with open(shard, "rb") as f:
        _, records = read_container(f.read())
    got = records[0]["ts"]
    stored_us = int((got - type(got)(1970, 1, 1)).total_seconds()) * 10**6 \
        + got.microsecond
    assert stored_us == us  # raw file micros are the UTC instant

    class _P:  # minimal Pipeline shim carrying the NY session
        spark = ny

    back = (ReadFromAvroFile(out_dir + "/*.avro").expand(_P())).df
    assert back.selectExpr("unix_micros(ts) AS us").first()["us"] == us


def test_avro_snappy_codec_roundtrip_or_clean_error(tmp_path):
    """snappy codec: spec framing (block + CRC32 of uncompressed data)
    round-trips when python-snappy is present; otherwise requesting it
    raises a clear ValueError naming the missing package."""
    import pytest

    from beam_spark.sources import avro as A

    schema = '{"type":"record","name":"r","fields":[{"name":"x","type":"long"}]}'
    recs = [{"x": i} for i in range(100)]
    p = str(tmp_path / "t_snappy.avro")
    try:
        import snappy  # noqa: F401
        have = True
    except ImportError:
        have = False
    if not have:
        with pytest.raises(ValueError, match="python-snappy"):
            A.write_container(p, schema, recs, codec="snappy")
        return
    A.write_container(p, schema, recs, codec="snappy")
    with open(p, "rb") as f:
        _, back = A.read_container(f.read())
    assert back == recs


def test_overwrite_partitions_dynamic(spark, tmp_path):
    """Rewriting one hive partition leaves sibling partitions intact
    (the idempotent backfill pattern), and the repartition-first write
    plan produces one file per rewritten partition, not one per task."""
    import glob
    from beam_spark.pcollection import PCollection
    from beam_spark.sources.io import OverwritePartitionsDynamic

    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [("2024-01-01", i, "old") for i in range(50)]
        + [("2024-01-02", i, "keep") for i in range(50)],
        "day string, id long, v string")
    (base.write.mode("overwrite").partitionBy("day").parquet(path))

    redo = spark.createDataFrame(
        [("2024-01-01", i, "new") for i in range(10)],
        "day string, id long, v string")
    PCollection(redo) | OverwritePartitionsDynamic(path, "day")

    got = spark.read.parquet(path)
    day1 = got.filter("day = '2024-01-01'").collect()
    day2 = got.filter("day = '2024-01-02'").collect()
    assert len(day1) == 10 and all(r["v"] == "new" for r in day1)
    assert len(day2) == 50 and all(r["v"] == "keep" for r in day2)
    files = glob.glob(f"{path}/day=2024-01-01/*.parquet")
    assert len(files) <= 2, files


def test_compact_parquet_small_files(spark, tmp_path):
    """A 20-file dataset compacts to the byte-target file count with
    rows preserved."""
    import glob
    from beam_spark.pcollection import Pipeline
    from beam_spark.sources.io import CompactParquet

    src = str(tmp_path / "fragmented")
    spark.range(2000).selectExpr("id", "id * 2 AS v") \
        .repartition(20).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 20

    out = (Pipeline(spark) | CompactParquet(src, target_file_mb=128)).df
    assert out.rdd.getNumPartitions() == 1  # tiny input -> one file
    assert out.count() == 2000
    dst = str(tmp_path / "compacted")
    out.write.mode("overwrite").parquet(dst)
    assert len(glob.glob(f"{dst}/*.parquet")) == 1


def test_compact_parquet_partition_filter_sizes_from_partition(
        spark, tmp_path):
    """With partition_filter, the target file count comes from the
    FILTERED partition's bytes, not the whole dataset: a dataset big
    enough for many target files still compacts one small partition
    into a single partition-sized output."""
    import glob

    from beam_spark.pcollection import Pipeline
    from beam_spark.sources.io import CompactParquet

    src = str(tmp_path / "hive")
    # partition p=0 is large (incompressible pad), p=1 tiny
    pad = "concat(%s) AS pad" % ", ".join(
        f"sha2(CAST(id AS STRING) || '{i}', 512)" for i in range(8))
    spark.range(20_000).selectExpr(
        "id", "CAST(id >= 19000 AS INT) AS p", pad) \
        .repartition(8).write.mode("overwrite") \
        .partitionBy("p").parquet(src)

    # a ~1 MB target over the FULL dataset would want many files;
    # the filtered tiny partition must still land in ONE
    out = (Pipeline(spark)
           | CompactParquet(src, target_file_mb=1,
                            partition_filter="p = 1")).df
    assert out.count() == 1000
    assert out.rdd.getNumPartitions() <= 2   # ~1 MB of data, 1 MB target
    # and the unfiltered path still sizes from everything
    full = (Pipeline(spark) | CompactParquet(src, target_file_mb=1)).df
    assert full.rdd.getNumPartitions() >= 10
