"""Avro Object Container File I/O — pure-python codec (SURVEY.md §2.8).

Beam reference: io/avroio.py:75 ReadFromAvro / :361 WriteToAvro (which
delegate to fastavro). This container ships neither fastavro nor the
spark-avro DataSource jar, so the wire format is implemented here
directly from the PUBLIC Avro 1.12 specification
(https://avro.apache.org/docs/1.12.0/specification/): zigzag-varint
primitives, record/array/map/union composites, the OCF framing (magic
``Obj\\x01``, metadata map with ``avro.schema``/``avro.codec``, 16-byte
sync marker, blocks of ``count, size, payload, sync``) and the null +
deflate (raw zlib) codecs.

Interop is tested BOTH directions against the reference Java
implementation (the avro-1.12.1 jar on Spark's classpath) in
tests/test_io.py — python-written files read by
org.apache.avro.file.DataFileReader and vice versa.

Spark design:

* Read: ``binaryFile`` source distributes FILES across executors (Avro
  datasets at 100 TB are many-file by construction; Beam's sync-marker
  block splitting is the finer-grained alternative, documented
  divergence), then an Arrow-batched ``mapInPandas`` decodes blocks.
  Schema comes from the first file's header (one tiny driver job) or an
  explicit ``avro_schema``.
* Write: partition-parallel sink — each partition serializes to one
  ``part-NNNNN.avro`` container (WriteFiles-style sharding).
* On a cluster with the spark-avro jar, ``sources.io.ReadFromAvro``
  uses the native JVM DataSource instead; this codec is the
  jar-independent fallback and the spec ground truth.

Supported Spark types: all primitives (null/boolean/int/long/float/
double/string/binary), timestamp (micros logical type), date, struct,
array, map(string->V), and nullable-as-union. Enum and fixed decode
(to string / binary) for foreign files.
"""

from __future__ import annotations

import io as _io
import json
import os
import struct
import zlib
from typing import Iterator

from pyspark.sql import types as T

from beam_spark.pcollection import PCollection, PTransform

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

# --------------------------------------------------------------------------
# Binary primitives (spec: "Primitive Types" binary encoding)
# --------------------------------------------------------------------------


def write_long(out: _io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos  # un-zigzag


def write_bytes(out: _io.BytesIO, b: bytes) -> None:
    write_long(out, len(b))
    out.write(b)


def read_bytes(buf: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = read_long(buf, pos)
    return bytes(buf[pos:pos + n]), pos + n


# --------------------------------------------------------------------------
# Schema conversion Spark <-> Avro (spec: "Schema Declaration")
# --------------------------------------------------------------------------

_PRIM_TO_AVRO = {
    T.BooleanType: "boolean", T.IntegerType: "int", T.ShortType: "int",
    T.ByteType: "int", T.LongType: "long", T.FloatType: "float",
    T.DoubleType: "double", T.StringType: "string", T.BinaryType: "bytes",
    T.NullType: "null",
}


def spark_to_avro(dt: T.DataType, name: str = "record",
                  nullable: bool = False):
    for cls, avro in _PRIM_TO_AVRO.items():
        if isinstance(dt, cls):
            return _nullable(avro, nullable)
    if isinstance(dt, T.TimestampType) or isinstance(dt, T.TimestampNTZType):
        return _nullable({"type": "long", "logicalType": "timestamp-micros"},
                         nullable)
    if isinstance(dt, T.DateType):
        return _nullable({"type": "int", "logicalType": "date"}, nullable)
    if isinstance(dt, T.ArrayType):
        return _nullable({"type": "array",
                          "items": spark_to_avro(dt.elementType, name,
                                                 dt.containsNull)}, nullable)
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise TypeError("Avro maps require string keys")
        return _nullable({"type": "map",
                          "values": spark_to_avro(dt.valueType, name,
                                                  dt.valueContainsNull)},
                         nullable)
    if isinstance(dt, T.StructType):
        return _nullable({
            "type": "record", "name": name,
            "fields": [{"name": f.name,
                        "type": spark_to_avro(f.dataType, f"{name}_{f.name}",
                                              f.nullable)}
                       for f in dt.fields]}, nullable)
    raise TypeError(f"unsupported Spark type for Avro: {dt}")


def _nullable(avro_type, nullable: bool):
    return ["null", avro_type] if nullable else avro_type


def avro_to_spark(schema) -> T.DataType:
    if isinstance(schema, str):
        prim = {"null": T.NullType(), "boolean": T.BooleanType(),
                "int": T.IntegerType(), "long": T.LongType(),
                "float": T.FloatType(), "double": T.DoubleType(),
                "bytes": T.BinaryType(), "string": T.StringType()}
        return prim[schema]
    if isinstance(schema, list):  # union
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise TypeError(f"only unions with null supported: {schema}")
        return avro_to_spark(non_null[0])
    t = schema["type"]
    logical = schema.get("logicalType")
    if logical == "timestamp-micros":
        return T.TimestampType()
    if logical == "timestamp-millis":
        return T.TimestampType()
    if logical == "date":
        return T.DateType()
    if t == "record":
        return T.StructType([
            T.StructField(f["name"], avro_to_spark(f["type"]),
                          nullable=_is_nullable(f["type"]))
            for f in schema["fields"]])
    if t == "array":
        return T.ArrayType(avro_to_spark(schema["items"]),
                           containsNull=_is_nullable(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark(schema["values"]),
                         valueContainsNull=_is_nullable(schema["values"]))
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    return avro_to_spark(t)  # {"type": "long", ...} primitive wrapper


def _is_nullable(schema) -> bool:
    return isinstance(schema, list) and "null" in schema


# --------------------------------------------------------------------------
# Datum encode / decode driven by the (parsed-JSON) Avro schema
# --------------------------------------------------------------------------


def write_datum(out: _io.BytesIO, schema, v) -> None:
    if isinstance(schema, list):  # union — index, then value
        if v is None:
            write_long(out, schema.index("null"))
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        write_long(out, idx)
        write_datum(out, schema[idx], v)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        logical = schema.get("logicalType")
        if logical in ("timestamp-micros", "timestamp-millis"):
            import datetime

            if isinstance(v, datetime.datetime):
                # exact integer math from timedelta parts (total_seconds
                # would round through a float); aware values anchor at
                # the UTC epoch — anchoring at the value's own tz would
                # shift every timestamp by its UTC offset
                epoch = (datetime.datetime(1970, 1, 1,
                                           tzinfo=datetime.timezone.utc)
                         if v.tzinfo is not None
                         else datetime.datetime(1970, 1, 1))
                td = v - epoch
                us = (td.days * 86_400 + td.seconds) * 1_000_000 \
                    + td.microseconds
            else:
                us = int(v)
            if logical == "timestamp-millis":
                us //= 1000
            write_long(out, us)
            return
        if logical == "date":
            import datetime

            days = (v - datetime.date(1970, 1, 1)).days \
                if isinstance(v, datetime.date) else int(v)
            write_long(out, days)
            return
        if t == "record":
            for f in schema["fields"]:
                write_datum(out, f["type"], v.get(f["name"])
                            if isinstance(v, dict) else v[f["name"]])
            return
        if t == "array":
            items = list(v)
            if items:
                write_long(out, len(items))
                for it in items:
                    write_datum(out, schema["items"], it)
            write_long(out, 0)
            return
        if t == "map":
            entries = dict(v)
            if entries:
                write_long(out, len(entries))
                for k, val in entries.items():
                    write_bytes(out, k.encode("utf-8"))
                    write_datum(out, schema["values"], val)
            write_long(out, 0)
            return
        schema = t  # primitive wrapper {"type": "long"}
    if schema == "null":
        return
    if schema == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif schema in ("int", "long"):
        write_long(out, int(v))
    elif schema == "float":
        out.write(struct.pack("<f", float(v)))
    elif schema == "double":
        out.write(struct.pack("<d", float(v)))
    elif schema == "bytes":
        write_bytes(out, bytes(v))
    elif schema == "string":
        write_bytes(out, str(v).encode("utf-8"))
    else:
        raise TypeError(f"unsupported Avro type: {schema}")


def read_datum(buf: memoryview, pos: int, schema):
    if isinstance(schema, list):  # union
        idx, pos = read_long(buf, pos)
        branch = schema[idx]
        if branch == "null":
            return None, pos
        return read_datum(buf, pos, branch)
    if isinstance(schema, dict):
        t = schema["type"]
        logical = schema.get("logicalType")
        if logical in ("timestamp-micros", "timestamp-millis"):
            import datetime

            n, pos = read_long(buf, pos)
            us = n * 1000 if logical == "timestamp-millis" else n
            return (datetime.datetime(1970, 1, 1)
                    + datetime.timedelta(microseconds=us)), pos
        if logical == "date":
            import datetime

            n, pos = read_long(buf, pos)
            return datetime.date(1970, 1, 1) + datetime.timedelta(days=n), pos
        if t == "record":
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]], pos = read_datum(buf, pos, f["type"])
            return rec, pos
        if t == "array":
            out = []
            while True:
                n, pos = read_long(buf, pos)
                if n == 0:
                    break
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _, pos = read_long(buf, pos)
                for _ in range(n):
                    v, pos = read_datum(buf, pos, schema["items"])
                    out.append(v)
            return out, pos
        if t == "map":
            out = {}
            while True:
                n, pos = read_long(buf, pos)
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    _, pos = read_long(buf, pos)
                for _ in range(n):
                    k, pos = read_bytes(buf, pos)
                    out[k.decode("utf-8")], pos = read_datum(
                        buf, pos, schema["values"])
            return out, pos
        if t == "enum":
            idx, pos = read_long(buf, pos)
            return schema["symbols"][idx], pos
        if t == "fixed":
            n = schema["size"]
            return bytes(buf[pos:pos + n]), pos + n
        schema = t
    if schema == "null":
        return None, pos
    if schema == "boolean":
        return buf[pos] == 1, pos + 1
    if schema in ("int", "long"):
        return read_long(buf, pos)
    if schema == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if schema == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if schema == "bytes":
        return read_bytes(buf, pos)
    if schema == "string":
        b, pos = read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    raise TypeError(f"unsupported Avro type: {schema}")


# --------------------------------------------------------------------------
# Schema resolution (spec: "Schema Resolution") — evolve on read:
# writer fields absent from the reader are skipped, reader fields absent
# from the writer take their defaults, numeric promotions apply
# (int->long/float/double, long->float/double, float->double,
# string<->bytes), unions resolve by branch.
# --------------------------------------------------------------------------

_PROMOTIONS = {
    ("int", "long"): int, ("int", "float"): float, ("int", "double"): float,
    ("long", "float"): float, ("long", "double"): float,
    ("float", "double"): float,
    ("string", "bytes"): lambda v: v.encode("utf-8"),
    ("bytes", "string"): lambda v: v.decode("utf-8"),
}


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _default_value(schema, default):
    if _type_name(schema) == "bytes":
        # spec: bytes defaults are JSON strings of latin-1 code points
        return default.encode("latin-1") if isinstance(default, str) else default
    return default


def read_datum_resolved(buf: memoryview, pos: int, writer, reader):
    """Decode a datum written with ``writer`` as seen through ``reader``."""
    if writer == reader:
        return read_datum(buf, pos, reader)
    if isinstance(writer, list):  # writer union: branch first, then resolve
        idx, pos = read_long(buf, pos)
        return read_datum_resolved(buf, pos, writer[idx], reader)
    if isinstance(reader, list):  # reader union: first matching branch
        wname = _type_name(writer)
        for branch in reader:
            bname = _type_name(branch)
            if bname == wname or (wname, bname) in _PROMOTIONS:
                return read_datum_resolved(buf, pos, writer, branch)
        raise TypeError(f"writer {wname} matches no reader union branch")
    wname, rname = _type_name(writer), _type_name(reader)
    if wname == "record" and rname == "record":
        rfields = {f["name"]: f for f in reader["fields"]}
        rec = {}
        seen = set()
        for wf in writer["fields"]:
            rf = rfields.get(wf["name"])
            if rf is None:
                _, pos = read_datum(buf, pos, wf["type"])  # skip
            else:
                rec[wf["name"]], pos = read_datum_resolved(
                    buf, pos, wf["type"], rf["type"])
                seen.add(wf["name"])
        for rf in reader["fields"]:
            if rf["name"] not in seen:
                if "default" not in rf:
                    raise TypeError(
                        f"reader field {rf['name']} missing from writer "
                        "and has no default")
                rec[rf["name"]] = _default_value(rf["type"], rf["default"])
        return rec, pos
    if wname == "array" and rname == "array":
        out = []
        while True:
            n, pos = read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = read_long(buf, pos)
            for _ in range(n):
                v, pos = read_datum_resolved(buf, pos, writer["items"],
                                             reader["items"])
                out.append(v)
        return out, pos
    if wname == "map" and rname == "map":
        out = {}
        while True:
            n, pos = read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = read_long(buf, pos)
            for _ in range(n):
                k, pos = read_bytes(buf, pos)
                out[k.decode("utf-8")], pos = read_datum_resolved(
                    buf, pos, writer["values"], reader["values"])
        return out, pos
    promote = _PROMOTIONS.get((wname, rname))
    if promote is not None:
        v, pos = read_datum(buf, pos, writer)
        return promote(v), pos
    if wname == rname:  # same type, differing attrs (e.g. logicalType)
        if wname in ("enum", "fixed"):
            # indices/sizes are defined by the WRITER's declaration
            return read_datum(buf, pos, writer)
        return read_datum(buf, pos, reader if isinstance(reader, dict)
                          else writer)
    raise TypeError(f"cannot resolve writer {wname} as reader {rname}")


# --------------------------------------------------------------------------
# Object Container File framing (spec: "Object Container Files")
# --------------------------------------------------------------------------


def _import_snappy():
    """snappy codec is optional: the spec framing (block + CRC32 of the
    uncompressed data) is implemented here, but the compressor itself
    comes from the python-snappy wheel when present."""
    try:
        import snappy
    except ImportError as exc:
        raise ValueError(
            "avro codec 'snappy' needs the python-snappy package "
            "(not installed in this environment); use codec='deflate' "
            "or 'null'") from exc
    return snappy


def write_container(path: str, schema_json: str, records: list[dict],
                    codec: str = "deflate", sync: bytes | None = None,
                    block_records: int = 4096) -> int:
    """Write one OCF; returns record count."""
    import secrets

    schema = json.loads(schema_json)
    sync = sync or secrets.token_bytes(SYNC_SIZE)
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = _io.BytesIO()
        write_long(meta, 2)
        write_bytes(meta, b"avro.schema")
        write_bytes(meta, schema_json.encode("utf-8"))
        write_bytes(meta, b"avro.codec")
        write_bytes(meta, codec.encode("utf-8"))
        write_long(meta, 0)
        f.write(meta.getvalue())
        f.write(sync)
        for i in range(0, len(records), block_records):
            chunk = records[i:i + block_records]
            body = _io.BytesIO()
            for rec in chunk:
                write_datum(body, schema, rec)
            payload = body.getvalue()
            if codec == "deflate":
                payload = zlib.compress(payload)[2:-4]  # raw, per spec
            elif codec == "snappy":
                # spec: snappy block + 4-byte big-endian CRC32 of the
                # UNCOMPRESSED data
                sn = _import_snappy()
                crc = zlib.crc32(payload) & 0xFFFFFFFF
                payload = sn.compress(payload) + crc.to_bytes(4, "big")
            elif codec != "null":
                raise ValueError(f"unsupported codec {codec}")
            head = _io.BytesIO()
            write_long(head, len(chunk))
            write_long(head, len(payload))
            f.write(head.getvalue())
            f.write(payload)
            f.write(sync)
    return len(records)


def read_header(data: bytes) -> tuple[dict, str, bytes, int]:
    """Parse just the OCF header: (schema, codec, sync, body_offset).
    Works on a PREFIX of the file (the header is magic + metadata map +
    sync), so schema inference never needs the whole file."""
    buf = memoryview(data)
    if bytes(buf[:4]) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta = {}
    while True:
        n, pos = read_long(buf, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = read_long(buf, pos)
        for _ in range(n):
            k, pos = read_bytes(buf, pos)
            v, pos = read_bytes(buf, pos)
            meta[k.decode("utf-8")] = v
    sync = bytes(buf[pos:pos + SYNC_SIZE])
    pos += SYNC_SIZE
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, pos


def read_container(data: bytes,
                   reader_schema=None) -> tuple[dict, list[dict]]:
    """Parse one OCF; returns (parsed avro schema, records). With
    ``reader_schema`` (parsed dict), records are resolved through the
    spec's schema-evolution rules instead of decoded verbatim."""
    buf = memoryview(data)
    schema, codec, sync, pos = read_header(data)
    records = []
    total = len(buf)
    while pos < total:
        count, pos = read_long(buf, pos)
        size, pos = read_long(buf, pos)
        payload = bytes(buf[pos:pos + size])
        pos += size
        if bytes(buf[pos:pos + SYNC_SIZE]) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += SYNC_SIZE
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec == "snappy":
            sn = _import_snappy()
            body, crc = payload[:-4], int.from_bytes(payload[-4:], "big")
            payload = sn.decompress(body)
            if (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
                raise ValueError("snappy block CRC mismatch (corrupt block)")
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        block = memoryview(payload)
        bpos = 0
        if reader_schema is not None and reader_schema != schema:
            for _ in range(count):
                rec, bpos = read_datum_resolved(block, bpos, schema,
                                                reader_schema)
                records.append(rec)
        else:
            for _ in range(count):
                rec, bpos = read_datum(block, bpos, schema)
                records.append(rec)
    return (reader_schema if reader_schema is not None else schema), records


# --------------------------------------------------------------------------
# Spark transforms
# --------------------------------------------------------------------------


class ReadFromAvroFile(PTransform):
    """io/avroio.py:75 — distributed OCF read: binaryFile distributes
    files across executors; blocks decode inside Arrow batches. Schema
    from the first file's header unless ``avro_schema`` (JSON str) is
    given."""

    def __init__(self, path_glob: str, avro_schema: str | None = None,
                 label=None):
        super().__init__(label)
        self.path_glob, self.avro_schema = path_glob, avro_schema

    def expand(self, pipeline) -> PCollection:
        import pandas as pd

        spark = pipeline.spark
        listing = spark.read.format("binaryFile").load(self.path_glob)
        files = listing.select("content")
        if self.avro_schema is not None:
            schema = json.loads(self.avro_schema)
        else:
            # header-only inference: list one path (no content transfer)
            # and read the first KBs through the Hadoop FS — collecting
            # a whole multi-GB shard to parse a few-hundred-byte header
            # would be a driver OOM at scale
            head = listing.select("path").limit(1).collect()
            if not head:
                raise FileNotFoundError(self.path_glob)
            schema = self._read_schema_from_header(spark, head[0]["path"])
        spark_schema = avro_to_spark(schema)
        if not isinstance(spark_schema, T.StructType):
            raise TypeError("top-level Avro schema must be a record")
        ts_cols = [f.name for f in spark_schema.fields
                   if isinstance(f.dataType, T.TimestampType)]
        # mirror of the write-side conversion: the codec decodes UTC
        # instants, but Arrow interprets naive datetime64 output as
        # SESSION-LOCAL wall time — shift into the session tz so the
        # round-tripped instant is preserved under any session timezone
        session_tz = spark.conf.get("spark.sql.session.timeZone")

        reader_schema = schema

        def gen(batches: Iterator["pd.DataFrame"]):
            for pdf in batches:
                for content in pdf["content"]:
                    # resolve through schema evolution if this file was
                    # written with an older/newer schema than the plan's
                    _, records = read_container(bytes(content),
                                                reader_schema=reader_schema)
                    if not records:
                        continue
                    out = pd.DataFrame(
                        records, columns=[f.name for f in spark_schema.fields])
                    for c in ts_cols:
                        out[c] = pd.to_datetime(out[c])
                        if session_tz not in ("UTC", "Etc/UTC", "GMT"):
                            out[c] = (out[c].dt.tz_localize("UTC")
                                      .dt.tz_convert(session_tz)
                                      .dt.tz_localize(None))
                    yield out

        df = files.mapInPandas(gen, schema=spark_schema)
        return PCollection(df)


    @staticmethod
    def _read_schema_from_header(spark, path: str) -> dict:
        """Read only the OCF header bytes through the Hadoop FS (works
        for any scheme Spark can read), growing the window if a huge
        schema overflows it."""
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        size = 64 * 1024
        while True:
            stream = fs.open(jpath)
            try:
                # readNBytes returns the array (a byte[] passed INTO
                # java via py4j would not be mutated back)
                data = bytes(stream.readNBytes(size))
                read = len(data)
            finally:
                stream.close()
            if not data.startswith(MAGIC):
                raise ValueError(
                    f"not an Avro object container file: {path}")
            try:
                schema, _, _, _ = read_header(data)
                return schema
            except (IndexError, ValueError, KeyError):
                if read < size or size >= 64 * 1024 * 1024:
                    raise
                size *= 8  # giant schema: widen the window


class WriteToAvroFile(PTransform):
    """io/avroio.py:361 — partition-parallel OCF sink: one
    ``part-NNNNN.avro`` container per partition, WriteFiles-style.
    Returns a PCollection of (shard path, record count)."""

    def __init__(self, path: str, codec: str = "deflate",
                 shard_name: str = "part", label=None):
        super().__init__(label)
        self.path, self.codec, self.shard_name = path, codec, shard_name

    def expand(self, pcoll: PCollection) -> PCollection:
        import glob as _glob

        import pandas as pd

        os.makedirs(self.path, exist_ok=True)
        # overwrite semantics: drop stale shards from a previous write —
        # a run with fewer partitions would otherwise leave old
        # part-files behind and a glob read would union old + new rows
        for stale in _glob.glob(
                os.path.join(self.path, f"{self.shard_name}-*.avro")):
            os.remove(stale)
        path, codec, shard_name = self.path, self.codec, self.shard_name
        spark_schema = pcoll.df.schema
        schema_json = json.dumps(spark_to_avro(spark_schema, "topLevelRecord"))
        # Arrow hands the UDF naive datetimes in SESSION-LOCAL wall time;
        # Avro timestamp-micros is defined as a UTC instant, so convert
        # through the session timezone before encoding (what spark-avro
        # does internally). Top-level columns only: timestamps nested in
        # arrays/structs arrive as python objects and stay wall-time.
        session_tz = pcoll.df.sparkSession.conf.get(
            "spark.sql.session.timeZone")

        def _nullify(s):
            # NaN/NaT -> None without tripping on array/map cells (where
            # elementwise isna returns an array, not a bool)
            def conv(v):
                try:
                    na = pd.isna(v)
                except (TypeError, ValueError):
                    return v
                # scalar verdicts (bool or 0-d numpy bool) decide; array
                # verdicts mean an array-typed cell — keep it
                if isinstance(na, bool) or getattr(na, "ndim", 1) == 0:
                    return None if bool(na) else v
                return v

            return [conv(v) for v in s.tolist()]

        def gen(batches: Iterator["pd.DataFrame"]):
            rows: list[dict] = []
            for pdf in batches:
                for c in pdf.columns:
                    s = pdf[c]
                    if (str(s.dtype).startswith("datetime64")
                            and getattr(s.dt, "tz", None) is None
                            and session_tz not in ("UTC", "Etc/UTC", "GMT")):
                        pdf = pdf.copy()
                        pdf[c] = (s.dt.tz_localize(session_tz)
                                  .dt.tz_convert("UTC").dt.tz_localize(None))
                data = {c: _nullify(pdf[c]) for c in pdf.columns}
                cols = list(pdf.columns)
                rows.extend(dict(zip(cols, vals))
                            for vals in zip(*(data[c] for c in cols)))
            if not rows:
                return
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pidx = ctx.partitionId() if ctx else 0
            out = os.path.join(path, f"{shard_name}-{pidx:05d}.avro")
            n = write_container(out, schema_json, rows, codec=codec)
            yield pd.DataFrame({"path": [out], "n_records": [n]})

        out = pcoll.df.mapInPandas(gen, schema="path string, n_records long")
        return pcoll.with_df(out)
