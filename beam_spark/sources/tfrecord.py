"""TFRecord I/O (SURVEY.md §2.8).

Beam reference: io/tfrecordio.py — _TFRecordUtil (masked crc32c framing,
:64-160), ReadFromTFRecord (:238), WriteToTFRecord (:326). The wire
format is public (TensorFlow's tfrecord spec):

    uint64 length
    uint32 masked_crc32c(length)
    byte   data[length]
    uint32 masked_crc32c(data)

crc32c is implemented table-driven in pure python (no external crc lib in
this container); records are validated on read. Production note: a C
crc32c (or google-crc32c) slots into ``_crc32c`` unchanged — the framing
and Spark plumbing are the scale-relevant parts.

Spark design:

* Read: ``spark.read.format("binaryFile")`` over the file glob — one row
  per file (TFRecord shards are file-parallel, not split-parallel, since
  records have no sync markers; same constraint the reference documents
  for non-compressed reads) — then an Arrow-batched ``mapInPandas``
  parses frames into one ``record binary`` row each.
* Write: partition-parallel sink — each input partition serializes its
  rows into one ``part-NNNNN.tfrecord`` shard (mirrors WriteFiles
  sharding).
"""

from __future__ import annotations

import os
import struct
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform

_CRC_TABLE: list[int] | None = None
_POLY = 0x82F63B78  # Castagnoli, reflected


def _table() -> list[int]:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        t = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ _POLY if c & 1 else c >> 1
            t.append(c)
        _CRC_TABLE = t
    return _CRC_TABLE


def _crc32c(data: bytes) -> int:
    t = _table()
    c = 0xFFFFFFFF
    for b in data:
        c = t[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


_MASK_DELTA = 0xA282EAD8


def masked_crc32c(data: bytes) -> int:
    """TFRecord CRC mask (tfrecordio.py:83 _masked_crc32c)."""
    c = _crc32c(data)
    rot = ((c >> 15) | (c << 17)) & 0xFFFFFFFF
    return (rot + _MASK_DELTA) & 0xFFFFFFFF


def write_records(path: str, records: Iterable[bytes]) -> int:
    """Serialize records into one TFRecord file; returns record count."""
    n = 0
    with open(path, "wb") as f:
        for rec in records:
            length = struct.pack("<Q", len(rec))
            f.write(length)
            f.write(struct.pack("<I", masked_crc32c(length)))
            f.write(rec)
            f.write(struct.pack("<I", masked_crc32c(rec)))
            n += 1
    return n


def parse_records(buf: bytes, validate: bool = True) -> Iterator[bytes]:
    """Iterate records from TFRecord file bytes, checking both crcs."""
    pos, size = 0, len(buf)
    while pos < size:
        header = buf[pos:pos + 12]
        if len(header) < 12:
            raise ValueError(f"truncated TFRecord header at offset {pos}")
        (length,) = struct.unpack("<Q", header[:8])
        (len_crc,) = struct.unpack("<I", header[8:12])
        if validate and masked_crc32c(header[:8]) != len_crc:
            raise ValueError(f"length crc mismatch at offset {pos}")
        rec = buf[pos + 12:pos + 12 + length]
        if len(rec) < length:
            raise ValueError(f"truncated TFRecord data at offset {pos}")
        (data_crc,) = struct.unpack("<I", buf[pos + 12 + length:pos + 16 + length])
        if validate and masked_crc32c(rec) != data_crc:
            raise ValueError(f"data crc mismatch at offset {pos}")
        yield rec
        pos += 16 + length


class ReadFromTFRecord(PTransform):
    """io/tfrecordio.py:238 — DataFrame with one ``record binary`` row per
    TFRecord frame. File-parallel (binaryFile source distributes files
    across executors; records parse inside Arrow batches)."""

    def __init__(self, path_glob: str, validate: bool = True, label=None):
        super().__init__(label)
        self.path_glob, self.validate = path_glob, validate

    def expand(self, pipeline) -> PCollection:
        import pandas as pd

        spark: SparkSession = pipeline.spark
        validate = self.validate
        files = (spark.read.format("binaryFile").load(self.path_glob)
                 .select("path", "content"))

        def gen(batches: Iterator["pd.DataFrame"]):
            for pdf in batches:
                out = []
                for buf in pdf["content"]:
                    out.extend(parse_records(bytes(buf), validate=validate))
                if out:
                    yield pd.DataFrame({"record": out})

        df = files.mapInPandas(gen, schema="record binary")
        return PCollection(df)


class WriteToTFRecord(PTransform):
    """io/tfrecordio.py:326 — write a binary column as sharded TFRecord
    files (one shard per partition, WriteFiles-style part naming).

    Local-filesystem sink (this container); on a cluster the identical
    framing writes through any fsspec/Hadoop-compatible target.
    Returns a PCollection of (shard path, record count).
    """

    def __init__(self, path: str, record_col: str = "record",
                 shard_name: str = "part", label=None):
        super().__init__(label)
        self.path, self.record_col, self.shard_name = path, record_col, shard_name

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd

        os.makedirs(self.path, exist_ok=True)
        path, col, shard_name = self.path, self.record_col, self.shard_name

        def gen(batches: Iterator["pd.DataFrame"]):
            recs: list[bytes] = []
            for pdf in batches:
                recs.extend(bytes(r) for r in pdf[col])
            if not recs:
                return
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pidx = ctx.partitionId() if ctx else 0
            out = os.path.join(path, f"{shard_name}-{pidx:05d}.tfrecord")
            n = write_records(out, recs)
            yield pd.DataFrame({"path": [out], "n_records": [n]})

        out = pcoll.df.select(col).mapInPandas(
            gen, schema="path string, n_records long")
        return pcoll.with_df(out)
