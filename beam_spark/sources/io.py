"""Bounded sources & sinks (SURVEY.md §2.8).

Beam reference: io/textio.py:60,581 ReadFromText/WriteToText;
io/parquetio.py:195-795 ReadFromParquet/WriteToParquet; io/avroio.py:75,361.
Beam's splittable-source machinery (iobase.py, liquid sharding) is NOT
rebuilt: Spark's DataSource V2 owns file splitting, predicate pushdown and
column pruning — declaring the read is enough.

Scale notes: parquet reads get PushedFilters/ReadSchema pruning from
Catalyst automatically; writers use Spark's file committer (which replaces
Beam's temp-file + rename protocol, io/fileio.py:668).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beam_spark.pcollection import PBegin, PCollection, PTransform

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    """Load the TESTDATA star schema from a scale-factor directory."""
    return {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names}


class _Read(PTransform):
    fmt = None

    def __init__(self, path: str, schema=None, label=None, **options):
        super().__init__(label)
        self.path, self.schema, self.options = path, schema, options

    def expand(self, pbegin: PBegin) -> PCollection:
        reader = pbegin.spark.read.options(**self.options)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        df = reader.format(self.fmt).load(self.path)
        pipeline = getattr(pbegin, "pipeline", None)
        return PCollection(df, pipeline=pipeline)


class ReadFromParquet(_Read):
    """parquetio.py:195 — columnar scan w/ pushdown via DataSource V2."""
    fmt = "parquet"


class ReadFromText(_Read):
    """textio.py:60 — one row per line, column 'value'."""
    fmt = "text"


class ReadFromCsv(_Read):
    fmt = "csv"

    def __init__(self, path, schema=None, header=True, inferSchema=None, label=None, **options):
        options.setdefault("header", str(header).lower())
        if schema is None and inferSchema is None:
            options.setdefault("inferSchema", "true")
        super().__init__(path, schema, label, **options)


class ReadFromJson(_Read):
    fmt = "json"


class ReadFromAvro(_Read):
    """avroio.py:75 — native spark-avro DataSource when the jar is on the
    classpath (preferred at cluster scale: JVM decode, block splitting);
    otherwise falls back to the pure-python OCF codec
    (sources/avro.py, spec-implemented + Java-interop-tested)."""
    fmt = "avro"

    def expand(self, pbegin: PBegin) -> PCollection:
        from pyspark.errors import AnalysisException

        try:
            return super().expand(pbegin)
        except AnalysisException as e:
            if not _is_missing_datasource(e):
                raise  # real read errors (missing path, ...) surface
            from beam_spark.sources.avro import ReadFromAvroFile

            return ReadFromAvroFile(
                self.path, avro_schema=self.options.get("avroSchema"),
            ).expand(pbegin)


class ReadFromOrc(_Read):
    fmt = "orc"


class MatchFiles(PTransform):
    """fileio.py:177 MatchFiles/MatchAll — file-metadata rows (path,
    size_bytes, last_updated) for a glob, WITHOUT reading contents: the
    binaryFile source's column pruning drops the ``content`` column, so
    only the driver-side listing + per-file stat runs (scales with file
    COUNT, like Beam's match)."""

    def __init__(self, path_glob: str, label=None):
        super().__init__(label)
        self.path_glob = path_glob

    def expand(self, pbegin: PBegin) -> PCollection:
        df = (pbegin.spark.read.format("binaryFile").load(self.path_glob)
              .select(F.col("path"),
                      F.col("length").alias("size_bytes"),
                      F.col("modificationTime").alias("last_updated")))
        return PCollection(df, pipeline=getattr(pbegin, "pipeline", None))


class ReadMatches(PTransform):
    """fileio.py ReadMatches — one row per matched file WITH its bytes
    (path, content). Downstream ParDos parse per-file payloads (the
    ReadableFile analog). File-parallel like every binaryFile read."""

    def __init__(self, path_glob: str, label=None):
        super().__init__(label)
        self.path_glob = path_glob

    def expand(self, pbegin: PBegin) -> PCollection:
        df = (pbegin.spark.read.format("binaryFile").load(self.path_glob)
              .select("path", "content"))
        return PCollection(df, pipeline=getattr(pbegin, "pipeline", None))


class ReadTable(PTransform):
    """Catalog table scan (Beam SQL's BeamIOSourceRel analog)."""

    def __init__(self, name: str, label=None):
        super().__init__(label)
        self.name = name

    def expand(self, pbegin: PBegin) -> PCollection:
        return PCollection(pbegin.spark.table(self.name),
                           pipeline=getattr(pbegin, "pipeline", None))


class _Write(PTransform):
    fmt = None

    def __init__(self, path: str, mode: str = "overwrite", partition_by=None,
                 label=None, **options):
        super().__init__(label)
        self.path, self.mode = path, mode
        self.partition_by = ([partition_by] if isinstance(partition_by, str)
                             else list(partition_by or []))
        self.options = options

    def expand(self, pcoll: PCollection) -> PCollection:
        w = pcoll.df.write.mode(self.mode).options(**self.options)
        if self.partition_by:
            # Dynamic destinations (Beam WriteToFiles fileio.py:177-920) ->
            # hive-style partitioned layout.
            w = w.partitionBy(*self.partition_by)
        w.format(self.fmt).save(self.path)
        return pcoll


class WriteToParquet(_Write):
    fmt = "parquet"


class WriteToText(_Write):
    fmt = "text"


class WriteToCsv(_Write):
    fmt = "csv"

    def __init__(self, path, mode="overwrite", header=True, label=None, **options):
        options.setdefault("header", str(header).lower())
        super().__init__(path, mode, None, label, **options)


class WriteToJson(_Write):
    fmt = "json"


def _is_missing_datasource(e) -> bool:
    """True only for the jar-absent error — other AnalysisExceptions
    (missing path, exists-with-mode-error, ...) must surface."""
    get_cls = (getattr(e, "getCondition", None)
               or getattr(e, "getErrorClass", None))
    cls = (get_cls() if get_cls else None) or ""
    msg = str(e)
    return ("DATA_SOURCE_NOT_FOUND" in cls or "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find data source" in msg
            or "Failed to find the data source" in msg)


class WriteToAvro(_Write):
    """avroio.py:361 — native spark-avro sink when the jar is present;
    else the pure-python partition-parallel OCF sink (sources/avro.py),
    honoring write modes (partition_by is native-only — the fallback
    fails fast rather than silently writing a flat layout)."""
    fmt = "avro"

    def expand(self, pcoll: PCollection) -> PCollection:
        import glob as _glob
        import os as _os

        from pyspark.errors import AnalysisException

        try:
            return super().expand(pcoll)
        except AnalysisException as e:
            if not _is_missing_datasource(e):
                raise
            if self.partition_by:
                raise NotImplementedError(
                    "WriteToAvro(partition_by=...) needs the spark-avro "
                    "DataSource; the pure-python fallback writes flat "
                    "part-NNNNN shards only") from e
            from beam_spark.sources.avro import WriteToAvroFile

            existing = _glob.glob(_os.path.join(self.path, "part-*.avro"))
            if existing and self.mode in ("error", "errorifexists"):
                raise FileExistsError(self.path) from e
            if existing and self.mode == "ignore":
                return pcoll
            sink = WriteToAvroFile(self.path,
                                   codec=self.options.get("codec", "deflate"))
            if self.mode == "append":
                # keep prior shards: new ones get fresh partition ids,
                # so name them into a unique subshard prefix
                sink.shard_name = f"part-{len(existing):04d}a"
            sink.expand(pcoll).df.collect()  # execute the shard writes
            return pcoll


class WriteBucketedTable(PTransform):
    """Bucketed managed table (hash-bucketed by join key, optionally
    sorted within buckets): two tables bucketed the same way join with NO
    shuffle exchange — the pre-partitioned co-located join strategy for
    repeated large-fact joins at 100 TB (SURVEY §4.3 shuffle row).

    Beam has no bucketing concept (every CoGBK shuffles); this is a
    Spark-native capability the engine surfaces as a first-class sink.
    """

    def __init__(self, table_name: str, bucket_cols, n_buckets: int = 32,
                 sort_cols=None, mode: str = "overwrite", label=None):
        super().__init__(label)
        self.table_name = table_name
        self.bucket_cols = ([bucket_cols] if isinstance(bucket_cols, str)
                            else list(bucket_cols))
        self.sort_cols = ([sort_cols] if isinstance(sort_cols, str)
                          else list(sort_cols or []))
        self.n_buckets, self.mode = n_buckets, mode

    def expand(self, pcoll: PCollection) -> PCollection:
        spark = pcoll.df.sparkSession
        if self.mode == "overwrite":
            # a fresh session's catalog doesn't know a previous
            # session's managed table, but its warehouse LOCATION
            # survives and saveAsTable refuses to reuse it — drop the
            # catalog entry and clear an orphaned local location
            spark.sql(f"DROP TABLE IF EXISTS {self.table_name}")
            wh = spark.conf.get("spark.sql.warehouse.dir", "")
            if wh.startswith("file:"):
                import shutil
                from urllib.parse import urlparse

                # managed-table location: <wh>/<table> for the default
                # db, <wh>/<db>.db/<table> for a qualified name (or the
                # session's current database when unqualified)
                parts = self.table_name.lower().split(".")
                tbl = parts[-1]
                db = (parts[-2] if len(parts) > 1
                      else spark.catalog.currentDatabase().lower())
                base = urlparse(wh).path
                loc = (os.path.join(base, tbl) if db == "default"
                       else os.path.join(base, f"{db}.db", tbl))
                shutil.rmtree(loc, ignore_errors=True)
        w = (pcoll.df.write.mode(self.mode)
             .bucketBy(self.n_buckets, *self.bucket_cols))
        if self.sort_cols:
            w = w.sortBy(*self.sort_cols)
        w.format("parquet").saveAsTable(self.table_name)
        return pcoll


class OverwritePartitionsDynamic(PTransform):
    """Idempotent partition-scoped overwrite: replace ONLY the hive
    partitions present in the input, leaving every other partition of
    the destination untouched — the safe backfill/reprocess pattern for
    a partitioned lake (rerunning one day must not clobber the table).

    Uses Spark's dynamic partitionOverwriteMode scoped to this write
    (set via the writer option, not the session conf, so concurrent
    static-mode writes are unaffected). The input is repartitioned on
    the partition columns first — the Nexmark-Q10 lesson: without it
    every task opens a writer per destination and the job writes
    thousands of tiny files.
    """

    def __init__(self, path: str, partition_by, fmt: str = "parquet",
                 label=None, **options):
        super().__init__(label)
        self.path, self.fmt = path, fmt
        self.partition_by = ([partition_by] if isinstance(partition_by, str)
                             else list(partition_by))
        self.options = options

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df.repartition(*[F.col(c) for c in self.partition_by])
        (df.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .options(**self.options)
         .partitionBy(*self.partition_by)
         .format(self.fmt).save(self.path))
        return pcoll


class CompactParquet(PTransform):
    """Small-files compaction: rewrite a parquet dataset (optionally a
    single hive partition) into ~``target_file_mb``-sized files — the
    lake-maintenance job that undoes write-amplification from streaming
    or over-parallel writers. File count = ceil(input_bytes / target);
    input bytes come from the file listing (no data scan).

    Run it per-partition behind OverwritePartitionsDynamic semantics to
    compact in place without touching sibling partitions.
    """

    def __init__(self, path: str, target_file_mb: int = 128,
                 partition_filter: str | None = None, label=None):
        super().__init__(label)
        self.path, self.target_mb = path, int(target_file_mb)
        self.partition_filter = partition_filter

    def expand(self, pbegin) -> PCollection:
        spark = getattr(pbegin, "spark", None) or pbegin.df.sparkSession
        df = spark.read.parquet(self.path)
        listing = (spark.read.format("binaryFile")
                   .option("pathGlobFilter", "*.parquet")
                   .option("recursiveFileLookup", "true")
                   .load(self.path).select("path", "length"))
        if self.partition_filter:
            # Size from the FILTERED data, not the whole dataset: list
            # the files the pruned scan actually touches (a zero-column
            # distinct over input_file_name — footer-only work) and
            # restrict the byte total to those. Sizing from the full
            # listing would compact one partition into
            # ceil(whole_dataset/target) near-empty files.
            df = df.filter(self.partition_filter)
            # URI spellings differ between sources (file:/ vs file:///)
            # so join on the scheme-stripped path.
            norm = lambda c: F.regexp_replace(c, "^[a-z0-9]+:/+", "/")  # noqa: E731
            touched = df.select(
                norm(F.input_file_name()).alias("__p")).distinct()
            listing = (listing.withColumn("__p", norm(F.col("path")))
                       .join(F.broadcast(touched), on="__p",
                             how="leftsemi"))
        total = (listing.agg(F.sum("length")).collect()[0][0]) or 0
        n_files = max(1, -(-int(total) // (self.target_mb * 1024 * 1024)))
        out = df.repartition(n_files)
        return PCollection(out, pipeline=getattr(pbegin, "pipeline", None))


class ReadFromKafka(PTransform):
    """Kafka source (Beam io/kafka.py:136 xlang -> native Spark Kafka).

    Streaming by default; requires the spark-sql-kafka package on the
    cluster (not shipped in this container — declared interface, gated
    behind the format lookup at runtime)."""

    def __init__(self, bootstrap_servers: str, topics: str,
                 starting_offsets: str = "latest", streaming: bool = True,
                 label=None, **options):
        super().__init__(label)
        self.servers, self.topics = bootstrap_servers, topics
        self.starting_offsets, self.streaming = starting_offsets, streaming
        self.options = options

    def expand(self, pbegin: PBegin) -> PCollection:
        reader = (pbegin.spark.readStream if self.streaming
                  else pbegin.spark.read)
        df = (reader.format("kafka")
              .option("kafka.bootstrap.servers", self.servers)
              .option("subscribe", self.topics)
              .option("startingOffsets", self.starting_offsets)
              .options(**self.options).load())
        return PCollection(df, pipeline=getattr(pbegin, "pipeline", None),
                           is_bounded=not self.streaming, ts_col="timestamp")


class ReadFromJdbc(PTransform):
    """JDBC source (Beam io/jdbc.py:143 xlang -> spark.read.jdbc).

    ``partition_column``/``num_partitions`` give the parallel read the
    reference gets from JdbcIO partitioning."""

    def __init__(self, url: str, table: str, partition_column: str | None = None,
                 lower_bound=None, upper_bound=None, num_partitions: int = 8,
                 label=None, **properties):
        super().__init__(label)
        self.url, self.table = url, table
        self.partition_column = partition_column
        self.bounds = (lower_bound, upper_bound)
        self.num_partitions, self.properties = num_partitions, properties

    def expand(self, pbegin: PBegin) -> PCollection:
        kwargs = dict(url=self.url, table=self.table, properties=self.properties)
        if self.partition_column:
            kwargs.update(column=self.partition_column,
                          lowerBound=self.bounds[0], upperBound=self.bounds[1],
                          numPartitions=self.num_partitions)
        df = pbegin.spark.read.jdbc(**kwargs)
        return PCollection(df, pipeline=getattr(pbegin, "pipeline", None))


class WriteToJdbc(PTransform):
    """JDBC sink (Beam io/jdbc.py WriteToJdbc xlang -> ``df.write.jdbc``,
    partition-parallel inserts). Integration-tested against the embedded
    Derby engine bundled with Spark (tests/test_io.py) — the same path
    serves any server-mode driver on a cluster."""

    def __init__(self, url: str, table: str, mode: str = "append",
                 label=None, **properties):
        super().__init__(label)
        self.url, self.table, self.mode = url, table, mode
        self.properties = {k: str(v) for k, v in properties.items()}

    def expand(self, pcoll: PCollection) -> PCollection:
        pcoll.df.write.jdbc(self.url, self.table, mode=self.mode,
                            properties=self.properties)
        return pcoll


def register_parquet_table(spark: SparkSession, name: str, path: str) -> None:
    """CREATE EXTERNAL TABLE analog (Beam SQL DDL, impl/parser/):
    registers a parquet path as a queryable table."""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} USING parquet LOCATION '{path}'")
