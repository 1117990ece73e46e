"""Plan-level scale behaviors: AQE skew-join split, scan parallelism
scaling with maxPartitionBytes, bucketed-join exchange reuse lives in
test_io. These assert the 100 TB story on small data by reading the
physical plans Spark actually executes (SCALE.md)."""

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition():
    """A 90%-one-key join under AQE ends with SortMergeJoin(skew=true)
    and an `AQEShuffleRead skewed` — the runtime re-plan that replaces
    hand-salting for all but pathological single-key skew (salted_join
    covers that case)."""
    spark = (SparkSession.builder.master("local[8]")
             .appName("skew-demo")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
             .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
             .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    left = spark.range(400_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"))
    right = spark.range(2_000_000).select(
        (F.col("id") % 2000).alias("k"), F.lit("r").alias("rv"))
    j = left.join(right, on="k").select(F.sum(F.length("pad")).alias("s"))
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan, plan[:800]
    assert "AQEShuffleRead skewed" in plan


def test_scan_parallelism_scales_with_max_partition_bytes(spark, tmp_path):
    """files.maxPartitionBytes controls scan task count: halving it on
    the same input at least doubles input partitions — the knob that
    turns a 100 TB read into ~800k tasks instead of 32."""
    p = str(tmp_path / "scan")
    spark.range(400_000).select(
        "id", F.concat(F.lit("y" * 128), F.col("id").cast("string")).alias("pad")) \
        .coalesce(1).write.mode("overwrite").parquet(p)

    old = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        wide = spark.read.parquet(p).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 * 1024 * 1024))
        narrow = spark.read.parquet(p).rdd.getNumPartitions()
    finally:
        if old:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert narrow > wide, (narrow, wide)
