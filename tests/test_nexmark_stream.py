"""Streaming Nexmark-analog harness checks (VERDICT r14 #5): the
events/s rows in SCALE.md come from tools/nexmark_stream_bench.py —
this pins that the harness's streaming queries produce the SAME result
set as batch replays of the identical window shapes, so the published
throughput numbers measure correct plans, not empty streams."""

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.fixture(scope="module")
def stream_dir(sf_dir):
    from nexmark_stream_bench import build_stream_dir

    d = tempfile.mkdtemp(prefix="bs_nexmark_stream_test_")
    n = build_stream_dir(sf_dir, d, batches=3)
    yield d, n
    import shutil
    shutil.rmtree(d, ignore_errors=True)


def _batch_events(spark, stream_dir):
    # the SAME files the stream consumes (incl. the watermark tail row,
    # which lands in its own far-future windows on both sides)
    return spark.read.parquet(stream_dir)


def test_q7_stream_equals_batch(spark, stream_dir):
    from nexmark_stream_bench import q7_highest_bid

    d, _ = stream_dir
    n_stream = q7_highest_bid(spark, d)
    batch = (_batch_events(spark, d)
             .groupBy(F.window("ts", "1 hour"))
             .agg(F.max_by(F.struct("event_id", "user_id", "value"),
                           F.struct(F.col("value"), F.col("event_id")))
                  .alias("m")))
    # append mode holds windows the watermark has not passed: the tail
    # row's OWN window (watermark stops 10s short of it) is the single
    # open one — every real-event window is 30 days closed
    assert n_stream == batch.count() - 1 > 0


def test_q11_stream_equals_batch(spark, stream_dir):
    from nexmark_stream_bench import q11_user_sessions

    d, _ = stream_dir
    n_stream = q11_user_sessions(spark, d)
    batch = (_batch_events(spark, d)
             .groupBy(F.session_window("ts", "30 minutes"), "user_id")
             .agg(F.count(F.lit(1))))
    # the tail row's own session is the single held window
    assert n_stream == batch.count() - 1 > 0


def test_q5_stream_top3_matches_batch(spark, stream_dir):
    from nexmark_stream_bench import q5_hot_users

    d, _ = stream_dir
    n_stream = q5_hot_users(spark, d)
    counts = (_batch_events(spark, d)
              .groupBy(F.window("ts", "1 hour", "15 minutes"), "user_id")
              .agg(F.count(F.lit(1)).alias("n")))
    top3 = (counts
            .withColumn("rk", F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("window")
                .orderBy(F.desc("n"), F.asc("user_id"))))
            .where("rk <= 3"))
    # the tail row lands in 4 sliding (1h/15m) windows, each held open
    # with exactly its one top-3 row
    assert n_stream == top3.count() - 4 > 0
