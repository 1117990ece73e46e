"""Streaming join coverage (SURVEY §2.4 on unbounded inputs).

Beam joins on streams are windowed CoGroupByKey compositions
(transforms/util.py CoGroupByKey + windowing); Spark's Structured
Streaming executes the same shapes natively: stream-static joins
(side-input join analog), stream-stream inner joins with watermarks +
an event-time range condition (state bounded by the watermark), and
per-window joins on the window struct column (Beam's
join-per-fixed-window). These tests pin all three through the engine's
Join / WindowInto operators on TestStream inputs.
"""

from pyspark.sql import functions as F

from beam_spark.operators.join import Join
from beam_spark.operators.window import FixedWindows, WindowInto
from beam_spark.pcollection import PCollection, Pipeline
from beam_spark.operators.core import Create
from beam_spark.streaming import TestStream, WithWatermark, WriteStreamToMemory


def test_stream_static_join(spark):
    """Stream-static: the streaming side keeps streaming; the static dim
    behaves as a (re-read-per-batch) side input — Beam's broadcast side
    input join."""
    dim = (Pipeline(spark)
           | Create([{"k": "a", "name": "alpha"}, {"k": "b", "name": "beta"}]))

    ts = TestStream(spark, "t timestamp, k string, v long")
    ts.add_elements([{"t": "2024-01-01 00:00:10", "k": "a", "v": 1}])
    ts.add_elements([{"t": "2024-01-01 00:00:20", "k": "b", "v": 2},
                     {"t": "2024-01-01 00:00:30", "k": "c", "v": 3}])

    pc = (ts.stream()
          | Join(dim, on="k", how="left")
          | WriteStreamToMemory(output_mode="append"))
    rows = {(r["k"], r["v"], r["name"]) for r in pc.collect()}
    assert rows == {("a", 1, "alpha"), ("b", 2, "beta"), ("c", 3, None)}


def test_stream_stream_join_watermarked_range(spark):
    """Stream-stream inner join: both sides watermarked, the join
    condition includes an event-time range so Spark can bound state —
    the 100 TB-safe shape (unbounded-state joins are rejected by the
    engine, same as Beam requires windowed/bounded joins)."""
    imps = TestStream(spark, "imp_t timestamp, ad string, imp_id long")
    imps.add_elements([{"imp_t": "2024-01-01 00:00:05", "ad": "x", "imp_id": 1},
                       {"imp_t": "2024-01-01 00:00:10", "ad": "y", "imp_id": 2}])
    imps.add_elements([{"imp_t": "2024-01-01 00:10:00", "ad": "z", "imp_id": 3}])

    clicks = TestStream(spark, "clk_t timestamp, ad string, clk_id long")
    clicks.add_elements([{"clk_t": "2024-01-01 00:00:30", "ad": "x",
                          "clk_id": 10}])
    clicks.add_elements([{"clk_t": "2024-01-01 00:09:00", "ad": "y",  # > 1 min after imp 2
                          "clk_id": 11},
                         {"clk_t": "2024-01-01 00:10:20", "ad": "z",
                          "clk_id": 12}])

    left = imps.stream() | WithWatermark("imp_t", "10 seconds")
    right = clicks.stream() | WithWatermark("clk_t", "10 seconds")

    joined = (left
              | Join(right, condition=(
                  (F.col("imp_t") <= F.col("clk_t"))
                  & (F.col("clk_t") <= F.col("imp_t") + F.expr("INTERVAL 1 MINUTE"))
                  & (left.df["ad"] == right.df["ad"])))
              | WriteStreamToMemory(output_mode="append"))
    got = {(r["imp_id"], r["clk_id"]) for r in joined.collect()}
    # (2, 11) excluded: click outside the 1-minute attribution range
    assert got == {(1, 10), (3, 12)}


def test_windowed_stream_join_on_window(spark):
    """Per-fixed-window join (Beam's windowed CoGroupByKey): both streams
    windowed, equi-join on (key, window struct) — only same-window pairs
    meet."""
    a = TestStream(spark, "t timestamp, k string, va long")
    a.add_elements([{"t": "2024-01-01 00:00:10", "k": "a", "va": 1},
                    {"t": "2024-01-01 00:01:10", "k": "a", "va": 2}])

    b = TestStream(spark, "t2 timestamp, k string, vb long")
    b.add_elements([{"t2": "2024-01-01 00:00:50", "k": "a", "vb": 10},
                    {"t2": "2024-01-01 00:01:20", "k": "a", "vb": 20}])

    wa = (a.stream() | WithWatermark("t", "10 seconds")
          | WindowInto(FixedWindows(60), ts_col="t"))
    wb = (b.stream() | WithWatermark("t2", "10 seconds")
          | WindowInto(FixedWindows(60), ts_col="t2"))

    # drop the raw ts so each side carries ONE event-time column (the
    # watermarked window struct) — Spark's requirement for window joins
    joined = (wa.with_df(wa.df.drop("t"))
              | Join(wb.df.drop("t2")
                     .withColumnRenamed("__window", "__window2")
                     .withColumnRenamed("k", "k2"),
                     condition=(
                         (F.col("k") == F.col("k2")) &
                         (F.col("__window") == F.col("__window2"))))
              | WriteStreamToMemory(output_mode="append"))
    got = {(r["va"], r["vb"]) for r in joined.collect()}
    # same-window pairs only: (1,10) in minute 0, (2,20) in minute 1
    assert got == {(1, 10), (2, 20)}


def test_unbounded_unbounded_join_without_time_bound_rejected(spark):
    """Outer stream-stream join without watermark/time bound must fail
    fast (Spark raises at query start) — parity with Beam's rejection of
    unbounded non-windowed joins."""
    import pytest

    a = TestStream(spark, "t timestamp, k string, v long")
    a.add_elements([{"t": "2024-01-01 00:00:10", "k": "a", "v": 1}])
    b = TestStream(spark, "t2 timestamp, k string, w long")
    b.add_elements([{"t2": "2024-01-01 00:00:10", "k": "a", "w": 2}])

    pc = (a.stream()
          | Join(b.stream().df.withColumnRenamed("k", "k2"), how="full",
                 condition=F.col("k") == F.col("k2")))
    with pytest.raises(Exception, match="[Ww]atermark|outer join"):
        pc | WriteStreamToMemory(output_mode="append")


def test_stream_stream_left_outer_time_bounded(spark):
    """LEFT OUTER stream-stream join WITH watermarks + event-time range
    (the shape Spark accepts): matched impressions pair immediately;
    an unmatched impression emits with NULL click once the watermark
    passes its attribution window — the positive counterpart of the
    fail-fast test above."""
    imps = TestStream(spark, "imp_t timestamp, ad string, imp_id long")
    imps.add_elements([
        {"imp_t": "2024-01-01 00:00:05", "ad": "x", "imp_id": 1},
        {"imp_t": "2024-01-01 00:00:10", "ad": "y", "imp_id": 2}])

    clicks = TestStream(spark, "clk_t timestamp, ad string, clk_id long")
    clicks.add_elements([{"clk_t": "2024-01-01 00:00:30", "ad": "x",
                          "clk_id": 10}])
    # a far-future batch on BOTH sides pushes the watermark beyond
    # imp 2's attribution window so its NULL row can emit
    imps.add_elements([{"imp_t": "2024-01-01 01:00:00", "ad": "zz",
                        "imp_id": 99}])
    clicks.add_elements([{"clk_t": "2024-01-01 01:00:00", "ad": "zz",
                          "clk_id": 98}])

    left = imps.stream() | WithWatermark("imp_t", "10 seconds")
    right = clicks.stream() | WithWatermark("clk_t", "10 seconds")
    joined = (left
              | Join(right, how="left", condition=(
                  (F.col("imp_t") <= F.col("clk_t"))
                  & (F.col("clk_t") <= F.col("imp_t")
                     + F.expr("INTERVAL 1 MINUTE"))
                  & (left.df["ad"] == right.df["ad"])))
              | WriteStreamToMemory(output_mode="append"))
    got = {(r["imp_id"], r["clk_id"]) for r in joined.collect()}
    assert (1, 10) in got                 # matched pair
    assert (2, None) in got               # outer NULL after watermark
