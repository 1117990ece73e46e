"""Timeseries continuous-aggregate walkthrough: one-shot multi-
granularity rollup (batch), then the SAME rollup maintained
incrementally by a stream — and a proof they agree.

Demonstrates (round-6 surface):
  * GroupByRollup — ROLLUP hierarchy in one Expand+HashAggregate pass
  * TimeRollup   — hour + day buckets from ONE scan (grouping sets
                   over integer epoch buckets)
  * ContinuousAggregate — micro-batch maintenance of the rollup table
                   (mergeable partials, dynamic overwrite of touched
                   buckets only)

Usage: python examples/timeseries_rollup.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beam_spark.operators.group import GroupByRollup, TimeRollup
from beam_spark.pcollection import PCollection
from beam_spark.session import get_spark
from beam_spark.streaming import TestStream
from beam_spark.streaming.core import ContinuousAggregate


def main(sf_dir="/root/testdata/sf0.001"):
    spark = get_spark("timeseries-rollup", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    # 1. classic rollup: per (event_type), per (event_type, user bucket),
    #    and grand total — one scan
    r = (PCollection(ev) | GroupByRollup(
        ["event_type"], {"n": "count(*)", "v": "round(sum(value), 2)"},
        kind="rollup")).df
    print("-- rollup (one Expand pass) --")
    r.orderBy("grouping_id", "event_type").show(10, truncate=False)

    # 2. hour + day buckets from one scan
    tr = (PCollection(ev) | TimeRollup(
        "ts", {"hour": 3600, "day": 86400},
        {"n": "count(*)", "v": "round(sum(value), 2)"},
        keys=["event_type"])).df
    print("-- time rollup: rows per granularity --")
    tr.groupBy("granularity").count().show()

    # 3. the same table maintained by a stream, two micro-batches,
    #    then proven equal to the batch answer
    half = ev.limit(ev.count() // 2).collect()
    rest_ids = {r_["event_id"] for r_ in half}
    other = [r_ for r_ in ev.collect() if r_["event_id"] not in rest_ids]
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in ev.schema.fields)
    ts = TestStream(spark, ddl)
    ts.add_elements([r_.asDict() for r_ in half])
    ts.add_elements([r_.asDict() for r_ in other])
    out = tempfile.mkdtemp(prefix="bs_ts_rollup_")
    (ts.stream() | ContinuousAggregate(
        out, "ts", {"hour": 3600, "day": 86400},
        {"n": "count", "v": "sum:value"}, keys=["event_type"]))

    got = (spark.read.parquet(out)
           .withColumn("v", F.round("v", 2))
           .select("event_type", "granularity", "bucket_start", "n", "v"))
    want = tr.select("event_type", "granularity", "bucket_start", "n", "v")
    diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    print(f"-- streaming-maintained table vs batch rollup: "
          f"{'EQUAL' if diff == 0 else f'{diff} rows differ'} --")
    assert diff == 0

    # 4. per-user state-space smoothing + structural breaks +
    #    relative-error latency-style quantiles (round-13 family)
    from beam_spark.operators.stats import (ChangepointBinSeg,
                                            DdSketchQuantiles,
                                            KalmanLocalLevel)

    kal = (PCollection(ev.where("user_id % 100 = 0"))
           | KalmanLocalLevel("value", keys="user_id",
                              order_by=["ts", "event_id"])).df
    print("== Kalman local-level (sample) ==")
    kal.orderBy("user_id", "event_id").show(5)

    cps = (PCollection(ev.where("user_id % 100 = 0"))
           | ChangepointBinSeg("value", keys="user_id",
                               order_by=["ts", "event_id"], k=2)).df
    print("== mean-shift changepoints ==")
    cps.orderBy("user_id", "cp_round").show(5)

    dd = (PCollection(ev)
          | DdSketchQuantiles("value", quantiles=(0.5, 0.95, 0.99),
                              keys="event_type")).df
    print("== DDSketch quantiles (1% relative error) ==")
    dd.orderBy("event_type", "q").show()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
