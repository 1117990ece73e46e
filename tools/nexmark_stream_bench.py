#!/usr/bin/env python
"""TRUE STREAMING Nexmark-analog throughput (VERDICT r14 #5).

BASELINE.md's Nexmark rows are *streaming* DirectRunner numbers (SMOKE,
100k events); BENCH_r*.json compares them against our *batch* analogs —
documented, but one-sided. This harness runs Q5 (hot users), Q7
(highest bid per window) and Q11 (user sessions) as genuine Structured
Streaming queries over the sf0.1 events table (100k events — the same
scale as the baseline's SMOKE config) replayed as a file-source stream
in ``--batches`` micro-batches, and reports events/s next to the
baseline's events/s.

Query shapes (native Structured Streaming, watermark + append mode —
the AfterWatermark trigger analog):
- q5_hot_users: sliding 1h/15m windowed count per user. The final
  top-3-per-window rank runs on the COLLECTED per-(window,user) counts
  (~window x active-user rows, aggregate-sized): a per-window Top
  combiner's streaming state is exactly those aggregates, and Spark's
  append-mode rank-over-stream would need a second stateful stage for
  rows the watermark has already closed. Ingest + windowed count is the
  throughput-bound part and is fully streaming.
- q7_highest_bid: fixed 1h window max_by((value, event_id)) — one
  stateful aggregate, fully streaming.
- q11_user_sessions: session_window(ts, 30 min) per user count+sum —
  Spark's merging session windows, fully streaming.

A far-future tail row advances the watermark so every window closes
(same trick as the CEP harness); emitted row counts are printed so a
silent empty stream can't pass as fast.

Usage: python tools/nexmark_stream_bench.py [--batches 4] [--runs 3]
           [--sf-dir /root/testdata/sf0.1]
Prints one JSON line {"queries": {name: {"sec": s, "events_per_sec": e,
"rows": n}}, "events": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_stream_dir(sf_dir: str, tmpdir: str, batches: int) -> int:
    """Split the events table (ts-sorted — replay order) into one
    parquet file per micro-batch + a watermark-advancing tail."""
    import pandas as pd

    pdf = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    pdf = pdf.sort_values("ts", kind="stable", ignore_index=True)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    n = len(pdf)
    per = (n + batches - 1) // batches
    for b in range(batches):
        chunk = pdf.iloc[b * per:(b + 1) * per]
        if len(chunk):
            chunk.to_parquet(
                os.path.join(tmpdir, f"batch_{b:03d}.parquet"), index=False)
    tail = pdf.iloc[-1:].copy()
    tail["ts"] = (tail["ts"] + pd.Timedelta(days=30)).astype("datetime64[us]")
    tail.to_parquet(os.path.join(tmpdir, f"batch_{batches:03d}.parquet"),
                    index=False)
    return n


def _source(spark, tmpdir: str):
    from pyspark.sql import functions as F

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(tmpdir)
          .withWatermark("ts", "10 seconds"))
    return df, F


def q5_hot_users(spark, tmpdir: str) -> int:
    """Sliding 1h/15m count per (window, user); top-3 per window ranked
    on the collected aggregate frame."""
    from beam_spark.streaming import WriteStreamToMemory
    from beam_spark.pcollection import PCollection

    df, F = _source(spark, tmpdir)
    agg = (df.groupBy(F.window("ts", "1 hour", "15 minutes"), "user_id")
           .agg(F.count(F.lit(1)).alias("n")))
    counts = (PCollection(agg, is_bounded=False)
              | WriteStreamToMemory(output_mode="append")).collect()
    import heapq
    from collections import defaultdict
    top = defaultdict(list)
    for r in counts:
        heapq.heappush(top[r["window"]["start"]],
                       (r["n"], -r["user_id"]))
        if len(top[r["window"]["start"]]) > 3:
            heapq.heappop(top[r["window"]["start"]])
    return sum(len(v) for v in top.values())


def q7_highest_bid(spark, tmpdir: str) -> int:
    from beam_spark.streaming import WriteStreamToMemory
    from beam_spark.pcollection import PCollection

    df, F = _source(spark, tmpdir)
    agg = (df.groupBy(F.window("ts", "1 hour"))
           .agg(F.max_by(F.struct("event_id", "user_id", "value"),
                         F.struct(F.col("value"), F.col("event_id")))
                .alias("m")))
    rows = (PCollection(agg, is_bounded=False)
            | WriteStreamToMemory(output_mode="append")).collect()
    return len(rows)


def q11_user_sessions(spark, tmpdir: str) -> int:
    from beam_spark.streaming import WriteStreamToMemory
    from beam_spark.pcollection import PCollection

    df, F = _source(spark, tmpdir)
    agg = (df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total")))
    rows = (PCollection(agg, is_bounded=False)
            | WriteStreamToMemory(output_mode="append")).collect()
    return len(rows)


QUERIES = {"q5_hot_users": q5_hot_users,
           "q7_highest_bid": q7_highest_bid,
           "q11_user_sessions": q11_user_sessions}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from beam_spark.session import get_spark

    spark = get_spark(
        "nexmark-stream-bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")

    tmpdir = tempfile.mkdtemp(prefix="bs_nexmark_stream_")
    try:
        n_events = build_stream_dir(args.sf_dir, tmpdir, args.batches)
        out = {}
        for name, fn in QUERIES.items():
            fn(spark, tmpdir)  # untimed warmup
            times, rows = [], 0
            for _ in range(args.runs):
                t0 = time.perf_counter()
                rows = fn(spark, tmpdir)
                times.append(time.perf_counter() - t0)
                print(f"{name}: {times[-1]:.2f}s ({rows} rows)",
                      file=sys.stderr)
            med = statistics.median(times)
            out[name] = {"sec": round(med, 2),
                         "events_per_sec": round(n_events / med, 0),
                         "rows": rows}
        print(json.dumps({"events": n_events, "batches": args.batches,
                          "queries": out}))
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
