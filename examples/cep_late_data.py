"""Round-4 surface in one pipeline: Avro source -> MATCH_RECOGNIZE
(alternation + bounded quantifier over event streams) -> late-data tee
with a retracting windowed aggregation.

Batch leg: events parquet -> Avro shards (pure-python OCF codec) ->
read back -> CEP pattern V{2,} (C|P) per user.
Streaming leg: scripted TestStream -> with_late_output tee feeding a
per-batch windowed count while late rows surface tagged; then the same
stream through the trigger emulator in ACCUMULATING_AND_RETRACTING mode.

Usage: python examples/cep_late_data.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import beam_spark as beam
from beam_spark.operators.cep import MatchRecognize, vectorized
from beam_spark.pcollection import PCollection, Pipeline
from beam_spark.queries import table
from beam_spark.sources.avro import ReadFromAvroFile, WriteToAvroFile
from beam_spark.streaming import (AfterWatermarkEarlyCount, TestStream,
                                  WithWatermark, WriteStreamToMemory,
                                  with_late_output)


def batch_leg(spark, sf_dir):
    events = table(spark, sf_dir, "events").df.select(
        "user_id", "event_id", "event_type", "value",
        F.col("ts").cast("string").alias("ts_s"))

    avro_dir = os.path.join(tempfile.gettempdir(), "bs_example_avro")
    (PCollection(events.repartition(4))
     | WriteToAvroFile(avro_dir)).df.collect()
    back = (Pipeline(spark) | ReadFromAvroFile(avro_dir + "/*.avro"))

    matches = back | MatchRecognize(
        partition_by="user_id", order_by=["ts_s", "event_id"],
        pattern=[("V", (2, None)), (("C", "P"), "1")],
        defines={"V": vectorized(lambda pdf: pdf["event_type"] == "view"),
                 "C": vectorized(lambda pdf: pdf["event_type"] == "click"),
                 "P": vectorized(lambda pdf: pdf["event_type"] == "purchase")},
        measures={"sym": lambda m: m[-1][0],
                  "n_views": lambda m: sum(1 for s, _ in m if s == "V"),
                  "end_value": lambda m: m[-1][1]["value"]},
        output_schema="user_id long, sym string, n_views long, end_value double")
    out = matches.df
    print(f"[batch] avro->CEP: {out.count()} matches of V{{2,}} (C|P)")
    out.groupBy("sym").agg(F.count("*").alias("n"),
                           F.avg("n_views").alias("avg_views")).show()


def streaming_leg(spark):
    ts = TestStream(spark, "t timestamp, k string, v long")
    ts.add_elements([{"t": "2024-01-01 00:00:05", "k": "a", "v": 1},
                     {"t": "2024-01-01 00:00:20", "k": "a", "v": 2}])
    ts.add_elements([{"t": "2024-01-01 00:05:00", "k": "a", "v": 50}])
    ts.add_elements([{"t": "2024-01-01 00:00:40", "k": "a", "v": 9}])  # late

    late_rows = []
    with_late_output(
        ts.stream(), "t", "30 seconds",
        on_time_fn=lambda df, bid: None,
        late_fn=lambda df, bid: late_rows.extend(df.collect()))
    print(f"[stream] late tee surfaced: "
          f"{[(r['v'], r['pane_timing']) for r in late_rows]}")

    ts2 = TestStream(spark, "t timestamp, k string, v long")
    ts2.add_elements([{"t": "2024-01-01 00:00:05", "k": "a", "v": 1},
                      {"t": "2024-01-01 00:00:10", "k": "a", "v": 2},
                      {"t": "2024-01-01 00:00:20", "k": "a", "v": 4}])
    ts2.add_elements([{"t": "2024-01-01 00:05:00", "k": "a", "v": 100}])
    panes = (ts2.stream()
             | WithWatermark("t", "10 seconds")
             | AfterWatermarkEarlyCount(
                 "k", 60, "v", early_count=2, ts_col="t",
                 accumulation_mode="accumulating_and_retracting")
             | WriteStreamToMemory(output_mode="append"))
    rows = [r for r in panes.collect()
            if r["window_start"].isoformat() == "2024-01-01T00:00:00"]
    print("[stream] retracting panes:",
          sorted((r["pane_timing"], r["pane_count"], r["pane_sum"])
                 for r in rows),
          "| downstream SUM =", sum(r["pane_sum"] for r in rows))


def main(sf_dir="/root/testdata/sf0.001"):
    spark = beam.get_spark("cep-late-data-example")
    spark.sparkContext.setLogLevel("ERROR")
    batch_leg(spark, sf_dir)
    streaming_leg(spark)


if __name__ == "__main__":
    main(*sys.argv[1:])
