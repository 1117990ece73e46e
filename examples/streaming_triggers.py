"""Composite-trigger streaming example: windowed sums with early panes
from AfterEach(AfterCount(1), AfterCount(2)), an ON_TIME pane at the
watermark, and late panes under allowed lateness."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import beam_spark as beam
from beam_spark.streaming import (AfterCount, AfterEach,
                                  AfterWatermarkEarlyCount, TestStream,
                                  WithWatermark, WriteStreamToMemory)


def main():
    spark = beam.get_spark("streaming-triggers")
    ts = TestStream(spark, "t timestamp, k string, v long")
    ts.add_elements([{"t": f"2024-01-01 00:00:{s:02d}", "k": "a", "v": s}
                     for s in (5, 10, 15, 20)])
    ts.add_elements([{"t": "2024-01-01 00:05:00", "k": "a", "v": 0}])

    panes = (ts.stream()
             | WithWatermark("t", "10 seconds")
             | AfterWatermarkEarlyCount(
                 "k", 60, "v", ts_col="t",
                 early_trigger=AfterEach(AfterCount(1), AfterCount(2)))
             | WriteStreamToMemory(output_mode="append"))
    for r in sorted(panes.collect(),
                    key=lambda r: (r["window_start"], r["pane_index"])):
        print(f"{r['window_start']}  pane={r['pane_index']} "
              f"{r['pane_timing']:8s} count={r['pane_count']} "
              f"sum={r['pane_sum']}")


if __name__ == "__main__":
    main()
