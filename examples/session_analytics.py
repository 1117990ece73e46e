"""Event-time session analytics over the TESTDATA events table:
session windows, per-session aggregates, top sessions."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import beam_spark as beam
from beam_spark import queries as q
from pyspark.sql import functions as F


def main(sf_dir="/root/testdata/sf0.001"):
    spark = beam.get_spark("sessions")
    sessions = (
        q.table(spark, sf_dir, "events")
        | beam.WindowInto(beam.Sessions(1800), ts_col="ts")
        | beam.CombinePerKey("user_id", n="count(*)", total="sum(value)"))
    top = (sessions
           | beam.Select("user_id", "n", "total",
                         session_start="__window.start")
           | beam.TopK(10, "n desc", "user_id"))
    top.show(truncate=False)


if __name__ == "__main__":
    main()
