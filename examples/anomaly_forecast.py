"""Round-15 anomaly + forecasting surface in one pipeline: per-TENANT
isolation forests (grouped fitting — a value normal for one event type
is anomalous for another), the extended/oblique variant for joint
(non-axis) structure, a robust-ensemble vote over the flags, and AR(2)
Yule-Walker forecasts of each user's value series with Pacf as the
order-identification step.

Usage: python examples/anomaly_forecast.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import beam_spark as beam
from beam_spark.ml.anomaly import RobustZScoreDetector, ZScoreDetector
from beam_spark.ml.iforest import IsolationForest
from beam_spark.operators.stats import ArForecast, Pacf
from beam_spark.pcollection import PCollection
from beam_spark.queries import table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = beam.get_spark("anomaly-forecast")
    spark.sparkContext.setLogLevel("ERROR")

    events = table(spark, sf_dir, "events").df.selectExpr(
        "event_id", "event_type", "user_id", "ts",
        "CAST(value AS DOUBLE) AS value",
        "CAST(user_id % 97 AS DOUBLE) AS user_bucket")

    # per-tenant forests: one model per event_type
    grouped = (PCollection(events)
               | IsolationForest(["value", "user_bucket"],
                                 id_col="event_id",
                                 group_col="event_type",
                                 trees=4, depth=4, sample_mod=2)).df
    print("-- per-event-type isolation forest: top anomalies --")
    (grouped.orderBy(F.desc("iforest_score"))
     .select("event_id", "event_type", "value", "iforest_score")
     .show(5))

    # oblique variant: cuts on random hyperplanes, catches joint
    # (off-axis) structure single-axis cuts blur
    oblique = (PCollection(events)
               | IsolationForest(["value", "user_bucket"],
                                 id_col="event_id",
                                 trees=4, depth=4, sample_mod=2,
                                 oblique=True)).df
    print("-- extended (oblique) isolation forest: top anomalies --")
    (oblique.orderBy(F.desc("iforest_score"))
     .select("event_id", "value", "iforest_score").show(5))

    # robust ensemble: median/MAD flags resist the masking that
    # inflated-stddev plain z-scores suffer
    z = (PCollection(events)
         | ZScoreDetector("value", group_cols=["event_type"])).df
    rz = (PCollection(events)
          | RobustZScoreDetector("value", group_cols=["event_type"])).df
    both = (z.select("event_id", F.col("is_anomaly").alias("z_flag"))
            .join(rz.select("event_id",
                            F.col("is_anomaly").alias("robust_flag")),
                  "event_id"))
    print("-- flag agreement (z vs robust) --")
    both.groupBy("z_flag", "robust_flag").count().show()

    # order identification, then AR(2) forecasts per user
    pacf = (PCollection(events)
            | Pacf("value", lags=3, keys="user_id",
                   order_by=["ts", "event_id"])).df
    print("-- PACF lags 1-3 (sample users) --")
    pacf.orderBy("user_id", "lag").show(6)

    fc = (PCollection(events)
          | ArForecast("value", keys="user_id",
                       order_by=["ts", "event_id"], p=2,
                       horizons=(1, 2, 3))).df
    print(f"-- AR(2) forecasts: {fc.count()} rows "
          f"({fc.select('user_id').distinct().count()} users x 3 h) --")
    fc.orderBy("user_id", "h").show(6)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
