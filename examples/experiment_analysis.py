"""Experiment / feature-engineering analysis on the events + orders
log — the statistician's loop a metrics platform runs per release,
composed entirely from single-pass distributed operators:

  1. scoring      RfmSegmentation — recency/frequency/monetary
                  quintiles per customer from the orders log
  2. features     LagFeatures — leakage-safe lag/rolling block per
                  supplier series; TargetEncode — smoothed LOO mean
                  encoding of a categorical
  3. tests        TwoSampleTTest (Welch) + MannWhitneyU (rank) per
                  slice, purchase vs view event values
  4. correction   MultipleTestCorrection — Benjamini-Hochberg across
                  the per-slice p-value family (normal approx of the
                  MWU z)
  5. diagnostics  ConcentrationReport (is one supplier dominating?),
                  KAnonymity (is the release frame re-identifiable?),
                  LinearFit (per-flag spend-vs-quantity trend)

Run:

    python examples/experiment_analysis.py [sf_dir]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beam_spark.ml.transforms import TargetEncode
from beam_spark.operators.analytics import RfmSegmentation
from beam_spark.operators.quality import (ConcentrationReport,
                                          KAnonymity, MannWhitneyU,
                                          MultipleTestCorrection,
                                          TwoSampleTTest)
from beam_spark.operators.stats import LagFeatures, LinearFit
from beam_spark.pcollection import PCollection
from beam_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("experiment-analysis", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "16"})
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    # 1. RFM segmentation of customers
    rfm = (PCollection(orders)
           | RfmSegmentation("o_custkey", "o_orderdate", "o_totalprice",
                             as_of="1999-01-01")).df
    print("== RFM segments ==")
    rfm.groupBy("segment").count().orderBy("segment").show()

    # 2. Feature block: per-supplier-hash series of per-order quantity
    series = (lineitem
              .selectExpr("l_suppkey % 20 AS k", "l_orderkey AS ord",
                          "CAST(l_quantity AS DECIMAL(9,2)) AS xd")
              .groupBy("k", "ord")
              .agg(F.sum("xd").cast("decimal(9,2)").alias("v")))
    feats = (PCollection(series)
             | LagFeatures("v", "ord", keys="k", lags=3, window=7,
                           cast_to="decimal(9,2)")).df
    print("== lag features (sample) ==")
    feats.orderBy("k", "ord").show(5)

    enc = (PCollection(lineitem)
           | TargetEncode("l_returnflag", "l_quantity", m=10.0,
                          loo=True, cast_to="decimal(9,2)")).df
    print("== LOO target encoding (distinct) ==")
    enc.select("l_returnflag", "l_returnflag_enc").distinct() \
        .orderBy("l_returnflag").show(10)

    # 3. Per-slice tests: purchase vs view value by user_id % 8 slice
    sliced = (events
              .where(F.col("event_type").isin(["purchase", "view"]))
              .withColumn("slice", F.col("user_id") % 8))
    welch = (PCollection(sliced)
             | TwoSampleTTest("value", "event_type", "purchase",
                              keys="slice",
                              cast_to="decimal(18,6)")).df
    mwu = (PCollection(sliced)
           | MannWhitneyU("value", "event_type", "purchase",
                          keys="slice")).df
    print("== Welch t per slice ==")
    welch.orderBy("slice").show()

    # 4. BH correction across the slice family (normal approx of z)
    phi = F.udf(lambda z: (None if z is None
                           else math.erfc(abs(z) / math.sqrt(2.0))),
                "double")
    pvals = mwu.select("slice", "z", phi("z").alias("p"))
    corrected = (PCollection(pvals)
                 | MultipleTestCorrection("p", methods=("bh", "holm"),
                                          tie_break="slice")).df
    print("== BH/Holm-corrected slices ==")
    corrected.orderBy("slice").show()

    # 5. Diagnostics
    unit = (lineitem
            .groupBy(F.col("l_returnflag").alias("flag"), "l_suppkey")
            .agg(F.sum(F.col("l_quantity").cast("decimal(9,2)"))
                 .alias("x")))
    conc = (PCollection(unit)
            | ConcentrationReport("x", keys="flag")).df
    print("== supplier concentration per flag ==")
    conc.orderBy("flag").show()

    kan = (PCollection(spark.read.parquet(
        os.path.join(sf_dir, "customer.parquet")))
        | KAnonymity(["c_nationkey", "c_mktsegment"],
                     sensitive="c_acctbal", k=10)).df
    print("== k-anonymity of the customer release frame ==")
    kan.show()

    fit = (PCollection(lineitem)
           | LinearFit("l_quantity", "l_extendedprice",
                       keys="l_returnflag")).df
    print("== spend-vs-quantity trend per flag ==")
    fit.orderBy("l_returnflag").show()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else os.environ.get("SPARK_GRAFT_SF_DIR",
                             "/root/testdata/sf0.01"))
