"""Data-quality drift monitoring walkthrough: the four drift lenses
on the TESTDATA events/orders tables —

  * DistributionDrift — PSI per column vs a reference frame
  * KsDrift           — two-sample Kolmogorov-Smirnov D + p-value
  * CusumDetect       — per-key sequential mean-shift alarms
  * Histogram         — fixed-width bin counts for the dashboards

Usage: python examples/drift_monitor.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import beam_spark as beam
from beam_spark import queries as q
from beam_spark.operators.quality import (DistributionDrift, Histogram,
                                          KsDrift)
from beam_spark.operators.stats import CusumDetect
from beam_spark.pcollection import PCollection


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = beam.get_spark("drift-monitor")
    orders = q.table(spark, sf_dir, "orders").df
    events = q.table(spark, sf_dir, "events").df

    # reference = even order keys, current = odd (stand-ins for
    # yesterday/today partitions)
    ref = orders.filter("o_orderkey % 2 = 0")
    cur = orders.filter("o_orderkey % 2 = 1")

    psi = (PCollection(cur)
           | DistributionDrift(ref, ["o_totalprice"])).df
    print("-- PSI drift (same distribution: expect stable) --")
    psi.show()

    ks = (PCollection(cur) | KsDrift(ref, "o_totalprice")).df
    print("-- KS test (expect small D, large p) --")
    ks.show()

    # a synthetic upward shift: KS should light up
    shifted = cur.withColumn("o_totalprice",
                             F.col("o_totalprice") * 1.25)
    ks2 = (PCollection(shifted) | KsDrift(ref, "o_totalprice")).df
    print("-- KS test after a 25% shift (expect p ~ 0) --")
    ks2.show()

    cs = (PCollection(events) | CusumDetect(
        "value", target=50.0, slack=5.0, threshold=200.0,
        keys="user_id", order_by=["ts", "event_id"])).df
    n_alarm = cs.filter("alarm").count()
    print(f"-- CUSUM: {n_alarm} alarmed rows over "
          f"{cs.count()} events --")

    hist = (PCollection(orders) | Histogram("o_totalprice",
                                            n_bins=10)).df
    print("-- order-total histogram --")
    hist.orderBy("bin").show(12)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
