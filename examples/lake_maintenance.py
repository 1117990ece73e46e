"""Lake-table maintenance on plain parquet: the upsert / layout /
reconcile loop a warehouse team runs daily, without a transactional
table format —

  1. upsert       MergeInto (update + insert + by-source mirror
                  delete, Delta MERGE row semantics on frames)
  2. layout       write_zordered with rank-scaled (equi-depth)
                  clustering keys over DOUBLE columns — every
                  participating column gets file-level min/max
                  locality for scan pruning
  3. reconcile    ReconcileTables (row- and column-level diff report
                  between the pre- and post-merge versions)
  4. stream       write_stream_upsert: the same merge maintained
                  continuously from a changelog stream with
                  replay-idempotent generation snapshots

Run:

    python examples/lake_maintenance.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beam_spark.operators.scd import (MergeInto, ReconcileTables,
                                      write_zordered)
from beam_spark.pcollection import PCollection
from beam_spark.session import get_spark
from beam_spark.streaming.core import (TestStream, read_upsert_snapshot,
                                       write_stream_upsert)


def main(sf_dir: str) -> None:
    spark = get_spark("lake-maintenance", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bs_lake_example_")

    # -- 1. batch MERGE: a change set updates half the customers and
    #       inserts new keys; absent keys mirror-delete
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    changes = cust.filter("c_custkey % 2 = 0").selectExpr(
        "c_custkey", "c_name", "c_nationkey",
        "c_acctbal + 50 AS c_acctbal", "c_mktsegment")
    merged = (PCollection(cust) | MergeInto(
        changes, keys="c_custkey",
        match_condition="s.c_acctbal > t.c_acctbal")).df
    print("post-merge rows:", merged.count())

    # -- 2. z-ordered layout write on DOUBLE columns (rank scaling)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    layout = os.path.join(work, "lineitem_zordered")
    write_zordered(li, layout, ["l_extendedprice", "l_discount"],
                   bits=8, partitions=8, scale="rank")
    span = (spark.read.parquet(layout + "/part-*.parquet")
            .agg(F.min("l_extendedprice"), F.max("l_extendedprice"))
            .first())
    print("z-ordered files written; sample span:", span)

    # -- 3. reconcile: what did the merge actually change?
    report = (PCollection(cust) | ReconcileTables(
        merged, keys="c_custkey")).df
    for r in report.collect():
        print(f"  {r['kind']:7s} {r['name']:12s} {r['n']}")

    # -- 4. continuous upsert from a changelog stream
    snap_path = os.path.join(work, "orders_snapshot")
    ts = TestStream(spark, "ts timestamp, k long, v double, op string")
    ts.add_elements([{"ts": "2024-01-01 00:00:01", "k": 1, "v": 10.0,
                      "op": "U"},
                     {"ts": "2024-01-01 00:00:02", "k": 2, "v": 20.0,
                      "op": "U"}])
    ts.add_elements([{"ts": "2024-01-01 00:01:00", "k": 2, "v": 0.0,
                      "op": "D"},
                     {"ts": "2024-01-01 00:01:01", "k": 3, "v": 30.0,
                      "op": "U"}])
    write_stream_upsert(ts.stream(), snap_path, keys="k",
                        order_by="ts", delete_where="op = 'D'")
    snap = read_upsert_snapshot(spark, snap_path)
    print("streamed snapshot:", sorted(
        (r["k"], r["v"]) for r in snap.collect()))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
