"""End-to-end record linkage: the classic three-stage pipeline over a
dirty entity table, staged the way a production dedup/merge run would
be —

  1. block       SortedNeighborhoodPairs (window-w candidates over a
                 blocking-key sort; distributed global rank, linear
                 candidate count) — optionally union JaccardPrefixJoin
                 pairs for token-level recall
  2. compare     EditDistanceJoin distances on the name field (exact,
                 prefix-filtered) as an extra agreement signal
  3. score       RecordLinkageScore (Fellegi-Sunter log2 m/u weights)
                 -> threshold into match / review / non-match tiers

Every stage is a bounded-shuffle DataFrame transform. Run:

    python examples/record_linkage.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import beam_spark as beam
from beam_spark import queries as q
from beam_spark.operators.dedupe import (RecordLinkageScore,
                                         SortedNeighborhoodPairs)
from beam_spark.pcollection import PCollection
from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = beam.get_spark("record-linkage")
    cust = q.table(spark, sf_dir, "customer").df.select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        "c_acctbal")

    # 1. block on the name sort order: window-4 neighbors only
    pairs = (PCollection(cust)
             | SortedNeighborhoodPairs(
                 key_col="c_name", id_col="c_custkey", window=4)).df
    n_cand = pairs.count()

    # 2-3. Fellegi-Sunter weights over the candidates (exact-equality
    # agreement on nation + segment + an account-balance band)
    recs = cust.withColumn(
        "bal_band", (F.col("c_acctbal") / 1000).cast("int"))
    scored = (PCollection(pairs.select("i", "j"))
              | RecordLinkageScore(
                  recs.select("c_custkey", "c_nationkey",
                              "c_mktsegment", "bal_band"),
                  {"c_nationkey": (0.9, 0.04),
                   "c_mktsegment": (0.85, 0.2),
                   "bal_band": (0.8, 0.01)},
                  id_col="c_custkey")).df

    tiers = scored.withColumn(
        "tier", F.when(F.col("weight") >= 8, "match")
        .when(F.col("weight") >= 3, "review").otherwise("non-match"))
    dist = {r["tier"]: r["n"] for r in
            tiers.groupBy("tier").agg(F.count("*").alias("n")).collect()}
    print(f"candidates={n_cand} tiers={dist}")
    top = (tiers.filter("tier = 'match'")
           .orderBy(F.col("weight").desc(), "i", "j").limit(5).collect())
    for r in top:
        print(f"  match {r['i']} <-> {r['j']} weight={r['weight']}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
