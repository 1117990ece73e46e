"""Train-inside-Spark demo: the two aggregation-only trainable models
plus the existing eval/calibration operators, end-to-end —

  1. NaiveBayesClassify  fit multinomial NB on half the documents
                         (label = lang), route the other half
  2. LogisticFit         3-feature quality head trained by full-batch
                         GD (T scans, (d+1)-cell reduce per scan)
  3. eval                BinaryClassifierMetrics on the logistic
                         scores (midrank AUC, logloss, Brier)
  4. calibrate           IsotonicCalibration (PAVA) over the same
                         scores — Platt scaling would be one more
                         LogisticFit(["score"], label)

Run:

    python examples/ml_training.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beam_spark.ml.logistic import LogisticFit
from beam_spark.ml.naive_bayes import NaiveBayesClassify
from beam_spark.operators.quality import (BinaryClassifierMetrics,
                                          IsotonicCalibration)
from beam_spark.pcollection import PCollection
from beam_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("ml-training", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "16"})
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    # 1. Naive Bayes language routing
    train, test = docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")
    routed = (PCollection(test)
              | NaiveBayesClassify(train, "lang", "doc_id")).df
    truth = test.select("doc_id", "lang")
    acc = (routed.join(truth, "doc_id")
           .agg(F.avg((F.col("predicted") == F.col("lang"))
                      .cast("double")).alias("accuracy")))
    print("== NB language routing accuracy ==")
    acc.show()

    # 2. Logistic head: P(returnflag = 'A') from scaled features
    feats = lineitem.selectExpr(
        "l_returnflag = 'A' AS y",
        "CAST(l_quantity AS DOUBLE) / 64.0 AS x1",
        "CAST(l_discount AS DOUBLE) AS x2",
        "CAST(l_tax AS DOUBLE) AS x3")
    fit = LogisticFit(["x1", "x2", "x3"], "y", iterations=10, lr=0.5)
    weights = (PCollection(feats) | fit).df
    print("== logistic weights ==")
    weights.show()

    # 3. Evaluate the scores
    scored = feats.withColumn("score", fit.decision_column()).select(
        F.col("y").cast("int").alias("label_int"), "score")
    metrics = (PCollection(scored)
               | BinaryClassifierMetrics("score", "label_int")).df
    print("== classifier metrics ==")
    metrics.show()

    # 4. Isotonic calibration of the same scores
    iso = (PCollection(scored)
           | IsotonicCalibration("score", "label_int")).df
    print("== isotonic calibration (first rows) ==")
    iso.orderBy("score").show(8)

    # 5. Regression head: gradient-boosted stumps predicting scaled
    #    price from the same quantized features (3 rounds, lr 0.5)
    from beam_spark.ml.gbm import GradientBoostedStumps

    reg = lineitem.selectExpr(
        "CAST(l_extendedprice AS DOUBLE) / 65536 AS y",
        "CAST(l_quantity AS DOUBLE) AS x1",
        "CAST(l_discount AS DOUBLE) AS x2",
        "CAST(l_tax AS DOUBLE) AS x3")
    gbm = GradientBoostedStumps(["x1", "x2", "x3"], "y",
                                rounds=3, lr=0.5)
    model = (PCollection(reg) | gbm).df
    print("== boosted-stump model ==")
    model.show(truncate=False)
    sse = reg.select(
        F.avg(F.pow(F.col("y") - gbm.prediction_column(), 2))
        .alias("mse"))
    print("== in-sample MSE ==")
    sse.show()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else os.environ.get("SPARK_GRAFT_SF_DIR",
                             "/root/testdata/sf0.01"))
