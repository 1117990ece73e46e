"""10x scaling check: replicate the sf0.1 tables to ~sf1 in /tmp (with
key offsets so join/agg cardinalities scale honestly, and per-copy
token interleaving so documents don't become cross-copy near-dups) and
measure the flagship operator families at both scales. Linear-ish
wall-clock growth at 10x data on fixed local[32] hardware is the
evidence that the plans scale with INPUT, not with some quadratic
blow-up — the per-family numbers land in SCALE.md.

Usage: python examples/scale_check.py [base_sf_dir] [out_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import beam_spark as beam

COPIES = 10


def build(spark, base, out):
    os.makedirs(out, exist_ok=True)
    specs = {
        "lineitem": ("l_orderkey", None),
        "orders": ("o_orderkey", None),
        "events": ("event_id", "user_id"),
        "documents": ("doc_id", None),
        "embeddings": ("vec_id", None),
    }
    for tbl, (pk, extra_key) in specs.items():
        path = os.path.join(out, f"{tbl}.parquet")
        if os.path.exists(path):
            continue
        df = spark.read.parquet(os.path.join(base, f"{tbl}.parquet"))
        n = df.count()
        parts = []
        for i in range(COPIES):
            c = df.withColumn(pk, F.col(pk) + F.lit(i * 10 * n))
            if extra_key:
                c = c.withColumn(extra_key, F.col(extra_key) + F.lit(i * 10_000))
            if tbl == "documents":
                # interleave a per-copy marker between tokens so copies
                # share (almost) no shingles: near-dup structure stays
                # per-copy instead of exploding into cross-copy cliques
                c = c.withColumn(
                    "text", F.regexp_replace("text", " ", f" c{i} "))
            parts.append(c)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite").parquet(path)
        print(f"built {tbl}: {n} -> {n * COPIES} rows", file=sys.stderr)


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s ({n} result rows)")
    return dt


def run_suite(spark, sf_dir):
    from beam_spark.operators.dedupe import ConnectedComponents, MinHashLSH, SimHash
    from beam_spark.operators.text import QualityScore
    from beam_spark.pcollection import PCollection

    res = {}
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    res["q1_agg"] = timed("  q1-style agg (lineitem)", lambda: (
        li.filter("l_shipdate <= '1998-09-02'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*"))
        .count()))

    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    res["join_agg"] = timed("  orders-lineitem join+agg", lambda: (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority").agg(F.sum("l_extendedprice"))
        .count()))

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    res["window_agg"] = timed("  hourly window agg (events)", lambda: (
        ev.groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour"),
                   "event_type")
        .agg(F.count("*"), F.sum("value")).count()))

    docs = PCollection(spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")))
    res["simhash"] = timed("  simhash fingerprints", lambda: (
        (docs | SimHash()).df.count()))

    pairs = (docs | MinHashLSH(bands=16, rows_per_band=8, threshold=0.6))
    pairs.df.persist()
    res["minhash_cc"] = timed("  minhash pairs + connected components",
                              lambda: (pairs | ConnectedComponents()).df.count())
    pairs.df.unpersist()

    res["quality"] = timed("  quality scores", lambda: (
        (docs | QualityScore()).df.count()))

    from beam_spark.operators.dedupe import ExactSubstrSpans
    from beam_spark.operators.retrieval import Bm25TopK
    from beam_spark.operators.text import GopherQualityFilter, NgramPerplexity

    res["exact_substr"] = timed("  exact-substr span coverage", lambda: (
        (docs | ExactSubstrSpans(k=8)).df.count()))
    res["gopher_ppl"] = timed("  gopher rules + bigram perplexity", lambda: (
        (docs | GopherQualityFilter() | NgramPerplexity()).df.count()))
    qdf = docs.df.limit(5).selectExpr("doc_id AS query_id", "text")
    res["bm25"] = timed("  bm25 top-10 (5 queries)", lambda: (
        (docs | Bm25TopK(qdf, k=10)).df.count()))

    from beam_spark.operators.similarity import LshCosineTopK, SemDeDup

    emb = PCollection(spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet"))
        .selectExpr("vec_id",
                    "transform(embedding, x -> CAST(x AS DOUBLE))"
                    " AS embedding"))
    # K ~ sqrt(N): the SemDeDup scaling rule, so cluster populations
    # stay constant as the corpus grows
    import math
    n_vec = emb.df.count()
    k_clusters = max(8, int(math.sqrt(n_vec)))
    res["semdedup"] = timed(
        f"  semdedup ({n_vec} vecs, K={k_clusters})", lambda: (
            (emb | SemDeDup(n_clusters=min(k_clusters, 64),
                            threshold=0.35)).df.count()))
    qs = emb.df.filter("vec_id < 10")
    res["ann_lsh"] = timed("  lsh ann top-5 (10 queries)", lambda: (
        (emb | LshCosineTopK(qs, k=5, n_planes=6)).df.count()))

    # round-6 families
    from beam_spark.operators.quality import (CurriculumBuckets,
                                              ProfileColumns)
    from beam_spark.operators.retrieval import PositionalPhraseMatch

    evp = PCollection(ev)
    res["curriculum"] = timed("  curriculum buckets (events)", lambda: (
        (evp | CurriculumBuckets("value", id_col="event_id",
                                 n_buckets=10)).df.count()))
    res["profile"] = timed("  profile columns (orders, approx)", lambda: (
        (PCollection(od) | ProfileColumns(
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderpriority"])).df.count()))
    phrases = docs.df.limit(5).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(F.split(F.lower(F.trim("text")),
                                         r"\s+"), 1, 3)).alias("phrase"))
    res["phrase_pos"] = timed("  positional phrase match (5 q)", lambda: (
        (docs | PositionalPhraseMatch(phrases)).df.count()))
    bq = docs.df.limit(5).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(F.split(F.lower(F.trim("text")),
                                         r"\s+"), 1, 4)).alias("text"))
    res["bm25_phrase"] = timed("  bm25 phrase mode (5 q)", lambda: (
        (docs | Bm25TopK(bq, k=10, mode="phrase")).df.count()))
    return res


def main(base="/root/testdata/sf0.1", out="/tmp/beam_spark_scale/sf1"):
    spark = beam.get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, base, out)

    print(f"--- {base} (1x) ---")
    r1 = run_suite(spark, base)
    print(f"--- {out} ({COPIES}x rows) ---")
    r10 = run_suite(spark, out)
    print("--- scaling factors (10x data) ---")
    for k in r1:
        print(f"  {k}: {r10[k] / max(r1[k], 1e-9):.1f}x wall-clock")


if __name__ == "__main__":
    main(*sys.argv[1:])
