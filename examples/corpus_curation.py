"""End-to-end corpus curation: the full pretraining-data pipeline this
engine supports, staged the way a production run would be —

  1. normalize       NormalizeText (canonical text for dedup)
  2. quality         GopherQualityFilter + RepetitionStats + NgramPerplexity
  3. dedup           FuzzyDedupKeep (MinHash+LSH -> components -> survivor)
                     + ExactSubstrSpans (duplicated-span coverage signal)
  4. decontaminate   Decontaminate vs a benchmark n-gram set
  5. mix & split     TemperatureSample (domain rebalance) + SplitByHash
  6. pack            PackSequences (token-budget training bins)

Every stage is a zero-or-bounded-shuffle DataFrame transform; the whole
pipeline is one lazy plan per stage group. Run:

    python examples/corpus_curation.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import beam_spark as beam
from beam_spark import queries as q
from beam_spark.pcollection import PCollection
from beam_spark.operators.combiners import SplitByHash, TemperatureSample
from beam_spark.operators.dedupe import (Decontaminate, ExactSubstrSpans,
                                         FuzzyDedupKeep)
from beam_spark.operators.text import (GopherQualityFilter, NgramPerplexity,
                                       NormalizeText, RepetitionStats,
                                       token_count_whitespace)
from beam_spark.ml.chunking import PackSequences
from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = beam.get_spark("corpus-curation")
    docs = q.table(spark, sf_dir, "documents")
    n0 = docs.df.count()

    # 1-2. normalize + quality signals (all zero-shuffle projections,
    # fused into one scan by Catalyst)
    scored = (docs
              | NormalizeText(strip_punct=False)
              | GopherQualityFilter(min_words=20, min_stopword_hits=1)
              | RepetitionStats())
    quality = (PCollection(scored.df.withColumnRenamed("keep", "gopher_keep"))
               | NgramPerplexity())
    kept = quality.df.filter(
        "gopher_keep = 1 AND dup_line_frac < 0.5"
        " AND (ppl IS NULL OR ppl < 40)")
    kept.persist()
    n_quality = kept.count()

    # 3. fuzzy dedup verdict + duplicated-span coverage
    verdict = (PCollection(kept) | FuzzyDedupKeep()).df
    spans = (PCollection(kept) | ExactSubstrSpans(k=8)).df
    deduped = (kept.join(verdict.select("doc_id", "keep"), "doc_id")
               .join(spans.select("doc_id", "dup_frac"), "doc_id")
               .filter("keep = 1 AND dup_frac < 0.9"))
    deduped.persist()
    n_dedup = deduped.count()

    # 4. decontaminate against a benchmark slice (doc_id < 20 here)
    # (threshold 5 shared 3-grams: the synthetic vocabulary is tiny, so
    # single-shingle collisions are noise, not contamination)
    bench = docs.df.filter("doc_id < 20").select("doc_id", "text")
    decon = (PCollection(deduped) | Decontaminate(bench)).df
    clean = deduped.join(
        decon.filter("n_contaminated < 5").select("doc_id"), "doc_id")
    n_clean = clean.count()

    # 5. temperature mixing over sources + deterministic split
    mixed = (PCollection(clean)
             | TemperatureSample("source", id_col="doc_id", alpha=0.5,
                                 target_frac=0.9)
             | SplitByHash({"train": 0.9, "val": 0.05, "test": 0.05},
                           id_col="doc_id"))

    # 6. pack the train split into 2048-token bins per source shard
    train = (mixed.df.filter("split = 'train'")
             .withColumn("n_tok", token_count_whitespace("text")))
    packed = (PCollection(train)
              | PackSequences(2048, n_tokens_col="n_tok",
                              order_col="doc_id", shard_col="source")).df
    bins = packed.groupBy("source", "pack_bin").agg(
        F.count("*").alias("docs"), F.sum("n_tok").alias("tokens"))

    print(f"corpus:        {n0}")
    print(f"after quality: {n_quality}")
    print(f"after dedup:   {n_dedup}")
    print(f"after decon:   {n_clean}")
    splits = {r["split"]: r["n"] for r in
              mixed.df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(f"splits:        {splits}")
    print(f"train bins:    {bins.count()}")
    bins.orderBy("source", "pack_bin").show(8)
    kept.unpersist()
    deduped.unpersist()


if __name__ == "__main__":
    main(*sys.argv[1:])
