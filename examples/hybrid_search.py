"""Hybrid search demo: BM25 lexical ranking + exact embedding-cosine
ranking fused with reciprocal ranks, plus a phrase-containment filter —
the full retrieval surface on the TESTDATA corpus.

    python examples/hybrid_search.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import beam_spark as beam
from beam_spark import queries as q
from beam_spark.operators.retrieval import Bm25TopK, PhraseMatch, RrfFuse
from beam_spark.operators.similarity import BruteForceCosineTopK
from beam_spark.pcollection import PCollection
from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = beam.get_spark("hybrid-search")
    docs = q.table(spark, sf_dir, "documents").df
    emb = q.table(spark, sf_dir, "embeddings").df.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        .alias("embedding"))

    queries_df = docs.filter("doc_id < 3").selectExpr(
        "doc_id AS query_id", "text")
    bm25 = (PCollection(docs) | Bm25TopK(queries_df, k=10)).df
    ann = (PCollection(emb)
           | BruteForceCosineTopK(emb.filter("vec_id < 3"), k=10,
                                  exclude_self=False)
           ).df.selectExpr("query_id", "nbr_id AS doc_id", "rank")
    fused = (PCollection(docs) | RrfFuse(bm25, ann, k=5)).df
    # lean the fusion toward the vector leg (weighted RRF, round 6)
    fused_w = (PCollection(docs)
               | RrfFuse(bm25, ann, k=5, weights=[1.0, 2.0])).df

    phrases = docs.filter("doc_id < 3").select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(F.split(F.lower(F.trim("text")), r"\s+"),
                                 1, 2)).alias("phrase"))
    phrase_hits = (PCollection(docs) | PhraseMatch(phrases)).df

    print("hybrid top-5 per query (BM25 + cosine, RRF k0=60):")
    fused.orderBy("query_id", "rank").show(15)
    print("vector-leaning fusion (weights [1.0, 2.0]):")
    fused_w.orderBy("query_id", "rank").show(15)

    # conjunctive + boosted lexical retrieval (round 6)
    boosted = queries_df.withColumn(
        "boost", F.create_map(
            F.element_at(F.split(F.lower(F.trim("text")), r"\s+"), 1),
            F.lit(2.0)))
    conj = (PCollection(docs)
            | Bm25TopK(boosted, k=5, mode="and")).df
    print("conjunctive BM25 with first-term boost 2.0:")
    conj.orderBy("query_id", "rank").show(15)
    print(f"phrase containment hits: {phrase_hits.count()}")
    phrase_hits.orderBy("query_id", "doc_id").show(8)

    # round 7: multi-field BM25F (title weighted 3x) and
    # product-quantization ANN (byte codes + ADC scan + exact rerank)
    from beam_spark.operators.retrieval import Bm25fTopK
    from beam_spark.operators.similarity import PqCosineTopK

    split = F.split(F.lower(F.trim("text")), r"\s+")
    fielded = docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(split, 1, 5)).alias("title"),
        F.concat_ws(" ", F.slice(
            split, 6, F.greatest(F.size(split) - 5, F.lit(0))))
        .alias("body"))
    bm25f = (PCollection(fielded) | Bm25fTopK(
        queries_df, {"title": (3.0, 0.5), "body": (1.0, 0.75)},
        k=5)).df
    print("BM25F (title weight 3.0) top-5:")
    bm25f.orderBy("query_id", "rank").show(15)

    pq = (PCollection(emb) | PqCosineTopK(
        emb.filter("vec_id < 3"), k=5, m=8, ks=16,
        rerank_factor=4)).df
    print("PQ ANN (m=8 byte codes, exact rerank) top-5:")
    pq.orderBy("query_id", "rank").show(15)


if __name__ == "__main__":
    main(*sys.argv[1:])
