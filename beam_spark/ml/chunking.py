"""RAG chunking (SURVEY.md §2.12).

Beam reference: ml/rag/chunking/base.py:36 (ChunkingTransformProvider),
langchain.py:33 (LangChain splitter wrapper). Here: a dependency-free
recursive splitter with the same contract — doc rows in, chunk rows out
(exploded), chunk ids stable.

Implementation is a pure Catalyst expression pipeline for the fixed-size
token window case (the hot path — no Python), with overlap support;
sentence-ish splitting falls back to a regex pre-pass. Output: one row
per chunk with (``chunk_id``, ``chunk_index``, ``chunk_text``,
``n_chunk_tokens``) plus the carried-through id column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform
from beam_spark.operators.text import tokens


class ChunkText(PTransform):
    """Split text into overlapping token-window chunks.

    chunk k covers tokens [k*stride, k*stride + chunk_tokens) where
    stride = chunk_tokens - overlap_tokens. JVM-side: tokenize once,
    enumerate chunk starts with sequence(), slice+join per chunk, explode.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 chunk_tokens: int = 64, overlap_tokens: int = 8, label=None):
        super().__init__(label)
        if overlap_tokens >= chunk_tokens:
            raise ValueError("overlap must be < chunk size")
        self.text_col, self.id_col = text_col, id_col
        self.chunk, self.overlap = chunk_tokens, overlap_tokens

    def expand(self, pcoll: PCollection) -> PCollection:
        stride = self.chunk - self.overlap
        n, idc = self.chunk, self.id_col
        # two-step projection: tokens materialized once (HOF-CSE trap,
        # see operators/text.py word_shingles_on)
        tok = pcoll.df.select(
            F.col(idc), tokens(self.text_col).alias("__w"))
        chunks = tok.select(
            idc,
            F.expr(f"""
              explode(
                transform(
                  sequence(0, greatest(cast(ceil((size(__w) - {n}) / {stride}) as int), 0)),
                  k -> struct(
                    k AS chunk_index,
                    array_join(slice(__w, k * {stride} + 1, {n}), ' ') AS chunk_text,
                    size(slice(__w, k * {stride} + 1, {n})) AS n_chunk_tokens)))
            """).alias("c"))
        out = chunks.select(
            idc,
            F.concat_ws("#", F.col(idc).cast("string"),
                        F.col("c.chunk_index").cast("string")).alias("chunk_id"),
            F.col("c.chunk_index").alias("chunk_index"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_chunk_tokens").alias("n_chunk_tokens"))
        return pcoll.with_df(out.filter(F.col("n_chunk_tokens") > 0))


class PackSequences(PTransform):
    """Sequence packing for training batches: assign documents to
    fixed-token-budget bins. Contiguous packing by BUDGET-ALIGNED
    CUMULATIVE INTERVALS: docs are taken in ``order_col`` order within
    each ``shard_col`` group and doc d lands in bin
    ``floor((cum_tokens_before_d) / budget)`` — bin k holds the docs
    whose preceding cumulative total falls in [k*budget, (k+1)*budget).
    A bin can overflow by at most one document, and (unlike greedy
    packing with a per-bin reset) an overflowing document's excess
    reduces the NEXT bin's effective capacity — the cumulative grid
    stays aligned, which is what makes the assignment a pure windowed
    expression (exact bin-packing is NP-hard and non-deterministic
    under parallelism; a greedy-reset variant would need a per-shard
    applyInPandas pass).

    Scale: one window over (shard, order) — shards parallelize the sort
    (one global window would serialize); bin ids are (shard, local_bin)
    pairs, exposed as ``pack_bin``. Deterministic: pure function of the
    input ordering.
    """

    def __init__(self, token_budget: int, n_tokens_col: str = "n_tokens",
                 order_col: str = "doc_id", shard_col=None, label=None):
        super().__init__(label)
        self.budget = int(token_budget)
        self.n_tokens_col, self.order_col = n_tokens_col, order_col
        self.shard_col = shard_col

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        w = (Window.partitionBy(self.shard_col) if self.shard_col
             else Window.partitionBy())
        w = (w.orderBy(self.order_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        cum = F.sum(self.n_tokens_col).over(w)
        out = (pcoll.df
               .withColumn("__cum_tokens", cum)
               .withColumn("pack_bin",
                           F.floor((F.col("__cum_tokens")
                                    - F.col(self.n_tokens_col))
                                   / F.lit(self.budget)))
               .drop("__cum_tokens"))
        return pcoll.with_df(out)
