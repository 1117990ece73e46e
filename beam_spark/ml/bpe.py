"""Byte-pair-encoding tokenizer: corpus-trained merges, distributed
apply — the real-tokenizer upgrade over the BPE-ish regex counter in
operators/text.py (which remains the zero-Python fast path for budget
estimates).

Architecture (the honest 100 TB shape): the WORD-FREQUENCY table is
computed distributed (tokenize + explode + groupBy) and only its top
``sample_words`` rows — a bounded artifact, like IVF centroids — are
collected to learn merges driver-side with the classic BPE algorithm
(Sennrich et al. 2016). Production tokenizers train on samples for the
same reason. The learned merge list is a small broadcastable artifact;
encoding runs fully distributed in Arrow batches with a per-executor
word cache.

Determinism: merge selection breaks frequency ties lexicographically,
so the same corpus always yields the same merges.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform
from beam_spark.operators.text import tokens

END = "</w>"


def train_bpe(df, text_col: str = "text", n_merges: int = 200,
              sample_words: int = 50_000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a DataFrame's text column.
    Returns the ordered merge list (the tokenizer artifact)."""
    rows = (df.select(F.explode(tokens(text_col)).alias("w"))
            .where(F.col("w") != "")
            .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("w"))
            .limit(sample_words).collect())
    vocab = {tuple(r["w"]) + (END,): r["n"] for r in rows}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, n in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # highest count; ties broken by the LEXICOGRAPHICALLY SMALLEST
        # pair, so training is a pure function of the corpus
        top = max(pairs.values())
        best_pair = min(p for p, n in pairs.items() if n == top)
        if top < 2:
            break
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_vocab = {}
        for word, n in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict) -> list[str]:
    """Apply merges (by rank) to one word — the standard greedy
    lowest-rank-first merge loop."""
    parts = list(word) + [END]
    while len(parts) > 1:
        best_rank, best_i = None, None
        for i, (a, b) in enumerate(zip(parts, parts[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def save_merges(merges, path: str) -> None:
    with open(path, "w") as f:
        json.dump(merges, f)


def load_merges(path: str) -> list[tuple[str, str]]:
    with open(path) as f:
        return [tuple(m) for m in json.load(f)]


class BpeEncode(PTransform):
    """Distributed BPE encoding: appends ``bpe_tokens`` (array<string>)
    and ``n_bpe_tokens`` using a trained merge list. Arrow-batched with
    a per-executor word->pieces cache (natural-language word frequency
    is Zipfian, so the cache hit rate is high)."""

    def __init__(self, merges, text_col: str = "text", label=None):
        super().__init__(label)
        self.merges = [tuple(m) for m in merges]
        self.text_col = text_col

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd

        ranks = {m: i for i, m in enumerate(self.merges)}
        text_col = self.text_col
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in pcoll.df.schema.fields
        ) + ", bpe_tokens array<string>, n_bpe_tokens int"

        def gen(batches):
            # word->pieces cache, CAPPED: natural-language frequency is
            # Zipfian so the head dominates hits, but a 100 TB corpus's
            # long tail of junk tokens would grow an unbounded dict to
            # executor OOM — clear on cap, the head re-enters quickly
            cache: dict = {}
            cap = 1_000_000

            def enc(text):
                # null text encodes to [] — str(None) would otherwise
                # tokenize as the literal word 'none' (NaN as 'nan')
                if text is None or (isinstance(text, float)
                                    and pd.isna(text)):
                    return []
                out = []
                for w in str(text).lower().split():
                    got = cache.get(w)
                    if got is None:
                        got = encode_word(w, ranks)
                        if len(cache) >= cap:
                            cache.clear()
                        cache[w] = got
                    out.extend(got)
                return out

            for pdf in batches:
                toks = [enc(t) for t in pdf[text_col]]
                pdf = pdf.copy()
                pdf["bpe_tokens"] = toks
                pdf["n_bpe_tokens"] = [len(t) for t in toks]
                yield pdf

        return pcoll.with_df(pcoll.df.mapInPandas(gen, schema=out_schema))
