"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own surface (per the build brief): language-ID,
quality scoring, token counting, document fingerprinting. The reference's
nearest analogs are the MLTransform text ops (ml/transforms/tft.py:148-728
NGrams/BagOfWords/TFIDF) and wordcount-style Regex/ToString pipelines
(transforms/util.py:2342).

Everything here is a pure Catalyst expression (split/transform/sequence/
aggregate higher-order functions) — no Python in the hot path, so the ops
whole-stage-codegen and scale linearly with input bytes. At 100 TB the
only shuffle any of these introduce is the one you add by grouping.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform

# GPT2-ish pretokenizer: words / numbers / single non-space punctuation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

#: Tiny per-language stopword seeds for the n-gram/stopword-vote heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "por"],
}
#: Deterministic tie order for argmax (first wins on equal votes).
LANG_ORDER = ["en", "de", "fr", "es"]


def tokens(col: str | Column) -> Column:
    """Whitespace tokens, lowercased."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def tokens_alnum(col: str | Column) -> Column:
    """Alphanumeric tokens: lowercase, split on any run of
    non-alphanumeric characters, empties dropped — the
    punctuation-robust analyzer (``"foo,Bar!"`` -> ["foo", "bar"]).
    ASCII class on purpose: portable across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"),
                    lambda x: x != "")


def token_count_whitespace(col: str | Column) -> Column:
    return F.size(tokens(col))


def token_count_bpe(col: str | Column) -> Column:
    """BPE-ish token count via the GPT2-style pretokenizer regex — an
    upper-bound proxy for LLM token budgets, computed JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the unit for jaccard/minhash dedup).
    Guarded for short docs: Spark's sequence(1, 0) yields a DESCENDING
    [1, 0], not an empty array, so size < n must short-circuit."""
    w = tokens(col)
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)])))
    return F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def word_shingles_on(tokens_col: str, n: int = 3) -> Column:
    """Shingles over a PRE-PROJECTED token array column.

    Catalyst does not common-subexpression-eliminate inside higher-order
    function lambdas, so ``word_shingles(text_col)`` re-splits the whole
    text once per lambda element (~O(tokens^2) work). Projecting the token
    array in a separate select() and indexing it here is ~18x faster and
    is what the dedup operators do.
    """
    parts = ", ".join(f"{tokens_col}[i-1+{j}]" if j else f"{tokens_col}[i-1]"
                      for j in range(n))
    grams = (f"array_distinct(transform(sequence(1, size({tokens_col}) - {n - 1}), "
             f"i -> concat_ws(' ', {parts})))")
    return F.expr(f"CASE WHEN size({tokens_col}) >= {n} THEN {grams} "
                  f"ELSE array() END")


def word_ngrams_all_on(tokens_col: str, n: int) -> Column:
    """NON-distinct word n-grams over a pre-projected token array —
    repetition statistics need every occurrence, unlike the deduped
    shingles word_shingles_on produces."""
    parts = ", ".join(f"{tokens_col}[i-1+{j}]" if j else f"{tokens_col}[i-1]"
                      for j in range(n))
    grams = (f"transform(sequence(1, size({tokens_col}) - {n - 1}), "
             f"i -> concat_ws(' ', {parts}))")
    return F.expr(f"CASE WHEN size({tokens_col}) >= {n} THEN {grams} "
                  f"ELSE array() END")


def char_ngrams(col: str | Column, n: int = 3) -> Column:
    """Distinct character n-grams (language-robust shingle alternative)."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.length(c) - (n - 1)),
        lambda i: c.substr(i, F.lit(n))))
    return F.when(F.length(c) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def char_entropy(col: str | Column) -> Column:
    """Shannon entropy (bits) of the document's character
    distribution — the classic gibberish / compressibility signal a
    pretraining filter thresholds (natural English prose sits ~4-4.5
    bits; keyboard mash and base64 blobs sit far higher, repeated-char
    spam far lower). Pure JVM expression chain: one run-length fold
    over the sorted char array — O(len log len) per doc, zero
    shuffle, zero Python."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(c, "")
    n = F.size(arr)
    # Single-pass run-length fold over the SORTED char array. Two
    # traps this shape dodges (both measured in the seconds-per-query
    # range on the sf0.1 corpus): the naive per-distinct-char filter
    # scan is O(distinct * n), and any FREE VARIABLE expression inside
    # a higher-order lambda (the char array, n) is re-evaluated PER
    # ELEMENT — Catalyst does not CSE into lambda bodies. Here the
    # lambda touches only its own accumulator and element, and the
    # identity  -sum (c/n) log2(c/n) = log2(n) - (sum c*log2(c)) / n
    # moves every n-reference outside the lambda.
    total = F.aggregate(
        F.array_sort(arr),
        F.struct(F.lit(0.0).alias("s"), F.lit(0).cast("long").alias("run"),
                 F.lit(None).cast("string").alias("prev")),
        lambda acc, ch: F.struct(
            F.when(ch.eqNullSafe(acc["prev"]), acc["s"]).otherwise(
                acc["s"] + F.when(acc["run"] == 0, F.lit(0.0)).otherwise(
                    acc["run"] * F.log2(acc["run"]))).alias("s"),
            F.when(ch.eqNullSafe(acc["prev"]),
                   acc["run"] + 1).otherwise(F.lit(1).cast("long"))
            .alias("run"),
            ch.alias("prev")),
        lambda acc: acc["s"] + F.when(
            acc["run"] == 0, F.lit(0.0)).otherwise(
            acc["run"] * F.log2(acc["run"])))
    ent = F.log2(n) - total / n
    return F.when(n > 0, ent).otherwise(F.lit(None).cast("double"))


def punct_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    total = F.greatest(F.length(c), F.lit(1))
    return F.length(F.regexp_replace(c, r"[^\p{Punct}]", "")) / total


def alpha_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    total = F.greatest(F.length(c), F.lit(1))
    return F.length(F.regexp_replace(c, r"[^A-Za-z]", "")) / total


def stopword_ratio(col: str | Column, lang: str = "en") -> Column:
    t = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(t, sw)) / F.greatest(F.size(t), F.lit(1))


def mean_token_length(col: str | Column) -> Column:
    t = tokens(col)
    return (F.aggregate(t, F.lit(0).cast("long"),
                        lambda acc, x: acc + F.length(x)).cast("double")
            / F.greatest(F.size(t), F.lit(1)))


def cjk_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    total = F.greatest(F.length(c), F.lit(1))
    return F.length(F.regexp_replace(c, r"[^一-鿿]", "")) / total


class QualityScore(PTransform):
    """Document quality features + composite score (the
    length/punctuation/stopword heuristics a pretraining filter applies).

    Output columns: n_chars, n_tokens, mean_token_len, punct_ratio,
    alpha_ratio, stopword_ratio, quality_score in [0,1].
    """

    def __init__(self, text_col: str = "text", label=None):
        super().__init__(label)
        self.text_col = text_col

    def expand(self, pcoll: PCollection) -> PCollection:
        c = self.text_col
        df = (pcoll.df
              .withColumn("n_chars", F.length(c))
              .withColumn("n_tokens", token_count_whitespace(c))
              .withColumn("mean_token_len", mean_token_length(c))
              .withColumn("punct_ratio", punct_ratio(c))
              .withColumn("alpha_ratio", alpha_ratio(c))
              .withColumn("stopword_ratio", stopword_ratio(c)))
        # Composite: reward mid-length docs with low punctuation noise.
        score = (
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
            + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.3
            + F.least(F.col("alpha_ratio") * 1.25, F.lit(1.0)) * 0.3)
        return pcoll.with_df(df.withColumn("quality_score", score))


class LanguageId(PTransform):
    """Heuristic language ID: per-language stopword votes + CJK-character
    share, argmax with a fixed tie order. Real detectors (fasttext etc.)
    slot in behind the same column contract via RunInference."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred", label=None):
        super().__init__(label)
        self.text_col, self.out_col = text_col, out_col

    def expand(self, pcoll: PCollection) -> PCollection:
        t = tokens(self.text_col)
        votes = {lang: F.size(F.array_intersect(
            t, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
            for lang in LANG_ORDER}
        # zh wins when CJK chars dominate; otherwise stopword argmax.
        best = F.lit(LANG_ORDER[-1])
        best_v = votes[LANG_ORDER[-1]]
        for lang in reversed(LANG_ORDER[:-1]):
            cond = votes[lang] >= best_v
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_v = F.when(cond, votes[lang]).otherwise(best_v)
        out = F.when(cjk_ratio(self.text_col) > 0.25, F.lit("zh")).otherwise(best)
        return pcoll.with_df(pcoll.df.withColumn(self.out_col, out))


class Fingerprint(PTransform):
    """Deterministic document fingerprints:

    * ``content_md5`` — exact-dup key: md5 of whitespace-normalized,
      lowercased text (stable across engines; DuckDB md5 matches).
    * ``rolling_hash`` — order-sensitive 64-bit polynomial rolling hash of
      the token stream (xxhash64-based), the cheap near-dup prefilter.
    """

    def __init__(self, text_col: str = "text", label=None):
        super().__init__(label)
        self.text_col = text_col

    def expand(self, pcoll: PCollection) -> PCollection:
        c = self.text_col
        norm = F.concat_ws(" ", tokens(c))
        df = pcoll.df.withColumn("content_md5", F.md5(norm))
        # polynomial rolling hash: fold tokens with h = h*31 + xxhash64(tok)
        df = df.withColumn(
            "rolling_hash",
            F.aggregate(tokens(c), F.lit(0).cast("long"),
                        lambda acc, x: acc * F.lit(31) + F.xxhash64(x)))
        return pcoll.with_df(df)


class TokenCount(PTransform):
    def __init__(self, text_col: str = "text", label=None):
        super().__init__(label)
        self.text_col = text_col

    def expand(self, pcoll: PCollection) -> PCollection:
        df = (pcoll.df
              .withColumn("n_tokens_ws", token_count_whitespace(self.text_col))
              .withColumn("n_tokens_bpe", token_count_bpe(self.text_col)))
        return pcoll.with_df(df)


class PiiRedact(PTransform):
    """Training-data PII scrubbing: replace emails, phone numbers, IPv4
    addresses, SSN-shaped ids, and credit-card-shaped numbers with typed
    placeholder tokens (``<EMAIL>``, ``<PHONE>``, ...). Pure JVM
    ``regexp_replace`` chain — zero-shuffle map-side scan, trivially
    scale-safe; the pattern set is the standard rule-based first pass a
    production pipeline runs before model-based PII detection (which
    would ride RunInference on the same column).

    Adds ``<text_col>_redacted`` plus ``pii_count`` (total replacements,
    cheap quality signal for filtering).
    """

    # order matters: cards before phones (overlapping digit runs)
    PATTERNS = [
        ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
        ("<CARD>", r"\b(?:\d[ -]?){13,16}\b"),
        ("<SSN>", r"\b\d{3}-\d{2}-\d{4}\b"),
        ("<PHONE>", r"\b(?:\+?\d{1,2}[ .-]?)?(?:\(\d{3}\)|\d{3})"
                    r"[ .-]?\d{3}[ .-]?\d{4}\b"),
        ("<IP>", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ]

    def __init__(self, text_col: str = "text", label=None):
        super().__init__(label)
        self.text_col = text_col

    def expand(self, pcoll: PCollection) -> PCollection:
        c = self.text_col
        red = F.col(c)
        for token, pat in self.PATTERNS:
            red = F.regexp_replace(red, pat, token)
        df = pcoll.df.withColumn(f"{c}_redacted", red)
        # count of placeholders inserted = how much PII the doc carried
        n = F.lit(0)
        for token, _ in self.PATTERNS:
            n = n + (F.length(f"{c}_redacted")
                     - F.length(F.replace(F.col(f"{c}_redacted"),
                                          F.lit(token), F.lit("")))) \
                / F.length(F.lit(token))
        df = df.withColumn("pii_count", n.cast("long"))
        return pcoll.with_df(df)


class RepetitionStats(PTransform):
    """Per-document repetition quality signals (the Gopher/RefinedWeb
    repetition rules): documents dominated by repeated lines or n-grams
    are low-quality for training and these fractions are the standard
    filter inputs.

    Appends:
      ``n_lines``            — line count (split on ``sep``)
      ``dup_line_frac``      — fraction of line occurrences that are
                               duplicates (a line appearing c>1 times
                               contributes all c occurrences)
      ``dup_line_char_frac`` — fraction of line characters inside
                               duplicated lines
      ``top_2gram_frac``     — occurrences of the most frequent word
                               2-gram / total 2-gram occurrences
      ``dup_3gram_frac``     — fraction of word-3-gram occurrences that
                               are duplicates

    Scale design: every metric is computed INSIDE the row with a sorted
    run-length fold (``array_sort`` + ``F.aggregate``) — documents are
    independent, so the whole operator is a zero-shuffle map-side
    projection (plan-asserted); no explode, no groupBy, no Python. Cost
    is O(items log items) per document for the sort, linear for the
    fold.
    """

    def __init__(self, text_col: str = "text", sep: str = "\n", label=None):
        super().__init__(label)
        self.text_col, self.sep = text_col, sep

    @staticmethod
    def _run_fold(sorted_arr: Column) -> Column:
        """Fold a SORTED string array into run-length statistics:
        struct(total, dup_occ, max_run, dup_chars, total_chars).
        A run of length c>1 counts all c occurrences (and c*len chars)
        as duplicates — when the run reaches 2, the first occurrence is
        retro-counted."""
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("total"),
            F.lit(0).cast("long").alias("dup_occ"),
            F.lit(0).cast("long").alias("max_run"),
            F.lit(0).cast("long").alias("dup_chars"),
            F.lit(0).cast("long").alias("total_chars"))

        def merge(acc, x):
            same = acc["prev"].eqNullSafe(x)
            new_run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
            inc = F.when(~same, F.lit(0)).otherwise(
                F.when(acc["run"] == 1, F.lit(2)).otherwise(F.lit(1)))
            return F.struct(
                x.alias("prev"),
                new_run.alias("run"),
                (acc["total"] + 1).alias("total"),
                (acc["dup_occ"] + inc).alias("dup_occ"),
                F.greatest(acc["max_run"], new_run).alias("max_run"),
                (acc["dup_chars"] + inc * F.length(x)).alias("dup_chars"),
                (acc["total_chars"] + F.length(x)).alias("total_chars"))

        return F.aggregate(sorted_arr, init, merge)

    def expand(self, pcoll: PCollection) -> PCollection:
        tc = self.text_col
        df = (pcoll.df
              .withColumn("__ls", F.array_sort(
                  F.split(F.col(tc), self.sep, -1)))
              .withColumn("__toks", tokens(tc)))
        df = (df
              .withColumn("__lstat", self._run_fold(F.col("__ls")))
              .withColumn("__g2", self._run_fold(
                  F.array_sort(word_ngrams_all_on("__toks", 2))))
              .withColumn("__g3", self._run_fold(
                  F.array_sort(word_ngrams_all_on("__toks", 3)))))

        def frac(num: Column, den: Column) -> Column:
            return F.when(den > 0, num.cast("double") / den).otherwise(
                F.lit(0.0))

        ls, g2, g3 = F.col("__lstat"), F.col("__g2"), F.col("__g3")
        out = (df
               .withColumn("n_lines", ls["total"])
               .withColumn("dup_line_frac", frac(ls["dup_occ"], ls["total"]))
               .withColumn("dup_line_char_frac",
                           frac(ls["dup_chars"], ls["total_chars"]))
               .withColumn("top_2gram_frac", frac(g2["max_run"], g2["total"]))
               .withColumn("dup_3gram_frac", frac(g3["dup_occ"], g3["total"]))
               .drop("__ls", "__toks", "__lstat", "__g2", "__g3"))
        return pcoll.with_df(out)


#: The 8 Gopher "stop words" (Rae et al. 2021 §A1.1): a document must
#: contain at least 2 of these to pass the stop_word rule.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


class GopherQualityFilter(PTransform):
    """The non-repetition Gopher quality rules (Rae et al. 2021, §A1.1 —
    the standard pre-training document filter; RefinedWeb/Dolma reuse
    them). Complements RepetitionStats, which owns the repetition rules.

    Appends per-document rule inputs and a composite ``keep`` flag:

      ``n_words``             — whitespace word count
      ``mean_word_len``       — mean characters per word
      ``symbol_word_ratio``   — (# of '#' + ellipsis occurrences) / words
      ``bullet_line_frac``    — fraction of lines starting with a bullet
      ``ellipsis_line_frac``  — fraction of lines ending with an ellipsis
      ``alpha_word_frac``     — fraction of words with >= 1 [A-Za-z]
      ``stopword_hits``       — distinct Gopher stop words present
      ``keep``                — 1 iff every rule passes

    Rules (defaults = the paper's): min_words <= n_words <= max_words;
    3 <= mean_word_len <= 10; symbol_word_ratio <= 0.1;
    bullet_line_frac <= 0.9; ellipsis_line_frac <= 0.3;
    alpha_word_frac >= 0.8; stopword_hits >= 2.

    Scale: pure Catalyst expressions (split / filter / regexp higher-order
    fns) — zero shuffle, whole-stage-codegen, linear in input bytes.
    """

    def __init__(self, text_col: str = "text", min_words: int = 50,
                 max_words: int = 100_000, min_stopword_hits: int = 2,
                 label=None):
        super().__init__(label)
        self.text_col = text_col
        self.min_words, self.max_words = min_words, max_words
        self.min_stopword_hits = min_stopword_hits

    def expand(self, pcoll: PCollection) -> PCollection:
        c = F.col(self.text_col)
        words = F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")
        lines = F.split(c, r"\n")
        n_words = F.size(words)
        n_words_f = F.greatest(n_words, F.lit(1)).cast("double")
        n_lines_f = F.greatest(F.size(lines), F.lit(1)).cast("double")
        sum_len = F.aggregate(words, F.lit(0).cast("long"),
                              lambda acc, w: acc + F.length(w))
        n_symbols = (F.size(F.regexp_extract_all(c, F.lit(r"#"), 0))
                     + F.size(F.regexp_extract_all(
                         c, F.lit(r"\.\.\.|…"), 0)))
        n_bullet = F.size(F.filter(
            lines, lambda l: l.rlike(r"^\s*[-*•‣▶]")))
        n_ellipsis = F.size(F.filter(
            lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
        n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        hits = F.size(F.array_intersect(F.transform(words, F.lower), sw))

        df = (pcoll.df
              .withColumn("n_words", n_words)
              .withColumn("mean_word_len",
                          F.round(sum_len.cast("double") / n_words_f, 6))
              .withColumn("symbol_word_ratio",
                          F.round(n_symbols.cast("double") / n_words_f, 6))
              .withColumn("bullet_line_frac",
                          F.round(n_bullet.cast("double") / n_lines_f, 6))
              .withColumn("ellipsis_line_frac",
                          F.round(n_ellipsis.cast("double") / n_lines_f, 6))
              .withColumn("alpha_word_frac",
                          F.round(n_alpha.cast("double") / n_words_f, 6))
              .withColumn("stopword_hits", hits))
        keep = (F.col("n_words").between(self.min_words, self.max_words)
                & F.col("mean_word_len").between(3.0, 10.0)
                & (F.col("symbol_word_ratio") <= 0.1)
                & (F.col("bullet_line_frac") <= 0.9)
                & (F.col("ellipsis_line_frac") <= 0.3)
                & (F.col("alpha_word_frac") >= 0.8)
                & (F.col("stopword_hits") >= self.min_stopword_hits))
        return pcoll.with_df(
            df.withColumn("keep", keep.cast("int")))


class NgramPerplexity(PTransform):
    """Corpus-trained bigram language-model scoring — the CCNet-style
    quality signal (Wenzek et al. 2019 train a KenLM and keep
    low-perplexity docs; here the LM is a bigram model with add-k
    smoothing fit ON the corpus itself, so the operator is a pure
    function of its input and needs no external model file).

    P(b|a) = (c(ab) + k) / (c(a) + k*V): c(ab)/c(a) corpus bigram and
    unigram counts, V the vocabulary size. Appends per document:

      ``n_bigrams`` — scored bigram count
      ``nll``       — mean negative log-likelihood (nats/bigram); docs
                      with < 2 tokens score NULL
      ``ppl``       — exp(nll), the per-bigram perplexity

    Scale: two passes over the corpus (count fit + scoring — persist
    the token arrays upstream to pay tokenization once), shuffles keyed
    on unigram/bigram, scoring join keyed the same way; AQE broadcasts
    the count tables when the vocabulary is small.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 add_k: float = 0.5, label=None):
        super().__init__(label)
        self.text_col, self.id_col, self.add_k = text_col, id_col, add_k

    def expand(self, pcoll: PCollection) -> PCollection:
        idc, k = self.id_col, float(self.add_k)
        t = tokens(self.text_col)
        toks = pcoll.df.select(F.col(idc), t.alias("__t"))

        uni = (toks.select(F.explode("__t").alias("w"))
               .groupBy("w").agg(F.count(F.lit(1)).alias("cw")))
        vocab = uni.agg(F.count(F.lit(1)).alias("V"))

        bg_arr = F.when(
            F.size("__t") >= 2,
            F.zip_with(F.slice("__t", 1, F.size("__t") - 1),
                       F.expr("slice(__t, 2, size(__t) - 1)"),
                       lambda a, b: F.struct(a.alias("w1"),
                                             F.concat_ws(" ", a, b)
                                             .alias("bg")))
        ).otherwise(F.array().cast(
            "array<struct<w1:string,bg:string>>"))
        doc_bg = (toks.select(idc, F.explode(bg_arr).alias("p"))
                  .select(idc, F.col("p.w1").alias("w1"),
                          F.col("p.bg").alias("bg")))

        big = (doc_bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cb")))

        scored = (doc_bg
                  .join(big, on="bg")
                  .join(uni, doc_bg["w1"] == uni["w"])
                  .crossJoin(F.broadcast(vocab))
                  .select(F.col(idc),
                          (-(F.log(F.col("cb") + k)
                             - F.log(F.col("cw") + k * F.col("V"))))
                          .alias("__nl")))
        per_doc = (scored.groupBy(idc)
                   .agg(F.count(F.lit(1)).alias("n_bigrams"),
                        F.avg("__nl").alias("__nll")))
        out = (pcoll.df
               .join(per_doc, on=idc, how="left")
               .withColumn("n_bigrams",
                           F.coalesce("n_bigrams", F.lit(0)))
               .withColumn("nll", F.round("__nll", 6))
               .withColumn("ppl", F.round(F.exp("__nll"), 6))
               .drop("__nll"))
        return pcoll.with_df(out)


class KneserNeyPerplexity(PTransform):
    """Interpolated Kneser-Ney bigram language-model scoring (Kneser
    & Ney 1995; Chen & Goodman 1999's interpolated form) — the
    KenLM-class quality signal NgramPerplexity's add-k smoothing only
    approximates. Absolute discounting with continuation
    probabilities:

        P1(w)   = max(N1+(.w) - D, 0) / B
                  + (D * Vc / B) * (1 / (V + 1))
        P2(w|u) = max(c(uw) - D, 0) / c(u.)
                  + (D * N1+(u.) / c(u.)) * P1(w)
        (u unseen as a context -> full backoff to P1)

    where N1+(.w) = distinct left-contexts of w, N1+(u.) = distinct
    continuations of u, B = distinct bigrams, Vc = distinct
    continuation words, c(u.) = u's context total, V = train
    vocabulary (the +1 is the OOV slot of the uniform base — every
    event scores finite, including fully-OOV bigrams).

    ``order=3`` fits the interpolated TRIGRAM model (Chen & Goodman
    1999, eq. 18 recursion) with every lower order derived from
    CONTINUATION counts of the trigram table:

        P3(w|u,v) = max(c(uvw) - D, 0) / c(uv.)
                    + (D * N1+(uv.) / c(uv.)) * P2(w|v)
        P2(w|v)   = max(N1+(.vw) - D, 0) / N1+(.v.)
                    + (D * N1+(v.) / N1+(.v.)) * P1(w)
        P1(w)     = max(N1+(.w) - D, 0) / N1+(..)
                    + (D * Vc / N1+(..)) * (1 / (V + 1))

    (unseen (u,v) context -> P2; unseen v middle -> P1; scored
    events are the trigram positions, so docs with < 3 tokens get
    n_events 0 / NULL nll.)

    ``train``: optional frame to fit on (held-out split, larger
    corpus); None fits on the scored frame itself (the CCNet
    posture). D must be dyadic (default 0.75) for bit-stable replay.

    Determinism: every probability is a fixed-order double expression
    over exact integer counts; per-event -ln(P2) quantizes to
    decimal(16,9) before the per-doc sum (order-free — the
    NaiveBayes convention); nll rounds 6, ppl = round(exp(nll), 6)
    so exp sees bit-identical inputs in both engines.

    Scale: one count fit (three vocabulary-bounded aggregates over
    the bigram frame) + one scoring pass; joins are term-keyed, the
    scalar constants ride a 1-row broadcast.

    Output: input columns + (n_events, nll, ppl) — docs with < 2
    tokens score NULL (n_events 0).
    """

    def __init__(self, train=None, text_col: str = "text",
                 id_col: str = "doc_id", discount: float = 0.75,
                 order: int = 2, label=None):
        super().__init__(label)
        from beam_spark.pcollection import PCollection as _PC

        self.train = (train.df if isinstance(train, _PC) else train)
        self.text_col, self.id_col = text_col, id_col
        self.discount = float(discount)
        if not 0.0 < self.discount < 1.0:
            raise ValueError(f"discount {discount} outside (0, 1)")
        self.order = int(order)
        if self.order not in (2, 3):
            raise ValueError(f"order {order}: 2 (bigram) or 3 "
                             "(trigram) supported")

    @staticmethod
    def _bigrams(toks_df, idc):
        pair = F.when(
            F.size("__t") >= 2,
            F.zip_with(F.slice("__t", 1, F.size("__t") - 1),
                       F.expr("slice(__t, 2, size(__t) - 1)"),
                       lambda a, b: F.struct(a.alias("w1"),
                                             b.alias("w2")))
        ).otherwise(F.array().cast(
            "array<struct<w1:string,w2:string>>"))
        cols = [idc] if idc else []
        return (toks_df.select(*cols, F.explode(pair).alias("p"))
                .select(*cols, F.col("p.w1").alias("w1"),
                        F.col("p.w2").alias("w2")))

    @staticmethod
    def _trigrams(toks_df, idc):
        trip = F.when(
            F.size("__t") >= 3,
            F.expr("transform(sequence(0, size(__t) - 3), i -> "
                   "struct(__t[i] AS w1, __t[i+1] AS w2, "
                   "__t[i+2] AS w3))")
        ).otherwise(F.array().cast(
            "array<struct<w1:string,w2:string,w3:string>>"))
        cols = [idc] if idc else []
        return (toks_df.select(*cols, F.explode(trip).alias("p"))
                .select(*cols, F.col("p.w1").alias("w1"),
                        F.col("p.w2").alias("w2"),
                        F.col("p.w3").alias("w3")))

    def expand(self, pcoll: PCollection) -> PCollection:
        idc, d = self.id_col, self.discount
        tok = lambda df: df.where(
            F.col(self.text_col).isNotNull()).select(
            F.col(idc),
            F.filter(tokens(self.text_col),
                     lambda x: x != "").alias("__t"))
        train_df = self.train if self.train is not None else pcoll.df
        tr = tok(train_df)
        if self.order == 3:
            return self._expand_trigram(pcoll, tr, tok)
        trb = self._bigrams(tr, None)
        cab = (trb.groupBy("w1", "w2")
               .agg(F.count(F.lit(1)).cast("long").alias("cab")))
        ctx = (cab.groupBy("w1")
               .agg(F.sum("cab").cast("long").alias("ca"),
                    F.count(F.lit(1)).cast("long").alias("n1fw")))
        cont = (cab.groupBy("w2")
                .agg(F.count(F.lit(1)).cast("long").alias("n1p")))
        consts = (cab.agg(F.count(F.lit(1)).cast("long").alias("B"))
                  .crossJoin(cont.agg(F.count(F.lit(1)).cast("long")
                                      .alias("Vc")))
                  .crossJoin(tr.select(F.explode("__t").alias("w"))
                             .agg(F.countDistinct("w").cast("long")
                                  .alias("V"))))

        first = consts.first()
        if first is None or not first["B"]:
            raise ValueError(
                "KneserNeyPerplexity: train corpus has no bigrams "
                "(empty, all-NULL text, or single-token docs) — "
                "scoring against an empty model would silently yield "
                "NaN probabilities")
        te = tok(pcoll.df)
        teb = self._bigrams(te, idc)
        D = F.lit(d)
        # the fail-fast probe above already materialized the 1-row
        # model constants — ride them as literals instead of
        # recomputing the aggregates inside the scoring job
        j = (teb.join(cab, ["w1", "w2"], "left")
             .join(ctx, "w1", "left")
             .join(cont, "w2", "left")
             .withColumn("B", F.lit(int(first["B"])))
             .withColumn("Vc", F.lit(int(first["Vc"])))
             .withColumn("V", F.lit(int(first["V"]))))
        b_d = F.col("B").cast("double")
        p1 = (F.greatest(F.coalesce(F.col("n1p"), F.lit(0))
                         .cast("double") - D, F.lit(0.0)) / b_d
              + (D * F.col("Vc").cast("double") / b_d)
              * (F.lit(1.0) / (F.col("V") + F.lit(1)).cast("double")))
        ca_d = F.col("ca").cast("double")
        p2 = F.when(
            F.col("ca").isNotNull(),
            F.greatest(F.coalesce(F.col("cab"), F.lit(0))
                       .cast("double") - D, F.lit(0.0)) / ca_d
            + (D * F.col("n1fw").cast("double") / ca_d) * p1
        ).otherwise(p1)
        sc = j.select(F.col(idc),
                      (-F.log(p2)).cast("decimal(16,9)").alias("__nl"))
        per_doc = (sc.groupBy(idc)
                   .agg(F.count(F.lit(1)).cast("long")
                        .alias("n_events"),
                        F.round(F.sum("__nl").cast("double")
                                / F.count(F.lit(1)).cast("double"), 6)
                        .alias("nll")))
        out = (pcoll.df.join(per_doc, idc, "left")
               .withColumn("n_events",
                           F.coalesce("n_events", F.lit(0)))
               .withColumn("ppl", F.round(F.exp("nll"), 6)))
        return pcoll.with_df(out)

    def _expand_trigram(self, pcoll, tr, tok):
        """order=3 path: every count table derives from the TRIGRAM
        table (the Chen-Goodman recursion), so a doc contributes to
        the model only through its trigrams — bigrams of 2-token docs
        are deliberately absent, matching the oracle replay."""
        idc, d = self.id_col, self.discount
        tr3 = self._trigrams(tr, None)
        c3 = (tr3.groupBy("w1", "w2", "w3")
              .agg(F.count(F.lit(1)).cast("long").alias("c3")))
        ctx3 = (c3.groupBy("w1", "w2")
                .agg(F.sum("c3").cast("long").alias("ca3"),
                     F.count(F.lit(1)).cast("long").alias("n1fw3")))
        cb = (c3.groupBy("w2", "w3")
              .agg(F.count(F.lit(1)).cast("long").alias("cbc")))
        ctx2 = (cb.groupBy("w2")
                .agg(F.sum("cbc").cast("long").alias("cbt"),
                     F.count(F.lit(1)).cast("long").alias("n1fw2")))
        cu = (cb.groupBy("w3")
              .agg(F.count(F.lit(1)).cast("long").alias("cuc")))
        consts = (cb.agg(F.count(F.lit(1)).cast("long").alias("B2"))
                  .crossJoin(cu.agg(F.count(F.lit(1)).cast("long")
                                    .alias("Vc")))
                  .crossJoin(tr.select(F.explode("__t").alias("w"))
                             .agg(F.countDistinct("w").cast("long")
                                  .alias("V"))))
        first = consts.first()
        if first is None or not first["B2"]:
            raise ValueError(
                "KneserNeyPerplexity(order=3): train corpus has no "
                "trigrams (empty, all-NULL text, or sub-3-token "
                "docs) — scoring against an empty model would "
                "silently yield NaN probabilities")
        te3 = self._trigrams(tok(pcoll.df), idc)
        D = F.lit(d)
        j = (te3.join(c3, ["w1", "w2", "w3"], "left")
             .join(ctx3, ["w1", "w2"], "left")
             .join(cb, ["w2", "w3"], "left")
             .join(ctx2, "w2", "left")
             .join(cu, "w3", "left")
             .withColumn("B2", F.lit(int(first["B2"])))
             .withColumn("Vc", F.lit(int(first["Vc"])))
             .withColumn("V", F.lit(int(first["V"]))))
        b2_d = F.col("B2").cast("double")
        p1 = (F.greatest(F.coalesce(F.col("cuc"), F.lit(0))
                         .cast("double") - D, F.lit(0.0)) / b2_d
              + (D * F.col("Vc").cast("double") / b2_d)
              * (F.lit(1.0) / (F.col("V") + F.lit(1)).cast("double")))
        cbt_d = F.col("cbt").cast("double")
        p2 = F.when(
            F.col("cbt").isNotNull(),
            F.greatest(F.coalesce(F.col("cbc"), F.lit(0))
                       .cast("double") - D, F.lit(0.0)) / cbt_d
            + (D * F.col("n1fw2").cast("double") / cbt_d) * p1
        ).otherwise(p1)
        ca3_d = F.col("ca3").cast("double")
        p3 = F.when(
            F.col("ca3").isNotNull(),
            F.greatest(F.coalesce(F.col("c3"), F.lit(0))
                       .cast("double") - D, F.lit(0.0)) / ca3_d
            + (D * F.col("n1fw3").cast("double") / ca3_d) * p2
        ).otherwise(p2)
        sc = j.select(F.col(idc),
                      (-F.log(p3)).cast("decimal(16,9)").alias("__nl"))
        per_doc = (sc.groupBy(idc)
                   .agg(F.count(F.lit(1)).cast("long")
                        .alias("n_events"),
                        F.round(F.sum("__nl").cast("double")
                                / F.count(F.lit(1)).cast("double"), 6)
                        .alias("nll")))
        out = (pcoll.df.join(per_doc, idc, "left")
               .withColumn("n_events",
                           F.coalesce("n_events", F.lit(0)))
               .withColumn("ppl", F.round(F.exp("nll"), 6)))
        return pcoll.with_df(out)


class NormalizeText(PTransform):
    """Pre-dedup text normalization (the canonicalization step C4/CCNet
    run before exact and fuzzy dedup): lowercase, strip control and
    zero-width characters, optionally strip ASCII punctuation, collapse
    whitespace runs to single spaces, trim. Zero-shuffle expression
    chain; the explicit ASCII punctuation class (not \\p{Punct}) keeps
    the regex portable across engines.
    """

    def __init__(self, text_col: str = "text", out_col: str = "norm_text",
                 strip_punct: bool = False, label=None):
        super().__init__(label)
        self.text_col, self.out_col = text_col, out_col
        self.strip_punct = strip_punct

    def expand(self, pcoll: PCollection) -> PCollection:
        x = F.lower(F.col(self.text_col))
        # control chars + zero-width space/joiners + BOM, as literal
        # chars in the class (portable across Java-regex and RE2).
        # \t \n \x0b \x0c \r stay: they are WHITESPACE and must collapse
        # to a space below, not vanish
        x = F.regexp_replace(
            x, "[\x00-\x08\x0e-\x1f\x7f​‌‍﻿]", "")
        if self.strip_punct:
            x = F.regexp_replace(x, r"[!-/:-@\[-`{-~]", " ")
        x = F.trim(F.regexp_replace(x, r"\s+", " "))
        return pcoll.with_df(pcoll.df.withColumn(self.out_col, x))


class LuhnValidate(PTransform):
    """Checksum validation for card-shaped digit strings (ISO/IEC
    7812 Luhn mod-10) — the false-positive cutter a rule-based PII
    pass needs: :class:`PiiRedact`'s ``<CARD>`` pattern matches ANY
    13-16 digit run, but only ~1 in 10 random runs passes Luhn, so
    validating before redaction/reporting separates real card numbers
    from order ids and phone-number fragments.

    Pure expression pipeline (zero shuffle): strip separators, bound
    the length to [13, 19] (ISO/IEC 7812 PANs), then one
    ``aggregate(sequence(...))`` fold computes the doubled-alternate
    digit sum right-to-left. The fold is ALL-INTEGER arithmetic, so
    the oracle replays it with its own list primitives
    (list_sum/list_transform) and still matches exactly — no IEEE
    ordering concern exists here. No UDF.

    Adds ``<col>_luhn_valid`` boolean (NULL for NULL/out-of-bounds
    inputs — "not a candidate" is distinct from "failed checksum").
    """

    def __init__(self, col: str, label=None):
        super().__init__(label)
        self.col = col

    @staticmethod
    def _fold_expr(digits: str, rev: str) -> str:
        """The Luhn CASE/fold over a digit string ``digits`` and its
        precomputed reversal ``rev`` (same value as
        ``reverse(digits)`` — callers on a hot path pass a projected
        COLUMN for both so the interpreted higher-order-function
        lambda touches attributes, not a re-evaluated
        regexp/reverse chain per character)."""
        return (
            f"CASE WHEN {digits} IS NULL THEN NULL "
            f"WHEN length({digits}) < 13 OR length({digits}) > 19 "
            f"THEN NULL "
            f"WHEN NOT {digits} RLIKE '^[0-9]+$' THEN NULL "
            f"ELSE aggregate(sequence(1, length({digits})), 0, "
            f"(acc, i) -> acc + CASE WHEN i % 2 = 0 THEN "
            f"CASE WHEN 2 * (ascii(substr({rev}, i, 1)) - 48) > 9 "
            f"THEN 2 * (ascii(substr({rev}, i, 1)) - 48) - 9 "
            f"ELSE 2 * (ascii(substr({rev}, i, 1)) - 48) END "
            f"ELSE ascii(substr({rev}, i, 1)) - 48 END) % 10 = 0 END")

    @classmethod
    def sql_expr(cls, digits: str) -> str:
        """Spark-side Luhn SQL over a separator-free digit string —
        one fold over reversed positions; doubled digits fold their
        carry via ``2d - 9``. Integer-exact, so the oracle's
        list_sum/list_transform replay matches without any rounding
        convention."""
        return cls._fold_expr(digits, f"reverse({digits})")

    def expand(self, pcoll: PCollection) -> PCollection:
        c = self.col
        # Hoist the separator strip + reversal into REAL projected
        # columns: higher-order-function lambdas are evaluated
        # interpreted per element, so inlining the normalization into
        # the fold body re-ran regexp_replace + reverse once per
        # CHARACTER per row (measured 23x on the scalar-conformance
        # gate). The fold arithmetic is unchanged — same values.
        dcol, rcol = f"__{c}_luhn_d", f"__{c}_luhn_r"
        df = (pcoll.df
              .withColumn(dcol, F.expr(f"regexp_replace({c}, '[ -]', '')"))
              .withColumn(rcol, F.reverse(F.col(dcol)))
              .withColumn(f"{c}_luhn_valid",
                          F.expr(self._fold_expr(dcol, rcol)))
              .drop(dcol, rcol))
        return pcoll.with_df(df)


class IbanValidate(PTransform):
    """IBAN checksum validation (ISO 13616 mod-97-10) — the second
    member of the checksum-validated-PII family next to
    :class:`LuhnValidate`: structural shape (2 letters + 2 check
    digits + 11-30 alphanumeric BBAN, upper-cased, spaces stripped)
    gates candidacy, then the rearranged string (BBAN + country +
    check) folds to a running mod 97 — digits contribute
    ``acc*10 + d``, letters their two-digit A=10..Z=35 value via
    ``acc*100 + v`` — and validity is ``acc == 1``.

    All-integer fold (aggregate/sequence, zero shuffle, no UDF); the
    oracle replays it with list_reduce — integer arithmetic, so the
    different fold primitive cannot drift. Adds ``<col>_iban_valid``
    boolean (NULL = structurally not an IBAN candidate, distinct from
    a failed checksum).
    """

    SHAPE = "^[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}$"

    def __init__(self, col: str, label=None):
        super().__init__(label)
        self.col = col

    def expand(self, pcoll: PCollection) -> PCollection:
        c = self.col
        # Hoist the normalized + rearranged strings into REAL
        # projected columns (the LuhnValidate posture): the fold's
        # lambda is evaluated interpreted per element, so inlining
        # upper/regexp_replace/concat into it re-built the candidate
        # string once per CHARACTER per row. Same fold arithmetic,
        # same values.
        ncol, acol = f"__{c}_iban_n", f"__{c}_iban_a"
        ch = f"ascii(substr({acol}, i, 1))"
        fold = (f"aggregate(sequence(1, length({acol})), 0, "
                f"(acc, i) -> CASE WHEN {ch} >= 65 "
                f"THEN (acc * 100 + ({ch} - 55)) % 97 "
                f"ELSE (acc * 10 + ({ch} - 48)) % 97 END)")
        expr = (f"CASE WHEN {c} IS NULL THEN NULL "
                f"WHEN NOT {ncol} RLIKE '{self.SHAPE}' THEN NULL "
                f"ELSE {fold} = 1 END")
        df = (pcoll.df
              .withColumn(ncol,
                          F.expr(f"upper(regexp_replace({c}, '[ ]', ''))"))
              .withColumn(acol,
                          F.expr(f"concat(substr({ncol}, 5, "
                                 f"length({ncol}) - 4), "
                                 f"substr({ncol}, 1, 4))"))
              .withColumn(f"{c}_iban_valid", F.expr(expr))
              .drop(ncol, acol))
        return pcoll.with_df(df)


class CardFindings(PTransform):
    """Per-document credit-card detection with checksum validation:
    extract every card-shaped digit run (PiiRedact's ``<CARD>``
    pattern), strip separators, Luhn-validate each, and report
    ``card_candidates`` / ``card_valid`` counts — the quality signal
    that distinguishes documents containing real PANs from documents
    full of 16-digit order ids. Zero-shuffle array expressions; the
    per-candidate Luhn fold reuses :meth:`LuhnValidate.sql_expr`.
    """

    CARD_PATTERN = r"\\b(?:\\d[ -]?){12,18}\\d\\b"

    def __init__(self, text_col: str = "text", label=None):
        super().__init__(label)
        self.text_col = text_col

    def expand(self, pcoll: PCollection) -> PCollection:
        c = self.text_col
        cands = (f"filter(transform(regexp_extract_all({c}, "
                 f"'{self.CARD_PATTERN}', 0), "
                 f"s -> regexp_replace(s, '[ -]', '')), "
                 f"s -> length(s) >= 13 AND length(s) <= 19)")
        valid = LuhnValidate.sql_expr("s")
        df = (pcoll.df
              .withColumn("__cands", F.expr(cands))
              .withColumn("card_candidates",
                          F.expr("size(__cands)"))
              .withColumn("card_valid",
                          F.expr(f"size(filter(__cands, "
                                 f"s -> {valid}))"))
              .drop("__cands"))
        return pcoll.with_df(df)


class UrlNormalize(PTransform):
    """URL canonicalization + host/registered-domain extraction — the
    web-crawl curation primitive CCNet/RefinedWeb-style pipelines run
    before URL dedup and per-domain quality sampling:

      * scheme and host lowercased
      * default ports stripped (http:80, https:443); others kept
      * duplicate path slashes collapsed, trailing slash trimmed
        (root stays "/"); empty path becomes "/"
      * fragment dropped
      * query params: tracking params removed (``strip_params`` regex
        on the param NAME, default utm_*/fbclid/gclid/msclkid/yclid/
        ref), the rest SORTED bytewise so param order never splits a
        dedup group; empty query drops the "?"
      * ``host``: hostname with a leading "www." stripped
        (``strip_www=False`` keeps it)
      * ``domain``: registered-domain heuristic — last two labels,
        or last three when the trailing two are a common two-level
        public suffix (co.uk, com.au, ...); a full public-suffix-list
        lookup can replace this per deployment

    Entirely JVM-side: ``try_parse_url`` (java.net.URI) + higher-order
    array functions — zero shuffle, zero Python. Unparseable URLs
    yield NULLs (try_parse_url's contract); userinfo is not preserved.

    Output: input columns + ``out_col``, ``host_col``, ``domain_col``.
    """

    _TWO_LEVEL_SUFFIXES = (
        "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp",
        "or.jp", "com.au", "net.au", "org.au", "co.nz", "com.br",
        "com.mx", "co.in", "co.za", "com.cn", "com.tw", "co.kr",
        "com.sg", "com.hk", "com.ar", "com.tr")

    def __init__(self, url_col: str = "url", out_col: str = "url_norm",
                 host_col: str = "host", domain_col: str = "domain",
                 strip_params: str = (
                     "^(utm_.*|fbclid|gclid|msclkid|yclid|ref)$"),
                 strip_www: bool = True, label=None):
        super().__init__(label)
        self.url_col, self.out_col = url_col, out_col
        self.host_col, self.domain_col = host_col, domain_col
        self.strip_params = strip_params
        self.strip_www = bool(strip_www)

    def expand(self, pcoll: PCollection) -> PCollection:
        u = F.col(self.url_col)
        proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
        rawhost = F.lower(F.try_parse_url(u, F.lit("HOST")))
        auth = F.try_parse_url(u, F.lit("AUTHORITY"))
        port = F.regexp_extract(auth, ":([0-9]+)$", 1)
        p1 = F.regexp_replace(
            F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")),
            "/{2,}", "/")
        p2 = F.regexp_replace(p1, "/$", "")
        path = F.when(p2 == "", F.lit("/")).otherwise(p2)
        qs = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
        pat = self.strip_params
        kept = F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~F.substring_index(p, "=", 1)
            .rlike(pat))
        qnorm = F.array_join(F.array_sort(kept), "&")
        is_default = (((proto == "http") & (port == "80"))
                      | ((proto == "https") & (port == "443")))
        hostport = F.when((port == "") | is_default, rawhost).otherwise(
            F.concat(rawhost, F.lit(":"), port))
        url_norm = F.when(
            proto.isNull() | rawhost.isNull(), F.lit(None)).otherwise(
            F.concat(proto, F.lit("://"), hostport, path,
                     F.when(qnorm == "", F.lit("")).otherwise(
                         F.concat(F.lit("?"), qnorm))))
        host = (F.regexp_replace(rawhost, r"^www\.", "")
                if self.strip_www else rawhost)
        labels = F.split(host, r"\.")
        n = F.size(labels)
        two = F.concat_ws(".", F.element_at(labels, -2),
                          F.element_at(labels, -1))
        three = F.concat_ws(".", F.element_at(labels, -3),
                            F.element_at(labels, -2),
                            F.element_at(labels, -1))
        sfx = F.array(*[F.lit(s) for s in self._TWO_LEVEL_SUFFIXES])
        domain = F.when(host.isNull(), F.lit(None)).when(
            (n >= 3) & F.array_contains(sfx, two), three).when(
            n >= 2, two).otherwise(host)
        return pcoll.with_df(
            pcoll.df.withColumn(self.out_col, url_norm)
            .withColumn(self.host_col, host)
            .withColumn(self.domain_col, domain))


class ReadabilityScore(PTransform):
    """Flesch reading ease + Flesch-Kincaid grade level — the classic
    readability features a pretraining quality filter thresholds
    alongside Gopher rules:

        ease  = 206.835 - 1.015 * (words/sentences)
                        - 84.6 * (syllables/words)
        grade = 0.39 * (words/sentences)
                + 11.8 * (syllables/words) - 15.59

    Heuristics (documented, engine-portable): sentences = runs of
    [.!?] (min 1); syllables per word = vowel-group count
    ([aeiouy]+ runs, min 1 — the standard approximation without a
    silent-e dictionary). Zero-shuffle expression chain; the syllable
    fold's lambda touches only its own element (the higher-order
    free-variable trap documented in SCALE.md round 8).

    Output: input columns + n_words, n_sentences, n_syllables,
    flesch (round 6), fk_grade (round 6).
    """

    def __init__(self, text_col: str = "text", label=None):
        super().__init__(label)
        self.text_col = text_col

    def expand(self, pcoll: PCollection) -> PCollection:
        c = F.col(self.text_col)
        toks = tokens(self.text_col)
        n_words = F.greatest(F.size(toks), F.lit(1))
        n_sent = F.greatest(F.regexp_count(c, F.lit("[.!?]+")),
                            F.lit(1))
        n_syl = F.aggregate(
            toks, F.lit(0).cast("long"),
            lambda acc, w: acc + F.greatest(
                F.regexp_count(w, F.lit("[aeiouy]+")),
                F.lit(1)).cast("long"))
        wps = n_words.cast("double") / n_sent
        spw = n_syl.cast("double") / n_words
        df = (pcoll.df
              .withColumn("n_words", F.size(toks))
              .withColumn("n_sentences", n_sent)
              .withColumn("n_syllables", n_syl)
              .withColumn("flesch", F.round(
                  F.lit(206.835) - F.lit(1.015) * wps
                  - F.lit(84.6) * spw, 6))
              .withColumn("fk_grade", F.round(
                  F.lit(0.39) * wps + F.lit(11.8) * spw
                  - F.lit(15.59), 6)))
        return pcoll.with_df(df)


class PmiCollocations(PTransform):
    """Corpus-level collocation mining: pointwise mutual information of
    adjacent token bigrams — the statistic tokenizer-training and
    phrase-merging pipelines use to decide which word pairs behave as
    one unit (cf. word2vec's phrase pass). For every bigram occurring
    >= ``min_count`` times,

        pmi = ln( P(w1 w2) / (P(w1) P(w2)) )
            = ln( (c_12 * n_uni * n_uni) / (n_big * c_1 * c_2) )

    with all counts exact integers and the ratio evaluated in ONE
    fixed multiply/divide order in both engines, rounded 6.

    Tokenization is the repo-standard whitespace+lowercase analyzer
    (``tokens``) with empties dropped; bigrams are zip_with over two
    array slices — a pure Catalyst expression, no Python.

    Scale: two explode->groupBy counts (partial agg, one shuffle
    each); the min_count filter prunes the bigram frame BEFORE its two
    unigram-count joins (word-keyed, AQE-skew-safe); the two grand
    totals are 1-row broadcast cross joins. Output cardinality is the
    frequent-bigram vocabulary, not the corpus.

    Output: (w1, w2, pair_n, w1_n, w2_n, pmi) — pmi > 0 means the
    pair co-occurs more than independence predicts.
    """

    def __init__(self, text_col: str = "text", min_count: int = 2,
                 label=None):
        super().__init__(label)
        if int(min_count) < 1:
            raise ValueError(f"min_count {min_count}: need >= 1")
        self.text_col, self.min_count = text_col, int(min_count)

    def expand(self, pcoll: PCollection) -> PCollection:
        tc, mc = self.text_col, self.min_count
        toks = F.filter(tokens(tc), lambda x: x != "")
        base = (pcoll.df.where(F.col(tc).isNotNull())
                .select(toks.alias("__toks")))
        n = F.size(F.col("__toks"))
        pairs = F.when(n > 1, F.zip_with(
            F.slice(F.col("__toks"), 1, n - 1),
            F.slice(F.col("__toks"), 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        uni = base.select(F.explode("__toks").alias("w"))
        big = base.select(F.explode(pairs).alias("p")) \
                  .select("p.w1", "p.w2")
        uc = uni.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
        nu = uni.agg(F.count(F.lit(1)).cast("long").alias("__nu"))
        nb = big.agg(F.count(F.lit(1)).cast("long").alias("__nb"))
        bc = (big.groupBy("w1", "w2")
              .agg(F.count(F.lit(1)).cast("long").alias("pair_n"))
              .where(F.col("pair_n") >= mc))
        u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("w1_n"))
        u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("w2_n"))
        num = (F.col("pair_n").cast("double")
               * F.col("__nu").cast("double")
               * F.col("__nu").cast("double"))
        den = (F.col("__nb").cast("double")
               * F.col("w1_n").cast("double")
               * F.col("w2_n").cast("double"))
        out = (bc.join(u1, "w1").join(u2, "w2")
               .crossJoin(F.broadcast(nu)).crossJoin(F.broadcast(nb))
               .select("w1", "w2", "pair_n", "w1_n", "w2_n",
                       F.round(F.log(num / den), 6).alias("pmi")))
        return pcoll.with_df(out)


class ZipfFit(PTransform):
    """Zipf's-law fit of the corpus term-frequency distribution: OLS of
    ln(count) on ln(rank) over the ranked vocabulary — the exponent
    (slope ~ -1 for natural language) and fit quality (r2) are the
    standard corpus-health statistic for spotting boilerplate-heavy or
    machine-generated text (which flattens or breaks the power law).

    Ranks are deterministic: count descending with a term tie-break.
    ``min_count`` drops the hapax tail; ``max_rank`` (optional) fits
    the head only. Cross-engine determinism: each per-term ln goes
    through the exact-decimal-sum pattern (round-12 terms, associative
    sums), the OLS closed form then runs on identical doubles; slope /
    intercept / r2 round 6.

    Scale: one explode -> groupBy(term) count (partial agg), then a
    row_number over the VOCABULARY frame — a single-partition sort of
    distinct terms, not the corpus (the AUC-cumsum posture; cap with
    max_rank for billion-term vocabularies), and one global
    aggregation of the moments.

    Output: one row — (n_terms, slope, intercept, r2); r2 NULL when
    either variance is 0 (fewer than 2 ranks, or all counts equal).
    """

    def __init__(self, text_col: str = "text", min_count: int = 1,
                 max_rank: int | None = None, label=None):
        super().__init__(label)
        if int(min_count) < 1:
            raise ValueError(f"min_count {min_count}: need >= 1")
        if max_rank is not None and int(max_rank) < 2:
            raise ValueError(f"max_rank {max_rank}: need >= 2")
        self.text_col, self.min_count = text_col, int(min_count)
        self.max_rank = None if max_rank is None else int(max_rank)

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        tc = self.text_col
        toks = F.filter(tokens(tc), lambda x: x != "")
        terms = (pcoll.df.where(F.col(tc).isNotNull())
                 .select(F.explode(toks).alias("__w"))
                 .groupBy("__w")
                 .agg(F.count(F.lit(1)).cast("long").alias("__c"))
                 .where(F.col("__c") >= self.min_count))
        w = Window.orderBy(F.col("__c").desc(), F.col("__w"))
        ranked = terms.withColumn("__r", F.row_number().over(w))
        if self.max_rank is not None:
            ranked = ranked.where(F.col("__r") <= self.max_rank)
        x = F.log(F.col("__r").cast("double"))
        y = F.log(F.col("__c").cast("double"))
        d = "decimal(28,12)"
        m = ranked.agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.count_distinct(F.col("__c")).cast("long").alias("__dc"),
            F.sum(x.cast(d)).alias("__sx"),
            F.sum(y.cast(d)).alias("__sy"),
            F.sum((x * x).cast(d)).alias("__sxx"),
            F.sum((x * y).cast(d)).alias("__sxy"),
            F.sum((y * y).cast(d)).alias("__syy"))
        n = F.col("n_terms").cast("double")
        sx = F.col("__sx").cast("double")
        sy = F.col("__sy").cast("double")
        sxx = F.col("__sxx").cast("double")
        sxy = F.col("__sxy").cast("double")
        syy = F.col("__syy").cast("double")
        covn = n * sxy - sx * sy
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        slope = covn / varx
        # zero-variance guards use EXACT integer conditions, not the
        # float moments (decimal-12 term rounding leaves a tiny
        # residue where the true variance is 0): x varies iff there
        # are >= 2 ranks, y varies iff counts are not all equal
        has_x = F.col("n_terms") >= 2
        has_y = F.col("__dc") >= 2
        out = m.select(
            "n_terms",
            F.when(has_x, F.round(slope, 6)).alias("slope"),
            F.when(has_x,
                   F.round((sy - slope * sx) / n, 6)).alias("intercept"),
            F.when(has_x & has_y,
                   F.round((covn * covn) / (varx * vary), 6))
            .alias("r2"))
        return pcoll.with_df(out)


class LogOddsTerms(PTransform):
    """Distinctive terms per class by smoothed log-odds z-score
    (Monroe, Colaresi & Quinn 2008, uninformative Dirichlet prior) —
    the corpus-audit answer to "which words make this source/language
    slice different?", more robust than raw TF-IDF deltas because the
    prior shrinks rare-term noise:

        d_kw = ln((c_kw + a) / (n_k + a*V - c_kw - a))
             - ln((r_w + a) / (N - n_k + a*V - r_w - a))
        var  = 1/(c_kw + a) + 1/(r_w + a)      r_w = c_w - c_kw
        z    = d_kw / sqrt(var)

    with a the prior mass (default the binary-exact 0.5) and V the
    vocabulary size. Ranking is deterministic: per class by round-6 z
    descending, term tie-break; the top ``top_n`` per class emit.

    Scale: one explode -> (class, term) count (partial agg), term- and
    class-keyed window sums for the marginals, broadcast 1-row N/V;
    the rank window partitions by class over the (class, term) frame.

    Output: (class_col, term, n_class_term, n_term, z) — z rounded 6.
    """

    def __init__(self, text_col: str = "text", class_col: str = "lang",
                 alpha: float = 0.5, top_n: int = 10,
                 min_count: int = 1, label=None):
        super().__init__(label)
        if not float(alpha) > 0:
            raise ValueError(f"alpha {alpha}: need > 0")
        if int(top_n) < 1:
            raise ValueError(f"top_n {top_n}: need >= 1")
        if int(min_count) < 1:
            raise ValueError(f"min_count {min_count}: need >= 1")
        self.text_col, self.class_col = text_col, class_col
        self.alpha, self.top_n = float(alpha), int(top_n)
        self.min_count = int(min_count)

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        tc, cc, a = self.text_col, self.class_col, self.alpha
        toks = F.filter(tokens(tc), lambda w: w != "")
        base = (pcoll.df
                .where(F.col(tc).isNotNull() & F.col(cc).isNotNull())
                .select(F.col(cc).alias("__k"),
                        F.explode(toks).alias("__w")))
        ckw = base.groupBy("__k", "__w").agg(
            F.count(F.lit(1)).cast("long").alias("ckw"))
        wt = Window.partitionBy("__w")
        wk = Window.partitionBy("__k")
        tot = (ckw
               .withColumn("cw", F.sum("ckw").over(wt))
               .withColumn("nk", F.sum("ckw").over(wk)))
        nv = ckw.agg(F.sum("ckw").cast("long").alias("N"),
                     F.count_distinct("__w").cast("long").alias("V"))
        d = (tot.crossJoin(F.broadcast(nv))
             .where(F.col("cw") >= self.min_count))
        ck, cw = F.col("ckw").cast("double"), F.col("cw").cast("double")
        nk, N = F.col("nk").cast("double"), F.col("N").cast("double")
        V = F.col("V").cast("double")
        rw = cw - ck
        delta = (F.log((ck + a) / (nk + a * V - ck - a))
                 - F.log((rw + a) / (N - nk + a * V - rw - a)))
        var = 1.0 / (ck + a) + 1.0 / (rw + a)
        scored = d.withColumn("__z", F.round(delta / F.sqrt(var), 6))
        wr = Window.partitionBy("__k").orderBy(F.col("__z").desc(),
                                               F.col("__w"))
        out = (scored.withColumn("__r", F.row_number().over(wr))
               .where(F.col("__r") <= self.top_n)
               .select(F.col("__k").alias(cc),
                       F.col("__w").alias("term"),
                       F.col("ckw").alias("n_class_term"),
                       F.col("cw").alias("n_term"),
                       F.col("__z").alias("z")))
        return pcoll.with_df(out)


class TextRank(PTransform):
    """TextRank keyword scoring (Mihalcea & Tarau, EMNLP 2004) over a
    corpus: terms are nodes, adjacent-token co-occurrence counts are
    symmetric edge weights, and weighted PageRank ranks the terms —
    the unsupervised keyword extractor for corpus labeling / topic
    seeding, here run corpus-wide (per-document TextRank is the same
    graph built per doc; corpus-wide is the variant that needs a
    cluster).

    Construction: whitespace-lowercase tokens (the corpus-wide `tokens`
    convention), zipped adjacent pairs, canonical (least, greatest)
    pair counts with ``min_count`` support pruning, then BOTH
    directions emitted with the combined count as weight — the
    undirected-graph convention of the paper expressed on a directed
    PageRank. Scoring delegates to the fixed-iteration weighted
    PageRank operator (deterministic, value-oracle-able; see its
    docstring for the per-round scale posture).

    ``min_token_len`` drops short function-word tokens cheaply (the
    paper uses POS filters; a length floor is the language-agnostic
    stand-in and keeps the graph vocabulary-bounded).

    Output: (node, pr) — the term and its TextRank score (round 9).
    """

    def __init__(self, text_col: str = "text", min_count: int = 2,
                 min_token_len: int = 2, iterations: int = 5,
                 damping: float = 0.85, label=None):
        super().__init__(label)
        if int(min_count) < 1:
            raise ValueError(f"min_count {min_count}: need >= 1")
        if int(min_token_len) < 1:
            raise ValueError(f"min_token_len {min_token_len}: need "
                             ">= 1 (0 would admit empty tokens as "
                             "graph nodes)")
        self.text_col = text_col
        self.min_count = int(min_count)
        self.min_token_len = int(min_token_len)
        self.iterations = int(iterations)
        self.damping = float(damping)

    def expand(self, pcoll: PCollection) -> PCollection:
        from beam_spark.operators.graph import PageRank

        tc = self.text_col
        toks = F.filter(
            tokens(tc),
            lambda x: F.length(x) >= F.lit(self.min_token_len))
        base = (pcoll.df.where(F.col(tc).isNotNull())
                .select(toks.alias("__toks")))
        n = F.size(F.col("__toks"))
        pairs = F.when(n > 1, F.zip_with(
            F.slice(F.col("__toks"), 1, n - 1),
            F.slice(F.col("__toks"), 2, n - 1),
            lambda a, b: F.struct(F.least(a, b).alias("a"),
                                  F.greatest(a, b).alias("b"))))
        und = (base.select(F.explode(pairs).alias("p"))
               .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
               .where(F.col("a") != F.col("b"))
               .groupBy("a", "b")
               .agg(F.count(F.lit(1)).cast("long").alias("c"))
               .where(F.col("c") >= self.min_count))
        edges = (und.select(F.col("a").alias("src"),
                            F.col("b").alias("dst"),
                            F.col("c").cast("double").alias("w"))
                 .unionByName(
                     und.select(F.col("b").alias("src"),
                                F.col("a").alias("dst"),
                                F.col("c").cast("double").alias("w"))))
        return (PCollection(edges)
                | PageRank(weight="w", damping=self.damping,
                           iterations=self.iterations))
