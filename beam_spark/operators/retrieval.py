"""Lexical retrieval over document corpora: BM25 top-k scoring.

The reference's RAG enrichment delegates vector search to external
services (ml/rag/enrichment/*); classic lexical retrieval has no Beam
counterpart at all. Here the inverted index IS a DataFrame — (term,
doc, tf) — so BM25 is three keyed joins and a window top-k, all
JVM-side.

Scale design: the corpus statistics (doc lengths, document frequencies)
are one aggregation pass each; query terms are tiny and broadcast; the
scoring join is keyed on the term, so fan-in per term is its posting
list — the classic inverted-index shape. Ranking uses the ROUNDED
score (6 dp) with doc-id tie-break, which makes the top-k reproducible
across engines and partial-aggregation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform
from beam_spark.operators.text import tokens


class Bm25TopK(PTransform):
    """Okapi BM25 (Lucene idf variant) top-k documents per query.

    score(q, d) = sum over distinct q terms t of
        ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        * tf_td * (k1 + 1) / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

    Output: (query_id, doc_id, rank, score) with rank over
    (round(score, 6) DESC, doc_id) — deterministic under ties.

    ``mode``: 'or' (default) scores any document sharing a term with
    the query; 'and' keeps only documents containing EVERY distinct
    query term (conjunctive retrieval — the matched-term count per
    (query, doc) must equal the query's term count, checked against a
    broadcast per-query count); 'phrase' is 'and' plus a contiguous
    containment filter — the document's token sequence must contain the
    whole query text as a phrase (semi-join against PhraseMatch; same
    small-query-set posture, positional postings are the large-Q path).
    """

    def __init__(self, queries: DataFrame | PCollection, k: int = 10,
                 k1: float = 1.2, b: float = 0.75,
                 text_col: str = "text", id_col: str = "doc_id",
                 query_id_col: str = "query_id",
                 query_text_col: str = "text", mode: str = "or",
                 label=None):
        super().__init__(label)
        self.queries = queries.df if isinstance(queries, PCollection) else queries
        self.k, self.k1, self.b = k, k1, b
        self.text_col, self.id_col = text_col, id_col
        self.query_id_col, self.query_text_col = query_id_col, query_text_col
        if mode not in ("or", "and", "phrase"):
            raise ValueError(mode)
        self.mode = mode

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        idc, k1, b = self.id_col, float(self.k1), float(self.b)
        toks = pcoll.df.select(F.col(idc),
                               tokens(self.text_col).alias("__t"))
        # postings: (term, doc, tf) + doc length
        postings = (toks.select(idc, F.size("__t").alias("dl"),
                                F.explode("__t").alias("term"))
                    .groupBy(idc, "dl", "term")
                    .agg(F.count(F.lit(1)).alias("tf")))
        stats = toks.agg(F.count(F.lit(1)).alias("N"),
                         F.avg(F.size("__t")).alias("avgdl"))
        dfreq = postings.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"))

        # optional per-term boosts: a 'boost' MAP<string,double> column
        # on the query frame scales each matching term's contribution
        # (Lucene query-time boosting); absent terms default to 1.0
        has_boost = "boost" in self.queries.columns
        qterms = (self.queries
                  .select(F.col(self.query_id_col).alias("query_id"),
                          *([F.col("boost")] if has_boost else []),
                          F.explode(F.array_distinct(
                              tokens(self.query_text_col))).alias("term")))
        if has_boost:
            qterms = qterms.select(
                "query_id", "term",
                F.coalesce(F.element_at("boost", F.col("term")),
                           F.lit(1.0)).alias("__boost"))
        else:
            qterms = qterms.withColumn("__boost", F.lit(1.0))

        idf = F.log(F.lit(1.0) + (F.col("N") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5))
        tf_part = (F.col("tf") * (k1 + 1)
                   / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                          / F.col("avgdl"))))
        # document frequencies restricted to the QUERY terms before any
        # broadcast — dfreq itself is vocabulary-sized and must stay
        # distributed; the restriction is at most |query terms| rows
        q_df = dfreq.join(
            F.broadcast(qterms.select("term").distinct()), on="term")
        scored = (postings
                  .join(F.broadcast(qterms), on="term")
                  .join(F.broadcast(q_df), on="term")
                  .crossJoin(F.broadcast(stats))
                  .groupBy("query_id", idc)
                  .agg(F.round(F.sum(idf * tf_part * F.col("__boost")),
                               6).alias("score"),
                       F.count(F.lit(1)).alias("__nm")))
        if self.mode in ("and", "phrase"):
            # conjunctive: matched-term count == the query's distinct
            # term count (postings are one row per (doc, term), so the
            # group size IS the matched count)
            qn = qterms.groupBy("query_id").agg(
                F.count(F.lit(1)).alias("__qn"))
            scored = (scored.join(F.broadcast(qn), on="query_id")
                      .filter(F.col("__nm") == F.col("__qn")))
        if self.mode == "phrase":
            contained = (pcoll | PhraseMatch(
                self.queries.select(
                    F.col(self.query_id_col).alias("query_id"),
                    F.col(self.query_text_col).alias("phrase")),
                text_col=self.text_col, id_col=idc)).df
            scored = scored.join(contained.select("query_id", idc),
                                 on=["query_id", idc], how="leftsemi")
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col(idc))
        out = (scored.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= self.k)
               .select("query_id", idc, "rank", "score"))
        return pcoll.with_df(out)


class Bm25fTopK(PTransform):
    """BM25F (Robertson, Zaragoza & Taylor, CIKM 2004 — "Simple BM25
    extension to multiple weighted fields"): multi-field lexical
    retrieval where each field gets its own weight and length
    normalization, and saturation is applied ONCE to the combined
    weighted term frequency (the whole point vs summing per-field BM25
    scores, which over-counts a term present in many fields):

        tf~(t, d) = sum over fields f of
            w_f * tf_tdf / (1 - b_f + b_f * dl_df / avgdl_f)
        score(q, d) = sum over distinct q terms t of
            ln(1 + (N - df_t + 0.5) / (df_t + 0.5))    # Lucene idf
            * tf~(t, d) / (k1 + tf~(t, d))

    ``fields``: {column: (weight, b)} or {column: (weight, b,
    analyzer)} — analyzer is ``None``/"whitespace" (default),
    "alnum" (punctuation-robust: lowercase, split on non-alphanumeric
    runs), or a callable ``col -> array<string> Column``; fields with
    different analyzers still share one term space, so the combined
    weighted tf stays a single per-(doc, term) sum.
    ``query_analyzer`` tokenizes the query text (same options).
    ``mode``: 'or' (default); 'and' keeps only docs containing every
    distinct query term in at least one field; 'phrase' additionally
    requires the query text to occur CONTIGUOUSLY in at least one
    field (per-field positional postings via PositionalPhraseMatch,
    each field tokenized by its own analyzer).
    Document frequency df_t counts documents containing t in ANY
    field; avgdl is per field.

    Output: (query_id, doc_id, rank, score), rank over (round(score,
    6) DESC, doc_id) — deterministic under ties.

    Scale: all fields tokenize in ONE scan (array-of-structs explode,
    one row per field); per-field stats are a |fields|-row broadcast;
    the scoring join is term-keyed like single-field BM25, with the
    same query-term restriction before any broadcast.
    """

    @staticmethod
    def _analyzer(a):
        from beam_spark.operators.text import tokens_alnum

        if a is None or a == "whitespace":
            return tokens
        if a == "alnum":
            return tokens_alnum
        if callable(a):
            return a
        raise ValueError(f"unknown analyzer {a!r} (use 'whitespace', "
                         "'alnum', or a col -> Column callable)")

    def __init__(self, queries: DataFrame | PCollection, fields,
                 k: int = 10, k1: float = 1.2,
                 id_col: str = "doc_id", query_id_col: str = "query_id",
                 query_text_col: str = "text", query_analyzer=None,
                 mode: str = "or", label=None):
        super().__init__(label)
        self.queries = (queries.df if isinstance(queries, PCollection)
                        else queries)
        if mode not in ("or", "and", "phrase"):
            raise ValueError(mode)
        self.mode = mode
        self.fields = {}
        for c, spec in dict(fields).items():
            spec = tuple(spec)
            self.fields[c] = (float(spec[0]), float(spec[1]),
                              self._analyzer(spec[2] if len(spec) > 2
                                             else None))
        if not self.fields:
            raise ValueError("fields must be non-empty")
        self.k, self.k1 = k, float(k1)
        self.id_col = id_col
        self.query_id_col, self.query_text_col = (query_id_col,
                                                  query_text_col)
        self.query_tokens = self._analyzer(query_analyzer)

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        idc, k1 = self.id_col, self.k1
        df = pcoll.df
        # every field tokenized in one scan: explode an array of
        # (field, tokens) structs into long format
        exploded = (df.select(
            F.col(idc),
            F.explode(F.array(*[
                F.struct(F.lit(c).alias("__f"),
                         F.coalesce(an(c), F.array()).alias("__t"))
                for c, (_w, _b, an) in self.fields.items()]))
            .alias("fx"))
            .select(idc, F.col("fx.__f").alias("__f"),
                    F.col("fx.__t").alias("__t")))
        postf = (exploded
                 .select(idc, "__f", F.size("__t").alias("dl"),
                         F.explode("__t").alias("term"))
                 .groupBy(idc, "__f", "dl", "term")
                 .agg(F.count(F.lit(1)).alias("tf")))
        avgdl = exploded.groupBy("__f").agg(
            F.avg(F.size("__t")).alias("avgdl"))
        stats = df.agg(F.count(F.lit(1)).alias("N"))
        # per-field weight / b as expressions over the field label
        w_expr = F.lit(None).cast("double")
        b_expr = F.lit(None).cast("double")
        for c, (w, b, _an) in self.fields.items():
            w_expr = F.when(F.col("__f") == c, F.lit(w)).otherwise(w_expr)
            b_expr = F.when(F.col("__f") == c, F.lit(b)).otherwise(b_expr)
        wtf = (postf.join(F.broadcast(avgdl), on="__f")
               .withColumn("__wtf", w_expr * F.col("tf")
                           / (F.lit(1.0) - b_expr
                              + b_expr * F.col("dl") / F.col("avgdl")))
               .groupBy(idc, "term")
               .agg(F.sum("__wtf").alias("wtf")))
        # df_t at the DOCUMENT level: a doc counts once however many
        # fields contain the term
        dfreq = (postf.select("term", idc).distinct()
                 .groupBy("term").agg(F.count(F.lit(1)).alias("df")))
        qterms = (self.queries
                  .select(F.col(self.query_id_col).alias("query_id"),
                          F.explode(F.array_distinct(
                              self.query_tokens(self.query_text_col)))
                          .alias("term")))
        q_df = dfreq.join(
            F.broadcast(qterms.select("term").distinct()), on="term")
        idf = F.log(F.lit(1.0) + (F.col("N") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5))
        scored = (wtf.join(F.broadcast(qterms), on="term")
                  .join(F.broadcast(q_df), on="term")
                  .crossJoin(F.broadcast(stats))
                  .groupBy("query_id", idc)
                  .agg(F.round(F.sum(idf * F.col("wtf")
                                     / (k1 + F.col("wtf"))), 6)
                       .alias("score"),
                       F.count(F.lit(1)).alias("__nm")))
        if self.mode in ("and", "phrase"):
            # conjunctive across fields: the doc must contain EVERY
            # distinct query term in at least one field (wtf is one
            # row per (doc, term) whatever field carried it)
            qn = qterms.groupBy("query_id").agg(
                F.count(F.lit(1)).alias("__qn"))
            scored = (scored.join(F.broadcast(qn), on="query_id")
                      .filter(F.col("__nm") == F.col("__qn")))
        if self.mode == "phrase":
            # the whole query text must occur CONTIGUOUSLY in at least
            # ONE field, tokenized by that field's own analyzer —
            # per-field positional postings, union of the matches
            phrases = self.queries.select(
                F.col(self.query_id_col).alias("query_id"),
                F.col(self.query_text_col).alias("phrase"))
            hits = None
            for c, (_w, _b, an) in self.fields.items():
                m = (pcoll | PositionalPhraseMatch(
                    phrases, text_col=c, id_col=idc,
                    analyzer=an)).df.select("query_id", idc)
                hits = m if hits is None else hits.unionByName(m)
            scored = scored.join(hits.distinct(),
                                 on=["query_id", idc], how="leftsemi")
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col(idc))
        out = (scored.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= self.k)
               .select("query_id", idc, "rank", "score"))
        return pcoll.with_df(out)


class RrfFuse(PTransform):
    """Reciprocal-rank fusion (Cormack et al. 2009) of two or more
    rankings — the standard hybrid-search combiner (lexical BM25 +
    vector ANN): score(d) = sum over rankings r of 1 / (k0 + rank_r(d)).
    Rank-based, so fusion is immune to incomparable score scales AND to
    float noise (the inputs are integer ranks).

    Input frames share (query_id, id_col, rank); a doc absent from one
    ranking simply contributes nothing there. Output: (query_id,
    id_col, rank, rrf_score) — top-k per query, ties broken by id.

    Scale: a union + one groupBy on (query, doc) + one window per
    query; input rankings are already top-k-bounded, so every stage is
    k*queries-sized regardless of corpus size.
    """

    def __init__(self, *rankings, k: int = 10, k0: int = 60,
                 id_col: str = "doc_id", weights=None, label=None):
        super().__init__(label)
        if len(rankings) < 2:
            raise ValueError("RrfFuse needs at least two rankings")
        self.rankings = [r.df if isinstance(r, PCollection) else r
                         for r in rankings]
        self.k, self.k0, self.id_col = k, int(k0), id_col
        #: optional per-ranking weights (weighted RRF: score =
        #: sum w_r / (k0 + rank_r)) — e.g. lean hybrid search toward
        #: the lexical or the vector leg. Defaults to all-1.0.
        if weights is not None and len(weights) != len(self.rankings):
            raise ValueError("one weight per ranking")
        self.weights = ([float(w) for w in weights] if weights
                        else [1.0] * len(self.rankings))

    def expand(self, pcoll: PCollection) -> PCollection:
        from functools import reduce
        from pyspark.sql import Window

        idc, k0 = self.id_col, self.k0
        parts = [r.select("query_id", idc, "rank",
                          F.lit(w).alias("__w"))
                 for r, w in zip(self.rankings, self.weights)]
        unioned = reduce(lambda a, b: a.unionByName(b), parts)
        # integer-exact scoring: sum of w/(k0+rank) rounded at 9 dp —
        # every addend is one of a few hundred exact grid values, so
        # cross-engine float agreement is structural, not lucky
        scored = (unioned
                  .groupBy("query_id", idc)
                  .agg(F.round(F.sum(F.col("__w")
                                     / (F.col("rank") + k0)), 9)
                       .alias("rrf_score")))
        w = Window.partitionBy("query_id").orderBy(
            F.col("rrf_score").desc(), F.col(idc))
        out = (scored.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= self.k)
               .select("query_id", idc, "rank", "rrf_score"))
        return pcoll.with_df(out)


class PhraseMatch(PTransform):
    """Exact token-phrase containment: for each (query_id, phrase) find
    the documents whose token sequence contains the phrase contiguously,
    with the occurrence count.

    Implementation is a pure expression: both sides normalize to a
    space-joined token string with sentinel spaces, so phrase presence
    is substring containment and the count is a length-difference
    division — no explode, no join key, zero shuffle beyond the
    broadcast of the (small) query set. The classic positional-postings
    index is the alternative when the query set is itself huge; at that
    point build (term, doc, positions) once and join on the rarest
    term.

    Output: (query_id, doc_id, n_occurrences) for docs with >= 1
    occurrence.
    """

    def __init__(self, queries: DataFrame | PCollection,
                 text_col: str = "text", id_col: str = "doc_id",
                 query_id_col: str = "query_id",
                 phrase_col: str = "phrase", label=None):
        super().__init__(label)
        self.queries = queries.df if isinstance(queries, PCollection) else queries
        self.text_col, self.id_col = text_col, id_col
        self.query_id_col, self.phrase_col = query_id_col, phrase_col

    def expand(self, pcoll: PCollection) -> PCollection:
        idc = self.id_col
        norm_doc = F.concat(F.lit(" "),
                            F.concat_ws(" ", tokens(self.text_col)),
                            F.lit(" "))
        norm_q = F.concat(F.lit(" "),
                          F.concat_ws(" ", tokens(self.phrase_col)),
                          F.lit(" "))
        qs = (self.queries
              .select(F.col(self.query_id_col).alias("query_id"),
                      norm_q.alias("__p")))
        docs = pcoll.df.select(F.col(idc), norm_doc.alias("__t"))
        # occurrences of " p1 p2 " in " t1 t2 ... ": standard
        # left-to-right NON-OVERLAPPING replace in both engines — count
        # = length drop / (phrase length - 1). Adjacent repeats sharing
        # one boundary space count once per scan (documented; presence
        # testing is exact).
        n_occ = ((F.length("__t")
                  - F.length(F.replace(F.col("__t"), F.col("__p"),
                                       F.lit(" "))))
                 / (F.length("__p") - 1)).cast("long")
        out = (docs.crossJoin(F.broadcast(qs))
               .withColumn("n_occurrences", n_occ)
               .filter(F.col("n_occurrences") >= 1)
               .select("query_id", idc, "n_occurrences"))
        return pcoll.with_df(out)


class PositionalPhraseMatch(PTransform):
    """Phrase containment via a POSITIONAL POSTINGS index — the scale
    path for LARGE query sets, where PhraseMatch's broadcast-and-scan
    (every doc string scanned once per query) stops being viable.

    Plan: (doc, term, position) postings from one posexplode; query
    phrases explode to (query, offset, term); the candidate join is
    KEYED ON THE TERM (distributed equijoin — no query broadcast, no
    per-query corpus scan); a candidate start position is an occurrence
    iff every phrase offset matched at start+offset, which is one
    groupBy counting distinct offsets per (query, doc, start).

    Output: (query_id, doc_id, n_occurrences) for docs with >= 1
    occurrence. Unlike PhraseMatch's non-overlapping replace count,
    n_occurrences counts ALL start positions (overlapping included);
    presence (>= 1) agrees exactly — asserted in pytest.

    Scale: shuffles are keyed on term (posting-list fan-in) then on
    (query, doc, start). ``anchor='all'`` joins EVERY phrase term's
    posting list — a stop-word phrase term costs its whole list.
    ``anchor='rarest'`` first measures per-term document frequency
    (restricted to the phrase terms — a broadcast-bounded frame), joins
    only the RAREST term's postings to generate candidate starts, then
    verifies the other offsets with one keyed (term, doc, pos)
    equijoin: the classic rarest-term-first inverted-index plan, so a
    stop word in the phrase no longer drags its posting list through
    the candidate stage."""

    def __init__(self, queries: DataFrame | PCollection,
                 text_col: str = "text", id_col: str = "doc_id",
                 query_id_col: str = "query_id",
                 phrase_col: str = "phrase", anchor: str = "all",
                 analyzer=None, label=None):
        super().__init__(label)
        self.queries = queries.df if isinstance(queries, PCollection) else queries
        self.text_col, self.id_col = text_col, id_col
        self.query_id_col, self.phrase_col = query_id_col, phrase_col
        if anchor not in ("all", "rarest"):
            raise ValueError(anchor)
        self.anchor = anchor
        # same analyzer options as Bm25fTopK; applied to BOTH the doc
        # text and the phrase so positions live in one token space
        self.tokens = Bm25fTopK._analyzer(analyzer)

    def expand(self, pcoll: PCollection) -> PCollection:
        idc = self.id_col
        post = (pcoll.df
                .select(F.col(idc),
                        self.tokens(self.text_col).alias("__t"))
                .select(idc, F.posexplode("__t").alias("pos", "term")))
        qt = (self.queries
              .select(F.col(self.query_id_col).alias("query_id"),
                      self.tokens(self.phrase_col).alias("__p"))
              .select("query_id", F.size("__p").alias("plen"),
                      F.posexplode("__p").alias("off", "term")))
        if self.anchor == "rarest":
            return pcoll.with_df(self._rarest(post, qt, idc))
        starts = (post.join(qt, on="term")
                  .select("query_id", idc, "plen",
                          (F.col("pos") - F.col("off")).alias("start"),
                          "off"))
        occ = (starts.groupBy("query_id", idc, "plen", "start")
               # a start is a real occurrence iff every offset 0..plen-1
               # matched there; offsets are distinct per (query, start)
               # only if the phrase has no repeated term at equal
               # alignment — count DISTINCT offsets to be exact
               .agg(F.count_distinct("off").alias("__hit"))
               .filter(F.col("__hit") == F.col("plen"))
               .groupBy("query_id", idc)
               .agg(F.count(F.lit(1)).alias("n_occurrences")))
        return pcoll.with_df(occ)

    def _rarest(self, post, qt, idc):
        # 1. document frequency of the PHRASE terms only (broadcast-
        #    bounded: at most |distinct query terms| rows). DOCUMENT
        #    frequency (distinct docs containing the term), not total
        #    occurrences — a term repeated many times in few documents
        #    has a SHORT candidate list and must still win the anchor
        dfreq = (post.join(F.broadcast(qt.select("term").distinct()),
                           on="term")
                 .select("term", idc).distinct()
                 .groupBy("term").agg(F.count(F.lit(1)).alias("__df")))
        # 2. per query: the offset of its rarest term (ties: lowest
        #    offset). A term absent from the corpus gets df=0 — it wins
        #    and correctly yields zero candidates.
        anch = (qt.join(F.broadcast(dfreq), on="term", how="left")
                .fillna({"__df": 0})
                .groupBy("query_id", "plen")
                .agg(F.min_by(F.struct("off", "term"),
                              F.struct("__df", "off")).alias("__a"))
                .select("query_id", "plen", F.col("__a.off").alias("off"),
                        F.col("__a.term").alias("term")))
        # 3. candidate starts from ONLY the rarest term's posting list
        cand = (post.join(F.broadcast(anch), on="term")
                .select("query_id", idc, "plen",
                        (F.col("pos") - F.col("off")).alias("start")))
        # 4. verify every other offset with one keyed equijoin on
        #    (term, doc, pos) — candidates x plen probe rows
        need = qt.select("query_id", "off", "term")
        probes = (cand.join(F.broadcast(need), on="query_id")
                  .withColumn("pos", F.col("start") + F.col("off")))
        occ = (probes.join(post, on=["term", idc, "pos"], how="inner")
               .groupBy("query_id", idc, "plen", "start")
               .agg(F.count_distinct("off").alias("__hit"))
               .filter(F.col("__hit") == F.col("plen"))
               .groupBy("query_id", idc)
               .agg(F.count(F.lit(1)).alias("n_occurrences")))
        return occ


class MmrRerank(PTransform):
    """Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein
    1998) — the standard diversity pass between retrieval and a RAG
    prompt: greedily pick k results maximizing

        mmr(d) = lam * score(d) - (1-lam) * max_{s in S} cos(d, s)

    (S = already-selected set; the first pick has no diversity term,
    so it is the plain top-score hit). Deduplicates near-identical
    passages a plain top-k would stack.

    Input: a candidate frame (query_col, doc_col, score_col) — the
    bounded per-query output of any retriever (Bm25TopK, ANN top-k,
    RrfFuse); ``vectors`` maps doc ids to embeddings. Determinism
    convention (the ANN-suite pattern): scores are consumed rounded
    to 6, pairwise cosines round to 6 before the max, the greedy
    argmax ranks on round(mmr, 6) with a doc-id tie-break, and
    ``lam`` defaults to the binary-exact 0.75, and the objective
    itself stays UNROUNDED (identical IEEE ops on identical round-6
    inputs) — so a recursive-CTE oracle replays the selection
    exactly.

    Scale: one id-keyed join ships each candidate's vector, then one
    shuffle on query_id into applyInPandas; the greedy loop is
    O(k * n_cand) numpy per query over the RETRIEVER-BOUNDED
    candidate set (tens to hundreds of rows), never the corpus.

    Output: (query_col, doc_col, rank 1..k, mmr RAW double — with
    round-6 inputs it is bit-identical across engines; rounding it
    would land on exact half-boundaries where half-case rules
    differ).
    """

    def __init__(self, vectors, k: int = 10, lam: float = 0.75,
                 query_col: str = "query_id", doc_col: str = "doc_id",
                 score_col: str = "score", id_col: str = "vec_id",
                 vec_col: str = "embedding", label=None):
        super().__init__(label)
        if not 0.0 <= float(lam) <= 1.0:
            raise ValueError(f"lam {lam} outside [0, 1]")
        self.vectors = (vectors.df if isinstance(vectors, PCollection)
                        else vectors)
        self.k, self.lam = int(k), float(lam)
        self.query_col, self.doc_col = query_col, doc_col
        self.score_col = score_col
        self.id_col, self.vec_col = id_col, vec_col

    def expand(self, pcoll: PCollection) -> PCollection:
        import numpy as np
        import pandas as pd

        qc, dc, sc = self.query_col, self.doc_col, self.score_col
        k, lam = self.k, self.lam
        vec = self.vectors.select(
            F.col(self.id_col).alias(dc),
            F.col(self.vec_col).alias("__v"))
        df = pcoll.df.select(qc, dc, sc).join(vec, on=dc)
        qt = dict((f.name, f.dataType.simpleString())
                  for f in df.schema.fields)
        schema = (f"{qc} {qt[qc]}, {dc} {qt[dc]}, rank int, mmr double")

        def fn(pdf):
            pdf = pdf.sort_values([sc, dc], ascending=[False, True],
                                  kind="mergesort")
            ids = pdf[dc].to_numpy()
            scores = np.round(pdf[sc].to_numpy(dtype=np.float64), 6)
            mat = np.array(list(pdf["__v"]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            if (norms == 0).any():
                bad = ids[norms[:, 0] == 0][:5].tolist()
                raise ValueError(
                    "MmrRerank: zero-norm embedding(s) for doc "
                    f"id(s) {bad} — cosine similarity undefined; "
                    "filter them out before reranking")
            mat = mat / norms
            sims = np.round(mat @ mat.T, 6)
            n = len(ids)
            taken = np.zeros(n, bool)
            ms = None        # max cos to selected — can be NEGATIVE,
            out = []         # so no zero-clamped accumulator
            for r in range(1, min(k, n) + 1):
                # NO rounding on the objective: with round-6 inputs
                # the mmr arithmetic is the same IEEE sequence in any
                # engine (bit-identical doubles), while rounding it
                # would hit exact .5 boundaries (0.75 * a 6dp value)
                # where engines' half-case rules differ
                if ms is None:
                    mmr = lam * scores
                else:
                    mmr = lam * scores - (1.0 - lam) * ms
                mmr_masked = np.where(taken, -np.inf, mmr)
                best = mmr_masked.max()
                cand = np.where((mmr_masked == best) & ~taken)[0]
                pick = cand[np.argmin(ids[cand])]
                taken[pick] = True
                ms = (sims[:, pick].copy() if ms is None
                      else np.maximum(ms, sims[:, pick]))
                out.append((pdf[qc].iloc[0], ids[pick], r, mmr[pick]))
            return pd.DataFrame(out, columns=[qc, dc, "rank", "mmr"])

        out = df.groupBy(qc).applyInPandas(fn, schema)
        return pcoll.with_df(out)


class QueryLikelihoodTopK(PTransform):
    """Query-likelihood retrieval with Dirichlet smoothing (Ponte &
    Croft SIGIR'98; Zhai & Lafferty SIGIR'01) — the language-model
    ranking family next to BM25 (it wins on verbose queries and is
    the standard baseline in IR evaluation):

        score(q, d) = sum over q terms w (with query tf qtf_w) of
            qtf_w * ln((tf_wd + mu * cf_w / |C|) / (dl_d + mu))

    cf_w = collection frequency, |C| = total corpus tokens. Query
    terms absent from the corpus (cf = 0) are dropped (ln 0 is
    -inf; the smoothing only covers terms the collection has seen).

    Unlike BM25's sparse match join, QL scores EVERY document against
    every query term (the smoothed miss-mass differs per document
    length): the scoring frame is |query terms| x N_docs — the
    small-query-set posture. For large query sets, prefilter
    candidates with Bm25TopK and rerank with this.

    Determinism: per-term ln values cast to decimal(16,9) times the
    integer query tf (exact 25,9 products, order-free sums — the
    NaiveBayes convention); rank over (round(score, 6) DESC, doc_id).

    Output: (query_id, doc_id, rank, score round 6), rank <= k.
    """

    def __init__(self, queries, k: int = 10, mu: float = 2000.0,
                 text_col: str = "text", id_col: str = "doc_id",
                 query_id_col: str = "query_id",
                 query_text_col: str = "text", label=None):
        super().__init__(label)
        self.queries = (queries.df if isinstance(queries, PCollection)
                        else queries)
        self.k, self.mu = int(k), float(mu)
        if self.mu <= 0:
            raise ValueError("mu must be > 0")
        self.text_col, self.id_col = text_col, id_col
        self.query_id_col = query_id_col
        self.query_text_col = query_text_col

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        idc, mu = self.id_col, self.mu
        # drop '' tokens (whitespace-only text splits to ['']) — the
        # NaiveBayes/TextRank convention; a phantom '' would inflate
        # dl, enter postings/cf, and score as a query term
        toks = pcoll.df.select(
            F.col(idc),
            F.filter(tokens(self.text_col),
                     lambda x: x != "").alias("__t"))
        doclen = toks.select(idc, F.size("__t").alias("dl"))
        postings = (toks.select(idc, F.explode("__t").alias("term"))
                    .groupBy(idc, "term")
                    .agg(F.count(F.lit(1)).cast("long").alias("tf")))
        cf = postings.groupBy("term").agg(
            F.sum("tf").cast("long").alias("cf"))
        csize = cf.agg(F.sum("cf").cast("long").alias("C"))
        qt = (self.queries
              .select(F.col(self.query_id_col).alias("query_id"),
                      F.explode(
                          F.filter(tokens(self.query_text_col),
                                   lambda x: x != ""))
                      .alias("term"))
              .groupBy("query_id", "term")
              .agg(F.count(F.lit(1)).cast("long").alias("qtf"))
              .join(cf, "term")                 # cf = 0 terms dropped
              .crossJoin(F.broadcast(csize)))
        grid = (qt.crossJoin(doclen)
                .join(postings.withColumnRenamed("tf", "__tf"),
                      ["term", idc], "left"))
        tf = F.coalesce(F.col("__tf"), F.lit(0)).cast("double")
        lnterm = F.log(
            (tf + F.lit(mu) * (F.col("cf").cast("double")
                               / F.col("C").cast("double")))
            / (F.col("dl").cast("double") + F.lit(mu)))
        scored = (grid
                  .withColumn("__v", F.col("qtf").cast("decimal(9,0)")
                              * lnterm.cast("decimal(16,9)"))
                  .groupBy("query_id", idc)
                  .agg(F.round(F.sum("__v").cast("double"), 6)
                       .alias("score")))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.col(idc))
        out = (scored.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= self.k)
               .select("query_id", idc, "rank", "score"))
        return pcoll.with_df(out)


class Pl2TopK(PTransform):
    """DFR PL2 ranking (Amati & van Rijsbergen, TOIS 2002) — the
    divergence-from-randomness model Terrier ships as its default,
    completing the lexical-ranking triad next to BM25 (Okapi) and
    QueryLikelihoodTopK (Dirichlet LM):

        tfn      = tf * log2(1 + c * avgdl / dl)
        lambda_t = F_t / N            (collection frequency / #docs)
        term     = (1 / (tfn + 1))
                   * (tfn * log2(tfn / lambda_t)
                      + (lambda_t - tfn) * log2(e)
                      + 0.5 * log2(2*pi * tfn))
        score    = sum over query terms of qtf * term

    Query terms absent from the collection are dropped (lambda = 0
    has no PL2 score — the QL convention for cf = 0). Scores CAN be
    negative for very common terms: that is the model, not a bug.

    Determinism: per-term values cast to decimal(16,9) times the
    integer query tf (exact products, order-free sums — the
    NaiveBayes convention); rank over (round(score, 6) DESC, doc_id).

    Scale: term-keyed postings joins, the same posture as Bm25TopK —
    only documents CONTAINING a query term are scored (no miss-mass
    grid), so the scoring frame is postings-bounded.

    Output: (query_id, doc_id, rank, score round 6), rank <= k.
    """

    _LOG2E = 1.4426950408889634
    _TWO_PI = 6.283185307179586

    def __init__(self, queries, k: int = 10, c: float = 1.0,
                 text_col: str = "text", id_col: str = "doc_id",
                 query_id_col: str = "query_id",
                 query_text_col: str = "text", label=None):
        super().__init__(label)
        self.queries = (queries.df if isinstance(queries, PCollection)
                        else queries)
        self.k, self.c = int(k), float(c)
        if self.c <= 0:
            raise ValueError("c must be > 0")
        self.text_col, self.id_col = text_col, id_col
        self.query_id_col = query_id_col
        self.query_text_col = query_text_col

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        idc, c = self.id_col, self.c
        toks = pcoll.df.select(
            F.col(idc),
            F.filter(tokens(self.text_col),
                     lambda x: x != "").alias("__t"))
        postings = (toks.select(idc, F.size("__t").alias("dl"),
                                F.explode("__t").alias("term"))
                    .groupBy(idc, "dl", "term")
                    .agg(F.count(F.lit(1)).cast("long").alias("tf")))
        stats = toks.agg(F.count(F.lit(1)).cast("long").alias("N"),
                         F.avg(F.size("__t")).alias("avgdl"))
        cf = postings.groupBy("term").agg(
            F.sum("tf").cast("long").alias("cf"))
        qt = (self.queries
              .select(F.col(self.query_id_col).alias("query_id"),
                      F.explode(
                          F.filter(tokens(self.query_text_col),
                                   lambda x: x != ""))
                      .alias("term"))
              .groupBy("query_id", "term")
              .agg(F.count(F.lit(1)).cast("long").alias("qtf"))
              .join(cf, "term"))              # cf = 0 terms dropped

        j = (postings.join(F.broadcast(qt), "term")
             .crossJoin(F.broadcast(stats)))
        tf_d = F.col("tf").cast("double")
        lam = F.col("cf").cast("double") / F.col("N").cast("double")
        tfn = tf_d * F.log2(F.lit(1.0) + F.lit(c) * F.col("avgdl")
                            / F.col("dl").cast("double"))
        inner = (tfn * F.log2(tfn / lam)
                 + (lam - tfn) * F.lit(self._LOG2E)
                 + F.lit(0.5) * F.log2(F.lit(self._TWO_PI) * tfn))
        term = (F.lit(1.0) / (tfn + F.lit(1.0))) * inner
        scored = (j.withColumn("__v",
                               F.col("qtf").cast("decimal(9,0)")
                               * term.cast("decimal(16,9)"))
                  .groupBy("query_id", idc)
                  .agg(F.round(F.sum("__v").cast("double"), 6)
                       .alias("score")))
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col(idc))
        out = (scored.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= self.k)
               .select("query_id", idc, "rank", "score"))
        return pcoll.with_df(out)
