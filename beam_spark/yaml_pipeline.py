"""Beam YAML front-end (SURVEY.md §3 entry point 4).

Beam reference: sdks/python/apache_beam/yaml/yaml_*.py — YAML specs map
provider names onto the same transforms (yaml_join.py:173 even compiles
joins to SQL). This is the equivalent thin frontend over beam_spark:
a linear ``transforms`` chain (the common case; explicit ``input``
wiring for multi-input transforms like Sql over several tables).

Supported types (extensible via ``register_yaml_transform``):
  ReadFromParquet/ReadFromCsv/ReadFromJson/ReadFromText: {path, ...}
  Create:        {elements: [...]}
  Filter:        {keep: "<sql predicate>"}
  MapToFields:   {fields: {out: "<sql expr>", ...}, append: bool}
  Sql:           {query: "...", name: "<view name for current pcoll>"}
  Combine:       {group_by: [cols], aggregates: {out: "<sql agg expr>"}}
  Join:          {with: <name of earlier named step>, on/condition, how}
  WindowInto:    {windowing: {type: fixed|sliding|sessions, size, ...}}
  Top:           {count, order_by: [...]}
  WriteToParquet/WriteToCsv/WriteToJson: {path, ...}

Steps may carry ``name`` to be referenced by later Join/Sql steps.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import SparkSession

from beam_spark.pcollection import PBegin, PCollection, Pipeline

_REGISTRY: dict[str, Callable] = {}


def register_yaml_transform(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def _expand(t: dict, current, named: dict, pipeline: Pipeline):
    ttype = t["type"]
    if ttype not in _REGISTRY:
        raise ValueError(f"unknown YAML transform type: {ttype}")
    return _REGISTRY[ttype](t, current, named, pipeline)


def run_yaml(spec: str | dict, spark: SparkSession | None = None) -> PCollection:
    """Build and return the pipeline described by a YAML string/dict."""
    import yaml

    if isinstance(spec, str):
        spec = yaml.safe_load(spec)
    pipeline = Pipeline(spark)
    transforms = spec["pipeline"]["transforms"]
    current = None
    named: dict[str, PCollection] = {}
    for t in transforms:
        current = _expand(t, current, named, pipeline)
        if t.get("name"):
            named[t["name"]] = current
    return current


# -- providers -----------------------------------------------------------
@register_yaml_transform("Create")
def _create(t, current, named, pipeline):
    from beam_spark.operators.core import Create

    return pipeline | Create(t["elements"], schema=t.get("schema"))


def _reader(fmt_cls):
    def fn(t, current, named, pipeline):
        kwargs = {k: v for k, v in t.items()
                  if k not in ("type", "name", "path")}
        return pipeline | fmt_cls(t["path"], **kwargs)
    return fn


@register_yaml_transform("Filter")
def _filter(t, current, named, pipeline):
    from beam_spark.operators.core import Filter

    return current | Filter(t["keep"])


@register_yaml_transform("MapToFields")
def _map_to_fields(t, current, named, pipeline):
    from pyspark.sql import functions as F

    df = current.df
    if t.get("append", True):
        for out, expr in t["fields"].items():
            df = df.withColumn(out, F.expr(str(expr)))
    else:
        df = df.select(*[F.expr(str(e)).alias(o)
                         for o, e in t["fields"].items()])
    return current.with_df(df)


@register_yaml_transform("Sql")
def _sql(t, current, named, pipeline):
    from beam_spark.sql import SqlTransform

    tables = {name: pc for name, pc in named.items()}
    if current is not None:
        tables.setdefault(t.get("input_name", "PCOLLECTION"), current)
    return tables | SqlTransform(t["query"]) if len(tables) > 1 else \
        (current | SqlTransform(t["query"], table_name=t.get("input_name", "PCOLLECTION")))


@register_yaml_transform("Combine")
def _combine(t, current, named, pipeline):
    from pyspark.sql import functions as F

    from beam_spark.operators.group import CombineGlobally, CombinePerKey

    aggs = {out: F.expr(str(e)) for out, e in t["aggregates"].items()}
    keys = t.get("group_by") or []
    if keys:
        return current | CombinePerKey(*keys, **aggs)
    return current | CombineGlobally(**aggs)


@register_yaml_transform("Join")
def _join(t, current, named, pipeline):
    from pyspark.sql import functions as F

    from beam_spark.operators.join import Join

    right = named[t["with"]]
    cond = F.expr(t["condition"]) if "condition" in t else None
    return current | Join(right.df, on=t.get("on"), how=t.get("how", "inner"),
                          condition=cond,
                          broadcast=bool(t.get("broadcast", False)))


@register_yaml_transform("WindowInto")
def _window_into(t, current, named, pipeline):
    from beam_spark.operators.window import (FixedWindows, Sessions,
                                             SlidingWindows, WindowInto)

    w = t["windowing"]
    wtype = w["type"]
    if wtype == "fixed":
        fn = FixedWindows(w["size"])
    elif wtype == "sliding":
        fn = SlidingWindows(w["size"], w["period"])
    elif wtype == "sessions":
        fn = Sessions(w["gap"])
    else:
        raise ValueError(wtype)
    return current | WindowInto(fn, ts_col=w.get("ts_col"))


@register_yaml_transform("Top")
def _top(t, current, named, pipeline):
    from beam_spark.operators.sort import TopK

    return current | TopK(t["count"], *t["order_by"])


def _writer(fmt_cls):
    def fn(t, current, named, pipeline):
        kwargs = {k: v for k, v in t.items()
                  if k not in ("type", "name", "path")}
        return current | fmt_cls(t["path"], **kwargs)
    return fn


def _register_io():
    from beam_spark.sources.io import (ReadFromAvro, ReadFromCsv,
                                       ReadFromJson, ReadFromParquet,
                                       ReadFromText, WriteToAvro,
                                       WriteToCsv, WriteToJson,
                                       WriteToParquet)

    for name, cls in [("ReadFromParquet", ReadFromParquet),
                      ("ReadFromCsv", ReadFromCsv),
                      ("ReadFromJson", ReadFromJson),
                      ("ReadFromText", ReadFromText),
                      ("ReadFromAvro", ReadFromAvro)]:
        _REGISTRY[name] = _reader(cls)
    for name, cls in [("WriteToParquet", WriteToParquet),
                      ("WriteToCsv", WriteToCsv),
                      ("WriteToJson", WriteToJson),
                      ("WriteToAvro", WriteToAvro)]:
        _REGISTRY[name] = _writer(cls)


_register_io()


@register_yaml_transform("RunInference")
def _run_inference(t, current, named, pipeline):
    """{model: linear_regression|fake, input_col, output_col, artifact?}
    — yaml_ml.py analog over the real handlers."""
    from beam_spark.ml.inference import (DeterministicFakeHandler,
                                         LinearRegressionHandler, RunInference)

    model = t.get("model", "fake")
    if model == "linear_regression":
        handler = LinearRegressionHandler(t.get("artifact"))
    elif model == "fake":
        handler = DeterministicFakeHandler()
    else:
        raise ValueError(f"unknown model {model!r} (use a python handler "
                         "via register_yaml_transform for custom models)")
    return current | RunInference(handler, t["input_col"],
                                  output_col=t.get("output_col", "prediction"),
                                  batch_size=t.get("batch_size", 256))


@register_yaml_transform("Deduplicate")
def _dedup(t, current, named, pipeline):
    """{strategy: exact|minhash_pairs|simhash_pairs, ...op kwargs}."""
    from beam_spark.operators.dedupe import (ExactDedup, MinHashLSH,
                                             SimHashNearDupPairs)

    strategy = t.get("strategy", "exact")
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "strategy")}
    cls = {"exact": ExactDedup, "minhash_pairs": MinHashLSH,
           "simhash_pairs": SimHashNearDupPairs}.get(strategy)
    if cls is None:
        raise ValueError(f"unknown dedup strategy {strategy!r}")
    return current | cls(**kwargs)


@register_yaml_transform("ReadFromTFRecord")
def _read_tfrecord(t, current, named, pipeline):
    from beam_spark.sources.tfrecord import ReadFromTFRecord

    return pipeline | ReadFromTFRecord(t["path"])


@register_yaml_transform("WriteToTFRecord")
def _write_tfrecord(t, current, named, pipeline):
    from beam_spark.sources.tfrecord import WriteToTFRecord

    return current | WriteToTFRecord(t["path"],
                                     record_col=t.get("record_col", "record"))


@register_yaml_transform("MLTransform")
def _ml_transform(t, current, named, pipeline):
    """{op: scale_to_01|scale_to_zscore|scale_to_gaussian|bucketize|
    apply_buckets_interpolated, col, ...}."""
    from beam_spark.ml.transforms import (ApplyBucketsWithInterpolation,
                                          Bucketize, ScaleTo01,
                                          ScaleToGaussian, ScaleToZScore)

    op = t["op"]
    kwargs = {k: v for k, v in t.items() if k not in ("type", "name", "op")}
    cls = {"scale_to_01": ScaleTo01, "scale_to_zscore": ScaleToZScore,
           "scale_to_gaussian": ScaleToGaussian, "bucketize": Bucketize,
           "apply_buckets_interpolated": ApplyBucketsWithInterpolation}.get(op)
    if cls is None:
        raise ValueError(f"unknown MLTransform op {op!r}")
    return current | cls(**kwargs)


def _register_curation():
    """The training-data curation / quality surface as YAML transforms:
    every op here is (DataFrame in -> DataFrame out) with plain-scalar
    or dict kwargs, so one generic adapter covers them."""
    import importlib

    specs = {
        "NormalizeText": ("beam_spark.operators.text", "NormalizeText"),
        "GopherQualityFilter": ("beam_spark.operators.text",
                                "GopherQualityFilter"),
        "RepetitionStats": ("beam_spark.operators.text", "RepetitionStats"),
        "NgramPerplexity": ("beam_spark.operators.text", "NgramPerplexity"),
        "QualityScore": ("beam_spark.operators.text", "QualityScore"),
        "LanguageId": ("beam_spark.operators.text", "LanguageId"),
        "PiiRedact": ("beam_spark.operators.text", "PiiRedact"),
        "TokenCount": ("beam_spark.operators.text", "TokenCount"),
        "HashSample": ("beam_spark.operators.combiners", "HashSample"),
        "TemperatureSample": ("beam_spark.operators.combiners",
                              "TemperatureSample"),
        "SplitByHash": ("beam_spark.operators.combiners", "SplitByHash"),
        "FuzzyDedupKeep": ("beam_spark.operators.dedupe", "FuzzyDedupKeep"),
        "ExactSubstrSpans": ("beam_spark.operators.dedupe",
                             "ExactSubstrSpans"),
        "ProfileColumns": ("beam_spark.operators.quality", "ProfileColumns"),
        "CheckConstraints": ("beam_spark.operators.quality",
                             "CheckConstraints"),
        "ChunkText": ("beam_spark.ml.chunking", "ChunkText"),
        "PackSequences": ("beam_spark.ml.chunking", "PackSequences"),
        "CurriculumBuckets": ("beam_spark.operators.quality",
                              "CurriculumBuckets"),
        "FlagOutliers": ("beam_spark.operators.quality", "FlagOutliers"),
        "LineDedup": ("beam_spark.operators.dedupe", "LineDedup"),
        "GroupByRollup": ("beam_spark.operators.group", "GroupByRollup"),
        "TimeRollup": ("beam_spark.operators.group", "TimeRollup"),
        "StratifiedSample": ("beam_spark.operators.combiners",
                             "StratifiedSample"),
        "Pivot": ("beam_spark.operators.group", "Pivot"),
        "GapFill": ("beam_spark.operators.group", "GapFill"),
        "Histogram": ("beam_spark.operators.quality", "Histogram"),
        "Ewma": ("beam_spark.operators.stats", "Ewma"),
        "HoltLinear": ("beam_spark.operators.stats", "HoltLinear"),
        "HoltWinters": ("beam_spark.operators.stats", "HoltWinters"),
        "UrlNormalize": ("beam_spark.operators.text", "UrlNormalize"),
        "MisraGries": ("beam_spark.operators.stats", "MisraGries"),
        "SortedNeighborhoodPairs": ("beam_spark.operators.dedupe",
                                    "SortedNeighborhoodPairs"),
        "JaccardPrefixJoin": ("beam_spark.operators.dedupe",
                              "JaccardPrefixJoin"),
        "CdcApply": ("beam_spark.operators.scd", "CdcApply"),
        "SeasonalDecompose": ("beam_spark.operators.stats",
                              "SeasonalDecompose"),
        "ReadabilityScore": ("beam_spark.operators.text",
                             "ReadabilityScore"),
        "RepeatByWeight": ("beam_spark.operators.combiners",
                           "RepeatByWeight"),
        "EditDistanceJoin": ("beam_spark.operators.dedupe",
                             "EditDistanceJoin"),
        "PageRank": ("beam_spark.operators.graph", "PageRank"),
        "CusumDetect": ("beam_spark.operators.stats", "CusumDetect"),
        "WeightedSample": ("beam_spark.operators.combiners",
                           "WeightedSample"),
        # round-11 session-2 families (single-frame ops only; the
        # two-frame ones — QuantileTransform, ReconcileTables — get
        # dedicated adapters below, the KsDrift pattern)
        "AssociationRules": ("beam_spark.operators.analytics",
                             "AssociationRules"),
        "BinaryClassifierMetrics": ("beam_spark.operators.quality",
                                    "BinaryClassifierMetrics"),
        "RankingMetrics": ("beam_spark.operators.quality",
                           "RankingMetrics"),
        "CohensKappa": ("beam_spark.operators.quality", "CohensKappa"),
        "FleissKappa": ("beam_spark.operators.quality", "FleissKappa"),
        "CalibrationReport": ("beam_spark.operators.quality",
                              "CalibrationReport"),
        "GroupFairnessMetrics": ("beam_spark.operators.quality",
                                 "GroupFairnessMetrics"),
        "RboOverlap": ("beam_spark.operators.quality", "RboOverlap"),
        "SkewProfile": ("beam_spark.operators.quality", "SkewProfile"),
        "PmiCollocations": ("beam_spark.operators.text",
                            "PmiCollocations"),
        "ZipfFit": ("beam_spark.operators.text", "ZipfFit"),
        "ZOrderKey": ("beam_spark.operators.scd", "ZOrderKey"),
        "KMeansLloyd": ("beam_spark.operators.similarity",
                        "KMeansLloyd"),
        "ThetaForecast": ("beam_spark.operators.stats",
                          "ThetaForecast"),
        "CrostonForecast": ("beam_spark.operators.stats",
                            "CrostonForecast"),
        "FrequentItemsets": ("beam_spark.operators.analytics",
                             "FrequentItemsets"),
        "Attribution": ("beam_spark.operators.analytics",
                        "Attribution"),
        "HilbertKey": ("beam_spark.operators.scd", "HilbertKey"),
        "IsotonicCalibration": ("beam_spark.operators.quality",
                                "IsotonicCalibration"),
        # single-frame usage (cluster column inline); the two-frame
        # clusters= form is API-only
        "SilhouetteScore": ("beam_spark.operators.similarity",
                            "SilhouetteScore"),
        "Hits": ("beam_spark.operators.graph", "Hits"),
        # round-12 session-3 single-frame families
        "LinkPrediction": ("beam_spark.operators.graph",
                           "LinkPrediction"),
        "KAnonymity": ("beam_spark.operators.quality", "KAnonymity"),
        "MannWhitneyU": ("beam_spark.operators.quality",
                         "MannWhitneyU"),
        "TwoSampleTTest": ("beam_spark.operators.quality",
                           "TwoSampleTTest"),
        "OneWayAnova": ("beam_spark.operators.quality", "OneWayAnova"),
        "ProportionsZTest": ("beam_spark.operators.quality",
                             "ProportionsZTest"),
        "MultipleTestCorrection": ("beam_spark.operators.quality",
                                   "MultipleTestCorrection"),
        "ConcentrationReport": ("beam_spark.operators.quality",
                                "ConcentrationReport"),
        "MahalanobisOutliers": ("beam_spark.operators.quality",
                                "MahalanobisOutliers"),
        "LinearFit": ("beam_spark.operators.stats", "LinearFit"),
        "LagFeatures": ("beam_spark.operators.stats", "LagFeatures"),
        "CrossCorrelation": ("beam_spark.operators.stats",
                             "CrossCorrelation"),
        "NelsonAalen": ("beam_spark.operators.stats", "NelsonAalen"),
        "KmvOverlapMatrix": ("beam_spark.operators.stats",
                             "KmvOverlapMatrix"),
        "CovarianceMatrix": ("beam_spark.operators.similarity",
                             "CovarianceMatrix"),
        "PcaProject": ("beam_spark.operators.similarity",
                       "PcaProject"),
        "RfmSegmentation": ("beam_spark.operators.analytics",
                            "RfmSegmentation"),
        "TextRank": ("beam_spark.operators.text", "TextRank"),
        "TargetEncode": ("beam_spark.ml.transforms", "TargetEncode"),
    }

    def make(mod_name, cls_name):
        def fn(t, current, named, pipeline):
            cls = getattr(importlib.import_module(mod_name), cls_name)
            kwargs = {k: v for k, v in t.items() if k not in ("type", "name")}
            return current | cls(**kwargs)
        return fn

    for yaml_name, (mod, cls) in specs.items():
        _REGISTRY[yaml_name] = make(mod, cls)


_register_curation()


@register_yaml_transform("KsDrift")
def _ks_drift(t, current, named, pipeline):
    """Two-frame drift test: ``reference:`` names another pipeline
    step whose output is the reference sample."""
    from beam_spark.operators.quality import KsDrift

    ref = named[t["reference"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "reference")}
    return current | KsDrift(ref.df, **kwargs)


@register_yaml_transform("Bm25TopK")
def _bm25_topk(t, current, named, pipeline):
    """Lexical retrieval: ``queries:`` names the query-frame step."""
    from beam_spark.operators.retrieval import Bm25TopK

    q = named[t["queries"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "queries")}
    return current | Bm25TopK(q.df, **kwargs)


@register_yaml_transform("Bm25fTopK")
def _bm25f_topk(t, current, named, pipeline):
    """Multi-field BM25F: ``queries:`` names the query-frame step;
    ``fields:`` maps column -> [weight, b]."""
    from beam_spark.operators.retrieval import Bm25fTopK

    q = named[t["queries"]]
    fields = {c: (float(w), float(b))
              for c, (w, b) in dict(t["fields"]).items()}
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "queries", "fields")}
    return current | Bm25fTopK(q.df, fields, **kwargs)


@register_yaml_transform("ScdType2Apply")
def _scd_apply(t, current, named, pipeline):
    """Type-2 dimension apply: ``dimension:`` names the step holding
    the existing dimension table."""
    from beam_spark.operators.scd import ScdType2Apply

    dim = named[t["dimension"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "dimension")}
    return current | ScdType2Apply(dim.df, **kwargs)


@register_yaml_transform("BpeEncode")
def _bpe_encode(t, current, named, pipeline):
    """{merges_path: <json artifact>} to apply a saved tokenizer, or
    {n_merges: N} to train on the incoming corpus itself."""
    from beam_spark.ml.bpe import BpeEncode, load_merges, train_bpe

    if "merges_path" in t:
        merges = load_merges(t["merges_path"])
    else:
        merges = train_bpe(current.df, text_col=t.get("text_col", "text"),
                           n_merges=t.get("n_merges", 200))
    return current | BpeEncode(merges, text_col=t.get("text_col", "text"))


@register_yaml_transform("QuantileTransform")
def _quantile_transform(t, current, named, pipeline):
    """Distribution mapping: ``reference:`` names the step whose
    output provides the target quantile function."""
    from beam_spark.ml.transforms import QuantileTransform

    ref = named[t["reference"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "reference")}
    return current | QuantileTransform(ref.df, **kwargs)


@register_yaml_transform("ReconcileTables")
def _reconcile_tables(t, current, named, pipeline):
    """Table diff: ``other:`` names the AFTER-version step."""
    from beam_spark.operators.scd import ReconcileTables

    other = named[t["other"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "other")}
    return current | ReconcileTables(other.df, **kwargs)


@register_yaml_transform("MergeInto")
def _merge_into(t, current, named, pipeline):
    """MERGE upsert: ``source:`` names the change-set step."""
    from beam_spark.operators.scd import MergeInto

    source = named[t["source"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "source")}
    return current | MergeInto(source.df, **kwargs)


@register_yaml_transform("KmvOverlap")
def _kmv_overlap(t, current, named, pipeline):
    """KMV set-overlap: ``other:`` names the second frame's step."""
    from beam_spark.operators.stats import KmvOverlap

    other = named[t["other"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "other")}
    return current | KmvOverlap(other.df, **kwargs)


@register_yaml_transform("CanonicalizeClusters")
def _canonicalize_clusters(t, current, named, pipeline):
    """Survivorship mapping: ``assignment:`` names the (node, comp)
    cluster-assignment step (e.g. a ConnectedComponents output)."""
    from beam_spark.operators.dedupe import CanonicalizeClusters

    asg = named[t["assignment"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "assignment")}
    return current | CanonicalizeClusters(asg.df, **kwargs)


@register_yaml_transform("Cuped")
def _cuped(t, current, named, pipeline):
    """CUPED adjustment; the calibration moments come from the piped
    frame itself (single-frame form)."""
    from beam_spark.operators.quality import Cuped

    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input")}
    return current | Cuped(**kwargs)


@register_yaml_transform("ConformalInterval")
def _conformal(t, current, named, pipeline):
    """Two-frame conformal bands: ``calibration:`` names the
    (pred, actual) calibration step."""
    from beam_spark.operators.quality import ConformalInterval

    cal = named[t["calibration"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "calibration")}
    return current | ConformalInterval(cal.df, **kwargs)


@register_yaml_transform("NaiveBayesClassify")
def _naive_bayes(t, current, named, pipeline):
    """Two-frame classify: ``train:`` names the labeled step."""
    from beam_spark.ml.naive_bayes import NaiveBayesClassify

    train = named[t["train"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "train")}
    return current | NaiveBayesClassify(train.df, **kwargs)


@register_yaml_transform("LogisticFit")
def _logistic_fit(t, current, named, pipeline):
    from beam_spark.ml.logistic import LogisticFit

    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input")}
    return current | LogisticFit(**kwargs)


@register_yaml_transform("KneserNeyPerplexity")
def _kn_perplexity(t, current, named, pipeline):
    """Optional ``train:`` names the fit-corpus step (else
    self-train)."""
    from beam_spark.operators.text import KneserNeyPerplexity

    train = named[t["train"]].df if "train" in t else None
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "train")}
    return current | KneserNeyPerplexity(train, **kwargs)


@register_yaml_transform("FeatureHasher")
def _feature_hasher(t, current, named, pipeline):
    from beam_spark.ml.transforms import FeatureHasher

    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input")}
    return current | FeatureHasher(**kwargs)


@register_yaml_transform("DdSketchQuantiles")
def _ddsketch(t, current, named, pipeline):
    from beam_spark.operators.stats import DdSketchQuantiles

    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input")}
    return current | DdSketchQuantiles(**kwargs)


@register_yaml_transform("BootstrapCI")
def _bootstrap_ci(t, current, named, pipeline):
    from beam_spark.operators.stats import BootstrapCI

    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input")}
    return current | BootstrapCI(**kwargs)


@register_yaml_transform("ChangepointBinSeg")
def _binseg(t, current, named, pipeline):
    from beam_spark.operators.stats import ChangepointBinSeg

    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input")}
    return current | ChangepointBinSeg(**kwargs)


@register_yaml_transform("KalmanLocalLevel")
def _kalman(t, current, named, pipeline):
    from beam_spark.operators.stats import KalmanLocalLevel

    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input")}
    return current | KalmanLocalLevel(**kwargs)


@register_yaml_transform("KNeighborsClassify")
def _knn_classify(t, current, named, pipeline):
    """Two-frame classify: ``queries:`` names the query-frame step."""
    from beam_spark.operators.similarity import KNeighborsClassify

    q = named[t["queries"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "queries")}
    return current | KNeighborsClassify(q.df, **kwargs)


@register_yaml_transform("DbscanClusters")
def _dbscan(t, current, named, pipeline):
    from beam_spark.operators.similarity import DbscanClusters

    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input")}
    return current | DbscanClusters(**kwargs)


@register_yaml_transform("GradientBoostedStumps")
def _gbm_stumps(t, current, named, pipeline):
    from beam_spark.ml.gbm import GradientBoostedStumps

    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input")}
    return current | GradientBoostedStumps(**kwargs)


@register_yaml_transform("Pl2TopK")
def _pl2_topk(t, current, named, pipeline):
    """DFR retrieval: ``queries:`` names the query-frame step."""
    from beam_spark.operators.retrieval import Pl2TopK

    q = named[t["queries"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "queries")}
    return current | Pl2TopK(q.df, **kwargs)


@register_yaml_transform("QueryLikelihoodTopK")
def _ql_topk(t, current, named, pipeline):
    """LM retrieval: ``queries:`` names the query-frame step."""
    from beam_spark.operators.retrieval import QueryLikelihoodTopK

    q = named[t["queries"]]
    kwargs = {k: v for k, v in t.items()
              if k not in ("type", "name", "input", "queries")}
    return current | QueryLikelihoodTopK(q.df, **kwargs)
