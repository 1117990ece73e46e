"""beam_spark — a PySpark-native batch/streaming engine with the query and
data-processing capabilities of Apache Beam (reference: /root/reference,
apache/beam @ 2026-08-07).

Not a port: Beam's model concepts are re-expressed as idiomatic Spark.
Elements are schema'd rows in DataFrames; event time is an ordinary
``timestamp`` column; windows are ordinary ``struct<start,end>`` columns
produced by ``F.window``/``F.session_window``; grouping operators are
``groupBy().agg()`` so Catalyst gives partial aggregation, pushdown, AQE and
whole-stage codegen for free.

Capability map (SURVEY.md §2):
  PCollection        -> beam_spark.PCollection (DataFrame wrapper)
  PTransform / `|`   -> beam_spark.PTransform and pcoll | transform chaining
  ParDo/Map/Filter   -> operators.core (expression fast path, pandas-UDF slow path)
  GroupByKey/Combine -> operators.group
  built-in combiners -> operators.combiners, operators.stats
  joins / set ops    -> operators.join, operators.setops
  windowing          -> operators.window
  sort / top-k       -> operators.sort
  sources & sinks    -> sources/
  Beam SQL           -> sql.SqlTransform (Spark SQL + TUMBLE/HOP/SESSION shim)
  streaming          -> streaming/
  LLM-pipeline ops   -> operators.dedupe, operators.similarity, operators.text,
                        operators.multimodal, ml/ (incl. ml.bpe tokenizer)
  retrieval          -> operators.retrieval (BM25, phrase, RRF fusion)
  data quality       -> operators.quality (profile, constraints, PSI drift)
"""

from beam_spark.pcollection import PCollection, Pipeline, PTransform, ptransform_fn
from beam_spark.session import get_spark

# Beam-style flat namespace: `import beam_spark as beam; beam.Map(...)`
from beam_spark.operators.core import (Create, Distinct, Filter, Flatten,
                                       FlatMap, Impulse, Keys, KvSwap,
                                       LogElements, Map, Partition, Regex,
                                       Reify, Reshuffle, Select, Tee,
                                       ToString, Values, WaitOn, WithKeys,
                                       WithTimestamps)
from beam_spark.operators.group import (CoGroupByKey, CombineGlobally,
                                        CombinePerKey, GroupBy, GroupByKey)
from beam_spark.operators.combiners import (Count, Latest, Mean, Sample,
                                            ToDict, ToList, ToSet, Top)
from beam_spark.operators.join import Enrichment, Join, LookupJoin
from beam_spark.operators.setops import (ExceptAll, ExceptDistinct,
                                         IntersectAll, IntersectDistinct,
                                         UnionAll, UnionDistinct)
from beam_spark.operators.sort import OrderBy, SortValues, TopK, TopKPerKey
from beam_spark.operators.window import (FixedWindows, GlobalWindows,
                                         Sessions, SlidingWindows,
                                         TimestampCombiner, WindowInto)
from beam_spark.operators.pardo import (AsDict, AsIter, AsList, AsMultiMap,
                                        AsSingleton, BatchedDoFn, CombineFn,
                                        DoFn, ParDo, TaggedOutput)
from beam_spark.operators.cep import MatchRecognize
from beam_spark.sql import SqlTransform

__all__ = [
    "PCollection", "Pipeline", "PTransform", "ptransform_fn", "get_spark",
    "Create", "Distinct", "Filter", "Flatten", "FlatMap", "Impulse", "Keys",
    "KvSwap", "LogElements", "Map", "Partition", "Regex", "Reify",
    "Reshuffle", "Select", "Tee", "ToString", "Values", "WaitOn", "WithKeys",
    "WithTimestamps", "CoGroupByKey", "CombineGlobally", "CombinePerKey",
    "GroupBy", "GroupByKey", "Count", "Latest", "Mean", "Sample", "ToDict",
    "ToList", "ToSet", "Top", "Enrichment", "Join", "LookupJoin",
    "ExceptAll", "ExceptDistinct", "IntersectAll", "IntersectDistinct",
    "UnionAll", "UnionDistinct", "OrderBy", "SortValues", "TopK",
    "TopKPerKey", "FixedWindows", "GlobalWindows", "Sessions",
    "SlidingWindows", "TimestampCombiner", "WindowInto", "AsDict", "AsIter",
    "AsList", "AsMultiMap", "AsSingleton", "BatchedDoFn", "CombineFn",
    "DoFn", "ParDo", "TaggedOutput", "MatchRecognize", "SqlTransform",
]

__version__ = "0.1.0"
