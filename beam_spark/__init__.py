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
                        operators.multimodal, ml/
"""

from beam_spark.pcollection import PCollection, Pipeline, PTransform, ptransform_fn
from beam_spark.session import get_spark

__all__ = [
    "PCollection",
    "Pipeline",
    "PTransform",
    "ptransform_fn",
    "get_spark",
]

__version__ = "0.1.0"
