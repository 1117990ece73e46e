"""RunInference (SURVEY.md §2.12).

Beam reference: ml/inference/base.py:171 (ModelHandler contract:
load_model / run_inference over batches), :1373 RunInference (batching,
model sharing per process, DLQ, metrics).

Spark design: ``mapInPandas`` with a PER-EXECUTOR-PROCESS model
singleton. The handler's ``load_model()`` runs once per python worker
(not per batch, not per row) and is cached in a module-level slot keyed
by the handler's share token — Beam's "model sharing across bundles"
(base.py model manager) without the gRPC machinery. Batches are Arrow
frames; ``batch_size`` re-chunks them to the model's preferred size.
GPU scheduling at cluster scale: stage-level resource profiles — out of
scope here, the operator shape is identical.

The container has no torch/sklearn; real handlers plug in by subclassing
ModelHandler. DeterministicFakeHandler ships for tests/plumbing.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator, Sequence

from pyspark.sql import functions as F
from pyspark.sql import types as T

from beam_spark.pcollection import PCollection, PTransform

#: per-python-worker model cache: share_token -> loaded model
_MODEL_CACHE: dict[str, Any] = {}

#: driver-side last successful glob resolution, keyed by
#: (applicationId, pattern) so a resolution from one session/filesystem
#: never leaks into another — the fallback when a refresh catches the
#: glob transiently empty (e.g. mid atomic artifact replace); Beam's
#: WatchFilePattern likewise keeps serving the previous model rather
#: than failing the pipeline. Value: (path, mtime, consecutive_misses).
_LAST_RESOLVED: dict[tuple[str, str], tuple[str, int, int]] = {}

#: a transient replace clears within a refresh or two; after this many
#: CONSECUTIVE empty resolutions the artifact is treated as genuinely
#: deleted — the stale entry is dropped and resolution fails fast
#: ("matched nothing") instead of silently serving a decommissioned
#: model forever. Per-transform override: RunInference(...,
#: max_empty_resolutions=None) opts into Beam's WatchFilePattern
#: keep-serving-forever behavior for flaky remote filesystems.
_MAX_EMPTY_RESOLUTIONS = 3


class ModelHandler:
    """Beam ModelHandler (ml/inference/base.py:171) reduced to the two
    methods that matter + a share token for per-process reuse."""

    #: handlers with the same share_token share one loaded model per worker
    share_token: str = "default"

    def load_model(self) -> Any:
        raise NotImplementedError

    def load_model_from(self, path: str) -> Any:
        """Load a SPECIFIC artifact — required only when RunInference
        runs with ``watch_model_pattern`` (automatic model refresh)."""
        raise NotImplementedError(
            f"{type(self).__name__} does not implement load_model_from"
            "(path); watch_model_pattern needs it")

    def run_inference(self, batch: Sequence, model: Any) -> Sequence:
        """batch: list of input values; returns list of predictions
        (same length/order)."""
        raise NotImplementedError


def _cache_model(evict_prefix: str, cache_key: str, model: Any,
                 watched: bool) -> None:
    """Insert a loaded model into the worker cache. For watched
    handlers (keys are ``share_token@pattern@path@mtime``) evict this
    handler's superseded versions of the SAME artifact lineage first
    (prefix ``share_token@pattern@``), so a long-lived streaming
    worker holds ONE model per watched lineage, not one per artifact
    generation. Scoping eviction to the pattern — not the bare
    share_token — lets two RunInference stages share a token while
    watching different patterns without evicting (thrashing) each
    other's model every expansion."""
    if watched:
        for stale in [k for k in _MODEL_CACHE
                      if k.startswith(evict_prefix) and k != cache_key]:
            del _MODEL_CACHE[stale]
    _MODEL_CACHE[cache_key] = model


def _resolve_model_path(spark, pattern: str,
                        max_empty_resolutions: int | None =
                        _MAX_EMPTY_RESOLUTIONS) -> tuple[str, int]:
    """Newest artifact matching a glob — (path, mtime), ties broken by
    name. Hadoop FileSystem API: file://, hdfs://, s3a:// all work.
    ``max_empty_resolutions=None`` keeps serving the last resolved
    artifact through ANY number of consecutive empty globs (Beam
    WatchFilePattern parity); an int bounds the misses before
    failing fast."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(p)
    key = (spark.sparkContext.applicationId, pattern)
    if not statuses:
        # transiently empty (atomic replace in flight): keep serving
        # the last artifact this session resolved for the pattern —
        # bounded by max_empty_resolutions consecutive misses
        # (unbounded when None), after which the artifact is
        # considered deleted for real
        if key in _LAST_RESOLVED:
            path, mtime, misses = _LAST_RESOLVED[key]
            if (max_empty_resolutions is None
                    or misses + 1 < max_empty_resolutions):
                _LAST_RESOLVED[key] = (path, mtime, misses + 1)
                return path, mtime
            del _LAST_RESOLVED[key]
        raise FileNotFoundError(
            f"watch_model_pattern matched nothing: {pattern}")
    best = max(statuses,
               key=lambda st: (st.getModificationTime(),
                               st.getPath().getName()))
    path_str = str(best.getPath())
    if path_str.startswith("file:"):
        # plain local path for open()-based loaders; remote schemes
        # keep the full URI (their loaders speak the scheme)
        path_str = best.getPath().toUri().getPath()
    _LAST_RESOLVED[key] = (path_str, best.getModificationTime(), 0)
    return path_str, best.getModificationTime()


class DeterministicFakeHandler(ModelHandler):
    """Test handler: 'model' is a seeded hash projection — deterministic,
    dependency-free, exercises the full batching/caching path."""

    share_token = "fake"

    def load_model(self):
        import hashlib

        def model(xs):
            out = []
            for x in xs:
                h = hashlib.sha256(str(x).encode()).digest()
                out.append(int.from_bytes(h[:4], "little") / 2**32)
            return out

        return model

    def run_inference(self, batch, model):
        return model(batch)


class RunInference(PTransform):
    """Batched inference over a column (ml/inference/base.py:1373).

    ``RunInference(handler, input_col, output_col, output_type)``.
    ``with_exception_handling()`` routes per-batch failures to a DLQ
    column pair instead of failing the stage (Beam's DLQ support).
    """

    def __init__(self, handler: ModelHandler, input_col: str,
                 output_col: str = "prediction",
                 output_type: str | T.DataType = "double",
                 batch_size: int = 256,
                 watch_model_pattern: str | None = None,
                 max_empty_resolutions: int | None =
                 _MAX_EMPTY_RESOLUTIONS, label=None):
        """``watch_model_pattern``: optional artifact glob — Beam's
        WatchFilePattern model refresh. At every plan expansion the
        NEWEST matching file (mtime, then name) becomes the model
        version; workers cache per (share_token, path, mtime), so a
        new artifact is picked up without restarting anything. In a
        foreachBatch streaming pipeline each micro-batch re-expands,
        giving per-batch refresh cadence — the Spark-native analog of
        Beam's side-input refresh interval. The handler must
        implement ``load_model_from(path)``.

        ``max_empty_resolutions``: consecutive empty glob resolutions
        tolerated (serving the last-seen artifact) before failing
        fast; ``None`` = keep serving indefinitely, matching Beam's
        WatchFilePattern on flaky remote filesystems."""
        super().__init__(label)
        self.handler, self.input_col = handler, input_col
        self.output_col, self.output_type = output_col, output_type
        self.batch_size = batch_size
        self.watch_model_pattern = watch_model_pattern
        self.max_empty_resolutions = max_empty_resolutions
        self._dlq = False

    def with_exception_handling(self) -> "RunInference":
        self._dlq = True
        return self

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd

        handler = self.handler
        in_col, out_col = self.input_col, self.output_col
        bs, dlq = self.batch_size, self._dlq

        out_type = self.output_type
        if isinstance(out_type, str):
            out_type = T._parse_datatype_string(out_type)
        fields = list(pcoll.df.schema.fields) + [T.StructField(out_col, out_type)]
        if dlq:
            fields.append(T.StructField("__error", T.StringType()))
        schema = T.StructType(fields)

        if self.watch_model_pattern:
            path, mtime = _resolve_model_path(
                pcoll.df.sparkSession, self.watch_model_pattern,
                self.max_empty_resolutions)
            evict_prefix = (f"{handler.share_token}@"
                            f"{self.watch_model_pattern}@")
            cache_key = f"{evict_prefix}{path}@{mtime}"
        else:
            path, cache_key = None, handler.share_token
            evict_prefix = cache_key

        def gen(batches: Iterator["pd.DataFrame"]):
            model = _MODEL_CACHE.get(cache_key)
            if model is None:
                model = (handler.load_model_from(path) if path
                         else handler.load_model())
                _cache_model(evict_prefix, cache_key, model,
                             watched=path is not None)
            for pdf in batches:
                for start in range(0, len(pdf), bs):
                    chunk = pdf.iloc[start:start + bs].copy()
                    inputs = list(chunk[in_col])
                    try:
                        preds = handler.run_inference(inputs, model)
                        chunk[out_col] = list(preds)
                        if dlq:
                            chunk["__error"] = None
                    except Exception as e:
                        if not dlq:
                            raise
                        chunk[out_col] = None
                        chunk["__error"] = f"{type(e).__name__}: {e}"[:2000]
                    yield chunk

        return pcoll.with_df(pcoll.df.mapInPandas(gen, schema=schema))


class FakeTextEmbeddingHandler(ModelHandler):
    """Deterministic text-embedding handler (ml/transforms/base.py:666
    _TextEmbeddingHandler pattern): maps text -> unit-norm float vector.
    Hash-seeded fake standing in for a sentence-transformer; the output
    column contract (array<float>, unit norm) is the real one."""

    share_token = "fake-embed"

    def __init__(self, dim: int = 64):
        self.dim = dim

    def load_model(self):
        import hashlib
        import math

        dim = self.dim

        def model(texts):
            out = []
            for t in texts:
                h = hashlib.sha256(str(t).encode()).digest()
                # extend digest deterministically to dim values
                vals = []
                block = h
                while len(vals) < dim:
                    block = hashlib.sha256(block).digest()
                    vals.extend(b / 255.0 - 0.5 for b in block)
                v = vals[:dim]
                n = math.sqrt(sum(x * x for x in v)) or 1.0
                out.append([x / n for x in v])
            return out

        return model

    def run_inference(self, batch, model):
        return model(batch)


class LinearRegressionHandler(ModelHandler):
    """REAL fitted model handler (reference sklearn_inference.py:34
    _load_model/joblib pattern): ordinary-least-squares weights fitted
    offline on a labeled set (provenance in the artifact's ``train``
    block) and loaded from the artifact file ONCE PER EXECUTOR PROCESS
    via the share-token cache — numpy stands in for sklearn, which is
    not in this container (see SklearnModelHandler for the joblib path).

    Input column: array<double> feature vector in the artifact's feature
    order. Scoring accumulates strictly left-to-right
    (((w0 + x0*w1) + x1*w2) + ...) so an ANSI-SQL oracle with the same
    literal weights reproduces the exact IEEE-754 doubles.
    """

    def __init__(self, artifact_path: str | None = None):
        import os

        self.artifact_path = artifact_path or os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "artifacts", "linear_model.json")
        self.share_token = f"linreg:{self.artifact_path}"

    def load_model(self):
        import json

        with open(self.artifact_path) as f:
            m = json.load(f)
        assert m["kind"] == "linear_regression_ols", m["kind"]
        return m

    def run_inference(self, batch, model):
        import numpy as np

        X = np.asarray([list(x) for x in batch], dtype=np.float64)
        score = np.full(len(X), model["intercept"], dtype=np.float64)
        for j, w in enumerate(model["weights"]):
            score = score + X[:, j] * w   # fixed fold order, matches SQL
        return score.tolist()

    def sql_score_expr(self, feature_exprs: list[str]) -> str:
        """The exact scoring expression as ANSI SQL (valid in Spark SQL
        and DuckDB) — the gate oracle uses this to verify the handler
        end-to-end against real weights."""
        import json

        with open(self.artifact_path) as f:
            m = json.load(f)
        expr = repr(m["intercept"])
        for fe, w in zip(feature_exprs, m["weights"]):
            expr = f"({expr} + CAST({fe} AS DOUBLE) * {w!r})"
        return expr


class SklearnModelHandler(ModelHandler):
    """Sklearn handler (reference ml/inference/sklearn_inference.py):
    joblib-pickled estimator loaded per executor, ``predict`` over the
    batch matrix. Importable only where sklearn/joblib exist — this
    container has neither, so the contract is proven by
    LinearRegressionHandler (identical load/score/batch path) and this
    class is exercised when the libs are present."""

    def __init__(self, model_uri: str):
        self.model_uri = model_uri
        self.share_token = f"sklearn:{model_uri}"

    def load_model(self):
        try:
            import joblib
        except ImportError as e:  # pragma: no cover - env without sklearn
            raise ImportError(
                "SklearnModelHandler needs joblib/sklearn; use "
                "LinearRegressionHandler in this environment") from e
        return joblib.load(self.model_uri)

    def run_inference(self, batch, model):
        import numpy as np

        return model.predict(np.asarray([list(x) for x in batch])).tolist()
