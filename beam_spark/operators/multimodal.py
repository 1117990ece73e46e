"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The reference's analog is RunInference's multimodal model handlers +
MLTransform embeddings (ml/transforms/base.py:666-813); here we provide
the Spark-side column contract and Arrow-batched decode/feature plumbing.

The actual media decode (PIL/librosa/ffmpeg) is STUBBED — those libraries
are not in this container. The Spark plumbing is real: schema, Arrow
batch shape, mapInPandas signature, partitioning. Swap ``_decode_image``
for a real decoder and nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beam_spark.pcollection import PCollection, PTransform

#: Canonical multimodal asset schema: payload + typed metadata.
ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("media_type", T.StringType()),   # image/audio/video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])


def _decode_image(payload: bytes) -> tuple[int, int]:
    """STUB decode: real implementation would be PIL.Image.open(BytesIO).
    Deterministic fake: derive (width, height) from a stable digest so the
    pipeline shape (including downstream grouping) is testable."""
    d = hashlib.sha256(payload).digest()
    w = 64 + struct.unpack("<H", d[:2])[0] % 1984      # 64..2047
    h = 64 + struct.unpack("<H", d[2:4])[0] % 1984
    return w, h


class DecodeImageMetadata(PTransform):
    """Populate width/height from the payload via Arrow-batched
    mapInPandas — the RunInference batching pattern (ml/inference/base.py:
    171: batch elements, amortize model/codec setup per batch)."""

    def __init__(self, payload_col: str = "payload", label=None):
        super().__init__(label)
        self.payload_col = payload_col

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd

        payload_col = self.payload_col
        schema = pcoll.df.schema

        def gen(batches: Iterator["pd.DataFrame"]):
            for pdf in batches:
                dims = [_decode_image(p if isinstance(p, bytes) else bytes(p))
                        for p in pdf[payload_col]]
                pdf = pdf.copy()
                pdf["width"] = [d[0] for d in dims]
                pdf["height"] = [d[1] for d in dims]
                yield pdf

        return pcoll.with_df(pcoll.df.mapInPandas(gen, schema=schema))


class ExtractImageFeatures(PTransform):
    """Feature-extraction plumbing: payload -> fixed-size float vector.

    STUB featurizer (digest-seeded deterministic vector); a real one is a
    model forward pass with per-executor model reuse — the plumbing
    (schema, batching, output array<float>) is identical.
    """

    def __init__(self, payload_col: str = "payload", dim: int = 16,
                 out_col: str = "features", label=None):
        super().__init__(label)
        self.payload_col, self.dim, self.out_col = payload_col, dim, out_col

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd

        payload_col, dim, out_col = self.payload_col, self.dim, self.out_col
        out_schema = T.StructType(
            list(pcoll.df.schema.fields)
            + [T.StructField(out_col, T.ArrayType(T.FloatType()))])

        def gen(batches: Iterator["pd.DataFrame"]):
            for pdf in batches:
                feats = []
                for p in pdf[payload_col]:
                    b = p if isinstance(p, bytes) else bytes(p)
                    d = hashlib.sha256(b).digest()
                    feats.append([struct.unpack("<H", d[2 * i:2 * i + 2])[0] / 65535.0
                                  for i in range(dim)])
                pdf = pdf.copy()
                pdf[out_col] = feats
                yield pdf

        return pcoll.with_df(pcoll.df.mapInPandas(gen, schema=out_schema))


class SampleVideoFrames(PTransform):
    """Frame-sampling plumbing: one output row per sampled frame offset.

    Real impl: ffmpeg seek+decode per offset. STUB emits (asset_id,
    frame_idx, frame_ts_ms, frame_payload=digest bytes); the explode shape
    and per-asset ordering are what downstream training pipelines rely on.
    """

    def __init__(self, every_ms: int = 1000, id_col: str = "asset_id",
                 payload_col: str = "payload", duration_col: str = "duration_ms",
                 label=None):
        super().__init__(label)
        self.every_ms, self.id_col = every_ms, id_col
        self.payload_col, self.duration_col = payload_col, duration_col

    def expand(self, pcoll: PCollection) -> PCollection:
        every = self.every_ms
        idc, pc, dc = self.id_col, self.payload_col, self.duration_col
        n_frames = (F.coalesce(F.col(dc), F.lit(0)) / every).cast("long")
        df = (pcoll.df
              .select(idc, pc,
                      F.explode(F.sequence(F.lit(0), F.greatest(
                          n_frames - 1, F.lit(0)))).alias("frame_idx"))
              .withColumn("frame_ts_ms", F.col("frame_idx") * every)
              .withColumn("frame_payload",
                          F.sha2(F.concat(F.col(pc), F.encode(
                              F.col("frame_idx").cast("string"), "utf-8")), 256)))
        return pcoll.with_df(df.drop(pc))


def make_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Test fixture: wrap document text bytes as fake image payloads with
    the canonical asset schema (the container has no real media files)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.lit("image/png").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"))


def _decode_audio(payload: bytes) -> tuple[int, int, int]:
    """STUB decode (real impl: soundfile/librosa header read).
    Deterministic fake: (sample_rate, n_channels, n_samples) from the
    payload digest so downstream windowing/aggregation is testable."""
    d = hashlib.sha256(payload).digest()
    sr = (8000, 16000, 22050, 44100, 48000)[d[4] % 5]
    ch = 1 + d[5] % 2
    n_samples = sr + struct.unpack("<I", d[6:10])[0] % (sr * 30)
    return sr, ch, n_samples


class DecodeAudioMetadata(PTransform):
    """Audio header decode plumbing: appends sample_rate / n_channels
    and fills duration_ms from the sample count — Arrow-batched like
    the image path; swap ``_decode_audio`` for a real header reader and
    nothing else changes."""

    def __init__(self, payload_col: str = "payload", label=None):
        super().__init__(label)
        self.payload_col = payload_col

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd

        payload_col = self.payload_col
        out_schema = T.StructType(
            [f for f in pcoll.df.schema.fields]
            + [T.StructField("sample_rate", T.IntegerType()),
               T.StructField("n_channels", T.IntegerType())])

        def gen(batches: Iterator["pd.DataFrame"]):
            for pdf in batches:
                meta = [_decode_audio(p if isinstance(p, bytes)
                                      else bytes(p))
                        for p in pdf[payload_col]]
                pdf = pdf.copy()
                pdf["sample_rate"] = [m[0] for m in meta]
                pdf["n_channels"] = [m[1] for m in meta]
                pdf["duration_ms"] = [m[2] * 1000 // m[0] for m in meta]
                yield pdf

        return pcoll.with_df(pcoll.df.mapInPandas(gen, schema=out_schema))


class ExtractAudioFeatures(PTransform):
    """Windowed audio features (the MFCC-frame shape): one output row
    per ``window_ms`` window — (id, window_idx, window_ts_ms, features
    array<float>). Window fan-out is a JVM sequence explode driven by
    the decoded duration (no Python in the row multiplication); the
    per-window feature vector is the stub digest featurizer (real impl:
    per-executor librosa/model reuse inside the same mapInPandas).

    ``window_ms=None`` emits ONE whole-clip vector per asset instead.
    """

    def __init__(self, window_ms: int | None = 1000, dim: int = 8,
                 id_col: str = "asset_id", payload_col: str = "payload",
                 duration_col: str = "duration_ms",
                 out_col: str = "features", label=None):
        super().__init__(label)
        self.window_ms, self.dim = window_ms, dim
        self.id_col, self.payload_col = id_col, payload_col
        self.duration_col, self.out_col = duration_col, out_col

    def _featurize(self, pdf, key_cols, salt_col=None):
        import pandas as pd

        dim, pc = self.dim, self.payload_col
        feats = []
        for _, row in pdf.iterrows():
            b = row[pc]
            b = b if isinstance(b, bytes) else bytes(b)
            if salt_col is not None:
                b = b + str(row[salt_col]).encode()
            d = hashlib.sha256(b"audio:" + b).digest()
            feats.append([struct.unpack("<H", d[2 * i:2 * i + 2])[0]
                          / 65535.0 for i in range(dim)])
        out = pdf[key_cols].copy()
        out[self.out_col] = feats
        return out

    def expand(self, pcoll: PCollection) -> PCollection:
        idc, pc, dc = self.id_col, self.payload_col, self.duration_col
        if self.window_ms is None:
            keys = [idc]

            def gen(batches):
                for pdf in batches:
                    yield self._featurize(pdf, keys)

            schema = (f"{idc} long, "
                      f"{self.out_col} array<float>")
            return pcoll.with_df(
                pcoll.df.select(idc, pc).mapInPandas(gen, schema=schema))
        every = self.window_ms
        n_win = (F.coalesce(F.col(dc), F.lit(0)) / every).cast("long")
        exploded = (pcoll.df
                    .select(idc, pc,
                            F.explode(F.sequence(F.lit(0), F.greatest(
                                n_win - 1, F.lit(0)))).alias("window_idx"))
                    .withColumn("window_ts_ms",
                                F.col("window_idx") * every))
        keys = [idc, "window_idx", "window_ts_ms"]

        def gen(batches):
            for pdf in batches:
                yield self._featurize(pdf, keys, salt_col="window_idx")

        schema = (f"{idc} long, window_idx long, window_ts_ms long, "
                  f"{self.out_col} array<float>")
        return pcoll.with_df(exploded.mapInPandas(gen, schema=schema))
