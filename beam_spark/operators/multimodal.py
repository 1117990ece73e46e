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
