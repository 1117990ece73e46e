from beam_spark.ml.inference import ModelHandler, RunInference
from beam_spark.ml.chunking import ChunkText
from beam_spark.ml.transforms import (ApplyBuckets, BagOfWords, HashStrings,
                                      NGrams, ScaleTo01, ScaleToZScore, TFIDF)

__all__ = [
    "ModelHandler", "RunInference", "ChunkText", "ApplyBuckets",
    "BagOfWords", "HashStrings", "NGrams", "ScaleTo01", "ScaleToZScore",
    "TFIDF",
]
