from beam_spark.streaming.triggers import AfterWatermarkEarlyCount
from beam_spark.streaming.trigger_algebra import (AfterAll, AfterAny,
    AfterCount, AfterEach, AfterProcessingTime, OrFinally, Repeatedly,
    Trigger)
from beam_spark.streaming.state import StatefulDoFn, StatefulParDo, UserState
from beam_spark.streaming.core import (ContinuousAggregate, Deduplicate,
                                       GroupIntoBatches,
                                       TriggeredCountPerKey,
                                       ReadFileStream, ReadFromSocket,
                                       ReadRateStream,
                                       TestStream, WithWatermark,
                                       WriteStreamToMemory,
                                       WriteStreamToFiles, foreach_batch,
                                       with_late_output)

__all__ = [
    "Deduplicate", "GroupIntoBatches", "ReadFileStream", "ReadFromSocket",
    "ReadRateStream",
    "TriggeredCountPerKey",
    "TestStream", "WithWatermark", "WriteStreamToMemory",
    "WriteStreamToFiles", "foreach_batch", "with_late_output",
    "ContinuousAggregate",
    "StatefulDoFn", "StatefulParDo", "UserState", "AfterWatermarkEarlyCount",
    "Trigger", "AfterCount", "AfterProcessingTime", "Repeatedly",
    "AfterAny", "AfterAll", "AfterEach", "OrFinally",
]
