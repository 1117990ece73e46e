from beam_spark.sources.io import (ReadFromParquet, ReadFromText, ReadFromCsv,
                                   ReadFromJson, ReadFromAvro, ReadFromOrc,
                                   ReadTable, MatchFiles, ReadMatches,
                                   WriteToParquet, WriteToText,
                                   WriteToCsv, WriteToJson, WriteToAvro,
                                   load_tables)
from beam_spark.sources.avro import ReadFromAvroFile, WriteToAvroFile

__all__ = [
    "ReadFromParquet", "ReadFromText", "ReadFromCsv", "ReadFromJson",
    "ReadFromAvro", "ReadFromOrc", "ReadTable", "MatchFiles",
    "ReadMatches", "WriteToParquet",
    "WriteToText", "WriteToCsv", "WriteToJson", "WriteToAvro",
    "ReadFromAvroFile", "WriteToAvroFile", "load_tables",
]
