from beam_spark.sources.io import (ReadFromParquet, ReadFromText, ReadFromCsv,
                                   ReadFromJson, ReadFromAvro, ReadFromOrc,
                                   ReadTable, WriteToParquet, WriteToText,
                                   WriteToCsv, WriteToJson, load_tables)

__all__ = [
    "ReadFromParquet", "ReadFromText", "ReadFromCsv", "ReadFromJson",
    "ReadFromAvro", "ReadFromOrc", "ReadTable", "WriteToParquet",
    "WriteToText", "WriteToCsv", "WriteToJson", "load_tables",
]
