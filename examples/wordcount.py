"""Wordcount — the reference's canonical example
(examples/wordcount.py) on beam_spark."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import beam_spark as beam


def main():
    spark = beam.get_spark("wordcount")
    with beam.Pipeline(spark) as p:
        counts = (
            p
            | beam.Create([{"line": "to be or not to be"},
                           {"line": "that is the question"}])
            | beam.FlatMap(lambda r: [{"word": w} for w in r["line"].split()],
                           output_schema="word: string")
            | beam.Count.PerElement("word")
            | beam.TopK(5, "count desc", "word"))
        counts.show()


if __name__ == "__main__":
    main()
