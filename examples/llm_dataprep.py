"""Training-data preparation: quality filter -> dedup (exact + minhash
near-dup) -> chunk -> embed -> ANN index check. The composed pipeline is
the q_pipeline_llm_dataprep gate query."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import beam_spark as beam
from beam_spark import queries as q


def main(sf_dir="/root/testdata/sf0.001"):
    spark = beam.get_spark("llm-dataprep")
    df = q.queries()["q_pipeline_llm_dataprep"](spark, sf_dir)
    print(f"prepared {df.count()} chunks")
    df.show(5, truncate=60)


if __name__ == "__main__":
    main()
