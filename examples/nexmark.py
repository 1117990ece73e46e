"""Run the Nexmark analog suite (Q0-Q12 shapes on the events table) and
print per-query events/s — the BASELINE.md comparison in one command.

Usage: python examples/nexmark.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import beam_spark as beam
from beam_spark import queries as q

NEXMARK = [n for n in sorted(q.queries()) if n.startswith("q_nexmark")] + [
    "q_window_sessions_per_user",    # Q11 analog
    "q_window_fixed_hourly",         # Q12 analog
]


def main(sf_dir="/root/testdata/sf0.1"):
    spark = beam.get_spark("nexmark-analogs")
    spark.sparkContext.setLogLevel("ERROR")
    from beam_spark import gates as g

    registry = {**q.queries(), **g.queries()}
    n_events = q.table(spark, sf_dir, "events").df.count()
    registry["q1_pricing_summary"](spark, sf_dir) \
        .write.format("noop").mode("overwrite").save()  # warm
    print(f"{n_events} events, {sf_dir}")
    for name in NEXMARK:
        t0 = time.perf_counter()
        registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"  {name:38s} {dt:6.2f} s  {n_events / dt:>10,.0f} ev/s")


if __name__ == "__main__":
    main(*sys.argv[1:])
