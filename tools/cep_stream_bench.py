#!/usr/bin/env python
"""Streaming MATCH_RECOGNIZE ingest-bound benchmark (SCALE.md evidence).

Regime (a) from SCALE.md's streaming-CEP row: 50k events / 3
micro-batches / 100 keys via TestStream, vectorized V+P funnel pattern.
In r14 this regime measured PARITY between the per-row and run-length
matchers because per-key state (pickled dict-records) + Arrow
conversion dominated the matcher by >10x. This harness times exactly
that regime so codec changes in ``_expand_streaming`` are measured, not
guessed.

Rows are written as parquet directly (pandas) — TestStream.add_elements
coerces row dicts in a Python loop, which at 50k rows would pollute the
measurement with setup cost.

Usage: python tools/cep_stream_bench.py [--events 50000] [--batches 3]
           [--keys 100] [--runs 3]
Prints one JSON line: {"regime": "ingest", "events": N, "runs": [...],
"median_sec": X, "events_per_sec": Y}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_input(tmpdir: str, events: int, batches: int, keys: int,
                held: bool = False) -> None:
    """One parquet file per micro-batch. Default (ingest regime): every
    key gets view* purchase funnels, ~1 match per 20 rows per key — the
    matcher has real work but rows are consumed promptly, so per-key
    held state stays small. ``held=True`` (held-buffer regime): ALL
    rows are views, so V+ P never completes, every mature row stays in
    the open match span, and the per-key state buffer grows to
    events/keys rows — each micro-batch re-decodes, re-sorts, and
    re-encodes the whole buffer, which is exactly the state-codec cost
    the ingest regime's micro-batch floor hides."""
    import numpy as np
    import pandas as pd

    per_batch = events // batches
    base = pd.Timestamp("2024-01-01 00:00:00")
    rng = np.random.RandomState(7)
    for b in range(batches):
        idx = np.arange(per_batch, dtype=np.int64) + b * per_batch
        u = idx % keys
        if held:
            typ = np.full(per_batch, "view", dtype=object)
        else:
            # every 20th row per key is a purchase; rest are views
            typ = np.where((idx // keys) % 20 == 19, "purchase", "view")
        t = base + pd.to_timedelta(idx, unit="s")
        v = rng.randint(0, 1000, size=per_batch)
        pdf = pd.DataFrame({"t": t.astype("datetime64[us]"), "u": u,
                            "typ": typ, "v": v.astype(np.int64)})
        pdf.to_parquet(os.path.join(tmpdir, f"batch_{b:03d}.parquet"), index=False)
    # trailing watermark-advancer batch so held matches become definitive
    tail = pd.DataFrame({
        "t": pd.Series([base + pd.Timedelta(days=1)]).astype("datetime64[us]"),
        "u": [0], "typ": ["error"], "v": [0]})
    tail.to_parquet(os.path.join(tmpdir, f"batch_{batches:03d}.parquet"),
                    index=False)


def run_once(spark, tmpdir: str) -> tuple[float, int]:
    from beam_spark.operators.cep import MatchRecognize, vectorized
    from beam_spark.pcollection import PCollection
    from beam_spark.streaming import WithWatermark, WriteStreamToMemory

    df = (spark.readStream.schema("t timestamp, u long, typ string, v long")
          .option("maxFilesPerTrigger", 1).parquet(tmpdir))
    mr = MatchRecognize(
        partition_by="u", order_by=["t"],
        pattern=[("V", "+"), ("P", "1")],
        defines={"V": vectorized(lambda pdf: pdf["typ"] == "view"),
                 "P": vectorized(lambda pdf: pdf["typ"] == "purchase")},
        measures={"n_views": lambda m: sum(1 for s, _ in m if s == "V"),
                  "purchase_v": lambda m: m[-1][1]["v"]},
        output_schema="u long, n_views long, purchase_v long")
    t0 = time.perf_counter()
    rows = (PCollection(df, is_bounded=False)
            | WithWatermark("t", "10 seconds")
            | mr
            | WriteStreamToMemory(output_mode="append")).collect()
    return time.perf_counter() - t0, len(rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=50_000)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--keys", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--held", action="store_true",
                    help="held-buffer regime: no purchases, the whole "
                         "stream stays in per-key state")
    args = ap.parse_args()

    from beam_spark.session import get_spark

    spark = get_spark("cep-stream-bench",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")

    tmpdir = tempfile.mkdtemp(prefix="bs_cep_bench_")
    try:
        build_input(tmpdir, args.events, args.batches, args.keys,
                    held=args.held)
        run_once(spark, tmpdir)  # warmup (cold JVM/python workers)
        times, n_rows = [], 0
        for _ in range(args.runs):
            dt, n_rows = run_once(spark, tmpdir)
            times.append(round(dt, 2))
            print(f"run: {dt:.2f}s ({n_rows} matches)", file=sys.stderr)
        med = statistics.median(times)
        print(json.dumps({
            "regime": "held" if args.held else "ingest",
            "events": args.events,
            "batches": args.batches, "keys": args.keys,
            "matches": n_rows, "runs": times,
            "median_sec": round(med, 2),
            "events_per_sec": round(args.events / med, 0)}))
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
