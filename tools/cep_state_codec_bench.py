#!/usr/bin/env python
"""Isolated A/B of the streaming-CEP state codecs (SCALE.md evidence).

End-to-end wall clock on this host drifts ±50% run-to-run (VM CPU
stealing), and the 50k/3-batch TestStream regime is floored by ~6s of
micro-batch machinery (measured: a native windowed agg on the identical
source costs the same) — so the codec's effect is measured here in
isolation, single-threaded and deterministic.

Replays the exact per-micro-batch state sequence of
``MatchRecognize._expand_streaming`` for a key whose buffer holds
``--rows`` rows (the open-match / held-buffer regime where state cost
dominates — e.g. V+ P with the P still outstanding):

  r14 dict-records codec          r15 columnar codec
  ------------------------------  --------------------------------
  pickle.loads -> list[dict]      pickle.loads -> {col: ndarray}
  extend(pdf.to_dict('records'))  pd.concat([buf, pdf])
  list.sort(key=tuple(...))       sort_values(kind='stable')
  per-row pd.Timestamp(...).value ndarray.astype('datetime64[ms]')
  pickle.dumps(list[dict])        pickle.dumps({col: ndarray})

Also reports blob sizes: the state store persists the blob per key per
batch, so bytes are cluster IO, not just CPU.

Usage: python tools/cep_state_codec_bench.py [--rows 50000] [--batches 4]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import pickle
import time

import numpy as np
import pandas as pd

ORDER_BY = ["t"]
TS_COL = "t"


def make_batch(rows: int, offset: int) -> pd.DataFrame:
    base = pd.Timestamp("2024-01-01 00:00:00")
    idx = np.arange(rows, dtype=np.int64) + offset
    return pd.DataFrame({
        "t": (base + pd.to_timedelta(idx, unit="s")).astype("datetime64[us]"),
        "u": idx % 4,
        "typ": np.full(rows, "view", dtype=object),
        "v": idx % 1000})


def run_dict_records(batches: list[pd.DataFrame]) -> tuple[float, int]:
    """The r14 codec: state is a pickled list of per-row dicts."""
    blob = pickle.dumps({"buf": [], "mn": 0, "ctx": []})
    t0 = time.perf_counter()
    for pdf in batches:
        saved = pickle.loads(blob)
        buf = saved["buf"]
        buf.extend(pdf.to_dict(orient="records"))
        buf.sort(key=lambda r: tuple(r[c] for c in ORDER_BY))
        n_mature = len(buf)  # tail batch matured everything
        _ = pd.DataFrame(buf[:n_mature])          # mask-eval frame
        _ = np.array([int(pd.Timestamp(r[TS_COL]).value // 1_000_000)
                      for r in buf[:n_mature]], dtype=np.int64)
        blob = pickle.dumps({"buf": buf, "mn": saved["mn"], "ctx": []})
    return time.perf_counter() - t0, len(blob)


def run_columnar(batches: list[pd.DataFrame]) -> tuple[float, int]:
    """The r15 codec: state is a pickled {column -> numpy array}."""
    blob = pickle.dumps({"cols": None, "mn": 0, "ctx": None})
    t0 = time.perf_counter()
    for pdf in batches:
        saved = pickle.loads(blob)
        parts = ([pd.DataFrame(saved["cols"])]
                 if saved["cols"] is not None else [])
        parts.append(pdf)
        buf = (parts[0] if len(parts) == 1
               else pd.concat(parts, ignore_index=True))
        buf = buf.sort_values(ORDER_BY, kind="stable", ignore_index=True)
        n_mature = len(buf)
        _ = buf.iloc[:n_mature]                   # mask-eval frame
        _ = (buf[TS_COL].to_numpy().astype("datetime64[ms]")
             .astype(np.int64))
        blob = pickle.dumps(
            {"cols": {c: buf[c].to_numpy() for c in buf.columns},
             "mn": saved["mn"], "ctx": None})
    return time.perf_counter() - t0, len(blob)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000,
                    help="held-buffer size after all batches")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    per = args.rows // args.batches
    batches = [make_batch(per, b * per) for b in range(args.batches)]
    # warmup both paths once
    run_dict_records([b.head(100) for b in batches])
    run_columnar([b.head(100) for b in batches])

    old_t, old_b = min(run_dict_records(batches)[0]
                       for _ in range(args.runs)), 0
    _, old_b = run_dict_records(batches)
    new_t = min(run_columnar(batches)[0] for _ in range(args.runs))
    _, new_b = run_columnar(batches)

    print(json.dumps({
        "rows": args.rows, "batches": args.batches,
        "dict_records_sec": round(old_t, 3),
        "columnar_sec": round(new_t, 3),
        "speedup": round(old_t / new_t, 1),
        "dict_records_blob_bytes": old_b,
        "columnar_blob_bytes": new_b,
        "blob_ratio": round(old_b / new_b, 1)}))


if __name__ == "__main__":
    main()
