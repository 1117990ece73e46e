"""Synthesize a LOCAL sf1 slice (10x sf0.1) for second-decade scale
measurement — /root/testdata tops out at sf0.1, so the 100 TB design
story needs a measured sf0.1 -> sf1 hop on the flagship suites.

Method: 10 key-offset replicas of every sf0.1 table (stride 1e7 per
key domain — above every sf0.1 key maximum), foreign keys remapped
with the same stride so every join relationship is preserved within a
replica and impossible across replicas. nation/region stay fixed
(TPC-H semantics). Two tables get structure-aware perturbation so
"10x data" doesn't degenerate into "10 identical copies":

- documents: for replica i>0, any whitespace token whose md5 lands in
  a fixed 1/3 bucket gets an ``i`` suffix. The map depends only on
  (token, i), so two near-duplicate docs inside replica i are
  perturbed IDENTICALLY — within-replica near-dup structure (and so
  pair counts) scales linearly — while cross-replica pairs die:
  ~(2/3)^k of k-token shingles survive (≈0.2 for k=4 → Jaccard ≈0.11,
  below every suite threshold).
- embeddings: replica i multiplies each vector by a fixed Rademacher
  sign pattern (sign of dim d = parity of md5(d:i)) — a diagonal
  orthogonal transform, so within-replica cosines are BIT-identical
  (float sign flips are exact) while cross-replica dot products
  scramble to ~0 even for clustered/smooth vectors (a coordinate
  ROLL measurably does not: structured vectors stay similar under
  rotation — the first cut of this generator produced 102x pair
  inflation from exactly that).

Output: /tmp/beam_spark_sf1/{table}.parquet (same layout the gates
read). Deterministic — no RNG anywhere. Runtime ~1 min via DuckDB.

Usage: python tools/gen_sf1.py [out_dir]
"""

import hashlib
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000
REPLICAS = 10


def _offsets(table: str) -> dict:
    return {
        "orders": {"o_orderkey": STRIDE, "o_custkey": STRIDE},
        "lineitem": {"l_orderkey": STRIDE, "l_partkey": STRIDE,
                     "l_suppkey": STRIDE},
        "customer": {"c_custkey": STRIDE},
        "supplier": {"s_suppkey": STRIDE},
        "part": {"p_partkey": STRIDE},
        "events": {"event_id": STRIDE, "user_id": STRIDE},
    }[table]


def gen_keyed(con, table: str, out_dir: str) -> None:
    offs = _offsets(table)
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchall()]
    selects = []
    for i in range(REPLICAS):
        exprs = [f"{c} + {i * offs[c]} AS {c}" if c in offs else c
                 for c in cols]
        selects.append(
            f"SELECT {', '.join(exprs)} "
            f"FROM read_parquet('{SRC}/{table}.parquet')")
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) TO "
        f"'{out_dir}/{table}.parquet' (FORMAT PARQUET)")


def _perturb(text: str, i: int) -> str:
    if i == 0:
        return text
    out = []
    for tok in text.split(" "):
        h = hashlib.md5(tok.encode("utf-8")).digest()[0]
        out.append(f"{tok}{i}" if h % 3 == 0 else tok)
    return " ".join(out)


def gen_documents(con, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = con.execute(
        f"SELECT * FROM read_parquet('{SRC}/documents.parquet') "
        "ORDER BY doc_id").fetch_arrow_table().to_pydict()
    cols = {k: [] for k in base}
    for i in range(REPLICAS):
        for k in base:
            if k == "doc_id":
                cols[k].extend(v + i * STRIDE for v in base[k])
            elif k == "text":
                cols[k].extend(_perturb(t, i) for t in base[k])
            elif k == "n_chars":
                continue  # recomputed below from the perturbed text
            else:
                cols[k].extend(base[k])
    cols["n_chars"] = [len(t) for t in cols["text"]]
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string()), ("source", pa.string()),
                        ("n_chars", pa.int64())])
    pq.write_table(pa.table({k: cols[k] for k in
                             [f.name for f in schema]}, schema=schema),
                   f"{out_dir}/documents.parquet")


def gen_embeddings(con, out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = con.execute(
        f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet') "
        "ORDER BY vec_id").fetch_arrow_table().to_pydict()
    vec_id, emb, label = [], [], []
    vecs = np.stack([np.asarray(v, dtype=np.float32)
                     for v in base["embedding"]])
    dim = vecs.shape[1]
    for i in range(REPLICAS):
        vec_id.extend(v + i * STRIDE for v in base["vec_id"])
        if i == 0:
            flipped = vecs
        else:
            signs = np.array(
                [1.0 if hashlib.md5(f"{d}:{i}".encode()).digest()[0]
                 % 2 == 0 else -1.0 for d in range(dim)],
                dtype=np.float32)
            flipped = vecs * signs
        emb.extend(r.tolist() for r in flipped)
        label.extend(base["label"])
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    pq.write_table(
        pa.table({"vec_id": vec_id, "embedding": emb, "label": label},
                 schema=schema), f"{out_dir}/embeddings.parquet")


def main(out_dir: str = "/tmp/beam_spark_sf1") -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "supplier", "part",
              "events"):
        gen_keyed(con, t, out_dir)
        print("wrote", t)
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")
        print("wrote", t)
    gen_documents(con, out_dir)
    print("wrote documents")
    gen_embeddings(con, out_dir)
    print("wrote embeddings")


if __name__ == "__main__":
    main(*sys.argv[1:])
