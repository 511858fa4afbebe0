"""PROFILING-ONLY synthetic scale-up of the driver testdata.

Replicates ``/root/testdata/sf0.1`` K times (default 10 -> an sf1.0-shaped
set) so driver-scale performance work can continue after a sandbox reboot
wiped the driver-generated ``sf1.0`` directory.  This data is NEVER used
for correctness (oracle gates run on the real sf0.001/sf0.01 dirs) and is
written OUTSIDE ``/root/testdata`` so the driver's own generation is
untouched.

Replica construction keeps per-replica statistics exactly isomorphic to
the source so operator cost models transfer:

* fact/dim tables: key-offset copies (FK-consistent within a replica;
  region/nation stay shared dims, nationkeys are not offset);
* documents: per-replica PERMUTATION of the (tiny) word vocabulary --
  token-, n-gram- and duplicate-structure inside a replica is identical
  to sf0.1, the vocabulary does not grow, and cross-replica texts are
  effectively fresh random sequences (a random permutation of ~31 words
  fixes ~1 of them); n_chars is recomputed from the mapped text;
* embeddings: per-replica random ORTHOGONAL rotation (QR of a seeded
  gaussian) applied to all vectors -- all within-replica inner products,
  norms and the label-cluster geometry are preserved bit-for-bit in
  float64 then cast back to float32; cross-replica similarities become
  generic.

Usage: python scripts/gen_sf_scaleup.py [--k 10] [--out /dev/shm/kgsf/sf1.0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

OFFSET_COLS = {
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 100000},
}


def scale_table(name: str, k: int, out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for r in range(k):
        cols = {}
        for field in t.schema:
            col = t.column(field.name)
            off = OFFSET_COLS.get(name, {}).get(field.name)
            if off and r:
                col = pa.compute.add(col, off * r)
            cols[field.name] = col
        parts.append(pa.table(cols, schema=None))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/{name}.parquet",
                   compression="zstd")


def scale_documents(k: int, out_dir: str) -> None:
    df = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    vocab = sorted({w for s in df.text for w in s.split()})
    parts = []
    for r in range(k):
        rep = df.copy()
        if r:
            rng = np.random.default_rng(1000 + r)
            mapping = dict(zip(vocab, rng.permutation(vocab)))
            rep["text"] = [
                " ".join(mapping[w] for w in s.split()) for s in df.text
            ]
            rep["n_chars"] = rep.text.str.len().astype("int64")
            rep["doc_id"] = df.doc_id + r * len(df)
        parts.append(rep)
    import pandas as pd

    out = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                   f"{out_dir}/documents.parquet", compression="zstd")


def scale_embeddings(k: int, out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    df = t.to_pandas()
    mat = np.stack(df.embedding.to_numpy())  # (n, dim) float32
    dim = mat.shape[1]
    parts = []
    for r in range(k):
        rep = df.copy()
        if r:
            rng = np.random.default_rng(2000 + r)
            q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
            rep["embedding"] = list(
                (mat.astype("float64") @ q).astype("float32")
            )
            rep["vec_id"] = df.vec_id + r * len(df)
        parts.append(rep)
    import pandas as pd

    out = pd.concat(parts, ignore_index=True)
    emb = pa.array(
        [v.tolist() for v in out.embedding], type=pa.list_(pa.float32())
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(out.vec_id, type=pa.int64()),
            "embedding": emb,
            "label": pa.array(out.label, type=pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet", compression="zstd")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="/dev/shm/kgsf/sf1.0")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for name in ["region", "nation"]:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{args.out}/{name}.parquet", compression="zstd")
    for name in ["customer", "supplier", "part", "orders", "lineitem",
                 "events"]:
        scale_table(name, args.k, args.out)
        print("scaled", name)
    scale_documents(args.k, args.out)
    print("scaled documents")
    scale_embeddings(args.k, args.out)
    print("scaled embeddings")

    # bench.py warms up on a sibling sf0.001 dir; link the real one
    sib = os.path.join(os.path.dirname(args.out.rstrip("/")), "sf0.001")
    if not os.path.exists(sib):
        os.symlink("/root/testdata/sf0.001", sib)
    print("done ->", args.out)


if __name__ == "__main__":
    main()
