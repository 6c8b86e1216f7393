#!/usr/bin/env python
"""Build a scaled-up measurement copy of the sf0.1 test tables.

The driver's round-end MEASUREMENT runs at a driver-generated scale factor
(sf=1.0 in BENCH_r05), but only sf{0.001,0.01,0.1} live under
/root/testdata (read-only).  For optimization work we need a local
dataset of the driver's measurement size so that changes are validated at
the scale the round is graded at, not just at sf0.1.

This scales each table K-fold from /root/testdata/sf0.1 by emitting K
perturbed copies:

* key columns shift by ``copy * (max_key + 1)`` so uniqueness and join
  fan-out are preserved while key cardinality scales linearly;
* ``documents.text`` is word-shuffled per copy with a seeded RNG — same
  word frequencies and doc lengths, but shingle/minhash overlap across
  copies matches unrelated-doc background, so dedup tiers see a corpus
  that is 10x bigger, not one with 10x planted duplicates;
* ``embeddings.embedding`` gets a per-copy seeded dimension permutation
  (norm-preserving) so copies are not exact ANN duplicates;
* ``events`` keeps its timestamp window (10x density, like the driver's
  generator) and shifts user/event ids.

Output goes OUTSIDE the repo and testdata (default /root/bigsf/sf1.0).
This is a measurement harness only: nothing in queries()/bench.py reads
it unless $SPARK_GRAFT_SF_DIR points at it explicitly.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEY_SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
# dimension tables are not scaled (driver keeps nation/region fixed)
PASSTHROUGH = ["nation", "region"]


def _shifted(col: pa.ChunkedArray, shift: int) -> pa.Array:
    arr = col.combine_chunks()
    return pa.array(arr.to_numpy(zero_copy_only=False) + shift, type=arr.type)


def scale_table(name: str, src: str, dst: str, k: int) -> None:
    tab = pa.Table.from_batches(pq.read_table(os.path.join(src, f"{name}.parquet")).to_batches())
    shifts = {}
    for key in KEY_SHIFT.get(name, []):
        vals = tab.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        shifts[key] = int(vals.max()) + 1
    copies = []
    for c in range(k):
        t = tab
        for key, base in shifts.items():
            idx = t.schema.get_field_index(key)
            t = t.set_column(idx, t.schema.field(idx), _shifted(tab.column(key), c * base))
        if name == "documents" and c > 0:
            rng = np.random.default_rng(1000 + c)
            texts = tab.column("text").combine_chunks().to_pylist()
            out = []
            for s in texts:
                words = s.split(" ")
                rng.shuffle(words)
                out.append(" ".join(words))
            idx = t.schema.get_field_index("text")
            t = t.set_column(idx, t.schema.field(idx), pa.array(out, type=pa.string()))
        if name == "embeddings" and c > 0:
            rng = np.random.default_rng(2000 + c)
            embs = tab.column("embedding").combine_chunks()
            mat = np.asarray(embs.to_pylist(), dtype=np.float32)
            perm = rng.permutation(mat.shape[1])
            sign = rng.choice([-1.0, 1.0], size=mat.shape[1]).astype(np.float32)
            mat = mat[:, perm] * sign
            idx = t.schema.get_field_index("embedding")
            t = t.set_column(
                idx, t.schema.field(idx),
                pa.array(list(mat), type=t.schema.field(idx).type))
        copies.append(t)
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
    print(f"{name}: {tab.num_rows} -> {out.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/bigsf/sf1.0")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    for name in PASSTHROUGH:
        tab = pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        pq.write_table(tab, os.path.join(args.dst, f"{name}.parquet"))
        print(f"{name}: passthrough {tab.num_rows} rows")
    for name in KEY_SHIFT:
        scale_table(name, args.src, args.dst, args.k)


if __name__ == "__main__":
    main()
