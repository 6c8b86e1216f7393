#!/usr/bin/env python
"""Paired two-SF kernel A/Bs for the iteration-bound operators.

VERDICT r04 item 8: emb_semantic_dedup / dedup_components /
doc_decontaminate are dominated at toy scale by bounded-by-design
iteration overhead (k-means rounds, star rounds, broadcast set-up), so
a single wall time says nothing about the 100x extrapolation.  This
script separates the two cost components with a paired measurement:

    wall(sf) = fixed + per_row * input_rows(sf)

Two scale factors solve for both.  Protocol (host-noise rules,
BENCH/BASELINE.md): trials are INTERLEAVED (small, big, small, big ...)
so both SFs sample the same host window; min-of-N per SF; a pure-CPU
spin probe runs before and after to grade the window.

Usage: python scripts/kernel_ab.py [trials]   (default 3)
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


QUERIES = {
    # query -> the input table whose row count drives per-row cost
    "emb_semantic_dedup": "embeddings",
    "dedup_components": "documents",
    "doc_decontaminate": "documents",
}
SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def spin_probe(seconds: float = 1.0) -> float:
    """Single-core integer spin; returns iterations/sec (higher=quieter)."""
    t0 = time.perf_counter()
    n = 0
    x = 1
    while time.perf_counter() - t0 < seconds:
        x = (x * 1103515245 + 12345) % 2147483647
        n += 1
    return n / (time.perf_counter() - t0)


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_spark, materialize
    import __spark_entry__ as entry_mod

    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    qset = entry_mod.queries()

    rows = {
        sf: {
            t: spark.read.parquet(f"{sf}/{t}.parquet").count()
            for t in set(QUERIES.values())
        }
        for sf in (SF_SMALL, SF_BIG)
    }

    probe_before = spin_probe()
    out = {}
    for name, table in QUERIES.items():
        walls = {SF_SMALL: [], SF_BIG: []}
        # one untimed warmup per SF (JIT, codegen, file listing)
        for sf in (SF_SMALL, SF_BIG):
            materialize(qset[name](spark, sf))
        for _ in range(trials):
            for sf in (SF_SMALL, SF_BIG):  # interleaved pairing
                t0 = time.perf_counter()
                materialize(qset[name](spark, sf))
                walls[sf].append(time.perf_counter() - t0)
        w_s, w_b = min(walls[SF_SMALL]), min(walls[SF_BIG])
        n_s, n_b = rows[SF_SMALL][table], rows[SF_BIG][table]
        per_row = (w_b - w_s) / (n_b - n_s) if n_b > n_s else float("nan")
        fixed = w_s - per_row * n_s
        out[name] = {
            "input_table": table,
            "rows_small": n_s,
            "rows_big": n_b,
            "wall_small_s": round(w_s, 3),
            "wall_big_s": round(w_b, 3),
            "per_row_us": round(per_row * 1e6, 3),
            "fixed_overhead_s": round(fixed, 3),
            "fixed_share_at_big": round(fixed / w_b, 3) if w_b else None,
            "trials": {k: [round(x, 3) for x in v] for k, v in walls.items()},
        }
    probe_after = spin_probe()
    print(json.dumps({
        "kernel_ab": out,
        "probe_mips_before": round(probe_before / 1e6, 2),
        "probe_mips_after": round(probe_after / 1e6, 2),
        "trials_per_sf": trials,
    }))


if __name__ == "__main__":
    main()
