#!/usr/bin/env python
"""CPU-time bench: per-query compute cost that hypervisor steal cannot fake.

Wall-clock on this shared VM swings 4-15x between identical runs
(BENCH/BASELINE.md), which makes wall-only A/Bs of sub-20s queries nearly
unreadable.  The quantity an optimization actually changes — total CPU
seconds burned across the JVM and every Python worker — is visible in
/proc and is insensitive to steal (a stolen core consumes no CPU time).

For each named query: one untimed warm pass, then ``--repeats`` timed
passes recording (wall, delta CPU-seconds of every java/python process on
the box).  Reports min wall and min CPU.  The sandbox runs nothing else,
so summing all JVM/python jiffies is exact enough; the driver process's
own jiffies are included (it is part of the cost).

Usage:
    python scripts/cpu_bench.py [--sf DIR] [--cpus N] [--repeats 2] name...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

CLK = os.sysconf("SC_CLK_TCK")


def _tree_cpu() -> float:
    """Total utime+stime (seconds) of every java/python process."""
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat", "rb") as fh:
                parts = fh.read().split(b")")[-1].split()
            with open(f"/proc/{pid}/comm", "rb") as fh:
                comm = fh.read().strip()
        except OSError:
            continue
        if b"java" in comm or b"python" in comm:
            total += int(parts[11]) + int(parts[12])  # utime, stime
    return total / CLK


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/bigsf/sf1.0"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as bench_mod

    spark = bench_mod.build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qset = entry_mod.queries()
    out = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"cpu_bench:{name}")
        if not args.no_warm:
            bench_mod.materialize(qset[name](spark, args.sf))
        walls, cpus = [], []
        for _ in range(args.repeats):
            c0, t0 = _tree_cpu(), time.perf_counter()
            bench_mod.materialize(qset[name](spark, args.sf))
            walls.append(time.perf_counter() - t0)
            cpus.append(_tree_cpu() - c0)
        out[name] = {"wall": round(min(walls), 3),
                     "cpu": round(min(cpus), 2)}
        print(f"{name}: wall {out[name]['wall']}s  cpu {out[name]['cpu']}s "
              f"(walls {[round(w, 2) for w in walls]})", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
