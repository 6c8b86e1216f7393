#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): noop-sink timing for a named
subset of queries at a given SF dir, optionally dumping
``.explain("formatted")`` to a file per query.

``bench.py`` is the frozen driver artifact; THIS file is the working
harness for optimization rounds.  Methodology matches bench.py (same
session config, noop sink, best-of-N with the min) so numbers are
comparable.

Usage:
    python bench_extra.py [--sf /root/testdata/sf1.0] [--cpus 32]
        [--repeats 2] [--plans plans/r06 --suffix _before] name ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory to write <name><suffix>.txt explain output")
    ap.add_argument("--suffix", default="")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench as bench_mod

    spark = bench_mod.build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qset = entry_mod.queries()
    out: dict[str, float] = {}
    for name in args.names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qset[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{name}{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        walls = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            bench_mod.materialize(qset[name](spark, args.sf))
            walls.append(time.perf_counter() - t0)
        out[name] = round(min(walls), 3)
        print(f"{name}: {out[name]} s  (trials {[round(w,3) for w in walls]})",
              file=sys.stderr)
    print(json.dumps({"sf": args.sf, "cpus": args.cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
