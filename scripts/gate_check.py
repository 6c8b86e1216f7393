"""Quick local replica of the driver correctness gate for a subset of
queries: run queries()[name] on Spark and oracle_sql()[name] on DuckDB at a
given sf dir, compare rows/columns/values.  Usage:

    python scripts/gate_check.py [--sf /root/testdata/sf0.001] [name ...]

No names -> all oracle-checked queries.
"""
import argparse
import datetime
import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    # a DATE and its midnight TIMESTAMP are the same instant: Spark emits
    # timestamp_ntz where DuckDB's oracle emits DATE (pandas-dtype
    # alignment for the driver canonicalizer), so compare on the instant
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat(sep=" ")
    return v


def _sort_key(row):
    # None-safe: Python can't compare None with non-None, so rows that tie
    # on leading columns and mix NULL/non-NULL later (CUBE grouping nulls,
    # outer-join nulls) would raise TypeError under plain sorted()
    return tuple((v is None, type(v).__name__, v) for v in row)


def _as_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_normalize_cell(r[i]) for i in order) for r in rows),
        key=_sort_key,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--json", default=None,
                    help="also write per-query results to this JSON file "
                         "(the per-round GATE_ALL artifact)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("gate-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    oracles = entry_mod.oracle_sql()
    queries = entry_mod.queries()
    names = args.names or sorted(oracles)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    n_fail = 0
    record = {}
    for name in names:
        try:
            sdf = queries[name](spark, args.sf)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            ok_cols = sorted(spark_cols) == sorted(duck_cols)
            ok_rows = len(spark_rows) == len(duck_rows)
            a = _as_multiset(spark_cols, spark_rows)
            b = _as_multiset(duck_cols, duck_rows)
            ok_vals = a == b
            record[name] = {
                "rows_match": ok_rows, "schema_match": ok_cols,
                "values_match": ok_vals, "spark_rows": len(spark_rows),
                "oracle_rows": len(duck_rows), "err": None,
            }
            if ok_cols and ok_rows and ok_vals:
                print(f"PASS {name} ({len(spark_rows)} rows)")
            else:
                n_fail += 1
                print(f"FAIL {name}: cols={ok_cols} rows={ok_rows} "
                      f"({len(spark_rows)} vs {len(duck_rows)}) vals={ok_vals}")
                if not ok_cols:
                    print(f"  spark: {sorted(spark_cols)}\n  duck:  {sorted(duck_cols)}")
                if ok_cols and not ok_vals:
                    diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                    print(f"  first diffs: {diffs}")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            record[name] = {
                "rows_match": False, "schema_match": False,
                "values_match": False, "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {str(e)[:300]}",
            }
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump({"sf": args.sf, "n_queries": len(names),
                       "n_fail": n_fail, "results": record}, fh, indent=1)
        print(f"wrote {args.json} ({len(names)} queries, {n_fail} failures)")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
