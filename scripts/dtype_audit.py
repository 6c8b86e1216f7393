"""Cross-engine dtype audit: for every oracle-checked query, compare the
pandas dtype of each output column between Spark (toPandas) and DuckDB
(.df()).  A dtype-family mismatch (int64 vs float64, int64 vs object, ...)
is exactly the class of failure behind the CORRECTNESS_r05
ann_sq8_topk hash_match=false: DuckDB SUM(BIGINT) returns HUGEINT, which
pandas materializes as float64, so a dtype-sensitive canonicalizer hashes
the same exact integer two different ways.

Usage:
    python scripts/dtype_audit.py [--sf /root/testdata/sf0.001] [name ...]
"""
import argparse
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def family(dtype) -> str:
    s = str(dtype)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("bool"):
        return "bool"
    if s.startswith("datetime"):
        return "datetime"
    return s  # object etc.


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qset = entry_mod.queries()
    oset = entry_mod.oracle_sql()
    names = args.names or [n for n in qset if n in oset]

    n_bad = 0
    for name in names:
        try:
            sdf = qset[name](spark, args.sf).toPandas()
            odf = con.execute(oset[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        s_cols = {c.lower(): family(d) for c, d in sdf.dtypes.items()}
        o_cols = {c.lower(): family(d) for c, d in odf.dtypes.items()}
        mism = []
        for c in sorted(set(s_cols) | set(o_cols)):
            sf_, of_ = s_cols.get(c), o_cols.get(c)
            if sf_ != of_:
                # empty frames give object on both sides for any type;
                # only flag when both sides actually carry rows
                if len(sdf) and len(odf):
                    mism.append((c, sf_, of_))
        if mism:
            n_bad += 1
            print(f"MISM {name}: " + ", ".join(
                f"{c} spark={a} duckdb={b}" for c, a, b in mism))
        else:
            print(f"ok   {name}")
    print(f"\n{n_bad} queries with dtype mismatches / errors")
    spark.stop()


if __name__ == "__main__":
    main()
