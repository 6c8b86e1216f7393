"""Self-check of the driver correctness gate: run every queries() entry via
Spark AND its oracle_sql() via DuckDB on the same parquet (sf0.001), compare
row count + column names + exact values (the driver hashes values after
sorting columns by name — this test is strictly stronger: full multiset
equality)."""

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql)


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    # a DATE and its midnight TIMESTAMP are the same instant: Spark emits
    # timestamp_ntz where DuckDB's oracle emits DATE (pandas-dtype
    # alignment for the driver canonicalizer) — same rule as
    # scripts/gate_check.py
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat(sep=" ")
    return v


def _sort_key(row):
    # None-safe total order: rows that tie on leading columns and mix
    # NULL with non-NULL later (outer joins, first-leaf-wins NULLs)
    # must still sort, so key each cell by (is-None, type, value) —
    # same discipline as scripts/gate_check.py.
    return tuple((v is None, type(v).__name__, v) for v in row)


def _as_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_normalize_cell(r[i]) for i in order) for r in rows),
        key=_sort_key,
    )


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = _duck(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _as_multiset(spark_cols, spark_rows)
    b = _as_multiset(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Non-SQL-expressible ops: at least run + stable schema + rows >= 0."""
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_no_nested_output_columns(spark):
    """The driver's canonicalizer sorts pandas cell values — a top-level
    array/map/struct column is unhashable there (TypeError: unhashable
    type 'list'; bit search_posting_lists in CORRECTNESS_r04 even though
    the in-repo gate passed it).  Pin the contract: every oracle-gated
    query output is atomic columns only; serialize lists the way
    ann_pq_codes / posting_lists do (join to one string)."""
    from pyspark.sql import types as T

    offenders = []
    for name in sorted(ORACLES):
        sdf = QUERIES[name](spark, SF_DIR)
        for f in sdf.schema.fields:
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            ):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, f"nested output columns: {offenders}"
