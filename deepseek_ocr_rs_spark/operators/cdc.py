"""Content-defined chunking (CDC): shift-resilient text chunks.

Fixed-size chunking breaks on INSERTION: one added word shifts every
downstream chunk boundary, so two 99%-identical documents share zero
chunk hashes.  Content-defined chunking (the Rabin-fingerprint
boundary rule of LBFS (Muthitacharoen et al. SOSP'01), rsync, and
modern dedup stores / dataset-versioning systems) cuts where a rolling
hash of the last ``w`` characters hits a target residue — boundaries
are a pure function of LOCAL content, so an edit only perturbs the
chunks it touches and everything downstream re-aligns.  For a training
-data platform this is the storage/versioning primitive: crawl N+1
stores only the chunks crawl N didn't, and near-identical documents
are visible as chunk-hash overlap without any pairwise comparison.

Determinism/exactness: the polynomial rolling hash
``h_e = fold(acc * B + code(char)) mod M`` over each w-char window is
integer arithmetic both engines replicate exactly (B=257, M=1e9+7 —
products stay far inside int64); a 1-based end position ``e`` is a
boundary iff ``h_e mod D == D-1``.  No min/max chunk bounds: those are
stateful (each boundary depends on the previous), which would
serialize the scan — production systems apply them in the sequential
writer, while the PARALLEL boundary rule here is the pure original
Rabin form, computable per position independently.

100 TB plan shape: boundaries, chunk spans, and chunk digests are ONE
row-local JVM lambda pipeline (filter over sequence + fold — no
Python, no shuffle, no explode until the final per-chunk posexplode);
the only exchanges belong to whatever rollup consumes the chunk table
(e.g. a distinct-digest storage estimate, map-side combinable).  The
per-position w-char fold costs O(w * len) per document with w = 8 —
linear scan work inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cdc_chunks", "cdc_chunks_oracle_sql"]

_B = 257
_M = 1_000_000_007


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    d: int = 64,
) -> DataFrame:
    """(id, chunk_idx, start, length, chunk_md5) per CDC chunk —
    ``start`` 1-based, boundaries where the w-char rolling hash hits
    ``D-1 mod D`` (expected chunk length ~``d``).  Empty documents
    yield no rows; documents shorter than ``w`` yield one chunk."""
    n = f"length({text_col})"
    roll = (
        f"aggregate(sequence(e - {w} + 1, e), cast(0 as bigint), "
        f"(acc, p) -> (acc * {_B} + ascii(substring({text_col}, p, 1)))"
        f" % {_M})"
    )
    bounds = (
        f"CASE WHEN {n} >= {w} THEN "
        f"filter(sequence({w}, {n}), e -> {roll} % {d} = {d} - 1) "
        f"ELSE cast(array() as array<int>) END"
    )
    # spans as parallel starts/stops arrays; the only invalid span the
    # zip can produce is the empty TAIL when the last char is itself a
    # boundary — filtering it keeps every surviving index unchanged,
    # so chunk_idx needs no re-ranking
    return (
        df.withColumn("_bounds", F.expr(bounds))
        .withColumn(
            "_starts",
            F.expr("concat(array(1), transform(_bounds, b -> b + 1))"),
        )
        .withColumn("_stops", F.expr(f"concat(_bounds, array({n}))"))
        .select(
            F.col(id_col),
            F.col(text_col).alias("_t"),
            F.col("_stops"),
            F.posexplode("_starts").alias("chunk_idx", "_s"),
        )
        .withColumn("_e", F.expr("element_at(_stops, chunk_idx + 1)"))
        .where(F.col("_e") >= F.col("_s"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("_s").cast("long").alias("start"),
            (F.col("_e") - F.col("_s") + 1).cast("long").alias("length"),
            F.md5(F.expr("substring(_t, _s, _e - _s + 1)")).alias(
                "chunk_md5"
            ),
        )
    )


def cdc_chunks_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    d: int = 64,
) -> str:
    """DuckDB SQL replicating ``cdc_chunks`` exactly (same rolling
    hash, same boundary rule, same 1-based spans and md5)."""
    return f"""
        WITH cdc_b AS (
          SELECT {id_col}, {text_col} AS _t,
                 CASE WHEN length({text_col}) >= {w} THEN
                   list_filter(range({w}, length({text_col}) + 1),
                     e -> list_reduce(
                            list_transform(range(e - {w} + 1, e + 1),
                              p -> CAST(ascii(substr({text_col}, p, 1))
                                        AS BIGINT)),
                            (acc, c) -> (acc * {_B} + c) % {_M})
                          % {d} = {d} - 1)
                 ELSE [] END AS _bounds
          FROM {table}
        ),
        cdc_spans AS (
          SELECT {id_col}, _t,
                 list_concat([1], list_transform(_bounds, b -> b + 1))
                   AS _starts,
                 list_concat(_bounds, [length(_t)]) AS _stops
          FROM cdc_b
        )
        SELECT {id_col},
               CAST(i - 1 AS BIGINT) AS chunk_idx,
               CAST(_starts[i] AS BIGINT) AS start,
               CAST(_stops[i] - _starts[i] + 1 AS BIGINT) AS length,
               md5(substr(_t, _starts[i], _stops[i] - _starts[i] + 1))
                 AS chunk_md5
        FROM cdc_spans, UNNEST(range(1, len(_starts) + 1)) AS u(i)
        WHERE _stops[i] >= _starts[i]
    """
