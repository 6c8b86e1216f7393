"""Sliding-window document chunking with character offsets.

The training-data op the extraction output feeds directly: long documents
are cut into fixed-size overlapping windows (RAG indexing, pretraining
sequence prep), each chunk carrying its (start, len) offset into the
source so spans survive the cut — the same offset discipline as the
extraction span table (functions/markdown.py F12).

Chunk schedule for a document of length L (chars), window ``size`` and
step ``stride`` (stride <= size => overlap = size - stride):

    n_chunks = 1                        if L <= size
             = 1 + ceil((L-size)/stride) otherwise
    start_i  = i * stride,  i in [0, n_chunks)
    chunk_i  = substring(text, start_i + 1, size)   (1-based, char units)

The last chunk may be shorter than ``size``; every character of the
document is covered and no chunk starts beyond the text.  NULL/empty
documents yield no chunks (the extraction pipeline's empty-output guard
C5 applies upstream).

Plan shape: pure JVM — sequence() builds the start array, posexplode
fans out, substring slices; NO shuffle at all (chunking is embarrassingly
row-parallel), so at 100 TB the operator pipelines inside the scan stage
with predicate pushdown intact.  The chunk content is surfaced as an md5
hash (exact, engine-portable) rather than the text itself so downstream
dedup can run on fixed-width keys — the raw chunk is one substring away.

Oracle parity: ceil is spelled as integer floor-div arithmetic
((L - size + stride - 1) / stride) on both engines; substring is
character-based on both Spark and DuckDB; md5 hashes the UTF-8 bytes on
both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_windows", "chunk_windows_oracle_sql"]


def chunk_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 120,
    stride: int = 80,
) -> DataFrame:
    """docs -> (id, chunk_idx, start, chunk_len, chunk_md5), one row per
    sliding window.  size/stride in characters; stride must be >= 1."""
    if stride < 1 or size < 1:
        raise ValueError("size and stride must be >= 1")
    length = F.length(F.col(text_col))
    n_chunks = F.when(length <= size, F.lit(1)).otherwise(
        F.lit(1)
        + F.floor((length - size + stride - 1) / F.lit(stride)).cast("int")
    )
    starts = F.sequence(
        F.lit(0), (n_chunks - 1) * stride, F.lit(stride)
    )
    exploded = (
        docs.where(F.col(text_col).isNotNull() & (length > 0))
        .select(F.col(id_col), F.col(text_col), F.posexplode(starts))
        .withColumnRenamed("pos", "chunk_idx")
        .withColumnRenamed("col", "start")
    )
    piece = F.expr(f"substring({text_col}, start + 1, {size})")
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.col("start"),
        F.length(piece).alias("chunk_len"),
        F.md5(F.encode(piece, "UTF-8")).alias("chunk_md5"),
    )


def chunk_windows_oracle_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 120,
    stride: int = 80,
) -> str:
    return f"""
WITH docs AS ({docs_sql}),
sched AS (
  SELECT {id_col}, {text_col},
         CASE WHEN LENGTH({text_col}) <= {size} THEN 1
              ELSE 1 + CAST(FLOOR((LENGTH({text_col}) - {size}
                                   + {stride} - 1) / {stride}) AS INT)
         END AS n_chunks
  FROM docs
  WHERE {text_col} IS NOT NULL AND LENGTH({text_col}) > 0
)
SELECT {id_col},
       CAST(i AS INT) AS chunk_idx,
       CAST(i * {stride} AS INT) AS start,
       LENGTH(SUBSTRING({text_col}, CAST(i * {stride} AS INT) + 1, {size}))
         AS chunk_len,
       MD5(SUBSTRING({text_col}, CAST(i * {stride} AS INT) + 1, {size}))
         AS chunk_md5
FROM sched, UNNEST(generate_series(0, n_chunks - 1)) AS g(i)
"""
