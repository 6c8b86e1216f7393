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
row-local vectorized Arrow stage — zero shuffles; the only exchanges
belong to whatever rollup consumes the chunk table (e.g. a
distinct-digest storage estimate, map-side combinable).  The hashing
is O(w * len) per document as 8 shifted numpy multiply-adds.  (A pure
SQL higher-order-function form is semantically identical but
Catalyst interprets HOF lambdas — measured 47 s for 10k sf0.1 docs
vs sub-second for the kernel; see ``cdc_chunks``.)
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
    yield no rows; documents shorter than ``w`` yield one chunk.

    Implementation: a vectorized Arrow/numpy kernel.  The pure-SQL
    form (filter-over-sequence with a per-position w-char aggregate
    fold) is semantically identical but Catalyst INTERPRETS
    higher-order-function lambdas — measured 47 s for 10k documents
    at sf0.1, a scale-killer constant factor — while the numpy form
    does the same integer arithmetic as 8 shifted vector
    multiply-adds per document (codepoints via utf-32 decode, so the
    hash sees exactly what SQL's ``ascii(substring(...))`` sees) and
    runs the whole corpus in well under a second.  Still zero
    shuffles; the only cross-boundary cost is the Arrow batch
    transfer the repo's extraction tier already pays."""
    import hashlib

    import numpy as np
    import pandas as pd

    pw = np.array(
        [pow(_B, j, _M) for j in range(w)], dtype=np.int64
    )  # pw[j] multiplies the char j positions BEFORE the window end

    def run(batches):
        for pdf in batches:
            out_id, out_idx, out_start, out_len, out_md5 = (
                [], [], [], [], [],
            )
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                n = len(text)
                if n == 0:
                    continue
                if n >= w:
                    codes = np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
                    acc = np.zeros(n - w + 1, dtype=np.int64)
                    for j in range(w):
                        acc = (
                            acc + codes[w - 1 - j:n - j] * pw[j]
                        ) % _M
                    # window end e (1-based) = w + offset
                    bounds = (np.nonzero(acc % d == d - 1)[0] + w).tolist()
                else:
                    bounds = []
                starts = [1] + [b + 1 for b in bounds]
                stops = bounds + [n]
                for i, (s, e) in enumerate(zip(starts, stops)):
                    if e < s:
                        continue  # empty tail: last char was a boundary
                    piece = text[s - 1:e]
                    out_id.append(rid)
                    out_idx.append(i)
                    out_start.append(s)
                    out_len.append(e - s + 1)
                    out_md5.append(
                        hashlib.md5(piece.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out_id, dtype="int64"),
                    "chunk_idx": pd.Series(out_idx, dtype="int64"),
                    "start": pd.Series(out_start, dtype="int64"),
                    "length": pd.Series(out_len, dtype="int64"),
                    "chunk_md5": pd.Series(out_md5, dtype="object"),
                }
            )

    schema = (
        f"{id_col} long, chunk_idx long, start long, length long,"
        " chunk_md5 string"
    )
    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    return rebalance_for_arrow(df.select(id_col, text_col)).mapInPandas(
        run, schema=schema
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
