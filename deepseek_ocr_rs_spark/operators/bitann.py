"""Sign-bit binary quantization ANN — the 1-bit tier completing the
quantization family (brute -> LSH/IVF -> PQ/IVFADC -> SQ8 -> binary).

Each embedding dimension contributes one bit (x > 0), packed 32 bits
per int64 word (32, not 64, so every word stays non-negative and the
packing arithmetic is plain integer addition — no sign-bit overflow
cases to reason about cross-engine).  Retrieval ranks by exact Hamming
distance: sum over words of bit_count(xor(query_word, vector_word)).

This is the memory floor of the ANN ladder: 64 float32 dims (256 B)
become 8 B of codes — at 10^12 vectors the sign index is ~8 TB and
scans entirely JVM-side (xor + bit_count fuse into whole-stage
codegen); candidates from the Hamming scan feed the exact rerank tiers
the repo already has (ann_batch_topk).  Every step is integer-exact, so
the DuckDB oracle replays encode + distance + top-k verbatim.

Determinism: bit packing is a fixed-weight integer sum (order
independent); ties in Hamming distance break on vec_id.  Floats touch
only the x > 0 comparison, which both engines evaluate identically on
the same parquet float32 values.

Scale posture (100 TB): encoding is a pure projection (zero shuffles,
plan-pinned); top-k is TakeOrderedAndProject (never a full sort).  The
bounded ``.first()`` collect fetches ONE query row — the same contract
as ann_sq8_topk / ann_brute_force.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sign_word_col",
    "sign_words",
    "hamming_topk",
    "hamming_topk_oracle_sql",
]

WORD_BITS = 32


def sign_word_col(emb: Column, word: int) -> Column:
    """int64 word ``word`` of the sign code: bit j set iff
    emb[word*32 + j] > 0.  An unrolled fixed-weight sum — constant-folds
    into one codegen expression, no UDF, no shuffle."""
    terms = None
    for j in range(WORD_BITS):
        idx = word * WORD_BITS + j + 1  # element_at is 1-based
        t = F.when(F.element_at(emb, idx) > F.lit(0.0), F.lit(1 << j)) \
             .otherwise(F.lit(0))
        terms = t if terms is None else terms + t
    return terms.cast("long")


def sign_words(df: DataFrame, dim: int, emb_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """(id, word_0..word_{n-1}) sign-quantized codes; dim must be a
    multiple of 32 (the input_hint corpus is 64)."""
    if dim % WORD_BITS != 0:
        raise ValueError(f"dim {dim} not a multiple of {WORD_BITS}")
    n_words = dim // WORD_BITS
    emb = F.col(emb_col)
    return df.select(
        F.col(id_col),
        *[
            sign_word_col(emb, w).alias(f"word_{w}")
            for w in range(n_words)
        ],
    )


def hamming_topk(df: DataFrame, query: list[float], dim: int, k: int,
                 emb_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Exact Hamming top-k over sign codes vs an encoded query vector.

    Output: (vec_id, hamming), ascending distance, ties on vec_id —
    fully deterministic, so the oracle's ORDER BY ... LIMIT matches.
    """
    if len(query) != dim:
        raise ValueError(f"query dim {len(query)} != {dim}")
    n_words = dim // WORD_BITS
    qwords = []
    for w in range(n_words):
        word = 0
        for j in range(WORD_BITS):
            if query[w * WORD_BITS + j] > 0.0:
                word |= 1 << j
        qwords.append(word)
    codes = sign_words(df, dim, emb_col=emb_col, id_col=id_col)
    dist = None
    for w, qw in enumerate(qwords):
        t = F.bit_count(F.col(f"word_{w}").bitwiseXOR(F.lit(qw)))
        dist = t if dist is None else dist + t
    return (
        codes.select(F.col(id_col), dist.cast("long").alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(int(k))
    )


def hamming_topk_oracle_sql(table: str, dim: int, k: int,
                            query_pred: str = "vec_id = 0") -> str:
    """DuckDB replica: encode every vector AND the query row with the
    same fixed-weight sum, then exact Hamming ORDER BY ... LIMIT.  The
    query row ranks itself at distance 0, same as the Spark side."""
    n_words = dim // WORD_BITS
    word_exprs = ",\n         ".join(
        "list_sum(list_transform(range(0, {wb}), ba_j -> CASE WHEN "
        "embedding[{off} + ba_j + 1] > 0 THEN (1::BIGINT << ba_j) "
        "ELSE 0 END)) AS word_{w}".format(
            wb=WORD_BITS, off=w * WORD_BITS, w=w
        )
        for w in range(n_words)
    )
    dist = " + ".join(
        f"bit_count(xor(c.word_{w}, q.word_{w}))" for w in range(n_words)
    )
    return f"""
WITH ba_codes AS (
  SELECT vec_id,
         {word_exprs}
  FROM {table}
),
ba_query AS (
  SELECT * FROM ba_codes WHERE {query_pred}
)
SELECT c.vec_id, CAST({dist} AS BIGINT) AS hamming
FROM ba_codes c, ba_query q
ORDER BY hamming ASC, c.vec_id ASC
LIMIT {int(k)}
"""
