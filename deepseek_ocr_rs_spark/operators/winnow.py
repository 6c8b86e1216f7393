"""Winnowing document fingerprints + cross-document passage matching.

Winnowing (Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD 2003, public; the MOSS algorithm) is the
standard passage-level near-duplicate primitive: hash every character
k-gram, slide a window of ``w`` consecutive hashes, and keep the minimum
hash of each window (rightmost occurrence on ties).  The selected set is
a ~``2/(w+1)`` density sample of the k-gram stream with the paper's
guarantee: any shared substring of at least ``w + k - 1`` characters
produces at least one shared fingerprint.  That is the property exact
span dedup (operators/spandedup.py) cannot give at sub-shingle
granularity and MinHash (operators/dedup.py) only gives document-wide.

Exactness discipline (the repo contract): the k-gram hash is the repo's
md5 family reduced to 39 bits, and the window's
min-with-rightmost-tie-break is ONE integer comparison — the hash and the
position are packed into a single int64

    key = h39 * 2^24 + (2^24 - 1 - pos)

so ``min(key)`` over the window picks the smallest hash and, among equal
hashes, the LARGEST position (the paper's rightmost rule).  h39 < 2^39
keeps the key under 2^63 — exact on both engines.  Documents are
fingerprinted up to k-gram position 2^24 - 1 (~16 MB of text); the tail
past the cap is excluded identically on both engines.

Design for 100 TB:
* fingerprint selection is per-document work: one explode (k-gram
  stream), one forward-frame window partitioned BY DOCUMENT — the only
  shuffle is the hash exchange on doc_id, and the set leaving the stage
  is ~2/(w+1) of the gram stream (the paper's point: winnow BEFORE any
  cross-document traffic);
* cross-document matching groups the winnowed set by fingerprint hash —
  a bucket join exactly like the LSH band join, never all-pairs — with a
  ``max_df`` stop-fingerprint cap (boilerplate k-grams shared by
  thousands of documents are dropped, the posting-list discipline) so no
  single hash bucket can go quadratic;
* everything is JVM expressions: no Python anywhere.

Reference analog: content-hash discipline over extracted text
(crates/assets content addressing; benchsuite golden-fixture equality) —
winnowing is the same idea made local so PARTIAL copies are findable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = 15          # 60-bit md5 prefix: fits signed int64
_H_BITS = 39              # packed key = h * 2^24 + pos' stays < 2^63
_POS_BITS = 24            # max fingerprintable k-gram position
_H_MOD = 1 << _H_BITS
_POS_MOD = 1 << _POS_BITS


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
) -> DataFrame:
    """(id, fp_pos, fp_hash): the distinct winnowed fingerprint set.

    ``fp_pos`` is the 1-based character position of the selected k-gram,
    ``fp_hash`` its 39-bit hash.  Only FULL windows select (a document
    with fewer than ``w`` k-grams — shorter than ``w + k - 1`` chars —
    yields no fingerprints, matching the paper's guarantee threshold).
    NULL text yields no fingerprints.  K-grams past position 2^24 - 1
    are not fingerprinted (identically on both engines).  Deterministic
    under any partitioning; ties pick the rightmost minimal hash (the
    paper's rule)."""
    # r06 kernel: the old JVM shape exploded one row per k-gram with an
    # INTERPRETED per-element md5 transform (higher-order lambdas never
    # codegen) and ran two windows over the gram table — ~10 us core
    # time per gram.  The identical selection now runs in ONE Arrow pass
    # per doc batch (guide §4.2): a per-batch gram -> hash memo (the
    # synthetic and web corpora repeat grams heavily) bounds the md5
    # count by DISTINCT grams, the window minimum is a numpy
    # sliding_window_view reduction, and the per-doc distinct set is an
    # np.unique — zero shuffles, no gram table ever materialized.
    # Bit-exactness: hashlib.md5 over the UTF-8 bytes of the k-char
    # substring == JVM md5(substring(...)); the packed-key arithmetic is
    # copied verbatim (pinned against the old JVM shape in
    # tests/test_winnow.py).
    import hashlib

    import numpy as np
    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    id_type = dict(df.dtypes)[id_col]

    def fingerprint(batches):
        for pdf in batches:
            memo: dict = {}
            ids, poss, hashes = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                t = (text or "").lower()
                n = len(t) - (k - 1)
                if n < 1:
                    continue
                n = min(n, _POS_MOD - 1)  # the pos < _POS_MOD guard
                if n < w:
                    continue  # no full w-gram window exists
                hs = np.empty(n, dtype=np.int64)
                for i in range(n):
                    g = t[i:i + k]
                    h = memo.get(g)
                    if h is None:
                        h = int(
                            hashlib.md5(g.encode("utf-8"))
                            .hexdigest()[:_HEX_DIGITS], 16
                        ) % _H_MOD
                        memo[g] = h
                    hs[i] = h
                pos = np.arange(1, n + 1, dtype=np.int64)
                key = hs * _POS_MOD + (_POS_MOD - 1 - pos)
                sel = np.unique(
                    np.lib.stride_tricks.sliding_window_view(key, w)
                    .min(axis=1)
                )
                ids.extend([did] * len(sel))
                poss.append(_POS_MOD - 1 - (sel % _POS_MOD))
                hashes.append(sel // _POS_MOD)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "fp_pos": (
                        np.concatenate(poss).astype(np.int32)
                        if poss else np.array([], dtype=np.int32)
                    ),
                    "fp_hash": (
                        np.concatenate(hashes)
                        if hashes else np.array([], dtype=np.int64)
                    ),
                }
            )

    return rebalance_for_arrow(df.select(id_col, text_col)).mapInPandas(
        fingerprint,
        schema=f"{id_col} {id_type}, fp_pos int, fp_hash long",
    )


def winnow_fingerprints_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
) -> str:
    """DuckDB SQL replicating ``winnow_fingerprints`` bit-for-bit (same
    hash reduction, same packed-key rightmost-tie-break, same full-window
    rule, same short-document and position-cap exclusions)."""
    return f"""
        WITH g AS (
          SELECT {id_col},
                 CAST(i AS INTEGER) AS pos,
                 CAST(CAST('0x' || substr(md5(substr(lower({text_col}),
                      CAST(i AS INTEGER), {k})), 1, {_HEX_DIGITS}) AS BIGINT)
                      % {_H_MOD} AS BIGINT) AS h
          FROM {table},
               UNNEST(range(1, length(lower({text_col})) - {k - 1} + 1))
                 AS u(i)
          WHERE length(lower({text_col})) >= {k}
            AND CAST(i AS INTEGER) < {_POS_MOD}
        ),
        keyed AS (
          SELECT {id_col}, pos,
                 min(h * {_POS_MOD} + ({_POS_MOD - 1} - pos)) OVER (
                   PARTITION BY {id_col} ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS sel,
                 max(pos) OVER (PARTITION BY {id_col}) AS n
          FROM g
        )
        SELECT DISTINCT {id_col},
               CAST({_POS_MOD - 1} - (sel % {_POS_MOD}) AS INTEGER) AS fp_pos,
               CAST(sel // {_POS_MOD} AS BIGINT) AS fp_hash
        FROM keyed
        WHERE pos + {w - 1} <= n
    """


def winnow_matches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
    max_df: int = 64,
) -> DataFrame:
    """(doc_a, doc_b, n_shared): ordered document pairs sharing at least
    ``min_shared`` distinct winnowed fingerprint hashes — the MOSS-style
    partial-copy report.

    Fingerprint hashes present in more than ``max_df`` distinct documents
    are dropped before pairing (stop-fingerprints: boilerplate k-grams
    would otherwise make one hash bucket quadratic — the posting-list /
    LSH bucket-cap discipline).  The join is hash-bucketed, never
    all-pairs."""
    fp = (
        winnow_fingerprints(df, id_col, text_col, k=k, w=w)
        .select(F.col(id_col).alias("_id"), "fp_hash")
        .distinct()
        # the fingerprint set forks three ways (df-count aggregate, pair
        # probe a, pair probe b): without persisting, Spark re-runs the
        # whole explode+window selection per branch (the with_minhash
        # auto-persist lesson, operators/dedup.py:370)
        .persist()
    )
    rare = (
        fp.groupBy("fp_hash")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") <= max_df)
        .select("fp_hash")
    )
    fp = fp.join(rare, "fp_hash")
    a = fp.select(F.col("_id").alias("doc_a"), "fp_hash")
    b = fp.select(F.col("_id").alias("doc_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def winnow_matches_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
    max_df: int = 64,
) -> str:
    """DuckDB SQL replicating ``winnow_matches`` exactly."""
    fps = winnow_fingerprints_oracle_sql(table, id_col, text_col, k=k, w=w)
    return f"""
        WITH fps AS ({fps}),
        fp AS (SELECT DISTINCT {id_col} AS id, fp_hash FROM fps),
        rare AS (
          SELECT fp_hash FROM fp GROUP BY fp_hash
          HAVING count(*) <= {max_df}
        ),
        kept AS (SELECT fp.* FROM fp JOIN rare USING (fp_hash))
        SELECT a.id AS doc_a, b.id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM kept a JOIN kept b USING (fp_hash)
        WHERE a.id < b.id
        GROUP BY 1, 2
        HAVING count(*) >= {min_shared}
    """
