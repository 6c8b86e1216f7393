"""Deduplication operators for a large-scale training-data pipeline.

Four tiers, each with a different cost/recall point at 100 TB:

  exact_dedup        md5(text) groupBy — one shuffle on a 16-byte key.
  minhash_lsh_pairs  shingle -> minhash (k permutations) -> band buckets ->
                     self-join within bucket -> signature-estimate verify.
                     The self-join shuffles only (id, band_idx, band_hash)
                     keys — the k-long signature arrays never ride the
                     candidate shuffle (they are joined back onto the tiny
                     candidate pair set afterwards).
  simhash_candidates 64-bit simhash; near-dup candidates = equal 16-bit
                     bands (hamming<=k search by band equality).
  ngram_jaccard      exact n-gram Jaccard for a candidate pair set (the
                     verify stage; never run corpus² at scale).

Mega-bucket skew (the 100 TB scale-killer: millions of identical boilerplate
docs collapsing into one LSH bucket -> a quadratic within-bucket join in one
task) is defused by ``bucket_cap``: buckets over the cap skip the pairwise
join and instead emit a LINEAR star of (keeper, other) pairs per identical
signature group — which is what a mega-bucket is made of.

Hash-family design (determinism + oracle parity): every hash is exact
integer arithmetic mod the Mersenne prime P31 = 2^31 - 1:

  word hash      Horner polynomial over unicode CODEPOINTS, base 131
  shingle id     Horner over the n word hashes, base 1000003
  minhash perm   (a_k * x + b_k) mod P31     (universal family, fixed seed)
  simhash bit j  sign( sum over shingles of +-1[ (c_j*x+d_j) mod P31 > P31/2 ] )

All products stay under 2^62, so the family evaluates EXACTLY in uint64
numpy (one vectorized pass per Arrow batch, no per-shingle Python — see
``_batch_word_hashes``), in int64 JVM arithmetic, and in DuckDB BIGINT SQL —
the ``minhash_oracle_sql`` / ``simhash_oracle_sql`` generators below emit a
pure-SQL replica used as the driver's correctness oracle.  No Python
``hash()`` (salted per process) anywhere.

Reference seat: the reference engine dedups nothing (single-request OCR);
these operators are the training-data-pipeline companions mandated by the
build brief, designed Spark-first.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Tuple

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


# ------------------------------------------------------- the hash family

P31 = 2147483647                  # 2^31 - 1 (Mersenne)
_HALF = P31 // 2                  # simhash sign threshold
WORD_BASE = 131                   # word-hash Horner base (over codepoints)
SHINGLE_BASE = 1000003            # shingle-id Horner base (over word hashes)
# whitespace class shared with the SQL oracle (explicit, NOT \s, so python
# and RE2 agree): space, \t, \n, \r, \f, \v
_WS_CODEPOINTS = (32, 9, 10, 13, 12, 11)
WS_CLASS_SQL = "[ \\t\\n\\r\\f" + chr(11) + "]"
# same class for Spark's Java-regex functions
WS_CLASS_JAVA = "[ \\t\\n\\r\\f\\x0B]"


def _drop_wordless(df: DataFrame, text_col: str) -> DataFrame:
    """Exclude docs with no words: a wordless doc has the all-zero
    signature, so two of them would otherwise 'near-dup match' vacuously.
    The SQL oracle applies the identical predicate."""
    return df.where(
        F.regexp_replace(F.col(text_col), WS_CLASS_JAVA + "+", "") != ""
    )


@lru_cache(maxsize=8)
def _affine_params(k: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """k fixed-seed (a, b) pairs for the (a*x+b) mod P31 universal family."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, P31, size=k, dtype=np.uint64)
    b = rng.integers(0, P31, size=k, dtype=np.uint64)
    return a, b


_MINHASH_SEED = 0xD5EE
_SIMHASH_SEED = 0x51A5

_powers = np.array([1], dtype=np.uint64)  # WORD_BASE^i mod P31, grown on use


def _grow_powers(n: int) -> np.ndarray:
    global _powers
    if _powers.size <= n:
        ext = np.empty(n + 1, dtype=np.uint64)
        ext[: _powers.size] = _powers
        for i in range(_powers.size, n + 1):
            ext[i] = (ext[i - 1] * np.uint64(WORD_BASE)) % np.uint64(P31)
        _powers = ext
    return _powers


def _batch_word_hashes(texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized word hashing for a whole Arrow batch of documents.

    ONE utf-32 encode of the joined batch, then pure-numpy word boundary
    detection and a segmented polynomial reduction — zero per-word (let
    alone per-shingle) Python.  Returns (word_hashes mod P31: uint64[W],
    doc_index: int64[W]) with words in document order.
    """
    lowered = [(t or "").lower() for t in texts]
    joined = "\n".join(lowered)
    if not joined:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32
                        ).astype(np.uint64)
    ws = np.isin(cps, np.array(_WS_CODEPOINTS, dtype=np.uint64))
    inw = ~ws
    if not inw.any():
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    prev = np.empty_like(inw)
    prev[0] = False
    prev[1:] = inw[:-1]
    starts = np.flatnonzero(inw & ~prev)
    nxt = np.empty_like(inw)
    nxt[-1] = False
    nxt[:-1] = inw[1:]
    ends = np.flatnonzero(inw & ~nxt) + 1
    lens = (ends - starts).astype(np.int64)

    # doc index per word: cumulative char extents (each doc + 1 sep char)
    doc_ends = np.cumsum(np.fromiter((len(t) + 1 for t in lowered),
                                     dtype=np.int64, count=len(lowered)))
    wdoc = np.searchsorted(doc_ends, starts, side="right")

    # segmented Horner: hash(word) = sum cp_i * BASE^(L-1-i) mod P31
    wchars = cps[inw]
    word_start_off = np.cumsum(lens) - lens
    off = np.arange(wchars.size, dtype=np.int64) - np.repeat(word_start_off, lens)
    exp = np.repeat(lens, lens) - 1 - off
    pw = _grow_powers(int(lens.max()))
    terms = (wchars * pw[exp]) % np.uint64(P31)       # each < 2^31
    bounds = np.concatenate(([0], np.cumsum(lens)[:-1]))
    wh = np.add.reduceat(terms, bounds) % np.uint64(P31)
    return wh, wdoc


def _batch_shingles(texts: List[str], n: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Distinct shingle ids per doc for a batch.

    Returns (shingle_ids uint64[S], doc_index int64[S]) sorted by
    (doc, shingle).  Docs with 0 < words < n contribute ONE shingle (the
    Horner over all their words); wordless docs contribute none.
    """
    wh, wdoc = _batch_word_hashes(texts)
    C = np.uint64(SHINGLE_BASE)
    P = np.uint64(P31)
    outs = []
    outd = []
    if wh.size >= n:
        m = wh.size - n + 1
        valid = wdoc[:m] == wdoc[n - 1:]
        x = wh[:m].copy()
        for j in range(1, n):
            x = ((x * C) % P + wh[j:m + j]) % P
        outs.append(x[valid])
        outd.append(wdoc[:m][valid])
    # short docs: one shingle over all (< n) words, vectorized per length
    nw = np.bincount(wdoc, minlength=len(texts)) if wh.size else \
        np.zeros(len(texts), dtype=np.int64)
    ws_off = np.concatenate(([0], np.cumsum(nw)))
    for L in range(1, n):
        ds = np.flatnonzero(nw == L)
        if ds.size:
            x = wh[ws_off[ds]].copy()
            for j in range(1, L):
                x = ((x * C) % P + wh[ws_off[ds] + j]) % P
            outs.append(x)
            outd.append(ds.astype(np.int64))
    if not outs:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    sh = np.concatenate(outs)
    sd = np.concatenate(outd)
    # distinct per doc: pack (doc, shingle) into one uint64 key and unique it
    key = (sd.astype(np.uint64) << np.uint64(32)) | sh
    key = np.unique(key)
    return key & np.uint64(0xFFFFFFFF), (key >> np.uint64(32)).astype(np.int64)


def minhash_batch(texts: List[str], k: int = 64, shingle_n: int = 3
                  ) -> np.ndarray:
    """[n_docs, k] int64 minhash signatures; wordless docs -> all zeros."""
    sh, sd = _batch_shingles(texts, shingle_n)
    out = np.zeros((len(texts), k), dtype=np.int64)
    if sh.size == 0:
        return out
    a, b = _affine_params(k, _MINHASH_SEED)
    counts = np.bincount(sd, minlength=len(texts))
    present = np.flatnonzero(counts)
    bounds = np.concatenate(([0], np.cumsum(counts[present])[:-1]))
    P = np.uint64(P31)
    for k0 in range(0, k, 16):   # chunk perms to bound peak memory
        k1 = min(k0 + 16, k)
        vals = (sh[None, :] * a[k0:k1, None] + b[k0:k1, None]) % P
        mins = np.minimum.reduceat(vals, bounds, axis=1)
        out[present, k0:k1] = mins.T.astype(np.int64)
    return out


def simhash_batch(texts: List[str], shingle_n: int = 2) -> np.ndarray:
    """int64[n_docs] simhash values.  Bit j of doc = sign of the sum over
    the doc's shingle set of +-1[ h_j(shingle) > P31/2 ] for 64 independent
    universal hashes h_j — a codepoint-exact, SQL-replicable simhash."""
    sh, sd = _batch_shingles(texts, shingle_n)
    out = np.zeros(len(texts), dtype=np.int64)
    if sh.size == 0:
        return out
    c, d = _affine_params(64, _SIMHASH_SEED)
    counts = np.bincount(sd, minlength=len(texts))
    present = np.flatnonzero(counts)
    bounds = np.concatenate(([0], np.cumsum(counts[present])[:-1]))
    P = np.uint64(P31)
    acc = np.zeros((64, present.size), dtype=np.int64)
    for k0 in range(0, 64, 16):
        vals = (sh[None, :] * c[k0:k0 + 16, None] + d[k0:k0 + 16, None]) % P
        signs = np.where(vals > np.uint64(_HALF), 1, -1).astype(np.int64)
        acc[k0:k0 + 16] = np.add.reduceat(signs, bounds, axis=1)
    bits = (acc > 0).astype(np.uint64)
    v = np.zeros(present.size, dtype=np.uint64)
    for j in range(64):
        v |= bits[j] << np.uint64(j)
    out[present] = v.astype(np.int64)
    return out


def minhash_signature(text: str, k: int = 64, shingle_n: int = 3) -> List[int]:
    """Single-doc convenience wrapper over the batch kernel."""
    return [int(x) for x in minhash_batch([text], k, shingle_n)[0]]


def simhash64(text: str, shingle_n: int = 2) -> int:
    """Single-doc convenience wrapper over the batch kernel."""
    return int(simhash_batch([text], shingle_n)[0])


def with_minhash(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 64,
                 shingle_n: int = 3) -> DataFrame:
    """Signature table builder.  Wordless/whitespace-only docs are DROPPED
    here (not just on the ``sigs=None`` path of ``minhash_lsh_pairs``): they
    would carry the all-zero signature, collide in every band, and emit
    vacuous est_jaccard=1.0 pairs from a quadratic mega-bucket.  Persisted
    signature tables therefore never contain wordless docs."""

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(batch: pd.Series) -> pd.Series:
        mat = minhash_batch(batch.tolist(), k, shingle_n)
        return pd.Series(list(mat))

    return _drop_wordless(df, text_col).select(
        F.col(id_col), _sig(F.col(text_col)).alias("minhash")
    )


def with_simhash(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", shingle_n: int = 2) -> DataFrame:
    """Simhash builder; drops wordless docs for the same reason as
    ``with_minhash`` (simhash 0 would band-collide vacuously)."""

    @F.pandas_udf(LongType())
    def _sh(batch: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(batch.tolist(), shingle_n))

    return _drop_wordless(df, text_col).select(
        F.col(id_col), _sh(F.col(text_col)).alias("simhash")
    )


# ---------------------------------------------------------------- minhash

def _capped_band_join(banded: DataFrame, id_col: str,
                      bucket_cap: Optional[int]
                      ) -> Tuple[DataFrame, Optional[DataFrame]]:
    """Self-join banded rows within (band_idx, band_hash) buckets.

    Returns (pair candidates, over-cap bucket members or None).  The window
    count and the self-join share the same partitioning key, so the size
    filter adds no extra exchange."""
    if bucket_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_hash")
        sized = banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
        in_cap = sized.where(F.col("_bsz") <= bucket_cap).drop("_bsz")
        over = sized.where(F.col("_bsz") > bucket_cap).drop("_bsz")
    else:
        in_cap, over = banded, None
    l, r = in_cap.alias("l"), in_cap.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand, over


DEFAULT_BUCKET_CAP = 10_000


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 64, bands: int = 16,
                      threshold: float = 0.5, shingle_n: int = 3,
                      bucket_cap: Optional[int] = DEFAULT_BUCKET_CAP,
                      sigs: Optional[DataFrame] = None) -> DataFrame:
    """Near-duplicate pairs via banded LSH + signature-estimate verify.

    Plan shape at scale: signatures are computed map-side ONCE (the
    ``sigs=None`` path auto-persists them so the self-join branches and the
    estimate join all read the cached table instead of re-running the Arrow
    stage three times); posexplode into ``bands`` rows/doc carrying only
    (id, band_idx, band_hash) — the shuffle payload is 3 scalars/row, never
    the k-long signature; the within-bucket self-join emits only colliding
    (id_a, id_b) pairs; the signatures are joined back onto that (tiny)
    pair set for the estimate.

    ``bucket_cap`` (DEFAULT ON, 10k): buckets larger than the cap
    (identical-boilerplate mega-buckets — the 100 TB scale-killer) skip the
    quadratic join; their members are grouped by FULL signature and emitted
    as linear (keeper, other) pairs with est_jaccard 1.0 — exactly the
    exact-duplicate representation.  Pass ``bucket_cap=None`` to opt OUT
    (exhaustive pairs inside mega-buckets; only safe on bounded corpora).
    The cap changes output only when a bucket exceeds it, in which case
    non-identical cross-signature pairs inside that bucket are dropped — a
    documented recall tradeoff, never a correctness one.

    ``sigs``: a persisted ``with_minhash`` output (the dedup analog of
    ``build_lsh_index``).  Zero signatures are filtered defensively here
    regardless of provenance, so a stale signature table built before
    ``with_minhash`` dropped wordless docs still cannot emit vacuous pairs.
    """
    rows_per_band = k // bands
    if sigs is None:
        # auto-persist: without it Spark recomputes the Arrow signature
        # stage on each self-join branch plus the estimate join (3x).  The
        # first action materializes the cache; callers running repeated
        # dedup over one corpus should still persist with_minhash output
        # themselves and pass sigs=.
        sigs = with_minhash(df, id_col, text_col, k, shingle_n).persist()
    # all-zero signature = wordless doc (see with_minhash) — never a
    # legitimate near-dup participant, whatever table it came from
    sigs = sigs.where(F.exists("minhash", lambda x: x != 0))

    banded = sigs.select(
        F.col(id_col),
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
        "band_idx",
        F.xxhash64(F.col("band_idx"), F.col("band_sig")).alias("band_hash"),
    )

    cand, over = _capped_band_join(banded, id_col, bucket_cap)

    sig_a = sigs.select(F.col(id_col).alias("id_a"),
                        F.col("minhash").alias("mh_a"))
    sig_b = sigs.select(F.col(id_col).alias("id_b"),
                        F.col("minhash").alias("mh_b"))
    est = (
        cand.join(sig_a, "id_a").join(sig_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("mh_a", "mh_b", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                ).cast("double")
                / F.lit(float(k)),
                6,
            ).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
    )

    if over is not None:
        # mega-bucket path: linear star per identical full signature
        grp = (
            over.select(id_col).distinct()
            .join(sigs, id_col)
            .withColumn("_sig_key", F.md5(F.to_json(F.struct("minhash"))))
        )
        from pyspark.sql import Window

        w = Window.partitionBy("_sig_key")
        keeper = grp.withColumn("_keep", F.min(id_col).over(w))
        star = (
            keeper.where(F.col(id_col) != F.col("_keep"))
            .select(
                F.col("_keep").alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.lit(1.0).alias("est_jaccard"),
            )
        )
        est = est.unionByName(star).dropDuplicates(["id_a", "id_b"])
    return est


# ---------------------------------------------------------------- simhash

def simhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", shingle_n: int = 2,
                       bucket_cap: Optional[int] = DEFAULT_BUCKET_CAP,
                       sigs: Optional[DataFrame] = None) -> DataFrame:
    """Candidate near-dup pairs: any equal 16-bit band of the simhash
    (guarantees recall for hamming distance <= 3).  The simhash itself (one
    int64) rides the band shuffle so hamming needs no second join.

    ``bucket_cap`` (DEFAULT ON, 10k): same mega-bucket defense as
    ``minhash_lsh_pairs`` — over-cap band buckets skip the quadratic join
    and instead emit a LINEAR (keeper, other) star per identical FULL
    simhash (hamming 0, which is what a mega-bucket is made of).  Cross
    pairs between distinct simhashes inside an over-cap bucket are dropped
    (documented recall tradeoff).  ``bucket_cap=None`` opts out.

    ``sigs``: a persisted ``with_simhash`` output; the ``sigs=None`` path
    auto-persists (same rationale as ``minhash_lsh_pairs`` — without it
    the Arrow simhash stage re-runs on both self-join branches and the
    over-cap star path).  Zero simhashes (wordless docs) are filtered
    defensively regardless of provenance."""
    if sigs is None:
        sigs = with_simhash(df, id_col, text_col, shingle_n).persist()
    sh = sigs.where(F.col("simhash") != 0)
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
                        .alias("band_hash"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band"),
    ).select(F.col(id_col), "simhash", "band.band_idx", "band.band_hash")

    over = None
    if bucket_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_hash")
        sized = banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
        over = sized.where(F.col("_bsz") > bucket_cap).drop("_bsz")
        banded = sized.where(F.col("_bsz") <= bucket_cap).drop("_bsz")
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
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
    if over is not None:
        # mega-bucket path: linear star per identical full simhash — the
        # groupBy key is the int64 simhash itself, so the star shuffle is
        # one scalar/row and each signature group reduces map-side first
        from pyspark.sql import Window

        w = Window.partitionBy("simhash")
        star = (
            over.select(id_col, "simhash").distinct()
            .withColumn("_keep", F.min(id_col).over(w))
            .where(F.col(id_col) != F.col("_keep"))
            .select(
                F.col("_keep").alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.lit(0).cast("int").alias("hamming"),
            )
        )
        cand = cand.unionByName(star).dropDuplicates(["id_a", "id_b"])
    return cand


# ----------------------------------------------------------- exact jaccard

def _shingle_set(text: str, n: int = 3) -> set:
    sh, _ = _batch_shingles([text], n)
    return set(int(x) for x in sh)


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact shingle-set Jaccard for a PAIR (the verify stage; never run
    corpus-squared at scale)."""
    sa, sb = _shingle_set(a, n), _shingle_set(b, n)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_ngram_jaccard(pairs: DataFrame, docs: DataFrame,
                               id_col: str = "doc_id",
                               text_col: str = "text", shingle_n: int = 3,
                               min_jaccard: float = 0.0) -> DataFrame:
    """Distributed verify stage: exact shingle-set Jaccard for a CANDIDATE
    pair set (id_a, id_b).

    Plan shape at scale: the two equi-joins pull each side's text onto the
    pair set — the pair set is tiny relative to the corpus (it came out of
    LSH), so these are the cheap joins; the shingle hashing reuses the
    vectorized ``_batch_shingles`` kernel per Arrow batch.  This is the
    verify tier that must NEVER run corpus-squared — feed it LSH/simhash
    candidates only."""
    from pyspark.sql.types import DoubleType

    da = docs.select(F.col(id_col).alias("id_a"),
                     F.col(text_col).alias("_text_a"))
    db = docs.select(F.col(id_col).alias("id_b"),
                     F.col(text_col).alias("_text_b"))
    joined = pairs.select("id_a", "id_b").join(da, "id_a").join(db, "id_b")

    @F.pandas_udf(DoubleType())
    def _jac(a: pd.Series, b: pd.Series) -> pd.Series:
        m = len(a)
        sh, sd = _batch_shingles(list(a) + list(b), shingle_n)
        sets = [set() for _ in range(2 * m)]
        for s, d in zip(sh.tolist(), sd.tolist()):
            sets[d].add(s)
        out = []
        for i in range(m):
            sa, sb = sets[i], sets[m + i]
            if not sa and not sb:
                out.append(1.0)
            elif not sa or not sb:
                out.append(0.0)
            else:
                out.append(len(sa & sb) / len(sa | sb))
        return pd.Series(out)

    return (
        joined.select(
            "id_a", "id_b",
            F.round(_jac(F.col("_text_a"), F.col("_text_b")), 6)
            .alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


# ------------------------------------------------- component resolution

def connected_components(pairs: DataFrame, max_iter: int = 25,
                         return_rounds: bool = False):
    """Near-dup CLUSTER resolution: (id_a, id_b) pairs -> (doc_id,
    component_id) where component_id = min doc id in the connected
    component.  This is the step that turns a pair set into an actual
    keep/drop decision (keeper = the doc whose id equals its component).

    Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014 — a public
    algorithm), replacing round-3's min-label propagation whose
    O(diameter) driver-looped rounds were the one flagged scale weakness.
    Each round:

      large-star: group the symmetric edge list by node u; every strictly
        larger neighbor v > u re-attaches to m = min(N(u) ∪ {u});
      small-star: group the large->small directed edges by the large
        endpoint; all its smaller neighbors and u itself attach to the
        minimum.

    Both halves are one groupBy-min + one equi-join on the node id —
    map-side combinable, AQE/skew-join friendly, no vectors or labels
    carried, and the edge set only ever shrinks toward star forests
    centered at component minima.  Convergence is O(log^2 n) rounds even
    on an adversarial path graph (pytest pins a 1,000-node chain), vs
    O(n) for label propagation; LSH star/clique graphs converge in 2-3
    rounds.  ``localCheckpoint`` per round cuts lineage so plans don't
    grow.  Raises RuntimeError after ``max_iter`` non-converged rounds
    rather than silently returning partial components.

    Deterministic: the fixed point (min id per component) is unique, so
    the result is partitioning- and engine-independent — the DuckDB oracle
    (``components_oracle_sql``) computes it with a recursive CTE.

    ``return_rounds=True`` returns (labels_df, n_rounds) for convergence
    tests."""
    # materialize the caller's pair chain ONCE: both the edge list and
    # all_nodes (and through it the final label join) branch from it, so
    # an expensive upstream — e.g. the MinHash+LSH banding that feeds
    # dedup_components — would otherwise execute once per branch
    # (guide §1.2; the pair set is ids-only, so this is a tiny
    # materialization)
    pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
    # directed large -> small, deduplicated; self-loops dropped
    e = (
        pairs.select(
            F.greatest("id_a", "id_b").alias("u"),
            F.least("id_a", "id_b").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    all_nodes = pairs.select(F.col("id_a").alias("id")).unionByName(
        pairs.select(F.col("id_b").alias("id"))
    ).distinct()

    def _stat(edges: DataFrame):
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.hash("u", "v")), F.lit(0)).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = _stat(e)
    rounds = 0
    converged = prev[0] == 0
    while rounds < max_iter and not converged:
        # -- large-star: v > u re-attaches to min(N(u) ∪ {u})
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m_of = sym.groupBy("u").agg(
            F.min("v").alias("mv")
        ).select("u", F.least("mv", F.col("u")).alias("m"))
        e = (
            sym.join(m_of, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star: neighbors of the large endpoint (all < u) and u
        #    itself attach to the minimum neighbor
        m_small = e.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            e.join(m_small, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m_small.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        rounds += 1
        cur = _stat(e)
        converged = cur == prev  # star forest reached: both halves idempotent
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"large-star/small-star rounds (edge stat {prev}); raise "
            f"max_iter — expected O(log^2 n) rounds"
        )
    # converged edge set is a star forest: every non-root points straight
    # at its component minimum; roots (and isolated nodes) label themselves
    non_root = e.groupBy("u").agg(F.min("v").alias("comp"))
    labels = (
        all_nodes.join(non_root, all_nodes["id"] == non_root["u"], "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("comp"), F.col("id")).alias("component_id"),
        )
    )
    if return_rounds:
        return labels, rounds
    return labels


# ------------------------------------------------------------- SQL oracle

def _sql_shingles_cte(table: str, id_col: str, text_col: str,
                      shingle_n: int) -> str:
    """WITH-clause prefix computing each doc's distinct shingle-id list with
    EXACTLY the arithmetic of ``_batch_shingles`` (DuckDB dialect)."""
    ws = WS_CLASS_SQL
    return f"""
        docs AS (
          SELECT {id_col} AS _id, lower({text_col}) AS _t FROM {table}
          WHERE regexp_replace({text_col}, '{ws}+', '', 'g') <> ''
        ), words AS (
          SELECT _id,
                 list_filter(regexp_split_to_array(_t, '{ws}+'),
                             w -> w <> '') AS ws
          FROM docs
        ), wh AS (
          SELECT _id, list_transform(ws, w ->
            list_reduce(
              list_transform(range(1, length(w) + 1),
                             i -> CAST(unicode(substr(w, CAST(i AS INT), 1))
                                       AS BIGINT)),
              (acc, cp) -> (acc * {WORD_BASE} + cp) % {P31})) AS hs
          FROM words
        ), shingles AS (
          SELECT _id, list_distinct(CASE WHEN len(hs) >= {shingle_n}
            THEN list_transform(range(len(hs) - {shingle_n - 1}), i ->
                 list_reduce(hs[CAST(i + 1 AS INT):CAST(i + {shingle_n} AS INT)],
                             (acc, h) -> (acc * {SHINGLE_BASE} + h) % {P31}))
            ELSE [list_reduce(hs,
                              (acc, h) -> (acc * {SHINGLE_BASE} + h) % {P31})]
            END) AS sh
          FROM wh
        )"""


def minhash_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text", k: int = 64, bands: int = 16,
                       threshold: float = 0.5, shingle_n: int = 3) -> str:
    """DuckDB SQL replicating ``minhash_lsh_pairs`` exactly (all-pairs form,
    viable at oracle scale): same shingles, same fixed-seed affine family,
    same banding predicate, same estimate and threshold."""
    a, b = _affine_params(k, _MINHASH_SEED)
    params = ", ".join(f"[{int(x)}, {int(y)}]" for x, y in zip(a, b))
    rpb = k // bands
    return f"""
        WITH {_sql_shingles_cte(table, id_col, text_col, shingle_n)},
        sigs AS (
          SELECT _id, list_transform([{params}], p ->
                 list_min(list_transform(sh, x -> (p[1] * x + p[2]) % {P31}))
                 ) AS mh
          FROM shingles
        ),
        pairs AS (
          SELECT l._id AS id_a, r._id AS id_b, l.mh AS ml, r.mh AS mr
          FROM sigs l JOIN sigs r ON l._id < r._id
        )
        SELECT id_a, id_b,
               round(len(list_filter(range({k}),
                     i -> ml[CAST(i + 1 AS INT)] = mr[CAST(i + 1 AS INT)]))
                     / {float(k)}, 6) AS est_jaccard
        FROM pairs
        WHERE len(list_filter(range({bands}), b ->
                ml[CAST(b * {rpb} + 1 AS INT):CAST(b * {rpb} + {rpb} AS INT)]
                = mr[CAST(b * {rpb} + 1 AS INT):CAST(b * {rpb} + {rpb} AS INT)]
              )) > 0
          AND len(list_filter(range({k}),
                i -> ml[CAST(i + 1 AS INT)] = mr[CAST(i + 1 AS INT)]))
              / {float(k)} >= {threshold}
    """


def components_oracle_sql(pairs_sql: str) -> str:
    """DuckDB SQL replicating ``connected_components`` over the pair set
    produced by ``pairs_sql`` (any SELECT yielding id_a, id_b): symmetric
    closure, transitive reachability via a recursive CTE (UNION dedup
    terminates cycles), min reachable id = component id."""
    return f"""
        WITH RECURSIVE pairset AS (
          SELECT id_a, id_b FROM ({pairs_sql})
        ), edges AS (
          SELECT id_a AS a, id_b AS b FROM pairset
          UNION
          SELECT id_b, id_a FROM pairset
        ), walk(src, node) AS (
          SELECT a, a FROM edges
          UNION
          SELECT w.src, e.b FROM walk w JOIN edges e ON w.node = e.a
        )
        SELECT src AS doc_id, CAST(min(node) AS BIGINT) AS component_id
        FROM walk GROUP BY src
    """


def minhash_verified_oracle_sql(table: str = "documents",
                                id_col: str = "doc_id",
                                text_col: str = "text", k: int = 64,
                                bands: int = 16, threshold: float = 0.5,
                                shingle_n: int = 3,
                                min_jaccard: float = 0.0) -> str:
    """DuckDB SQL replicating ``minhash_lsh_pairs`` -> ``verify_pairs_
    ngram_jaccard`` exactly: the minhash band-candidate + estimate
    predicate, then the exact shingle-set Jaccard (list_intersect /
    union-distinct over the SAME shingle ids) with its threshold."""
    a, b = _affine_params(k, _MINHASH_SEED)
    params = ", ".join(f"[{int(x)}, {int(y)}]" for x, y in zip(a, b))
    rpb = k // bands
    return f"""
        WITH {_sql_shingles_cte(table, id_col, text_col, shingle_n)},
        sigs AS (
          SELECT s._id, s.sh, list_transform([{params}], p ->
                 list_min(list_transform(s.sh, x -> (p[1] * x + p[2]) % {P31}))
                 ) AS mh
          FROM shingles s
        ),
        pairs AS (
          SELECT l._id AS id_a, r._id AS id_b, l.mh AS ml, r.mh AS mr,
                 l.sh AS sa, r.sh AS sb
          FROM sigs l JOIN sigs r ON l._id < r._id
        )
        SELECT id_a, id_b,
               round(len(list_intersect(sa, sb)) * 1.0
                     / len(list_distinct(sa || sb)), 6) AS jaccard
        FROM pairs
        WHERE len(list_filter(range({bands}), b ->
                ml[CAST(b * {rpb} + 1 AS INT):CAST(b * {rpb} + {rpb} AS INT)]
                = mr[CAST(b * {rpb} + 1 AS INT):CAST(b * {rpb} + {rpb} AS INT)]
              )) > 0
          AND len(list_filter(range({k}),
                i -> ml[CAST(i + 1 AS INT)] = mr[CAST(i + 1 AS INT)]))
              / {float(k)} >= {threshold}
          AND round(len(list_intersect(sa, sb)) * 1.0
                    / len(list_distinct(sa || sb)), 6) >= {min_jaccard}
    """


def simhash_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text", shingle_n: int = 2,
                       max_hamming: int = 8) -> str:
    """DuckDB SQL replicating ``simhash_candidates`` (+ hamming filter)
    exactly: 64 sign-hash bits per doc, 4x16-bit band equality as the
    candidate predicate, hamming = differing-bit count."""
    c, d = _affine_params(64, _SIMHASH_SEED)
    params = ", ".join(f"[{int(x)}, {int(y)}]" for x, y in zip(c, d))
    return f"""
        WITH {_sql_shingles_cte(table, id_col, text_col, shingle_n)},
        bits AS (
          SELECT _id, list_transform([{params}], p ->
            CASE WHEN list_sum(list_transform(sh, x ->
                   CASE WHEN (p[1] * x + p[2]) % {P31} > {_HALF}
                        THEN 1 ELSE -1 END)) > 0
                 THEN 1 ELSE 0 END) AS bl
          FROM shingles
        ),
        sims AS (
          SELECT _id, bl, list_transform(range(4), b ->
                 list_reduce(list_transform(range(16), j ->
                     bl[CAST(b * 16 + j + 1 AS INT)]
                     * (CAST(1 AS BIGINT) << CAST(j AS INT))),
                   (x, y) -> x + y)) AS bands
          FROM bits
        )
        SELECT l._id AS id_a, r._id AS id_b,
               CAST(len(list_filter(range(64),
                    j -> l.bl[CAST(j + 1 AS INT)] <> r.bl[CAST(j + 1 AS INT)]))
                    AS INT) AS hamming
        FROM sims l JOIN sims r ON l._id < r._id
        WHERE len(list_filter(range(4), b ->
                l.bands[CAST(b + 1 AS INT)] = r.bands[CAST(b + 1 AS INT)])) > 0
          AND len(list_filter(range(64),
                j -> l.bl[CAST(j + 1 AS INT)] <> r.bl[CAST(j + 1 AS INT)]))
              <= {max_hamming}
    """


# ------------------------------------------------------ exact containment


def containment_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Asymmetric verify tier over a CANDIDATE pair set: exact distinct
    word-``n``-gram containment in both directions,

        (id_a, id_b, n_a, n_b, n_common, cont_a_bp, cont_b_bp)

    with ``cont_a_bp = 10000 * n_common div n_a`` (the fraction of A's
    grams that also occur in B, floor basis points; NULL when a side has
    no grams).  Jaccard resemblance misses the SUBSET relation — a tweet
    quoted inside an article scores near-zero Jaccard but containment
    ~10000 on the tweet side — and Broder's original resemblance/
    containment pair (public, 1997) treats them as co-equal signals.
    Grams are exact STRINGS (the novelty-operator chunker), not hashed
    shingles: no collision term in the verdict, all JVM-side.

    Plan shape at scale: the corpus is semi-join-pruned to the ids the
    pair set references BEFORE gram explosion; the two gram joins key on
    (pair id, gram) — the verify tier must NEVER run corpus-squared, so
    feed it LSH/simhash candidates only (the verify_pairs discipline).
    """
    # r06 kernel: `pairs` (the whole MinHash chain, 1.85 s alone at
    # sf1.0) and the gram table used to be referenced 3x each with no
    # persist — the lineage re-ran every time, and gram construction was
    # the interpreted slice+array_join chain (14.8 s total at sf1.0 for
    # 2,544 candidate pairs).  Persist the tiny pair list once, build
    # per-doc DISTINCT gram sets for the semi-pruned candidate docs in
    # ONE Arrow pass (identical lower/\s+ ASCII tokenization — the
    # novelty chunker contract), persist that too, and keep the join
    # topology; all emitted numbers are exact integers.
    import re

    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    pairs = pairs.select("id_a", "id_b").persist()
    ids = (
        pairs.select(F.col("id_a").alias("_id"))
        .unionByName(pairs.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    ws = re.compile(r"\s+", re.ASCII)
    id_type = dict(docs.dtypes)[id_col]

    def gram_rows(batches):
        for pdf in batches:
            gids, grams_out = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split((text or "").lower()) if t]
                gset = (
                    {" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)}
                    if len(toks) >= n else set()
                )
                gids.extend([did] * len(gset))
                grams_out.extend(gset)
            yield pd.DataFrame({"_gid": gids, "gram": grams_out})

    grams = (
        rebalance_for_arrow(
            docs.join(ids, docs[id_col] == ids["_id"], "left_semi")
            .select(id_col, text_col)
        )
        .mapInPandas(gram_rows, schema=f"_gid {id_type}, gram string")
        .persist()
    )
    counts = grams.groupBy("_gid").agg(F.count(F.lit(1)).alias("_n"))
    common = (
        pairs.select("id_a", "id_b")
        .join(
            grams.select(F.col("_gid").alias("id_a"), "gram"), "id_a"
        )
        .join(
            grams.select(F.col("_gid").alias("id_b"), "gram"),
            ["id_b", "gram"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    bp = "cast((10000 * n_common) div {side} as bigint)"
    return (
        pairs.select("id_a", "id_b")
        .join(
            counts.select(F.col("_gid").alias("id_a"),
                          F.col("_n").alias("n_a")),
            "id_a",
            "left",
        )
        .join(
            counts.select(F.col("_gid").alias("id_b"),
                          F.col("_n").alias("n_b")),
            "id_b",
            "left",
        )
        .join(common, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.expr(
                "cast((10000 * coalesce(n_common, 0)) div n_a as bigint)"
            ).alias("cont_a_bp"),
            F.expr(
                "cast((10000 * coalesce(n_common, 0)) div n_b as bigint)"
            ).alias("cont_b_bp"),
        )
    )


def containment_oracle_sql(
    pairs_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> str:
    """DuckDB SQL replicating ``containment_pairs`` exactly (same string
    grams, same floor-division basis points, NULL on gram-less sides)."""
    return f"""
        WITH ct_pairs AS (
          SELECT id_a, id_b FROM ({pairs_sql})
        ),
        ct_toks AS (
          SELECT {id_col} AS _gid,
                 list_filter(string_split_regex(lower({text_col}), '\\s+'),
                             x -> x <> '') AS toks
          FROM {table}
        ),
        ct_grams AS (
          SELECT DISTINCT _gid,
                 array_to_string(list_slice(toks, i + 1, i + {n}), ' ')
                   AS gram
          FROM ct_toks,
               UNNEST(range(0, greatest(len(toks) - {n} + 1, 0))) AS u(i)
        ),
        ct_n AS (
          SELECT _gid, count(*) AS _n FROM ct_grams GROUP BY _gid
        ),
        ct_common AS (
          SELECT p.id_a, p.id_b, count(*) AS n_common
          FROM ct_pairs p
          JOIN ct_grams a ON a._gid = p.id_a
          JOIN ct_grams b ON b._gid = p.id_b AND b.gram = a.gram
          GROUP BY 1, 2
        )
        SELECT p.id_a, p.id_b,
               CAST(coalesce(na._n, 0) AS BIGINT) AS n_a,
               CAST(coalesce(nb._n, 0) AS BIGINT) AS n_b,
               CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
               CAST(10000 * coalesce(c.n_common, 0) // na._n AS BIGINT)
                 AS cont_a_bp,
               CAST(10000 * coalesce(c.n_common, 0) // nb._n AS BIGINT)
                 AS cont_b_bp
        FROM ct_pairs p
        LEFT JOIN ct_n na ON na._gid = p.id_a
        LEFT JOIN ct_n nb ON nb._gid = p.id_b
        LEFT JOIN ct_common c
          ON c.id_a = p.id_a AND c.id_b = p.id_b
    """
