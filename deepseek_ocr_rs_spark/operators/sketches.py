"""Deterministic sketches: HyperLogLog, Bloom filter, Count-Min.

At 100 TB the curation stack needs sublinear summaries — distinct
counts without a distinct shuffle (HLL), membership without a join
against a billion-row set (Bloom), frequency estimates without a full
groupBy (Count-Min).  Spark ships opaque versions
(``approx_count_distinct``, ``DataFrame.stat.bloomFilter``) whose
internals can't be replicated in a SQL oracle; these implementations
instead build every sketch from the repo's 60-bit md5 hash family
(operators/sampling.py discipline), so the sketch CONTENTS — registers,
bit words, counters — and every estimate derived from them are
bit-identical in DuckDB.  The reference analog is once more the
pure-function-of-explicit-state scoring rule
(crates/core/src/sampling.rs:104-118): an estimate must be a
deterministic function of the data, never of partitioning or RNG.

All three sketches reduce via commutative-monoid aggregations (max /
bit_or / sum), so they are map-side partial-combinable — the shuffle
carries only register/word/counter ids, never the data.

* ``hll_register_table`` / ``hll_estimate``: m = 2^b registers;
  bucket = u mod m, rho = leading-zero count of the remaining 60-b
  bits + 1 computed EXACTLY as ``(60-b) + 1 - length(bin(v))`` —
  integer arithmetic, no log.  The raw Flajolet estimator's
  ``sum(2^-M_j)`` folds in fixed register order (the bm25/tfidf
  discipline) and empty registers contribute 2^0 exactly; the one
  ``pow(2, -M)`` per register is an exact power of two in IEEE.  The
  raw estimator (no HLL++ bias table, no linear-counting branch —
  both are libm/lookup-dependent) is documented as such; accuracy is
  the standard ~1.04/sqrt(m) IN ITS OPERATING REGIME n >= ~2.5*m.
  Size b so the expected cardinality clears that bar (the raw
  estimator overestimates badly below it — that is exactly the range
  linear counting exists for, and ln() is the cross-engine divergence
  class this repo excludes).
* ``bloom_build`` / ``bloom_probe``: k independent 60-bit hashes per
  item -> bit positions in an m-bit filter stored as ceil(m/64)
  int64 words (groupBy word_idx + BIT_OR — tiny result, broadcast to
  probes).  False positives exist by design and are DETERMINISTIC:
  the oracle computes the identical filter and flags the identical
  rows.
* ``cm_counters`` / ``cm_estimate``: d rows x w buckets of exact
  integer counters (groupBy + count); estimate = least over the d
  row counters — pure integer min, bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _u_col

# ------------------------------------------------------------------ HLL

_HLL_BITS_TOTAL = 60  # md5-derived uniform bits per item (sampling.py)


def hll_register_table(
    df: DataFrame, key_col: str, b: int = 10, seed: int = 42
) -> DataFrame:
    """(bucket, rho_max): the HLL register table for the key column.
    m = 2^b registers; missing buckets mean rho_max = 0 (empty)."""
    m = 1 << b
    u = _u_col(F.col(key_col), seed)
    # EXACT u div m as a right shift (m = 2^b): double-divide-then-cast
    # would round near power-of-two boundaries and flip a register's
    # leading-zero count vs the oracle's integer '//'
    v = F.shiftright(u, b)
    rho = F.when(v == 0, F.lit(_HLL_BITS_TOTAL - b + 1)).otherwise(
        F.lit(_HLL_BITS_TOTAL - b + 1) - F.length(F.bin(v))
    )
    return (
        # NULL keys are dropped on BOTH sides: Spark's concat_ws would
        # silently hash just the seed, and the SQL '||' would propagate a
        # NULL register/bit/counter row instead of dropping it
        df.where(F.col(key_col).isNotNull())
        .select((u % m).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(
    df: DataFrame, key_col: str, b: int = 10, seed: int = 42
) -> DataFrame:
    """One row: (hll_estimate, n_registers_used).  Raw Flajolet-et-al
    estimator alpha_m * m^2 / sum(2^-M_j), empty registers counting
    2^0; the register sum folds in bucket order for bit-stability."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_register_table(df, key_col, b, seed)
    s = F.aggregate(
        F.array_sort(F.collect_list(F.struct("bucket", "rho_max"))),
        F.lit(0.0),
        lambda acc, r: acc + F.pow(F.lit(2.0), -r["rho_max"]),
    )
    return regs.agg(
        F.round(
            F.lit(alpha * m * m)
            / (s + (F.lit(m) - F.count("*")).cast("double")),
            4,
        ).alias("hll_estimate"),
        F.count("*").alias("n_registers_used"),
    )


def hll_oracle_sql(
    table: str, key_col: str, b: int = 10, seed: int = 42
) -> str:
    """DuckDB SQL replicating ``hll_estimate`` bit-for-bit."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    rbits = _HLL_BITS_TOTAL - b
    u = (
        f"(CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR) || ':{seed}'),"
        f" 1, 15) AS BIGINT))"
    )
    return f"""
        WITH h AS (
          SELECT {u} % {m} AS bucket, {u} // {m} AS v FROM {table}
          WHERE {key_col} IS NOT NULL
        ),
        regs AS (
          SELECT bucket,
                 max(CASE WHEN v = 0 THEN {rbits + 1}
                          ELSE {rbits + 1} - length(bin(v)) END) AS rho_max
          FROM h GROUP BY bucket
        )
        SELECT round({alpha * m * m!r} /
                 (list_reduce(
                    list_prepend(0.0,
                      list(pow(2.0, -rho_max) ORDER BY bucket)),
                    (acc, x) -> acc + x)
                  + CAST({m} - count(*) AS DOUBLE)), 4) AS hll_estimate,
               count(*) AS n_registers_used
        FROM regs
    """


# ---------------------------------------------------------------- Bloom


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(word_idx, word): the filter's int64 words.  The k bit positions
    per item come from k independent md5 hashes (seed, seed+1, ...);
    result size is ceil(m_bits/64) rows — broadcast-sized."""
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # k md5 digests per item are CPU-bound; spread a single-split local
    # scan (no-op at cluster scale)
    df = rebalance_for_arrow(df.select(key_col))
    hashes = F.explode(
        F.array(*[F.lit(seed + i) for i in range(k)])
    ).alias("hseed")
    bits = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col), hashes
    ).select(
        (F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                                  F.col("hseed").cast("string"))),
                1, 15,
            ), 16, 10,
        ).cast("long") % m_bits).alias("bit")
    )
    return (
        bits.select(
            (F.col("bit") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(bit % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(
    candidates: DataFrame, bloom: DataFrame, key_col: str,
    m_bits: int = 1 << 16, k: int = 4, seed: int = 42,
) -> DataFrame:
    """Rows of ``candidates`` whose key tests positive (all k bits set).
    The filter joins by BROADCAST on word_idx; a candidate row never
    shuffles."""
    hashes = F.explode(
        F.array(*[F.lit(seed + i) for i in range(k)])
    ).alias("hseed")
    # hash DISTINCT keys: a duplicated candidate row would otherwise
    # contribute 2k bit rows and fail the == k membership test — a false
    # NEGATIVE, the one error class a Bloom filter must never commit
    bits = candidates.select(key_col).distinct().where(
        F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"), hashes
    ).select(
        "_k",
        (F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("_k").cast("string"),
                                  F.col("hseed").cast("string"))),
                1, 15,
            ), 16, 10,
        ).cast("long") % m_bits).alias("bit"),
    )
    checked = (
        bits.withColumn("word_idx", (F.col("bit") / 64).cast("long"))
        .withColumn("mask", F.expr("shiftleft(1L, CAST(bit % 64 AS INT))"))
        .join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "hit",
            F.when(
                F.col("word").isNotNull()
                & (F.col("word").bitwiseAND(F.col("mask")) != 0),
                1,
            ).otherwise(0),
        )
        .groupBy("_k")
        .agg(F.sum("hit").alias("n_hits"))
        .where(F.col("n_hits") == k)
        .select(F.col("_k").alias(key_col))
    )
    return candidates.join(F.broadcast(checked), key_col, "left_semi")


def bloom_probe_oracle_sql(
    build_table: str, build_key: str, probe_table: str, probe_key: str,
    probe_select: str, m_bits: int = 1 << 16, k: int = 4, seed: int = 42,
) -> str:
    """DuckDB SQL replicating bloom_build + bloom_probe semantics
    (identical bit positions; the word/mask detour is unnecessary in
    SQL — bit-set membership over identical positions is equivalent)."""
    seeds = ", ".join(str(seed + i) for i in range(k))

    def bit(key):
        return (
            f"(CAST('0x' || substr(md5(CAST({key} AS VARCHAR) || ':' ||"
            f" CAST(s.s AS VARCHAR)), 1, 15) AS BIGINT) % {m_bits})"
        )

    return f"""
        WITH seeds AS (SELECT unnest([{seeds}]) AS s),
        filter_bits AS (
          SELECT DISTINCT {bit(f"b.{build_key}")} AS bit
          FROM {build_table} b CROSS JOIN seeds s
          WHERE b.{build_key} IS NOT NULL
        ),
        probe_keys AS (
          SELECT DISTINCT {probe_key} AS k_ FROM {probe_table} p
          WHERE {probe_key} IS NOT NULL
        ),
        probe_bits AS (
          SELECT p.k_, {bit("p.k_")} AS bit
          FROM probe_keys p CROSS JOIN seeds s
        ),
        hits AS (
          SELECT pb.k_, count(*) AS n_hits
          FROM probe_bits pb JOIN filter_bits fb USING (bit)
          GROUP BY pb.k_ HAVING count(*) = {k}
        )
        SELECT {probe_select}
        FROM {probe_table} p JOIN hits h ON p.{probe_key} = h.k_
    """


# ------------------------------------------------------------- Count-Min


def cm_counters(
    df: DataFrame, key_col: str, d: int = 4, w: int = 256, seed: int = 42
) -> DataFrame:
    """(row, bucket, cnt): the d x w exact-integer counter matrix."""
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # d x rows md5 digests are CPU-bound; spread a single-split local
    # scan over the session's cores (no-op at cluster scale)
    df = rebalance_for_arrow(df.select(key_col))
    rows = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row")
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("_k"), rows)
        .select(
            "row",
            (F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("_k").cast("string"),
                                      (F.col("row") + seed).cast("string"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % w).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_estimate(
    df: DataFrame, keys: DataFrame, key_col: str,
    d: int = 4, w: int = 256, seed: int = 42,
) -> DataFrame:
    """(key, est): Count-Min frequency estimate (min over the d row
    counters) for each row of ``keys``.  Counters attach by broadcast;
    overestimation from collisions is deterministic."""
    counters = cm_counters(df, key_col, d, w, seed)
    rows = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row")
    probe = keys.where(F.col(key_col).isNotNull()).select(
        F.col(key_col), rows
    ).select(
        key_col,
        "row",
        (F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                                  (F.col("row") + seed).cast("string"))),
                1, 15,
            ), 16, 10,
        ).cast("long") % w).alias("bucket"),
    )
    return (
        probe.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cm_estimate_oracle_sql(
    table: str, key_col: str, keys_sql: str,
    d: int = 4, w: int = 256, seed: int = 42,
) -> str:
    """DuckDB SQL replicating ``cm_estimate`` exactly.  ``keys_sql`` is a
    subquery yielding one column named ``{key_col}``."""
    rows = ", ".join(str(i) for i in range(d))

    def bucket(key):
        return (
            f"(CAST('0x' || substr(md5(CAST({key} AS VARCHAR) || ':' ||"
            f" CAST(r.row_ + {seed} AS VARCHAR)), 1, 15) AS BIGINT) % {w})"
        )

    return f"""
        WITH rows_ AS (SELECT unnest([{rows}]) AS row_),
        counters AS (
          SELECT r.row_, {bucket(f"t.{key_col}")} AS bucket,
                 count(*) AS cnt
          FROM {table} t CROSS JOIN rows_ r
          WHERE t.{key_col} IS NOT NULL
          GROUP BY 1, 2
        ),
        probe AS (
          SELECT q.{key_col}, r.row_, {bucket(f"q.{key_col}")} AS bucket
          FROM ({keys_sql}) q CROSS JOIN rows_ r
          WHERE q.{key_col} IS NOT NULL
        )
        SELECT p.{key_col}, min(coalesce(c.cnt, 0)) AS est
        FROM probe p
        LEFT JOIN counters c ON p.row_ = c.row_ AND p.bucket = c.bucket
        GROUP BY p.{key_col}
    """


# -------------------------------------- Fixed-bin histogram quantiles


def hist_counts(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(bin, cnt): fixed-boundary equi-width histogram of ``value_col``.

    The mergeable-summary quantile sketch that completes the family
    (HLL = distinct, Bloom = membership, Count-Min = frequency,
    histogram = distribution): counts reduce by map-side SUM over at
    most ``n_bins`` keys, so the shuffle is O(n_bins) regardless of
    input size and two histograms merge by adding counters — the
    property t-digest/KLL buy with data-dependent centroids, bought
    here with FIXED bins so every count and every derived quantile is
    bit-identical in DuckDB (data-dependent centroids are fold-order-
    dependent and cannot be oracle'd exactly).  Accuracy is bounded by
    the bin width (hi-lo)/n_bins, stated, not estimated.  Out-of-range
    values clamp to the edge bins; NULLs drop.  Reference analog: the
    fixed-register discipline of crates/core/src/sampling.rs:104-118 —
    a summary must be a deterministic function of the data only.
    """
    width = (hi - lo) / n_bins
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.least(
                F.lit(n_bins - 1), F.greatest(F.lit(0), b)
            ).cast("long").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )


def hist_quantiles(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int,
    qs: list,
) -> DataFrame:
    """(q, est): linear-interpolated quantile estimates from the fixed
    histogram.  The windowed cumulative sum runs over the ≤``n_bins``-row
    counter table — a fixed-size reduction, never the data — so the
    single-partition window is O(n_bins), not O(rows).  est is the
    standard within-bin interpolation lo + width*(bin + frac), rounded
    to 6dp per the repo's cross-engine float contract."""
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    hist = hist_counts(df, value_col, lo, hi, n_bins)
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "bin", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    t = F.ceil(F.col("q") * F.col("total")).cast("long")
    return (
        qdf.crossJoin(F.broadcast(cum))
        .withColumn("t", t)
        .where(
            (F.col("cum") >= F.col("t"))
            & (F.col("cum") - F.col("cnt") < F.col("t"))
        )
        .select(
            "q",
            F.round(
                F.lit(lo)
                + F.lit(width)
                * (
                    F.col("bin")
                    + (F.col("t") - (F.col("cum") - F.col("cnt")))
                    / F.col("cnt")
                ),
                6,
            ).alias("est"),
        )
    )


def hist_quantiles_oracle_sql(
    table: str, value_col: str, lo: float, hi: float, n_bins: int,
    qs: list,
) -> str:
    """DuckDB SQL replicating ``hist_quantiles`` bit-for-bit (identical
    double constants, identical IEEE op order)."""
    width = (hi - lo) / n_bins
    q_list = ", ".join(repr(float(q)) for q in qs)
    return f"""
        WITH hist AS (
          SELECT CAST(least({n_bins - 1}, greatest(0,
                   floor(({value_col} - {lo!r}) / {width!r}))) AS BIGINT)
                   AS bin,
                 count(*) AS cnt
          FROM {table}
          WHERE {value_col} IS NOT NULL
          GROUP BY 1
        ),
        cum AS (
          SELECT bin, cnt,
                 sum(cnt) OVER (ORDER BY bin) AS cum,
                 sum(cnt) OVER () AS total
          FROM hist
        ),
        qs AS (SELECT CAST(unnest([{q_list}]) AS DOUBLE) AS q)
        SELECT q.q,
               round({lo!r} + {width!r} *
                 (c.bin + (CAST(ceiling(q.q * c.total) AS BIGINT)
                           - (c.cum - c.cnt)) / CAST(c.cnt AS DOUBLE)),
                 6) AS est
        FROM qs q JOIN cum c
          ON c.cum >= CAST(ceiling(q.q * c.total) AS BIGINT)
         AND c.cum - c.cnt < CAST(ceiling(q.q * c.total) AS BIGINT)
    """


# ------------------------------------------- windowed / mergeable HLL


def hll_windowed(
    df: DataFrame,
    key_col: str,
    window_col: str,
    b: int = 10,
    seed: int = 42,
    merged_label: str = "ALL",
) -> DataFrame:
    """Per-window HLL estimates PLUS the merged total, computed from the
    SAME register tables — the mergeability property that makes HLL the
    production sketch for "distinct users per day + overall": registers
    max-merge losslessly, so the all-windows row is EXACTLY what a
    direct sketch of the union would produce (pinned by pytest), while
    a count-distinct would need a second full pass.

    Returns ``(win, hll_estimate, n_registers_used)`` with one row
    per distinct window value (cast to string) and one ``merged_label``
    row.  NULL keys and NULL windows are dropped.

    100 TB plan shape: ONE pass computes (window, bucket, rho) map-side;
    the per-(window, bucket) max is partial-agg combinable; the merged
    row max-merges the per-window REGISTER TABLE (windows * m rows, tiny)
    — the raw data is never read twice.  Estimate folds run in fixed
    bucket order over <= m = 2^b collected registers per group (bounded
    by construction, the bm25 fold discipline).
    """
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    u = _u_col(F.col(key_col), seed)
    v = F.shiftright(u, b)
    rho = F.when(v == 0, F.lit(_HLL_BITS_TOTAL - b + 1)).otherwise(
        F.lit(_HLL_BITS_TOTAL - b + 1) - F.length(F.bin(v))
    )
    regs = (
        df.where(F.col(key_col).isNotNull() & F.col(window_col).isNotNull())
        .select(
            F.col(window_col).cast("string").alias("win"),
            (u % m).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("win", "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("rho_max").alias("rho_max"))
        .select(F.lit(merged_label).alias("win"), "bucket", "rho_max")
    )

    def _est(r: DataFrame) -> DataFrame:
        s = F.aggregate(
            F.array_sort(F.collect_list(F.struct("bucket", "rho_max"))),
            F.lit(0.0),
            lambda acc, x: acc + F.pow(F.lit(2.0), -x["rho_max"]),
        )
        return r.groupBy("win").agg(
            F.round(
                F.lit(alpha * m * m)
                / (s + (F.lit(m) - F.count(F.lit(1))).cast("double")),
                4,
            ).alias("hll_estimate"),
            F.count(F.lit(1)).cast("long").alias("n_registers_used"),
        )

    return _est(regs.unionByName(merged))


def hll_windowed_oracle_sql(
    table: str,
    key_col: str,
    window_col: str,
    b: int = 10,
    seed: int = 42,
    merged_label: str = "ALL",
) -> str:
    """DuckDB SQL replicating ``hll_windowed`` bit-for-bit (same md5
    register arithmetic as ``hll_oracle_sql``, same fixed-order fold)."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    rbits = _HLL_BITS_TOTAL - b
    u = (
        f"(CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR) || ':{seed}'),"
        f" 1, 15) AS BIGINT))"
    )
    return f"""
        WITH hw AS (
          SELECT CAST({window_col} AS VARCHAR) AS win,
                 {u} % {m} AS bucket, {u} // {m} AS v
          FROM {table}
          WHERE {key_col} IS NOT NULL AND {window_col} IS NOT NULL
        ),
        hw_regs AS (
          SELECT win, bucket,
                 max(CASE WHEN v = 0 THEN {rbits + 1}
                          ELSE {rbits + 1} - length(bin(v)) END) AS rho_max
          FROM hw GROUP BY win, bucket
        ),
        hw_all AS (
          SELECT win, bucket, rho_max FROM hw_regs
          UNION ALL
          SELECT '{merged_label}', bucket, max(rho_max)
          FROM hw_regs GROUP BY bucket
        )
        SELECT win,
               round({alpha * m * m!r} /
                 (list_reduce(
                    list_prepend(0.0,
                      list(pow(2.0, -rho_max) ORDER BY bucket)),
                    (acc, x) -> acc + x)
                  + CAST({m} - count(*) AS DOUBLE)), 4) AS hll_estimate,
               CAST(count(*) AS BIGINT) AS n_registers_used
        FROM hw_all
        GROUP BY win
    """
