"""CDX-style capture indexing: SURT keys, revisit dedup, snapshot diff.

A recurring crawl produces many *captures* of the same page; the index
layer that makes 100 TB of captures queryable is the CDX discipline
(the Common Crawl / web-archive format): a canonical **SURT** sort key
per URL, a latest-capture view with revisit (same-digest) awareness,
and a snapshot-to-snapshot diff that tells the extraction tier what is
new, changed, or gone — the incremental-processing contract that keeps
a recurring pipeline from re-extracting an unchanged web.

* :func:`surt_key_col` — pure Column: canonical URL -> SURT key
  ``com,example[:port])/path?query``.  Host labels reversed and
  comma-joined so one registrable domain's pages sort contiguously
  (range scans / partition pruning by domain become prefix scans);
  the scheme is dropped — http/https captures of a page collapse to
  one key, which is the point of the CDX key.  Port kept only when
  the canonical URL kept it (non-default).
* :func:`latest_captures` — captures ``(url, ts, digest)`` -> one row
  per SURT: capture count, distinct-digest count (1 == the page never
  changed: every recapture was a revisit), and the latest capture's
  (ts, digest, url) under a fully deterministic tie-break
  (``max(struct(ts, digest, url))``).
* :func:`crawl_diff` — two latest-capture snapshots -> one row per
  SURT with status ``added`` / ``gone`` / ``changed`` / ``unchanged``
  (digest comparison decides changed).

Scale shape (100 TB / 1000 executors): the SURT key is whole-stage
codegen on top of the shared URL canonicalizer (no Python anywhere);
``latest_captures`` is ONE aggregation pipeline on the key — max/count
are map-side combinable, so the Zipfian capture head (home pages
recrawled daily) collapses per task before the shuffle; ``crawl_diff``
is one full-outer equi-join of two already-aggregated snapshots on
their natural key.  Nothing here ever windows over the raw capture
log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.urls import (
    canonical_ok_col,
    canonical_url_col,
)

__all__ = [
    "surt_key_col",
    "surt_key_from_canonical_col",
    "latest_captures",
    "crawl_diff",
    "surt_key_sql",
    "latest_captures_oracle_sql",
]


def _surt_from_parts(c: Column, hostport: Column) -> Column:
    """SURT key from an already-canonical URL + its extracted hostport.
    Both arguments should be bound attributes when used over real data
    (each is referenced more than once below)."""
    host = F.split(hostport, ":")[0]
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    rest = F.regexp_replace(c, r"^https?://[^/]*", "")
    return F.when(
        c.isNotNull(),
        F.concat(
            F.array_join(F.reverse(F.split(host, r"\.")), ","),
            F.when(port != F.lit(""), F.concat(F.lit(":"), port)).otherwise(
                F.lit("")
            ),
            F.lit(")"),
            rest,
        ),
    )


def surt_key_from_canonical_col(c: Column) -> Column:
    """ALREADY-CANONICAL URL (or NULL) -> SURT sort key (or NULL).

    ``c`` should be a bound attribute (a projected column), not a large
    expression: it is referenced at four sites, and Catalyst
    substitutes — it does not share — expression trees, so passing the
    ~15-op canonicalizer here inlines it 4x per row (and codegen CSE
    does not save a fallback-sized stage).  That exact mistake made
    web_surt_latest a 26 s/100k-row aggregation in round 4; the plan
    guard in tests/test_plan_guard.py pins the fixed shape.
    """
    return _surt_from_parts(
        c, F.regexp_extract(c, r"^https?://([^/]*)", 1)
    )


def surt_key_col(url: Column) -> Column:
    """RAW URL (or NULL) -> SURT sort key (or NULL).

    Convenience composition for one-off scalar use (tests, small dims).
    Inside an operator over a real capture log, canonicalize into a
    projected column first and call
    :func:`surt_key_from_canonical_col` on the attribute — see
    :func:`latest_captures` for the pattern and the docstring above for
    why."""
    return surt_key_from_canonical_col(canonical_url_col(url))


def latest_captures(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Capture log -> one row per SURT key (latest capture + history).

    Output: ``(surt, n_captures long, n_digests long, last_ts,
    last_digest string, last_url string)``.  ``n_digests`` = 1 means
    every recapture was a revisit (unchanged content).  Rows whose URL
    fails canonicalization are dropped (they have no key).

    Plan note (audited in tests/test_cdx.py): ``max(struct)`` — like
    every var-length max in Spark — fails HashAggregateExec's
    mutable-buffer check and runs as a partial+final SortAggregate.
    The partial step still combines map-side (the shuffle carries one
    row per key per task, which is what matters for a Zipfian capture
    head), so the cost vs a hash aggregate is a per-task sort, not
    shuffle volume.  The alternatives are strictly worse at scale: a
    Window means a row-preserving shuffle of the full log; an argmax
    via max(ts)+self-join means a second scan plus two more exchanges.

    Expression-sharing note (the round-4 pathology): the canonicalizer
    runs ONCE per row, materialized as ``_url`` in its own projection;
    the SURT key derives from that bound attribute (and the twice-used
    hostport is likewise hoisted).  Catalyst keeps the stacked projects
    because CollapseProject refuses to inline a non-cheap alias that is
    referenced more than once.  The keep-filter is the cheap
    ``canonical_ok_col`` predicate on the RAW url — filtering on the
    computed column instead lets PushDownPredicates' alias substitution
    clone the whole chain into a pre-projection filter (round 4 paid
    ~70 input-expression copies for exactly that).  Pinned by
    tests/test_plan_guard.py.
    """
    # r06 kernel: even with the round-5 hoist (canonicalize once into a
    # bound `_url` attribute), the Column canonicalizer costs ~450 us
    # core-time/row — its tracking-param higher-order filter drops the
    # whole projection out of codegen into interpreted eval.  Measured
    # decomposition at sf1.0 (1M captures): scan 0.7 s, +ok-filter
    # 2.9 s, +canonicalize 16.8 s, +surt 17.9 s, full query 20.2 s.
    # The canonicalize+surt step now runs as ONE Arrow batch pass over
    # precompiled Python regexes (guide §4.2); rejected URLs drop
    # inside the same pass.  Three-way parity for the Python replica is
    # pinned in tests/test_urls.py.
    import pyarrow as pa

    from deepseek_ocr_rs_spark.operators.urls import (
        canonicalize_url_py,
        surt_from_canonical_py,
    )

    ts_type = dict(df.dtypes)[ts_col]

    # mapInArrow, not mapInPandas: the canonicalize+surt kernel is ~3 us
    # per row but the pandas round trip (Series object churn, iloc fancy
    # indexing, DataFrame assembly, timestamp conversion) cost ~20 us per
    # row on top — Arrow-native take() keeps the ts/digest columns in
    # their buffers (guide §4.2)
    def keyer(batches):
        for batch in batches:
            canon = [
                canonicalize_url_py(u)
                for u in batch.column(0).to_pylist()
            ]
            keep = [i for i, c in enumerate(canon) if c is not None]
            kept = [canon[i] for i in keep]
            idx = pa.array(keep, type=pa.int32())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        [surt_from_canonical_py(c) for c in kept],
                        type=pa.string(),
                    ),
                    batch.column(1).take(idx),
                    batch.column(2).take(idx),
                    pa.array(kept, type=pa.string()),
                ],
                names=["surt", "_ts", "_dg", "_url"],
            )

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    keyed = rebalance_for_arrow(
        df.select(url_col, ts_col, digest_col)
    ).mapInArrow(
        keyer,
        schema=f"surt string, _ts {ts_type}, _dg string, _url string",
    )
    latest = F.max(F.struct("_ts", "_dg", "_url")).alias("_last")
    return (
        keyed.groupBy("surt")
        .agg(
            F.count("*").cast("long").alias("n_captures"),
            F.countDistinct("_dg").cast("long").alias("n_digests"),
            latest,
        )
        .select(
            "surt",
            "n_captures",
            "n_digests",
            F.col("_last._ts").alias("last_ts"),
            F.col("_last._dg").alias("last_digest"),
            F.col("_last._url").alias("last_url"),
        )
    )


def crawl_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Two :func:`latest_captures` snapshots -> per-SURT change status.

    Output: ``(surt, status string, url string, old_digest, new_digest,
    old_ts, new_ts)`` where status is ``added`` (key only in new),
    ``gone`` (only in old), ``changed`` (both, digests differ),
    ``unchanged`` (both, same digest).  ``url`` coalesces new-side
    first (the current canonical form wins).
    """
    o = old.select(
        "surt",
        F.col("last_digest").alias("old_digest"),
        F.col("last_ts").alias("old_ts"),
        F.col("last_url").alias("_old_url"),
    )
    n = new.select(
        "surt",
        F.col("last_digest").alias("new_digest"),
        F.col("last_ts").alias("new_ts"),
        F.col("last_url").alias("_new_url"),
    )
    j = o.join(n, "surt", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("gone"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "surt",
        status.alias("status"),
        F.coalesce("_new_url", "_old_url").alias("url"),
        "old_digest",
        "new_digest",
        "old_ts",
        "new_ts",
    )


# ------------------------------------------------------------------ oracles


def surt_key_sql(expr: str) -> str:
    """DuckDB replica of :func:`surt_key_col` over an ALREADY-CANONICAL
    SQL ``expr`` (compose with ``canonical_url_sql`` for raw URLs)."""
    return f"""
    (WITH s AS (
       SELECT {expr} AS c
     ), t AS (
       SELECT c,
              regexp_extract(c, '^https?://([^/]*)', 1) AS hp,
              regexp_replace(c, '^https?://[^/]*', '') AS rest
       FROM s
     )
     SELECT CASE WHEN c IS NOT NULL THEN
       array_to_string(list_reverse(str_split(str_split(hp, ':')[1], '.')),
                       ',')
       || CASE WHEN regexp_extract(hp, ':([0-9]+)$', 1) <> ''
          THEN ':' || regexp_extract(hp, ':([0-9]+)$', 1) ELSE '' END
       || ')' || rest
     END FROM t)
    """


def latest_captures_oracle_sql(captures_cte: str) -> str:
    """DuckDB replica of :func:`latest_captures` over a CTE/subquery
    producing ``(url_canon, ts, digest)`` with url_canon ALREADY
    canonical (the gate synthesizes canonical URLs on both sides)."""
    return f"""
    WITH caps AS ({captures_cte}),
    keyed AS (
      SELECT {surt_key_sql('url_canon')} AS surt, ts, digest,
             url_canon AS url
      FROM caps
    ),
    ranked AS (
      SELECT surt, ts, digest, url,
             row_number() OVER (
               PARTITION BY surt
               ORDER BY ts DESC, digest DESC, url DESC) AS rn
      FROM keyed WHERE surt IS NOT NULL
    ),
    agg AS (
      SELECT surt, CAST(count(*) AS BIGINT) AS n_captures,
             CAST(count(DISTINCT digest) AS BIGINT) AS n_digests
      FROM keyed WHERE surt IS NOT NULL GROUP BY surt
    )
    SELECT agg.surt, agg.n_captures, agg.n_digests,
           r.ts AS last_ts, r.digest AS last_digest, r.url AS last_url
    FROM agg JOIN ranked r ON agg.surt = r.surt AND r.rn = 1
    """


def recrawl_intervals(
    diff: DataFrame,
    base_interval_s: int = 86400,
    min_interval_s: int = 3600,
    max_interval_s: int = 2592000,
) -> DataFrame:
    """Crawl diff -> per-host adaptive revisit policy.

    A recurring crawl should not revisit every host at the same cadence:
    hosts whose pages change between snapshots deserve short intervals,
    static archives long ones.  Per host (the SURT key's pre-``)``
    prefix, so one registrable domain rolls up together):

    ``interval_s = clamp(base * (n_unchanged + 1) div (n_changed + 1),
    min, max)`` — exact integer division (cross-engine discipline), so
    a host with 9 unchanged / 0 changed pages waits 10x base and a host
    with 0 unchanged / 9 changed pages waits base/10, clamped.  Added/
    gone pages are reported but do not steer the ratio (they say the
    *frontier* moved, not that content churns).

    Output: ``(host, n_added, n_gone, n_changed, n_unchanged,
    interval_s)`` — one map-side-combinable hash aggregate over the
    already-aggregated diff; at 100 TB this is the tiny control-plane
    table the frontier scheduler joins against.
    """
    host = F.regexp_extract(F.col("surt"), r"^([^)]*)\)", 1).alias("host")
    cnt = lambda s: F.sum(
        F.when(F.col("status") == s, 1).otherwise(0)
    ).cast("long")
    agg = diff.groupBy(host).agg(
        cnt("added").alias("n_added"),
        cnt("gone").alias("n_gone"),
        cnt("changed").alias("n_changed"),
        cnt("unchanged").alias("n_unchanged"),
    )
    raw = F.expr(
        f"{int(base_interval_s)}L * (n_unchanged + 1L) div (n_changed + 1L)"
    )
    interval = F.greatest(
        F.lit(int(min_interval_s)).cast("long"),
        F.least(F.lit(int(max_interval_s)).cast("long"), raw),
    )
    return agg.select(
        "host", "n_added", "n_gone", "n_changed", "n_unchanged",
        interval.alias("interval_s"),
    )
