"""URL query-parameter semantics: learning which params are DUST.

A recurring crawl's canonicalizer strips a FIXED tracking-param list
(utm_*, fbclid, ... — operators/urls.py); but the long tail of
session ids, sort orders, and affiliate codes is SITE-SPECIFIC and has
to be LEARNED from the crawl itself.  The public technique ("Do Not
Crawl in the DUST: Different URLs with Similar Text", Bar-Yossef et
al. WWW 2007; the same evidence rule behind search engines' URL
parameter handling) is digest invariance: a parameter is superfluous
for a host when URLs that differ ONLY in that parameter consistently
serve identical content.

``url_param_stats`` scores every (host, param) pair observed in a
capture log (url, digest):

* explode each URL's query params; for each occurrence build the
  RESIDUAL — path + the OTHER params, sorted (order-canonical) — the
  "URL with this param removed" equivalence key;
* a residual GROUP with >= 2 distinct URLs is evidence: if all its
  captures share one digest, the param did not affect content there
  (invariant group); if digests differ, it did;
* per (host, param): evidence-group counts and the invariant share in
  floor basis points, classified ``superfluous`` (>= hi_bp over >=
  min_groups groups), ``content`` (<= lo_bp), else ``insufficient``.

Input contract: URLs are already canonicalized (lowercase scheme/host,
no userinfo/fragment, percent-encoding resolved) — this operator sits
DOWNSTREAM of canonical_url_col, learning what the static strip-list
missed.  Duplicate param keys in one URL are each scored against the
others (index-aware filter, not value dedup).

100 TB plan shape: one JVM-lambda explode (no Python), then two hash
aggregates — (host, param, residual) distinct-url/digest counts, and
the (host, param) rollup — both map-side combinable and key-balanced
(residuals are near-unique; the Zipf head of popular params is
absorbed by partial aggregation).  No window, no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["url_param_stats", "url_param_stats_oracle_sql"]


def url_param_stats(
    df: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    min_groups: int = 3,
    hi_bp: int = 9000,
    lo_bp: int = 5000,
) -> DataFrame:
    """(host, param, n_urls, n_groups, n_invariant, invariant_bp,
    verdict) per (host, param) observed with a query string.

    r06 kernel: the per-occurrence residual construction (filter-by-
    index + array_sort + array_join HOFs on the exploded param array)
    ran interpreted per element — 8.4 s at sf1.0.  One Arrow pass now
    parses the URL and emits every (host, param, residual) occurrence
    row with plain Python string ops (identical split_part semantics);
    the two hash aggregates are unchanged.
    """
    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    def parse(batches):
        for pdf in batches:
            hosts, params_o, resid, urls_o, digs = [], [], [], [], []
            for url, dig in zip(pdf[url_col], pdf[digest_col]):
                u = url or ""
                slash = u.split("/")
                host = (slash[2] if len(slash) > 2 else "").split(":")[0]
                qsplit = u.split("?")
                path = qsplit[0]
                params = [
                    p for p in
                    (qsplit[1] if len(qsplit) > 1 else "").split("&")
                    if p != ""
                ]
                if not params:
                    continue
                for i, p in enumerate(params):
                    rest = params[:i] + params[i + 1:]
                    hosts.append(host)
                    params_o.append(p.split("=")[0])
                    resid.append(path + "?" + "&".join(sorted(rest)))
                    urls_o.append(u)
                    digs.append(dig)
            yield pd.DataFrame(
                {
                    "host": hosts,
                    "param": params_o,
                    "_residual": resid,
                    "_url": urls_o,
                    "_digest": digs,
                }
            )

    occ = rebalance_for_arrow(df.select(url_col, digest_col)).mapInPandas(
        parse,
        schema="host string, param string, _residual string, "
               "_url string, _digest string",
    )
    groups = occ.groupBy("host", "param", "_residual").agg(
        F.countDistinct("_url").alias("_nu"),
        F.countDistinct("_digest").alias("_nd"),
    )
    rolled = groups.groupBy("host", "param").agg(
        F.sum("_nu").cast("long").alias("n_urls"),
        F.sum(F.when(F.col("_nu") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_groups"),
        F.sum(
            F.when((F.col("_nu") >= 2) & (F.col("_nd") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_invariant"),
    )
    return rolled.select(
        "host",
        "param",
        "n_urls",
        "n_groups",
        "n_invariant",
        F.expr(
            "cast((10000 * n_invariant) div nullif(n_groups, 0)"
            " as bigint)"
        ).alias(
            "invariant_bp"
        ),
        F.when(
            (F.col("n_groups") >= min_groups)
            & (
                F.expr("(10000 * n_invariant) div nullif(n_groups, 0)")
                >= F.lit(hi_bp)
            ),
            F.lit("superfluous"),
        )
        .when(
            (F.col("n_groups") >= min_groups)
            & (
                F.expr("(10000 * n_invariant) div nullif(n_groups, 0)")
                <= F.lit(lo_bp)
            ),
            F.lit("content"),
        )
        .otherwise(F.lit("insufficient"))
        .alias("verdict"),
    )


def url_param_stats_oracle_sql(
    table: str,
    url_col: str = "url",
    digest_col: str = "digest",
    min_groups: int = 3,
    hi_bp: int = 9000,
    lo_bp: int = 5000,
) -> str:
    """DuckDB SQL replicating ``url_param_stats`` exactly (same
    residual canonicalization, same floor-div basis points; DuckDB
    list-lambda indexes are 1-based where Spark's are 0-based)."""
    return f"""
        WITH up_parsed AS (
          SELECT split_part(split_part({url_col}, '/', 3), ':', 1) AS host,
                 split_part({url_col}, '?', 1) AS _path,
                 list_filter(string_split(
                   split_part({url_col}, '?', 2), '&'), x -> x <> '')
                   AS _params,
                 {url_col} AS _url, {digest_col} AS _digest
          FROM {table}
        ),
        up_occ AS (
          SELECT host,
                 split_part(_params[i], '=', 1) AS param,
                 _path || '?' || array_to_string(list_sort(
                   list_filter(_params, (x, j) -> j <> i)), '&')
                   AS _residual,
                 _url, _digest
          FROM up_parsed, UNNEST(range(1, len(_params) + 1)) AS u(i)
          WHERE len(_params) > 0
        ),
        up_groups AS (
          SELECT host, param, _residual,
                 count(DISTINCT _url) AS _nu,
                 count(DISTINCT _digest) AS _nd
          FROM up_occ GROUP BY 1, 2, 3
        ),
        up_rolled AS (
          SELECT host, param,
                 sum(_nu) AS n_urls,
                 sum(CASE WHEN _nu >= 2 THEN 1 ELSE 0 END) AS n_groups,
                 sum(CASE WHEN _nu >= 2 AND _nd = 1 THEN 1 ELSE 0 END)
                   AS n_invariant
          FROM up_groups GROUP BY 1, 2
        )
        SELECT host, param,
               CAST(n_urls AS BIGINT) AS n_urls,
               CAST(n_groups AS BIGINT) AS n_groups,
               CAST(n_invariant AS BIGINT) AS n_invariant,
               CAST(10000 * n_invariant // nullif(n_groups, 0) AS BIGINT)
                 AS invariant_bp,
               CASE WHEN n_groups >= {min_groups}
                         AND 10000 * n_invariant // nullif(n_groups, 0) >= {hi_bp}
                    THEN 'superfluous'
                    WHEN n_groups >= {min_groups}
                         AND 10000 * n_invariant // nullif(n_groups, 0) <= {lo_bp}
                    THEN 'content'
                    ELSE 'insufficient' END AS verdict
        FROM up_rolled
    """
