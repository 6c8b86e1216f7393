"""Registrable-domain extraction and domain blocklist filtering.

Corpus curation at web scale filters by *site*, not by exact host:
``evil.tracker.example.co.uk`` must match a blocklist entry for
``example.co.uk``, and per-site aggregates (quality priors, crawl
budgets) key on the registrable domain.  Two primitives:

* :func:`registrable_domain_col` — pure Column expression mapping a
  canonical host (operators/urls.py) to its registrable domain using a
  **PSL-lite** rule set: an embedded subset of the high-traffic
  two-level public suffixes (co.uk, com.au, co.jp, ...) promotes the
  cut to three labels; everything else defaults to the last two.  The
  full Public Suffix List is ~9k rules of public data; this subset is
  the deliberate, documented trade — swap in the full list by extending
  ``MULTI_LEVEL_SUFFIXES`` (the expression shape is unchanged).
* :func:`filter_blocklisted` — drops rows whose host IS a blocked
  domain or any subdomain of one.  The scalable shape: explode each
  host into its bounded suffix chain (at most ``max_labels-1`` entries,
  hostnames are short) and LEFT ANTI equi-join against the blocklist —
  never an ``endswith`` predicate against every blocklist row (that is
  a cross-join at 100 TB).  The blocklist side is a DataFrame so Spark
  broadcasts it when small and shuffles both sides when it is itself
  web-scale.

Both rule sets are replicated verbatim by the ``*_sql`` builders so the
DuckDB gate checks values exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MULTI_LEVEL_SUFFIXES",
    "registrable_domain_col",
    "host_suffix_chain",
    "filter_blocklisted",
    "registrable_domain_sql",
]

# PSL-lite: common ccSLD second-level public suffixes (public data; see
# module docstring for the full-PSL upgrade path).  Sorted, deduped.
MULTI_LEVEL_SUFFIXES: tuple = tuple(sorted({
    "ac.jp", "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.th",
    "co.uk", "co.za", "com.ar", "com.au", "com.bd", "com.br", "com.cn",
    "com.eg", "com.hk", "com.mx", "com.my", "com.ng", "com.ph",
    "com.pk", "com.sa", "com.sg", "com.tr", "com.tw", "com.vn",
    "edu.au", "go.jp", "gov.au", "gov.br", "gov.cn", "gov.uk", "me.uk",
    "ne.jp", "net.au", "net.br", "net.cn", "net.in", "net.nz", "net.uk",
    "or.jp", "org.au", "org.br", "org.cn", "org.in", "org.nz", "org.uk",
    "sch.uk",
}))


def registrable_domain_col(host: Column) -> Column:
    """Registrable domain of a canonical host (NULL host -> NULL).

    A host with no dot (e.g. ``localhost``) is returned unchanged; a
    host whose own suffix IS a public suffix (e.g. ``co.uk`` itself)
    likewise returns unchanged — there is nothing to register below it.
    """
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # greatest(...,1): slice's start must stay positive even for
    # single-label hosts — this sub-expression feeds the CASE *condition*
    # so it is evaluated for every row, not just multi-label ones
    last2 = F.concat_ws(
        ".", F.slice(labels, F.greatest(n - F.lit(1), F.lit(1)), F.lit(2))
    )
    take = F.when(
        last2.isin(*MULTI_LEVEL_SUFFIXES), F.lit(3)
    ).otherwise(F.lit(2))
    # explicit NULL propagation: concat_ws would fold a NULL host to ''
    return F.when(
        host.isNotNull(),
        F.when(n <= take, host).otherwise(
            F.concat_ws(".", F.slice(labels, n - take + 1, take))
        ),
    )


def registrable_domain_sql(expr: str) -> str:
    """DuckDB replica of :func:`registrable_domain_col`."""
    suffixes = ", ".join(f"'{s}'" for s in MULTI_LEVEL_SUFFIXES)
    return f"""
    (WITH h AS (SELECT {expr} AS h0),
     a AS (SELECT h0, string_split(h0, '.') AS ls FROM h),
     b AS (SELECT h0, ls, len(ls) AS n,
                  array_to_string(list_slice(ls, len(ls) - 1, len(ls)), '.')
                      AS last2
           FROM a),
     c AS (SELECT h0, ls, n,
                  CASE WHEN last2 IN ({suffixes}) THEN 3 ELSE 2 END AS tk
           FROM b)
     SELECT CASE WHEN n <= tk THEN h0
                 ELSE array_to_string(list_slice(ls, n - tk + 1, n), '.')
            END
     FROM c)
    """


def host_suffix_chain(host: Column, max_labels: int = 8) -> Column:
    """Array of all dot-suffixes of ``host`` with >= 2 labels, plus the
    host itself — the equi-join keys for subdomain blocklist matching.

    ``a.b.co.uk`` -> [a.b.co.uk, b.co.uk, co.uk].  Bounded by
    ``max_labels`` (hostname label counts are small; deeper labels are
    simply not considered match points, matching how blocklists are
    written).  Pure Column expression: stays in codegen.
    """
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # clamp the sequence end to >=1: sequence(1, 0) would infer step -1
    idx = F.sequence(
        F.lit(1),
        F.greatest(F.least(n - F.lit(1), F.lit(max_labels - 1)), F.lit(1)),
    )
    return F.when(n >= F.lit(2), F.transform(
        idx, lambda i: F.concat_ws(".", F.slice(labels, i, n - i + 1))
    )).otherwise(F.array(host))


def filter_blocklisted(
    df: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    blocked_col: str = "domain",
    max_labels: int = 8,
) -> DataFrame:
    """Rows of ``df`` whose host is NOT a blocked domain or a subdomain
    of one.

    Shape: the suffix explode runs over DISTINCT hosts only (web corpora
    have orders of magnitude fewer hosts than rows), a semi-join against
    the blocklist marks blocked hosts, and one LEFT ANTI equi-join on
    the host column filters the full table.  No endswith scans, no
    full-row joins; the output carries exactly ``df``'s columns."""
    bl = blocklist.select(F.col(blocked_col).alias("__blocked"))
    blocked_hosts = (
        df.select(host_col)
        .distinct()
        .withColumn(
            "__suffix",
            F.explode(host_suffix_chain(F.col(host_col), max_labels)),
        )
        .join(bl, F.col("__suffix") == F.col("__blocked"), "left_semi")
        .select(host_col)
        .distinct()
    )
    return df.join(blocked_hosts, on=host_col, how="left_anti")
