"""Outlink extraction + URL canonicalization + host aggregation.

A web-scale extraction pipeline does more with an HTML payload than strip
boilerplate: the ``<a href>`` graph is the raw material for crawl
frontiers, host-level quality priors, and link-spam filters.  The
reference walks every anchor while scoring link density
(crates: the link-character counting that feeds its boilerplate
classifier); this module surfaces those same anchors as data — one
outlink row per kept href — instead of only as a density statistic.

Three layers, each independently reusable:

* :func:`extract_hrefs` — Arrow-batched pandas UDF running the repo's own
  streaming tokenizer (functions/tokenizer.py) over the HTML payload and
  collecting ``href`` attributes of ``<a>`` open events in document
  order.  Entities inside the attribute value are decoded with the same
  HTML5 table the text path uses, so ``&amp;`` separators behave like a
  browser's.
* :func:`canonical_url_col` / :func:`canonical_host_col` — pure JVM
  Column->Column expression chains (composable inside ``F.transform``
  lambdas, so a whole href array canonicalizes without leaving codegen).
* :func:`outlinks` / :func:`host_stats` — the operator: explode kept
  links with their in-document ordinal, aggregate per host.

Canonicalization contract (documented here, replicated verbatim in the
DuckDB oracle builders below; every rule is a deliberate choice, not an
accident of parsing):

1. only absolute ``http://`` / ``https://`` URLs survive; everything
   else (relative paths, ``mailto:``, ``javascript:``, ``//protocol-
   relative``) canonicalizes to NULL,
2. scheme and host lowercase; path/query case is preserved,
3. userinfo (``user:pass@``) is stripped,
4. host: trailing dot removed, leading ``www.`` removed, default port
   (80 for http, 443 for https) removed, non-default ports kept; a host
   that is not plain ``[a-z0-9.-]+`` after lowering (e.g. bracketed
   IPv6) is rejected as NULL,
5. fragment dropped,
6. empty path becomes ``/``,
7. query params split on ``&``: empties dropped, tracking params
   (``utm_*``, ``fbclid``, ``gclid``, ``gbraid``, ``wbraid``,
   ``msclkid``, ``mc_eid``, ``igshid``, ``yclid``, ``spm``, ``_ga``)
   dropped, the rest sorted bytewise and re-joined (duplicates kept —
   they are semantically meaningful to many endpoints).

Scale notes (100 TB / 1000 executors):
  * href collection is embarrassingly parallel per payload (one Arrow
    batch pass, no shuffle); canonicalization is whole-stage codegen on
    the exploded column, so the only exchange in ``host_stats`` is the
    final partial/final hash aggregate on ``host`` — map-side combine
    collapses each task to its distinct hosts (web host counts are
    Zipfian, but partial aggregation absorbs the hot head the same way
    it does for any skewed groupBy).
  * the raw payload column never travels past the UDF projection: we
    ``select`` (id, text) before the UDF and drop ``text`` immediately
    after, so the explode and the aggregate shuffle only id + short URL
    strings.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAM_RE",
    "canonical_ok_col",
    "canonical_url_col",
    "canonical_host_col",
    "host_of_canonical_col",
    "extract_hrefs",
    "outlinks",
    "host_stats",
    "canonical_url_sql",
    "canonical_host_sql",
    "outlinks_oracle_sql",
    "host_stats_oracle_sql",
]

# (?i) anchored name-match: `name` or `name=anything`
TRACKING_PARAM_RE = (
    "(?i)^(utm_[^=]*|fbclid|gclid|gbraid|wbraid|msclkid"
    "|mc_eid|igshid|yclid|spm|_ga)(=.*)?$"
)

_ABS_HTTP_RE = "(?i)^https?://"
_SCHEME_RE = "(?i)^(https?)://"
_AUTH_RE = "(?i)^https?://([^/?#]*)"
_PATH_RE = "(?i)^https?://[^/?#]*([^?#]*)"
_HOST_OK_RE = "^[a-z0-9.-]+$"

# ---------------------------------------------------------------------
# Vectorized Python canonicalizer (r06).  The Column chain below costs
# ~450 us core-time per row once a higher-order function (the tracking-
# param filter) drops the projection out of whole-stage codegen into
# interpreted eval — 14 of web_surt_latest's 19 s at sf1.0 were the
# canonicalizer alone (plans/r06, OPTIMIZATION_r06.md).  This is the
# same contract with precompiled Python regexes for use inside Arrow
# batch stages; tests/test_urls.py pins three-way parity
# (Column == Python == DuckDB) over the hostile corpus.  Java-semantics
# notes: F.trim strips ASCII space only (str.strip(" ")); Spark split
# keeps trailing empties (Python str.split ditto); array_sort on UTF8
# == Python sorted() on str for any text (UTF-8 byte order is
# code-point order).

import re as _re

_PY_ABS_HTTP = _re.compile(r"^https?://", _re.I)
_PY_SCHEME = _re.compile(r"^(https?)://", _re.I)
_PY_AUTH = _re.compile(r"^https?://([^/?#]*)", _re.I)
_PY_PATH = _re.compile(r"^https?://[^/?#]*([^?#]*)", _re.I)
_PY_HOST_OK = _re.compile(r"^[a-z0-9.-]+$")
_PY_TRACKING = _re.compile(
    r"^(utm_[^=]*|fbclid|gclid|gbraid|wbraid|msclkid"
    r"|mc_eid|igshid|yclid|spm|_ga)(=.*)?$",
    _re.I,
)
_PY_HOST_HEAD = _re.compile(r"^([^:]*)")
_PY_PORT = _re.compile(r":([0-9]+)$")
_PY_QUERY = _re.compile(r"\?(.*)$")
_PY_FRAG = _re.compile(r"#.*$")
_PY_SURT_HOSTPORT = _re.compile(r"^https?://([^/]*)")


_PY_CANON_FULL = _re.compile(r"^(https?)://([^/?#]*)([^?#]*)", _re.I)


def canonicalize_url_py(url):
    """Python replica of :func:`canonical_url_col` (None for rejects).

    r06 kernel: one fused anchored regex yields scheme/authority/path in
    a single pass (the old shape ran ~8 separate regex ops per URL and
    dominated the latest_captures Arrow stage); the query still uses the
    original ``\\?(.*)$`` extraction so newline edge semantics are
    bit-identical.  Equality with the old shape is pinned in
    tests/test_urls.py over the hostile corpus + random fuzz.
    """
    if url is None:
        return None
    u = url.strip(" ")
    # fragment strip stays the regex: '#.*$' deliberately shares the
    # no-DOTALL/no-MULTILINE newline semantics of the JVM and DuckDB
    # replicas (a '#' whose tail contains an interior newline is NOT a
    # fragment in any of the three engines)
    base = _PY_FRAG.sub("", u)
    # prefix ^https?:// on the fragment-stripped base is equivalent to
    # the old ABS_HTTP check on u: '#' cannot occur inside the prefix
    m = _PY_CANON_FULL.match(base)
    if m is None:
        return None
    auth = m.group(2)
    at = auth.rfind("@")
    if at >= 0:
        auth = auth[at + 1:]
    c = auth.find(":")
    host = (auth[:c] if c >= 0 else auth).lower()
    if host.endswith("."):
        host = host[:-1]
    if host.startswith("www."):
        host = host[4:]
    if not _PY_HOST_OK.match(host):
        return None
    scheme = m.group(1).lower()
    pm = _PY_PORT.search(auth)
    port = pm.group(1) if pm else ""
    if port and not (
        (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443")
    ):
        port_part = ":" + port
    else:
        port_part = ""
    path = m.group(3) or "/"
    qm = _PY_QUERY.search(base)
    if qm:
        params = sorted(
            p for p in qm.group(1).split("&")
            if p != "" and not _PY_TRACKING.search(p)
        )
        q_part = "?" + "&".join(params) if params else ""
    else:
        q_part = ""
    return f"{scheme}://{host}{port_part}{path}{q_part}"


_PY_DOTDOT_SEG = _re.compile(r"/(\.\.[^/]+|\.[^/.][^/]*|[^/.][^/]*)/\.\./")
_PY_LEADING_DOTDOT = _re.compile(r"^(/\.\.)+/")
_PY_Q_STRIP = _re.compile(r"\?.*$")
_PY_Q_KEEP = _re.compile(r"(\?.*)$")
_PY_TRAIL_SLASH = _re.compile(r"/$")
_PY_OTHER_SCHEME = _re.compile(r"^[a-z][a-z0-9+.-]*:", _re.I)
_PY_ORIGIN = _re.compile(r"^(https?://[^/]*)")
_PY_SCHEME_ONLY = _re.compile(r"^(https?)://")
_PY_HOSTSTRIP = _re.compile(r"^https?://[^/]*")
_PY_LASTSEG = _re.compile(r"[^/]*$")
_PY_HOST_OF_CANON = _re.compile(r"^https?://([^/:?#]*)")


def remove_dot_segments_py(pq):
    """Python replica of :func:`_remove_dot_segments_col` (same bounded
    passes, same sentinel-slash and trailing-slash rules)."""
    if pq is None:
        return None
    p = _PY_Q_STRIP.sub("", pq)
    m = _PY_Q_KEEP.search(pq)
    q = m.group(1) if m else ""
    had_slash = p.endswith("/") or p.endswith("/.") or p.endswith("/..")
    w = p if p.endswith("/") else p + "/"
    for _ in range(_DOT_PASSES):
        w = w.replace("/./", "/")
    for _ in range(_DOT_PASSES):
        w = _PY_DOTDOT_SEG.sub("/", w)
    w = _PY_LEADING_DOTDOT.sub("/", w)
    if "/./" in w or "/../" in w:
        return None
    if not (had_slash or w == "/"):
        w = _PY_TRAIL_SLASH.sub("", w)
    return w + q


def base_parts_py(base):
    """Python replica of :func:`_base_parts` (canonical base or None)."""
    if base is None:
        return None, None, None, None
    m = _PY_ORIGIN.search(base)
    origin = m.group(1) if m else ""
    m = _PY_SCHEME_ONLY.search(base)
    scheme = m.group(1) if m else ""
    bpath = _PY_Q_STRIP.sub("", _PY_HOSTSTRIP.sub("", base))
    bdir = _PY_LASTSEG.sub("", bpath)
    return origin, scheme, bpath, bdir


def resolve_raw_py(origin, scheme, bpath, bdir, href):
    """Python replica of :func:`_resolve_raw_from_parts` (NULL base
    parts propagate to None exactly like the Column concat)."""
    if href is None:
        return None
    h = _PY_FRAG.sub("", href.strip(" "))
    if _PY_ABS_HTTP.search(h):
        return h
    if _PY_OTHER_SCHEME.search(h):
        return None
    if h.startswith("//"):
        return None if scheme is None else scheme + ":" + h
    if h.startswith("/"):
        if origin is None:
            return None
        r = remove_dot_segments_py(h)
        return None if r is None else origin + r
    if h.startswith("?"):
        if origin is None or bpath is None:
            return None
        return origin + bpath + h
    if h != "":
        if origin is None or bdir is None:
            return None
        r = remove_dot_segments_py(bdir + h)
        return None if r is None else origin + r
    return None


def host_of_canonical_py(c):
    """Python replica of :func:`host_of_canonical_col`."""
    if c is None:
        return None
    m = _PY_HOST_OF_CANON.search(c)
    return m.group(1) if m else ""


def surt_from_canonical_py(c):
    """Python replica of :func:`~.cdx.surt_key_from_canonical_col`.

    String finds instead of the three regex ops of the old shape — the
    canonical form always carries ``scheme://host[:port]/path`` so the
    first ``/`` after the authority splits hostport from rest exactly
    where ``^https?://([^/]*)`` did; non-canonical input degrades to the
    same empty-hostport fold the regex produced."""
    if c is None:
        return None
    m = _PY_ABS_HTTP.match(c)
    if m:
        a = m.end()
        sl = c.find("/", a)
        hostport = c[a:] if sl < 0 else c[a:sl]
        rest = "" if sl < 0 else c[sl:]
    else:
        hostport, rest = "", c
    cpos = hostport.find(":")
    host = hostport[:cpos] if cpos >= 0 else hostport
    pm = _PY_PORT.search(hostport)
    port = pm.group(1) if pm else ""
    return (
        ",".join(reversed(host.split(".")))
        + (":" + port if port else "")
        + ")"
        + rest
    )


def _canon_parts(url: Column):
    """Shared sub-expressions for url/host canonicalization."""
    u = F.trim(url)
    base = F.regexp_replace(u, "#.*$", "")  # rule 5: fragment first
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RE, 1))
    auth = F.regexp_extract(base, _AUTH_RE, 1)
    auth = F.element_at(F.split(auth, "@"), -1)  # rule 3: userinfo
    host = F.lower(F.regexp_extract(auth, "^([^:]*)", 1))
    host = F.regexp_replace(host, r"\.$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(auth, ":([0-9]+)$", 1)
    ok = (
        u.rlike(_ABS_HTTP_RE)
        & host.rlike(_HOST_OK_RE)
    )
    return u, base, scheme, host, port, ok


def canonical_ok_col(url: Column) -> Column:
    """TRUE iff :func:`canonical_url_col` of ``url`` would be non-NULL.

    The cheap (2-rlike + host-extraction) acceptance predicate on the
    RAW url.  Use this as the keep-filter *instead of* filtering on the
    computed canonical column: Spark's PushDownPredicates substitutes —
    it does not share — alias expressions, so ``where(c.isNotNull())``
    over ``c = canonical_url_col(...)`` clones the entire canonicalizer
    (and whatever expression produced the url) into a pre-projection
    filter.  That cloning made web_surt_latest a 26 s/100k-row query in
    round 4; tests/test_plan_guard.py pins the fixed shapes.
    """
    _, _, _, _, _, ok = _canon_parts(url)
    return ok


def canonical_host_col(url: Column) -> Column:
    """Canonical registrable-ish host of an absolute http(s) URL, else NULL."""
    _, _, _, host, _, ok = _canon_parts(url)
    return F.when(ok, host)


def host_of_canonical_col(c: Column) -> Column:
    """Host of an ALREADY-CANONICAL URL — one regexp, no re-derivation.

    Equivalent to ``canonical_host_col(c)`` when ``c`` came out of
    :func:`canonical_url_col` (the canonical form is lowercased, has no
    userinfo, no trailing dot, no ``www.``), but constant-size: passing
    a canonical-URL *expression* through ``canonical_host_col`` inlines
    the whole canonicalizer at each of its ~6 argument references.
    """
    return F.regexp_extract(c, r"^https?://([^/:?#]*)", 1)


def canonical_url_col(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, else NULL.

    Pure Column composition — usable both on a plain column and inside
    ``F.transform`` / ``F.filter`` lambdas (stays in codegen either way).
    """
    u, base, scheme, host, port, ok = _canon_parts(url)
    default_port = ((scheme == F.lit("http")) & (port == F.lit("80"))) | (
        (scheme == F.lit("https")) & (port == F.lit("443"))
    )
    port_part = F.when(
        (port != F.lit("")) & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.regexp_extract(base, _PATH_RE, 1)
    path = F.when(path == F.lit(""), F.lit("/")).otherwise(path)
    query = F.regexp_extract(base, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
    )
    q = F.array_join(F.array_sort(params), "&")
    q_part = F.when(q != F.lit(""), F.concat(F.lit("?"), q)).otherwise(
        F.lit("")
    )
    return F.when(
        ok, F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
    )


def _hrefs_batches(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Document-ordered <a href> values from an HTML payload.

    Runs the repo's streaming tokenizer (the same code path extraction
    uses, including the attribute retention added for class/id hints) —
    NOT a regex: hrefs inside comments, scripts, or rawtext do not leak,
    and hostile markup degrades exactly like the extractor does.
    """
    from deepseek_ocr_rs_spark.functions.tokenizer import (
        decode_entities,
        tokenize_html_fast,
    )

    for ser in texts:
        out = []
        for payload in ser:
            hrefs: list = []
            if payload:
                for ev in tokenize_html_fast(payload):
                    if ev[0] == "open" and ev[1] == "a":
                        href = ev[2].get("href")
                        if href:
                            hrefs.append(decode_entities(href))
            out.append(hrefs)
        yield pd.Series(out)


def extract_hrefs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``hrefs array<string>`` — raw (entity-decoded) anchor targets."""
    # built lazily: pandas_udf needs an active session (DDL type parse)
    udf = F.pandas_udf(_hrefs_batches, "array<string>")
    return df.withColumn("hrefs", udf(F.col(text_col)))


def outlinks(
    df: DataFrame, id_col: str = "conv_id", text_col: str = "text"
) -> DataFrame:
    """(id, html) -> one row per kept outlink.

    Output: ``(id_col, link_pos int, url_canon string, host string)``
    where ``link_pos`` is the 0-based ordinal among KEPT (absolute
    http/https) links in document order.  Canonicalization happens
    inside a ``transform`` lambda on the href array — JVM-side, before
    the explode, so dropped links never become rows.
    """
    # r06 kernel: tokenize + canonicalize in ONE Arrow pass (guide §4.2)
    # — the hrefs already come out of the Python tokenizer, so
    # canonicalizing there costs no new boundary, while the old JVM
    # ``transform`` lambda ran the ~15-op canonicalizer INTERPRETED per
    # array element (higher-order lambdas never enter codegen).  The
    # Python canonicalizer replica is parity-pinned against
    # canonical_url_col in tests/test_urls.py; same discipline as
    # :func:`resolved_outlinks` below.
    from deepseek_ocr_rs_spark.functions.tokenizer import (
        decode_entities,
        tokenize_html_fast,
    )
    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    id_type = dict(df.dtypes)[id_col]

    def run(batches):
        for pdf in batches:
            ids, poss, canons, hosts = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[text_col]):
                pos = 0
                if payload:
                    for ev in tokenize_html_fast(payload):
                        if ev[0] == "open" and ev[1] == "a":
                            href = ev[2].get("href")
                            if not href:
                                continue
                            c = canonicalize_url_py(decode_entities(href))
                            if c is None:
                                continue
                            ids.append(did)
                            poss.append(pos)
                            canons.append(c)
                            hosts.append(host_of_canonical_py(c))
                            pos += 1
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "link_pos": poss,
                    "url_canon": canons,
                    "host": hosts,
                }
            )

    return rebalance_for_arrow(df.select(id_col, text_col)).mapInPandas(
        run,
        schema=f"{id_col} {id_type}, link_pos int, url_canon string, "
               f"host string",
    )


def host_stats(links: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Per-host outlink stats: total links and distinct linking docs."""
    return links.groupBy("host").agg(
        F.count("*").cast("long").alias("n_links"),
        F.countDistinct(id_col).cast("long").alias("n_docs"),
    )


# ------------------------------------------------------------------ oracles


def canonical_url_sql(expr: str) -> str:
    """DuckDB replica of :func:`canonical_url_col` over SQL ``expr``.

    Same regexes (RE2 and Java agree on this subset), same rule order;
    used by the pytest parity suite so the contract is pinned in BOTH
    engines independently of the gate fixtures.
    """
    return f"""
    (WITH p AS (
       SELECT trim({expr}) AS u0,
              regexp_replace(trim({expr}), '#.*$', '') AS b0
     ), q AS (
       SELECT u0, b0,
              lower(regexp_extract(b0, '(?i)^(https?)://', 1)) AS s0,
              str_split(regexp_extract(b0, '(?i)^https?://([^/?#]*)', 1),
                        '@')[-1] AS a0
       FROM p
     ), r AS (
       SELECT u0, b0, s0,
              regexp_replace(regexp_replace(
                  lower(regexp_extract(a0, '^([^:]*)', 1)),
                  '\\.$', ''), '^www\\.', '') AS h0,
              regexp_extract(a0, ':([0-9]+)$', 1) AS p0
       FROM q
     )
     SELECT CASE WHEN regexp_matches(u0, '(?i)^https?://')
                      AND regexp_matches(h0, '^[a-z0-9.-]+$')
            THEN s0 || '://' || h0
              || CASE WHEN p0 <> ''
                       AND NOT ((s0 = 'http' AND p0 = '80')
                                OR (s0 = 'https' AND p0 = '443'))
                 THEN ':' || p0 ELSE '' END
              || CASE WHEN regexp_extract(b0,
                     '(?i)^https?://[^/?#]*([^?#]*)', 1) = '' THEN '/'
                 ELSE regexp_extract(b0,
                     '(?i)^https?://[^/?#]*([^?#]*)', 1) END
              || CASE WHEN coalesce(array_to_string(list_sort(list_filter(
                     str_split(regexp_extract(b0, '\\?(.*)$', 1), '&'),
                     x -> x <> '' AND NOT regexp_matches(x,
                          '{TRACKING_PARAM_RE}'))), '&'), '') = '' THEN ''
                 ELSE '?' || array_to_string(list_sort(list_filter(
                     str_split(regexp_extract(b0, '\\?(.*)$', 1), '&'),
                     x -> x <> '' AND NOT regexp_matches(x,
                          '{TRACKING_PARAM_RE}'))), '&') END
            END
     FROM r)
    """


def outlinks_oracle_sql(table: str = "documents") -> str:
    """DuckDB replica of the web_outlinks gate query.

    Reconstructs the two kept raw hrefs per doc (post-entity-decode, as
    the tokenizer hands them to the canonicalizer) from the same doc_id
    arithmetic the Spark side bakes into the HTML, then canonicalizes
    with :func:`canonical_url_sql` / :func:`canonical_host_sql` — the
    oracle therefore re-derives BOTH the extraction positions and the
    canonical values independently."""
    href0 = (
        "'HTTP://user:pw@WWW.Example' || CAST(doc_id % 7 AS VARCHAR)"
        " || '.COM:80/d/' || CAST(doc_id AS VARCHAR)"
        " || '?utm_source=x&b=' || CAST(doc_id % 97 AS VARCHAR)"
        " || '&a=1#frag'"
    )
    href1 = (
        "'https://CDN.site.org.:443/p/' || CAST(doc_id AS VARCHAR)"
        " || '?z=&q=2'"
    )
    return f"""
    WITH raw AS (
      SELECT CAST(doc_id AS VARCHAR) AS conv_id, 0 AS link_pos,
             {href0} AS href
      FROM {table}
      UNION ALL
      SELECT CAST(doc_id AS VARCHAR), 1, {href1}
      FROM {table}
    )
    SELECT conv_id, CAST(link_pos AS BIGINT) AS link_pos,
           {canonical_url_sql('href')} AS url_canon,
           {canonical_host_sql('href')} AS host
    FROM raw
    """


def host_stats_oracle_sql(table: str = "documents") -> str:
    """DuckDB replica of the web_host_stats gate query."""
    return f"""
    SELECT host, CAST(count(*) AS BIGINT) AS n_links,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_docs
    FROM ({outlinks_oracle_sql(table)})
    GROUP BY host
    """


def canonical_host_sql(expr: str) -> str:
    """DuckDB replica of :func:`canonical_host_col`."""
    return f"""
    (WITH p AS (
       SELECT trim({expr}) AS u0,
              str_split(regexp_extract(
                  regexp_replace(trim({expr}), '#.*$', ''),
                  '(?i)^https?://([^/?#]*)', 1), '@')[-1] AS a0
     ), r AS (
       SELECT u0,
              regexp_replace(regexp_replace(
                  lower(regexp_extract(a0, '^([^:]*)', 1)),
                  '\\.$', ''), '^www\\.', '') AS h0
       FROM p
     )
     SELECT CASE WHEN regexp_matches(u0, '(?i)^https?://')
                      AND regexp_matches(h0, '^[a-z0-9.-]+$')
                 THEN h0 END
     FROM r)
    """


def crawl_trap_templates(
    urls: DataFrame,
    url_col: str = "url",
    max_urls_per_template: int = 100,
) -> DataFrame:
    """Detect crawl traps: URL templates that explode into huge URL sets.

    Calendars, session ids, faceted search, and pagination generate
    unbounded URL spaces under one *template*; a frontier that cannot
    see the pattern crawls forever.  The template is the canonical
    URL's host + path/query with every digit run collapsed to ``N`` —
    ``/cal/2024/01/05`` and ``/cal/1999/12/31`` share a template, real
    article paths mostly do not.

    Output: one row per (host, template) with ``n_urls`` distinct
    canonical URLs and ``is_trap`` = n_urls > max_urls_per_template —
    the frontier drops or rate-caps trap templates.  Scale shape: the
    template is a codegen regexp over the canonical URL; ONE
    count-distinct aggregate keyed (host, template) — map-side
    combinable, so a million-URL calendar collapses per task; never a
    window or self-join over the frontier.  The canonicalizer runs once
    per row (materialized ``_c``; cheap raw-url keep-filter) — see
    :func:`canonical_ok_col` for why filtering on the computed column
    would clone the chain.
    """
    canon = urls.where(canonical_ok_col(F.col(url_col))).select(
        canonical_url_col(F.col(url_col)).alias("_c")
    )
    keyed = canon.select(
        host_of_canonical_col(F.col("_c")).alias("host"),
        F.regexp_replace(
            F.regexp_replace(F.col("_c"), r"^https?://[^/]*", ""),
            r"[0-9]+",
            "N",
        ).alias("template"),
        "_c",
    )
    return keyed.groupBy("host", "template").agg(
        F.countDistinct("_c").cast("long").alias("n_urls"),
    ).withColumn(
        "is_trap", F.col("n_urls") > F.lit(int(max_urls_per_template))
    )


# ------------------------------------------------------- relative resolution

_DOTDOT_SEG_RE = (
    r"/(\.\.[^/]+|\.[^/.][^/]*|[^/.][^/]*)/\.\./"
)  # a segment that is NOT exactly '.' or '..', followed by '/../'
_DOT_PASSES = 8  # bounded: deeper ./.. nesting resolves to NULL, never wrong


def _remove_dot_segments_col(pq: Column) -> Column:
    """RFC 3986 dot-segment removal over a '/path[?query]' string.

    Bounded at :data:`_DOT_PASSES` nesting levels — a path still
    containing '/./' or '/../' after the passes yields NULL
    (conservative: such URLs are trap-shaped anyway), never a wrong
    resolution.  Pure Column; byte-identical to
    :func:`_remove_dot_segments_sql` (RE2-safe regexes, no lookahead).
    """
    p = F.regexp_replace(pq, r"\?.*$", "")
    q = F.regexp_extract(pq, r"(\?.*)$", 1)
    # RFC: a path ending in '/', '/.' or '/..' resolves WITH the slash
    had_slash = p.endswith("/") | p.endswith("/.") | p.endswith("/..")
    # sentinel slash so trailing '/.' and '/..' match the same patterns;
    # never append onto an existing '/' (that would mint an empty segment)
    w = F.when(p.endswith("/"), p).otherwise(F.concat(p, F.lit("/")))
    for _ in range(_DOT_PASSES):
        w = F.replace(w, F.lit("/./"), F.lit("/"))
    for _ in range(_DOT_PASSES):
        w = F.regexp_replace(w, _DOTDOT_SEG_RE, "/")
    w = F.regexp_replace(w, r"^(/\.\.)+/", "/")
    clean = ~w.contains("/./") & ~w.contains("/../")
    w = F.when(had_slash | (w == F.lit("/")), w).otherwise(
        F.regexp_replace(w, r"/$", "")
    )
    return F.when(clean, F.concat(w, q))


def _resolve_raw_from_parts(
    origin: Column, scheme: Column, bpath: Column, bdir: Column, href: Column
) -> Column:
    """Raw (pre-canonicalization) resolution of ``href`` against
    pre-extracted base parts.  The parts should be bound attributes when
    this runs inside a ``transform`` lambda over an href array — every
    reference below is otherwise a fresh copy of whatever expression
    produced them, per array element."""
    h = F.regexp_replace(F.trim(href), r"#.*$", "")
    return (
        F.when(h.rlike(r"(?i)^https?://"), h)
        .when(h.rlike(r"(?i)^[a-z][a-z0-9+.-]*:"), F.lit(None))
        .when(
            h.startswith("//"), F.concat(scheme, F.lit(":"), h)
        )
        .when(
            h.startswith("/"),
            F.concat(origin, _remove_dot_segments_col(h)),
        )
        .when(h.startswith("?"), F.concat(origin, bpath, h))
        .when(
            h != F.lit(""),
            F.concat(origin, _remove_dot_segments_col(F.concat(bdir, h))),
        )
    )


def _base_parts(base: Column) -> tuple:
    """(origin, scheme, bpath, bdir) of an already-canonical base URL."""
    origin = F.regexp_extract(base, r"^(https?://[^/]*)", 1)
    scheme = F.regexp_extract(base, r"^(https?)://", 1)
    bpath = F.regexp_replace(
        F.regexp_replace(base, r"^https?://[^/]*", ""), r"\?.*$", ""
    )
    bdir = F.regexp_replace(bpath, r"[^/]*$", "")
    return origin, scheme, bpath, bdir


def resolve_href_col(base: Column, href: Column) -> Column:
    """Resolve a raw href against an ALREADY-CANONICAL base URL.

    The outlink extractor keeps absolute http(s) links only; real pages
    are dominated by relative forms.  Supported (then normalized
    through the shared canonicalizer): absolute http(s), scheme-less
    ``//host/...``, root-relative ``/...``, query-only ``?...``, and
    path-relative (incl. ``./`` / ``../`` via bounded dot-segment
    removal).  NULL for: empty/fragment-only hrefs (self-references),
    non-http schemes, and dot-nesting beyond :data:`_DOT_PASSES`
    (conservative, never wrong).  Pure Column.

    SCALAR use only (tests, one-off columns): the trailing
    ``canonical_url_col(resolved)`` re-inlines the ``resolved`` subtree
    at each of the canonicalizer's ~12 argument references, so inside a
    ``transform`` lambda this costs ~12x per element — round 4's
    web_resolved_outlinks burned 12.8 s on exactly that.  Operators
    over href arrays must do what :func:`resolved_outlinks` does:
    raw-resolve per element (:func:`_resolve_raw_from_parts`), then
    canonicalize the element ONCE (``canonical_url_col`` over the
    lambda variable) in a second pass.
    """
    origin, scheme, bpath, bdir = _base_parts(base)
    resolved = _resolve_raw_from_parts(origin, scheme, bpath, bdir, href)
    return canonical_url_col(resolved)


def _remove_dot_segments_sql(expr: str) -> str:
    """DuckDB replica of :func:`_remove_dot_segments_col` (note: DuckDB
    regexp_replace is first-match unless the 'g' flag is passed)."""
    w = ("(CASE WHEN regexp_replace(pq, '\\?.*$', '') LIKE '%/' "
         "THEN regexp_replace(pq, '\\?.*$', '') "
         "ELSE regexp_replace(pq, '\\?.*$', '') || '/' END)")
    for _ in range(_DOT_PASSES):
        w = f"replace({w}, '/./', '/')"
    for _ in range(_DOT_PASSES):
        w = (
            f"regexp_replace({w}, "
            "'/(\\.\\.[^/]+|\\.[^/.][^/]*|[^/.][^/]*)/\\.\\./', '/', 'g')"
        )
    w = f"regexp_replace({w}, '^(/\\.\\.)+/', '/')"
    return f"""
    (WITH d AS (
       SELECT {expr} AS pq
     ), parts AS (
       SELECT pq,
              regexp_replace(pq, '\\?.*$', '') AS p,
              regexp_extract(pq, '(\\?.*)$', 1) AS q,
              {w} AS w
       FROM d
     )
     SELECT CASE WHEN w NOT LIKE '%/./%' AND w NOT LIKE '%/../%' THEN
       (CASE WHEN p LIKE '%/' OR p LIKE '%/.' OR p LIKE '%/..' OR w = '/'
             THEN w
             ELSE regexp_replace(w, '/$', '') END) || q
     END FROM parts)
    """


def resolve_href_sql(base_expr: str, href_expr: str) -> str:
    """DuckDB replica of :func:`resolve_href_col` over SQL expressions
    (compose with ``canonical_url_sql`` for the final normalization).
    Internal aliases are underscore-prefixed so caller expressions named
    b/h do not shadow them."""
    return f"""
    (WITH rh0 AS (
       SELECT {base_expr} AS _rb,
              regexp_replace(trim({href_expr}), '#.*$', '') AS _rh
     ), rh1 AS (
       SELECT _rb, _rh,
              regexp_extract(_rb, '^(https?://[^/]*)', 1) AS _origin,
              regexp_extract(_rb, '^(https?)://', 1) AS _scheme,
              regexp_replace(regexp_replace(_rb, '^https?://[^/]*', ''),
                             '\\?.*$', '') AS _bpath
       FROM rh0
     )
     SELECT CASE
       WHEN regexp_matches(_rh, '(?i)^https?://') THEN _rh
       WHEN regexp_matches(_rh, '(?i)^[a-z][a-z0-9+.-]*:') THEN NULL
       WHEN _rh LIKE '//%' THEN _scheme || ':' || _rh
       WHEN _rh LIKE '/%' THEN _origin || {_remove_dot_segments_sql("_rh")}
       WHEN _rh LIKE '?%' THEN _origin || _bpath || _rh
       WHEN _rh <> '' THEN _origin ||
         {_remove_dot_segments_sql(
             "regexp_replace(_bpath, '[^/]*$', '') || _rh")}
     END FROM rh1)
    """


def resolved_outlinks(
    df: DataFrame,
    id_col: str = "conv_id",
    base_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(id, page url, html) -> one row per RESOLVED outlink.

    Like :func:`outlinks`, but relative hrefs — the majority of real
    pages' links — resolve against the page's canonical URL via
    the :func:`resolve_href_col` semantics before the keep-filter, so
    ``/abs``, ``../up``, ``?query`` and scheme-less ``//host`` links
    all become edges instead of dropping.  ``link_pos`` counts KEPT
    (resolvable AND canonicalizable) links in document order.  Same
    single-ArrowEvalPython / explode_outer plan discipline as outlinks.

    Plan discipline (round-4 fix, pinned in tests/test_plan_guard.py):
    every big expression is materialized exactly once per row —
    1. ``_base`` (the full canonicalizer) and its four derived parts
       are projected columns, referenced as attributes from the lambda;
    2. the per-element work is split into raw resolution (bounded CASE
       + dot-segment chains) and a SECOND ``transform`` whose
       canonicalizer sees only the lambda variable — composing them in
       one lambda (what :func:`resolve_href_col` does) substitutes the
       whole resolution subtree at each of the canonicalizer's ~12
       argument references, a 12x per-element blowup (12.8 s at sf0.1
       in round 4; ~1 s after the split).
    The NULL-keep filter runs per element inside ``F.filter`` (array
    lambdas are not subject to PushDownPredicates cloning), and
    ``host`` derives from the kept canonical scalar with the one-regexp
    :func:`host_of_canonical_col`.
    """
    # r06 kernel: tokenize + resolve + canonicalize now run in ONE Arrow
    # pass (guide §4.2) — the hrefs already came out of Python (the
    # tokenizer), so resolving there costs no new boundary, while the
    # old JVM path paid interpreted per-element dot-segment chains plus
    # the interpreted canonicalizer transform (8.9 s at sf1.0).  The
    # Python resolution/canonicalization replicas are parity-pinned in
    # tests/test_urls.py (and the 72-case urljoin corpus in
    # tests/test_resolve_href.py drives resolve_href_py directly).
    from deepseek_ocr_rs_spark.functions.tokenizer import (
        decode_entities,
        tokenize_html_fast,
    )
    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    id_type = dict(df.dtypes)[id_col]

    def run(batches):
        for pdf in batches:
            ids, poss, canons, hosts = [], [], [], []
            for did, burl, payload in zip(
                pdf[id_col], pdf[base_col], pdf[text_col]
            ):
                base = canonicalize_url_py(burl)
                origin, scheme, bpath, bdir = base_parts_py(base)
                if base is None:
                    # NULL base: the Column regexp_extract over NULL
                    # yields NULL parts; absolute hrefs still resolve
                    origin = scheme = bpath = bdir = None
                pos = 0
                if payload:
                    for ev in tokenize_html_fast(payload):
                        if ev[0] == "open" and ev[1] == "a":
                            href = ev[2].get("href")
                            if not href:
                                continue
                            raw = resolve_raw_py(
                                origin, scheme, bpath, bdir,
                                decode_entities(href),
                            )
                            c = canonicalize_url_py(raw)
                            if c is None:
                                continue
                            ids.append(did)
                            poss.append(pos)
                            canons.append(c)
                            hosts.append(host_of_canonical_py(c))
                            pos += 1
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "link_pos": poss,
                    "url_canon": canons,
                    "host": hosts,
                }
            )

    return rebalance_for_arrow(
        df.select(id_col, base_col, text_col)
    ).mapInPandas(
        run,
        schema=f"{id_col} {id_type}, link_pos int, url_canon string, "
               f"host string",
    )
