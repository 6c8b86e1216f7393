"""Plan-size guard: the URL canonicalizer must never re-inline.

Round-4 post-mortem (VERDICT r04 items 2/3): Catalyst SUBSTITUTES alias
expressions — it does not share them — in three places that silently
multiply a big expression tree:

  1. passing a big Column into a helper that references its argument
     k times (surt_key_col over canonical_url_col: 4x),
  2. ``where(computed.isNotNull())`` — PushDownPredicates clones the
     producing chain into a pre-projection filter (~70 copies of the
     input expression in web_surt_latest's round-4 plan),
  3. composing two big expressions inside one ``transform`` lambda
     (resolve+canonicalize: the resolved subtree lands at each of the
     canonicalizer's ~12 argument references, per array element).

Results stay correct; only cost explodes (26 s / 100k rows).  This
guard pins the fixed shapes: the tracking-param regex (sentinel
``gbraid``) appears exactly twice PER canonicalizer instance (the
query-param filter is referenced twice within one instance), so each
query's optimized plan must show 2 x (its legitimate instance count).
A regression to argument-substitution or filter-cloning multiplies the
count well past the pin.

Measured pins (sf0.001, Spark 4.1): see _PINS.  If you intentionally
add a canonicalizer instance to a query, raise its pin by 2 and say
why in the query docstring.
"""

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
SENTINEL = "gbraid"  # unique to TRACKING_PARAM_RE; 2 hits per instance

# query -> (max sentinel hits in optimized plan, expected instances)
_PINS = {
    "web_surt_latest": 2,        # 1: materialized _url
    "web_crawl_diff": 4,         # 2: one per snapshot
    "web_crawl_traps": 6,        # 3: one per union branch
    "web_resolved_outlinks": 4,  # 2: base + per-element scalar
    "web_outlinks": 2,           # 1: per-element scalar
    "web_host_stats": 2,         # 1: via outlinks
    "web_anchor_texts": 2,       # 1
    "web_anchor_stats": 4,       # 2 (texts + per-host rollup branch)
    "web_page_metadata": 2,      # 1: og_url canonicalization
    "web_recrawl_policy": 4,     # 2: diff of two snapshots
}


@pytest.mark.parametrize("name", sorted(_PINS))
def test_canonicalizer_not_reinlined(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    got = plan.count(SENTINEL)
    assert got <= _PINS[name], (
        f"{name}: canonicalizer sentinel appears {got}x in the optimized "
        f"plan (pin {_PINS[name]}) — an alias got re-inlined; see module "
        "docstring for the three known substitution traps"
    )


def test_resolved_outlinks_single_python_pass(spark):
    """Tokenize+resolve+canonicalize run as ONE Python pass per row — a
    non-outer explode or a filter referencing a UDF column doubles it
    (memory: spark-plan-pitfalls #1).  The pass is a MapInPandas since the
    fused resolve landed; count every Python-eval node kind so a second
    boundary of ANY flavor trips the guard."""
    df = entry_mod.queries()["web_resolved_outlinks"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_python = (
        plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("MapInPandas")
        + plan.count("MapInArrow")
    )
    assert n_python == 1
