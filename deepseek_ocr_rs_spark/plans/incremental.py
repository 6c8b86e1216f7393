"""Incremental extraction: re-extract only what a crawl diff says changed.

The north-rule pipeline is *recurring*: a fresh crawl snapshot arrives,
most pages are byte-identical to the last run, and re-running the
extraction tier (the expensive Arrow-batched HTML/PDF path) over an
unchanged web is the single biggest waste at 100 TB.  This composes the
snapshot-diff discipline (:mod:`~deepseek_ocr_rs_spark.operators.cdx`)
with any extractor so the Python hot path sees ONLY added/changed
pages:

* ``gone``       -> tombstone row (NULL text), nothing extracted;
* ``unchanged``  -> the previous run's stored extraction is *reused*
  (one equi-join against the sink scan — no extractor invocation);
* ``added`` / ``changed`` -> extracted now, and only these rows ever
  enter the extractor's plan (the status filter sits upstream of the
  Arrow/Python node, so Spark never ships unchanged payloads to
  Python workers).

Scale shape: two hash aggregless equi-joins on the page key (digest
diff + stored-text lookup) and one extractor invocation over the
changed fraction.  For a daily recrawl where ~5% of pages change, the
extraction tier does 5% of the work of a full run; everything else is
JVM-side joins.  Resume composability: the stored side is exactly the
sink of the previous run (C1 anti-join discipline,
plans/pipeline.py), so a killed incremental run resumes the same way
a full run does.

Reference analog: restart-safe caching keyed by content digest
(crates/assets/src/lib.rs:248-254) — the same reuse-if-digest-matches
contract, applied per page instead of per model asset.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["incremental_extract"]


def incremental_extract(
    old_digests: DataFrame,
    new_pages: DataFrame,
    stored: DataFrame,
    extractor: Callable[[DataFrame], DataFrame],
    key_col: str = "key",
    digest_col: str = "digest",
    payload_col: str = "payload",
    text_col: str = "text_md",
) -> DataFrame:
    """Diff two snapshots and extract only the changed fraction.

    ``old_digests``: previous snapshot, ``(key, digest)``.
    ``new_pages``:   current snapshot, ``(key, digest, payload)``.
    ``stored``:      previous run's extraction output, ``(key, text_md)``
                     (the sink scan; covers at least the unchanged keys).
    ``extractor``:   maps a DataFrame ``(key, payload)`` -> ``(key,
                     text_md)``; only ever sees added/changed rows.

    Output: ``(key, status string, text_md string, extracted_now
    boolean)`` with status ``added | gone | changed | unchanged``;
    ``text_md`` is NULL for ``gone``.  One row per key in either
    snapshot (keys must be unique per snapshot — dedup captures
    upstream, e.g. with cdx.latest_captures).
    """
    o = old_digests.select(
        F.col(key_col).alias("key"),
        F.col(digest_col).alias("_old_digest"),
    )
    n = new_pages.select(
        F.col(key_col).alias("key"),
        F.col(digest_col).alias("_new_digest"),
        F.col(payload_col).alias("_payload"),
    )
    diff = o.join(n, "key", "full_outer").select(
        "key",
        "_payload",
        F.when(F.col("_old_digest").isNull(), F.lit("added"))
        .when(F.col("_new_digest").isNull(), F.lit("gone"))
        .when(
            F.col("_old_digest") == F.col("_new_digest"), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
        .alias("status"),
    )

    todo = diff.where(F.col("status").isin("added", "changed")).select(
        "key", F.col("_payload").alias(payload_col)
    )
    fresh = extractor(todo).select(
        F.col(key_col).alias("key"), F.col(text_col).alias("_fresh")
    )
    kept = stored.select(
        F.col(key_col).alias("key"), F.col(text_col).alias("_stored")
    )

    out = (
        diff.drop("_payload")
        .join(fresh, "key", "left")
        .join(kept, "key", "left")
    )
    text = (
        F.when(F.col("status") == "gone", F.lit(None).cast("string"))
        .when(F.col("status") == "unchanged", F.col("_stored"))
        .otherwise(F.col("_fresh"))
    )
    return out.select(
        "key",
        "status",
        text.alias(text_col),
        F.col("status").isin("added", "changed").alias("extracted_now"),
    )
