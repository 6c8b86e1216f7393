"""Crawl-frontier scheduling: per-host politeness waves with priority order.

A polite crawler fetches at most one URL per host per delay window, so a
frontier of (url, host, priority) rows must be sequenced into per-host
queues: the k-th URL of a host fetches in wave k, and every host's wave-k
URLs can be fetched concurrently by the fleet.  Priority (e.g. the
PageRank prior from operators/linkgraph.py) decides the order WITHIN a
host; ties break on the URL id so the schedule is deterministic.

This is one window over the frontier — a single hash shuffle on host —
plus pure column arithmetic:

* ``wave``   = row_number() over (partition host, order priority desc,
  id asc) - 1,
* ``eta_s``  = wave * per_host_delay_s (when the crawler honors a
  crawl-delay of D seconds per host, the wave-k URL of that host cannot
  start before k*D),
* rows with ``wave >= max_per_host`` are DROPPED (per-host budget cap —
  the megahost defense: a host contributing 10^9 frontier URLs would
  otherwise serialize into a 10^9-deep queue that one executor owns; the
  cap bounds every host's queue at a constant, exactly like the
  bucket caps in operators/dedup.py).

Scale notes (100 TB / 1000 executors): the only exchange is the window's
hash partition on host.  Host cardinality is huge (good spread) but
Zipf-skewed; the cap means the worst partition holds at most
``max_per_host`` rows per hot host AFTER the window, and the window sort
itself is bounded per host by the cap only after ranking — for a truly
adversarial single-host frontier, pre-filter with a groupBy-count salt
or sample; documented rather than hidden (the window must see all of a
host's rows to rank them — that is the semantics, not an accident).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["schedule_frontier"]


def schedule_frontier(
    urls: DataFrame,
    id_col: str = "url_id",
    host_col: str = "host",
    priority_col: str = "priority",
    per_host_delay_s: int = 5,
    max_per_host: int = 1000,
) -> DataFrame:
    """Sequence a frontier into deterministic per-host politeness waves.

    Returns the input columns plus ``wave int`` and ``eta_s bigint``;
    rows beyond ``max_per_host`` per host are dropped.
    """
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(id_col).asc()
    )
    return (
        urls.withColumn("wave", F.row_number().over(w) - F.lit(1))
        .where(F.col("wave") < F.lit(max_per_host))
        .withColumn(
            "eta_s",
            (F.col("wave").cast("long") * F.lit(int(per_host_delay_s))),
        )
    )
