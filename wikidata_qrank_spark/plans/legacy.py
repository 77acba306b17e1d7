"""The reference's old ("qrank") pipeline end-to-end — the golden
semantics of main.go:102-158 (computeQRank):

    monthly pageview logs ─► page keys (formatLine) ─► ⋈ sitelinks
        ─► qviews (per-entity sum) ─► qrank (desc views, asc entity)
        ─► stats JSON

Composes sources/pageviews.py (S2/P1/A2), sources/entities.py (S3/S4),
operators/wiki.qviews_monthly (J1/A4), operators/qrank.qrank (O3),
operators/stats (A8) and operators/sinks (K2/K3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.qrank import qrank
from ..operators.stats import build_stats
from ..operators.wiki import qviews_monthly
from ..sources.entities import sitelinks_from_json
from ..sources.pageviews import monthly_pageviews


def build_qrank_legacy(
    entity_json_lines: DataFrame,
    monthly_log_lines: list[DataFrame],
    stats_top_n: int = 50,
    stats_samples: int = 1000,
) -> dict:
    """Run the whole old pipeline from raw dump lines.

    ``entity_json_lines``: DataFrame of Wikidata entity JSON strings
    (column ``value``) — the latest-all.json dump.
    ``monthly_log_lines``: one DataFrame of raw pageview log lines per
    month (the reference merges 12).

    Returns {'sitelinks', 'qviews', 'qrank', 'stats'} — the first three
    lazy DataFrames, stats a materialized dict.
    """
    sitelinks = sitelinks_from_json(entity_json_lines)

    monthly = None
    for lines in monthly_log_lines:
        mv = monthly_pageviews(lines)
        monthly = mv if monthly is None else monthly.unionByName(mv)
    views = monthly.groupBy("page_key").sum("views").withColumnRenamed(
        "sum(views)", "views"
    )

    qv = qviews_monthly(sitelinks, views)
    qr = qrank(qv)
    stats = build_stats(qr, top_n=stats_top_n, num_samples=stats_samples)
    return {"sitelinks": sitelinks, "qviews": qv, "qrank": qr, "stats": stats}
