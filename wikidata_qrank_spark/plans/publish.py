"""Publish/read layer — the webserver-equivalent surface (§3.3).

The reference's entire query API is bulk file download of the latest
``public/<basename>-YYYYMMDD.<ext>`` artifact with conditional GET
(cmd/webserver/storage.go:71-233). The Spark-native equivalent is a
date-stamped artifact directory plus a latest-per-basename resolver —
no server needed for parity (SURVEY.md §3.3).
"""

from __future__ import annotations

import os
import re
from datetime import date

from pyspark.sql import DataFrame

from ..operators.sinks import write_item_signals_csv, write_qrank_csv
from ..operators.stats import write_stats_json

_STAMPED = re.compile(r"^(?P<base>.+)-(?P<ymd>\d{8})(?P<ext>\.[^.]*)?$")


def publish(
    out_dir: str,
    version: date,
    qrank_df: DataFrame | None = None,
    item_signals_df: DataFrame | None = None,
    stats: dict | None = None,
) -> dict[str, str]:
    """Write the public artifacts with the reference's naming scheme.
    Returns basename → path."""
    os.makedirs(out_dir, exist_ok=True)
    ymd = version.strftime("%Y%m%d")
    written: dict[str, str] = {}
    if qrank_df is not None:
        path = os.path.join(out_dir, f"qrank-{ymd}.csv")
        write_qrank_csv(qrank_df, path)
        written["qrank"] = path
    if item_signals_df is not None:
        path = os.path.join(out_dir, f"item_signals-{ymd}.csv")
        write_item_signals_csv(item_signals_df, path)
        written["item_signals"] = path
    if stats is not None:
        path = os.path.join(out_dir, f"qrank-stats-{ymd}.json")
        write_stats_json(stats, path)
        written["qrank-stats"] = path
    return written


def latest_artifact(out_dir: str, basename: str) -> str | None:
    """Pick the newest dated artifact for ``basename`` (storage.go:71-173
    Reload semantics: max version per basename)."""
    best: tuple[str, str] | None = None
    if not os.path.isdir(out_dir):
        return None
    for name in os.listdir(out_dir):
        m = _STAMPED.match(name)
        if m and m.group("base") == basename:
            if best is None or m.group("ymd") > best[0]:
                best = (m.group("ymd"), name)
    return os.path.join(out_dir, best[1]) if best else None
