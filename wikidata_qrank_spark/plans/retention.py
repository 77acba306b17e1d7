"""Versioned-artifact retention — X4 semantics (cleanup.go:37-83) and
the keep-last-N GC of per-site files (build.go:60-116).

The reference deletes cached artifacts more than a month older than the
latest successful run and keeps the newest three versions per dataset.
Artifacts here are directories named ``<stage>-<YYYYMMDD>`` (the
reference's version-by-filename convention).
"""

from __future__ import annotations

import os
import re
import shutil
from datetime import date, timedelta

_VERSIONED = re.compile(r"^(?P<stem>.+)-(?P<ymd>\d{8})$")


def cleanup_versions(
    base_dir: str,
    latest_success: date,
    keep_last: int = 3,
    max_age_days: int = 31,
) -> list[str]:
    """Delete versioned artifact dirs/files that are (a) not among the
    newest ``keep_last`` for their stem AND (b) older than
    ``max_age_days`` before ``latest_success``. Returns deleted paths.
    """
    if not os.path.isdir(base_dir):
        return []
    by_stem: dict[str, list[tuple[str, str]]] = {}
    for name in os.listdir(base_dir):
        m = _VERSIONED.match(name)
        if m:
            by_stem.setdefault(m.group("stem"), []).append((m.group("ymd"), name))
    cutoff = (latest_success - timedelta(days=max_age_days)).strftime("%Y%m%d")
    deleted = []
    for stem, versions in by_stem.items():
        versions.sort(reverse=True)
        for ymd, name in versions[keep_last:]:
            if ymd < cutoff:
                path = os.path.join(base_dir, name)
                if os.path.isdir(path):
                    shutil.rmtree(path)
                else:
                    os.remove(path)
                deleted.append(path)
    return sorted(deleted)
