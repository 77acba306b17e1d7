from __future__ import annotations

import os
from datetime import date

from wikidata_qrank_spark.plans.retention import cleanup_versions


def test_cleanup_versions(tmp_path):
    base = str(tmp_path)
    names = [
        "pageviews-20240101", "pageviews-20240201", "pageviews-20240301",
        "pageviews-20240401", "pageviews-20230101",
        "qviews-20230601",
        "unversioned.txt",
    ]
    for n in names:
        os.makedirs(os.path.join(base, n), exist_ok=True) if "." not in n else open(
            os.path.join(base, n), "w"
        ).close()
    deleted = cleanup_versions(base, latest_success=date(2024, 4, 1), keep_last=3)
    # newest 3 pageviews kept; 20240101 old enough + beyond keep_last → deleted;
    # 20230101 also deleted; qviews has only 1 version → kept; unversioned kept
    assert [os.path.basename(d) for d in deleted] == [
        "pageviews-20230101", "pageviews-20240101",
    ]
    assert os.path.exists(os.path.join(base, "qviews-20230601"))
    assert os.path.exists(os.path.join(base, "unversioned.txt"))
