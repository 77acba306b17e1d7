"""The user-facing full build: checkpoints → stats → published artifacts."""

from __future__ import annotations

import glob
import gzip
import json
from datetime import date

from tests.conftest import SF_SMOKE
from wikidata_qrank_spark.plans.pipeline import run_full_build
from wikidata_qrank_spark.plans.publish import latest_artifact


def test_run_full_build(spark, tmp_path):
    out = str(tmp_path / "public")
    ckpt = str(tmp_path / "ckpt")
    res = run_full_build(spark, SF_SMOKE, out, ckpt, version=date(2024, 3, 1))
    assert set(res["outputs"]) == {"qrank", "item_signals", "qrank-stats"}
    assert res["metrics"]["qrank"]["rows"] == 19

    qr_path = latest_artifact(out, "qrank")
    (csv_file,) = glob.glob(qr_path + "/part-*.csv.gz")
    lines = gzip.open(csv_file, "rt").read().splitlines()
    assert lines[0] == "Entity,QRank"
    assert len(lines) == 20
    # ordered desc by rank value
    vals = [int(l.split(",")[1]) for l in lines[1:]]
    assert vals == sorted(vals, reverse=True)

    stats = json.load(open(latest_artifact(out, "qrank-stats")))
    assert stats["Samples"][0][1] == 1

    # resume: everything skipped
    res2 = run_full_build(spark, SF_SMOKE, out, ckpt, version=date(2024, 3, 2))
    assert all(m["skipped"] for m in res2["metrics"].values())
    assert latest_artifact(out, "qrank").endswith("qrank-20240302.csv")
