"""spark-submit --py-files deployment test — the north rule's run shape:
package the engine as a zip, ship it via --py-files, run the full build
through the real spark-submit launcher (local master standing in for
the cluster manager)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMOKE = "/root/testdata/sf0.001"


def _build_zip(path: str) -> None:
    pkg = os.path.join(REPO, "wikidata_qrank_spark")
    with zipfile.ZipFile(path, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_full_build(tmp_path):
    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("spark-submit launcher not present")
    zip_path = str(tmp_path / "wqs.zip")
    _build_zip(zip_path)

    # run from a scratch cwd so only the --py-files zip provides the package
    workdir = tmp_path / "cwd"
    workdir.mkdir()
    script = str(tmp_path / "run_build.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_build.py"), script)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            script,
            "--input", SF_SMOKE,
            "--out", str(tmp_path / "pub"),
            "--checkpoint", str(tmp_path / "ckpt"),
        ],
        capture_output=True,
        text=True,
        cwd=str(workdir),
        env=env,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    payload = None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            payload = json.loads(line)
    assert payload is not None, out.stdout[-2000:]
    assert set(payload["outputs"]) == {"qrank", "item_signals", "qrank-stats"}
    for path in payload["outputs"].values():
        assert os.path.exists(path)
    assert payload["n_samples"] > 0


def test_spark_submit_dumps_mode(tmp_path):
    """The same launcher pointed at a RAW DUMPS TREE (--dumps): the
    day-one path of a reference user, through real spark-submit, ending
    in the exact TestBuild golden CSV."""
    import glob
    import gzip

    from tests.dumps_fixture import EXPECTED_ITEM_SIGNALS, write_dumps_tree

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("spark-submit launcher not present")
    zip_path = str(tmp_path / "wqs.zip")
    _build_zip(zip_path)
    dumps = write_dumps_tree(tmp_path)
    workdir = tmp_path / "cwd"
    workdir.mkdir()
    script = str(tmp_path / "run_build.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_build.py"), script)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            script,
            "--dumps", dumps,
            "--out", str(tmp_path / "pub"),
        ],
        capture_output=True,
        text=True,
        cwd=str(workdir),
        env=env,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    part = glob.glob(str(tmp_path / "pub" / "item_signals.csv" / "part-*.csv.gz"))
    assert len(part) == 1
    with gzip.open(part[0], "rt", encoding="utf-8") as f:
        assert f.read().splitlines() == EXPECTED_ITEM_SIGNALS
