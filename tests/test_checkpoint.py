"""Resumability: stage skip, lineage columns, atomicity, invalidation."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wikidata_qrank_spark.plans.checkpoint import (
    LINEAGE_PARTITION_COL,
    LINEAGE_SNAPSHOT_COL,
    CheckpointManager,
    build_checkpointed,
)


def test_full_pipeline_checkpoints_and_skips(spark, tmp_path):
    base = str(tmp_path / "ckpt")
    g1 = build_checkpointed(spark, SF_SMOKE, base)
    m1 = g1["manager"].metrics()
    assert all(not v["skipped"] for v in m1.values())
    assert m1["qrank"]["rows"] == 19

    # second run: every stage skipped, same snapshot ids (no recompute)
    g2 = build_checkpointed(spark, SF_SMOKE, base)
    m2 = g2["manager"].metrics()
    assert all(v["skipped"] for v in m2.values())
    assert {k: v["snapshot_id"] for k, v in m1.items()} == {
        k: v["snapshot_id"] for k, v in m2.items()
    }
    # results identical
    r1 = {(r.item, r.views, r.rank) for r in g1["qrank"].drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL).collect()}
    r2 = {(r.item, r.views, r.rank) for r in g2["qrank"].drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL).collect()}
    assert r1 == r2


def test_code_version_invalidates(spark, tmp_path):
    base = str(tmp_path / "ckpt2")
    g1 = build_checkpointed(spark, SF_SMOKE, base, code_version="v1")
    g2 = build_checkpointed(spark, SF_SMOKE, base, code_version="v2")
    m2 = g2["manager"].metrics()
    assert all(not v["skipped"] for v in m2.values())


def test_lineage_columns_present(spark, tmp_path):
    base = str(tmp_path / "ckpt3")
    g = build_checkpointed(spark, SF_SMOKE, base)
    cols = g["triples"].columns
    assert LINEAGE_PARTITION_COL in cols and LINEAGE_SNAPSHOT_COL in cols
    snap = g["triples"].select(LINEAGE_SNAPSHOT_COL).distinct().collect()
    assert len(snap) == 1
    manifest = json.load(open(os.path.join(base, "triples", "manifest.json")))
    assert snap[0][0] == manifest["snapshot_id"]
    # per-partition lineage matches actual partitioning
    nparts = g["triples"].select(LINEAGE_PARTITION_COL).distinct().count()
    assert nparts >= 1


def test_sorted_checkpoint_partitions(spark, tmp_path):
    """triples checkpoint is range-partitioned + sorted within partitions
    (the reference's sorted-file invariant)."""
    base = str(tmp_path / "ckpt4")
    g = build_checkpointed(spark, SF_SMOKE, base)
    df = g["triples"].select("src_id", "dst_id", LINEAGE_PARTITION_COL)

    def check_sorted(it):
        prev = None
        for row in it:
            cur = (row.src_id, row.dst_id)
            if prev is not None and cur < prev:
                yield ("unsorted",)
            prev = cur

    bad = df.rdd.mapPartitions(check_sorted).count()
    assert bad == 0


def test_stage_version_digest():
    a = CheckpointManager.stage_version("x", "y", params="p")
    assert a == CheckpointManager.stage_version("y", "x", params="p")
    assert a != CheckpointManager.stage_version("x", "y", params="q")
    assert a != CheckpointManager.stage_version("x", params="p")


def test_zone_map_pruned_read(spark, tmp_path):
    """Manifest zone maps + read_pruned: same rows as the full filtered
    scan, strictly fewer files touched (the stage is range-partitioned
    on the zone column, so zones are non-overlapping), empty range →
    empty result, and a column without a zone map falls back to the
    full scan."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.plans.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path / "ckpt"))
    df = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    mgr.run_stage(
        "tbl",
        "v1",
        lambda: df,
        range_partition=["k"],
        sort_within=["k"],
        num_partitions=8,
        zone_map_cols=["k"],
    )
    manifest_zm = mgr._read_manifest("tbl")["zone_maps"]["k"]
    assert len(manifest_zm) >= 4  # multiple files with tracked zones

    full = spark.read.parquet(str(tmp_path / "ckpt" / "tbl" / "data"))
    want = {r.k for r in full.filter((F.col("k") >= 100) & (F.col("k") <= 300)).collect()}
    pruned_df = mgr.read_pruned("tbl", "k", 100, 300)
    assert {r.k for r in pruned_df.collect()} == want
    touched = {r[0] for r in pruned_df.select(F.input_file_name()).distinct().collect()}
    assert len(touched) < len(manifest_zm)  # files actually skipped

    assert mgr.read_pruned("tbl", "k", 50_000, 60_000).count() == 0
    # no zone map for v → fallback full scan, same answer
    assert mgr.read_pruned("tbl", "v", 300, 900).count() == full.filter(
        (F.col("v") >= 300) & (F.col("v") <= 900)
    ).count()


def test_snapshot_time_travel(spark, tmp_path):
    """Publishing v2/v3 retires the prior snapshot instead of deleting
    it: read_snapshot returns each historical dataset exactly, the
    snapshot log lists them oldest-first, and keep_snapshots bounds
    history (the oldest dir is GC'd on the 4th publish)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.plans.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path / "tt"), keep_snapshots=2)
    ids = {}
    for v, n in [("v1", 10), ("v2", 20), ("v3", 30)]:
        mgr.run_stage(
            "tbl", v, lambda n=n: spark.range(n).select(F.col("id").alias("k"))
        )
        ids[v] = mgr.results["tbl"].snapshot_id

    log = mgr.snapshots("tbl")
    assert [s["snapshot_id"] for s in log] == [ids["v1"], ids["v2"], ids["v3"]]
    assert mgr.read_snapshot("tbl", ids["v1"]).count() == 10
    assert mgr.read_snapshot("tbl", ids["v2"]).count() == 20
    assert mgr.read_snapshot("tbl", ids["v3"]).count() == 30

    mgr.run_stage("tbl", "v4", lambda: spark.range(40).select(F.col("id").alias("k")))
    assert mgr.read_snapshot("tbl", ids["v3"]).count() == 30  # still kept
    with _pytest.raises(FileNotFoundError):
        mgr.read_snapshot("tbl", ids["v1"])  # GC'd past keep_snapshots


def test_keep_snapshots_zero_overwrites(spark, tmp_path):
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.plans.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path / "ow"), keep_snapshots=0)
    mgr.run_stage("tbl", "v1", lambda: spark.range(5).select(F.col("id").alias("k")))
    mgr.run_stage("tbl", "v2", lambda: spark.range(6).select(F.col("id").alias("k")))
    assert mgr.snapshots("tbl")[-1]["rows"] == 6
    assert len(mgr.snapshots("tbl")) == 1


def test_snapshot_crash_recovery_between_retire_and_manifest(spark, tmp_path):
    """Simulate a crash after the old data dir was retired but before
    the new manifest landed: the next run adopts the orphaned snapshot
    into history (still readable, still GC-able) and read_snapshot
    falls back to the retired dir while data/ is missing."""
    import os

    from pyspark.sql import functions as F

    from wikidata_qrank_spark.plans.checkpoint import CheckpointManager

    base = str(tmp_path / "crash")
    mgr = CheckpointManager(spark, base, keep_snapshots=2)
    mgr.run_stage("tbl", "v1", lambda: spark.range(10).select(F.col("id").alias("k")))
    v1_id = mgr.results["tbl"].snapshot_id

    # crash simulation: retire data/ exactly as the publish path would,
    # then "die" before the manifest write
    data_dir = os.path.join(base, "tbl", "data")
    retired = os.path.join(base, "tbl", "snapshots", v1_id)
    os.makedirs(os.path.dirname(retired), exist_ok=True)
    os.replace(data_dir, retired)

    # reads of the manifest-current snapshot fall back to the retired dir
    assert mgr.read_snapshot("tbl", v1_id).count() == 10

    # the next publish adopts the orphan into history
    mgr.run_stage("tbl", "v2", lambda: spark.range(20).select(F.col("id").alias("k")))
    ids = [s["snapshot_id"] for s in mgr.snapshots("tbl")]
    assert ids[0] == v1_id and len(ids) == 2
    assert mgr.read_snapshot("tbl", v1_id).count() == 10


def test_crash_recovery_publish_before_manifest(spark, tmp_path):
    """The other crash window: a run retired data/ into snapshots/<id>,
    re-published a NEW data/, then died before committing its manifest.
    The next recompute must not os.replace onto the non-empty retired
    dir (ENOTEMPTY); it discards the uncommitted publish (no manifest
    row references it) and keeps the genuine retired snapshot."""
    import os

    from pyspark.sql import functions as F

    from wikidata_qrank_spark.plans.checkpoint import CheckpointManager

    base = str(tmp_path / "crash2")
    mgr = CheckpointManager(spark, base, keep_snapshots=2)
    mgr.run_stage("tbl", "v1", lambda: spark.range(10).select(F.col("id").alias("k")))
    v1_id = mgr.results["tbl"].snapshot_id

    # crash simulation: retire data/ under its manifest id, then write
    # an imposter "new publish" at data/ whose manifest never landed
    data_dir = os.path.join(base, "tbl", "data")
    retired = os.path.join(base, "tbl", "snapshots", v1_id)
    os.makedirs(os.path.dirname(retired), exist_ok=True)
    os.replace(data_dir, retired)
    spark.range(15).select(F.col("id").alias("k")).write.parquet(data_dir)

    # recompute succeeds (no ENOTEMPTY wedge), v1 stays readable with
    # its original content, and the orphan publish is gone
    mgr.run_stage("tbl", "v2", lambda: spark.range(20).select(F.col("id").alias("k")))
    assert mgr.results["tbl"].rows == 20
    assert mgr.read_snapshot("tbl", v1_id).count() == 10
    ids = [s["snapshot_id"] for s in mgr.snapshots("tbl")]
    assert ids[0] == v1_id and len(ids) == 2


def test_zone_map_survives_relocated_checkpoint(spark, tmp_path):
    """Zone maps are stored relative to the stage data dir (derived
    from parquet footers, no second scan), so copying or moving the
    whole checkpoint tree keeps read_pruned working."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from wikidata_qrank_spark.plans.checkpoint import CheckpointManager

    src = str(tmp_path / "orig")
    mgr = CheckpointManager(spark, src)
    df = spark.range(10_000).select(F.col("id").alias("k"))
    mgr.run_stage(
        "tbl", "v1", lambda: df,
        range_partition=["k"], sort_within=["k"],
        num_partitions=8, zone_map_cols=["k"],
    )
    zm = mgr._read_manifest("tbl")["zone_maps"]["k"]
    assert all(not os.path.isabs(f) for f in zm)  # relative entries

    dst = str(tmp_path / "moved")
    shutil.move(src, dst)
    mgr2 = CheckpointManager(spark, dst)
    pruned = mgr2.read_pruned("tbl", "k", 100, 300)
    assert {r.k for r in pruned.collect()} == set(range(100, 301))
    touched = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert len(touched) < len(zm)  # still skips files after the move
