"""Checkpointed, resumable pipeline execution.

Reference semantics: every stage writes its output to a versioned file
and later runs skip stages whose output already exists with an
up-to-date version (pageviews.go:87-93, itemsignals.go:141-152 —
"memoized stage skip", SURVEY.md X2), with output version = max(input
versions) (X3) and atomic tmp-file+rename writes (O-12).

Spark-native realization (no Iceberg jars in this sandbox, so parquet +
a JSON manifest emulates the snapshot log; the API maps 1:1 onto an
Iceberg catalog in production):

* each stage writes parquet to ``<base>/<stage>/data`` via a staging
  dir + atomic rename — partial writes are invisible, identical to the
  reference's tmp-file+rename;
* a manifest JSON per stage records: snapshot_id, version (hash of the
  input versions + params → max-of-inputs semantics), row count, wall
  time, partition count — the per-stage metrics the north rule asks for;
* every checkpointed row carries lineage columns ``_source_partition``
  (the shuffle partition that produced it) and ``_snapshot_id``;
* re-running skips any stage whose manifest version matches and reads
  the parquet back — resumability is per-stage, and within a stage the
  atomic rename makes retries idempotent.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_PARTITION_COL = "_source_partition"
LINEAGE_SNAPSHOT_COL = "_snapshot_id"


@dataclass
class StageResult:
    name: str
    snapshot_id: str
    version: str
    rows: int
    wall_sec: float
    skipped: bool
    path: str


@dataclass
class CheckpointManager:
    spark: SparkSession
    base_dir: str
    results: dict[str, StageResult] = field(default_factory=dict)
    # snapshots kept per stage besides the current one (0 = overwrite
    # in place, the pre-time-travel behavior)
    keep_snapshots: int = 2

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), "manifest.json")

    def _read_manifest(self, name: str) -> dict | None:
        try:
            with open(self._manifest_path(name)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    @staticmethod
    def stage_version(*input_versions: str, params: str = "") -> str:
        """Version = digest of input versions + params (the max-of-input-
        versions rule generalized to content addressing)."""
        h = hashlib.sha256()
        for v in sorted(input_versions):
            h.update(v.encode())
        h.update(params.encode())
        return h.hexdigest()[:16]

    def run_stage(
        self,
        name: str,
        version: str,
        compute: Callable[[], DataFrame],
        sort_within: list[str] | None = None,
        range_partition: list[str] | None = None,
        num_partitions: int | None = None,
        zone_map_cols: list[str] | None = None,
    ) -> DataFrame:
        """Return the stage output, recomputing only when stale.

        ``range_partition`` + ``sort_within`` reproduce the reference's
        sorted-output invariant (repartitionByRange + sortWithinPartitions)
        so downstream merge-style consumers see ordered partitions.
        """
        data_dir = os.path.join(self._stage_dir(name), "data")
        manifest = self._read_manifest(name)
        if manifest and manifest.get("version") == version and os.path.isdir(data_dir):
            df = self.spark.read.parquet(data_dir)
            self.results[name] = StageResult(
                name=name,
                snapshot_id=manifest["snapshot_id"],
                version=version,
                rows=manifest["rows"],
                wall_sec=0.0,
                skipped=True,
                path=data_dir,
            )
            return df

        t0 = time.perf_counter()
        snapshot_id = uuid.uuid4().hex[:12]
        df = compute()
        if range_partition:
            parts = num_partitions or self.spark.sparkContext.defaultParallelism
            df = df.repartitionByRange(parts, *range_partition)
        if sort_within:
            df = df.sortWithinPartitions(*sort_within)
        df = df.withColumn(LINEAGE_PARTITION_COL, F.spark_partition_id()).withColumn(
            LINEAGE_SNAPSHOT_COL, F.lit(snapshot_id)
        )

        staging = os.path.join(self._stage_dir(name), f"_staging_{snapshot_id}")
        df.write.mode("overwrite").parquet(staging)
        # atomic publish: rename staging → data (reference O-12). The
        # displaced snapshot is retired into snapshots/<id> (time
        # travel, Iceberg's snapshot log) instead of deleted; the GC
        # below bounds history to keep_snapshots.
        history = (manifest or {}).get("history", [])
        old = manifest or {}
        old_id = old.get("snapshot_id")
        old_entry = {
            "snapshot_id": old_id,
            "version": old.get("version"),
            "rows": old.get("rows"),
            "created_unix": old.get("created_unix"),
        }
        if self.keep_snapshots > 0 and old_id:
            retired = os.path.join(self._stage_dir(name), "snapshots", old_id)
            if os.path.isdir(data_dir) and os.path.isdir(retired):
                # crash recovery: a prior run retired data/ into
                # snapshots/<old_id>, re-published a new data/, but died
                # before committing its manifest. That data/ is an
                # uncommitted publish no manifest row references —
                # discard it; the genuine <old_id> content already
                # lives under snapshots/.
                shutil.rmtree(data_dir)
                if all(h["snapshot_id"] != old_id for h in history):
                    history = history + [old_entry]
            elif os.path.isdir(data_dir):
                os.makedirs(os.path.dirname(retired), exist_ok=True)
                os.replace(data_dir, retired)
                history = history + [old_entry]
            elif os.path.isdir(retired) and all(
                h["snapshot_id"] != old_id for h in history
            ):
                # crash recovery: a previous run retired data/ but died
                # before writing its manifest — adopt the orphaned
                # snapshot into history so it stays readable and GC-able
                history = history + [old_entry]
        elif os.path.isdir(data_dir):
            shutil.rmtree(data_dir)
        expired = history[: -self.keep_snapshots] if self.keep_snapshots else history
        for e in expired:
            shutil.rmtree(
                os.path.join(self._stage_dir(name), "snapshots", e["snapshot_id"]),
                ignore_errors=True,
            )
        history = history[-self.keep_snapshots :] if self.keep_snapshots else []
        os.replace(staging, data_dir)

        out = self.spark.read.parquet(data_dir)
        rows = out.count()
        zone_maps = (
            self._collect_zone_maps(data_dir, zone_map_cols)
            if zone_map_cols
            else None
        )
        wall = time.perf_counter() - t0
        os.makedirs(self._stage_dir(name), exist_ok=True)
        with open(self._manifest_path(name), "w") as f:
            json.dump(
                {
                    "stage": name,
                    "snapshot_id": snapshot_id,
                    "version": version,
                    "rows": rows,
                    "wall_sec": round(wall, 3),
                    "partitions": out.rdd.getNumPartitions(),
                    "created_unix": time.time(),
                    "history": history,
                    **({"zone_maps": zone_maps} if zone_maps else {}),
                },
                f,
                indent=2,
            )
        self.results[name] = StageResult(
            name=name,
            snapshot_id=snapshot_id,
            version=version,
            rows=rows,
            wall_sec=wall,
            skipped=False,
            path=data_dir,
        )
        return out

    def _collect_zone_maps(self, data_dir: str, cols: list[str]) -> dict:
        """Per-file min/max for the zone-map columns — Iceberg's
        manifest column stats, emulated. Read straight from the parquet
        footers (driver-side metadata only, no second table scan), and
        keyed by path RELATIVE to the stage data dir so a relocated or
        copied checkpoint directory keeps pruning correctly. For stages
        written with ``range_partition`` + ``sort_within`` the zones
        are non-overlapping, so point/range reads prune to O(1) files."""
        import pyarrow.parquet as pq

        out: dict[str, dict[str, list]] = {c: {} for c in cols}
        for fname in sorted(os.listdir(data_dir)):
            if not fname.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(data_dir, fname))
            names = list(md.schema.names)
            for c in cols:
                idx = names.index(c)
                mn = mx = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        # a row group without stats makes the file
                        # un-prunable for this column
                        mn = mx = None
                        break
                    lo, hi = st.min, st.max
                    if isinstance(lo, bytes):
                        try:
                            lo, hi = lo.decode(), hi.decode()
                        except UnicodeDecodeError:
                            # non-UTF8 binary column: un-prunable for
                            # this file rather than aborting the stage
                            # publish after data/ is already written
                            mn = mx = None
                            break
                    mn = lo if mn is None else min(mn, lo)
                    mx = hi if mx is None else max(mx, hi)
                out[c][fname] = [mn, mx]
        return out

    def snapshots(self, name: str) -> list[dict]:
        """Snapshot log for a stage: retired snapshots (oldest first)
        plus the current one, each with id/version/rows/timestamp."""
        manifest = self._read_manifest(name)
        if manifest is None:
            return []
        current = {
            "snapshot_id": manifest["snapshot_id"],
            "version": manifest["version"],
            "rows": manifest["rows"],
            "created_unix": manifest["created_unix"],
        }
        return list(manifest.get("history", [])) + [current]

    def read_snapshot(self, name: str, snapshot_id: str) -> DataFrame:
        """Time travel: read a stage AS OF a snapshot — the current one
        or any retired snapshot still within keep_snapshots."""
        manifest = self._read_manifest(name) or {}
        data_dir = os.path.join(self._stage_dir(name), "data")
        if manifest.get("snapshot_id") == snapshot_id and os.path.isdir(data_dir):
            return self.spark.read.parquet(data_dir)
        # current-per-manifest but data/ missing (crash between retire
        # and manifest write) falls through to the retired location
        retired = os.path.join(self._stage_dir(name), "snapshots", snapshot_id)
        if not os.path.isdir(retired):
            known = [s["snapshot_id"] for s in self.snapshots(name)]
            raise FileNotFoundError(
                f"stage {name!r} has no snapshot {snapshot_id!r} "
                f"(known: {known})"
            )
        return self.spark.read.parquet(retired)

    def read_pruned(self, name: str, col: str, lo, hi) -> DataFrame:
        """Read a checkpointed stage restricted to ``col ∈ [lo, hi]``,
        skipping every data file whose zone [min, max] misses the
        range — manifest-level data skipping on top of parquet's own
        row-group pruning. Falls back to a full filtered scan when the
        stage has no zone map for ``col``."""
        data_dir = os.path.join(self._stage_dir(name), "data")
        manifest = self._read_manifest(name) or {}
        zm = (manifest.get("zone_maps") or {}).get(col)
        pred = (F.col(col) >= lo) & (F.col(col) <= hi)
        # no zone map — or an EMPTY one (footer collection found no
        # flat parquet files, e.g. a nested layout): fall back to the
        # full filtered scan rather than silently pruning to nothing
        if not zm:
            return self.spark.read.parquet(data_dir).filter(pred)
        files = [
            # manifests written before round 4 stored absolute paths;
            # relative entries (current format) survive a relocated
            # checkpoint dir
            f if os.path.isabs(f) else os.path.join(data_dir, f)
            for f, (mn, mx) in zm.items()
            # no stats → can't prune, keep the file; the row filter
            # still applies
            if mn is None or mx is None or not (mx < lo or mn > hi)
        ]
        if not files:
            return self.spark.read.parquet(data_dir).filter(pred).limit(0)
        return self.spark.read.parquet(*files).filter(pred)

    def metrics(self) -> dict:
        return {
            name: {
                "rows": r.rows,
                "wall_sec": round(r.wall_sec, 3),
                "skipped": r.skipped,
                "snapshot_id": r.snapshot_id,
            }
            for name, r in self.results.items()
        }


def build_checkpointed(
    spark: SparkSession, sf_dir: str, base_dir: str, code_version: str = "v1"
) -> dict[str, DataFrame]:
    """The KG pipeline with per-stage checkpoints. Re-running with the
    same inputs skips every stage; changing ``code_version`` or the
    input dir invalidates downstream stages."""
    from ..operators.linking import canonical_dictionary
    from ..operators.links import triples
    from ..operators.mentions import media_mentions, text_mentions
    from ..operators.qrank import qrank, qviews
    from ..operators.signals import item_signals
    from ..sources.interleaved import dictionary, redirects, spans
    from ..sources.tables import load_table

    mgr = CheckpointManager(spark, base_dir)
    input_version = f"{sf_dir}:{code_version}"

    documents = load_table(spark, sf_dir, "documents")

    v_spans = CheckpointManager.stage_version(input_version, params="spans")
    sp = mgr.run_stage("spans", v_spans, lambda: spans(documents))

    v_dict = CheckpointManager.stage_version(input_version, params="cdict")
    cdict = mgr.run_stage(
        "canonical_dictionary",
        v_dict,
        lambda: canonical_dictionary(dictionary(documents), redirects(dictionary(documents))),
    )

    v_tm = CheckpointManager.stage_version(v_spans, v_dict, params="text_mentions")
    tm = mgr.run_stage(
        "text_mentions",
        v_tm,
        lambda: text_mentions(sp, cdict),
        range_partition=["doc_id"],
        sort_within=["doc_id", "offset"],
        zone_map_cols=["doc_id"],
    )
    v_mm = CheckpointManager.stage_version(v_spans, v_dict, params="media_mentions")
    mm = mgr.run_stage("media_mentions", v_mm, lambda: media_mentions(sp, cdict))

    v_qv = CheckpointManager.stage_version(v_tm, params="qviews")
    qv = mgr.run_stage("qviews", v_qv, lambda: qviews(tm.drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL)))

    v_qr = CheckpointManager.stage_version(v_qv, params="qrank")
    qr = mgr.run_stage(
        "qrank", v_qr, lambda: qrank(qv.drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL))
    )

    v_tr = CheckpointManager.stage_version(v_tm, params="triples")
    tr = mgr.run_stage(
        "triples",
        v_tr,
        lambda: triples(tm.drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL)),
        range_partition=["src_id", "dst_id"],
        sort_within=["src_id", "dst_id"],
    )

    v_is = CheckpointManager.stage_version(v_tm, v_mm, v_dict, params="item_signals")
    sig = mgr.run_stage(
        "item_signals",
        v_is,
        lambda: item_signals(
            tm.drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL),
            mm.drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL),
            documents,
            cdict.drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL),
        ),
    )

    return {
        "manager": mgr,
        "spans": sp,
        "canonical_dictionary": cdict,
        "text_mentions": tm,
        "media_mentions": mm,
        "qviews": qv,
        "qrank": qr,
        "triples": tr,
        "item_signals": sig,
    }
