"""Stats sampling — A8 semantics (cmd/qrank-builder/stats.go:20-139).

The reference samples the rank/value curve for a dashboard: keep the
top-N ranks, the median, and any point that moved ≥ 4px in scaled
(linear-rank × log10-value) space; the last row (minimum value) always
replaces the final sample. Golden: stats_test.go:15-55.

The pass is inherently sequential over the rank-sorted list, carrying
(lastX, lastY) state — a classic driver-side finish: the qrank table is
already aggregated (≤ tens of millions of rows; 27.3M in production,
doc/design.md:96-101), and only (id, value) per row is streamed via
``toLocalIterator``, so driver memory stays O(numSamples). At larger
cardinalities the same kernel runs as a single-partition mapPartitions
over the range-sorted table.
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterable, Iterator

from pyspark.sql import DataFrame


def build_stats_from_rows(
    rows: Iterable[tuple[str, int]], num_ranks: int, top_n: int, num_samples: int
) -> dict:
    """Sampling kernel over (id, value) rows in rank order (1-based)."""
    median_rank = num_ranks // 2 + 1
    sampling_distance_sq = 4.0 * 4.0
    scale_x = float(num_samples) / float(num_ranks)
    scale_y = 0.0
    samples: list[list] = []
    median = 0
    last_x = last_y = 0.0
    rank = 0
    item_id, value = "", 0
    for item_id, value in rows:
        rank += 1
        if rank == 1:
            top_log = math.log10(float(value))
            # Go float semantics: x/0 → +Inf (max value 1 → log10 = 0);
            # downstream 0×Inf → NaN → 'near' comparisons are False
            scale_y = float(num_samples) / top_log if top_log != 0.0 else math.inf
        x = rank * scale_x
        y = math.log10(float(value)) * scale_y if value > 0 else 0.0
        distance = (x - last_x) ** 2 + (y - last_y) ** 2
        near = distance < sampling_distance_sq
        if rank == median_rank:
            if near and len(samples) > top_n:
                samples.pop()
            median = len(samples)
        if not near or rank <= top_n or rank == median_rank:
            samples.append([item_id, rank, value])
            last_x, last_y = x, y
    if samples:
        samples[-1] = [item_id, rank, value]
    return {"Median": median, "Samples": samples}


def build_stats(qrank_df: DataFrame, top_n: int = 50, num_samples: int = 1000) -> dict:
    """qrank_df: (item, views, rank) — consumed in rank order."""
    num_ranks = qrank_df.count()
    ordered = qrank_df.orderBy("rank").select("item", "views")

    def rows() -> Iterator[tuple[str, int]]:
        for r in ordered.toLocalIterator():
            yield r["item"], r["views"]

    return build_stats_from_rows(rows(), num_ranks, top_n, num_samples)


def build_stats_distributed(
    qrank_df: DataFrame, top_n: int = 50, num_samples: int = 1000
) -> dict:
    """Executor-side form of ``build_stats``: the identical sampling
    kernel runs as ONE mapInPandas task over the range-sorted table
    instead of streaming every row through the driver — the driver
    receives only the O(num_samples) result. The pass is inherently
    sequential (carries (lastX, lastY) state), so a single task is the
    correct physical shape at any scale; what matters is that the full
    qrank table never transits the driver (at 10× the reference's
    27.3 M-row table, ``toLocalIterator`` becomes the bottleneck)."""
    import pandas as pd

    num_ranks = qrank_df.count()
    if num_ranks == 0:
        # the kernel's scale_x division needs num_ranks > 0; an empty
        # qrank table is a valid (if degenerate) build
        return {"Median": 0, "Samples": []}
    ordered = (
        qrank_df.repartitionByRange(1, "rank")
        .sortWithinPartitions("rank")
        .select("item", "views")
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        def rows() -> Iterator[tuple[str, int]]:
            for pdf in batches:
                yield from zip(pdf["item"], (int(v) for v in pdf["views"]))

        stats = build_stats_from_rows(rows(), num_ranks, top_n, num_samples)
        yield pd.DataFrame(
            {
                "idx": range(len(stats["Samples"])),
                "item": [s[0] for s in stats["Samples"]],
                "rank": [s[1] for s in stats["Samples"]],
                "value": [s[2] for s in stats["Samples"]],
                "median": [stats["Median"]] * len(stats["Samples"]),
            }
        )

    out = ordered.mapInPandas(
        kernel, schema="idx long, item string, rank long, value long, median long"
    ).collect()
    if not out:
        return {"Median": 0, "Samples": []}
    ordered_rows = sorted(out, key=lambda r: r["idx"])
    return {
        "Median": int(ordered_rows[0]["median"]),
        "Samples": [[r["item"], int(r["rank"]), int(r["value"])] for r in ordered_rows],
    }


def write_stats_json(stats: dict, path: str) -> None:
    """Atomic publish (tmp + rename), byte-identical shape to the
    reference's JSON (keys Median/Samples, compact separators)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(stats, separators=(",", ":"), ensure_ascii=False))
    os.replace(tmp, path)
