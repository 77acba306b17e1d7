"""Entity linking: redirect-chain canonicalization to stable ids.

Reference semantics: redirect expansion/canonicalization in the titles
and pagelinks stages (titles.go:394-483, pagelinks.go:210-311) and the
bounded interwiki prefix-resolution loop (interwikilinks.go:185-194).

Spark-first shape: the redirect table is a small dimension → iterate
``max_iters`` broadcast-join rounds, each replacing ids that still have
an outgoing redirect edge. The loop is driver-side but each round is a
map-only broadcast join over the big side — no corpus shuffle, and the
round count is bounded by the longest chain (wiki redirect chains are
short by policy; double redirects get fixed by bots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    df: DataFrame,
    redirects_df: DataFrame,
    id_col: str = "item_id",
    max_iters: int = 8,
) -> DataFrame:
    """Rewrite ``id_col`` to its canonical id by following redirect
    edges (alias_id → target_id) to a fixpoint, ≤ ``max_iters`` hops.

    Self-contained per round: left-join on the alias side, coalesce.
    If a chain is longer than max_iters the remaining alias id is kept
    (same forgiving behavior as the reference's bounded interwiki loop).
    """
    edges = redirects_df.select(
        F.col("alias_id").alias("__alias"), F.col("target_id").alias("__target")
    )
    out = df
    for _ in range(max_iters):
        out = (
            out.join(F.broadcast(edges), out[id_col] == edges["__alias"], "left")
            .withColumn(id_col, F.coalesce(F.col("__target"), F.col(id_col)))
            .drop("__alias", "__target")
        )
    return out


def canonical_dictionary(dict_df: DataFrame, redirects_df: DataFrame) -> DataFrame:
    """Dictionary with canonical ids pre-resolved — lets the mention join
    skip per-mention canonicalization entirely (resolve the tiny side
    once instead of the huge side repeatedly; at 100 TB this removes
    ``max_iters`` passes over the corpus)."""
    return resolve_redirects(dict_df, redirects_df).withColumn(
        "item", F.concat(F.lit("Q"), F.col("item_id"))
    )
