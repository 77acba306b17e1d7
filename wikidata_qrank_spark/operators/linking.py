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


def max_chain_length(redirects_df: DataFrame, cap: int = 16) -> int:
    """Length of the longest redirect chain, computed on the (tiny)
    edge table itself: iterate alias→target substitution until no
    composite edge remains. Each round is a self-join of the dimension
    table — O(edges), never touches the corpus."""
    edges = redirects_df.select(
        F.col("alias_id").alias("a"), F.col("target_id").alias("t")
    )
    frontier = edges
    for i in range(1, cap + 1):
        nxt = frontier.alias("f").join(
            edges.alias("e"), F.col("f.t") == F.col("e.a"), "inner"
        )
        if nxt.isEmpty():
            return i
        frontier = nxt.select(F.col("f.a").alias("a"), F.col("e.t").alias("t"))
    return cap


def resolve_redirects(
    df: DataFrame,
    redirects_df: DataFrame,
    id_col: str = "item_id",
    max_iters: int | None = None,
) -> DataFrame:
    """Rewrite ``id_col`` to its canonical id by following redirect
    edges (alias_id → target_id) to a fixpoint.

    Self-contained per round: left-join on the alias side, coalesce.
    The redirect dim scales with the KB (millions of redirects per
    large wiki), so no hard broadcast hint — AQE broadcasts per round
    when the edge table actually fits.
    The round count defaults to the longest chain in the redirect table
    (computed on the dimension side — no wasted no-op corpus joins);
    pass ``max_iters`` to bound it explicitly, in which case longer
    chains keep their remaining alias id (the reference's forgiving
    bounded interwiki loop behavior).
    """
    rounds = max_iters if max_iters is not None else max_chain_length(redirects_df)
    edges = redirects_df.select(
        F.col("alias_id").alias("__alias"), F.col("target_id").alias("__target")
    )
    out = df
    for _ in range(rounds):
        out = (
            out.join(edges, out[id_col] == edges["__alias"], "left")
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
