"""Bloom-filter semi-join pruning (runtime-filter pattern).

The 100 TB situation: a fact table must join a dim-side key set that is
too big to broadcast as a hash table, so the naive plan shuffles the
ENTIRE fact table just to discard most of it. A bloom filter of the key
set is m_bits/8 bytes regardless of key count — broadcast that, drop
non-matching fact rows map-side, and only candidates (true matches +
the false-positive trickle) reach the exact join's shuffle.

Representation: the filter is a RELATION of set bit positions, not an
inlined bitset literal (which would repeat the literal-codebook mistake
— see operators/similarity.py history). Membership "all k bits set" is
k successive broadcast LEFT SEMI joins, each map-side, fact columns
untouched, zero fact shuffles. False positives are harmless: the exact
join follows; the bloom only bounds its input size.

Hashing is the portable md5→60-bit scheme shared with
operators/sketches.py, so any engine can reproduce the filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 3


def _probe(col: Column, i: int, m_bits: int) -> Column:
    return hash60(F.concat(col.cast("string"), F.lit(f"#{i}"))) % m_bits


def bloom_build(
    dim: DataFrame, key_col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> DataFrame:
    """Distinct bit positions set by the dim-side key set — at most
    min(k·|dim|, m_bits) rows of one long each."""
    pos = F.array(*[_probe(F.col(key_col), i, m_bits) for i in range(k)])
    return dim.select(F.explode(pos).alias("pos")).distinct()


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    positions: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Fact rows whose key passes the bloom filter (all k probe bits
    set): k broadcast left-semi joins, all map-side. Guaranteed a
    superset of the true matches. ``positions`` is re-evaluated per
    probe — persist it upstream if the dim derivation is expensive."""
    out = fact
    for i in range(k):
        out = out.join(
            F.broadcast(positions),
            _probe(F.col(key_col), i, m_bits) == F.col("pos"),
            "left_semi",
        )
    return out
