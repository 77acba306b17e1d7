"""Deterministic synthetic fixtures for scale-shape validation.

The driver's testdata corpus has a ~24-word vocabulary, so every
shingle is hot and any candidate filter looks dense on it (BENCH.md
q13). Real corpora are Zipfian: most shingles are rare, which is
exactly the regime the SSJoin prefix filter exploits (prefixes hold
each doc's rarest shingles). This module generates that regime
deterministically — fixed-seed inverse-CDF sampling, no wall-clock or
global RNG state — so selectivity claims become measured facts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def zipf_documents(
    spark: SparkSession,
    n_docs: int = 4000,
    vocab_size: int = 20_000,
    doc_len: int = 30,
    s: float = 1.1,
    seed: int = 42,
    n_partitions: int = 8,
) -> DataFrame:
    """(doc_id, text) with tokens drawn iid from a Zipf(s) distribution
    over ``vocab_size`` terms (token ``w<rank>``): P(rank r) ∝ 1/r^s.

    Deterministic for a given seed (NumPy PCG64 inverse-CDF draw on the
    driver — the corpus is a test fixture, sized far below the data the
    operators under test are built for)."""
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    weights = 1.0 / np.power(ranks, s)
    cdf = np.cumsum(weights) / weights.sum()
    # cumsum (sequential) vs sum (pairwise) can leave cdf[-1] one ulp
    # below 1.0, letting a draw land past it and emit an
    # out-of-vocabulary rank; pin the tail exactly
    cdf[-1] = 1.0
    rng = np.random.default_rng(seed)
    u = rng.random(n_docs * doc_len)
    tok_ranks = np.searchsorted(cdf, u, side="right") + 1
    toks = np.char.add("w", tok_ranks.astype("U8")).reshape(n_docs, doc_len)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": [" ".join(row) for row in toks],
        }
    )
    return spark.createDataFrame(pdf).repartition(n_partitions)
