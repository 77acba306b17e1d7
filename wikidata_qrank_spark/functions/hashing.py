"""The portable cross-engine hash, in one place.

``hash60(col)`` = first 15 hex chars of md5 parsed as a 60-bit long —
reproducible by any engine with md5 (the DuckDB oracle mirror is
``HASH60_SQL``). 15 chars (not 16) keeps the value inside a signed
64-bit long. This is the single definition behind the HLL registers
(operators/sketches.py), the bloom probes (operators/bloom.py), and
the sampling verdicts (operators/sampling.py); the minhash/simhash md5
family stays in hex-string space and deliberately does not use it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column) -> Column:
    """md5(col) → 60-bit non-negative long (col must be string-typed;
    callers concat their own salts/ids into it)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


HASH60_SQL = "CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
