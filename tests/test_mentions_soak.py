"""Dictionary-scale soak of the mention path (VERDICT r4 item 7).

The DictionaryTooLargeError guard and the JVM-vs-Arrow equivalence were
unit-tested at toy sizes; this exercises them at a size where the
broadcast paths actually matter: a 5M-row synthetic dictionary
(sf-independent, generated executor-side with spark.range — never a
driver-side literal list).
"""

from __future__ import annotations

from pyspark.sql import functions as F

N_DICT = 5_000_000


def _big_dict(spark):
    return spark.range(N_DICT).select(
        F.concat(F.lit("t"), F.col("id")).alias("title"),
        F.col("id").alias("item_id"),
    )


def _spans(spark):
    # 2k text spans; half hit the dictionary (including both ends of
    # the id range), half miss
    rows = []
    for i in range(1000):
        rows.append((f"d{i}", 0, "text", f"t{i * 4999}"))
        rows.append((f"d{i}", 1, "text", f"miss{i}"))
    rows.append(("edge", 0, "text", f"t{N_DICT - 1}"))
    rows.append(("edge", 1, "text", f"t{N_DICT}"))  # past the end: miss
    return spark.createDataFrame(
        rows, "doc_id string, offset int, kind string, text string"
    )


def test_mention_path_at_dictionary_scale(spark):
    """JVM broadcast join == Arrow broadcast-dict kernel at 5M dict
    rows, and the guard falls back cleanly (same relation, no error)
    when max_dict_rows is lowered below the dictionary size."""
    from wikidata_qrank_spark.operators.mentions import (
        text_mentions,
        text_mentions_arrow,
    )

    d = _big_dict(spark)
    s = _spans(spark)

    jvm = sorted(tuple(r) for r in text_mentions(s, d).collect())
    assert len(jvm) == 1001  # 1000 hits + the in-range edge
    assert ("edge", 0, N_DICT - 1) in jvm

    arrow = sorted(
        tuple(r)
        for r in text_mentions_arrow(s, d, max_dict_rows=N_DICT + 1).collect()
    )
    assert arrow == jvm

    # guard: dictionary larger than max_dict_rows -> silent JVM fallback
    fb = sorted(
        tuple(r) for r in text_mentions_arrow(s, d, max_dict_rows=1000).collect()
    )
    assert fb == jvm


def test_collect_dictionary_guard_raises_at_scale(spark):
    from wikidata_qrank_spark.operators.mentions import (
        DictionaryTooLargeError,
        collect_dictionary,
    )
    import pytest

    with pytest.raises(DictionaryTooLargeError):
        collect_dictionary(_big_dict(spark), max_rows=1_000_000)
