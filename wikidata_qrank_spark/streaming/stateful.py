"""Custom stateful streaming operator: first-seen dedup.

The reference is batch-only; its dedup (consecutive-duplicate drop over
sorted files, links.go:60-77) has a streaming generalization: emit each
key the first time it is seen across micro-batches, suppress all later
occurrences. Implemented with ``applyInPandasWithState`` — per-key state
holds one flag; arbitrary late duplicates are suppressed for the
lifetime of the state.

At scale: state is partitioned by key across executors by Structured
Streaming's state store; memory per key is O(1). For corpus dedup the
key is the content fingerprint (dedup.content_fingerprint), giving a
streaming exact-dedup of a document feed.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def _ddl_fields(schema: str) -> tuple[list[str], list[str]]:
    """Names and type strings from a DDL schema — a real parse
    (StructType.fromDDL), so types containing commas or spaces
    (decimal(10,2), arrays) don't corrupt the split."""
    struct = StructType.fromDDL(schema)
    return [f.name for f in struct.fields], [
        f.dataType.simpleString() for f in struct.fields
    ]


def first_seen_dedup(
    grouped,
    output_schema: str,
    value_cols: list[str],
):
    """Apply first-seen dedup to a ``GroupedData`` of a streaming
    DataFrame grouped by the dedup key.

    Emits one row per key — the minimum of ``value_cols[0]`` tiebreak
    within the first micro-batch containing the key (deterministic).

    ``output_schema`` must be ``<key cols>, <value_cols>`` DDL matching
    the emitted frame.
    """

    out_names, _ = _ddl_fields(output_schema)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            head = pdf.sort_values(value_cols[0]).head(1)
            if first is None or head[value_cols[0]].iloc[0] < first[value_cols[0]].iloc[0]:
                first = head
        if first is None:
            return
        state.update((1,))
        data = {name: [k] for name, k in zip(out_names, key)}
        for name, col in zip(out_names[len(key):], value_cols):
            data[name] = [first[col].iloc[0]]
        yield pd.DataFrame(data)

    return grouped.applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_state(
    grouped,
    output_schema: str,
    ts_col: str,
    tiebreak_col: str,
    value_cols: list[str],
):
    """Streaming changelog compaction — the streaming form of
    operators/compaction.compact_changelog: per key, maintain the row
    with the greatest (ts, tiebreak) across micro-batches and emit it
    whenever it changes (update mode). The batch-parity test drives
    the same rows through both forms and compares final states.

    State per key is ONE row (ts, tiebreak, values...) — O(1) memory,
    partitioned across executors by the state store; a late-arriving
    older row never displaces newer state, which is exactly the
    idempotence a CDC consumer needs.

    ``output_schema`` must be ``<key cols>, <ts_col>, <tiebreak_col>,
    <value_cols...>`` DDL; the state struct mirrors the non-key tail.
    """
    out_names, out_types = _ddl_fields(output_schema)
    tail = [ts_col, tiebreak_col, *value_cols]
    n_key = len(out_names) - len(tail)
    state_schema = ", ".join(
        f"{n} {t}" for n, t in zip(out_names[n_key:], out_types[n_key:])
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best = tuple(state.get) if state.exists else None
        for pdf in pdfs:
            if pdf.empty:
                continue
            top = pdf.sort_values([ts_col, tiebreak_col]).iloc[-1]
            cand = tuple(top[c] for c in tail)
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        if best is None:
            return
        prev = tuple(state.get) if state.exists else None
        if prev is not None and (prev[0], prev[1]) >= (best[0], best[1]):
            return
        state.update(best)
        data = {name: [k] for name, k in zip(out_names, key)}
        for name, v in zip(out_names[n_key:], best):
            data[name] = [v]
        yield pd.DataFrame(data)

    return grouped.applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
