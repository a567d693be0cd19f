"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stream processing; its dedup is pk-collision handling
at index time (core:ir.document.PrimaryKeyIndexWriter [K]). A streaming
ingest at 100 TB/day wants the dedup BEFORE the indexer: emit only the
first occurrence of each content hash across the stream's lifetime, with
the seen-set held as Spark-managed per-key state.

Shape: group by the content hash itself → state per key is one flag, so
the store holds one entry per DISTINCT document ever seen (RocksDB state
backend territory at scale; production deployments bound it with a state
TTL — a dup arriving after the TTL re-emits, the usual at-least-once
trade — or front it with an approximate filter). Arrow-batched both ways:
no per-row Python beyond the per-key emit decision.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "content_sha256 string, doc_id bigint, text string"
STATE_SCHEMA = "seen int"


def _make_first_only(ttl_ms: int | None):
    def _first_only(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # TTL eviction: forget the key; a dup arriving later re-emits
            # (the documented at-least-once trade of bounded state)
            state.remove()
            return
        if state.exists:
            if ttl_ms is not None:
                # sliding TTL: every sighting of the key keeps it hot —
                # a content that keeps re-arriving stays suppressed
                state.setTimeoutDuration(ttl_ms)
            return  # every row of this key duplicates an earlier emit
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            row = pdf.loc[pdf["doc_id"].idxmin()]
            if best is None or row["doc_id"] < best["doc_id"]:
                best = row
        if best is None:
            return
        state.update((1,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "content_sha256": [key[0]],
                "doc_id": [int(best["doc_id"])],
                "text": [best["text"]],
            }
        )

    return _first_only


def stream_exact_dedup(docs: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """First-occurrence-only exact dedup over a streaming (doc_id, text)
    relation: emits each distinct content once — the smallest doc_id of
    its first micro-batch — and drops every later copy. Works only on a
    streaming DataFrame (use dataops.dedup.exact_dedup for batch).

    ``ttl_ms`` bounds the state store (SURVEY §10.3): each key's entry
    is evicted ``ttl_ms`` of processing time after its LAST sighting
    (sliding TTL via ProcessingTimeTimeout). Within the TTL the
    first-occurrence guarantee is exact; a duplicate arriving after its
    key was evicted re-emits — the standard at-least-once trade every
    bounded-state streaming dedup makes. Without ``ttl_ms`` state grows
    with one entry per distinct content forever (exact, unbounded).

    Ops note: while any state has a registered timeout the engine keeps
    scheduling micro-batches (they are what fire the timeouts), so pair a
    TTL'd query with an explicit ``.trigger(processingTime=...)`` — the
    default ASAP trigger busy-loops empty batches — and don't rely on
    ``processAllAvailable`` for quiescence in tests/ops tooling."""
    keyed = docs.select(
        F.sha2("text", 256).alias("content_sha256"), "doc_id", "text"
    )
    return keyed.groupBy("content_sha256").applyInPandasWithState(
        _make_first_only(ttl_ms),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout,
    )
