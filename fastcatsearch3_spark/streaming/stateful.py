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


def _first_only(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return  # every row of this key is a duplicate of an earlier emit
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
    yield pd.DataFrame(
        {
            "content_sha256": [key[0]],
            "doc_id": [int(best["doc_id"])],
            "text": [best["text"]],
        }
    )


def stream_exact_dedup(docs: DataFrame) -> DataFrame:
    """First-occurrence-only exact dedup over a streaming (doc_id, text)
    relation: emits each distinct content once — the smallest doc_id of
    its first micro-batch — and drops every later copy. Works only on a
    streaming DataFrame (use dataops.dedup.exact_dedup for batch)."""
    keyed = docs.select(
        F.sha2("text", 256).alias("content_sha256"), "doc_id", "text"
    )
    return keyed.groupBy("content_sha256").applyInPandasWithState(
        _first_only,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
