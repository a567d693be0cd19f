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

import math
from typing import Iterator

import numpy as np
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


def _local_first_only(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Map-side combine for the stateful dedup: within each Arrow batch,
    keep only the min-doc_id row per content hash. Stateless and
    per-micro-batch, so it composes with the stateful operator (Spark
    rejects chained stateful ops in append mode); the global min per key
    per batch always survives a per-chunk min, so the emitted result is
    bit-identical — only the shuffle gets lighter on duplicate-heavy
    input."""
    for pdf in batches:
        if not len(pdf):
            continue
        yield pdf.loc[
            pdf.groupby("content_sha256", sort=False)["doc_id"].idxmin()
        ]


def stream_exact_dedup(
    docs: DataFrame, ttl_ms: int | None = None, local_prededup: bool = True
) -> DataFrame:
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
    ``processAllAvailable`` for quiescence in tests/ops tooling.

    ``local_prededup`` (default on) inserts a stateless map-side combine
    (SURVEY §12.2 remainder): each Arrow chunk keeps one min-doc_id row
    per key before the per-key state shuffle. Output is identical — the
    stateful operator already takes the min across what it receives —
    but a micro-batch that is mostly copies of the same few documents
    shuffles ~#distinct rows instead of ~#rows."""
    keyed = docs.select(
        F.sha2("text", 256).alias("content_sha256"), "doc_id", "text"
    )
    if local_prededup:
        keyed = keyed.mapInPandas(_local_first_only, OUT_SCHEMA)
    return keyed.groupBy("content_sha256").applyInPandasWithState(
        _make_first_only(ttl_ms),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Bloom pre-filter ahead of the stateful shuffle (SURVEY §12.2 / VERDICT #5)
# ---------------------------------------------------------------------------

def _bloom_geometry(n_items: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_items`` at ``fpp``. k is capped at 8 —
    each hash consumes 8 hex chars of the sha256, and 8×8 = the whole
    digest string."""
    n = max(1, int(n_items))
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, min(8, int(round(m / n * math.log(2)))))
    return m, k


def _bloom_indices(hashes: pd.Series, m: int, k: int) -> np.ndarray:
    """(len, k) int64 bit indices from sha256 hex strings: hash j is hex
    slice [8j, 8j+8) mod m — the digest IS the hash family, no rehash."""
    out = np.empty((len(hashes), k), dtype=np.int64)
    for j in range(k):
        out[:, j] = (
            hashes.str.slice(8 * j, 8 * j + 8)
            .map(lambda x: int(x, 16))
            .to_numpy(dtype=np.int64)
            % m
        )
    return out


def build_seen_bloom(
    hashes: DataFrame, expected_items: int | None = None, fpp: float = 0.01
) -> dict:
    """Bloom filter over a (batch) relation's ``content_sha256`` column —
    the "recently seen / already indexed" set a streaming dedup fronts
    itself with. Built distributed: one bitmap per partition (mapInPandas,
    vectorized), OR-merged on the driver — the driver transfer is
    partitions × m/8 bytes (tree-reduce it on a real cluster if partition
    counts are huge). Returns {"bits": bytes, "m": int, "k": int},
    broadcast-friendly (numpy bit ops on the executor side)."""
    if expected_items is None:
        expected_items = hashes.count()
    m, k = _bloom_geometry(expected_items, fpp)

    def per_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            idx = _bloom_indices(
                pdf["content_sha256"].astype(str), m, k
            ).ravel()
            np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = hashes.select("content_sha256").mapInPandas(
        per_part, "bits binary"
    ).collect()
    acc = np.zeros((m + 7) // 8, dtype=np.uint8)
    for r in parts:
        acc |= np.frombuffer(r["bits"], dtype=np.uint8)
    return {"bits": acc.tobytes(), "m": m, "k": k}


def _might_contain_udf(bloom: dict):
    from pyspark.sql.functions import pandas_udf

    bits = np.frombuffer(bloom["bits"], dtype=np.uint8)
    m, k = int(bloom["m"]), int(bloom["k"])

    @pandas_udf("boolean")
    def might(s: pd.Series) -> pd.Series:
        if not len(s):
            return pd.Series([], dtype=bool)
        idx = _bloom_indices(s.astype(str), m, k)
        hit = (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    return might


def stream_exact_dedup_against(
    docs: DataFrame,
    base_hashes: DataFrame,
    bloom: dict,
    ttl_ms: int | None = None,
    local_prededup: bool = True,
) -> DataFrame:
    """Streaming first-occurrence dedup AGAINST AN EXISTING CORPUS, bloom-
    fronted so the stateful shuffle sees only non-base rows (SURVEY
    §12.2): on a duplicate-heavy re-crawl stream the expensive per-key
    state shuffle shrinks to the novel fraction.

    Row routing (exactness preserved — the bloom only SKIPS work, it
    never decides alone):

      hash ∉ bloom          → definitely not in base (no false negatives)
                              → straight to the in-stream stateful dedup
      hash ∈ bloom          → PROBABLE base duplicate → exact-confirmed by
                              a stream-static left-outer join against
                              ``base_hashes`` (false positives survive and
                              continue to the stateful dedup; true base
                              dups drop here, never shuffling to state)

    ``base_hashes``: static relation with the base corpus's
    ``content_sha256`` (e.g. the IndexStore docmap projection); ``bloom``
    from :func:`build_seen_bloom` over the same relation, rebuilt per
    index epoch. In-stream duplicates of NOVEL content are still caught by
    the stateful operator, exactly as in :func:`stream_exact_dedup`; a
    base duplicate never emits at all. Emitted schema matches
    stream_exact_dedup. The same at-least-once note applies to ``ttl_ms``.
    """
    might = _might_contain_udf(bloom)
    keyed = docs.select(
        F.sha2("text", 256).alias("content_sha256"), "doc_id", "text"
    ).withColumn("_maybe_base", might(F.col("content_sha256")))
    sure_new = keyed.where(~F.col("_maybe_base")).drop("_maybe_base")
    # stream-static LEFT OUTER (anti is unsupported on streams): a null
    # right side = bloom false positive → genuinely novel
    base = base_hashes.select(
        F.col("content_sha256"), F.lit(1).alias("_base_hit")
    ).dropDuplicates(["content_sha256"])
    fp_new = (
        keyed.where(F.col("_maybe_base"))
        .join(base, "content_sha256", "left_outer")
        .where(F.col("_base_hit").isNull())
        .select("content_sha256", "doc_id", "text")
    )
    stream_in = sure_new.unionByName(fp_new)
    if local_prededup:
        stream_in = stream_in.mapInPandas(_local_first_only, OUT_SCHEMA)
    return stream_in.groupBy("content_sha256").applyInPandasWithState(
        _make_first_only(ttl_ms),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout,
    )


def prefilter_counts(
    docs: DataFrame, base_hashes: DataFrame, bloom: dict
) -> dict:
    """Batch replay of the routing arithmetic for evidence/bench runs:
    how many rows would reach the stateful shuffle with and without the
    bloom front. Returns {"total": n, "into_state": n, "base_drops": n,
    "bloom_fp": n} — ``into_state``/``total`` is the shuffle-row ratio."""
    might = _might_contain_udf(bloom)
    keyed = docs.select(
        F.sha2("text", 256).alias("content_sha256")
    ).withColumn("_maybe_base", might(F.col("content_sha256")))
    base = base_hashes.select(
        F.col("content_sha256"), F.lit(1).alias("_base_hit")
    ).dropDuplicates(["content_sha256"])
    joined = keyed.where(F.col("_maybe_base")).join(
        base, "content_sha256", "left_outer"
    )
    total = keyed.count()
    sure_new = keyed.where(~F.col("_maybe_base")).count()
    base_drops = joined.where(F.col("_base_hit").isNotNull()).count()
    bloom_fp = joined.where(F.col("_base_hit").isNull()).count()
    return {
        "total": total,
        "into_state": sure_new + bloom_fp,
        "base_drops": base_drops,
        "bloom_fp": bloom_fp,
    }


def local_prededup_counts(docs: DataFrame) -> dict:
    """Batch replay of the map-side combine's shuffle-row arithmetic for
    evidence runs: rows a micro-batch of ``docs`` (doc_id, text) would
    send to the per-key state shuffle with and without ``local_prededup``.
    Returns {"total": n, "into_state": n} — into_state/total is the
    shuffle-row ratio the combine achieves on this batch's duplicate
    profile."""
    keyed = docs.select(
        F.sha2("text", 256).alias("content_sha256"), "doc_id", "text"
    )
    total = keyed.count()
    into_state = keyed.mapInPandas(_local_first_only, OUT_SCHEMA).count()
    return {"total": total, "into_state": into_state}
