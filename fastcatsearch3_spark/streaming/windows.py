"""Watermarked stream windows (SURVEY.md ST-3).

The reference has no stream-analytics module (its "streams" are the
incremental-indexing batches covered by ST-1/ST-2); this is the engine
extension that a Spark-native deployment gets for free — the same windowed
aggregation shape as the batch `events_hourly` driver query, but runnable
as a Structured Streaming query with event-time semantics:

  * tumbling window on the event timestamp;
  * watermark bounds state: a window's aggregation state is dropped once
    the watermark (max seen event time − delay) passes its end, which is
    what makes unbounded streams feasible — state is O(open windows), not
    O(stream length);
  * append output mode emits a window exactly once, when it closes; rows
    arriving later than the watermark are dropped (the documented
    late-data contract, asserted in tests/test_streaming.py).

At 100 TB/day the aggregation is a streaming partial/final agg keyed by
(window, keys) — the same map-side-combine shape as the batch path; the
watermark bounds the shuffle state, and the source would be a partitioned
file/Kafka stream with maxFilesPerTrigger/maxOffsetsPerTrigger sizing the
micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def popular_keyword_counts(
    queries: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    query_col: str = "query",
) -> DataFrame:
    """Stream-safe half of the reference's popular/realtime keyword
    service (server keyword statistics module [M]): split each logged
    query into keywords and count per (window, keyword) — a watermark-
    bounded partial/final agg, startable in append mode (a window's
    counts emit once, when it closes). Output: (window_start, window_end,
    keyword, cnt)."""
    return (
        queries.withWatermark(ts_col, watermark)
        .select(
            ts_col,
            F.explode(
                F.array_remove(
                    F.split(F.lower(F.col(query_col)), "[^a-z0-9]+"), ""
                )
            ).alias("keyword"),
        )
        .groupBy(F.window(ts_col, window), "keyword")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "keyword",
            "cnt",
        )
    )


def rank_popular_keywords(counts: DataFrame, top: int = 10) -> DataFrame:
    """Per-window top-N over a (window_start, …, keyword, cnt) relation —
    the batch half, run over the sink table (or inside foreachBatch): the
    ranked relation is tiny (windows × keywords-seen), never raw events.
    A streaming agg followed by row_number is not startable as one stream,
    which is why the service splits here."""
    from pyspark.sql import Window as W

    return (
        counts.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("window_start").orderBy(
                    F.desc("cnt"), F.asc("keyword")
                )
            ),
        )
        .where(F.col("rank") <= top)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def popular_keywords(
    queries: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    query_col: str = "query",
    top: int = 10,
) -> DataFrame:
    """Batch composition of the two halves: per-window top-N keywords.
    Output: (window_start, window_end, keyword, cnt, rank)."""
    return rank_popular_keywords(
        popular_keyword_counts(queries, window, watermark, ts_col, query_col),
        top=top,
    ).select("window_start", "window_end", "keyword", "cnt", "rank")


def sessionized_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Session windows (ST-3's gap-based variant): consecutive events of a
    key belong to one session while their gaps stay under ``gap``; the
    session closes ``gap`` after its last event. Native
    ``session_window`` — a streaming-capable merging-window aggregate
    (state = open sessions per key, watermark-bounded). Output:
    (session_start, session_end, keys…, cnt, value_sum)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *keys)
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *keys,
            "cnt",
            "value_sum",
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Per-(window, keys) event counts + value sum. Works unchanged on a
    batch DataFrame (watermark is a no-op there) and on a readStream
    DataFrame (append mode emits closed windows only)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), *keys)
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "cnt",
            "value_sum",
        )
    )
