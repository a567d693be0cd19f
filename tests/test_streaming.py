"""Structured-Streaming semantics of ST-3 (windows + watermark late-data
contract) — a REAL readStream with controlled micro-batches, not the
batch-shape events_hourly query.

Batch boundaries are forced by writing one source file per batch and
calling processAllAvailable() between writes, so the watermark advances
deterministically:

  batch 1: events at 10:05, 10:40        → watermark after: 09:40
  batch 2: event  at 12:30 + LATE 10:15  → 10:15 ≥ 09:40: accepted;
                                           watermark after: 11:30 —
                                           window [10:00, 11:00) closes and
                                           is emitted (append mode)
  batch 3: TOO-LATE event at 10:20       → 10:20 < 11:30: dropped

The [10:00, 11:00) window must therefore count exactly 3 events (the two
on-time + the late-but-within-watermark one), and the too-late row must
never appear anywhere.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from fastcatsearch3_spark.streaming.windows import windowed_event_counts


def _write_batch(path, rows, i):
    pd.DataFrame(
        rows, columns=["ts", "event_type", "value"]
    ).astype({"ts": "datetime64[us]"}).to_parquet(
        f"{path}/batch-{i}.parquet", index=False
    )


def test_watermark_window_late_data(spark, tmp_path):
    src = tmp_path / "events_stream"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write_batch(src, [("2026-01-01 10:05:00", "click", 1.0),
                       ("2026-01-01 10:40:00", "click", 2.0)], 0)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = windowed_event_counts(
        stream, window="1 hour", watermark="1 hour", keys=("event_type",)
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # nothing emitted yet: no window has closed
        assert spark.sql("SELECT * FROM win_counts").count() == 0

        # batch 2: watermark is 09:40, so the 10:15 straggler is ACCEPTED;
        # 12:30 advances the watermark to 11:30, closing [10:00, 11:00)
        _write_batch(src, [("2026-01-01 12:30:00", "click", 8.0),
                           ("2026-01-01 10:15:00", "click", 4.0)], 1)
        q.processAllAvailable()

        # batch 3: watermark 11:30 → the 10:20 row is TOO LATE, dropped
        _write_batch(src, [("2026-01-01 10:20:00", "click", 100.0)], 2)
        q.processAllAvailable()

        out = spark.sql(
            "SELECT * FROM win_counts ORDER BY window_start"
        ).toPandas()
        ten = out[out["window_start"] == pd.Timestamp("2026-01-01 10:00:00")]
        assert len(ten) == 1
        assert int(ten["cnt"].iloc[0]) == 3          # 10:05 + 10:40 + 10:15
        assert float(ten["value_sum"].iloc[0]) == 7.0  # 1 + 2 + 4: no 100.0
        # the too-late row contributed nowhere
        assert float(out["value_sum"].sum()) <= 7.0 + 8.0
    finally:
        q.stop()


def test_popular_keywords_streaming(spark, tmp_path):
    """The keyword-counts half runs as a REAL append-mode stream; the rank
    half runs over the sink table — the documented service split."""
    from fastcatsearch3_spark.streaming.windows import (
        popular_keyword_counts,
        popular_keywords,
        rank_popular_keywords,
    )

    src = tmp_path / "qlog"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_kw")

    def write(rows, i):
        pd.DataFrame(rows, columns=["ts", "query"]).astype(
            {"ts": "datetime64[us]"}
        ).to_parquet(f"{src}/batch-{i}.parquet", index=False)

    write([("2026-01-01 10:05:00", "spark merge"),
           ("2026-01-01 10:10:00", "spark table"),
           ("2026-01-01 10:20:00", "merge spark")], 0)
    stream = (
        spark.readStream.schema("ts timestamp, query string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        popular_keyword_counts(stream)
        .writeStream.format("memory")
        .queryName("kw_counts")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # close the [10:00, 11:00) window by advancing the watermark
        write([("2026-01-01 12:30:00", "other things")], 1)
        q.processAllAvailable()
        ranked = rank_popular_keywords(
            spark.sql("SELECT * FROM kw_counts"), top=2
        ).toPandas()
        ten = ranked[
            ranked["window_start"] == pd.Timestamp("2026-01-01 10:00:00")
        ].sort_values("rank")
        assert ten["keyword"].tolist() == ["spark", "merge"]  # 3x and 2x
        assert ten["cnt"].tolist() == [3, 2]
    finally:
        q.stop()
    # batch composition == streaming counts + batch rank on this input
    batch_log = spark.read.parquet(str(src))
    got = popular_keywords(batch_log, top=2).toPandas()
    ten_b = got[
        got["window_start"] == pd.Timestamp("2026-01-01 10:00:00")
    ].sort_values("rank")
    assert ten_b["keyword"].tolist() == ["spark", "merge"]


def test_stream_exact_dedup_stateful(spark, tmp_path):
    """applyInPandasWithState first-occurrence dedup: a dup within a batch
    and a dup ACROSS batches are both dropped; state survives batches."""
    from fastcatsearch3_spark.streaming.stateful import stream_exact_dedup

    src = tmp_path / "docs_stream"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_dedup")

    def write(rows, i):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            f"{src}/batch-{i}.parquet", index=False
        )

    write([(3, "aaa"), (1, "aaa"), (2, "bbb")], 0)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT doc_id, text FROM dedup_stream ORDER BY doc_id"
        ).toPandas()
        # within-batch dup (doc 3) dropped; min doc_id wins
        assert list(map(tuple, got.to_numpy())) == [(1, "aaa"), (2, "bbb")]

        write([(4, "aaa"), (5, "ccc")], 1)  # cross-batch dup + fresh doc
        q.processAllAvailable()
        got = spark.sql(
            "SELECT doc_id, text FROM dedup_stream ORDER BY doc_id"
        ).toPandas()
        assert list(map(tuple, got.to_numpy())) == [
            (1, "aaa"), (2, "bbb"), (5, "ccc"),
        ]
    finally:
        q.stop()


def test_windowed_counts_batch_equivalence(spark):
    # the same helper on a BATCH frame == plain groupBy window (watermark
    # is a no-op in batch) — ties the streaming shape to the oracle-checked
    # events_hourly semantics
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = (
        windowed_event_counts(df, keys=("event_type",))
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    from pyspark.sql import functions as F

    exp = (
        df.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").cast("long").alias("cnt"),
             F.sum("value").alias("value_sum"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "event_type", "cnt", "value_sum")
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, exp)


def test_stream_exact_dedup_ttl_eviction(spark, tmp_path):
    """Bounded-state dedup (SURVEY §10.3): within the TTL the
    first-occurrence guarantee holds exactly; after the key's state times
    out it is evicted and a late duplicate re-emits.

    Protocol note: with ProcessingTimeTimeout the engine keeps running
    (empty) micro-batches while ANY state has a registered timeout — those
    batches are what FIRE the timeouts — so ``processAllAvailable`` never
    quiesces. The test therefore polls the memory sink to a deadline
    instead, with an explicit processing-time trigger pacing the batches."""
    import time

    from fastcatsearch3_spark.streaming.stateful import stream_exact_dedup

    src = tmp_path / "docs_stream_ttl"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_dedup_ttl")

    def write(rows, i):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            f"{src}/batch-{i}.parquet", index=False
        )

    def wait_ids(expect: list[int], deadline_s: float = 90.0) -> list[int]:
        t0 = time.monotonic()
        got: list[int] = []
        while time.monotonic() - t0 < deadline_s:
            got = [
                r["doc_id"]
                for r in spark.sql(
                    "SELECT doc_id FROM dedup_stream_ttl ORDER BY doc_id"
                ).collect()
            ]
            if got == expect:
                return got
            if len(got) > len(expect):
                break  # over-emitted: fail fast with the actual rows
            time.sleep(0.3)
        raise AssertionError(f"sink rows {got}, expected {expect}")

    write([(1, "aaa"), (2, "bbb")], 0)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(str(src))
    )
    q = (
        stream_exact_dedup(stream, ttl_ms=10000)
        .writeStream.format("memory")
        .queryName("dedup_stream_ttl")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        wait_ids([1, 2])
        # within TTL: cross-batch dup of 'aaa' suppressed (exact guarantee)
        write([(3, "aaa"), (4, "ccc")], 1)
        wait_ids([1, 2, 4])
        # let every key's TTL lapse, then make sure a batch RAN after the
        # expiry (timeouts fire only when a batch runs; a key that next
        # appears WITH data is processed as data, not as a timeout — so
        # replaying too early would race the eviction under load). Either
        # the batch id advances (those batches fire the evictions) or the
        # engine quiesces (no timeouts left ⇒ eviction already done).
        # The 10 s TTL is sized WELL above micro-batch latency so the
        # in-TTL suppression phase above can never race an early eviction.
        time.sleep(11.0)

        def bid() -> int:
            p = q.lastProgress
            return -1 if p is None else int(p["batchId"])

        base, last, same, t0 = bid(), bid(), 0, time.monotonic()
        while time.monotonic() - t0 < 90.0:
            time.sleep(0.4)
            b = bid()
            if b >= base + 2:
                break
            same = same + 1 if b == last else 0
            last = b
            if same >= 5:  # ~2 s with no new batch: engine quiesced
                break
        write([(6, "aaa")], 2)  # arrives after eviction → re-emits
        wait_ids([1, 2, 4, 6])
    finally:
        q.stop()


def test_stream_dedup_bloom_prefilter(spark, tmp_path):
    """Bloom-fronted dedup against a base corpus (SURVEY §12.2): base
    duplicates never emit AND never reach the stateful shuffle; novel
    content (incl. bloom false positives) dedups in-stream exactly as
    before; the routing arithmetic shows the shuffle-row reduction."""
    from fastcatsearch3_spark.streaming.stateful import (
        build_seen_bloom,
        prefilter_counts,
        stream_exact_dedup_against,
    )

    # base corpus: 200 distinct docs
    base_rows = [(i, f"base doc {i} words") for i in range(200)]
    base = spark.createDataFrame(
        pd.DataFrame(base_rows, columns=["doc_id", "text"])
    )
    base_hashes = base.select(F.sha2("text", 256).alias("content_sha256"))
    bloom = build_seen_bloom(base_hashes, fpp=0.01)

    # duplicate-heavy stream: 160 base dups + 20 novel (one duplicated
    # in-stream) arriving over two micro-batches
    b0 = [(1000 + i, f"base doc {i} words") for i in range(80)] + [
        (2000 + i, f"novel doc {i} here") for i in range(10)
    ]
    b1 = (
        [(3000 + i, f"base doc {i + 80} words") for i in range(80)]
        + [(4000 + i, f"novel doc {i + 10} here") for i in range(10)]
        + [(5000, "novel doc 0 here")]  # in-stream dup of an earlier novel
    )
    src = tmp_path / "bloom_stream"
    src.mkdir()
    pd.DataFrame(b0, columns=["doc_id", "text"]).to_parquet(
        f"{src}/batch-0.parquet", index=False
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream_exact_dedup_against(stream, base_hashes, bloom)
        .writeStream.format("memory")
        .queryName("bloom_dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bloom"))
        .start()
    )
    try:
        q.processAllAvailable()
        pd.DataFrame(b1, columns=["doc_id", "text"]).to_parquet(
            f"{src}/batch-1.parquet", index=False
        )
        q.processAllAvailable()
        got = spark.sql(
            "SELECT doc_id, text FROM bloom_dedup_stream ORDER BY doc_id"
        ).toPandas()
    finally:
        q.stop()
    # exactly the 20 novel docs, first occurrence each, no base dup leaked
    assert len(got) == 20
    assert set(got["text"]) == {f"novel doc {i} here" for i in range(20)}
    assert 5000 not in set(got["doc_id"])  # in-stream dup dropped

    # routing arithmetic on the same data: ≥ 160 of 181 rows never shuffle
    all_rows = spark.createDataFrame(
        pd.DataFrame(b0 + b1, columns=["doc_id", "text"])
    )
    counts = prefilter_counts(all_rows, base_hashes, bloom)
    assert counts["total"] == 181
    assert counts["base_drops"] == 160
    assert counts["into_state"] == counts["total"] - counts["base_drops"]
    assert counts["into_state"] <= 21  # novel rows only (+0 FPs here)


def test_stream_dedup_local_prededup_parity(spark, tmp_path):
    """The map-side combine (local_prededup) must not change WHAT is
    emitted, only how many rows reach the state shuffle: same stream run
    with the combine on and off emits identical rows, and the batch
    replay shows the duplicate-heavy batch collapsing to ~#distinct."""
    from fastcatsearch3_spark.streaming.stateful import (
        local_prededup_counts,
        stream_exact_dedup,
    )

    # duplicate-heavy: 3 distinct texts, 60 rows; min doc_id per text is
    # 0, 1, 2 — and the dup copies carry LOWER ids in a later batch to
    # prove cross-batch first-occurrence still holds under the combine
    b0 = [(i, f"text {i % 3}") for i in range(60)]
    b1 = [(100 + i, f"text {i % 3}") for i in range(6)] + [(200, "fresh")]

    results = {}
    for flag in (True, False):
        src = tmp_path / f"src_{flag}"
        src.mkdir()
        pd.DataFrame(b0, columns=["doc_id", "text"]).to_parquet(
            f"{src}/batch-0.parquet", index=False
        )
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            stream_exact_dedup(stream, local_prededup=flag)
            .writeStream.format("memory")
            .queryName(f"prededup_{flag}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{flag}"))
            .start()
        )
        try:
            q.processAllAvailable()
            pd.DataFrame(b1, columns=["doc_id", "text"]).to_parquet(
                f"{src}/batch-1.parquet", index=False
            )
            q.processAllAvailable()
            results[flag] = sorted(
                map(
                    tuple,
                    spark.sql(
                        f"SELECT doc_id, text FROM prededup_{flag}"
                    ).toPandas().to_numpy(),
                )
            )
        finally:
            q.stop()

    assert results[True] == results[False]
    assert [r[1] for r in results[True]] == [
        "text 0", "text 1", "text 2", "fresh",
    ]

    # shuffle-row arithmetic on the duplicate-heavy batch: 60 rows in,
    # at most #distinct × #chunks rows to the state shuffle (one Arrow
    # chunk per partition here, so exactly one row per distinct text
    # per partition that saw it)
    batch_df = spark.createDataFrame(
        pd.DataFrame(b0, columns=["doc_id", "text"])
    ).coalesce(2)
    counts = local_prededup_counts(batch_df)
    assert counts["total"] == 60
    assert counts["into_state"] <= 6  # 3 distinct × ≤2 partitions
