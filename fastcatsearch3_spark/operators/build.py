"""Index build dataflow (SURVEY.md §2.I, §3.2) — the write path.

Reference lifecycle being re-expressed (FullIndexJob → DataSourceReader →
per-doc analysis → SegmentWriter memory-posting flush/merge →
SegmentInfo registration [K]):

    corpus ──shard window──▶ docmap(segment, shard, docno, doc_id, dl)
           ──analyze+count─▶ per-row term counts        (map-side, 0 shuffle)
           ──explode───────▶ tf rows (shard, docno, dl, term, tf)
           ──groupBy(shard, bucket) applyInPandas──▶ packed postings
           ──write parquet + manifest JSON

Shuffle accounting (the 100 TB design constraint):
  * shuffle 1: repartition by shard for dense docno assignment (row_number
    over shard) — carries each doc's content exactly once;
  * per-row term counting happens INSIDE the analyzer UDF (the Spark
    analogue of the reference's in-memory posting accumulation,
    core:ir.index.MemoryPosting [K]) so the explode emits already-combined
    (term, doc, tf) rows — the posting-entry stream, the minimum possible
    shuffle payload;
  * shuffle 2: groupBy(shard, term-bucket) to co-locate each term's
    entries for packing. Bucketing by hash(term) amortizes pandas-group
    overhead over many terms and bounds per-task memory; Zipfian hot
    terms are split across shards, so no single task sees more than
    1/num_shards of a hot term's postings (skew bound, SURVEY.md I-6).

Everything per-row runs in Arrow-batched pandas UDFs — no row-at-a-time
Python (BASELINE.json input_hint).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fastcatsearch3_spark import schemas
from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.functions.analyzer import ANALYZERS
from fastcatsearch3_spark.functions.vbyte import encode_postings
from fastcatsearch3_spark.operators import ingest


# ---------------------------------------------------------------------------
# Analyzer + per-row term counting (I-2 + the map-side half of I-3)
# ---------------------------------------------------------------------------

def term_counts_udf(cfg: EngineConfig):
    """content → map<term, tf>: tokenize and combine within the row.

    Emitting combined counts (not raw tokens) makes the downstream explode
    produce exactly one row per posting entry — the reference's in-memory
    posting buffer, done map-side."""
    from pyspark.sql.functions import pandas_udf

    fn = ANALYZERS[cfg.analyzer]

    @pandas_udf("map<string,int>")
    def term_counts(content: pd.Series) -> pd.Series:
        toks = fn(content, cfg)
        out = []
        for lst in toks:
            if not lst:
                out.append({})
                continue
            vals, counts = np.unique(np.asarray(lst, dtype=object), return_counts=True)
            out.append(dict(zip(vals.tolist(), counts.tolist())))
        return pd.Series(out, index=toks.index)

    return term_counts


# ---------------------------------------------------------------------------
# Posting pack kernel (reduce half of I-3, + I-9 block maxima)
# ---------------------------------------------------------------------------

PACK_SCHEMA = (
    "shard int, term string, df bigint, cf bigint, postings binary"
)


def make_pack_fn(block_size: int):
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # One bucket of terms within one shard: sort once, then slice
        # per-term runs — numpy end to end, loop only over distinct terms.
        pdf = pdf.sort_values(["term", "docno"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        docnos = pdf["docno"].to_numpy(np.int64).astype(np.uint64)
        tfs = pdf["tf"].to_numpy(np.int64).astype(np.uint64)
        dls = pdf["dl"].to_numpy(np.int64).astype(np.uint64)
        # term run boundaries
        change = np.nonzero(terms[1:] != terms[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(terms)]))
        out_terms, out_df, out_cf, out_blob = [], [], [], []
        for s, e in zip(starts, ends):
            out_terms.append(terms[s])
            out_df.append(e - s)
            out_cf.append(int(tfs[s:e].sum()))
            out_blob.append(
                encode_postings(docnos[s:e], tfs[s:e], dls[s:e], block_size)
            )
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                "shard": np.full(len(out_terms), shard, dtype=np.int32),
                "term": out_terms,
                "df": np.asarray(out_df, dtype=np.int64),
                "cf": np.asarray(out_cf, dtype=np.int64),
                "postings": out_blob,
            }
        )

    return pack


# ---------------------------------------------------------------------------
# Segment build (I-1..I-4)
# ---------------------------------------------------------------------------

def build_segment(
    spark: SparkSession,
    corpus: DataFrame,
    index_root: str,
    cfg: EngineConfig | None = None,
    segment_id: int = 0,
    verify_integrity: bool = True,
    lineage: dict | None = None,
) -> dict:
    """Build one immutable segment (docmap + packed postings) and write its
    manifest. Returns the manifest dict."""
    cfg = cfg or EngineConfig()
    root = Path(index_root)
    t0 = time.monotonic()

    seg = corpus.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(cfg.num_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    seg = seg.withColumn("docno", (F.row_number().over(w) - 1).cast("long"))

    tc = term_counts_udf(cfg)
    seg = seg.withColumn("tc", tc(F.col("content"))).withColumn(
        "dl", F.expr("aggregate(map_values(tc), 0L, (a, x) -> a + x)")
    )

    if verify_integrity:
        bad = ingest.verify_sha256(seg.select("content", "content_sha256"))
        if bad:
            raise ValueError(
                f"segment {segment_id}: {bad} rows failed the content_sha256 invariant"
            )

    docmap = seg.select(
        F.lit(segment_id).cast("int").alias("segment_id"),
        "shard",
        "docno",
        "doc_id",
        # pk identifies the logical document across versions (J-7): a later
        # segment carrying the same pk supersedes this row (DeleteIdSet
        # semantics, core:ir.index.DeleteIdSet [K])
        F.xxhash64("repo", "path").alias("pk_hash"),
        "dl",
        "content_sha256",
    )
    schemas.assert_schema(docmap, schemas.DOCMAP, "docmap")
    # segment_id is carried by the partition directory, not a data column
    # (writing both collides with Spark's partition-column inference).
    docmap_path = str(root / "docmap" / f"segment_id={segment_id}")
    (
        docmap.drop("segment_id")
        .repartition(cfg.num_shards, "shard")
        .sortWithinPartitions("shard", "docno")
        .write.mode("overwrite")
        .parquet(docmap_path)
    )

    docmap_back = spark.read.parquet(docmap_path)
    n_docs = docmap_back.count()
    stats_row = docmap_back.agg(
        F.sum("dl").alias("total_tokens"),
        F.expr("bit_xor(cast(conv(substr(content_sha256, 1, 15), 16, 10) as bigint))").alias(
            "sha_xor"
        ),
    ).collect()[0]

    tf_rows = seg.select(
        "shard",
        "docno",
        "dl",
        F.explode("tc").alias("term", "tf"),
    ).withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.num_buckets)).cast("int"))

    packed = (
        tf_rows.groupBy("shard", "bucket")
        .applyInPandas(make_pack_fn(cfg.block_size), PACK_SCHEMA)
        .withColumn("segment_id", F.lit(segment_id).cast("int"))
        .select("segment_id", "shard", "term", "df", "cf", "postings")
    )
    schemas.assert_schema(packed, schemas.POSTINGS, "postings")
    postings_path = str(root / "postings" / f"segment_id={segment_id}")
    (
        packed.drop("segment_id")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#term", "true")
        .parquet(postings_path)
    )

    elapsed = time.monotonic() - t0
    manifest = {
        "segment_id": segment_id,
        "status": "complete",
        "n_docs": int(n_docs),
        "total_tokens": int(stats_row["total_tokens"] or 0),
        "sha_xor15": int(stats_row["sha_xor"] or 0),
        "config": cfg.to_dict(),
        "lineage": lineage or {},
        "metrics": {
            "elapsed_sec": round(elapsed, 3),
            "docs_per_sec": round(n_docs / elapsed, 1) if elapsed > 0 else None,
        },
    }
    write_manifest(index_root, segment_id, manifest)
    return manifest


# ---------------------------------------------------------------------------
# Manifest I/O (I-8)
# ---------------------------------------------------------------------------

def manifest_path(index_root: str, segment_id: int) -> Path:
    return Path(index_root) / "manifest" / f"segment-{segment_id}.json"


def write_manifest(index_root: str, segment_id: int, manifest: dict) -> None:
    p = manifest_path(index_root, segment_id)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(manifest, indent=2, sort_keys=True))
    tmp.rename(p)  # atomic publish


def read_manifest(index_root: str, segment_id: int) -> dict | None:
    p = manifest_path(index_root, segment_id)
    if not p.exists():
        return None
    return json.loads(p.read_text())


def segment_complete(index_root: str, segment_id: int, cfg: EngineConfig) -> bool:
    """Resume check: a segment is reusable iff its manifest says complete
    AND was produced under an identical engine config (I-8)."""
    m = read_manifest(index_root, segment_id)
    return bool(m) and m.get("status") == "complete" and m.get("config") == cfg.to_dict()


# ---------------------------------------------------------------------------
# Full build with resume + global lexicon (I-6..I-8)
# ---------------------------------------------------------------------------

def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_root: str,
    cfg: EngineConfig | None = None,
    n_segments: int = 1,
    resume: bool = True,
    verify_integrity: bool = True,
) -> dict:
    """Full index build: split the corpus into ``n_segments`` hash-assigned
    segments, build each as an independent resumable unit (skip segments
    whose manifest is already complete — kill/rerun safe), then publish the
    global lexicon + stats.

    At 100 TB scale ``n_segments`` bounds the blast radius of a failure to
    one segment's worth of work; segments are also the append unit for
    incremental indexing (ST-1).
    """
    cfg = cfg or EngineConfig()
    built, skipped = [], []
    for seg_id in range(n_segments):
        if resume and segment_complete(index_root, seg_id, cfg):
            skipped.append(seg_id)
            continue
        part = (
            corpus
            if n_segments == 1
            else corpus.where(
                F.pmod(F.xxhash64("doc_id"), F.lit(n_segments)).cast("int") == seg_id
            )
        )
        build_segment(
            spark,
            part,
            index_root,
            cfg,
            segment_id=seg_id,
            verify_integrity=verify_integrity,
            lineage={"n_segments": n_segments, "segment_selector": "pmod(xxhash64(doc_id))"},
        )
        built.append(seg_id)
    publish_lexicon(spark, index_root, cfg, n_segments)
    return {"built": built, "skipped": skipped, "n_segments": n_segments}


def publish_lexicon(
    spark: SparkSession, index_root: str, cfg: EngineConfig, n_segments: int
) -> None:
    """Global lexicon (I-7): term → (df, cf) across all live segments.

    Input rows are per (term, segment, shard) — already partially
    aggregated by the pack stage — so this groupBy moves one small row per
    (term, shard, segment), not posting entries; Spark's partial/final hash
    agg plus AQE handles the Zipfian term skew (each hot term contributes
    at most num_shards × n_segments rows)."""
    root = Path(index_root)
    postings = spark.read.parquet(str(root / "postings"))
    lex = postings.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    )
    schemas.assert_schema(lex, schemas.LEXICON, "lexicon")
    lex.write.mode("overwrite").parquet(str(root / "lexicon"))

    docmap = spark.read.parquet(str(root / "docmap"))
    row = docmap.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens")
    ).collect()[0]
    stats = {
        "n_docs": int(row["n_docs"]),
        "total_tokens": int(row["total_tokens"] or 0),
        "avgdl": (row["total_tokens"] or 0) / row["n_docs"] if row["n_docs"] else 0.0,
        "n_segments": n_segments,
        "config": cfg.to_dict(),
    }
    sp = root / "stats.json"
    tmp = sp.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(stats, indent=2, sort_keys=True))
    tmp.rename(sp)


def read_stats(index_root: str) -> dict:
    return json.loads((Path(index_root) / "stats.json").read_text())
