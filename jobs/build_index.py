"""Full index build job (SURVEY.md §3.2), launched via spark-submit:

    spark-submit --master local[8] --py-files dist/engine.zip \
        jobs/build_index.py --input <parquet dir or file> \
        --index-root <out dir> [--segments N] [--shards S] [--buckets B]

Accepts either the rule-shaped corpus (repo, path, commit, lang, content)
or the driver testdata ``documents`` shape — both are normalized by
``ingest.normalize_corpus``. Prints ONE JSON line of build metrics
(docs, wall seconds excluding session startup, docs/sec) for bench
harnesses to parse.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import pandas as pd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--segments", type=int, default=1)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--skip-integrity", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fcs3-build-index").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from fastcatsearch3_spark.config import EngineConfig
    from fastcatsearch3_spark.operators.build import build_index, read_stats
    from fastcatsearch3_spark.operators.ingest import normalize_corpus

    # CPU-heavy UDF stages follow small shuffles here; AQE's size-based
    # partition coalescing would throttle them to a handful of tasks.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    cfg = EngineConfig(num_shards=args.shards)

    # Size file-scan partitions from the DATA, not Spark's 128 MB default:
    # a small corpus in small files otherwise bin-packs into a handful of
    # scan partitions (openCost + maxPartitionBytes), starving the analyzer
    # kernel and (worse) tripping the build's repartition guard — which
    # re-introduces the content shuffle the stage pass is designed to
    # avoid. total/32 splits, capped at the stock 128 MB: at 100 TB this
    # IS the stock setting; the knob only matters for small inputs. The
    # divisor floor (32) dominates at ≤8 cores, so the scaling bench's two
    # cluster sizes see the IDENTICAL split layout (fair comparison,
    # deterministic pass-0 offsets); beyond that 4×cores keeps every core
    # fed with ≥4 splits.
    from pathlib import Path

    cores = spark.sparkContext.defaultParallelism
    total_bytes = sum(
        f.stat().st_size for f in Path(args.input).rglob("*.parquet")
    ) or (1 << 27)
    split = max(1 << 20, min(1 << 27, total_bytes // max(32, 4 * cores)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))

    corpus = normalize_corpus(spark.read.parquet(args.input))

    # Pre-warm the Python worker pool (part of session startup, excluded
    # from throughput per BASELINE.md protocol): the PySpark daemon forks
    # workers serially and each import of pandas/numpy takes O(seconds), so
    # without this the first UDF stage stalls ~0.5 s × cores while the
    # fleet spawns. Workers are reused afterwards
    # (spark.python.worker.reuse=true, the default).
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    cores = spark.sparkContext.defaultParallelism
    t_warm = time.monotonic()
    spark.range(cores * 4).repartition(cores * 2).select(
        _warm(col("id"))
    ).count()
    warmup_sec = time.monotonic() - t_warm

    t0 = time.monotonic()
    result = build_index(
        spark,
        corpus,
        args.index_root,
        cfg,
        n_segments=args.segments,
        resume=not args.no_resume,
        verify_integrity=not args.skip_integrity,
    )
    elapsed = time.monotonic() - t0
    stats = read_stats(args.index_root)
    from fastcatsearch3_spark.index import IndexStore

    from fastcatsearch3_spark.operators.build import read_manifest

    phases = {}
    for seg in IndexStore(args.index_root).segments():
        m = read_manifest(args.index_root, seg) or {}
        for k, v in (m.get("metrics", {}).get("phases") or {}).items():
            phases[k] = round(phases.get(k, 0.0) + v, 3)
    print(
        json.dumps(
            {
                "job": "build_index",
                "n_docs": stats["n_docs"],
                "n_segments": args.segments,
                "built": result["built"],
                "skipped": result["skipped"],
                "elapsed_sec": round(elapsed, 3),
                "warmup_sec": round(warmup_sec, 3),
                "docs_per_sec": round(stats["n_docs"] / elapsed, 1),
                "parallelism": spark.sparkContext.defaultParallelism,
                "phases": phases,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
