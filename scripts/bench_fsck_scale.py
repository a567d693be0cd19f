"""Integrity-audit cost at serving scale: full fsck of a 1M-doc index.

tests/test_fsck.py pins detection semantics at toy scale; this harness
measures what a full audit COSTS on a 1,000,000-doc positional index of
the rule-shaped corpus — the number an operator needs to schedule a
nightly audit of a 100 TB index. Reported: blob count + compressed
postings bytes decoded, wall time for (a) the blob+lexicon+docmap audit
and (b) the source-vs-index sha256 recheck, full and 1/16-sampled.

The audit is one mapInPandas pass (no shuffle until the per-term
aggregate), so cost is linear in postings bytes and parallelizes with
cores — the measured docs/s here scales with the cluster like the
build does (BENCH/BASELINE.md).

Usage:
    PYTHONPATH=/root/repo python scripts/bench_fsck_scale.py \
        [--docs 1000000] [--out BENCH/FSCK_SCALE_r04.md]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1000000)
    ap.add_argument("--out", default=str(REPO / "BENCH" / "FSCK_SCALE_r04.md"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench_serving_scale import gen_parquet  # same seeded corpus

    from fastcatsearch3_spark.config import EngineConfig
    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.fsck import fsck_index
    from fastcatsearch3_spark.operators.ingest import normalize_corpus

    work = Path(tempfile.mkdtemp(prefix="fcs3_fsck1m_"))
    try:
        cdir = work / "corpus"
        print(f"generating {args.docs} docs → {cdir}", flush=True)
        gen_parquet(args.docs, cdir, 32)
        corpus = normalize_corpus(spark.read.parquet(str(cdir)))
        root = work / "index"
        cfg = EngineConfig(num_shards=64, store_positions=True)
        t0 = time.monotonic()
        build_index(spark, corpus, str(root), cfg, resume=False)
        build_s = round(time.monotonic() - t0, 1)
        print(f"built in {build_s}s", flush=True)
        store = IndexStore(str(root))

        post_dir = root / "postings"
        post_bytes = sum(
            p.stat().st_size for p in post_dir.rglob("*.parquet")
        )
        n_blobs = store.postings(spark).count()

        t0 = time.monotonic()
        rep = fsck_index(spark, store)  # no corpus → audit only
        audit_s = round(time.monotonic() - t0, 1)
        assert rep["ok"], rep

        t0 = time.monotonic()
        rep_sha = fsck_index(spark, store, corpus=corpus)
        sha_full_s = round(time.monotonic() - t0, 1)
        assert rep_sha["ok"], rep_sha

        t0 = time.monotonic()
        rep_smp = fsck_index(spark, store, corpus=corpus, sha_sample_mod=16)
        sha_smp_s = round(time.monotonic() - t0, 1)
        assert rep_smp["ok"], rep_smp

        out = {
            "docs": args.docs,
            "build_s": build_s,
            "n_blobs": int(n_blobs),
            "postings_mb": round(post_bytes / 1e6, 1),
            "audit_s": audit_s,
            "audit_plus_sha_full_s": sha_full_s,
            "audit_plus_sha_sampled16_s": sha_smp_s,
            "audit_docs_per_s": round(args.docs / audit_s),
            "audit_mb_per_s": round(post_bytes / 1e6 / audit_s, 1),
        }
        print(json.dumps(out))
        Path(args.out).write_text(
            "# fsck at serving scale — full audit of a 1M-doc positional "
            "index (round 4)\n\n"
            "Protocol: `scripts/bench_fsck_scale.py` — seeded rule-shaped "
            f"corpus ({args.docs} docs, same generator as the serving-scale "
            "and rank-identity harnesses), positional index at 64 shards, "
            "local[32]; every check must come back ok.\n\n"
            "| measure | value |\n|---|---|\n"
            + "".join(f"| {k} | {v} |\n" for k, v in out.items())
            + "\nThe audit decodes every posting + positions blob once "
            "with the serving kernels and re-derives all encoder "
            "invariants, reconciles the lexicon, and bounds docmap "
            "ranges — one mapInPandas pass, no shuffle until the "
            "per-term aggregate, so wall time is postings-bytes / "
            "(cores × decode rate) and scales out like the build "
            "(BENCH/BASELINE.md). The sha256 recheck adds one corpus "
            "scan + one aggregate-sized join; the 1/16 sample bounds "
            "that for routine runs.\n"
        )
        print(f"wrote {args.out}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
