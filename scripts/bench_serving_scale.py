"""Serving-latency-vs-corpus-size evidence (the query half of the north
rule's scale story).

The scaling runs in BENCH/BASELINE.md evidence the BUILD path; this
harness evidences the SERVING path: warm top-k BM25 latency on a small
index vs a 200x larger one (5k vs 1M docs of the same rule-shaped
corpus, fixtures/gen_corpus.py seed 42). The design claim under test is
that query cost is bounded by the queried terms' posting lists (lexicon
pushed-``In`` scan + parquet row-group pruning + block-max pruning), NOT
by corpus size — so latency should grow far slower than 200x.

Usage:
    PYTHONPATH=/root/repo python scripts/bench_serving_scale.py \
        [--small 5000] [--large 1000000] [--reps 5] \
        [--out BENCH/SERVING_SCALE_r04.md]

Protocol: one local[32] session, corpora generated fresh (seeded), each
index built once (shards scale with corpus: 8 / 64), one warmup query
per store, then REPS timed reps per query; medians reported. Queries use
the generator's Zipf vocabulary: a hot single term (rank-1 "index", df
~= corpus), AND-2/AND-3 over mid-rank terms, OR-2 over tail terms, NOT,
and a positional phrase (positions built for both sizes).
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def gen_parquet(n_docs: int, out: Path, n_files: int) -> None:
    from fixtures.gen_corpus import gen_corpus

    out.mkdir(parents=True, exist_ok=True)
    pdf = gen_corpus(n_docs, seed=42)
    chunk = (n_docs + n_files - 1) // n_files
    for i in range(n_files):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            part.to_parquet(
                out / f"part-{i:04d}.parquet", index=False, row_group_size=8192
            )


QUERIES = [
    ("q_hot1", "index"),            # Zipf rank-1: df ~= n_docs
    ("q_and2", "merge join"),       # mid-rank AND
    ("q_and3", "merge join scan"),
    ("q_or2", "codec OR builder"),  # tail OR
    ("q_not", "query -debug"),
    ("q_phrase", '"merge segment"'),
]


def bench_store(spark, store, reps: int) -> dict[str, float]:
    from fastcatsearch3_spark.plans.search import search_index

    search_index(spark, store, "parse", k=10).collect()  # warmup
    out = {}
    for name, q in QUERIES:
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            search_index(spark, store, q, k=10, mode="bmw").collect()
            times.append(time.monotonic() - t0)
        out[name] = round(statistics.median(times), 3)
        out[name + "_runs"] = [round(t, 3) for t in times]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=5000)
    ap.add_argument("--large", type=int, default=1000000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=str(REPO / "BENCH" / "SERVING_SCALE_r04.md"))
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

    from fastcatsearch3_spark.config import EngineConfig
    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.ingest import normalize_corpus

    work = Path(tempfile.mkdtemp(prefix="fcs3_serving_scale_"))
    results: dict[str, dict] = {}
    try:
        for label, n_docs, n_files, shards in (
            ("small", args.small, 4, 8),
            ("large", args.large, 32, 64),
        ):
            cdir = work / f"corpus_{label}"
            print(f"generating {n_docs} docs → {cdir}", flush=True)
            gen_parquet(n_docs, cdir, n_files)
            corpus = normalize_corpus(spark.read.parquet(str(cdir)))
            root = work / f"index_{label}"
            cfg = EngineConfig(num_shards=shards, store_positions=True)
            t0 = time.monotonic()
            build_index(spark, corpus, str(root), cfg, resume=False)
            build_s = round(time.monotonic() - t0, 3)
            print(f"{label}: built {n_docs} docs in {build_s}s", flush=True)
            timings = bench_store(spark, IndexStore(str(root)), args.reps)
            results[label] = {
                "n_docs": n_docs,
                "num_shards": shards,
                "build_sec": build_s,
                "queries": timings,
            }
            print(json.dumps(results[label]), flush=True)

        ratio_docs = args.large / args.small
        rows = []
        for name, _ in QUERIES:
            s, l = (
                results["small"]["queries"][name],
                results["large"]["queries"][name],
            )
            rows.append((name, s, l, round(l / s, 2)))
        med_ratio = statistics.median(r[3] for r in rows)
        body = [
            "# BENCH/SERVING_SCALE — warm query latency vs corpus size",
            "",
            "Protocol: scripts/bench_serving_scale.py — one local[32]",
            "session, rule-shaped corpus (gen_corpus seed 42) at "
            f"{args.small} and {args.large} docs, positional index built",
            f"once per size (shards 8/64), {args.reps} timed reps per",
            "query after one warmup, medians. Claim under test: serving",
            "cost is bounded by the queried terms' posting lists (pushed-",
            "`In` lexicon scan, parquet row-group pruning, block-max",
            "pruning), not by corpus size.",
            "",
            f"| query | {args.small} docs (s) | {args.large} docs (s) |"
            " latency ratio |",
            "|---|---|---|---|",
        ]
        for name, s, l, r in rows:
            body.append(f"| {name} | {s} | {l} | {r}x |")
        body += [
            "",
            f"**Corpus grew {ratio_docs:.0f}x; median latency ratio"
            f" {med_ratio}x.**",
            "",
            "Raw:",
            "",
            "```json",
            json.dumps(results, indent=2),
            "```",
        ]
        Path(args.out).write_text("\n".join(body) + "\n")
        print(f"wrote {args.out}", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
