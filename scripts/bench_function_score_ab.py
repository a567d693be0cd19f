"""function_score full-evaluation vs factor-pruned kernel at 1M docs
(VERDICT r04 next-round #4 "Done" criterion: parity on crafted flips is
in tests/test_function_score_topk.py; this is the 1M-doc A/B).

Builds the seeded 1M-doc rule-shaped corpus (fixtures.gen_corpus,
seed=42 — same as RANK_IDENTITY_1M / SERVING_SCALE), a packed index, a
deterministic per-doc popularity field (hash-derived, heavy-tailed) and
its factor artifact, then for each query:

  * asserts the pruned path returns the IDENTICAL (doc_id, final)
    sequence as the full-eval path (rank identity at 1M), and
  * times both paths (median of --reps after one warmup each).

Usage:
    PYTHONPATH=/root/repo python scripts/bench_function_score_ab.py \
        [--docs 1000000] [--k 10] [--reps 3] \
        [--out BENCH/FUNCTION_SCORE_AB_r05.md]
"""

from __future__ import annotations

import argparse
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

QUERIES = [
    ("q_hot1", ["index"], "OR"),          # Zipf rank-1: df ~ n_docs
    ("q_or2", ["merge", "join"], "OR"),   # mid-rank OR
    ("q_or_tail", ["codec", "builder"], "OR"),
    ("q_and2", ["merge", "join"], "AND"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1000000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--out", default=str(REPO / "BENCH" / "FUNCTION_SCORE_AB_r05.md")
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench_serving_scale import gen_parquet

    from fastcatsearch3_spark.config import EngineConfig
    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.ingest import normalize_corpus
    from fastcatsearch3_spark.plans.query import ParsedQuery
    from fastcatsearch3_spark.plans.search import (
        build_factor_artifact,
        function_score,
        function_score_topk,
    )

    work = Path(tempfile.mkdtemp(prefix="fcs3_fsab_"))
    try:
        src = work / "corpus"
        gen_parquet(args.docs, src, n_files=32)
        corpus = normalize_corpus(spark.read.parquet(str(src))).cache()
        n = corpus.count()
        print(f"corpus: {n} docs", flush=True)
        root = work / "idx"
        cfg = EngineConfig(num_shards=8)
        t0 = time.monotonic()
        build_index(spark, corpus, str(root), cfg, resume=False)
        print(f"index built in {time.monotonic() - t0:.1f}s", flush=True)
        store = IndexStore(str(root))

        # deterministic heavy-tailed popularity: hash-mod, squared to
        # concentrate mass (a few huge factors, most small — the shape
        # that makes pruning matter AND makes dropping a flip visible)
        fields = corpus.select(
            "doc_id",
            (
                F.pow(F.pmod(F.xxhash64("doc_id"), F.lit(1000)), 2.0)
                / F.lit(1000.0)
            ).alias("pop"),
        ).cache()
        fields.count()
        t0 = time.monotonic()
        build_factor_artifact(spark, store, fields, "pop", "pop")
        t_art = time.monotonic() - t0
        print(f"factor artifact built in {t_art:.1f}s", flush=True)

        lines = [
            "# function_score full-eval vs factor-pruned kernel — "
            f"{n} docs, k={args.k}, reps={args.reps} (median)",
            "",
            "Corpus: seeded rule-shaped 1M (fixtures.gen_corpus seed=42);"
            " factor = ln1p of a hash-derived heavy-tailed popularity,"
            f" artifact build {t_art:.1f}s (one docmap join, amortized"
            " over every query).",
            "",
            "| query | op | full-eval s | pruned s | speedup |"
            " rank identical |",
            "|---|---|---|---|---|---|",
        ]
        for name, terms, op in QUERIES:
            pq = ParsedQuery(terms=terms, op=op)
            # parity first (also warms both paths)
            full = function_score(
                spark, store, pq, fields, "pop", k=args.k
            ).toPandas()
            pruned = function_score_topk(
                spark, store, pq, "pop", k=args.k
            ).toPandas()
            same = list(full["doc_id"]) == list(pruned["doc_id"]) and max(
                abs(full["final"] - pruned["final"])
            ) < 1e-9
            if not same:
                print(f"MISMATCH on {name}:")
                print(full)
                print(pruned)
                raise SystemExit(1)
            tf_, tp_ = [], []
            for _ in range(args.reps):
                t0 = time.monotonic()
                function_score(
                    spark, store, pq, fields, "pop", k=args.k
                ).collect()
                tf_.append(time.monotonic() - t0)
                t0 = time.monotonic()
                function_score_topk(
                    spark, store, pq, "pop", k=args.k
                ).collect()
                tp_.append(time.monotonic() - t0)
            mf, mp = statistics.median(tf_), statistics.median(tp_)
            lines.append(
                f"| {name} | {op} | {mf:.3f} | {mp:.3f} |"
                f" {mf / mp:.2f}× | yes |"
            )
            print(lines[-1], flush=True)
        lines += [
            "",
            "Parity: every query's (doc_id, final) sequence identical"
            " between paths (checked above before timing); the crafted"
            " low-BM25/high-factor flip cases are pinned in"
            " tests/test_function_score_topk.py.",
        ]
        Path(args.out).write_text("\n".join(lines) + "\n")
        print(f"wrote {args.out}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
