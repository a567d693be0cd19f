"""Rank-identity at 1M docs: packed BMW kernel vs the declarative path.

The pytest suite pins rank-identity of the packed/WAND search against
exhaustive oracles at test scale; the driver check pins it against
DuckDB at sf0.01/sf0.1 (2k/20k docs). This harness extends the same
claim to a 1,000,000-doc index of the rule-shaped corpus: for each
query, the packed block-max kernel (`search_index`, mode=bmw) and the
independent declarative implementation (`plans.sql_bm25.bm25_topk`,
which re-derives tf/df/dl from the raw corpus per query — no shared
index artifacts, only the shared analyzer) must return the IDENTICAL
top-k doc_id sequence with scores agreeing to 1e-6. Both paths break
exact score ties by doc_id ascending, so the comparison is exact-order;
no rounding is applied before ranking (rounding manufactures ties the
full-precision kernel doesn't have).

Usage:
    PYTHONPATH=/root/repo python scripts/rank_identity_1m.py \
        [--docs 1000000] [--k 10] [--out BENCH/RANK_IDENTITY_1M_r04.md]
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

QUERIES = [
    ("q_hot1", ["index"], "AND"),
    ("q_and2", ["merge", "join"], "AND"),
    ("q_and3", ["merge", "join", "scan"], "AND"),
    ("q_or2", ["codec", "builder"], "OR"),
    ("q_mid", ["segment", "buffer"], "AND"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1000000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=str(REPO / "BENCH" / "RANK_IDENTITY_1M_r04.md"))
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
    from fastcatsearch3_spark.operators.ingest import normalize_corpus
    from fastcatsearch3_spark.plans.query import ParsedQuery
    from fastcatsearch3_spark.plans.search import search_index
    from fastcatsearch3_spark.plans.sql_bm25 import bm25_topk

    work = Path(tempfile.mkdtemp(prefix="fcs3_rank1m_"))
    try:
        cdir = work / "corpus"
        print(f"generating {args.docs} docs → {cdir}", flush=True)
        gen_parquet(args.docs, cdir, 32)
        corpus = normalize_corpus(spark.read.parquet(str(cdir))).cache()
        corpus.count()
        root = work / "index"
        cfg = EngineConfig(num_shards=64)
        t0 = time.monotonic()
        build_index(spark, corpus, str(root), cfg, resume=False)
        print(f"built in {round(time.monotonic() - t0, 1)}s", flush=True)
        store = IndexStore(str(root))

        results = []
        mismatches = 0
        for name, terms, op in QUERIES:
            pq = ParsedQuery(terms=list(terms), op=op)
            kernel = [
                (int(r["doc_id"]), float(r["score"]))
                for r in search_index(
                    spark, store, pq, k=args.k, mode="bmw"
                ).collect()
            ]
            declarative = [
                (int(r["doc_id"]), float(r["score"]))
                for r in bm25_topk(
                    corpus, list(terms), k=args.k, op=op, cfg=cfg,
                    round_score=None,  # rounding would manufacture ties
                ).collect()
            ]
            same = [d for d, _ in kernel] == [d for d, _ in declarative] and all(
                abs(a - b) <= 1e-6
                for (_, a), (_, b) in zip(kernel, declarative)
            )
            mismatches += 0 if same else 1
            results.append(
                {
                    "query": name,
                    "terms": terms,
                    "op": op,
                    "identical": same,
                    "kernel_top3": [(d, round(s, 6)) for d, s in kernel[:3]],
                    "declarative_top3": [
                        (d, round(s, 6)) for d, s in declarative[:3]
                    ],
                }
            )
            print(f"{name}: identical={same}", flush=True)

        body = [
            "# BENCH/RANK_IDENTITY_1M — kernel vs declarative at 1M docs",
            "",
            f"Protocol: scripts/rank_identity_1m.py — {args.docs} docs of",
            "the rule-shaped corpus (gen_corpus seed 42), packed index",
            "(shards 64), top-{k} per query from (a) the packed block-max".format(
                k=args.k
            ),
            "WAND kernel and (b) `plans.sql_bm25.bm25_topk`, an",
            "independent declarative implementation sharing only the",
            "analyzer. doc_id sequences compared for exact order,",
            "scores to 1e-6; exact ties break by doc_id asc in both.",
            "",
            "| query | terms | op | identical |",
            "|---|---|---|---|",
        ]
        for r in results:
            body.append(
                f"| {r['query']} | {' '.join(r['terms'])} | {r['op']} |"
                f" {'YES' if r['identical'] else 'NO'} |"
            )
        body += [
            "",
            f"**{len(QUERIES) - mismatches}/{len(QUERIES)} queries"
            " rank-identical (docIDs AND scores).**",
            "",
            "```json",
            json.dumps(results, indent=2),
            "```",
        ]
        Path(args.out).write_text("\n".join(body) + "\n")
        print(f"wrote {args.out}; mismatches={mismatches}", flush=True)
        if mismatches:
            sys.exit(1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
