"""One warm-query timing pass against a given repo tree (worker for
bench_warm_ab.py).

Usage: python scripts/_warm_ab_worker.py REPO_ROOT SF_DIR CPUS REPS
Builds the index once (untimed), then times the warm BM25 query mix and
the declarative SQL path REPS times each; prints one JSON line
{"q_and2": [..], ..., "bm25_sql_path": [..]}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession


def main() -> None:
    repo, sf_dir, cpus, reps = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    )
    sys.path.insert(0, repo)
    from fastcatsearch3_spark.config import EngineConfig
    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.ingest import load_documents
    from fastcatsearch3_spark.plans import sql_bm25
    from fastcatsearch3_spark.plans.query import ParsedQuery
    from fastcatsearch3_spark.plans.search import search_index

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()
    corpus = load_documents(spark, sf_dir).cache()
    corpus.count()

    root = tempfile.mkdtemp(prefix="fcs3_warm_ab_")
    out: dict[str, list[float]] = {}
    try:
        build_index(spark, corpus, root, cfg, resume=False)
        store = IndexStore(root)
        qmix = [
            ("q_and2", ParsedQuery(terms=["spark", "merge"], op="AND")),
            ("q_and3", ParsedQuery(terms=["spark", "merge", "table"], op="AND")),
            ("q_or2", ParsedQuery(terms=["vector", "stream"], op="OR")),
            ("q_not", ParsedQuery(terms=["spark"], not_terms=["slow"], op="AND")),
            ("q_hot", ParsedQuery(terms=["table"], op="AND")),
        ]
        # warmup (JIT / python worker pool)
        search_index(spark, store, ParsedQuery(terms=["index"], op="AND"), k=10).collect()
        for name, pq in qmix:
            out[name] = []
            for _ in range(reps):
                t0 = time.monotonic()
                search_index(spark, store, pq, k=10, mode="bmw").collect()
                out[name].append(round(time.monotonic() - t0, 3))
        out["bm25_sql_path"] = []
        for _ in range(reps):
            t0 = time.monotonic()
            sql_bm25.bm25_topk(corpus, ["spark", "merge"], k=10, cfg=cfg).collect()
            out["bm25_sql_path"].append(round(time.monotonic() - t0, 3))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
