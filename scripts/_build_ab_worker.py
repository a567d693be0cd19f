"""One build-path timing pass against a given repo tree (worker for
bench_build_ab.py).

Usage: python scripts/_build_ab_worker.py REPO_ROOT SF_DIR CPUS REPS
Times REPS cold builds of the plain index and REPS cold builds of the
positions index (fresh target dir each time, resume off); prints one JSON
line {"index_build": [..], "index_build_positions": [..]}.
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
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.ingest import load_documents

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
    corpus = load_documents(spark, sf_dir).cache()
    corpus.count()

    out: dict[str, list[float]] = {}
    # one untimed warmup build (python worker pool + JIT), like bench.py's
    # second-build steady state
    warm = tempfile.mkdtemp(prefix="fcs3_build_ab_w_")
    try:
        build_index(spark, corpus, warm, EngineConfig(), resume=False)
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    for name, cfg in (
        ("index_build", EngineConfig()),
        ("index_build_positions", EngineConfig(store_positions=True)),
    ):
        out[name] = []
        for _ in range(reps):
            tgt = tempfile.mkdtemp(prefix="fcs3_build_ab_")
            try:
                t0 = time.monotonic()
                build_index(spark, corpus, tgt, cfg, resume=False)
                out[name].append(round(time.monotonic() - t0, 3))
            finally:
                shutil.rmtree(tgt, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
