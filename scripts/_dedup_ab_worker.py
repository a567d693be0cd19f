"""Interleaved in-JVM A/B timing of one dedup op (worker for
bench_dedup_ab.py).

Usage: python scripts/_dedup_ab_worker.py OP CORPUS_DIR CPUS REPS
  OP 'minhash' | 'simhash' | 'jaccard'
Old-variant module source is read from stdin (e.g. `git show REF:path`);
the new variant is the working-tree fastcatsearch3_spark.dataops.dedup.

Both variants run alternately in ONE warm JVM (order flips each rep so
neither systematically profits from warmup), with an untimed warmup pass
first and a cache clear between runs. Prints one JSON line
{"old": [...], "new": [...]}.
"""

from __future__ import annotations

import importlib.util
import json
import sys
import tempfile
import time

from pyspark.sql import SparkSession


def load_old(src: str):
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("dedup_old_variant", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    op, corpus, cpus, reps = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    )
    old_mod = load_old(sys.stdin.read())
    import fastcatsearch3_spark.dataops.dedup as new_mod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(max(32, cpus * 2)))
        .config("spark.driver.memory", "12g")
        # the generated corpus is n_files smallish parquet files; the
        # default 128MB maxPartitionBytes would pack them into 1-2 input
        # partitions and serialize the tokenize stage for BOTH variants —
        # split finer so input parallelism matches the core count, as a
        # real cluster reading a large corpus would have
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus).select("doc_id", "text")

    def fn(mod):
        return {
            "minhash": lambda: mod.minhash_lsh_pairs(docs, top=50),
            "simhash": lambda: mod.simhash_top_pairs(docs, top=50),
            "jaccard": lambda: mod.jaccard_top_pairs(docs, top=50),
        }[op]

    def run(mod) -> tuple[float, int]:
        t0 = time.monotonic()
        rows = fn(mod)().collect()
        sec = time.monotonic() - t0
        spark.catalog.clearCache()
        return sec, len(rows)

    run(old_mod)  # untimed JVM/python-pool warmup
    run(new_mod)

    out: dict[str, list[float]] = {"old": [], "new": []}
    rows_seen = set()
    for rep in range(reps):
        order = ("old", "new") if rep % 2 == 0 else ("new", "old")
        for variant in order:
            sec, nrows = run(old_mod if variant == "old" else new_mod)
            out[variant].append(round(sec, 3))
            rows_seen.add((variant, nrows))
    # sanity: the variants should return the same row count — when they
    # don't (e.g. an algorithmic change like the bucket cap alters the
    # candidate set), say so LOUDLY so the timing comparison is read as
    # non-equivalent work, and report counts per variant
    counts = {
        v: sorted({n for (vv, n) in rows_seen if vv == v})
        for v in ("old", "new")
    }
    out["rows"] = counts
    if counts["old"] != counts["new"]:
        print(
            f"WARNING: variants returned different row counts {counts} — "
            "timings compare non-equivalent work",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
