"""Concurrent-serving QPS bench (VERDICT r04 next-round #6).

Every latency number in BENCH_r0* so far is a single serial query; a
serving tier is graded on throughput under concurrency. This harness
runs N client threads against ONE Collection on a warm sf0.1 packed
index (Spark FAIR scheduler, one pool per client so no client starves),
over a fixed 12-query mix (AND / OR / NOT / phrase / paging), and
reports:

  * QPS vs concurrency (1/2/4/8 clients), cache OFF — the raw engine;
  * QPS vs concurrency, result cache ON with a Zipf-skewed query stream
    (80% of draws from the top 3 queries — a realistic serving mix);
  * cross-process L2: a FRESH PROCESS with an empty L1 replays the mix
    against the sqlite shared cache the first process populated, and
    its hit rate + warm-vs-cold latency are recorded.

Threads share one SparkSession (the JVM scheduler interleaves jobs;
that IS the serving model for a Spark-backed engine — one driver, many
request threads).

Usage:
  PYTHONPATH=/root/repo python scripts/bench_qps.py \
      [--sf-dir /root/testdata/sf0.1] [--secs 20] [--out BENCH/QPS_r05.md]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERY_MIX = [
    "spark merge",
    "table OR hash",
    "query window",
    "merge -slow",
    '"spark merge"',
    "scan line value",
    "index OR vector OR codec",
    "spark merge table",
    "slow query",
    "hash join",
    "window scan",
    "table line",
]


def zipf_stream(rng: random.Random):
    # 80% of draws from the 3 hottest queries, the tail uniform
    while True:
        if rng.random() < 0.8:
            yield QUERY_MIX[rng.randrange(3)]
        else:
            yield QUERY_MIX[rng.randrange(len(QUERY_MIX))]


def run_clients(spark, col, n_clients: int, secs: float, zipf: bool) -> dict:
    stop = time.monotonic() + secs
    counts = [0] * n_clients
    errors: list[str] = []

    def client(i: int) -> None:
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"client{i}"
        )
        rng = random.Random(1000 + i)
        stream = zipf_stream(rng) if zipf else None
        j = 0
        try:
            while time.monotonic() < stop:
                q = next(stream) if stream else QUERY_MIX[
                    (i + j) % len(QUERY_MIX)
                ]
                col.search(q, k=10).collect()
                counts[i] += 1
                j += 1
        except Exception as e:  # surface, don't hang the join
            errors.append(f"client{i}: {e}")

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(n_clients)
    ]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    if errors:
        raise SystemExit("\n".join(errors))
    return {"qps": round(sum(counts) / wall, 2), "queries": sum(counts)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--secs", type=float, default=20.0)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--out", default=str(REPO / "BENCH" / "QPS_r05.md"))
    ap.add_argument("--l2-child", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fastcatsearch3_spark import Collection, EngineConfig
    from fastcatsearch3_spark.operators.ingest import load_documents

    cfg = EngineConfig(num_shards=8, store_positions=True)

    if args.l2_child:
        # fresh process, EMPTY L1: every hit below comes from the sqlite
        # L2 the parent populated
        col = Collection(
            spark, args.l2_child, cfg, cache_size=256, shared_cache=True
        )
        t0 = time.monotonic()
        for q in QUERY_MIX:
            col.search(q, k=10).collect()
        warm = time.monotonic() - t0
        print(json.dumps({
            "hits": col.cache_hits, "misses": col.cache_misses,
            "shared_hits": col.shared_hits, "wall_s": round(warm, 2),
        }))
        return

    root = Path(os.environ.get("QPS_INDEX_ROOT", "/tmp/fcs3_qps_idx"))
    col_nocache = Collection(spark, str(root), cfg, cache_size=0)
    if not (root / "stats.json").exists():
        print("building index ...", flush=True)
        col_nocache.build(load_documents(spark, args.sf_dir))
    # warmup: every query once (JIT, python workers, lexicon cache)
    for q in QUERY_MIX:
        col_nocache.search(q, k=10).collect()

    lines = [
        "# Concurrent-serving QPS — sf0.1 packed index, "
        f"local[{args.cpus}] FAIR scheduler, {args.secs:.0f}s per cell",
        "",
        "Clients are threads against ONE Collection (one driver JVM, one"
        " scheduler pool per client). Cache-off streams rotate the full"
        " 12-query mix per client; cache-on streams are Zipf-skewed"
        " (80% of draws from the 3 hottest queries).",
        "",
        "| clients | QPS cache-off | scale | QPS cache-on (Zipf) | scale |",
        "|---|---|---|---|---|",
    ]
    base_off = base_on = None
    col_cache = Collection(
        spark, str(root), cfg, cache_size=256, shared_cache=True
    )
    for q in QUERY_MIX:  # populate caches once so 'on' rows measure serving
        col_cache.search(q, k=10).collect()
    for n in (1, 2, 4, 8):
        off = run_clients(spark, col_nocache, n, args.secs, zipf=False)
        on = run_clients(spark, col_cache, n, args.secs, zipf=True)
        base_off = base_off or off["qps"]
        base_on = base_on or on["qps"]
        lines.append(
            f"| {n} | {off['qps']} | {off['qps'] / base_off:.2f}× |"
            f" {on['qps']} | {on['qps'] / base_on:.2f}× |"
        )
        print(lines[-1], flush=True)
    hits, misses = col_cache.cache_hits, col_cache.cache_misses
    lines += [
        "",
        f"Cache-on totals across the sweep: {hits} hits /"
        f" {misses} misses ({hits / max(hits + misses, 1):.1%} hit rate).",
    ]

    # cross-process L2: a fresh process with an empty L1 replays the mix
    r = subprocess.run(
        [sys.executable, __file__, "--l2-child", str(root),
         "--cpus", str(args.cpus)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": str(REPO)},
    )
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit("l2 child failed")
    child = json.loads(r.stdout.strip().splitlines()[-1])
    lines += [
        "",
        "## Cross-process shared L2 (sqlite under the index root)",
        "",
        f"A fresh process (empty in-memory L1) replayed the 12-query mix:"
        f" {child['shared_hits']}/{len(QUERY_MIX)} served from the L2"
        f" populated by the first process"
        f" ({child['hits']} hits / {child['misses']} misses),"
        f" wall {child['wall_s']}s.",
    ]
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
