"""A/B: wildcard/regex expansion with vs without the literal-prefix
StartsWith bound, on a >= 1M-term sorted lexicon.

The MultiTermQuery rewrite (plans/search.expand_pattern) pushes the
pattern's literal leading run as a StartsWith on the range-partitioned,
sorted term column before applying the anchored rlike — at cluster scale
that is the difference between a handful of pruned row groups and a full
vocab scan per query. This harness measures both paths interleaved on
the same patterns and asserts they return identical expansions.

Usage:
  python scripts/bench_wildcard_ab.py [--terms 1000000] [--queries 20]
        [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--terms", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(2 * args.cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.plans.search import expand_pattern

    root = Path(tempfile.mkdtemp(prefix="fcs3_wc_ab_"))
    # deterministic synthetic lexicon, same generator as bench_fuzzy_ab
    n = args.terms
    lex = spark.range(n).select(
        F.concat(
            F.lit("t"),
            F.conv(F.col("id").cast("string"), 10, 36),
            F.substring(F.sha2(F.col("id").cast("string"), 256), 1, 4),
        ).alias("term"),
        (F.pmod(F.xxhash64("id"), F.lit(9999)) + 1).alias("df"),
    )
    (
        lex.repartitionByRange(2 * args.cpus, F.col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(str(root / "lexicon"))
    )
    (root / "stats.json").write_text(
        json.dumps({"n_docs": n, "avgdl": 10.0, "config": {"num_shards": 8}})
    )
    store = IndexStore(str(root))

    # query patterns from real terms: keep a >=5-char literal prefix,
    # wildcard the tail — the shape an interactive "t3k9a?*"-style query
    # has, where the prefix bound prunes almost everything
    sample = [
        r["term"]
        for r in spark.read.parquet(str(root / "lexicon"))
        .orderBy(F.crc32(F.col("term")))
        .limit(args.queries)
        .collect()
    ]
    pats = [t[: max(5, len(t) - 3)] + "?*" for t in sample]

    res = {"bounded": [], "fullscan": []}
    mismatch = 0
    for i, pat in enumerate(pats):
        order = [
            ("bounded", lambda p=pat: expand_pattern(
                spark, store, p, "wildcard", 32, prefix_bound=True)),
            ("fullscan", lambda p=pat: expand_pattern(
                spark, store, p, "wildcard", 32, prefix_bound=False)),
        ]
        if i % 2:
            order.reverse()
        got = {}
        for name, fn in order:
            t0 = time.monotonic()
            got[name] = fn()
            res[name].append(round(time.monotonic() - t0, 4))
        if got["bounded"] != got["fullscan"]:
            mismatch += 1
            print(f"MISMATCH {pat}: {got['bounded']} vs {got['fullscan']}")
    out = {
        "terms": n,
        "queries": len(pats),
        "mismatches": mismatch,
        "bounded_median_s": round(statistics.median(res["bounded"]), 4),
        "fullscan_median_s": round(statistics.median(res["fullscan"]), 4),
        "bounded_raw": res["bounded"],
        "fullscan_raw": res["fullscan"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
