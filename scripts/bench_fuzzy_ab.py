"""A/B: SymSpell deletion-neighborhood artifact vs lexicon levenshtein scan
on a >= 1M-term synthetic lexicon (VERDICT r3 #6 done-criterion).

Builds a fake IndexStore directory holding only a sorted 1M-term lexicon
(deterministic alphanumeric terms, zipf-ish dfs), builds the fuzzy
artifact over it, then times per-query expansion through both paths,
interleaved, and asserts they return identical expansions.

Usage:
  python scripts/bench_fuzzy_ab.py [--terms 1000000] [--queries 20]
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
    from fastcatsearch3_spark.operators.fuzzy import (
        fuzzy_expand,
        fuzzy_index_build,
    )

    root = Path(tempfile.mkdtemp(prefix="fcs3_fuzzy_ab_"))
    # deterministic synthetic lexicon: base36-ish tokens, 4-12 chars
    n = args.terms
    lex = (
        spark.range(n)
        .select(
            F.concat(
                F.lit("t"),
                F.conv(F.col("id").cast("string"), 10, 36),
                F.substring(F.sha2(F.col("id").cast("string"), 256), 1, 4),
            ).alias("term"),
            (F.pmod(F.xxhash64("id"), F.lit(9999)) + 1).alias("df"),
        )
    )
    (
        lex.repartitionByRange(2 * args.cpus, F.col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(str(root / "lexicon"))
    )
    (root / "stats.json").write_text(json.dumps({
        "n_docs": n, "avgdl": 10.0,
        "config": {"num_shards": 8},
    }))
    store = IndexStore(str(root))

    t0 = time.monotonic()
    fuzzy_index_build(spark, store, max_dist=2)
    build_s = round(time.monotonic() - t0, 1)
    n_rows = spark.read.parquet(
        str(Path(store.root, "fuzzy", store.epoch(), "data"))
    ).count()

    # query stems: real terms with a deletion/substitution applied
    sample = [r["term"] for r in spark.read.parquet(str(root / "lexicon"))
              .orderBy(F.crc32(F.col("term"))).limit(args.queries).collect()]
    stems = [t[:-1] if i % 2 == 0 else ("x" + t[1:]) for i, t in enumerate(sample)]

    def scan_expand(stem: str, d: int = 2, limit: int = 32) -> list[str]:
        lexdf = spark.read.parquet(str(root / "lexicon"))
        ln = len(stem)
        rows = (
            lexdf.where(
                (F.length("term") >= ln - d) & (F.length("term") <= ln + d)
            )
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(stem)))
            .where(F.col("dist") <= d)
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(limit)
            .collect()
        )
        return [r["term"] for r in rows]

    res = {"artifact": [], "scan": []}
    mismatch = 0
    for i, stem in enumerate(stems):
        order = (
            [("artifact", lambda s=stem: fuzzy_expand(spark, store, s, 2, 32)),
             ("scan", lambda s=stem: scan_expand(s))]
        )
        if i % 2:
            order.reverse()
        got = {}
        for name, fn in order:
            t0 = time.monotonic()
            got[name] = fn()
            res[name].append(round(time.monotonic() - t0, 4))
        if got["artifact"] != got["scan"]:
            mismatch += 1
            print(f"MISMATCH {stem}: {got['artifact']} vs {got['scan']}")
    out = {
        "terms": n, "artifact_rows": n_rows, "build_s": build_s,
        "queries": len(stems), "mismatches": mismatch,
        "artifact_median_s": round(statistics.median(res["artifact"]), 4),
        "scan_median_s": round(statistics.median(res["scan"]), 4),
        "artifact_raw": res["artifact"], "scan_raw": res["scan"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
