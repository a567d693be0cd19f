"""Index integrity audit job (operators/fsck.py), launched via
spark-submit:

    spark-submit --master local[8] --py-files dist/engine.zip \
        jobs/fsck.py --index-root <dir> [--corpus <parquet dir>] \
        [--sha-sample-mod 16]

Prints the report as one JSON object and exits non-zero when any check
fails — cron/orchestrator friendly (a nightly audit of a 100 TB index is
one spark-submit). ``--corpus`` enables the source ⇔ index content
sha256 recheck; ``--sha-sample-mod N`` checks a deterministic 1/N
document sample instead of every row.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-root", required=True)
    ap.add_argument(
        "--corpus",
        help="parquet dir of the source corpus (normalized CORPUS shape) "
        "for the content_sha256 source-vs-index recheck",
    )
    ap.add_argument("--sha-sample-mod", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fcs3-fsck").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.fsck import fsck_index

    corpus = spark.read.parquet(args.corpus) if args.corpus else None
    report = fsck_index(
        spark,
        IndexStore(args.index_root),
        corpus=corpus,
        sha_sample_mod=args.sha_sample_mod,
    )
    print(json.dumps(report, sort_keys=True))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
