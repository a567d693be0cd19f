"""Incremental indexing job (SURVEY.md ST-1/ST-4), launched via
spark-submit:

    # drain a drop-directory of rule-shaped parquet into the index
    spark-submit --py-files dist/engine.zip jobs/incremental.py \
        --index-root <dir> --input <drop dir> --checkpoint <ckpt dir>

    # compact all live segments into one (purges tombstones)
    spark-submit --py-files dist/engine.zip jobs/incremental.py \
        --index-root <dir> --compact
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--input")
    ap.add_argument("--checkpoint")
    ap.add_argument("--compact", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fcs3-incremental").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.streaming import incremental as inc

    if args.compact:
        manifest = inc.compact(spark, args.index_root)
        print(json.dumps({"job": "compact", **manifest["metrics"],
                          "n_docs": manifest["n_docs"]}))
    else:
        if not (args.input and args.checkpoint):
            ap.error("--input and --checkpoint required unless --compact")
        inc.run_incremental_stream(
            spark, args.input, args.index_root, checkpoint_dir=args.checkpoint
        )
        store = IndexStore(args.index_root)
        print(json.dumps({"job": "incremental", "segments": store.segments()}))
    spark.stop()


if __name__ == "__main__":
    main()
