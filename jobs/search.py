"""Top-k BM25 search job (SURVEY.md §3.1), launched via spark-submit:

    spark-submit --master local[8] --py-files dist/engine.zip \
        jobs/search.py --index-root <dir> --query "merge segment" [--k 10]

Prints one JSON line per hit (doc_id, score) in rank order.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="bmw", choices=["bmw", "exhaustive"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fcs3-search").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.plans.search import search_index

    store = IndexStore(args.index_root)
    hits = search_index(spark, store, args.query, k=args.k, mode=args.mode)
    for row in hits.collect():
        print(json.dumps({"doc_id": row["doc_id"], "score": row["score"]}))
    spark.stop()


if __name__ == "__main__":
    main()
