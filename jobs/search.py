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
    ap.add_argument("--offset", type=int, default=0, help="paging (O-2)")
    ap.add_argument("--mode", default="bmw", choices=["bmw", "exhaustive"])
    ap.add_argument(
        "--facet",
        help="instead of ranked hits, print facet counts of this corpus "
        "column over the full match set (requires --corpus)",
    )
    ap.add_argument(
        "--corpus", help="parquet dir of the source corpus (for --facet)"
    )
    ap.add_argument(
        "--batch",
        action="store_true",
        help="treat --query as a ;-separated batch; all queries share one "
        "postings scan (throughput mode)",
    )
    args = ap.parse_args()
    if args.batch and args.offset:
        ap.error("--batch does not support --offset (page per query instead)")
    if args.batch and args.facet:
        ap.error("--batch and --facet are mutually exclusive")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fcs3-search").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.plans.search import match_doc_ids, search_index

    store = IndexStore(args.index_root)
    if args.facet:
        if not args.corpus:
            ap.error("--facet requires --corpus")
        from pyspark.sql import functions as F

        ids = match_doc_ids(spark, store, args.query)
        docs = spark.read.parquet(args.corpus)
        out = (
            docs.join(ids, "doc_id")
            .groupBy(args.facet)
            .count()
            .orderBy(F.desc("count"), F.asc(args.facet))
        )
        for row in out.collect():
            print(json.dumps({args.facet: row[args.facet], "count": row["count"]}))
    elif args.batch:
        from fastcatsearch3_spark.plans.search import search_many

        qs = {
            f"q{i}": q.strip()
            for i, q in enumerate(args.query.split(";"))
            if q.strip()
        }
        for row in search_many(
            spark, store, qs, k=args.k, mode=args.mode
        ).collect():
            print(
                json.dumps(
                    {
                        "query_id": row["query_id"],
                        "doc_id": row["doc_id"],
                        "score": row["score"],
                    }
                )
            )
    else:
        hits = search_index(
            spark, store, args.query, k=args.k, mode=args.mode,
            offset=args.offset,
        )
        for row in hits.collect():
            print(json.dumps({"doc_id": row["doc_id"], "score": row["score"]}))
    spark.stop()


if __name__ == "__main__":
    main()
