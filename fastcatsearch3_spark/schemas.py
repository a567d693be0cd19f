"""Pinned schemas (SURVEY.md §1: fixed, declared — never inferred).

The reference declares schemas in XML (core:ir.settings.SchemaSetting [K]);
here every table the engine reads or writes has a StructType pinned in this
one module, asserted at ingest and at every checkpoint boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Rule-shaped source table (BASELINE.json input_hint) + stamped invariants.
CORPUS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("content_sha256", T.StringType(), True),
    ]
)

# Per-segment document map: dense segment-local docNo per shard
# (the reference's segment-local docNo design, core:ir.document [K]).
DOCMAP = T.StructType(
    [
        T.StructField("segment_id", T.IntegerType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("docno", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("pk_hash", T.LongType(), False),
        T.StructField("dl", T.LongType(), False),
        T.StructField("content_sha256", T.StringType(), True),
    ]
)

# Packed inverted index (SURVEY.md §1.2): one row per (term, segment, shard).
POSTINGS = T.StructType(
    [
        T.StructField("segment_id", T.IntegerType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
        T.StructField("postings", T.BinaryType(), False),
    ]
)

# Positional variant (J-5, EngineConfig.store_positions): positions is a
# SEPARATE blob column so non-phrase queries never scan a positions byte
# (Lucene's .doc/.pos split, re-expressed as parquet column pruning).
POSTINGS_POS = T.StructType(
    POSTINGS.fields + [T.StructField("positions", T.BinaryType(), True)]
)

# Merged global term dictionary (I-7).
LEXICON = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
    ]
)

# Delete-set (P-7 / J-7): doc_ids superseded or tombstoned by later segments.
DELETES = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("segment_id", T.IntegerType(), False),
    ]
)

# Search hit (query path output before hydration).
HITS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def assert_schema(df: DataFrame, expected: T.StructType, name: str) -> None:
    """Structural check: same field names/types in order (nullability lax —
    parquet round-trips legitimately relax it)."""
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in expected.fields]
    if got != want:
        raise ValueError(
            f"schema mismatch for {name}:\n  got:  {got}\n  want: {want}"
        )
