"""Corpus ingest + invariant stamping (SURVEY.md I-1, S-1..S-5).

The reference pulls documents from pluggable DataSourceReaders (JDBC,
delimited files, JSON — server:org.fastcatsearch.datasource.reader.* [K]);
Spark's built-in readers subsume those, so this module only normalizes
whatever arrives into the pinned CORPUS schema and stamps the per-row
integrity invariant ``content_sha256`` (BASELINE.json input_hint).

Two accepted shapes:
  * rule-shaped: (repo, path, commit, lang, content)  — doc_id derived as
    xxhash64(repo, path, commit), stable across resumes (never
    monotonically_increasing_id; SURVEY.md §7 hard part b);
  * driver testdata `documents`: (doc_id, text, lang, source, n_chars) —
    mapped per FIXTURES.md (text→content, source→repo, synthetic
    path/commit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastcatsearch3_spark import schemas


def normalize_corpus(df: DataFrame) -> DataFrame:
    """Coerce a source DataFrame into the pinned CORPUS schema."""
    cols = set(df.columns)
    if {"repo", "path", "commit", "content"}.issubset(cols):
        out = df
        if "lang" not in cols:
            out = out.withColumn("lang", F.lit(None).cast("string"))
        if "doc_id" not in cols:
            out = out.withColumn(
                "doc_id", F.xxhash64(F.col("repo"), F.col("path"), F.col("commit"))
            )
    elif {"doc_id", "text"}.issubset(cols):  # driver `documents` testdata
        out = (
            df.withColumnRenamed("text", "content")
            .withColumn("repo", F.col("source"))
            .withColumn(
                "path", F.concat(F.lit("doc/"), F.col("doc_id").cast("string"), F.lit(".txt"))
            )
            .withColumn("commit", F.sha1(F.col("doc_id").cast("string")))
        )
    else:
        raise ValueError(f"unrecognized corpus shape: {sorted(cols)}")
    out = out.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    out = out.select(
        F.col("doc_id").cast("long"),
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        "content_sha256",
    )
    schemas.assert_schema(out, schemas.CORPUS, "corpus")
    return out


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the driver-provided documents table as a normalized corpus."""
    return normalize_corpus(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def verify_sha256(df: DataFrame) -> int:
    """Per-row integrity check (BASELINE.json input_hint): recompute the
    content hash and count mismatches. Returns the mismatch count (0 = ok).
    Runs as one aggregate — no collect of row data."""
    return (
        df.select(
            F.when(
                F.sha2(F.col("content"), 256) != F.col("content_sha256"), 1
            )
            .otherwise(0)
            .alias("bad")
        )
        .agg(F.sum("bad").alias("n"))
        .collect()[0]["n"]
        or 0
    )


def sha256_digest(df: DataFrame, col: str = "content_sha256") -> int:
    """Order-insensitive corpus digest: xor of the first 15 hex digits of
    each row's sha, as a bigint. Recorded in build manifests so a resumed
    build can prove it saw the same rows (I-8)."""
    row = df.agg(
        F.expr(f"bit_xor(cast(conv(substr({col}, 1, 15), 16, 10) as bigint))").alias("d"),
        F.count("*").alias("n"),
    ).collect()[0]
    return {"xor15": int(row["d"] or 0), "rows": int(row["n"])}
