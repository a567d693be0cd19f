"""Pure-DataFrame BM25 (SURVEY.md §7 M1) — the declarative scoring path.

Expresses the whole BM25 pipeline as stock DataFrame algebra (joins +
aggregations, everything inside Catalyst/whole-stage-codegen except the
analyzer UDF), with NO packed postings and NO custom kernel. Two jobs:

  1. the M1 correctness baseline — the packed/kernel path in
     plans/search.py must be rank-identical to this (pytest);
  2. the SQL-expressible face the driver's DuckDB oracle can mirror
     (__spark_entry__.oracle_sql).

This is also exactly the plan shape Catalyst would pick on its own:
tf/df aggregations are partial+final hash aggs, the query-term restriction
is a pushed-down isin, the tiny per-term stats join is a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.operators.build import dl_column, tokens_raw_column


def tf_table(corpus: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """(doc_id, dl, term, tf) — the unpacked posting relation (I-3's
    map-side output as a plain DataFrame). The occurrence→tf combine is a
    JVM hash aggregate (partial+final) over the exploded token stream."""
    cfg = cfg or EngineConfig()
    toks = tokens_raw_column(cfg)
    # explode_outer avoids Catalyst's generator-pruning filter, which would
    # re-evaluate the analyzer UDF a second time (see operators/build.py)
    occ = (
        corpus.withColumn("toks", toks(F.col("content")))
        .withColumn("dl", dl_column("toks"))
        .select("doc_id", "dl", F.explode_outer("toks").alias("term"))
        .where(F.col("term").isNotNull() & (F.col("term") != ""))
    )
    return occ.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))


def doclens(corpus: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """(doc_id, dl) via size of the analyzed token stream (A-6)."""
    tf = tf_table(corpus, cfg)
    return tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))


def lexicon_df(corpus: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """(term, df, cf) directly from the corpus (I-7 / A-5)."""
    tf = tf_table(corpus, cfg)
    return tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


def bm25_scores(
    corpus: DataFrame,
    terms: list[str],
    op: str = "AND",
    cfg: EngineConfig | None = None,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Unlimited BM25 score relation (doc_id, score) as pure DataFrame
    algebra over the unpacked tf relation.

    Plan: tf (scan+agg) ⋈ broadcast(query terms) ⋈ broadcast(per-term df)
    ⨯ broadcast(corpus stats) → per-(doc,term) partial score →
    groupBy(doc_id) sum → AND gate (count(term) = |terms|).
    """
    cfg = cfg or EngineConfig()
    if not terms:
        raise ValueError("empty term list")
    terms = list(dict.fromkeys(terms))
    tf = tf if tf is not None else tf_table(corpus, cfg)

    stats = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qtf = tf.where(F.col("term").isin(terms))
    dfreq = qtf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        qtf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn(
            "partial",
            F.col("idf")
            * F.col("tf")
            * (cfg.k1 + 1.0)
            / (
                F.col("tf")
                + cfg.k1 * (1.0 - cfg.b + cfg.b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("partial").alias("score"), F.count("term").alias("nt")
    )
    if op == "AND":
        agg = agg.where(F.col("nt") == len(terms))
    return agg.select("doc_id", "score")


def tfidf_topk(
    corpus: DataFrame,
    terms: list[str],
    k: int = 10,
    op: str = "AND",
    cfg: EngineConfig | None = None,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Classic TF-IDF similarity (the Lucene TFIDFSimilarity family the
    reference's pre-BM25 scoring belongs to [M]; BM25 stays the engine
    default per the north rule):

        score(q, d) = Σ_t  √tf(t,d) · (1 + ln(N / (df(t) + 1)))² · 1/√dl(d)

    Same declarative plan shape as :func:`bm25_scores` — only the partial
    expression differs, which is the point: alternative similarities are
    one scoring expression away on this path."""
    cfg = cfg or EngineConfig()
    if not terms:
        raise ValueError("empty term list")
    terms = list(dict.fromkeys(terms))
    tf = tf if tf is not None else tf_table(corpus, cfg)

    ndocs = tf.groupBy("doc_id").count().agg(
        F.count("*").alias("n_docs")
    )
    qtf = tf.where(F.col("term").isin(terms))
    dfreq = qtf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        qtf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "idf", 1.0 + F.log(F.col("n_docs") / (F.col("df") + 1.0))
        )
        .withColumn(
            "partial",
            F.sqrt(F.col("tf"))
            * F.col("idf") * F.col("idf")
            / F.sqrt(F.col("dl")),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("partial").alias("score"), F.count("term").alias("nt")
    )
    if op == "AND":
        agg = agg.where(F.col("nt") == len(terms))
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk(
    corpus: DataFrame,
    terms: list[str],
    k: int = 10,
    op: str = "AND",
    cfg: EngineConfig | None = None,
    round_score: int | None = 4,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Top-k over :func:`bm25_scores` — compiles to TakeOrderedAndProject."""
    out = bm25_scores(corpus, terms, op=op, cfg=cfg, tf=tf)
    if round_score:
        out = out.select("doc_id", F.round("score", round_score).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
