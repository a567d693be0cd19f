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


def _term_base(
    corpus: DataFrame, terms: list[str], cfg: EngineConfig
) -> DataFrame:
    """(doc_id, dl, tf_0..tf_{n-1}) — per-doc query-term tfs computed
    COLUMNAR inside one projection over a single analyzer pass:
    tf_i = size(toks) - size(array_remove(toks, term_i)), a codegen'd
    array expression per term. No explode, no per-(doc,term) relation,
    no corpus-wide hash aggregate — the only Python-side work is the
    Arrow-batched analyzer UDF itself.

    Under-parallel inputs (a small cached corpus arrives as 1-3
    partitions; at cluster scale a parquet scan has thousands) are
    repartitioned up to defaultParallelism BEFORE the analyzer — this
    plan has no shuffle of its own below the tiny aggregate, so unlike
    the old explode/agg shape nothing downstream would otherwise restore
    parallelism (same guard as operators/build.build_segment)."""
    spark = corpus.sparkSession
    target = spark.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < target:
        corpus = corpus.repartition(target, F.col("doc_id"))
    toks = tokens_raw_column(cfg)
    base = corpus.withColumn("toks", toks(F.col("content")))
    # every output is coalesce-wrapped to be provably NON-nullable: the
    # downstream match gate is a join condition, and
    # InferFiltersFromConstraints would otherwise derive isnotnull(tf_i)
    # filters that push below this projection and re-evaluate the analyzer
    # in an extra serial pass (measured). Coalesce with a literal fallback
    # makes IsNotNull fold to true instead. (The values are never null
    # anyway — the UDF fills nulls with "".)
    zero = F.lit(0).cast("long")
    cols = [
        F.col("doc_id"),
        F.coalesce(dl_column("toks"), zero).alias("dl"),
    ]
    for i, t in enumerate(terms):
        # the [""]-valued empty stream can never contain a query term
        # (terms are non-empty), so the difference is exact there too
        cols.append(
            F.coalesce(
                (F.size("toks") - F.size(F.array_remove("toks", t))).cast(
                    "long"
                ),
                zero,
            ).alias(f"tf_{i}")
        )
    return base.select(*cols)


def bm25_scores(
    corpus: DataFrame,
    terms: list[str],
    op: str = "AND",
    cfg: EngineConfig | None = None,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Unlimited BM25 score relation (doc_id, score) as pure DataFrame
    algebra — the declarative path that re-derives everything from the
    raw corpus per query (no packed index).

    Plan (r4, replacing the r1 explode/join shape): per-doc columnar
    scoring. One projection computes every query term's tf next to dl
    (``_term_base``); ONE aggregate over it yields n_docs / avgdl / every
    per-term df in a single 1-row relation, broadcast back; the final
    score is a single codegen'd expression per doc (Σ over the fixed term
    list), gated on the per-doc match count. The r1 plan exploded the
    token stream and hash-aggregated the full (doc, term) relation twice
    (stats branch + query branch) — both of those corpus-sized
    intermediates are gone; each branch now pays only the analyzer UDF
    plus narrow columnar arithmetic (measured in BENCH/WARM_AB_r04.md).

    A precomputed ``tf`` relation (doc_id, dl, term, tf) routes through
    the legacy join plan instead — callers that already materialized the
    unpacked postings keep their shape.
    """
    cfg = cfg or EngineConfig()
    if not terms:
        raise ValueError("empty term list")
    terms = list(dict.fromkeys(terms))
    if tf is not None:
        return _bm25_scores_tf(terms, op, cfg, tf)

    n = len(terms)
    base = _term_base(corpus, terms, cfg)
    # Two plan rules make this ONE analyzer pass end to end (verified in
    # the executed plan: exactly one ArrowEvalPython + a ReusedExchange):
    #  1. re-exchange the NARROW projection (doc_id, dl, tf_*) — the stats
    #     branch and the scored branch then share an IDENTICAL exchange
    #     subtree, which Spark's ReuseExchange dedups, so the UDF above it
    #     runs once. Without this each branch re-tokenizes the corpus.
    #  2. no Filter may sit directly on the projection: deterministic
    #     predicates get substituted through Project (PushDownPredicate),
    #     duplicating the UDF into a second full pass (measured 2×). The
    #     dl>0 universe is expressed as conditional aggregates, and the
    #     match gate references the broadcast stats side (n_req), which
    #     pins it above the join.
    base = base.repartition(F.col("doc_id"))
    matched = F.lit(0)
    for i in range(n):
        matched = matched + (F.col(f"tf_{i}") > 0).cast("long")
    # stats universe = docs with a non-empty token stream (dl > 0) — the
    # same universe the unpacked tf relation / DuckDB oracle aggregates
    aggs = [
        F.sum((F.col("dl") > 0).cast("long")).alias("n_docs"),
        (F.sum("dl") / F.sum((F.col("dl") > 0).cast("long"))).alias("avgdl"),
        # n_req must be NON-foldable: a literal here gets constant-folded
        # (FoldablePropagation), turning the gate into a left-only
        # predicate that pushes below the projection and re-tokenizes the
        # corpus in a THIRD, serial pass (measured; see module docstring).
        # n_docs >= 0 is always true, so the value is exactly n/1.
        F.when(F.count(F.lit(1)) >= 0, F.lit(n if op == "AND" else 1))
        .alias("n_req"),
    ]
    aggs += [
        F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
        for i in range(n)
    ]
    stats = base.agg(*aggs)

    scored = base.crossJoin(F.broadcast(stats))
    partials = []
    nt = F.lit(0)
    for i in range(n):
        tf_i, df_i = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(
            1.0 + (F.col("n_docs") - df_i + 0.5) / (df_i + 0.5)
        )
        denom = tf_i + cfg.k1 * (
            1.0 - cfg.b + cfg.b * F.col("dl") / F.col("avgdl")
        )
        partials.append(
            F.when(tf_i > 0, idf * tf_i * (cfg.k1 + 1.0) / denom).otherwise(
                F.lit(0.0)
            )
        )
        nt = nt + (tf_i > 0).cast("long")
    score = partials[0]
    for p in partials[1:]:
        score = score + p
    return scored.where(nt >= F.col("n_req")).select(
        "doc_id", score.alias("score")
    )


def _bm25_scores_tf(
    terms: list[str], op: str, cfg: EngineConfig, tf: DataFrame
) -> DataFrame:
    """Legacy join plan over a precomputed unpacked tf relation."""
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
    if tf is not None:
        # legacy join plan over a precomputed unpacked tf relation
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

    # columnar per-doc plan, same shape (and same two plan rules — one
    # shared narrow exchange, no Filter on the projection) as bm25_scores
    n = len(terms)
    base = _term_base(corpus, terms, cfg).repartition(F.col("doc_id"))
    aggs = [
        F.sum((F.col("dl") > 0).cast("long")).alias("n_docs"),
        # n_req must be NON-foldable: a literal here gets constant-folded
        # (FoldablePropagation), turning the gate into a left-only
        # predicate that pushes below the projection and re-tokenizes the
        # corpus in a THIRD, serial pass (measured; see module docstring).
        # n_docs >= 0 is always true, so the value is exactly n/1.
        F.when(F.count(F.lit(1)) >= 0, F.lit(n if op == "AND" else 1))
        .alias("n_req"),
    ]
    aggs += [
        F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
        for i in range(n)
    ]
    stats = base.agg(*aggs)
    scored = base.crossJoin(F.broadcast(stats))
    partials = []
    nt = F.lit(0)
    for i in range(n):
        tf_i, df_i = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = 1.0 + F.log(F.col("n_docs") / (df_i + 1.0))
        partials.append(
            F.when(
                tf_i > 0,
                F.sqrt(tf_i) * idf * idf / F.sqrt(F.col("dl")),
            ).otherwise(F.lit(0.0))
        )
        nt = nt + (tf_i > 0).cast("long")
    score = partials[0]
    for p in partials[1:]:
        score = score + p
    return (
        scored.where(nt >= F.col("n_req"))
        .select("doc_id", score.alias("score"))
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
