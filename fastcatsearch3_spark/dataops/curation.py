"""Corpus-curation operators for large-scale training-data pipelines.

Engine extensions beyond the fastcatsearch3 reference surface (the
reference stops at search; a 100 TB corpus feeding an LLM needs these
between ingest and training). Every operator is pure DataFrame algebra
over deterministic hashes, so each has an exact DuckDB oracle and a
predictable physical plan:

  * ``sample_stratified`` — per-stratum Bernoulli sampling keyed on
    md5(doc_id): a narrow map, zero shuffles, reproducible across
    engines/runs/cluster sizes (unlike ``df.sample``, whose output
    depends on partitioning).
  * ``mixture_weights`` — per-stratum token accounting → the sampling
    weight that retargets the corpus to a requested domain/language
    mixture: one map-side-combinable aggregate.
  * ``ngram_contamination`` — mark training docs sharing any word
    ``n``-gram with an evaluation/benchmark set: shingle both sides,
    hash-join on the shingle. The eval side is benchmark-sized (tiny vs
    the corpus), so Spark broadcasts it — the corpus is scanned once and
    never shuffled.
  * ``pack_sequences`` — concat-and-chunk sequence packing (the standard
    LLM pretraining batching): documents stream in a deterministic
    order inside ``n_buckets`` hash buckets; a running token total
    assigns each doc a (bucket, seq_id, start offset). Parallelism =
    n_buckets (each bucket is one window partition), so set n_buckets
    ≳ cluster cores at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastcatsearch3_spark.config import EngineConfig

def _token_count() -> F.Column:
    """Analyzed-token count without materializing the token array (matches
    the standard analyzer [a-z0-9]+ on lowercase corpora; build.py uses the
    same count-by-regex trick for document length). A function, not a
    module constant: Column construction needs an active SparkContext."""
    return F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
    ).cast("long")


def _hash01(key: F.Column, salt: str) -> F.Column:
    """Deterministic uniform [0,1) from the first 8 md5 hex digits —
    bit-identical in Spark and DuckDB, independent of partitioning."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key)), 1, 8), 16, 10
    )
    return h.cast("double") / F.lit(float(1 << 32))


def sample_stratified(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """(doc_id, stratum, u_e6): deterministic per-stratum Bernoulli sample.

    A doc survives iff hash01(doc_id) < rate(stratum). Pure projection +
    filter — no shuffle, no RNG state; the same doc set survives on any
    cluster size, which is what makes ablations reproducible."""
    u = _hash01(F.col("doc_id").cast("string"), salt)
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    return (
        docs.select(
            "doc_id",
            F.col(strata_col).alias("stratum"),
            u.alias("u"),
            rate.alias("rate"),
        )
        .where(F.col("u") < F.col("rate"))
        .select(
            "doc_id",
            "stratum",
            F.round(F.col("u") * 1e6).cast("long").alias("u_e6"),
        )
    )


def mixture_weights(
    docs: DataFrame,
    targets: dict[str, float],
    strata_col: str = "lang",
) -> DataFrame:
    """(stratum, docs, tokens, share_e6, weight_e6): current token share
    per stratum and the resampling weight target_share / current_share
    that retargets the corpus mixture (DoReMi/data-mixing style reweight,
    computed exactly). Strata absent from ``targets`` get weight 0."""
    agg = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(_token_count()).alias("tokens"),
    )
    total = agg.agg(F.sum("tokens").alias("total_tokens"))
    tgt = F.lit(0.0)
    for s, t in sorted(targets.items()):
        tgt = F.when(F.col("stratum") == s, F.lit(float(t))).otherwise(tgt)
    share = F.col("tokens") / F.col("total_tokens")
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "stratum",
            "docs",
            "tokens",
            F.round(share * 1e6).cast("long").alias("share_e6"),
            F.round((tgt / share) * 1e6).cast("long").alias("weight_e6"),
        )
    )


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """(doc_id, shared_ngrams): training docs sharing ≥1 word ``n``-gram
    with the eval set, with the count of distinct shared n-grams.

    Plan shape at 100 TB: the eval side (a benchmark) is tiny; its
    distinct shingle set broadcasts, so this is a single corpus scan with
    a broadcast join — NO corpus-wide shuffle. The train shingle stream
    is deliberately NOT deduplicated before the join (that distinct would
    shuffle every shingle of the corpus); only the matched rows — ∝ true
    contamination, not corpus size — reach the count-distinct aggregate.
    Docs also present in ``eval_docs`` are excluded (a doc always
    'contaminates' itself)."""
    cfg = cfg or EngineConfig()
    train_sh = _shingles(docs, n, distinct=False).join(
        F.broadcast(eval_docs.select("doc_id")), "doc_id", "left_anti"
    )
    eval_sh = F.broadcast(
        _shingles(eval_docs, n).select("shingle").distinct()
    )
    return (
        train_sh.join(eval_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("shingle")).alias("shared_ngrams"))
    )


def _shingles(docs: DataFrame, n: int, distinct: bool = True) -> DataFrame:
    """Word n-grams per doc over the analyzed token stream (DISTINCT per
    doc by default; pass distinct=False when the consumer dedups later —
    the distinct here is a corpus-wide shuffle)."""
    parts = ", ".join(f"toks[i + {k}]" for k in range(n))
    sh = F.expr(
        f"transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', {parts}))"
    )
    out = (
        docs.select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0
            ).alias("toks"),
        )
        .where(F.size("toks") >= n)
        .select("doc_id", F.explode(sh).alias("shingle"))
    )
    return out.distinct() if distinct else out


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    n_buckets: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """(doc_id, bucket, seq_id, start_off, tokens): concat-and-chunk
    sequence packing. Docs are hashed into ``n_buckets`` independent
    streams; within a bucket they concatenate in doc_id order and chunk
    into ``capacity``-token sequences (documents may straddle a chunk
    boundary — the standard pretraining packing). seq_id / start_off are
    derived from the running token total with one window per bucket;
    buckets are the parallelism unit AND the determinism unit: the
    packing depends only on (doc_id, tokens), never on partitioning."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        % n_buckets
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            "doc_id", bucket.alias("bucket"), _token_count().alias("tokens")
        )
        .where(F.col("tokens") > 0)
        .withColumn("cum", F.sum("tokens").over(w))
        .select(
            "doc_id",
            "bucket",
            F.floor((F.col("cum") - F.col("tokens")) / capacity)
            .cast("long")
            .alias("seq_id"),
            ((F.col("cum") - F.col("tokens")) % capacity)
            .cast("long")
            .alias("start_off"),
            "tokens",
        )
    )
