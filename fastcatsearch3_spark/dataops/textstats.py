"""Text-analysis operators for training-data pipelines.

Engine extensions beyond the fastcatsearch3 reference surface: language
identification (stopword-lexicon heuristic), quality scoring
(length / punctuation / stopword ratios), token counting (whitespace and
BPE-ish regex) and k-min-sketch document fingerprinting. All pure
DataFrame algebra → DuckDB-mirrorable; all single-pass aggregates →
trivially scalable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.operators.build import tokens_raw_column

# tiny per-language function-word lexicons for the n-gram/stopword
# heuristic language id (deterministic; ties break by lexicon order)
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "fr": ("le", "la", "les", "et", "de", "un", "est"),
    "es": ("el", "la", "los", "y", "de", "un", "es"),
    "de": ("der", "die", "das", "und", "ein", "ist", "zu"),
    "zh": ("的", "是", "了", "在", "和", "有", "不"),
}

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

FINGERPRINT_K = 4  # k-min sketch width


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens): whitespace token count and BPE-ish
    regex token count."""
    return docs.select(
        "doc_id",
        # drop empty fragments without an interpreted lambda HOF:
        # size(a) - |empties| via array_remove stays in whole-stage codegen
        F.size(F.array_remove(F.split(F.col("text"), "\\s+"), ""))
        .cast("long")
        .alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0))
        .cast("long")
        .alias("bpe_tokens"),
    )


def lang_id(docs: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """(doc_id, pred_lang): argmax of per-language stopword hit counts over
    the analyzed token stream; deterministic tie-break by lexicon order.
    Docs with zero hits in every lexicon get 'und' (undetermined)."""
    cfg = cfg or EngineConfig()
    toks = tokens_raw_column(cfg)
    t = docs.withColumn("toks", toks(F.col("text")))
    hit_cols = []
    for lang, words in LANG_LEXICONS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hit_cols.append(
            F.size(F.array_intersect("toks", arr)).alias(f"hits_{lang}")
        )
    t = t.select("doc_id", *hit_cols)
    langs = list(LANG_LEXICONS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier lexicons win ties
        pred = F.when(F.col(f"hits_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    return t.select("doc_id", pred.alias("pred_lang"))


def quality_score(docs: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """(doc_id, n_chars, alnum_ratio_e4, stopword_ratio_e4, quality_e4):
    simple composable quality heuristics —
      alnum_ratio    = alphanumeric+space chars / chars
      stopword_ratio = English-stopword tokens / tokens
      quality        = alnum_ratio * least(1, tokens/20) (length prior)
    """
    cfg = cfg or EngineConfig()
    toks = tokens_raw_column(cfg)
    t = (
        docs.withColumn("toks", toks(F.col("text")))
        .withColumn("n_chars", F.length("text").cast("long"))
        .withColumn(
            "n_alnum",
            F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", "")).cast(
                "long"
            ),
        )
        .withColumn(
            "n_toks",
            F.when(F.col("toks")[0] == "", 0).otherwise(F.size("toks")).cast("long"),
        )
        .withColumn(
            # multiset membership count without an interpreted lambda HOF:
            # occurrences of w in toks == size(toks) - size(array_remove(toks, w));
            # 7 codegen'd array passes beat one interpreted filter() (~40%
            # measured on the analyzer hot path, see operators/build.py notes)
            "n_stop",
            sum(
                (F.size("toks") - F.size(F.array_remove("toks", w)))
                for w in LANG_LEXICONS["en"]
            ).cast("long"),
        )
    )
    alnum_ratio = F.when(F.col("n_chars") > 0, F.col("n_alnum") / F.col("n_chars")).otherwise(0.0)
    stop_ratio = F.when(F.col("n_toks") > 0, F.col("n_stop") / F.col("n_toks")).otherwise(0.0)
    quality = alnum_ratio * F.least(F.lit(1.0), F.col("n_toks") / 20.0)
    return t.select(
        "doc_id",
        "n_chars",
        F.round(alnum_ratio * 10000).cast("long").alias("alnum_ratio_e4"),
        F.round(stop_ratio * 10000).cast("long").alias("stopword_ratio_e4"),
        F.round(quality * 10000).cast("long").alias("quality_e4"),
    )


# PII patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): no lookaround, no backrefs, explicit character classes
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"),
    ("phone", "\\+?[0-9][0-9()\\- ]{7,}[0-9]"),
)


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, text, n_pii): text with emails / IPv4s / phone-number runs
    replaced by ``<TYPE>`` tags, plus the count of replacements — a
    standard training-data redaction pass. Pure regexp_replace chain:
    single-pass, JVM-side, scales linearly."""
    out = docs.select("doc_id", "text")
    n_pii = F.lit(0).cast("long")
    for name, pat in PII_PATTERNS:
        n_pii = n_pii + (
            F.size(F.regexp_extract_all("text", F.lit(pat), 0))
        ).cast("long")
    out = out.withColumn("n_pii", n_pii)
    scrubbed = F.col("text")
    for name, pat in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return out.select("doc_id", scrubbed.alias("text"), "n_pii")


def unigram_logprob(
    docs: DataFrame, cfg: EngineConfig | None = None
) -> DataFrame:
    """(doc_id, n_toks, avg_logprob_e4): mean log-probability of the
    document's tokens under the corpus unigram distribution
    (p(t) = cf(t) / Σcf) — the LM-free "typicality" quality signal (a
    very negative mean = rare-token soup; near the corpus entropy =
    ordinary text). Shape at scale: the (doc_id, term, tf) relation is
    the index build's own tf pass; corpus probabilities are one term-
    keyed aggregate broadcast back onto it."""
    cfg = cfg or EngineConfig()
    from fastcatsearch3_spark.plans.sql_bm25 import tf_table

    docs_c = docs.withColumnRenamed("text", "content")
    tf = tf_table(docs_c, cfg)
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf").alias("total_cf"))
    return (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_toks"),
            (
                F.sum(
                    F.col("tf") * F.log(F.col("cf") / F.col("total_cf"))
                )
                / F.sum("tf")
            ).alias("alp"),
        )
        .select(
            "doc_id",
            "n_toks",
            F.round(F.col("alp") * 10000).cast("long").alias(
                "avg_logprob_e4"
            ),
        )
    )


def char_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, entropy_e4): Shannon entropy (bits/char) of the
    document's character distribution — a standard degenerate-text signal
    (near-0 = one repeated char; English prose ≈ 4-4.3 bits). Shape at
    scale: one explode to (doc_id, char) rows (∝ corpus bytes, the same
    class as the tokenize pass), one hash aggregate with map-side
    combine, one per-doc rollup — all JVM-side codegen, no Python."""
    counts = (
        docs.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .where(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log2("c")).alias("clogc"),
    )
    # H = log2(n) - (Σ c·log2 c)/n  — algebraic form avoids per-row p=c/n
    ent = F.log2("n") - F.col("clogc") / F.col("n")
    return per_doc.select(
        "doc_id",
        F.col("n").cast("long").alias("n_chars"),
        F.round(ent * 10000).cast("long").alias("entropy_e4"),
    )


def repetition_stats(
    docs: DataFrame, cfg: EngineConfig | None = None
) -> DataFrame:
    """(doc_id, n_bigrams, top_bigram_frac_e4, dup_trigram_frac_e4):
    Gopher-style repetition quality signals —
      top_bigram_frac  = occurrences of the most frequent word 2-gram
                         / total 2-grams
      dup_trigram_frac = 1 − distinct 3-grams / total 3-grams
    High values flag boilerplate / degenerate repetition. Shape at scale:
    each signal is ONE hash aggregate on (doc_id, shingle) with map-side
    combine (rows ∝ document tokens, same class as the index build's tf
    pass), then a per-doc rollup — no joins wider than doc_id."""
    cfg = cfg or EngineConfig()
    from fastcatsearch3_spark.dataops.dedup import shingles

    bi = (
        shingles(docs, cfg, n=2, distinct=False)
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.max("c").cast("long").alias("top_bigram"),
        )
    )
    tri = (
        shingles(docs, cfg, n=3, distinct=False)
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_trigrams"),
            F.count("*").cast("long").alias("n_distinct_tri"),
        )
    )
    return bi.join(tri, "doc_id").select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("top_bigram") / F.col("n_bigrams") * 10000)
        .cast("long")
        .alias("top_bigram_frac_e4"),
        F.round(
            (1.0 - F.col("n_distinct_tri") / F.col("n_trigrams")) * 10000
        )
        .cast("long")
        .alias("dup_trigram_frac_e4"),
    )


def fingerprint(docs: DataFrame, cfg: EngineConfig | None = None,
                n: int = 3, k: int = FINGERPRINT_K) -> DataFrame:
    """(doc_id, fingerprint): k-min sketch — md5 of the k smallest
    md5(shingle) values (ordered). A compact near-dup-stable document
    signature (winnowing-style selection by hash rank)."""
    from fastcatsearch3_spark.dataops.dedup import shingles

    sh = shingles(docs, cfg, n).withColumn("h", F.md5("shingle"))
    ranked = sh.withColumn(
        "rk", F.row_number().over(Window.partitionBy("doc_id").orderBy("h"))
    ).where(F.col("rk") <= k)
    return ranked.groupBy("doc_id").agg(
        F.md5(F.concat_ws("", F.array_sort(F.collect_list("h")))).alias(
            "fingerprint"
        )
    )
