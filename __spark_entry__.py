"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one operator from SURVEY.md §2 (ids in the
comments); ``oracle_sql()`` carries the DuckDB-equivalent ANSI SQL over the
driver's pre-registered views (documents / embeddings / events / ...).

Float-safety convention: every floating-point score column is exported as
``*_e4`` = CAST(ROUND(score * 10000) AS BIGINT) on BOTH sides, and ordering
ties are broken on the rounded value + id so the driver's order-insensitive
value-hash is bit-exact.  The testdata documents are lowercase-ASCII, so the
DuckDB tokenizer mirror ``regexp_extract_all(lower(text), '[a-z0-9]+')`` is
exactly the engine's standard analyzer on this corpus (the camelCase / CJK
branches never fire; they are covered by tests/test_analyzer.py goldens).
"""

from __future__ import annotations

import hashlib
import tempfile
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators.build import build_index
from fastcatsearch3_spark.operators.ingest import load_documents
from fastcatsearch3_spark.plans import sql_bm25
from fastcatsearch3_spark.plans.query import ParsedQuery
from fastcatsearch3_spark.plans.search import search_index

CFG = EngineConfig()

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_documents(spark, sf_dir)


def _e4(col: str = "score") -> F.Column:
    return F.round(F.col(col) * 10000).cast("long").alias(f"{col}_e4")


def _packed_store(spark: SparkSession, sf_dir: str) -> IndexStore:
    """Build (or resume) the packed index for a testdata dir.

    Cached on disk keyed by (sf_dir, engine config); ``build_index`` is
    manifest-resumable, so a warm cache skips all heavy work (I-8)."""
    key = hashlib.sha256(
        f"{sf_dir}|{sorted(CFG.to_dict().items())}".encode()
    ).hexdigest()[:16]
    root = Path(tempfile.gettempdir()) / "fcs3_index_cache" / key
    build_index(spark, _corpus(spark, sf_dir), str(root), CFG, resume=True)
    return IndexStore(str(root))


# DuckDB mirror of the standard analyzer on the (lowercase-ASCII) testdata.
_TOK = (
    "SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term"
    " FROM documents"
)
_TF = f"SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM ({_TOK}) GROUP BY doc_id, term"
_DL = f"SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM ({_TOK}) GROUP BY doc_id"


def _bm25_sql(terms: list[str], op: str, k: int, not_terms: list[str] | None = None,
              order_raw: bool = False) -> str:
    """DuckDB BM25 oracle (same formula/constants as EngineConfig)."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    gate = f"WHERE nt = {len(terms)}" if op == "AND" else ""
    excl = ""
    if not_terms:
        nlist = ", ".join(f"'{t}'" for t in not_terms)
        excl = (
            f"AND doc_id NOT IN (SELECT DISTINCT doc_id FROM ({_TOK}) "
            f"WHERE term IN ({nlist}))"
        )
        if not gate:
            gate = "WHERE TRUE " + excl
        else:
            gate = gate + " " + excl
    order = (
        "ORDER BY score DESC, doc_id ASC"
        if order_raw
        else "ORDER BY score_e4 DESC, doc_id ASC"
    )
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
stats AS (SELECT CAST(count(*) AS BIGINT) n_docs, avg(dl) avgdl FROM dl),
qtf AS (SELECT * FROM tf WHERE term IN ({tlist})),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) df FROM qtf GROUP BY term),
scored AS (
  SELECT q.doc_id,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * q.tf * ({CFG.k1} + 1.0)
           / (q.tf + {CFG.k1} * (1.0 - {CFG.b} + {CFG.b} * l.dl / s.avgdl)) AS partial
  FROM qtf q JOIN dfq d USING (term) JOIN dl l USING (doc_id) CROSS JOIN stats s
),
agg AS (SELECT doc_id, sum(partial) AS score, count(*) AS nt FROM scored GROUP BY doc_id),
final AS (SELECT doc_id, score, CAST(round(score * 10000) AS BIGINT) AS score_e4
          FROM agg {gate})
SELECT doc_id, score_e4 FROM final {order} LIMIT {k}
"""


# query constants (words present in the synthetic corpus vocabulary)
_Q_AND = ["spark", "merge", "table"]
_Q_AND2 = ["spark", "merge"]
_Q_OR = ["vector", "stream"]
_Q_NOT_POS = ["spark"]
_Q_NOT_NEG = ["slow"]
_K = 10


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: packed-index BM25 top-k over sf0.001 (build → search)."""
    store = _packed_store(spark, "/root/testdata/sf0.001")
    pq = ParsedQuery(terms=_Q_AND2, op="AND")
    return search_index(spark, store, pq, k=_K, mode="bmw")


# ---------------------------------------------------------------------------
# queries — Spark side
# ---------------------------------------------------------------------------

def _q_tf_table(spark, sf_dir):  # I-3 (map side): posting-entry relation
    return sql_bm25.tf_table(_corpus(spark, sf_dir), CFG).select(
        "doc_id", "term", F.col("tf").cast("long").alias("tf")
    )


def _q_lexicon(spark, sf_dir):  # I-7 / A-5: term → df, cf
    return sql_bm25.lexicon_df(_corpus(spark, sf_dir), CFG).select(
        "term", F.col("df").cast("long").alias("df"), F.col("cf").cast("long").alias("cf")
    )


def _q_doclens(spark, sf_dir):  # A-6: doc length
    return sql_bm25.doclens(_corpus(spark, sf_dir), CFG).select(
        "doc_id", F.col("dl").cast("long").alias("dl")
    )


def _q_corpus_sha256(spark, sf_dir):  # I-1: per-row integrity invariant
    return _corpus(spark, sf_dir).select("doc_id", "content_sha256")


def _q_bm25_and(spark, sf_dir):  # Q-4 declarative path, AND
    scores = sql_bm25.bm25_scores(_corpus(spark, sf_dir), _Q_AND, op="AND", cfg=CFG)
    return (
        scores.select("doc_id", _e4())
        .orderBy(F.desc("score_e4"), F.asc("doc_id"))
        .limit(_K)
    )


def _q_bm25_or(spark, sf_dir):  # Q-4 declarative path, OR (J-3)
    scores = sql_bm25.bm25_scores(_corpus(spark, sf_dir), _Q_OR, op="OR", cfg=CFG)
    return (
        scores.select("doc_id", _e4())
        .orderBy(F.desc("score_e4"), F.asc("doc_id"))
        .limit(_K)
    )


def _q_bm25_packed_and(spark, sf_dir):  # Q-3..Q-6 packed kernel path (U-5)
    store = _packed_store(spark, sf_dir)
    hits = search_index(spark, store, ParsedQuery(terms=_Q_AND2, op="AND"), k=_K)
    return hits.select("doc_id", _e4())


def _q_bm25_packed_not(spark, sf_dir):  # J-4 NOT clause on the packed path
    store = _packed_store(spark, sf_dir)
    pq = ParsedQuery(terms=_Q_NOT_POS, not_terms=_Q_NOT_NEG, op="AND")
    hits = search_index(spark, store, pq, k=_K)
    return hits.select("doc_id", _e4())


def _q_filter_match(spark, sf_dir):  # P-2 MATCH filter
    return _docs(spark, sf_dir).where(F.col("lang") == "en").select(
        "doc_id", "lang", "source"
    )


def _q_filter_range(spark, sf_dir):  # P-3 SECTION (range) filter
    return _docs(spark, sf_dir).where(F.col("n_chars").between(200, 400)).select(
        "doc_id", "n_chars"
    )


def _q_filter_prefix(spark, sf_dir):  # P-4 PREFIX filter
    return _docs(spark, sf_dir).where(F.col("source").startswith("src1")).select(
        "doc_id", "source"
    )


def _q_filter_exclude(spark, sf_dir):  # P-5 EXCLUDE filter
    return _docs(spark, sf_dir).where(F.col("lang") != "en").select("doc_id", "lang")


def _q_facet_count(spark, sf_dir):  # A-1 facet counts
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("lang"))
    )


def _q_facet_stats(spark, sf_dir):  # A-2 SUM/MIN/MAX per facet key
    return _docs(spark, sf_dir).groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


def _q_facet_topn(spark, sf_dir):  # A-3 / W-3: top-2 sources per lang
    cnt = _docs(spark, sf_dir).groupBy("lang", "source").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("source"))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("lang", "source", "cnt", F.col("rn").cast("long").alias("rn"))
    )


def _q_sort_paging(spark, sf_dir):  # O-1 multi-key sort + O-2 paging (sn=10, ln=10)
    return (
        _docs(spark, sf_dir)
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .select("doc_id", "n_chars")
        .offset(10)
        .limit(10)
    )


def _q_set_except(spark, sf_dir):  # T-3 except (delete-set semantics, P-7 analogue)
    d = _docs(spark, sf_dir)
    en = d.where(F.col("lang") == "en").select("doc_id")
    src0 = d.where(F.col("source") == "src0").select("doc_id")
    return en.exceptAll(src0)


def _q_events_hourly(spark, sf_dir):  # F-10 datetime + tumbling-window agg (ST-3 shape)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
        "event_type",
    ).agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value") * 10000).cast("long").alias("sum_value_e4"),
    )


def _q_ann_cosine_topk(spark, sf_dir):  # brute-force cosine top-k (ANN baseline)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "vec", F.transform("embedding", lambda x: x.cast("double"))
    )
    probe = emb.where(F.col("vec_id") == 0).select(F.col("vec").alias("qvec"))
    dot = F.aggregate(
        F.zip_with("vec", "qvec", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nv = F.sqrt(
        F.aggregate(F.zip_with("vec", "vec", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    )
    nq = F.sqrt(
        F.aggregate(F.zip_with("qvec", "qvec", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    )
    sim = (dot / (nv * nq)).alias("sim")
    return (
        emb.crossJoin(F.broadcast(probe))
        .where(F.col("vec_id") != 0)
        .select("vec_id", F.round(sim * 10000).cast("long").alias("sim_e4"))
        .orderBy(F.desc("sim_e4"), F.asc("vec_id"))
        .limit(_K)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tf_table": _q_tf_table,
        "lexicon": _q_lexicon,
        "doclens": _q_doclens,
        "corpus_sha256": _q_corpus_sha256,
        "bm25_and": _q_bm25_and,
        "bm25_or": _q_bm25_or,
        "bm25_packed_and": _q_bm25_packed_and,
        "bm25_packed_not": _q_bm25_packed_not,
        "filter_match": _q_filter_match,
        "filter_range": _q_filter_range,
        "filter_prefix": _q_filter_prefix,
        "filter_exclude": _q_filter_exclude,
        "facet_count": _q_facet_count,
        "facet_stats": _q_facet_stats,
        "facet_topn": _q_facet_topn,
        "sort_paging": _q_sort_paging,
        "set_except": _q_set_except,
        "events_hourly": _q_events_hourly,
        "ann_cosine_topk": _q_ann_cosine_topk,
    }


# ---------------------------------------------------------------------------
# oracle SQL — DuckDB side (same column names, same *_e4 convention)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    return {
        "tf_table": _TF,
        "lexicon": (
            f"SELECT term, CAST(count(*) AS BIGINT) AS df,"
            f" CAST(sum(tf) AS BIGINT) AS cf FROM ({_TF}) GROUP BY term"
        ),
        "doclens": _DL,
        "corpus_sha256": "SELECT doc_id, sha256(text) AS content_sha256 FROM documents",
        "bm25_and": _bm25_sql(_Q_AND, "AND", _K),
        "bm25_or": _bm25_sql(_Q_OR, "OR", _K),
        "bm25_packed_and": _bm25_sql(_Q_AND2, "AND", _K, order_raw=True),
        "bm25_packed_not": _bm25_sql(
            _Q_NOT_POS, "AND", _K, not_terms=_Q_NOT_NEG, order_raw=True
        ),
        "filter_match": "SELECT doc_id, lang, source FROM documents WHERE lang = 'en'",
        "filter_range": (
            "SELECT doc_id, n_chars FROM documents WHERE n_chars BETWEEN 200 AND 400"
        ),
        "filter_prefix": (
            "SELECT doc_id, source FROM documents WHERE source LIKE 'src1%'"
        ),
        "filter_exclude": "SELECT doc_id, lang FROM documents WHERE lang <> 'en'",
        "facet_count": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents"
            " GROUP BY lang ORDER BY cnt DESC, lang ASC"
        ),
        "facet_stats": (
            "SELECT source, CAST(sum(n_chars) AS BIGINT) AS sum_chars,"
            " CAST(min(n_chars) AS BIGINT) AS min_chars,"
            " CAST(max(n_chars) AS BIGINT) AS max_chars FROM documents GROUP BY source"
        ),
        "facet_topn": (
            "SELECT lang, source, cnt, rn FROM ("
            " SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt,"
            "  CAST(row_number() OVER (PARTITION BY lang"
            "   ORDER BY count(*) DESC, source ASC) AS BIGINT) AS rn"
            " FROM documents GROUP BY lang, source) WHERE rn <= 2"
        ),
        "sort_paging": (
            "SELECT doc_id, n_chars FROM documents"
            " ORDER BY n_chars DESC, doc_id ASC LIMIT 10 OFFSET 10"
        ),
        "set_except": (
            "SELECT doc_id FROM documents WHERE lang = 'en'"
            " EXCEPT ALL SELECT doc_id FROM documents WHERE source = 'src0'"
        ),
        "events_hourly": (
            "SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,"
            " CAST(count(*) AS BIGINT) AS cnt,"
            " CAST(round(sum(value) * 10000) AS BIGINT) AS sum_value_e4"
            " FROM events GROUP BY hour, event_type"
        ),
        "ann_cosine_topk": (
            "WITH v AS (SELECT vec_id,"
            "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec"
            "  FROM embeddings),"
            " probe AS (SELECT vec AS qvec FROM v WHERE vec_id = 0),"
            " sims AS (SELECT v.vec_id,"
            "   list_sum(list_transform(range(1, 65),"
            "     i -> v.vec[CAST(i AS INT)] * p.qvec[CAST(i AS INT)]))"
            "   / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))"
            "      * sqrt(list_sum(list_transform(p.qvec, x -> x * x)))) AS sim"
            "  FROM v CROSS JOIN probe p WHERE v.vec_id <> 0)"
            " SELECT vec_id, CAST(round(sim * 10000) AS BIGINT) AS sim_e4"
            " FROM sims ORDER BY sim_e4 DESC, vec_id ASC LIMIT 10"
        ),
    }
