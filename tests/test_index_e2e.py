"""End-to-end: ingest → build → packed search vs SQL path vs pandas oracle
(SURVEY.md §5.2 layers 2-5, §7 M1/M3/M4)."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from pyspark.sql import functions as F

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators import build as B
from fastcatsearch3_spark.operators import ingest
from fastcatsearch3_spark.plans import sql_bm25
from fastcatsearch3_spark.plans.search import search_index

from oracle import bm25_topk_oracle

CFG = EngineConfig(num_shards=4, block_size=64)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return ingest.load_documents(spark, sf_dir)


@pytest.fixture(scope="module")
def store(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index"))
    B.build_index(spark, corpus, root, CFG, n_segments=1)
    return IndexStore(root)


@pytest.fixture(scope="module")
def docs_pd(corpus):
    return corpus.select("doc_id", "content").toPandas()


QUERIES = [
    ("spark join", "AND"),
    ("spark join", "OR"),
    ("merge", "AND"),
    ("window hash scan", "OR"),
    ("window hash scan", "AND"),
    ("the", "AND"),          # hottest term
    ("zzz_no_such_term", "AND"),
    ("spark zzz_no_such_term", "AND"),
    ("spark zzz_no_such_term", "OR"),
]


@pytest.mark.parametrize("text,op", QUERIES)
@pytest.mark.parametrize("mode", ["taat", "bmw"])
def test_search_matches_oracle(spark, store, docs_pd, text, op, mode):
    from fastcatsearch3_spark.plans.query import ParsedQuery
    from fastcatsearch3_spark.functions.analyzer import tokenize_text

    terms = []
    for w in text.split():
        terms.extend(tokenize_text(w, CFG))
    pq = ParsedQuery(terms=terms, op=op)
    got = search_index(spark, store, pq, k=10, mode=mode).toPandas()
    want = bm25_topk_oracle(docs_pd, terms, k=10, op=op, cfg=CFG)
    assert got["doc_id"].tolist() == want["doc_id"].tolist(), (text, op, mode)
    if len(want):
        pd.testing.assert_series_equal(
            got["score"], want["score"], atol=1e-6, check_exact=False
        )


@pytest.mark.parametrize("text,op", [("spark join", "AND"), ("window hash", "OR")])
def test_sql_path_matches_oracle(spark, corpus, docs_pd, text, op):
    terms = text.split()
    got = sql_bm25.bm25_topk(corpus, terms, k=10, op=op, cfg=CFG, round_score=None).toPandas()
    want = bm25_topk_oracle(docs_pd, terms, k=10, op=op, cfg=CFG)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    pd.testing.assert_series_equal(
        got["score"], want["score"], atol=1e-6, check_exact=False
    )


def test_not_clause(spark, store, docs_pd):
    from fastcatsearch3_spark.plans.query import parse_query

    pq = parse_query("spark -join", CFG)
    assert pq.terms == ["spark"] and pq.not_terms == ["join"]
    got = search_index(spark, store, pq, k=10).toPandas()
    want = bm25_topk_oracle(docs_pd, ["spark"], k=10, not_terms=["join"], cfg=CFG)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def test_filtered_search(spark, store, corpus, docs_pd):
    allowed_df = corpus.where(F.col("lang") == "en").select("doc_id")
    allowed = {r["doc_id"] for r in allowed_df.collect()}
    got = search_index(
        spark, store, "spark join", k=10, allow_doc_ids=allowed_df
    ).toPandas()
    want = bm25_topk_oracle(
        docs_pd, ["spark", "join"], k=10, op="AND", allow_doc_ids=allowed, cfg=CFG
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert set(got["doc_id"]) <= allowed


def test_sha256_invariant_and_manifest(store, corpus):
    m = B.read_manifest(store.root, 0)
    assert m["status"] == "complete"
    assert m["n_docs"] == corpus.count()
    d = ingest.sha256_digest(corpus)
    assert m["sha_xor15"] == d["xor15"]
    assert m["metrics"]["docs_per_sec"] is None or m["metrics"]["docs_per_sec"] > 0


def test_resume_skips_complete_segments(spark, corpus, tmp_path):
    root = str(tmp_path / "idx")
    r1 = B.build_index(spark, corpus, root, CFG, n_segments=2)
    assert sorted(r1["built"]) == [0, 1]
    # simulate a killed build: segment 1's manifest lost → only it rebuilds
    B.manifest_path(root, 1).unlink()
    r2 = B.build_index(spark, corpus, root, CFG, n_segments=2)
    assert r2["skipped"] == [0] and r2["built"] == [1]
    # identical lexicon after resume
    lex1 = (
        IndexStore(root).lexicon(spark).orderBy("term").toPandas()
    )
    # config change invalidates completeness
    cfg2 = EngineConfig(num_shards=4, block_size=32)
    assert not B.segment_complete(root, 0, cfg2)
    assert B.segment_complete(root, 0, CFG)
    assert lex1["df"].sum() > 0


def test_multi_segment_search_matches_single(spark, corpus, docs_pd, tmp_path):
    root = str(tmp_path / "idx2")
    B.build_index(spark, corpus, root, CFG, n_segments=3)
    store2 = IndexStore(root)
    got = search_index(spark, store2, "spark join", k=10).toPandas()
    want = bm25_topk_oracle(docs_pd, ["spark", "join"], k=10, op="AND", cfg=CFG)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    pd.testing.assert_series_equal(
        got["score"], want["score"], atol=1e-6, check_exact=False
    )


def test_checkpoint_elision_matches_staged(spark, corpus, tmp_path, monkeypatch):
    """An order-stable (multi-file scan) corpus builds checkpoint-free and
    produces byte-identical docmap + postings (positions included) to the
    forced staged-checkpoint path — the cross-job docno-determinism claim,
    checked exactly."""
    src = str(tmp_path / "multi")
    corpus.repartition(16, "doc_id").write.parquet(src)
    multi = spark.read.parquet(src)
    if multi.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        pytest.skip("corpus too small to dodge the repartition guard")
    assert B._order_stable_plan(multi)
    cfg = EngineConfig(num_shards=4, block_size=64, store_positions=True)

    root_e = str(tmp_path / "idx_elided")
    B.build_index(spark, multi, root_e, cfg)
    m_e = json.loads(open(f"{root_e}/manifest/segment-0.json").read())
    assert m_e["metrics"]["staged_checkpoint"] is False

    monkeypatch.setattr(B, "_order_stable_plan", lambda df: False)
    root_s = str(tmp_path / "idx_staged")
    B.build_index(spark, multi, root_s, cfg)
    m_s = json.loads(open(f"{root_s}/manifest/segment-0.json").read())
    assert m_s["metrics"]["staged_checkpoint"] is True

    dm_e = spark.read.parquet(f"{root_e}/docmap")
    dm_s = spark.read.parquet(f"{root_s}/docmap")
    assert dm_e.exceptAll(dm_s).count() == 0
    assert dm_s.exceptAll(dm_e).count() == 0
    blobs = lambda p: spark.read.parquet(p).select(
        "shard", "term", "df", "cf",
        F.sha2(F.base64("postings"), 256).alias("h"),
        F.sha2(F.base64("positions"), 256).alias("hp"),
    )
    po_e, po_s = blobs(f"{root_e}/postings"), blobs(f"{root_s}/postings")
    assert po_e.exceptAll(po_s).count() == 0
    assert po_s.exceptAll(po_e).count() == 0


def test_shuffled_corpus_falls_back_to_staged(spark, corpus, tmp_path):
    """A corpus whose plan contains an Exchange must keep the staged
    checkpoint (docno assignment would not be reproducible across jobs)."""
    shuffled = corpus.repartition(8, "doc_id")
    assert not B._order_stable_plan(shuffled)
    root = str(tmp_path / "idx_shuf")
    B.build_index(spark, shuffled, root, CFG)
    m = json.loads(open(f"{root}/manifest/segment-0.json").read())
    assert m["metrics"]["staged_checkpoint"] is True


def test_lexicon_arrow_lookup_matches_spark(spark, store):
    """The driver-side pyarrow lexicon lookup (no Spark job) returns the
    same term→df map as the Spark scan fallback, omits absent terms the
    same way, and actually takes the arrow path on a local store."""
    terms = ["spark", "merge", "zzz_not_a_term", "table"]
    direct = store._lexicon_lookup_arrow(terms)
    assert direct is not None  # local filesystem → arrow path must work
    # fresh store → clean cache; force the Spark path by disabling arrow
    spark_store = IndexStore(store.root)
    spark_store._lexicon_lookup_arrow = lambda _t: None
    via_spark = spark_store.df_for_terms(spark, terms)
    arrow_store = IndexStore(store.root)
    via_arrow = arrow_store.df_for_terms(spark, terms)
    assert via_arrow == via_spark
    assert "zzz_not_a_term" not in via_arrow and "spark" in via_arrow
    assert {t: d for t, d in direct.items() if d is not None} == {
        t: via_arrow[t] for t in direct if t in via_arrow
    }


def test_hot_term_skew_bound(spark, store):
    """North-rule skew evidence, asserted not just documented: the
    (shard, term) repartition splits a Zipf-hot term's postings across
    ALL shards, so no pack task (and no serving-side posting decode)
    ever holds more than ~1/num_shards of a hot term. With doc_id-hash
    sharding over hundreds of docs each shard's share is binomial around
    1/num_shards; 2x is a generous variance bound."""
    post = spark.read.parquet(f"{store.root}/postings")
    hot = post.where(F.col("term") == "the").select("shard", "df").collect()
    dfs = {int(r["shard"]): int(r["df"]) for r in hot}
    # one packed row per shard, every shard carries a slice
    assert set(dfs) == set(range(CFG.num_shards))
    total = sum(dfs.values())
    lex = {
        r["term"]: int(r["df"])
        for r in spark.read.parquet(f"{store.root}/lexicon")
        .where(F.col("term") == "the")
        .collect()
    }
    assert total == lex["the"]  # shard slices partition the posting list
    assert max(dfs.values()) <= 2 * total / CFG.num_shards
