"""Score explain (plans/search.explain_scores — Lucene
IndexSearcher.explain): per-(doc, term) BM25 partials derived from the
INDEX artifacts must reconcile exactly with the kernel's scores —
``Σ partial over a doc's rows == search_index score`` — across boosts,
synonym groups, OR/msm, and field-qualified terms (field avgdl)."""

from __future__ import annotations

import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators.build import build_index
from fastcatsearch3_spark.operators.ingest import normalize_corpus
from fastcatsearch3_spark.plans.search import explain_scores, search_index

ROWS = [
    (1, "spark merge table fast scan"),
    (2, "slow merge line table query"),
    (3, "merge merge merge stable spark"),
    (4, "spark slow value tables window"),
    (5, "query window scan merge spark table"),
]


def _build(spark, tmp_path, cfg=None):
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in ROWS],
            "text": [r[1] for r in ROWS],
            "lang": "en",
            "source": "srcalpha",
            "n_chars": [len(r[1]) for r in ROWS],
        }
    )
    corpus = normalize_corpus(spark.createDataFrame(pdf))
    cfg = cfg or EngineConfig(num_shards=2)
    root = str(tmp_path / "idx")
    build_index(spark, corpus, root, cfg)
    return IndexStore(root)


def _assert_reconciles(spark, store, query, k=10):
    hits = search_index(spark, store, query, k=k).toPandas()
    ex = explain_scores(spark, store, query, k=k).toPandas()
    assert set(ex["doc_id"]) == set(hits["doc_id"])
    sums = ex.groupby("doc_id")["partial"].sum()
    for _, r in hits.iterrows():
        assert sums[r["doc_id"]] == pytest.approx(r["score"], abs=1e-9)
    return ex


def test_flat_and_with_boost_reconciles(spark, tmp_path):
    store = _build(spark, tmp_path)
    ex = _assert_reconciles(spark, store, "spark merge^2")
    boosted = ex[ex["term"] == "merge"]
    assert (boosted["boost"] == 2.0).all()
    unboosted = ex[ex["term"] == "spark"]
    assert (unboosted["boost"] == 1.0).all()


def test_or_msm_reconciles(spark, tmp_path):
    store = _build(spark, tmp_path)
    _assert_reconciles(spark, store, "scan window table ~2")


def test_wildcard_expansion_reconciles(spark, tmp_path):
    store = _build(spark, tmp_path)
    ex = _assert_reconciles(spark, store, "*able* merge")
    # expansion members appear as their own explain rows
    assert {"table", "stable", "tables"} & set(ex["term"])


def test_field_query_uses_field_avgdl(spark, tmp_path):
    cfg = EngineConfig(num_shards=2, indexed_fields=("content", "repo"))
    store = _build(spark, tmp_path, cfg)
    ex = _assert_reconciles(spark, store, "repo:srcalpha merge")
    row = ex[ex["term"] == "repo:srcalpha"].iloc[0]
    # every doc's repo field is one token: dl=1, df=n_docs
    assert row["dl"] == 1 and row["df"] == len(ROWS)


def test_explicit_doc_ids(spark, tmp_path):
    store = _build(spark, tmp_path)
    ex = explain_scores(
        spark, store, "spark merge", doc_ids=[3]
    ).toPandas()
    assert set(ex["doc_id"]) == {3}
    assert set(ex["term"]) == {"spark", "merge"}


def test_empty_cases(spark, tmp_path):
    store = _build(spark, tmp_path)
    assert explain_scores(spark, store, "zz* merge").count() == 0
    assert (
        explain_scores(spark, store, "spark merge", doc_ids=[]).count() == 0
    )


def test_explain_reconciles_after_upsert(spark, tmp_path):
    """ADVICE r04: the tombstoned pre-upsert copy of a doc_id must NOT
    contribute stale per-term rows — explain applies the same epoch
    denied mask as search_index."""
    from fastcatsearch3_spark.streaming import incremental as inc

    store = _build(spark, tmp_path)
    upd = pd.DataFrame(
        {
            "doc_id": [3],
            "text": ["merge spark window"],
            "lang": "en",
            "source": "srcalpha",
            "n_chars": [18],
        }
    )
    inc.append_segment(spark, store.root, spark.createDataFrame(upd))
    store = IndexStore(store.root)
    ex = _assert_reconciles(spark, store, "spark merge")
    # without the mask, doc 3 shows BOTH its live and dead copies:
    # duplicated (doc_id, term) rows and a broken partial sum
    assert not ex.duplicated(["doc_id", "term"]).any()


def test_explain_reconciles_after_delete(spark, tmp_path):
    from fastcatsearch3_spark.streaming import incremental as inc

    store = _build(spark, tmp_path)
    tomb = pd.DataFrame({"repo": ["srcalpha"], "path": ["doc/2.txt"]})
    n = inc.delete_by_pk(spark, store.root, spark.createDataFrame(tomb))
    assert n == 1
    store = IndexStore(store.root)
    ex = _assert_reconciles(spark, store, "merge table")
    assert 2 not in set(ex["doc_id"])
